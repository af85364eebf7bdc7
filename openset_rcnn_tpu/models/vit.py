"""ViT-B backbone with a simple feature pyramid (ViTDet-style).

The BASELINE stretch config asks for a Swin/ViT-B backbone swap under the
same CF-RPN + PLN heads (BASELINE.json configs[4]). This implements the
ViTDet recipe (plain ViT + simple feature pyramid, He et al. 2022),
TPU-first:

  * 16x16 patch embedding, learnable 2-D position embeddings stored at the
    NATIVE pretrain grid (14x14 for 224/16 checkpoints) and bicubically
    resized to the runtime patch grid inside the forward — the exact
    semantics of d2 ViTDet's ``get_abs_pos`` (modeling/backbone/utils.py),
    except the resize compiles to a static constant matmul per bucket
    (runtime grids are static under jit, so the interpolation matrices are
    trace-time numpy constants; kernel A=-0.75 + border clamping replicate
    torch F.interpolate(mode="bicubic", align_corners=False) bitwise-close);
  * 14x14 windowed attention in all but every third (global) block (the
    window partition is a static reshape — no dynamic shapes);
  * a simple feature pyramid from the single stride-16 map: stride-2
    deconvs up to P2/P3, identity P4, stride-2 subsample P5, and the RPN's
    extra P6 — each with 1x1 + 3x3 conv projections to 256 channels,
    so the detector's FPN-consumer code is unchanged.

Mixed precision mirrors swin.py: activations run in ``compute_dtype``
(bf16 on TPU), params stay f32, and the attention softmax accumulates in
f32. Stochastic depth (``drop_path_rate``, linearly scaled over depth as in
ViTDet) gates residual branches per-sample and is active only when the
caller provides a 'dropout' rng stream — the train step does, inference
never does, so converted-weight inference parity is exact.

Exposes the same interface as ResNet+FPN: __call__(images) -> {p2..p6}.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_GLOBAL_EVERY = 3  # every 3rd block uses global attention (ViTDet-B: 4 of 12)


def bicubic_resize_matrix(out_size: int, in_size: int, a: float = -0.75) -> np.ndarray:
    """(out_size, in_size) interpolation matrix reproducing torch
    ``F.interpolate(mode="bicubic", align_corners=False)`` along one axis:
    half-pixel sampling, cubic-convolution kernel with A=-0.75, taps clamped
    at the borders. Applying it as ``W_h @ table @ W_w.T`` equals d2 ViTDet's
    ``get_abs_pos`` pos-embed interpolation (modeling/backbone/utils.py) —
    used both per-forward (static grids) and at checkpoint conversion."""
    if out_size == in_size:
        return np.eye(out_size, dtype=np.float64)
    scale = in_size / out_size
    x = (np.arange(out_size) + 0.5) * scale - 0.5
    x0 = np.floor(x).astype(np.int64)
    t = x - x0
    W = np.zeros((out_size, in_size), np.float64)
    rows = np.arange(out_size)
    for k in range(-1, 3):
        d = np.abs(t - k)
        w = np.where(
            d <= 1.0,
            (a + 2.0) * d**3 - (a + 3.0) * d**2 + 1.0,
            np.where(d < 2.0, a * d**3 - 5.0 * a * d**2 + 8.0 * a * d - 4.0 * a, 0.0),
        )
        np.add.at(W, (rows, np.clip(x0 + k, 0, in_size - 1)), w)
    return W


def _window_partition(x: jnp.ndarray, w: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B, H, W, C) -> (B*nh*nw, w, w, C), padding H/W up to multiples of w."""
    B, H, W, C = x.shape
    ph = (w - H % w) % w
    pw = (w - W % w) % w
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // w, w, Wp // w, w, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w, w, C), (Hp, Wp)


def _window_unpartition(x: jnp.ndarray, w: int, hw_pad, hw) -> jnp.ndarray:
    Hp, Wp = hw_pad
    H, W = hw
    B = x.shape[0] // ((Hp // w) * (Wp // w))
    x = x.reshape(B, Hp // w, Wp // w, w, w, -1).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class Attention(nn.Module):
    dim: int
    num_heads: int
    compute_dtype: Any = None  # None -> f32 everywhere

    @nn.compact
    def __call__(self, x):  # (N, L, C)
        N, L, C = x.shape
        dt = self.compute_dtype
        qkv = nn.Dense(3 * self.dim, use_bias=True, name="qkv", dtype=dt)(x)
        q, k, v = jnp.split(qkv.reshape(N, L, 3, self.num_heads, -1), 3, axis=2)
        q, k, v = (t.squeeze(2) for t in (q, k, v))  # (N, L, h, d)
        d = q.shape[-1]
        scale = 1.0 / np.sqrt(d)
        attn = jnp.einsum("nlhd,nmhd->nhlm", q * jnp.asarray(scale, q.dtype), k)
        # softmax in f32 (standard mixed-precision recipe, as in swin.py)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("nhlm,nmhd->nlhd", attn, v).reshape(N, L, C)
        return nn.Dense(self.dim, name="proj", dtype=dt)(out)


class Block(nn.Module):
    dim: int
    num_heads: int
    window_size: int  # 0 = global attention
    mlp_ratio: float = 4.0
    compute_dtype: Any = None
    drop_path: float = 0.0

    def _drop_path(self, y: jnp.ndarray) -> jnp.ndarray:
        """Stochastic depth (timm semantics, same as swin.py): per-sample
        Bernoulli keep with survivor scaling; no-op without a 'dropout'
        rng stream (inference)."""
        if self.drop_path <= 0.0 or not self.has_rng("dropout"):
            return y
        keep = 1.0 - self.drop_path
        shape = (y.shape[0],) + (1,) * (y.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return jnp.where(mask, y / keep, jnp.zeros((), y.dtype)).astype(y.dtype)

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        dt = self.compute_dtype
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-6, name="norm1", dtype=dt)(x)
        if self.window_size > 0:
            y, hw_pad = _window_partition(y, self.window_size)
            n, wh, ww, _ = y.shape
            y = Attention(self.dim, self.num_heads, compute_dtype=dt, name="attn")(
                y.reshape(n, wh * ww, C)
            )
            y = _window_unpartition(y.reshape(n, wh, ww, C), self.window_size, hw_pad, (H, W))
        else:
            y = Attention(self.dim, self.num_heads, compute_dtype=dt, name="attn")(
                y.reshape(B, H * W, C)
            )
            y = y.reshape(B, H, W, C)
        x = shortcut + self._drop_path(y)
        z = nn.LayerNorm(epsilon=1e-6, name="norm2", dtype=dt)(x)
        z = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1", dtype=dt)(z)
        z = nn.gelu(z, approximate=False)  # timm/ViT uses exact GELU
        z = nn.Dense(self.dim, name="mlp_fc2", dtype=dt)(z)
        return x + self._drop_path(z)


class ViTSimpleFPN(nn.Module):
    """ViT-B trunk + simple feature pyramid -> {p2..p6} @ 256 channels."""

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    window_size: int = 14
    out_channels: int = 256
    # native pos-embed table grid: 224/16 pretrain convention (get_abs_pos
    # stores the pretrain table and stretches it to the runtime grid)
    pos_grid: Tuple[int, int] = (14, 14)
    compute_dtype: Any = jnp.float32
    drop_path_rate: float = 0.0  # ViTDet-B recipe: 0.1, linearly scaled

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        dt = self.compute_dtype
        x = images.astype(dt)
        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            name="patch_embed",
            dtype=dt,
        )(x)
        B, H, W, C = x.shape
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (self.pos_grid[0], self.pos_grid[1], self.embed_dim),
        )
        if (H, W) != tuple(self.pos_grid):
            # stretch the native table to the runtime grid (static per
            # bucket): two trace-time-constant interpolation matmuls, in f32
            # for parity with torch's f32 F.interpolate
            wh = jnp.asarray(bicubic_resize_matrix(H, self.pos_grid[0]), jnp.float32)
            ww = jnp.asarray(bicubic_resize_matrix(W, self.pos_grid[1]), jnp.float32)
            pos = jnp.einsum("hH,HWc,wW->hwc", wh, pos.astype(jnp.float32), ww)
        x = x + pos.astype(x.dtype)

        dp_rates = np.linspace(0.0, self.drop_path_rate, self.depth)
        for i in range(self.depth):
            is_global = (i + 1) % _GLOBAL_EVERY == 0
            x = Block(
                self.embed_dim,
                self.num_heads,
                window_size=0 if is_global else self.window_size,
                compute_dtype=dt,
                drop_path=float(dp_rates[i]),
                name=f"block{i}",
            )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm", dtype=dt)(x)

        # simple feature pyramid from the stride-16 map
        def project(y, name):
            y = nn.Conv(
                self.out_channels, (1, 1), use_bias=False, name=f"{name}_conv1", dtype=dt
            )(y)
            y = nn.LayerNorm(epsilon=1e-6, name=f"{name}_ln1", dtype=dt)(y)
            y = nn.Conv(
                self.out_channels, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                name=f"{name}_conv2", dtype=dt,
            )(y)
            return nn.LayerNorm(epsilon=1e-6, name=f"{name}_ln2", dtype=dt)(y)

        up2 = nn.ConvTranspose(
            self.embed_dim // 2, (2, 2), strides=(2, 2), name="up2a", dtype=dt
        )(x)
        up2 = nn.gelu(up2, approximate=False)
        up4 = nn.ConvTranspose(
            self.embed_dim // 4, (2, 2), strides=(2, 2), name="up2b", dtype=dt
        )(up2)
        p2 = project(up4, "p2")                      # stride 4
        p3 = project(up2, "p3")                      # stride 8
        p4 = project(x, "p4")                        # stride 16
        # stride-32 branch: 2x2 max-pool, the ViTDet SimpleFeaturePyramid
        # scale-0.5 stage (d2 modeling/backbone/vit.py uses MaxPool2d(2, 2))
        p5 = project(nn.max_pool(x, (2, 2), strides=(2, 2)), "p5")
        # stride-64: d2's LastLevelMaxPool is max_pool(kernel=1, stride=2),
        # i.e. exact subsampling — NOT a 2x2 pool
        p6 = p5[:, ::2, ::2]
        return {"p2": p2, "p3": p3, "p4": p4, "p5": p5, "p6": p6}
