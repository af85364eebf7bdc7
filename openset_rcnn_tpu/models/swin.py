"""Swin Transformer backbone (T/S/B) emitting {res2..res5} for the FPN.

BASELINE.json configs[4] stretch: a Swin backbone swap under the same
CF-RPN + PLN heads.  The reference repo is R50-only, so the spec here is
the public Swin detection recipe (Liu et al. 2021, as composed by mmdet's
``SwinTransformer``): 4x4 patch embed, four stages of shifted-window
attention blocks with patch-merging downsamples, and a LayerNorm on each
stage output.  Stage outputs are strides 4/8/16/32 with dims C..8C and
feed the existing ``models.fpn.FPN`` unchanged (in_features res2..res5).

TPU-first choices:
  * all shapes static under jit: image buckets fix (H, W); window
    partition pads to the 7-multiple with zeros (same as the torch
    impl's F.pad) and the pad is cropped after unpartition;
  * the shifted-window attention mask and the relative-position-bias
    gather index are **numpy constants** computed at trace time from the
    static (Hp, Wp, window, shift) — no dynamic control flow;
  * cyclic shift is ``jnp.roll`` (static shift), a cheap HBM copy XLA
    fuses with the partition reshape;
  * attention runs in the trunk compute dtype (bf16-capable) with f32
    softmax via jax.nn.softmax's internal max-subtraction.

Stochastic depth (drop-path) follows the torch recipe: per-block rates
linspace(0, drop_path_rate, total_blocks), per-SAMPLE Bernoulli gating of
each residual branch scaled by 1/keep_prob. Active only when the caller
provides a 'dropout' rng stream (the train step does; inference never
does), so converted-weight eval stays deterministic. Default rate 0.0 =
reference parity (the reference is R50-only and has no drop-path).

Torch-weight conversion lives in utils/torch_weights.convert_swin_torch
(official ImageNet checkpoints; the four output-stage norms are new
parameters, initialized at identity, exactly like mmdet fine-tuning).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# size -> (embed_dim, depths, num_heads)
SWIN_VARIANTS = {
    "T": (96, (2, 2, 6, 2), (3, 6, 12, 24)),
    "S": (96, (2, 2, 18, 2), (3, 6, 12, 24)),
    "B": (128, (2, 2, 18, 2), (4, 8, 16, 32)),
}


def _rel_pos_index(w: int) -> np.ndarray:
    """(w*w, w*w) gather index into the (2w-1)^2 bias table (torch Swin
    ``relative_position_index`` buffer — recomputed, not converted)."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, L, L)
    rel = rel.transpose(1, 2, 0) + (w - 1)
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _shift_mask(hp: int, wp: int, w: int, shift: int) -> np.ndarray:
    """(nW, L, L) additive attention mask for the shifted windows.

    Mirrors the torch impl's ``img_mask`` slices on the PADDED grid: 9
    region ids from the {(0,-w), (-w,-shift), (-shift,None)} slice
    product; pairs from different regions get -100 (soft -inf)."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = (
        img.reshape(hp // w, w, wp // w, w).transpose(0, 2, 1, 3).reshape(-1, w * w)
    )  # (nW, L)
    diff = win[:, :, None] != win[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def _partition(x: jnp.ndarray, w: int):
    """(B, H, W, C) -> (B, nW, w*w, C) with zero pad up to w-multiples."""
    B, H, W, C = x.shape
    ph, pw = (w - H % w) % w, (w - W % w) % w
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    Hp, Wp = H + ph, W + pw
    x = x.reshape(B, Hp // w, w, Wp // w, w, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, -1, w * w, C), (Hp, Wp)


def _unpartition(x: jnp.ndarray, w: int, hw_pad, hw) -> jnp.ndarray:
    Hp, Wp = hw_pad
    B = x.shape[0]
    x = x.reshape(B, Hp // w, Wp // w, w, w, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, Hp, Wp, -1)[:, : hw[0], : hw[1]]


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window: int
    compute_dtype: Any = None  # None -> f32 everywhere

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: np.ndarray | None):
        """x: (B, nW, L, C); mask: (nW, L, L) numpy constant or None."""
        B, nW, L, C = x.shape
        h = self.num_heads
        dt = self.compute_dtype
        qkv = nn.Dense(3 * self.dim, name="qkv", dtype=dt)(x).reshape(B, nW, L, 3, h, -1)
        q, k, v = (qkv[..., i, :, :] for i in range(3))  # (B, nW, L, h, d)
        scale = 1.0 / np.sqrt(self.dim // h)
        attn = jnp.einsum("bnlhd,bnmhd->bnhlm", q * scale, k)

        table = self.param(
            "rel_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, h),
        )
        idx = _rel_pos_index(self.window)  # numpy constant
        bias = table[idx.reshape(-1)].reshape(L, L, h).transpose(2, 0, 1)
        # bias add + softmax in f32 (bf16 logits lose the small relative
        # biases; f32 softmax is the standard mixed-precision recipe)
        attn = attn.astype(jnp.float32) + bias.astype(jnp.float32)
        if mask is not None:
            attn = attn + jnp.asarray(mask, jnp.float32)[None, :, None, :, :]
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bnhlm,bnmhd->bnlhd", attn, v).reshape(B, nW, L, C)
        return nn.Dense(self.dim, name="proj", dtype=dt)(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int  # 0 = regular windows, window//2 = shifted
    mlp_ratio: float = 4.0
    compute_dtype: Any = None
    drop_path: float = 0.0

    def _drop_path(self, y: jnp.ndarray) -> jnp.ndarray:
        """Stochastic depth on a residual branch (torch timm semantics):
        per-sample Bernoulli keep, surviving samples scaled by 1/keep.
        A no-op unless a 'dropout' rng stream is provided (training)."""
        if self.drop_path <= 0.0 or not self.has_rng("dropout"):
            return y
        keep = 1.0 - self.drop_path
        shape = (y.shape[0],) + (1,) * (y.ndim - 1)
        mask = jax.random.bernoulli(self.make_rng("dropout"), keep, shape)
        return jnp.where(mask, y / keep, jnp.zeros((), y.dtype)).astype(y.dtype)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, H, W, C)
        B, H, W, C = x.shape
        shortcut = x
        y = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.compute_dtype)(x)
        # Pad to window multiples FIRST, then cyclic-shift the PADDED grid
        # (torch detection Swin: F.pad precedes torch.roll). Rolling the
        # unpadded tensor would put the wrap seam at H-shift while the
        # attention mask models it at Hp-shift — they only coincide when
        # H, W are window multiples.
        w = self.window
        ph, pw = (w - H % w) % w, (w - W % w) % w
        if ph or pw:
            y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)))
        Hp, Wp = H + ph, W + pw
        if self.shift:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
        y, hw_pad = _partition(y, w)  # pad is a no-op: already multiples
        mask = _shift_mask(Hp, Wp, w, self.shift) if self.shift else None
        y = WindowAttention(
            self.dim, self.num_heads, w, compute_dtype=self.compute_dtype, name="attn"
        )(y, mask)
        y = _unpartition(y, w, hw_pad, (Hp, Wp))
        if self.shift:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        y = y[:, :H, :W]
        x = shortcut + self._drop_path(y)
        z = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=self.compute_dtype)(x)
        z = nn.Dense(int(self.dim * self.mlp_ratio), name="mlp_fc1", dtype=self.compute_dtype)(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(self.dim, name="mlp_fc2", dtype=self.compute_dtype)(z)
        return x + self._drop_path(z)


class PatchMerging(nn.Module):
    dim: int  # input dim
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        if H % 2 or W % 2:  # torch impl pads odd dims
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        # torch concat order: x0=[0::2,0::2], x1=[1::2,0::2], x2=[0::2,1::2], x3=[1::2,1::2]
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            axis=-1,
        )
        x = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=self.compute_dtype)(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction", dtype=self.compute_dtype)(x)


class SwinTransformer(nn.Module):
    """Swin-{T,S,B} trunk -> {res2: C@s4, res3: 2C@s8, res4: 4C@s16, res5: 8C@s32}."""

    size: str = "T"
    window: int = 7
    compute_dtype: Any = jnp.float32
    drop_path_rate: float = 0.0  # public recipe fine-tunes with 0.2
    # test-size overrides; None -> from SWIN_VARIANTS[size]
    embed_dim: int | None = None
    depths: Tuple[int, ...] | None = None
    num_heads: Tuple[int, ...] | None = None

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        embed_dim, depths, heads = SWIN_VARIANTS[self.size]
        embed_dim = self.embed_dim or embed_dim
        depths = self.depths or depths
        heads = self.num_heads or heads
        x = images.astype(self.compute_dtype)
        # explicit layer dtype: flax otherwise promotes activations back to
        # the f32 param dtype after the first layer, silently undoing mixed
        # precision (same convention as resnet.py/fpn.py)
        dt = self.compute_dtype if self.compute_dtype != jnp.float32 else None
        x = nn.Conv(embed_dim, (4, 4), strides=(4, 4), name="patch_embed", dtype=dt)(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm", dtype=dt)(x)

        outs = {}
        dim = embed_dim
        n_stages = len(depths)
        # torch recipe: per-block drop-path rates linspace(0, rate, total)
        total = sum(depths)
        dp_rates = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        blk = 0
        for s in range(n_stages):
            for b in range(depths[s]):
                x = SwinBlock(
                    dim,
                    heads[s],
                    self.window,
                    shift=0 if b % 2 == 0 else self.window // 2,
                    compute_dtype=dt,
                    drop_path=dp_rates[blk],
                    name=f"stage{s}_block{b}",
                )(x)
                blk += 1
            # per-stage output norm (mmdet detection recipe; new params
            # relative to the ImageNet checkpoint)
            outs[f"res{s + 2}"] = nn.LayerNorm(epsilon=1e-5, name=f"out_norm{s}", dtype=dt)(x)
            if s < n_stages - 1:
                x = PatchMerging(dim, compute_dtype=dt, name=f"downsample{s}")(x)
                dim *= 2
        return outs
