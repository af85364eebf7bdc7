"""Swin backbone: shapes, shifted-window mask semantics, and golden parity
of the torch-checkpoint converter against an independent torch oracle.

The oracle below is a from-the-paper torch implementation of Swin (Liu et
al. 2021) using the OFFICIAL module naming (patch_embed.proj,
layers.{s}.blocks.{b}.attn.qkv, ...) so its state_dict doubles as a
synthetic "official checkpoint" for utils.torch_weights.convert_swin_torch.
It computes window attention per-window with explicit loops — a different
code path from the flax einsum implementation — so agreement is evidence
of semantic parity, not shared bugs.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from openset_rcnn_tpu.models.swin import (
    SwinTransformer,
    _partition,
    _rel_pos_index,
    _shift_mask,
    _unpartition,
)

torch = pytest.importorskip("torch")
tnn = torch.nn


def test_partition_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 11, 16, 4).astype(np.float32))
    win, hw_pad = _partition(x, 7)
    assert win.shape == (2, (14 // 7) * (21 // 7), 49, 4)
    back = _unpartition(win, 7, hw_pad, (11, 16))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_shift_mask_blocks_cross_region():
    m = _shift_mask(14, 14, 7, 3)
    assert m.shape == (4, 49, 49)
    # the first window (interior) sees no boundary: fully unmasked
    np.testing.assert_array_equal(m[0], 0.0)
    # the last (corner) window mixes 4 regions: has masked pairs both ways
    assert (m[-1] < 0).any()
    np.testing.assert_array_equal(m[-1], m[-1].T)  # symmetric regions


def test_rel_pos_index_matches_torch_formula():
    w = 5
    # torch reference formula (official Swin, recomputed independently)
    coords = torch.stack(torch.meshgrid(torch.arange(w), torch.arange(w), indexing="ij"))
    flat = torch.flatten(coords, 1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    idx = rel.sum(-1)
    np.testing.assert_array_equal(_rel_pos_index(w), idx.numpy())


def test_swin_pyramid_shapes():
    model = SwinTransformer(embed_dim=16, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8), window=4)
    x = jnp.zeros((1, 64, 96, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["res2"].shape == (1, 16, 24, 16)
    assert out["res3"].shape == (1, 8, 12, 32)
    assert out["res4"].shape == (1, 4, 6, 64)
    assert out["res5"].shape == (1, 2, 3, 128)


# ---------------------------------------------------------------- oracle
class _Mlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(tnn.functional.gelu(self.fc1(x)))


class _WindowAttention(tnn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.dim, self.heads, self.window = dim, heads, window
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * window - 1) ** 2, heads) * 0.02
        )

    def forward(self, x, mask):
        # x: (nW, L, C) for ONE image; per-window loop (oracle style)
        nW, L, C = x.shape
        h, d = self.heads, C // self.heads
        outs = []
        for wi in range(nW):
            qkv = self.qkv(x[wi])  # (L, 3C)
            q, k, v = qkv.reshape(L, 3, h, d).permute(1, 2, 0, 3)  # each (h, L, d)
            attn = (q @ k.transpose(-2, -1)) / (d**0.5)
            idx = torch.as_tensor(_rel_pos_index(self.window).astype(np.int64))
            bias = self.relative_position_bias_table[idx.reshape(-1)].reshape(L, L, h)
            attn = attn + bias.permute(2, 0, 1)
            if mask is not None:
                attn = attn + torch.as_tensor(mask[wi])
            attn = attn.softmax(-1)
            outs.append((attn @ v).permute(1, 0, 2).reshape(L, C))
        return self.proj(torch.stack(outs))


class _Block(tnn.Module):
    def __init__(self, dim, heads, window, shift):
        super().__init__()
        self.window, self.shift = window, shift
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = _WindowAttention(dim, heads, window)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = _Mlp(dim, 4 * dim)

    def forward(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        w = self.window
        y = self.norm1(x)
        # pad FIRST, then cyclic-shift the padded grid — the order used by
        # the torch detection Swin (mmdet/microsoft): F.pad precedes roll
        ph, pw = (w - H % w) % w, (w - W % w) % w
        y = tnn.functional.pad(y, (0, 0, 0, pw, 0, ph))
        Hp, Wp = H + ph, W + pw
        if self.shift:
            y = torch.roll(y, (-self.shift, -self.shift), dims=(1, 2))
        y = y.reshape(B, Hp // w, w, Wp // w, w, C).permute(0, 1, 3, 2, 4, 5)
        y = y.reshape(B, -1, w * w, C)
        mask = _shift_mask(Hp, Wp, w, self.shift) if self.shift else None
        y = torch.stack([self.attn(y[b], mask) for b in range(B)])
        y = y.reshape(B, Hp // w, Wp // w, w, w, C).permute(0, 1, 3, 2, 4, 5)
        y = y.reshape(B, Hp, Wp, C)
        if self.shift:
            y = torch.roll(y, (self.shift, self.shift), dims=(1, 2))
        y = y[:, :H, :W]
        x = x + y
        return x + self.mlp(self.norm2(x))


class _PatchMerging(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = tnn.LayerNorm(4 * dim)
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):
        x = torch.cat(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], -1
        )
        return self.reduction(self.norm(x))


class _Stage(tnn.Module):
    def __init__(self, dim, depth, heads, window, last):
        super().__init__()
        self.blocks = tnn.ModuleList(
            [_Block(dim, heads, window, 0 if i % 2 == 0 else window // 2) for i in range(depth)]
        )
        self.downsample = None if last else _PatchMerging(dim)


class _PatchEmbed(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.proj = tnn.Conv2d(3, dim, 4, stride=4)
        self.norm = tnn.LayerNorm(dim)


class _TorchSwin(tnn.Module):
    def __init__(self, dim, depths, heads, window):
        super().__init__()
        self.window = window
        self.patch_embed = _PatchEmbed(dim)
        self.layers = tnn.ModuleList(
            [
                _Stage(dim * 2**s, depths[s], heads[s], window, s == len(depths) - 1)
                for s in range(len(depths))
            ]
        )
        # mmdet-style per-stage output norms; default init (weight=1,
        # bias=0) matches flax's fresh out_norm{s} init exactly, so the
        # converter's "leave them at template init" path is covered too.
        self.out_norms = tnn.ModuleList(
            [tnn.LayerNorm(dim * 2**s) for s in range(len(depths))]
        )

    def forward(self, img):  # (B, H, W, 3) -> normed per-stage features
        x = self.patch_embed.proj(img.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        x = self.patch_embed.norm(x)
        feats = []
        for s, stage in enumerate(self.layers):
            for blk in stage.blocks:
                x = blk(x)
            feats.append(self.out_norms[s](x))
            if stage.downsample is not None:
                x = stage.downsample(x)
        return feats


def test_swin_converter_golden_parity(rng):
    """Random official-named torch Swin -> converter -> flax forward must
    match the torch oracle at every stage output (pre out-norm)."""
    dim, depths, heads, window = 8, (2, 2), (2, 4), 4
    torch.manual_seed(0)
    oracle = _TorchSwin(dim, depths, heads, window).eval()

    model = SwinTransformer(embed_dim=dim, depths=depths, num_heads=heads, window=window)
    x_np = rng.randn(2, 16, 24, 3).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))

    from openset_rcnn_tpu.utils.torch_weights import convert_swin_torch

    params = convert_swin_torch(oracle.state_dict(), params, depths=depths)
    ours = model.apply(params, jnp.asarray(x_np))
    with torch.no_grad():
        theirs = oracle(torch.as_tensor(x_np))
    for s in range(len(depths)):
        np.testing.assert_allclose(
            np.asarray(ours[f"res{s + 2}"]), theirs[s].numpy(), rtol=2e-4, atol=2e-5
        )


def test_detector_with_swin_backbone():
    from openset_rcnn_tpu.config import get_default_cfg
    from openset_rcnn_tpu.models import ModelSpec, OpensetRCNNModule, opendet_id_map

    cfg = get_default_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_swin_fpn_backbone"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 81
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 20
    spec = ModelSpec.from_cfg(cfg, opendet_id_map(81, 20))
    module = OpensetRCNNModule(spec=spec)
    H, W = 64, 96
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    )()
    assert "patch_embed" in params["backbone"]
    feats = module.apply(
        {"params": params}, jnp.ones((1, H, W, 3)), method=lambda m, x: m.features(x)
    )
    assert feats["p2"].shape == (1, 16, 24, 256)
    assert feats["p6"].shape == (1, 1, 2, 256)


def test_swin_bf16_compute_dtype_sticks():
    """With compute_dtype=bf16 every stage output must be bf16 — flax would
    silently promote back to the f32 param dtype without explicit layer
    dtypes (the resnet.py/fpn.py pitfall)."""
    model = SwinTransformer(
        embed_dim=8, depths=(1, 1), num_heads=(1, 2), window=4,
        compute_dtype=jnp.bfloat16,
    )
    x = jnp.zeros((1, 16, 24, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    for k, v in out.items():
        assert v.dtype == jnp.bfloat16, (k, v.dtype)
    # params stay f32 (mixed precision: bf16 activations, f32 master params)
    leaves = jax.tree.leaves(params)
    assert all(l.dtype == jnp.float32 for l in leaves)


def test_drop_path_train_only_and_unbiased(rng):
    """Drop-path gates residual branches ONLY when a 'dropout' rng stream is
    provided (training); without one the forward is deterministic and equals
    rate-0.0 (converted-weight parity). With the stream, outputs vary by key
    and the survivor scaling keeps the batch-mean magnitude comparable."""
    x = jnp.asarray(rng.randn(4, 16, 16, 3).astype(np.float32))
    mk = lambda r: SwinTransformer(
        embed_dim=8, depths=(2, 2), num_heads=(1, 2), window=4, drop_path_rate=r
    )
    params = mk(0.8).init({"params": jax.random.PRNGKey(0)}, x)

    # no rng stream -> identical to rate 0.0 (inference path)
    no_dp = mk(0.0).apply(params, x)
    det = mk(0.8).apply(params, x)
    for k in no_dp:
        np.testing.assert_array_equal(np.asarray(det[k]), np.asarray(no_dp[k]))

    # with a stream: stochastic, key-dependent
    a = mk(0.8).apply(params, x, rngs={"dropout": jax.random.PRNGKey(1)})
    b = mk(0.8).apply(params, x, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(a["res3"]), np.asarray(b["res3"]))


def test_drop_path_plumbed_through_train_step(rng):
    """MODEL.SWIN.DROP_PATH_RATE reaches the Swin trunk through the spec and
    the train-step 'dropout' stream: losses differ across rng keys with
    drop-path on, and inference stays deterministic."""
    from openset_rcnn_tpu.config import get_default_cfg
    from openset_rcnn_tpu.models import ModelSpec, OpensetRCNNModule, opendet_id_map
    from openset_rcnn_tpu.models.detector import compute_anchors, training_losses
    from openset_rcnn_tpu.structures import GroundTruth, ImageBatch

    cfg = get_default_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_swin_fpn_backbone"
    cfg.MODEL.SWIN.DROP_PATH_RATE = 0.9
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 3
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 50
    spec = ModelSpec.from_cfg(cfg, opendet_id_map(4, 3))
    assert spec.swin_drop_path == 0.9
    module = OpensetRCNNModule(spec=spec)
    H, W = 64, 96
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    )()
    anchors_np, level_sizes = compute_anchors(spec, (H, W))
    batch = ImageBatch(
        images=jnp.asarray(rng.rand(2, H, W, 3).astype(np.float32) * 255),
        image_hw=jnp.asarray([[H, W]] * 2, jnp.float32),
        gt=GroundTruth(
            boxes=jnp.asarray([[[4, 4, 40, 40]]] * 2, jnp.float32),
            classes=jnp.zeros((2, 1), jnp.int32),
            valid=jnp.ones((2, 1), bool),
        ),
    )
    anchors = jnp.asarray(anchors_np)
    l1 = training_losses(module, params, batch, jax.random.PRNGKey(1), spec, anchors, level_sizes)
    l2 = training_losses(module, params, batch, jax.random.PRNGKey(2), spec, anchors, level_sizes)
    # same data, different rng -> drop-path (and samplers) change the loss
    assert float(l1["loss_cls"]) != float(l2["loss_cls"])
