"""ViT-B simple-FPN backbone swap under the same detector heads: shapes,
golden converter parity against an independent torch oracle, bf16 dtype
threading, and stochastic depth (the Swin-backbone standard, VERDICT r3
item 4).

The oracle is a from-the-paper torch ViT (Dosovitskiy et al. / ViTDet
windowed variant) using the timm/MAE module naming (``patch_embed.proj``,
``blocks.{i}.attn.qkv``, ``blocks.{i}.mlp.fc1``) plus a ``simfp.*``-named
simple pyramid, so its state_dict doubles as a synthetic checkpoint for
utils.torch_weights.convert_vit_torch. Its windowing/attention are written
with torch ops (per-window loops) — a different code path from the flax
einsum implementation, so agreement is semantic-parity evidence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openset_rcnn_tpu.config import get_default_cfg
from openset_rcnn_tpu.models import ModelSpec, OpensetRCNNModule, opendet_id_map
from openset_rcnn_tpu.models.vit import ViTSimpleFPN, _window_partition, _window_unpartition

torch = pytest.importorskip("torch")
tnn = torch.nn


def test_window_roundtrip(rng):
    x = jnp.asarray(rng.randn(2, 10, 13, 8).astype(np.float32))
    win, hw_pad = _window_partition(x, 7)
    back = _window_unpartition(win, 7, hw_pad, (10, 13))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_vit_pyramid_shapes(rng):
    # tiny ViT for shape testing
    model = ViTSimpleFPN(embed_dim=32, depth=2, num_heads=2, window_size=2, pos_grid=(8, 8))
    x = jnp.zeros((1, 64, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["p2"].shape == (1, 16, 32, 256)
    assert out["p3"].shape == (1, 8, 16, 256)
    assert out["p4"].shape == (1, 4, 8, 256)
    assert out["p5"].shape == (1, 2, 4, 256)
    assert out["p6"].shape == (1, 1, 2, 256)


@pytest.mark.slow
def test_detector_with_vit_backbone(rng):
    cfg = get_default_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_vit_fpn_backbone"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 81
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 20
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 50
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    spec = ModelSpec.from_cfg(cfg, opendet_id_map(81, 20))
    module = OpensetRCNNModule(spec=spec)
    H = W = 64
    params = jax.jit(
        lambda: module.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3)))["params"]
    )()
    assert "patch_embed" in params["backbone"]

    from openset_rcnn_tpu.models import compute_anchors, training_losses
    from openset_rcnn_tpu.structures import GroundTruth, ImageBatch

    anchors, level_sizes = compute_anchors(spec, (H, W))
    gt = GroundTruth(
        boxes=jnp.asarray([[[5.0, 5.0, 30.0, 30.0]] + [[0.0] * 4] * 3]),
        classes=jnp.zeros((1, 4), jnp.int32),
        valid=jnp.asarray([[True, False, False, False]]),
    )
    batch = ImageBatch(
        images=jnp.ones((1, H, W, 3)),
        image_hw=jnp.asarray([[H, W]], jnp.float32),
        gt=gt,
    )
    losses = jax.jit(
        lambda p: training_losses(module, p, batch, jax.random.PRNGKey(1), spec,
                                  jnp.asarray(anchors), level_sizes)
    )(params)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


# ---------------------------------------------------------------- oracle
class _TorchAttention(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):  # (N, L, C)
        N, L, C = x.shape
        h, d = self.heads, C // self.heads
        qkv = self.qkv(x).reshape(N, L, 3, h, d).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (N, h, L, d)
        attn = (q * d**-0.5) @ k.transpose(-2, -1)
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(N, L, C)
        return self.proj(out)


class _TorchMlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(tnn.functional.gelu(self.fc1(x)))  # exact gelu


class _TorchBlock(tnn.Module):
    def __init__(self, dim, heads, window):
        super().__init__()
        self.window = window  # 0 = global
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = _TorchAttention(dim, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = _TorchMlp(dim, 4 * dim)

    def forward(self, x):  # (B, H, W, C)
        B, H, W, C = x.shape
        y = self.norm1(x)
        w = self.window
        if w > 0:
            ph, pw = (w - H % w) % w, (w - W % w) % w
            y = tnn.functional.pad(y, (0, 0, 0, pw, 0, ph))
            Hp, Wp = H + ph, W + pw
            y = y.reshape(B, Hp // w, w, Wp // w, w, C).permute(0, 1, 3, 2, 4, 5)
            y = y.reshape(-1, w * w, C)
            y = self.attn(y)
            y = y.reshape(B, Hp // w, Wp // w, w, w, C).permute(0, 1, 3, 2, 4, 5)
            y = y.reshape(B, Hp, Wp, C)[:, :H, :W]
        else:
            y = self.attn(y.reshape(B, H * W, C)).reshape(B, H, W, C)
        x = x + y
        return x + self.mlp(self.norm2(x))


class _TorchSimpleFPN(tnn.Module):
    """simfp.* names match utils.torch_weights.convert_vit_torch."""

    def __init__(self, dim, out):
        super().__init__()
        mods = {
            "up2a": tnn.ConvTranspose2d(dim, dim // 2, 2, 2),
            "up2b": tnn.ConvTranspose2d(dim // 2, dim // 4, 2, 2),
        }
        for l, c in zip((2, 3, 4, 5), (dim // 4, dim // 2, dim, dim)):
            mods[f"p{l}_conv1"] = tnn.Conv2d(c, out, 1, bias=False)
            mods[f"p{l}_ln1"] = tnn.LayerNorm(out, eps=1e-6)
            mods[f"p{l}_conv2"] = tnn.Conv2d(out, out, 3, padding=1, bias=False)
            mods[f"p{l}_ln2"] = tnn.LayerNorm(out, eps=1e-6)
        self.simfp = tnn.ModuleDict(mods)

    def _project(self, y, l):  # y: (B, H, W, C)
        m = self.simfp
        y = m[f"p{l}_conv1"](y.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        y = m[f"p{l}_ln1"](y)
        y = m[f"p{l}_conv2"](y.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        return m[f"p{l}_ln2"](y)

    def forward(self, x):  # (B, H, W, C) stride-16 map
        m = self.simfp
        up2 = tnn.functional.gelu(m["up2a"](x.permute(0, 3, 1, 2)))
        up4 = m["up2b"](up2).permute(0, 2, 3, 1)
        up2 = up2.permute(0, 2, 3, 1)
        return {
            "p2": self._project(up4, 2),
            "p3": self._project(up2, 3),
            "p4": self._project(x, 4),
            # ViTDet SimpleFeaturePyramid scale-0.5 stage: MaxPool2d(2, 2)
            "p5": self._project(
                tnn.functional.max_pool2d(
                    x.permute(0, 3, 1, 2), 2, 2
                ).permute(0, 2, 3, 1),
                5,
            ),
        }


class _TorchViT(tnn.Module):
    def __init__(self, dim, depth, heads, window, grid, out):
        super().__init__()
        self.grid = grid
        self.patch_embed = tnn.ModuleDict({"proj": tnn.Conv2d(3, dim, 16, 16)})
        self.pos_embed = tnn.Parameter(torch.randn(1, grid * grid, dim) * 0.02)
        self.blocks = tnn.ModuleList(
            [
                _TorchBlock(dim, heads, 0 if (i + 1) % 3 == 0 else window)
                for i in range(depth)
            ]
        )
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.fpn = _TorchSimpleFPN(dim, out)

    def forward(self, img):  # (B, H, W, 3)
        x = self.patch_embed["proj"](img.permute(0, 3, 1, 2)).permute(0, 2, 3, 1)
        B, H, W, C = x.shape
        pos = self.pos_embed.reshape(1, self.grid, self.grid, C)
        if (H, W) != (self.grid, self.grid):
            # d2 ViTDet get_abs_pos semantics — mirrors models/vit.py
            pos = tnn.functional.interpolate(
                pos.permute(0, 3, 1, 2), size=(H, W), mode="bicubic",
                align_corners=False,
            ).permute(0, 2, 3, 1)
        x = x + pos.reshape(H, W, C)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        out = self.fpn(x)
        out["p6"] = out["p5"][:, ::2, ::2]
        return out

    def state_dict_with_fpn(self):
        sd = {k: v for k, v in self.state_dict().items()}
        # flatten "fpn.simfp.X" -> "simfp.X" (converter naming)
        return {k.replace("fpn.simfp.", "simfp."): v for k, v in sd.items()}


def test_vit_converter_golden_parity(rng):
    """Random timm-named torch ViT (+simfp pyramid) -> convert_vit_torch ->
    flax forward must match the torch oracle at every pyramid level, at a
    NON-window-multiple grid (64x96 @ window 3 -> 4x6 grid, padded path)."""
    dim, depth, heads, window, grid, out = 16, 4, 2, 3, 6, 32
    torch.manual_seed(0)
    oracle = _TorchViT(dim, depth, heads, window, grid, out).eval()

    model = ViTSimpleFPN(
        embed_dim=dim, depth=depth, num_heads=heads, window_size=window,
        pos_grid=(grid, grid), out_channels=out,
    )
    x_np = (rng.randn(2, 64, 96, 3) * 0.5).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x_np))

    from openset_rcnn_tpu.utils.torch_weights import convert_vit_torch

    params = convert_vit_torch(
        oracle.state_dict_with_fpn(), params, depth=depth, pos_grid=(grid, grid)
    )
    ours = model.apply(params, jnp.asarray(x_np))
    with torch.no_grad():
        theirs = oracle(torch.as_tensor(x_np))
    for lvl in ("p2", "p3", "p4", "p5", "p6"):
        np.testing.assert_allclose(
            np.asarray(ours[lvl]), theirs[lvl].numpy(), rtol=2e-4, atol=2e-5,
            err_msg=lvl,
        )


def test_vit_pos_embed_interpolation(rng):
    """A pretrain-style pos_embed (1, 1+14*14, C) with class token converts
    into the model's native table via a TORCH-EXACT bicubic resize (A=-0.75,
    half-pixel, clamped borders — F.interpolate parity, so a non-14x14
    template stays faithful to d2 get_abs_pos)."""
    from openset_rcnn_tpu.utils.torch_weights import convert_vit_torch

    dim, depth, heads, window, grid = 16, 1, 2, 2, 6
    model = ViTSimpleFPN(
        embed_dim=dim, depth=depth, num_heads=heads, window_size=window,
        pos_grid=(grid, grid), out_channels=8,
    )
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    torch.manual_seed(1)
    oracle = _TorchViT(dim, depth, heads, window, 14, 8)
    sd = oracle.state_dict_with_fpn()
    table = rng.randn(1, 1 + 14 * 14, dim).astype(np.float32)
    sd["pos_embed"] = torch.as_tensor(table)

    out = convert_vit_torch(sd, params, depth=depth, pos_grid=(grid, grid))
    got = np.asarray(out["params"]["pos_embed"])
    assert got.shape == (grid, grid, dim)
    with torch.no_grad():
        want = tnn.functional.interpolate(
            torch.as_tensor(table[0, 1:].reshape(1, 14, 14, dim)).permute(0, 3, 1, 2),
            size=(grid, grid), mode="bicubic", align_corners=False,
        ).permute(0, 2, 3, 1).numpy()[0]
    # f32 rounding only: a wrong kernel (A=-0.5) or wrong sampling grid
    # would show up at ~1e-2
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vit_bf16_compute_dtype_sticks():
    """With compute_dtype=bf16 every pyramid output must be bf16 while
    params stay f32 (mixed precision; the swin.py standard)."""
    model = ViTSimpleFPN(
        embed_dim=16, depth=2, num_heads=2, window_size=2, pos_grid=(8, 8),
        out_channels=16, compute_dtype=jnp.bfloat16,
    )
    x = jnp.zeros((1, 64, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    for k, v in out.items():
        assert v.dtype == jnp.bfloat16, (k, v.dtype)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(params))


def test_vit_drop_path_train_only_and_stochastic(rng):
    """Drop-path is active ONLY with a 'dropout' rng stream; without one the
    forward equals rate 0.0 exactly (converted-weight inference parity)."""
    x = jnp.asarray(rng.randn(4, 32, 32, 3).astype(np.float32))
    mk = lambda r: ViTSimpleFPN(
        embed_dim=16, depth=3, num_heads=2, window_size=2, pos_grid=(4, 4),
        out_channels=8, drop_path_rate=r,
    )
    params = mk(0.8).init({"params": jax.random.PRNGKey(0)}, x)

    no_dp = mk(0.0).apply(params, x)
    det = mk(0.8).apply(params, x)
    for k in no_dp:
        np.testing.assert_array_equal(np.asarray(det[k]), np.asarray(no_dp[k]))

    a = mk(0.8).apply(params, x, rngs={"dropout": jax.random.PRNGKey(1)})
    b = mk(0.8).apply(params, x, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(a["p4"]), np.asarray(b["p4"]))


def test_vit_drop_path_plumbed_through_train_step(rng):
    """MODEL.VIT.DROP_PATH_RATE reaches the trunk through the spec and the
    train-step 'dropout' stream (mirror of the Swin plumbing test)."""
    from openset_rcnn_tpu.models import compute_anchors, training_losses
    from openset_rcnn_tpu.structures import GroundTruth, ImageBatch

    cfg = get_default_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_vit_fpn_backbone"
    cfg.MODEL.VIT.DROP_PATH_RATE = 0.9
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.NUM_KNOWN_CLASSES = 3
    cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.RPN.PRE_NMS_TOPK_TRAIN = 50
    cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS = [[1.0]]
    spec = ModelSpec.from_cfg(cfg, opendet_id_map(4, 3))
    assert spec.vit_drop_path == 0.9
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
    assert float(l1["loss_cls"]) != float(l2["loss_cls"])
