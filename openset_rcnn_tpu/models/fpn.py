"""Feature Pyramid Network (P2-P6).

TPU-native rebuild of d2's FPN as composed by the reference
(configs/Base-RCNN-FPN.yaml:6-8, SURVEY.md §2.4): 1x1 lateral convs,
nearest-neighbor x2 top-down pathway, 3x3 output convs, and a
``LastLevelMaxPool`` P6 (stride-2 subsample of P5) for the RPN.
"""
from __future__ import annotations

from typing import Any, Dict, List

import flax.linen as nn
import jax.numpy as jnp


class FPN(nn.Module):
    out_channels: int = 256
    in_features: tuple = ("res2", "res3", "res4", "res5")
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """feats: per-level NHWC (batched). Returns {p2..p6}."""
        xs = [feats[f] for f in self.in_features]  # res2..res5
        C = self.out_channels

        init = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")  # xavier
        # explicit dtype: flax otherwise promotes activations back to the
        # f32 param dtype, silently undoing mixed precision
        dt = self.compute_dtype if self.compute_dtype != jnp.float32 else None
        laterals = [
            nn.Conv(C, (1, 1), kernel_init=init, name=f"lateral_{f}", dtype=dt)(
                x.astype(self.compute_dtype)
            )
            for f, x in zip(self.in_features, xs)
        ]

        # Top-down: start at the coarsest level.
        tds = [laterals[-1]]
        for lat in laterals[-2::-1]:
            up = _batched_upsample(tds[-1], lat.shape[1:3])
            tds.append(lat + up)
        tds = tds[::-1]  # finest first

        outs = {}
        for f, td in zip(self.in_features, tds):
            p_name = f.replace("res", "p")
            outs[p_name] = nn.Conv(
                C, (3, 3), padding=((1, 1), (1, 1)), kernel_init=init,
                name=f"output_{f}", dtype=dt,
            )(td)

        # P6: stride-2 subsample of P5 (d2 LastLevelMaxPool, kernel 1).
        outs["p6"] = outs["p5"][:, ::2, ::2, :]
        return outs


def _batched_upsample(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """(B, H, W, C) nearest x2 upsample cropped to out_hw."""
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return x[:, : out_hw[0], : out_hw[1], :]
