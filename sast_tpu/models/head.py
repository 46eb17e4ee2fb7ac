"""YOLOX decoupled anchor-free detection head (NHWC, static shapes).

Equivalent of the reference YOLOXHead forward path
(/root/reference/models/detection/yolox/models/yolo_head.py:21-289): per-scale
stem + cls/reg towers + 1x1 prediction convs, grid decoding
(xy = (pred + grid) * stride, wh = exp(pred) * stride), focal-style bias init
on the cls/obj predictors (yolo_head.py:154-163).

The head returns a single flattened (B, A, 5 + num_classes) tensor with
decoded boxes and *logit* obj/cls (losses use logits; inference applies
sigmoid), plus static per-anchor grid/stride vectors for SimOTA.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sast_tpu.models.layers import BaseConv, DWConv

Dtype = Any


def build_grids(
    hw_per_level: Sequence[Tuple[int, int]], strides: Sequence[int]
) -> Tuple[np.ndarray, np.ndarray]:
    """Static per-anchor (x, y) cell coords and stride vector.

    Returns grids (A, 2) float32 and strides_vec (A,) float32 with anchors
    ordered level-major, row-major within a level.
    """
    grids = []
    stride_list = []
    for (h, w), s in zip(hw_per_level, strides):
        yv, xv = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        grids.append(np.stack((xv, yv), axis=-1).reshape(-1, 2))
        stride_list.append(np.full((h * w,), s))
    return (
        np.concatenate(grids, axis=0).astype(np.float32),
        np.concatenate(stride_list, axis=0).astype(np.float32),
    )


class YoloXHead(nn.Module):
    num_classes: int
    strides: Tuple[int, ...] = (8, 16, 32)
    in_channels: Tuple[int, ...] = (256, 512, 1024)
    act: str = "silu"
    depthwise: bool = False
    prior_prob: float = 0.01
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        features: Tuple[jnp.ndarray, ...],
        *,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        assert len(features) == len(self.strides)
        # Width scaling per reference yolo_head.py:47-55.
        width = self.in_channels[-1] / 1024
        hidden = int(256 * width)
        Conv = DWConv if self.depthwise else BaseConv
        kw = dict(act=self.act, dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        bias_init = nn.initializers.constant(
            -math.log((1 - self.prior_prob) / self.prior_prob)
        )

        outputs = []
        hw_per_level = []
        for k, x in enumerate(features):
            hw_per_level.append((x.shape[1], x.shape[2]))
            x = BaseConv(hidden, 1, 1, **kw, name=f"stem{k}")(x, train=train)

            cls_feat = Conv(hidden, 3, 1, **kw, name=f"cls_conv{k}_0")(x, train=train)
            cls_feat = Conv(hidden, 3, 1, **kw, name=f"cls_conv{k}_1")(
                cls_feat, train=train
            )
            cls_out = nn.Conv(
                self.num_classes, (1, 1), dtype=self.dtype,
                bias_init=bias_init, name=f"cls_pred{k}",
            )(cls_feat)

            reg_feat = Conv(hidden, 3, 1, **kw, name=f"reg_conv{k}_0")(x, train=train)
            reg_feat = Conv(hidden, 3, 1, **kw, name=f"reg_conv{k}_1")(
                reg_feat, train=train
            )
            reg_out = nn.Conv(4, (1, 1), dtype=self.dtype, name=f"reg_pred{k}")(
                reg_feat
            )
            obj_out = nn.Conv(
                1, (1, 1), dtype=self.dtype, bias_init=bias_init,
                name=f"obj_pred{k}",
            )(reg_feat)

            out = jnp.concatenate([reg_out, obj_out, cls_out], axis=-1)
            outputs.append(out.reshape(out.shape[0], -1, out.shape[-1]))

        raw = jnp.concatenate(outputs, axis=1)  # (B, A, 5 + n_cls)
        grids_np, strides_np = build_grids(hw_per_level, self.strides)
        grids = jnp.asarray(grids_np)
        strides_vec = jnp.asarray(strides_np)

        xy = (raw[..., 0:2].astype(jnp.float32) + grids) * strides_vec[:, None]
        wh = jnp.exp(raw[..., 2:4].astype(jnp.float32)) * strides_vec[:, None]
        decoded = jnp.concatenate(
            [xy, wh, raw[..., 4:].astype(jnp.float32)], axis=-1
        )
        return {
            "preds": decoded,  # (B, A, 5+n): cxcywh in input pixels, logit obj/cls
            "grids": grids,  # (A, 2)
            "strides": strides_vec,  # (A,)
        }


def inference_outputs(preds: jnp.ndarray) -> jnp.ndarray:
    """Decoded predictions with sigmoid obj/cls for postprocessing/NMS."""
    return jnp.concatenate(
        [preds[..., :4], jax.nn.sigmoid(preds[..., 4:])], axis=-1
    )
