"""YOLO PAFPN neck over backbone stages (2, 3, 4).

NHWC equivalent of the reference YOLOPAFPN
(/root/reference/models/detection/yolox_extension/models/yolo_pafpn.py:18-139):
top-down upsample + CSP fusion, then bottom-up stride-2 conv + CSP fusion.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sast_tpu.models.layers import BaseConv, CSPLayer, DWConv

Dtype = Any


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (NHWC)."""
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)


class YoloPAFPN(nn.Module):
    depth: float = 1.0
    in_channels: Tuple[int, ...] = (256, 512, 1024)
    depthwise: bool = False
    act: str = "silu"
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        features: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
        *,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """features: (x2, x1, x0) at strides (8, 16, 32) — shallowest first."""
        x2, x1, x0 = features
        c0, c1, c2 = self.in_channels
        n = round(3 * self.depth)
        Conv = DWConv if self.depthwise else BaseConv
        kw = dict(act=self.act, dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        csp_kw = dict(
            shortcut=False, depthwise=self.depthwise, act=self.act,
            dtype=self.dtype, bn_axis_name=self.bn_axis_name,
        )

        fpn_out0 = BaseConv(c1, 1, 1, **kw, name="lateral_conv0")(x0, train=train)
        f_out0 = jnp.concatenate([_upsample2x(fpn_out0), x1], axis=-1)
        f_out0 = CSPLayer(c1, n=n, **csp_kw, name="C3_p4")(f_out0, train=train)

        fpn_out1 = BaseConv(c0, 1, 1, **kw, name="reduce_conv1")(f_out0, train=train)
        f_out1 = jnp.concatenate([_upsample2x(fpn_out1), x2], axis=-1)
        pan_out2 = CSPLayer(c0, n=n, **csp_kw, name="C3_p3")(f_out1, train=train)

        p_out1 = Conv(c0, 3, 2, **kw, name="bu_conv2")(pan_out2, train=train)
        p_out1 = jnp.concatenate([p_out1, fpn_out1], axis=-1)
        pan_out1 = CSPLayer(c1, n=n, **csp_kw, name="C3_n3")(p_out1, train=train)

        p_out0 = Conv(c1, 3, 2, **kw, name="bu_conv1")(pan_out1, train=train)
        p_out0 = jnp.concatenate([p_out0, fpn_out0], axis=-1)
        pan_out0 = CSPLayer(c2, n=n, **csp_kw, name="C3_n4")(p_out0, train=train)

        return pan_out2, pan_out1, pan_out0
