"""Detector composition root: SAST backbone + PAFPN + YOLOX head.

Equivalent of the reference YoloXDetector
(/root/reference/models/detection/yolox_extension/models/detector.py:18-72)
with the same forward_backbone / forward_detect split, so the training loop
can run the recurrent backbone per timestep and batch only labeled frames
through the detection neck+head.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from sast_tpu.config import ModelConfig
from sast_tpu.models.backbone import LstmState, LstmStates, SASTBackbone
from sast_tpu.models.head import YoloXHead
from sast_tpu.models.pafpn import YoloPAFPN

Dtype = Any


def _dtype_from_str(name: str):
    return {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "float16": jnp.float16}[
        name
    ]


class YoloXDetector(nn.Module):
    config: ModelConfig
    bn_axis_name: Optional[str] = None
    use_pallas: bool = False

    def setup(self):
        cfg = self.config
        dtype = _dtype_from_str(cfg.compute_dtype)
        self.backbone = SASTBackbone(
            cfg=cfg.backbone, dtype=dtype, use_pallas=self.use_pallas
        )
        in_channels = tuple(
            cfg.backbone.stage_dims[s - 1] for s in cfg.fpn.in_stages
        )
        strides = tuple(cfg.backbone.stage_strides[s - 1] for s in cfg.fpn.in_stages)
        self.fpn = YoloPAFPN(
            depth=cfg.fpn.depth,
            in_channels=in_channels,
            depthwise=cfg.fpn.depthwise,
            act=cfg.fpn.act,
            dtype=dtype,
            bn_axis_name=self.bn_axis_name,
        )
        self.head = YoloXHead(
            num_classes=cfg.head.num_classes,
            strides=strides,
            in_channels=in_channels,
            act=cfg.head.act,
            depthwise=cfg.head.depthwise,
            dtype=dtype,
            bn_axis_name=self.bn_axis_name,
        )

    def forward_backbone(
        self,
        x: jnp.ndarray,
        previous_states: Optional[LstmStates] = None,
        token_mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[Dict[int, jnp.ndarray], List[LstmState], jnp.ndarray]:
        """x: (B, H, W, C_in) NHWC event representation."""
        return self.backbone(
            x, previous_states, token_mask, deterministic=deterministic
        )

    def forward_detect(
        self,
        backbone_features: Dict[int, jnp.ndarray],
        *,
        train: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        feats = tuple(backbone_features[s] for s in self.config.fpn.in_stages)
        fpn_feats = self.fpn(feats, train=train)
        return self.head(fpn_feats, train=train)

    def __call__(
        self,
        x: jnp.ndarray,
        previous_states: Optional[LstmStates] = None,
        token_mask: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
    ):
        features, states, p = self.forward_backbone(
            x, previous_states, token_mask, deterministic=not train
        )
        outputs = self.forward_detect(features, train=train)
        return outputs, states, p
