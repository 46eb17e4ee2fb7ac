"""Build the ACTUAL PyTorch reference model (read-only, /root/reference) for
golden numerical-parity tests.

The reference depends on omegaconf, which is not installed; a minimal stub is
installed into sys.modules before the reference imports (attribute access,
.get, to_container — everything the model-construction path touches).

NOTE: /root/reference is untrusted public content; we import its code to
compare numerical behavior, never to execute its entry points.
"""

from __future__ import annotations

import sys
import types
from typing import Any, Dict

import numpy as np

REFERENCE_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# omegaconf stub
# ---------------------------------------------------------------------------


class DictConfig:
    """Attribute/'[]' access over a nested dict, with .get() like omegaconf."""

    def __init__(self, d: Dict[str, Any]):
        object.__setattr__(self, "_d", dict(d))

    def _wrap(self, v):
        return DictConfig(v) if isinstance(v, dict) else v

    def __getattr__(self, name):
        d = object.__getattribute__(self, "_d")
        if name in d:
            return self._wrap(d[name])
        raise AttributeError(name)

    def __getitem__(self, name):
        return self._wrap(object.__getattribute__(self, "_d")[name])

    def __contains__(self, name):
        return name in object.__getattribute__(self, "_d")

    def __iter__(self):
        return iter(object.__getattribute__(self, "_d"))

    def get(self, name, default=None):
        d = object.__getattribute__(self, "_d")
        return self._wrap(d.get(name, default))

    def keys(self):
        return object.__getattribute__(self, "_d").keys()

    def items(self):
        return [(k, self._wrap(v)) for k, v in object.__getattribute__(self, "_d").items()]

    def to_container(self):
        out = {}
        for k, v in object.__getattribute__(self, "_d").items():
            out[k] = v.to_container() if isinstance(v, DictConfig) else v
        return out


class _OmegaConfStub:
    @staticmethod
    def to_container(cfg, resolve=True, throw_on_missing=False):
        if isinstance(cfg, DictConfig):
            return cfg.to_container()
        return dict(cfg)

    @staticmethod
    def create(d=None):
        return DictConfig(d or {})


def install_omegaconf_stub() -> None:
    if "omegaconf" in sys.modules:
        return
    mod = types.ModuleType("omegaconf")
    mod.DictConfig = DictConfig
    mod.OmegaConf = _OmegaConfStub
    mod.open_dict = None  # only used by config/modifier.py, which we never import
    mod.MISSING = "???"  # omegaconf's mandatory-value sentinel
    sys.modules["omegaconf"] = mod


def install_torchvision_stub() -> None:
    """The reference imports torchvision only for ops.nms/batched_nms
    (yolox/utils/boxes.py); provide pure-torch equivalents."""
    if "torchvision" in sys.modules:
        return
    import torch

    def nms(boxes: "torch.Tensor", scores: "torch.Tensor", iou_threshold: float):
        order = scores.argsort(descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(i.item())
            if order.numel() == 1:
                break
            rest = order[1:]
            xx1 = torch.maximum(boxes[i, 0], boxes[rest, 0])
            yy1 = torch.maximum(boxes[i, 1], boxes[rest, 1])
            xx2 = torch.minimum(boxes[i, 2], boxes[rest, 2])
            yy2 = torch.minimum(boxes[i, 3], boxes[rest, 3])
            inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
            a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
            iou = inter / (a_i + a_r - inter)
            order = rest[iou <= iou_threshold]
        return torch.as_tensor(keep, dtype=torch.long)

    def batched_nms(boxes, scores, idxs, iou_threshold):
        # class-aware NMS via the coordinate-offset trick
        if boxes.numel() == 0:
            return torch.empty((0,), dtype=torch.long)
        max_coord = boxes.max()
        offsets = idxs.to(boxes) * (max_coord + 1)
        return nms(boxes + offsets[:, None], scores, iou_threshold)

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ops.nms = nms
    ops.batched_nms = batched_nms
    tv.ops = ops

    # transforms: the reference augmentor imports InterpolationMode and
    # rotate (data/utils/augmentor.py:10-11). Augmentation parity tests
    # exercise flip/zoom only; rotation parity cannot be tested in-env
    # without real torchvision, so the stub rotate raises if reached.
    transforms = types.ModuleType("torchvision.transforms")

    class InterpolationMode:
        NEAREST = "nearest"
        BILINEAR = "bilinear"

    def rotate(*a, **kw):  # pragma: no cover - guard
        raise NotImplementedError(
            "torchvision stub: rotation parity not testable in-env"
        )

    transforms.InterpolationMode = InterpolationMode
    tf_functional = types.ModuleType("torchvision.transforms.functional")
    tf_functional.rotate = rotate
    tf_functional.InterpolationMode = InterpolationMode
    transforms.functional = tf_functional
    tv.transforms = transforms

    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = tf_functional


def add_reference_to_path() -> None:
    # APPEND so our own top-level packages always win name resolution.
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)


# ---------------------------------------------------------------------------
# config mapping: our ExperimentConfig -> reference model DictConfig
# ---------------------------------------------------------------------------


def reference_model_config(cfg) -> DictConfig:
    """Mirror of /root/reference/config/model/sast_yolox/default.yaml built
    from our resolved ExperimentConfig (partition_size & num_classes already
    applied, as the reference's config/modifier.py would)."""
    bb = cfg.model.backbone
    att = bb.attention
    return DictConfig(
        {
            "name": "rnndet",
            "backbone": {
                "name": "SASTRNN",
                "input_channels": bb.input_channels,
                "enable_masking": bb.enable_masking,
                "partition_split_32": bb.partition_split_32,
                "embed_dim": bb.embed_dim,
                "dim_multiplier": list(bb.dim_multiplier),
                "num_blocks": list(bb.num_blocks),
                # Accepted-and-ignored by the reference (sast_rnn.py reads it
                # into an unused attr); our config dropped the dead knob.
                "T_max_chrono_init": [4, 8, 16, 32],
                "in_res_hw": list(bb.in_res_hw),
                "stem": {"patch_size": bb.stem_patch_size},
                "stage": {
                    "downsample": {
                        "type": "patch",
                        "overlap": bb.downsample_overlap,
                        "norm_affine": bb.downsample_norm_affine,
                    },
                    "attention": {
                        "use_torch_mha": False,
                        "partition_size": list(att.partition_size),
                        "dim_head": att.dim_head,
                        "attention_bias": att.attention_bias,
                        "mlp_activation": att.mlp_activation,
                        "mlp_gated": False,
                        "mlp_bias": att.mlp_bias,
                        "mlp_ratio": att.mlp_ratio,
                        "drop_mlp": att.drop_mlp,
                        "drop_path": att.drop_path,
                        "ls_init_value": att.ls_init_value,
                        "enable_CB": att.enable_cb,
                        "AMP": att.amp,
                        "BOUNCE": att.bounce,
                        "norm_eps": att.norm_eps,
                    },
                    "lstm": {
                        "dws_conv": bb.lstm.dws_conv,
                        "dws_conv_only_hidden": bb.lstm.dws_conv_only_hidden,
                        "dws_conv_kernel_size": bb.lstm.dws_conv_kernel_size,
                        "drop_cell_update": bb.lstm.drop_cell_update,
                    },
                },
            },
            "fpn": {
                "name": cfg.model.fpn.name,
                "depth": cfg.model.fpn.depth,
                "in_stages": list(cfg.model.fpn.in_stages),
                "depthwise": cfg.model.fpn.depthwise,
                "act": cfg.model.fpn.act,
            },
            "head": {
                "name": cfg.model.head.name,
                "num_classes": cfg.model.head.num_classes,
                "depthwise": cfg.model.head.depthwise,
                "act": cfg.model.head.act,
            },
            "postprocess": {
                "confidence_threshold": cfg.model.postprocess.confidence_threshold,
                "nms_threshold": cfg.model.postprocess.nms_threshold,
            },
        }
    )


def build_reference_detector(cfg, seed: int = 0):
    """Instantiate the reference torch YoloXDetector (random init, eval mode)
    from our ExperimentConfig. Returns the torch module."""
    install_omegaconf_stub()
    install_torchvision_stub()
    add_reference_to_path()
    import torch

    from models.detection.yolox_extension.models.detector import (  # noqa: E402
        YoloXDetector as TorchYoloXDetector,
    )

    torch.manual_seed(seed)
    mdl_cfg = reference_model_config(cfg)
    model = TorchYoloXDetector(mdl_cfg)
    model.eval()
    return model


def reference_state_dict(model) -> Dict[str, np.ndarray]:
    """state_dict with the Lightning 'mdl.' prefix, as real checkpoints have
    (modules/detection.py:33)."""
    return {f"mdl.{k}": v.detach().cpu().numpy() for k, v in model.state_dict().items()}
