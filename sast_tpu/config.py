"""Typed configuration tree for SAST-TPU.

Reimplements the *semantics* of the reference Hydra config system
(/root/reference/config/*.yaml and /root/reference/config/modifier.py:10-48):
resolution rounding to a multiple of ``32 * partition_split_32``, derivation of
attention partition sizes from the model resolution, per-dataset class counts,
and the tiny/small/base/large experiment overlays — expressed as plain Python
dataclasses so that configs are introspectable, hashable (for jit static
arguments), and need no external config engine.
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Any, Dict, Mapping, Optional, Tuple


def _round_up(x: int, multiple: int) -> int:
    return int(math.ceil(x / multiple) * multiple)


# ---------------------------------------------------------------------------
# Dataset
# ---------------------------------------------------------------------------

# Native sensor resolutions (reference: data/utils/spatial.py:5-27).
DATASET_RES_HW: Dict[str, Tuple[int, int]] = {
    "gen1": (240, 304),
    "gen4": (720, 1280),
}
DATASET_NUM_CLASSES: Dict[str, int] = {"gen1": 2, "gen4": 3}
# gen1: (car, pedestrian); gen4: (pedestrian, two-wheeler, car)
DATASET_CLASSES: Dict[str, Tuple[str, ...]] = {
    "gen1": ("car", "pedestrian"),
    "gen4": ("pedestrian", "two-wheeler", "car"),
}


@dataclass(frozen=True)
class ZoomAugConfig:
    prob: float = 0.8
    zoom_in_weight: float = 8.0
    zoom_out_weight: float = 2.0
    zoom_in_min: float = 1.0
    zoom_in_max: float = 1.5
    zoom_out_min: float = 1.0
    zoom_out_max: float = 1.2


@dataclass(frozen=True)
class AugmentConfig:
    """Spatial augmentation (reference: config/dataset/base.yaml data_augmentation)."""

    prob_hflip: float = 0.5
    rotate_prob: float = 0.0
    rotate_min_angle_deg: float = 2.0
    rotate_max_angle_deg: float = 6.0
    zoom: ZoomAugConfig = field(default_factory=ZoomAugConfig)
    # Stream-mode zoom only zooms out (reference base.yaml stream group).
    zoom_out_only: bool = False


@dataclass(frozen=True)
class DatasetConfig:
    name: str = "gen1"
    path: str = ""
    # 'random' | 'stream' | 'mixed'
    train_sampling: str = "mixed"
    eval_sampling: str = "stream"
    mixed_w_stream: float = 1.0
    mixed_w_random: float = 1.0
    weighted_sampling: bool = False
    ev_repr_name: str = "stacked_histogram_dt=50_nbins=10"
    sequence_length: int = 21  # gen1 experiment overlay; gen4 uses 5
    downsample_by_factor_2: bool = False  # gen4: True
    only_load_end_labels: bool = False
    data_augmentation_random: AugmentConfig = field(default_factory=AugmentConfig)
    data_augmentation_stream: AugmentConfig = field(
        default_factory=lambda: AugmentConfig(
            zoom=ZoomAugConfig(prob=0.5, zoom_in_weight=0.0, zoom_out_weight=1.0),
            zoom_out_only=True,
        )
    )

    # Test/synthetic hook: force a native sensor resolution instead of the
    # dataset's real one (tiny geometries compile in seconds on CPU).
    resolution_hw_override: Optional[Tuple[int, int]] = None

    @property
    def resolution_hw(self) -> Tuple[int, int]:
        if self.resolution_hw_override is not None:
            return self.resolution_hw_override
        hw = DATASET_RES_HW[self.name]
        if self.downsample_by_factor_2:
            return (hw[0] // 2, hw[1] // 2)
        return hw

    @property
    def num_classes(self) -> int:
        return DATASET_NUM_CLASSES[self.name]


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AttentionConfig:
    # Spatial size (h, w) of one attention window == grid cell layout.
    # Derived: partition_size = model_hw // (32 * partition_split_32).
    partition_size: Tuple[int, int] = (8, 10)
    dim_head: int = 32
    attention_bias: bool = True
    mlp_activation: str = "gelu"
    mlp_bias: bool = True
    mlp_ratio: int = 4
    drop_mlp: float = 0.0
    drop_path: float = 0.0
    ls_init_value: float = 1e-5
    enable_cb: bool = False  # Context Broadcasting
    # Runtime window-density crossover for the Pallas sparse kernel (used
    # only when the model is built with use_pallas): below this fraction of
    # kept windows the kernel runs, above it the batched XLA path.
    # Default 1.0 = always the kernel (no lax.cond): measured on v5e, the
    # cond's fusion barrier costs more than adaptive routing saves
    # (XLA branch 0.51 -> 2.36 ms inside cond at the full-model level).
    pallas_density_threshold: float = 1.0
    # Dense fused Pallas block kernel (ops/pallas/fused_block.py): computes
    # the masked block tile-by-tile in VMEM. Numerically identical to the
    # XLA path; measured 6-11% faster at the stage-1/2 layer geometries but
    # NEUTRAL at the full-model level (XLA already overlaps the block with
    # neighboring ops), so it stays opt-in. Auto-falls back to plain XLA
    # off-TPU, under stochastic regularizers, or with enable_cb.
    fused_block: bool = False
    # Budget-gather compute sparsity (training + eval): gather the kept-first
    # K = ceil(budget * num_windows) windows into a compact tensor, run the
    # batched masked block on it, scatter back — the reference's dynamic
    # gather (SAST.py:199-255) with a static budget. Exact at any density
    # (lax.cond falls back to the dense path when selection exceeds the
    # budget). 0 disables.
    gather_budget: float = 0.0
    amp: float = 2e-4       # 'AMP' selection amplification constant
    bounce: float = 1e-3    # 'BOUNCE' threshold slack
    norm_eps: float = 1e-5
    # Force the window/grid partition transpose to materialize on the C-wide
    # activation (optimization_barrier right after the partition) instead of
    # letting XLA defer it into the first layout-constrained consumer — the
    # 3C-wide qkv product at stage 0 (2 x 180 us/step relayouts in the gen4
    # trace, docs/DESIGN.md 6d). Numerically the barrier is an identity
    # (tests/test_model.py test_pin_partition_layout_is_numerically_identity).
    # Default ON since round 4: measured by scripts/ablate_layout_pin.py and
    # scripts/profile_train.py --pin on hardware — gen4-base b4 inference
    # 4.459 -> 4.139 ms/step (+7.2%), gen1-base 1.417 -> 1.366 ms (+3.6%),
    # gen1-base B8 T21 train step 235.5 -> 229.1 ms with temp HBM
    # 2.75 -> 2.68 GiB.
    pin_partition_layout: bool = True


@dataclass(frozen=True)
class LstmConfig:
    dws_conv: bool = False
    dws_conv_only_hidden: bool = True
    dws_conv_kernel_size: int = 3
    drop_cell_update: float = 0.0


@dataclass(frozen=True)
class BackboneConfig:
    name: str = "SASTRNN"
    input_channels: int = 20
    enable_masking: bool = False
    partition_split_32: int = 1  # gen1: 1, gen4: 2
    embed_dim: int = 64
    dim_multiplier: Tuple[int, ...] = (1, 2, 4, 8)
    num_blocks: Tuple[int, ...] = (1, 1, 1, 1)
    stem_patch_size: int = 4
    downsample_overlap: bool = True
    downsample_norm_affine: bool = True
    # Fused Pallas stem conv (ops/pallas/stem_conv.py): 2.6x faster than
    # XLA's conv lowering on v5e and numerically identical. Auto-falls back
    # to XLA off-TPU or on unsupported shapes, so it is safe as a default.
    stem_pallas: bool = True
    # Pallas density pyramid (ops/pallas/density.py): every XLA lowering of
    # non_zero_ratio is ~40x off the bandwidth roof at the shipped uint8
    # geometries. Same auto-fallback rules as the stem kernel.
    ratio_pallas: bool = True
    # Fuse the density pyramid INTO the stem kernel (single input fetch for
    # both ops; ops/pallas/stem_conv.py stem_conv_density_7x4) when the
    # static gates hold (TPU, single device, u8 input, fusable shape —
    # models/backbone.py _fused_stem_density_dispatch). Falls back to the
    # standalone kernels otherwise; numerically identical either way.
    # Default ON since round 5: scripts/ablate_fused_stem.py (honest slope
    # protocol, dispatch-gate asserted) measured 4.144 -> 4.029 ms/step on
    # the gen4-base b4 streaming step (965 -> 993 fps, +2.9%) on v5e.
    fuse_stem_density: bool = True
    # Raw-fetch stem (ops/pallas/stem_conv.py stem_conv_raw_7x4): the kernel
    # reads the NATIVE (B, H, W, C) uint8 tensor directly — the edge pad,
    # the channel pad and the u8->bf16 convert/relayout prologue (~250
    # us/step at the gen4-base geometry, round-4 trace) all move into VMEM,
    # at the cost of 80-lane (4*C) instead of 128-lane matmul operands.
    # Same dispatch gates as the fused kernel plus stem_raw_supported;
    # numerically identical (interpret-mode parity + TPU-guard tests).
    # Default ON since round 5: scripts/ablate_raw_stem.py (slope protocol)
    # measured 4.033 -> 3.821 ms/step on the gen4-base b4 streaming step
    # (992 -> 1047 fps, +5.5%) and 2.537 -> 1.964 ms/step on gen1-base b8
    # (1.29x) on v5e.
    stem_raw_fetch: bool = True
    attention: AttentionConfig = field(default_factory=AttentionConfig)
    lstm: LstmConfig = field(default_factory=LstmConfig)
    in_res_hw: Tuple[int, int] = (256, 320)

    @property
    def num_stages(self) -> int:
        return len(self.num_blocks)

    @property
    def stage_dims(self) -> Tuple[int, ...]:
        return tuple(self.embed_dim * m for m in self.dim_multiplier)

    @property
    def stage_strides(self) -> Tuple[int, ...]:
        strides = []
        s = 1
        for i in range(self.num_stages):
            s *= self.stem_patch_size if i == 0 else 2
            strides.append(s)
        return tuple(strides)


@dataclass(frozen=True)
class FpnConfig:
    name: str = "PAFPN"
    depth: float = 0.67
    in_stages: Tuple[int, ...] = (2, 3, 4)
    depthwise: bool = False
    act: str = "silu"


@dataclass(frozen=True)
class HeadConfig:
    name: str = "YoloX"
    num_classes: int = 2
    depthwise: bool = False
    act: str = "silu"
    # Static-shape SimOTA budgets (TPU reformulation of the reference's
    # dynamic per-image loops, yolo_head.py:452-606).
    max_gt: int = 40          # padded ground-truth budget per frame
    simota_topk: int = 10     # n_candidate_k for dynamic-k estimation


@dataclass(frozen=True)
class PostprocessConfig:
    confidence_threshold: float = 0.01
    nms_threshold: float = 0.45
    # Static budgets for the on-device NMS (TPU has no dynamic-output NMS).
    pre_nms_topk: int = 1000
    max_detections: int = 300


@dataclass(frozen=True)
class ModelConfig:
    name: str = "rnndet"
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    fpn: FpnConfig = field(default_factory=FpnConfig)
    head: HeadConfig = field(default_factory=HeadConfig)
    postprocess: PostprocessConfig = field(default_factory=PostprocessConfig)
    # Computation dtype for the forward pass; params stay fp32.
    compute_dtype: str = "bfloat16"


# ---------------------------------------------------------------------------
# Training
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LRSchedulerConfig:
    use: bool = True
    total_steps: int = 600_000
    pct_start: float = 0.005
    div_factor: float = 20.0       # init_lr = max_lr / div_factor
    final_div_factor: float = 10_000.0  # final_lr = max_lr / final_div_factor


@dataclass(frozen=True)
class TrainingConfig:
    precision: str = "bfloat16"
    max_steps: int = 600_000
    learning_rate: float = 2e-4
    weight_decay: float = 0.0
    gradient_clip_val: float = 1.0  # clip by value, reference train.py:169
    lr_scheduler: LRSchedulerConfig = field(default_factory=LRSchedulerConfig)
    batch_size_train: int = 8
    batch_size_eval: int = 8
    num_workers_train: int = 6
    num_workers_eval: int = 2
    # Per-lane labeled-frame budget (static): frames with labels inside a clip
    # that participate in the detection loss.
    max_labeled_frames_per_lane: int = 5
    ema_decay: float = 0.0  # 0 disables EMA
    seed: Optional[int] = None
    # BPTT rematerialization policy for the backbone scan step:
    #   "full" — full remat (save only the scan carry); round-4 sweep on
    #            hardware (scripts/profile_train.py): FASTEST on both
    #            production recipes (gen1-base 234.6 vs 273.0 ms, gen4-base
    #            368.1 vs 416.0 ms vs "dots") at 3.7x/2.2x less temp HBM —
    #            the train step is HBM-bound, so recomputing beats storing
    #   "dots" — dots_saveable (save matmul/conv outputs); more memory,
    #            ~12-14% slower on v5e
    #   "none" — no remat (save everything); OOMs both production recipes
    #            on one v5e (34.7 GiB > 15.75 GiB at gen1-base B8 T21)
    remat_policy: str = "full"


@dataclass(frozen=True)
class ExperimentConfig:
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)

    @property
    def in_res_hw(self) -> Tuple[int, int]:
        return self.model.backbone.in_res_hw


# ---------------------------------------------------------------------------
# Dynamic modification (reference: config/modifier.py:10-48)
# ---------------------------------------------------------------------------


def resolve_config(cfg: ExperimentConfig) -> ExperimentConfig:
    """Derive model resolution / partition sizes / class count from the dataset.

    Mirrors ``dynamically_modify_train_config``: rounds the dataloading H, W up
    to a multiple of ``32 * partition_split_32``, sets
    ``attention.partition_size = hw // (32 * partition_split_32)`` and the head
    class count.
    """
    ds = cfg.dataset
    bb = cfg.model.backbone
    split = bb.partition_split_32
    assert split in (1, 2, 4), split
    multiple = 32 * split
    hw = ds.resolution_hw
    mdl_hw = (_round_up(hw[0], multiple), _round_up(hw[1], multiple))
    partition_size = (mdl_hw[0] // multiple, mdl_hw[1] // multiple)
    assert (mdl_hw[0] // 32) % partition_size[0] == 0
    assert (mdl_hw[1] // 32) % partition_size[1] == 0

    backbone = dataclasses.replace(
        bb,
        in_res_hw=mdl_hw,
        attention=dataclasses.replace(bb.attention, partition_size=partition_size),
    )
    head = dataclasses.replace(cfg.model.head, num_classes=ds.num_classes)
    model = dataclasses.replace(cfg.model, backbone=backbone, head=head)
    return dataclasses.replace(cfg, model=model)


# ---------------------------------------------------------------------------
# Presets (reference: config/experiment/{gen1,gen4}/{tiny,small,base,large}.yaml)
# ---------------------------------------------------------------------------

_SIZE_OVERLAYS: Dict[str, Dict[str, Any]] = {
    "tiny": {"embed_dim": 32, "fpn_depth": 0.33},
    # small overrides dim_head to 24 (reference
    # config/experiment/{gen1,gen4}/small.yaml:10): embed 48 is not
    # divisible by the default dim_head 32 — stage 1 would get 1.5 heads.
    "small": {"embed_dim": 48, "fpn_depth": 0.33, "dim_head": 24},
    "base": {"embed_dim": 64, "fpn_depth": 0.67},
    "large": {"embed_dim": 96, "fpn_depth": 0.67},
}


def get_config(dataset: str = "gen1", size: str = "base", **overrides: Any) -> ExperimentConfig:
    """Build a resolved experiment config.

    ``get_config('gen1', 'base')`` reproduces the reference gen1/base.yaml
    experiment; ``get_config('gen4', 'base')`` the gen4 one (downsample-by-2,
    sequence length 5, lr 3.46e-4, batch 12, partition split 2).
    """
    assert dataset in DATASET_RES_HW, dataset
    overlay = _SIZE_OVERLAYS[size]

    if dataset == "gen1":
        ds = DatasetConfig(name="gen1", sequence_length=21)
        split = 1
        train = TrainingConfig(max_labeled_frames_per_lane=5)
    else:
        ds = DatasetConfig(name="gen4", sequence_length=5, downsample_by_factor_2=True)
        split = 2
        train = TrainingConfig(
            learning_rate=3.46e-4,
            batch_size_train=12,
            batch_size_eval=12,
            max_labeled_frames_per_lane=3,
        )

    backbone = BackboneConfig(embed_dim=overlay["embed_dim"], partition_split_32=split)
    if "dim_head" in overlay:
        backbone = dataclasses.replace(
            backbone,
            attention=dataclasses.replace(
                backbone.attention, dim_head=overlay["dim_head"]
            ),
        )
    model = ModelConfig(backbone=backbone, fpn=FpnConfig(depth=overlay["fpn_depth"]))
    cfg = ExperimentConfig(dataset=ds, model=model, training=train)
    cfg = _apply_overrides(cfg, overrides)
    return resolve_config(cfg)


def get_test_config(in_res_hw: Tuple[int, int] = (64, 96)) -> ExperimentConfig:
    """A miniature config for fast unit tests (CPU-compilable in seconds).

    Every stage resolution must be divisible by the partition size; with
    in_res (64, 96), stage maps are (16,24)/(8,12)/(4,6)/(2,3) and partition
    (2, 3) divides them all.
    """
    backbone = BackboneConfig(
        embed_dim=32,
        in_res_hw=in_res_hw,
        attention=AttentionConfig(partition_size=(2, 3), dim_head=16),
    )
    model = ModelConfig(
        backbone=backbone,
        fpn=FpnConfig(depth=0.33),
        head=HeadConfig(num_classes=2, max_gt=8),
        postprocess=PostprocessConfig(pre_nms_topk=64, max_detections=16),
        compute_dtype="float32",
    )
    ds = DatasetConfig(name="gen1", sequence_length=4)
    train = TrainingConfig(
        batch_size_train=2,
        batch_size_eval=2,
        max_labeled_frames_per_lane=2,
        max_steps=100,
    )
    return ExperimentConfig(dataset=ds, model=model, training=train)


def _apply_overrides(cfg: ExperimentConfig, overrides: Mapping[str, Any]) -> ExperimentConfig:
    """Apply dotted-path overrides, e.g. ``_apply_overrides(cfg, {"model.backbone.embed_dim": 32})``."""
    for key, value in overrides.items():
        parts = key.split(".")
        cfg = _replace_path(cfg, parts, value)
    return cfg


def _replace_path(obj: Any, parts: list, value: Any) -> Any:
    if len(parts) == 1:
        return dataclasses.replace(obj, **{parts[0]: value})
    child = getattr(obj, parts[0])
    return dataclasses.replace(obj, **{parts[0]: _replace_path(child, parts[1:], value)})
