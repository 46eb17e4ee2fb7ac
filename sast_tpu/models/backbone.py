"""Recurrent SAST backbone: 4 stages of (downsample, SAST blocks, ConvLSTM).

TPU-native equivalent of the reference RNNDetector
(/root/reference/models/detection/recurrent_backbone/sast_rnn.py:67-287):
NHWC throughout, per-stage sinusoidal position embeddings precomputed as
constants, event-density ratios from the raw input, recurrent state as an
explicit pytree suitable for ``jax.lax.scan`` carries and pjit sharding.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sast_tpu.config import BackboneConfig
from sast_tpu.models.layers import ConvDownsample, DWSConvLSTM2d
from sast_tpu.models.sast import SASTBlock
from sast_tpu.ops.posemb import position_embedding_sine
from sast_tpu.ops.sparse import non_zero_ratio

Dtype = Any
# (hidden, cell) per stage.
LstmState = Tuple[jnp.ndarray, jnp.ndarray]
LstmStates = List[Optional[LstmState]]


def _fused_stem_density_dispatch(cfg: BackboneConfig, x: jnp.ndarray) -> bool:
    """Static gate for computing the density ratio inside the stem kernel
    (ops/pallas/stem_conv.py stem_conv_density_7x4): one input fetch serves
    both ops, removing non_zero_ratio's separate full-resolution read and
    its pad/merge relayout. All conditions are trace-time static; any miss
    falls back to the standalone non_zero_ratio (Pallas or XLA), which is
    numerically identical."""
    from sast_tpu.ops.pallas.stem_conv import stem_density_fusable

    return (
        cfg.fuse_stem_density
        and cfg.stem_pallas
        and cfg.ratio_pallas
        and cfg.num_stages == 4
        and jax.default_backend() == "tpu"
        # GSPMD treats the Pallas custom call as opaque; multi-device
        # meshes use the XLA formulations (same rule as the other kernels).
        and jax.device_count() == 1
        and stem_density_fusable(x.shape, x.dtype)
    )


class SASTStage(nn.Module):
    """One backbone stage: strided-conv downsample -> SAST blocks -> ConvLSTM.

    Mirrors RNNDetectorStage (sast_rnn.py:221-287). All stages carry an LSTM
    (the reference hardcodes enable_lstm=True, sast_rnn.py:123).
    """

    cfg: BackboneConfig
    stage_dim: int
    downsample_factor: int
    num_blocks: int
    enable_token_masking: bool = False
    dtype: Optional[Dtype] = None
    use_pallas: bool = False
    # Stage-0 fused dispatch: the downsample kernel also emits the full
    # (B, num_stages, C_in) density ratio from its own input fetch; ``r``
    # must then be passed as None and the stage returns the ratio for the
    # backbone to feed the later stages.
    compute_density: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        lstm_state: Optional[LstmState],
        token_mask: Optional[jnp.ndarray],
        r: Optional[jnp.ndarray],
        *,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, LstmState, jnp.ndarray, Optional[jnp.ndarray]]:
        cfg = self.cfg
        downsample = ConvDownsample(
            dim_out=self.stage_dim,
            downsample_factor=self.downsample_factor,
            overlap=cfg.downsample_overlap,
            norm_affine=cfg.downsample_norm_affine,
            dtype=self.dtype,
            use_pallas_stem=cfg.stem_pallas,
            with_density=self.compute_density,
            raw_fetch=cfg.stem_raw_fetch,
            name="downsample",
        )
        ratio = None
        if self.compute_density:
            assert r is None, "compute_density stages derive r themselves"
            x, ratio = downsample(x)
            r = ratio[:, 0].astype(self.dtype or jnp.float32)
        else:
            x = downsample(x)

        if token_mask is not None:
            assert self.enable_token_masking, "No mask token present in this stage"
            mask_token = self.param(
                "mask_token",
                nn.initializers.normal(stddev=0.02),
                (1, 1, 1, self.stage_dim),
            )
            x = jnp.where(token_mask[..., None], mask_token.astype(x.dtype), x)

        H, W = x.shape[1], x.shape[2]
        pos = jnp.asarray(
            position_embedding_sine(H, W, num_pos_feats=self.stage_dim // 2)
        )

        p_total = jnp.zeros((), jnp.float32)
        masks = None
        for i in range(self.num_blocks):
            x, p_count, masks = SASTBlock(
                dim=self.stage_dim,
                attention=cfg.attention,
                first_block=(i == 0),
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                name=f"block{i}",
            )(x, pos, r, masks, deterministic=deterministic)
            p_total = p_total + p_count

        h, c = DWSConvLSTM2d(
            dim=self.stage_dim,
            dws_conv=cfg.lstm.dws_conv,
            dws_conv_only_hidden=cfg.lstm.dws_conv_only_hidden,
            dws_conv_kernel_size=cfg.lstm.dws_conv_kernel_size,
            cell_update_dropout=cfg.lstm.drop_cell_update,
            dtype=self.dtype,
            name="lstm",
        )(x, lstm_state, deterministic=deterministic)
        return h, (h, c), p_total, ratio


class SASTBackbone(nn.Module):
    """4-stage recurrent sparse-transformer backbone.

    __call__(x, prev_states, token_mask) ->
        (features {stage_number: (B,h,w,c)}, new_states, P)

    x is NHWC (B, H, W, input_channels). ``P`` is the per-stage selected-token
    telemetry (stacked, (num_stages,)).
    """

    cfg: BackboneConfig
    dtype: Optional[Dtype] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        prev_states: Optional[LstmStates] = None,
        token_mask: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[Dict[int, jnp.ndarray], List[LstmState], jnp.ndarray]:
        cfg = self.cfg
        num_stages = cfg.num_stages
        if prev_states is None:
            prev_states = [None] * num_stages
        assert len(prev_states) == num_stages

        fused_density = _fused_stem_density_dispatch(cfg, x)
        if fused_density:
            r = None  # stage 0's fused stem kernel emits it (one input fetch)
        else:
            r = non_zero_ratio(
                x, num_stages=num_stages, use_pallas=cfg.ratio_pallas
            )  # (B, S, C_in)
        if not jnp.issubdtype(x.dtype, jnp.integer):
            x = x.astype(self.dtype or jnp.float32)
        # else: u8 event histograms flow raw into the stage-0 downsample,
        # which converts on-chip (ConvDownsample / Pallas stem fast path).

        features: Dict[int, jnp.ndarray] = {}
        states: List[LstmState] = []
        p_stages = []
        for idx in range(num_stages):
            compute_density = fused_density and idx == 0
            stage_out, state, p, ratio = SASTStage(
                cfg=cfg,
                stage_dim=cfg.stage_dims[idx],
                downsample_factor=cfg.stem_patch_size if idx == 0 else 2,
                num_blocks=cfg.num_blocks[idx],
                enable_token_masking=cfg.enable_masking and idx == 0,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                compute_density=compute_density,
                name=f"stage{idx}",
            )(
                x,
                prev_states[idx],
                token_mask if idx == 0 else None,
                None
                if compute_density
                else r[:, idx].astype(self.dtype or jnp.float32),
                deterministic=deterministic,
            )
            if compute_density:
                r = ratio  # (B, num_stages, C_in) f32 from the fused kernel
            x = stage_out
            states.append(state)
            features[idx + 1] = state[0]
            p_stages.append(p)
        return features, states, jnp.stack(p_stages)

    def init_states(self, batch_size: int) -> List[LstmState]:
        """Zero recurrent states with static shapes (for scan carries)."""
        cfg = self.cfg
        h0, w0 = cfg.in_res_hw
        states = []
        for idx, stride in enumerate(cfg.stage_strides):
            h, w, c = h0 // stride, w0 // stride, cfg.stage_dims[idx]
            hidden = jnp.zeros((batch_size, h, w, c), self.dtype or jnp.float32)
            cell = jnp.zeros((batch_size, h, w, c), jnp.float32)
            states.append((hidden, cell))
        return states


def zero_states(cfg: BackboneConfig, batch_size: int, dtype=jnp.float32) -> List[LstmState]:
    """Standalone zero-state constructor (no module instance required)."""
    h0, w0 = cfg.in_res_hw
    states = []
    for idx, stride in enumerate(cfg.stage_strides):
        h, w, c = h0 // stride, w0 // stride, cfg.stage_dims[idx]
        states.append(
            (
                jnp.zeros((batch_size, h, w, c), dtype),
                jnp.zeros((batch_size, h, w, c), jnp.float32),
            )
        )
    return states


def stage_feature_shapes(cfg: BackboneConfig) -> Dict[int, Tuple[int, int, int]]:
    """(h, w, c) of each stage's output feature map (1-indexed stages)."""
    h0, w0 = cfg.in_res_hw
    return {
        idx + 1: (h0 // s, w0 // s, cfg.stage_dims[idx])
        for idx, s in enumerate(cfg.stage_strides)
    }
