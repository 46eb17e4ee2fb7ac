"""SAST block: scene-adaptive sparse transformer layers (TPU-native).

Reimplements the core algorithm of the reference
(/root/reference/models/layers/SAST/SAST.py) with a static-shape masked
formulation instead of dynamic gather/scatter:

Reference semantics (verified against SAST.py:98-255), per token position p:
  * the whole tensor is layer-normed (norm1) unconditionally;
  * if p lies in a *kept window* and is itself a *selected token*, it receives
    norm2 + attention (keys = the other selected tokens of its window; padded
    slots are column-masked with -1e4) + LayerScale residual + gated MLP
    (+ optional Context Broadcasting) + LayerScale residual;
  * every other position passes through as norm1(x).

The reference's per-window top-K gather/pad (SAST.py:270-281) is purely a
batching mechanism for CUDA; masked attention over the full static window set
is mathematically identical and is what XLA:TPU wants (fixed shapes, MXU-sized
batched matmuls). Three execution paths share this parameter tree:

* dense fused Pallas kernel (``fused_block`` config, opt-in): the same
  masked math computed tile-by-tile in VMEM (ops/pallas/fused_block.py);
  exact gradients via an XLA-formulation VJP. Measured 6-11% faster than
  XLA at the stage-1/2 layer geometries but neutral at the full-model
  level, so it is not the default. Falls back to plain XLA off-TPU, under
  active stochastic regularizers (drop_path / MLP dropout at train time),
  or with enable_cb.
* budget-gather (``gather_budget`` config): static-K kept-window gather ->
  batched block -> scatter; measured 15-20% faster than masked XLA in
  forward-only serving below ~40% window density (README sparsity table),
  still slower in training.
* a Pallas window-skipping kernel (ops/pallas/sparse_block.py,
  ``use_pallas``): opt-in and
  measured SLOWER than the batched paths at the shipped window geometries
  (its per-window execution is serial; README table) — kept only as the
  large-window escape hatch and for its hardware parity tests, not as a
  performance path.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sast_tpu.config import AttentionConfig
from sast_tpu.models.layers import get_activation
from sast_tpu.ops.partition import (
    grid_partition,
    grid_reverse,
    window_partition,
    window_reverse,
)
from sast_tpu.ops.sparse import select_windows_and_tokens

Dtype = Any

MASK_VALUE = -1e4  # matches the reference column-mask constant (SAST.py:225)


class PositiveDense(nn.Module):
    """Linear layer with positive weights via exp (reference PositiveLinear,
    SAST.py:305-328). The raw weight is initialized to 1 (SAST.py:76), so the
    effective weight starts at e."""

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.ones, (x.shape[-1], self.features))
        w = jnp.exp(w)
        if self.dtype is not None:
            x, w = x.astype(self.dtype), w.astype(self.dtype)
        return x @ w


class DropPath(nn.Module):
    """Per-sample stochastic depth (leading axis = batch)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


# --- explicit parameter declaration helpers ---------------------------------
# The attention module declares its weights explicitly (instead of through
# nn.Dense/nn.LayerNorm submodules) so the XLA masked path and the Pallas
# window-skipping kernel share one parameter tree. Names and initializers
# match the flax defaults exactly, keeping checkpoint compatibility.


class DenseParams(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class LayerNormParams(nn.Module):
    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones_init(), (features,))
        bias = self.param("bias", nn.initializers.zeros_init(), (features,))
        return scale, bias


class GammaParams(nn.Module):
    init_value: float = 1e-5

    @nn.compact
    def __call__(self, features: int):
        return self.param(
            "gamma", nn.initializers.constant(self.init_value), (features,)
        )


class GatedMlpParams(nn.Module):
    """Parameter container matching GatedMLP's tree: GLU_0/Dense_0 + Dense_0."""

    dim: int
    inner_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        class _GLU(nn.Module):
            inner: int
            dim: int
            use_bias: bool

            @nn.compact
            def __call__(self):
                return DenseParams(2 * self.inner, self.use_bias, name="Dense_0")(
                    self.dim
                )

        w_glu, b_glu = _GLU(self.inner_dim, self.dim, self.use_bias, name="GLU_0")()
        w_out, b_out = DenseParams(self.dim, self.use_bias, name="Dense_0")(
            self.inner_dim
        )
        return w_glu, b_glu, w_out, b_out


def _layernorm(x: jnp.ndarray, scale, bias, eps: float) -> jnp.ndarray:
    """LayerNorm matching flax.linen.LayerNorm(dtype=x.dtype): statistics in
    fp32 (use_fast_variance path), elementwise math in the compute dtype."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0
    )
    inv = (jax.lax.rsqrt(var + eps) * scale).astype(x.dtype)
    return (x - mu.astype(x.dtype)) * inv + bias.astype(x.dtype)


class MaskedSparseAttention(nn.Module):
    """MS-WSA: masked sparse window self-attention + gated MLP.

    Operates on (B, N, hw, C) window-partitioned tokens with a boolean
    ``token_keep`` (B, N, hw). Equivalent to reference MS_WSA
    (SAST.py:167-255) — see module docstring for the proof sketch.
    """

    dim: int
    dim_head: int = 32
    use_bias: bool = True
    ls_init_value: float = 1e-5
    drop_path: float = 0.0
    drop_mlp: float = 0.0
    mlp_ratio: int = 4
    mlp_act: str = "gelu"
    mlp_bias: bool = True
    norm_eps: float = 1e-5
    enable_cb: bool = False
    dtype: Optional[Dtype] = None

    use_pallas: bool = False
    pallas_threshold: float = 0.4  # window-density crossover for lax.cond
    gather_budget: float = 0.0  # static kept-window budget fraction (0 = off)
    # Dense fused Pallas block (ops/pallas/fused_block.py): same masked math,
    # tiled in VMEM. Opt-in (6-11% layer-level win, neutral at full-model
    # level). Auto-falls back to the XLA path off-TPU / under stochastic
    # regularizers / with Context Broadcasting.
    fused: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        token_keep: jnp.ndarray,
        win_keep: Optional[jnp.ndarray] = None,
        *,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        B, N, hw, C = x.shape
        assert self.dim % self.dim_head == 0, (
            f"attention dim {self.dim} must divide by dim_head "
            f"{self.dim_head} (the reference's small preset sets "
            f"dim_head=24 for embed 48 — config/experiment/*/small.yaml:10)"
        )
        num_heads = self.dim // self.dim_head
        inner_dim = max(32, math.floor(C * self.mlp_ratio * 2 / 3 / 32) * 32)

        # ---- parameters (tree-compatible with the nn.Dense/LayerNorm form) --
        n1_scale, n1_bias = LayerNormParams(name="norm1")(C)
        n2_scale, n2_bias = LayerNormParams(name="norm2")(C)
        w_qkv, b_qkv = DenseParams(3 * C, self.use_bias, name="qkv")(C)
        w_proj, b_proj = DenseParams(C, self.use_bias, name="proj")(C)
        ls1 = GammaParams(self.ls_init_value, name="ls1")(C)
        ls2 = GammaParams(self.ls_init_value, name="ls2")(C)
        w_glu, b_glu, w_out, b_out = GatedMlpParams(
            C, inner_dim, self.mlp_bias, name="mlp"
        )()
        dt = self.dtype or x.dtype

        y = _layernorm(x, n1_scale, n1_bias, self.norm_eps)
        keep = token_keep[..., None]  # (B, N, hw, 1)
        # Modules created unconditionally (before any lax.cond branch).
        dp1 = DropPath(self.drop_path, name="drop_path1")
        dp2 = DropPath(self.drop_path, name="drop_path2")
        # MLP dropout sits between the gated activation and the output
        # projection (reference MLP: GLU -> Dropout -> Linear, ops.py:165-170).
        mlp_drop = nn.Dropout(rate=self.drop_mlp, name="mlp_drop")

        # ---- XLA masked block math (layout-generic) --------------------------
        def block_math(y_in, tk):
            """The masked transformer block on any (B', N', hw, C) layout.

            y_in is norm1-ed input; tk its (B', N', hw) token-keep mask.
            Output equals y_in at unselected tokens. Used directly by the
            full-layout path and on a gathered (1, K, hw, C) compact tensor
            by the budget-gather path below.
            """
            k4 = tk[..., None]
            z = jnp.where(
                k4, _layernorm(y_in, n2_scale, n2_bias, self.norm_eps), y_in
            )

            zc = z.astype(dt)
            qkv = zc @ w_qkv.astype(dt)
            if b_qkv is not None:
                qkv = qkv + b_qkv.astype(dt)
            # Slice q/k/v along the minor (channel) axis BEFORE exposing the
            # head axis: the 6-D (…, 3, heads, dh) reshape-then-slice form
            # makes XLA materialize a physical relayout of the full 3C-wide
            # qkv tensor (2x180 us/step at gen4 stage 1 in the round-4 xprof
            # trace); minor slices keep the copy off the 3x-wide tensor.
            qkv = qkv.reshape(*qkv.shape[:3], 3 * num_heads, self.dim_head)
            # Round-5 negative result: an optimization_barrier HERE (pinning
            # the attention-preferred layout onto the qkv product so the
            # stage-0 2x180 us relayout folds into the dot output) makes the
            # full step WORSE (1019 vs 1047 fps) — the dot's native output
            # layout is load-bearing for XLA's surrounding schedule.
            q = qkv[:, :, :, 0:num_heads]
            k = qkv[:, :, :, num_heads : 2 * num_heads]
            v = qkv[:, :, :, 2 * num_heads :]

            scale = self.dim_head ** -0.5
            # (B', N', heads, hw_q, hw_k)
            logits = jnp.einsum("bnqhd,bnkhd->bnhqk", q, k) * scale
            key_mask = tk[:, :, None, None, :]  # column (key) mask
            logits = jnp.where(
                key_mask, logits, jnp.asarray(MASK_VALUE, logits.dtype)
            )
            attn = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bnhqk,bnkhd->bnqhd", attn, v).reshape(z.shape)
            out = out.astype(dt) @ w_proj.astype(dt)
            if b_proj is not None:
                out = out + b_proj.astype(dt)

            h = z + dp1(ls1.astype(z.dtype) * out, deterministic=deterministic)

            u = h.astype(dt) @ w_glu.astype(dt)
            if b_glu is not None:
                u = u + b_glu.astype(dt)
            val, gate = jnp.split(u, 2, axis=-1)
            m = val * get_activation(self.mlp_act)(gate)
            m = mlp_drop(m, deterministic=deterministic)
            mlp_out = m @ w_out.astype(dt)
            if b_out is not None:
                mlp_out = mlp_out + b_out.astype(dt)

            if self.enable_cb:
                # Context Broadcasting (SAST.py:239-246): mix each selected
                # token's MLP output with the mean over *all* token slots
                # (unselected contribute zero): mean = sum(selected)/(N*hw).
                # Only meaningful on the full (B, N) layout — gather/pallas
                # paths are guarded off when enable_cb is set.
                masked = jnp.where(k4, mlp_out, 0.0)
                mean = jnp.mean(masked, axis=(1, 2), keepdims=True)
                mlp_out = 0.5 * masked + 0.5 * mean

            h2 = h + dp2(ls2.astype(h.dtype) * mlp_out, deterministic=deterministic)
            return jnp.where(k4, h2, y_in)

        def xla_path(_):
            return block_math(y, token_keep)

        def kernel_params():
            """Weight dict shared by the Pallas kernels (fused + sparse)."""
            return {
                "ln2_scale": n2_scale,
                "ln2_bias": n2_bias,
                "wqkv": w_qkv.astype(dt),
                "bqkv": b_qkv if b_qkv is not None else jnp.zeros((3 * C,)),
                "wproj": w_proj.astype(dt),
                "bproj": b_proj if b_proj is not None else jnp.zeros((C,)),
                "ls1": ls1,
                "ls2": ls2,
                "wglu": w_glu.astype(dt),
                "bglu": b_glu if b_glu is not None else jnp.zeros((2 * inner_dim,)),
                "wout": w_out.astype(dt),
                "bout": b_out if b_out is not None else jnp.zeros((C,)),
            }

        # ---- budget-gather path (training compute sparsity) ------------------
        # The reference trains through dynamic gathers of kept windows
        # (SAST.py:199-255). TPU-native equivalent: a STATIC budget
        # K = ceil(gather_budget * M) and the kept-first argsort permutation;
        # gather the first K window ids into a compact (1, K, hw, C) tensor,
        # run the identical batched masked block math (full MXU utilization,
        # plain XLA autodiff), and permutation-scatter back. Unkept windows
        # inside the prefix pass through unchanged (all tokens masked), so
        # results are exact whenever n_win <= K; lax.cond falls back to the
        # dense path above the budget, keeping semantics exact at any density.
        # Both sparse execution paths implement neither drop_path nor the MLP
        # dropout, so they are valid only when those are inactive.
        stochastic_off = deterministic or (
            self.drop_path == 0.0 and self.drop_mlp == 0.0
        )
        use_gather = (
            self.gather_budget > 0.0
            and win_keep is not None
            and not self.enable_cb
            and stochastic_off
        )
        if use_gather:
            M = B * N
            K = max(1, min(M, int(math.ceil(self.gather_budget * M))))
            y_flat = y.reshape(M, hw, C)
            tk_flat = token_keep.reshape(M, hw)
            wk_flat = win_keep.reshape(M)
            n_win = jnp.sum(wk_flat.astype(jnp.int32))
            order = jnp.argsort(~wk_flat, stable=True)[:K].astype(jnp.int32)

            def gathered(_):
                out_g = block_math(
                    y_flat[order][None], tk_flat[order][None]
                )[0]
                return y_flat.at[order].set(out_g).reshape(B, N, hw, C)

            if K == M:
                return gathered(None)
            return jax.lax.cond(n_win <= K, gathered, xla_path, None)

        # ---- fused Pallas window-skipping path -------------------------------
        # Dispatched at runtime by scene density: the kernel's FLOPs scale
        # with kept windows but its per-window overhead loses to the batched
        # XLA path above the threshold, so lax.cond picks per call.
        # Trainable: sparse_window_block carries a custom VJP whose backward
        # runs over the same kept-first work list (ops/pallas/sparse_block.py),
        # so it is valid under jax.grad — but only when the stochastic
        # regularizers are off (the kernel implements neither drop_path nor
        # the MLP dropout).
        use_pallas = (
            self.use_pallas
            and win_keep is not None
            and not self.enable_cb
            and stochastic_off
        )

        # ---- dense fused Pallas block (opt-in) --------------------------------
        # Same masked math as xla_path, computed tile-by-tile in VMEM
        # (ops/pallas/fused_block.py). Exact gradients via the XLA VJP.
        use_fused = (
            self.fused
            and not use_pallas
            and not self.enable_cb
            and stochastic_off
            and jax.default_backend() == "tpu"
            # Single-device only: GSPMD has no partitioning rule for the
            # Pallas custom call (multi-chip meshes use the XLA path).
            and jax.device_count() == 1
        )
        if use_fused:
            from sast_tpu.ops.pallas.fused_block import fused_window_block

            out = fused_window_block(
                y.reshape(B * N, hw, C),
                token_keep.reshape(B * N, hw),
                kernel_params(),
                num_heads,
                self.dim_head,
                self.norm_eps,
            )
            return out.reshape(B, N, hw, C)

        if not use_pallas:
            return xla_path(None)

        def pallas_path(_):
            from sast_tpu.ops.pallas.sparse_block import sparse_window_block

            params = kernel_params()
            out = sparse_window_block(
                y.reshape(B * N, hw, C),
                token_keep.reshape(B * N, hw),
                win_keep.reshape(B * N),
                params,
                num_heads=num_heads,
                dim_head=self.dim_head,
                norm_eps=self.norm_eps,
            )
            return out.reshape(B, N, hw, C)

        if self.pallas_threshold >= 1.0:
            return pallas_path(None)
        frac = jnp.mean(win_keep.astype(jnp.float32))
        return jax.lax.cond(
            frac <= self.pallas_threshold, pallas_path, xla_path, None
        )


class SASTBlock(nn.Module):
    """One SAST block = window-attention layer + grid-attention layer.

    The first block of a stage runs the scoring module (STP weighting) and the
    window/token selection; subsequent blocks reuse the masks (SAST.py:124-128).

    Returns (x, p_count, masks) where p_count is the mean number of selected
    tokens per batch element over both layers (the reference's ``index_count``,
    SAST.py:136,159 — surfaced as sparsity telemetry).
    """

    dim: int
    attention: AttentionConfig
    first_block: bool = False
    dtype: Optional[Dtype] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        pos_emb: jnp.ndarray,
        r: jnp.ndarray,
        masks: Optional[Tuple[jnp.ndarray, ...]] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        cfg = self.attention
        B, H, W, C = x.shape
        p = tuple(cfg.partition_size)

        attn_kwargs = dict(
            dim=self.dim,
            dim_head=cfg.dim_head,
            use_bias=cfg.attention_bias,
            ls_init_value=cfg.ls_init_value,
            drop_path=cfg.drop_path,
            drop_mlp=cfg.drop_mlp,
            mlp_ratio=cfg.mlp_ratio,
            mlp_act=cfg.mlp_activation,
            mlp_bias=cfg.mlp_bias,
            norm_eps=cfg.norm_eps,
            enable_cb=cfg.enable_cb,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            pallas_threshold=cfg.pallas_density_threshold,
            gather_budget=cfg.gather_budget,
            fused=cfg.fused_block,
        )

        x = x + pos_emb.astype(x.dtype)
        xw = window_partition(x, p)  # (B, N, hw, C)

        if self.first_block:
            # Scoring module (SAST.py:107-121).
            scale = PositiveDense(self.dim, dtype=self.dtype, name="to_controls")(
                r + 1e-6
            )  # (B, C), strictly positive
            scores = jax.nn.relu(
                nn.Dense(self.dim, dtype=self.dtype, name="to_scores")(xw)
            )  # (B, N, hw, C)

            # STP weighting.
            weight = jax.nn.sigmoid(scale)[:, None, None, :] * jax.nn.sigmoid(scores)
            xw = weight * xw

            # Selection amplification: scores *= AMP / scale  (guard inf -> 0).
            # fp32: the amplified scores feed threshold comparisons.
            inv_scale = cfg.amp / scale.astype(jnp.float32)
            inv_scale = jnp.where(jnp.isinf(inv_scale), 0.0, inv_scale)
            scores_amp = inv_scale[:, None, None, :] * scores.astype(jnp.float32)

            win_keep_w, tok_keep_w = select_windows_and_tokens(scores_amp, cfg.bounce)
            scores_spatial = window_reverse(scores_amp, p, (H, W))
            scores_g = grid_partition(scores_spatial, p)
            win_keep_g, tok_keep_g = select_windows_and_tokens(scores_g, cfg.bounce)
            masks = (win_keep_w, tok_keep_w, win_keep_g, tok_keep_g)
        else:
            assert masks is not None, "non-first blocks must reuse selection masks"
            win_keep_w, tok_keep_w, win_keep_g, tok_keep_g = masks

        # Selection-shape telemetry for per-sample FLOP accounting
        # (scripts/benchmark.py --per-sample; the reference's sparsity-FLOPs
        # sweep, /root/reference/benchmark.py:97-117, traces the gathered
        # (M kept windows, Kmax padded tokens) shapes — these stats recover
        # them). No-op unless the caller applies with mutable=['telemetry'].
        def _sel_stats(win_keep, tok_keep):
            counts = jnp.sum(tok_keep.astype(jnp.int32), axis=-1)  # (B, N)
            m = jnp.sum(win_keep.astype(jnp.int32), axis=-1)  # (B,)
            kmax = jnp.max(jnp.where(win_keep, counts, 0), axis=-1)  # (B,)
            t_eff = jnp.sum(counts, axis=-1)  # (B,)
            return jnp.stack([m, kmax, t_eff], axis=-1)  # (B, 3)

        # Guard against init (where every collection is mutable): sowing
        # there would bake telemetry arrays into the variables tree and make
        # every later mutable-apply append a second entry.
        if not self.is_initializing() and self.is_mutable_collection("telemetry"):
            self.sow("telemetry", "sel_win", _sel_stats(win_keep_w, tok_keep_w))
            self.sow("telemetry", "sel_grid", _sel_stats(win_keep_g, tok_keep_g))

        if cfg.pin_partition_layout:
            # Materialize the deferred partition transpose HERE, on the
            # C-wide activation, rather than inside the attention where XLA
            # otherwise surfaces it on the 3C-wide qkv product (stage-0
            # relayouts in the round-4 trace, docs/DESIGN.md 6d; -320 us/step
            # on the gen4-base streaming step, ablate_layout_pin.py).
            xw = jax.lax.optimization_barrier(xw)

        # First SAST layer: local window attention.
        xw = MaskedSparseAttention(**attn_kwargs, name="win_attn")(
            xw, tok_keep_w, win_keep_w, deterministic=deterministic
        )
        x = window_reverse(xw, p, (H, W))

        # Second SAST layer: dilated grid attention.
        xg = grid_partition(x, p)
        if cfg.pin_partition_layout:
            xg = jax.lax.optimization_barrier(xg)
        xg = MaskedSparseAttention(**attn_kwargs, name="grid_attn")(
            xg, tok_keep_g, win_keep_g, deterministic=deterministic
        )
        x = grid_reverse(xg, p, (H, W))

        p_count = (
            jnp.sum(tok_keep_w.astype(jnp.float32))
            + jnp.sum(tok_keep_g.astype(jnp.float32))
        ) / B
        return x, p_count, masks
