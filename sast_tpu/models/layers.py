"""Shared neural layers (Flax/linen, NHWC, TPU-friendly).

Functional equivalents of the reference building blocks:
- ``ConvDownsample``   <- ConvDownsampling_Cf2Cl (/root/reference/models/layers/SAST/ops.py:54-95)
- ``GatedMLP`` / ``GLU`` <- MLP/GLU (/root/reference/models/layers/SAST/ops.py:111-175)
- ``LayerScale``       <- (/root/reference/models/layers/SAST/ops.py:178-186)
- ``DWSConvLSTM2d``    <- (/root/reference/models/layers/rnn.py:7-69)
- ``BaseConv``/``DWConv``/``Bottleneck``/``CSPLayer`` <- YOLOX network blocks
  (/root/reference/models/detection/yolox/models/network_blocks.py:29-142)

Everything is channels-last; BatchNorm supports cross-replica statistics via
``axis_name`` (the TPU-native replacement for the reference's sync-BN).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

_ACTIVATIONS = {
    "silu": jax.nn.silu,
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "lrelu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.1),
}


def get_activation(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    return _ACTIVATIONS[name]


class LayerScale(nn.Module):
    dim: int
    init_values: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_values), (self.dim,)
        )
        return x * gamma.astype(x.dtype)


class GLU(nn.Module):
    """Gated linear unit: proj to 2*dim_out, elementwise gate via activation."""

    dim_out: int
    act: str = "gelu"
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(self.dim_out * 2, use_bias=self.use_bias, dtype=self.dtype)(x)
        v, gate = jnp.split(y, 2, axis=-1)
        return v * get_activation(self.act)(gate)


class GatedMLP(nn.Module):
    """Transformer MLP with GLU input projection.

    Inner dim = floor(dim * ratio * 2/3 / 32) * 32 (reference ops.py:157 keeps
    it a multiple of 32 — which also keeps the matmuls MXU-aligned).
    """

    dim: int
    expansion_ratio: int = 4
    act: str = "gelu"
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner_dim = max(32, math.floor(self.dim * self.expansion_ratio * 2 / 3 / 32) * 32)
        x = GLU(dim_out=inner_dim, act=self.act, use_bias=self.use_bias, dtype=self.dtype)(x)
        x = nn.Dense(self.dim, use_bias=self.use_bias, dtype=self.dtype)(x)
        return x


def replicate_pad_hw(x: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    """Replicate ('edge') padding of an NHWC tensor on H and W.

    Built from slice + concatenate instead of ``jnp.pad(mode="edge")``: the
    two are numerically identical forward, but the transpose (gradient) of
    this form is plain local slices and adds. The pad-based form's transpose
    lowers to a partition-id select + single-pair ``collective-permute``
    under GSPMD, an *asymmetric* collective in which only one device sources
    data. On hosts where each virtual device has a single executor thread
    (e.g. the driver's 1-core 8-device CPU dryrun) that permute can deadlock
    against an independent gradient all-reduce — 7 devices block in the
    permute rendezvous while the source device blocks in the all-reduce
    (MULTICHIP_r03/r04 failures). Concatenate keeps the backward collective-
    free, so the hazard is gone by construction.
    """
    if pad_h:
        top = jnp.broadcast_to(
            x[:, :1], (x.shape[0], pad_h) + x.shape[2:]
        )
        bottom = jnp.broadcast_to(
            x[:, -1:], (x.shape[0], pad_h) + x.shape[2:]
        )
        x = jnp.concatenate([top, x, bottom], axis=1)
    if pad_w:
        left = jnp.broadcast_to(
            x[:, :, :1], x.shape[:2] + (pad_w,) + x.shape[3:]
        )
        right = jnp.broadcast_to(
            x[:, :, -1:], x.shape[:2] + (pad_w,) + x.shape[3:]
        )
        x = jnp.concatenate([left, x, right], axis=2)
    return x


class _ConvKernelParam(nn.Module):
    """Bare conv-kernel parameter with nn.Conv's default init and naming."""

    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class ConvDownsample(nn.Module):
    """Overlapping strided conv + LayerNorm. NHWC in, NHWC out.

    kernel = (factor-1)*2 + 1, stride = factor, replicate ('edge') padding,
    no bias — then affine LayerNorm over channels.
    """

    dim_out: int
    downsample_factor: int
    overlap: bool = True
    norm_affine: bool = True
    norm_eps: float = 1e-5
    dtype: Optional[Dtype] = None
    # Route the 7x7/stride-4 stem geometry through the fused Pallas kernel
    # (ops/pallas/stem_conv.py, 2.6x vs the XLA conv on v5e). Dispatch is
    # static (backend + shape); non-TPU backends and unsupported shapes fall
    # back to the numerically identical XLA formulation. Both branches share
    # the parameter path Conv_0/kernel, so checkpoints are interchangeable.
    use_pallas_stem: bool = False
    # Fused stem+density variant (ops/pallas/stem_conv.py
    # stem_conv_density_7x4): also returns the (B, 4, C_in) event-density
    # ratio computed from the SAME input fetch. The caller (SASTBackbone) is
    # responsible for the dispatch gates (TPU, single device, u8 input,
    # fusable shape); with_density=True asserts them.
    with_density: bool = False
    # Raw-fetch variant (stem_conv_raw_7x4 / stem_conv_density_raw_7x4):
    # the kernel reads the native u8 NHWC tensor with no prologue ops.
    # Applies only where stem_raw_supported holds; falls back otherwise.
    raw_fetch: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        f = self.downsample_factor
        if self.overlap and f == 4:
            from sast_tpu.ops.pallas.stem_conv import (
                stem_conv_7x4,
                stem_conv_density_7x4,
                stem_conv_density_raw_7x4,
                stem_conv_raw_7x4,
                stem_conv_xla,
                stem_kernel_supported,
                stem_raw_supported,
            )

            # Explicit param under the scope "Conv_0" — the exact path
            # nn.Conv's auto-naming would produce, so both dispatches (and
            # old checkpoints) share one tree.
            kernel = _ConvKernelParam(
                (7, 7, x.shape[-1], self.dim_out), name="Conv_0"
            )()
            integer_in = jnp.issubdtype(x.dtype, jnp.integer)
            if integer_in:
                # u8 event histograms enter the Pallas kernel raw (the cast
                # to compute dtype happens in VMEM): pads move half the HBM
                # bytes and the pre-cast full-resolution bf16 copy vanishes.
                kernel = kernel.astype(self.dtype or jnp.float32)
            else:
                x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
            ratio = None
            raw = (
                self.raw_fetch
                and integer_in
                and stem_raw_supported(x.shape, x.dtype)
            )
            if self.with_density:
                assert integer_in and self.use_pallas_stem, (
                    "with_density requires the gated fused dispatch "
                    "(u8 input + Pallas stem); see SASTBackbone"
                )
                if raw:
                    x, ratio = stem_conv_density_raw_7x4(x, kernel)
                else:
                    x, ratio = stem_conv_density_7x4(x, kernel)
            elif (
                self.use_pallas_stem
                and jax.default_backend() == "tpu"
                and stem_kernel_supported(x.shape)
                # Multi-device GSPMD treats the Pallas custom call as an
                # opaque op (no partitioning rule), so the kernel is only
                # dispatched on single-device processes — exactly where it
                # is hardware-validated. Multi-chip meshes get the identical
                # XLA formulation, which GSPMD partitions normally.
                and jax.device_count() == 1
            ):
                x = stem_conv_raw_7x4(x, kernel) if raw else stem_conv_7x4(x, kernel)
            else:
                if integer_in:
                    x = x.astype(kernel.dtype)
                x = stem_conv_xla(x, kernel)
            x = nn.LayerNorm(
                epsilon=self.norm_eps,
                use_bias=self.norm_affine,
                use_scale=self.norm_affine,
                dtype=self.dtype,
            )(x)
            return (x, ratio) if self.with_density else x
        if self.overlap:
            kernel = (f - 1) * 2 + 1
            pad = kernel // 2
            x = replicate_pad_hw(x, pad, pad)
        else:
            kernel = f
        x = nn.Conv(
            self.dim_out,
            kernel_size=(kernel, kernel),
            strides=(f, f),
            padding="VALID",
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.LayerNorm(
            epsilon=self.norm_eps,
            use_bias=self.norm_affine,
            use_scale=self.norm_affine,
            dtype=self.dtype,
        )(x)
        return x


class DWSConvLSTM2d(nn.Module):
    """Convolutional LSTM cell with optional depthwise conv on the hidden state.

    NHWC. The cell state is carried in fp32 for numerical stability across long
    streams regardless of the compute dtype.
    """

    dim: int
    dws_conv: bool = False
    dws_conv_only_hidden: bool = True
    dws_conv_kernel_size: int = 3
    cell_update_dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        h_and_c_previous: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        *,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if h_and_c_previous is None:
            h_tm1 = jnp.zeros_like(x)
            c_tm1 = jnp.zeros(x.shape, jnp.float32)
        else:
            h_tm1, c_tm1 = h_and_c_previous
        h_tm1 = h_tm1.astype(x.dtype)

        if self.dws_conv and self.dws_conv_only_hidden:
            k = self.dws_conv_kernel_size
            h_tm1 = nn.Conv(
                self.dim,
                kernel_size=(k, k),
                padding="SAME",
                feature_group_count=self.dim,
                dtype=self.dtype,
            )(h_tm1)
        xh = jnp.concatenate((x, h_tm1), axis=-1)
        if self.dws_conv and not self.dws_conv_only_hidden:
            k = self.dws_conv_kernel_size
            xh = nn.Conv(
                2 * self.dim,
                kernel_size=(k, k),
                padding="SAME",
                feature_group_count=2 * self.dim,
                dtype=self.dtype,
            )(xh)
        mix = nn.Conv(4 * self.dim, kernel_size=(1, 1), dtype=self.dtype)(xh)

        gates, cell_input = jnp.split(mix, [3 * self.dim], axis=-1)
        gates = jax.nn.sigmoid(gates.astype(jnp.float32))
        forget_gate, input_gate, output_gate = jnp.split(gates, 3, axis=-1)
        cell_input = jnp.tanh(cell_input.astype(jnp.float32))
        if self.cell_update_dropout > 0.0:
            cell_input = nn.Dropout(rate=self.cell_update_dropout)(
                cell_input, deterministic=deterministic
            )

        c_t = forget_gate * c_tm1.astype(jnp.float32) + input_gate * cell_input
        h_t = output_gate * jnp.tanh(c_t)
        return h_t.astype(x.dtype), c_t


# ---------------------------------------------------------------------------
# YOLOX blocks
# ---------------------------------------------------------------------------


class BaseConv(nn.Module):
    """Conv -> BatchNorm -> activation ('same' padding)."""

    out_channels: int
    ksize: int
    stride: int = 1
    groups: int = 1
    act: str = "silu"
    use_bias: bool = False
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        pad = (self.ksize - 1) // 2
        x = nn.Conv(
            self.out_channels,
            kernel_size=(self.ksize, self.ksize),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.bn_axis_name if train else None,
        )(x)
        return get_activation(self.act)(x)


class DWConv(nn.Module):
    """Depthwise conv followed by pointwise conv, each with BN+act."""

    out_channels: int
    ksize: int
    stride: int = 1
    act: str = "silu"
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        in_channels = x.shape[-1]
        x = BaseConv(
            in_channels, self.ksize, self.stride, groups=in_channels,
            act=self.act, dtype=self.dtype, bn_axis_name=self.bn_axis_name,
        )(x, train=train)
        x = BaseConv(
            self.out_channels, 1, 1, act=self.act, dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
        )(x, train=train)
        return x


class Bottleneck(nn.Module):
    out_channels: int
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        hidden = int(self.out_channels * self.expansion)
        Conv = DWConv if self.depthwise else BaseConv
        y = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype,
                     bn_axis_name=self.bn_axis_name)(x, train=train)
        y = Conv(self.out_channels, 3, 1, act=self.act, dtype=self.dtype,
                 bn_axis_name=self.bn_axis_name)(y, train=train)
        if self.shortcut and x.shape[-1] == self.out_channels:
            y = y + x
        return y


class CSPLayer(nn.Module):
    """C3: CSP bottleneck with 3 convolutions."""

    out_channels: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Optional[Dtype] = None
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        hidden = int(self.out_channels * self.expansion)
        kw = dict(act=self.act, dtype=self.dtype, bn_axis_name=self.bn_axis_name)
        x1 = BaseConv(hidden, 1, 1, **kw)(x, train=train)
        x2 = BaseConv(hidden, 1, 1, **kw)(x, train=train)
        for _ in range(self.n):
            x1 = Bottleneck(
                hidden, shortcut=self.shortcut, expansion=1.0,
                depthwise=self.depthwise, **kw,
            )(x1, train=train)
        x = jnp.concatenate((x1, x2), axis=-1)
        return BaseConv(self.out_channels, 1, 1, **kw)(x, train=train)
