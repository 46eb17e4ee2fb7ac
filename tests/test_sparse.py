"""Selection-mask parity against a naive numpy oracle implementing the
reference's dynamic-index semantics (SAST.py:84-96, 258-281)."""

import jax
import jax.numpy as jnp
import numpy as np

from sast_tpu.ops.sparse import non_zero_ratio, select_windows_and_tokens

BOUNCE = 1e-3


def _softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def _oracle_selection(scores: np.ndarray, bounce: float):
    """Reference-style selection (nonzero/topk) expressed as dense masks."""
    B, N, hw, C = scores.shape
    win_l1 = np.abs(scores).sum(axis=(2, 3)) / hw
    win_soft = _softmax(win_l1, axis=-1)
    win_keep = win_soft >= (1.0 / N) / (1.0 + bounce)

    tok_l1 = np.abs(scores).sum(axis=3)  # (B, N, hw)
    tok_keep = np.zeros((B, N, hw), bool)
    for b in range(B):
        for n in range(N):
            if not win_keep[b, n]:
                continue
            soft = _softmax(tok_l1[b, n], axis=-1)
            tok_keep[b, n] = soft >= (1.0 / hw) / (1.0 + bounce)
    return win_keep, tok_keep


@jax.jit
def _select(scores):
    return select_windows_and_tokens(scores, BOUNCE)


def test_selection_matches_oracle():
    rng = np.random.RandomState(42)
    # Mix of spiky and flat windows, plus a fully-zero batch element.
    scores = np.abs(rng.randn(3, 8, 10, 4)).astype(np.float32)
    scores[0, :4] *= 20.0  # spiky windows dominate the softmax
    scores[2] = 0.0  # dense-fallback regime: uniform -> keep everything

    wk, tk = _select(jnp.asarray(scores))
    wk_ref, tk_ref = _oracle_selection(scores, BOUNCE)
    np.testing.assert_array_equal(np.asarray(wk), wk_ref)
    np.testing.assert_array_equal(np.asarray(tk), tk_ref)
    # Zero scores keep everything (uniform softmax == threshold * (1+bounce)).
    assert np.asarray(wk)[2].all()
    assert np.asarray(tk)[2].all()


@jax.jit
def _ratio(x):
    return non_zero_ratio(x)


def test_non_zero_ratio_matches_oracle():
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 32, 64, 5
    x = (rng.rand(B, H, W, C) > 0.85).astype(np.float32) * rng.poisson(
        2, (B, H, W, C)
    )
    r = np.asarray(_ratio(jnp.asarray(x)))
    assert r.shape == (B, 4, C)

    # Oracle: max-pool pyramid + non-zero fraction per channel.
    pooled = x
    for s, k in enumerate([4, 2, 2, 2]):
        Bp, Hp, Wp, Cp = pooled.shape
        pooled = pooled.reshape(Bp, Hp // k, k, Wp // k, k, Cp).max(axis=(2, 4))
        frac = (pooled != 0).sum(axis=(1, 2)) / (
            pooled.shape[1] * pooled.shape[2] * Cp
        )  # reference normalization: / (C * Hp * Wp), sast_rnn.py:57-60
        np.testing.assert_allclose(r[:, s], frac, rtol=1e-6)


def test_non_zero_ratio_floors_odd_dims():
    """Extents not divisible by the pool factor floor like the reference's
    VALID-padding maxpool instead of raising a reshape error (round-3 review
    finding: a debug in_res_hw like (250, 310) must still evaluate)."""
    rng = np.random.RandomState(1)
    x = (rng.rand(1, 250, 310, 3) > 0.9).astype(np.float32)
    r = np.asarray(jax.jit(non_zero_ratio)(jnp.asarray(x)))
    assert r.shape == (1, 4, 3)
    assert np.isfinite(r).all() and (0 <= r).all() and (r <= 1).all()

    # Oracle with explicit flooring.
    pooled = x
    for s, k in enumerate([4, 2, 2, 2]):
        Bp, Hp, Wp, Cp = pooled.shape
        pooled = pooled[:, : Hp // k * k, : Wp // k * k]
        pooled = pooled.reshape(Bp, Hp // k, k, Wp // k, k, Cp).max(axis=(2, 4))
        frac = (pooled != 0).sum(axis=(1, 2)) / (
            pooled.shape[1] * pooled.shape[2] * Cp
        )
        np.testing.assert_allclose(r[:, s], frac, rtol=1e-6)


def test_non_zero_ratio_rejects_sub_factor_extents():
    """Extents below a stage's pool factor must fail loudly at trace time,
    not propagate a silent 0/0 NaN density (round-3 review finding)."""
    import pytest

    x = jnp.zeros((1, 16, 16, 3), jnp.float32)  # 16 -> 4 -> 2 -> 1 < 2
    with pytest.raises(AssertionError, match="too small"):
        jax.jit(non_zero_ratio)(x)


def test_density_kernel_interpret_matches_xla(monkeypatch):
    """Pallas density pyramid (ops/pallas/density.py) == XLA formulation,
    run on CPU via interpret mode; also checks the zero-tangent custom_jvp
    lets reverse-mode AD pass through without a pallas transpose rule.

    Interpret mode is forced by patching the module-local ``_pallas_call``
    alias (auto-restored by pytest), NOT the shared pallas module
    (ADVICE r3: the old global mutation could leak into concurrent tests)."""
    from functools import partial

    import jax.experimental.pallas as pl

    import sast_tpu.ops.pallas.density as dens

    monkeypatch.setattr(
        dens, "_pallas_call", partial(pl.pallas_call, interpret=True)
    )
    rng = np.random.RandomState(0)
    B, H, W, C = 2, 64, 32, 4  # (W*C) % 128 == 0, H and W % 32 == 0
    x = rng.poisson(0.2, (B, H, W, C)).clip(0, 255).astype(np.uint8)
    assert dens.ratio_kernel_supported((B, H, W, C), 4, jnp.uint8)
    got = np.asarray(dens.density_ratio_tpu(jnp.asarray(x)))
    ref = np.asarray(non_zero_ratio(jnp.asarray(x), use_pallas=False))
    np.testing.assert_allclose(got, ref, atol=1e-6)

    # r feeds the differentiable scoring module downstream; the kernel's
    # cotangent path must exist (and be zero into the integer input).
    w = jnp.ones((B, 4, C))
    g = jax.grad(
        lambda w: (dens.density_ratio_tpu(jnp.asarray(x)) * w).sum()
    )(w)
    np.testing.assert_allclose(np.asarray(g), np.asarray(got), atol=1e-6)


def test_ratio_kernel_requires_dtype():
    """dtype=None (unknown) must be unsupported so signed int8 inputs can
    never silently route to the kernel (ADVICE r3)."""
    from sast_tpu.ops.pallas.density import ratio_kernel_supported

    shape = (2, 64, 32, 4)
    assert ratio_kernel_supported(shape, 4, jnp.uint8)
    assert not ratio_kernel_supported(shape, 4)          # dtype omitted
    assert not ratio_kernel_supported(shape, 4, None)
    assert not ratio_kernel_supported(shape, 4, jnp.int8)


def test_density_kernel_gate_rejects_unsupported():
    from sast_tpu.ops.pallas.density import ratio_kernel_supported

    assert ratio_kernel_supported((4, 384, 640, 20), 4, jnp.uint8)  # gen4
    assert ratio_kernel_supported((8, 256, 320, 20), 4, jnp.uint8)  # gen1
    assert not ratio_kernel_supported((4, 384, 640, 20), 4, jnp.int8)  # signed
    assert not ratio_kernel_supported((4, 380, 640, 20), 4, jnp.uint8)  # H%32
    assert not ratio_kernel_supported((4, 384, 636, 20), 4, jnp.uint8)  # W%32
    assert not ratio_kernel_supported((4, 384, 640, 40), 4, jnp.uint8)  # C>32
    assert not ratio_kernel_supported((4, 384, 640, 20), 3, jnp.uint8)  # stages


# ---------------------------------------------------------------------------
# Fused stem+density kernel (ops/pallas/stem_conv.py stem_conv_density_7x4)


def test_fused_stem_density_interpret_matches_references(monkeypatch):
    """One kernel, two outputs: the conv must match stem_conv_xla and the
    ratio must match the XLA non_zero_ratio, on CPU via interpret mode.
    Also checks the custom-VJP: exact conv weight grads, zero ratio
    cotangent (the reference wraps the ratio in no_grad)."""
    from functools import partial

    import jax.experimental.pallas as pl

    import sast_tpu.ops.pallas.stem_conv as sc

    monkeypatch.setattr(
        sc, "_pallas_call", partial(pl.pallas_call, interpret=True)
    )
    rng = np.random.RandomState(1)
    B, H, W, C, Cout = 2, 64, 64, 20, 24
    x = jnp.asarray(
        rng.poisson(0.25, (B, H, W, C)).clip(0, 255).astype(np.uint8)
    )
    w = jnp.asarray(rng.randn(7, 7, C, Cout) * 0.05, jnp.float32)
    assert sc.stem_density_fusable(x.shape, x.dtype)

    y, ratio = jax.jit(sc.stem_conv_density_7x4)(x, w)
    y_ref = sc.stem_conv_xla(x.astype(jnp.float32), w)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-4
    )
    r_ref = non_zero_ratio(x, use_pallas=False)
    np.testing.assert_allclose(np.asarray(ratio), np.asarray(r_ref), atol=1e-6)

    # Weight grads are the exact XLA VJP; the ratio output contributes no
    # cotangent even when it enters the loss.
    def loss_fused(w):
        yy, rr = sc.stem_conv_density_7x4(x, w)
        return (yy * yy).sum() + rr.sum()

    def loss_ref(w):
        yy = sc.stem_conv_xla(x.astype(jnp.float32), w)
        return (yy * yy).sum()

    gw = jax.jit(jax.grad(loss_fused))(w)
    gr = jax.jit(jax.grad(loss_ref))(w)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gr), rtol=2e-5, atol=1e-3)


def test_fused_stem_density_gate():
    from sast_tpu.ops.pallas.stem_conv import stem_density_fusable

    assert stem_density_fusable((4, 384, 640, 20), jnp.uint8)  # gen4
    assert stem_density_fusable((8, 256, 320, 20), jnp.uint8)  # gen1
    assert not stem_density_fusable((4, 384, 640, 20))          # dtype omitted
    assert not stem_density_fusable((4, 384, 640, 20), jnp.int8)   # signed
    assert not stem_density_fusable((4, 384, 640, 20), jnp.float32)
    assert not stem_density_fusable((4, 384, 636, 20), jnp.uint8)  # W%32
    assert not stem_density_fusable((4, 384, 640, 40), jnp.uint8)  # C>32
    assert not stem_density_fusable((4, 16, 640, 20), jnp.uint8)   # stem gate


def test_backbone_fused_density_matches_default(monkeypatch):
    """End-to-end wiring: SASTBackbone with fuse_stem_density routed through
    the fused kernel (interpret mode; the hardware-only dispatch gates are
    bypassed) must reproduce the default path on the same parameters."""
    import dataclasses
    from functools import partial

    import jax.experimental.pallas as pl

    import sast_tpu.models.backbone as bb
    import sast_tpu.ops.pallas.stem_conv as sc
    from sast_tpu.config import get_test_config

    monkeypatch.setattr(
        sc, "_pallas_call", partial(pl.pallas_call, interpret=True)
    )
    monkeypatch.setattr(
        bb,
        "_fused_stem_density_dispatch",
        lambda cfg, x: cfg.fuse_stem_density
        and sc.stem_density_fusable(x.shape, x.dtype),
    )
    cfg = get_test_config().model.backbone
    assert cfg.in_res_hw[0] % 32 == 0 and cfg.in_res_hw[1] % 32 == 0
    cfg_fused = dataclasses.replace(cfg, fuse_stem_density=True)

    rng = np.random.RandomState(2)
    x = jnp.asarray(
        rng.poisson(0.3, (2, *cfg.in_res_hw, cfg.input_channels))
        .clip(0, 255)
        .astype(np.uint8)
    )
    variables = bb.SASTBackbone(cfg=cfg).init(jax.random.PRNGKey(0), x)
    feats, states, p = bb.SASTBackbone(cfg=cfg).apply(variables, x)
    feats_f, states_f, p_f = bb.SASTBackbone(cfg=cfg_fused).apply(variables, x)
    for k in feats:
        np.testing.assert_allclose(
            np.asarray(feats_f[k]), np.asarray(feats[k]), rtol=1e-4, atol=1e-4
        )
    np.testing.assert_allclose(np.asarray(p_f), np.asarray(p), atol=0)


# ---------------------------------------------------------------------------
# Raw-fetch stem kernel (ops/pallas/stem_conv.py stem_conv_raw_7x4)


def test_raw_stem_interpret_matches_references(monkeypatch):
    """The raw-fetch variants (native u8 input, in-kernel edge replication
    and widening) must match stem_conv_xla and non_zero_ratio exactly like
    the padded-prologue kernels, including the custom VJP."""
    from functools import partial

    import jax.experimental.pallas as pl

    import sast_tpu.ops.pallas.stem_conv as sc

    monkeypatch.setattr(
        sc, "_pallas_call", partial(pl.pallas_call, interpret=True)
    )
    rng = np.random.RandomState(3)
    B, H, W, C, Cout = 2, 64, 96, 20, 24
    x = jnp.asarray(
        rng.poisson(0.25, (B, H, W, C)).clip(0, 255).astype(np.uint8)
    )
    w = jnp.asarray(rng.randn(7, 7, C, Cout) * 0.05, jnp.float32)
    assert sc.stem_raw_supported(x.shape, x.dtype)

    y_ref = sc.stem_conv_xla(x.astype(jnp.float32), w)
    # Output column 0 goes through the left-edge correction matmul, whose
    # different f32 summation order rounds differently; the f32 XLA conv
    # itself is ~1.5e-4-relative off an f64 ground truth at this scale, so
    # compare scale-relative with the same margin.
    scale = float(jnp.max(jnp.abs(y_ref)))
    y = jax.jit(sc.stem_conv_raw_7x4)(x, w)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), atol=5e-4 * scale
    )
    yd, ratio = jax.jit(sc.stem_conv_density_raw_7x4)(x, w)
    np.testing.assert_allclose(
        np.asarray(yd), np.asarray(y_ref), atol=5e-4 * scale
    )
    r_ref = non_zero_ratio(x, use_pallas=False)
    np.testing.assert_allclose(np.asarray(ratio), np.asarray(r_ref), atol=1e-6)

    def loss_raw(w):
        yy, rr = sc.stem_conv_density_raw_7x4(x, w)
        return (yy * yy).sum() + rr.sum()

    def loss_ref(w):
        yy = sc.stem_conv_xla(x.astype(jnp.float32), w)
        return (yy * yy).sum()

    gw = jax.jit(jax.grad(loss_raw))(w)
    gr = jax.jit(jax.grad(loss_ref))(w)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gr), rtol=2e-5, atol=1e-3)


def test_raw_stem_gate():
    from sast_tpu.ops.pallas.stem_conv import stem_raw_supported

    assert stem_raw_supported((4, 384, 640, 20), jnp.uint8)   # gen4
    assert stem_raw_supported((8, 256, 320, 20), jnp.uint8)   # gen1
    assert not stem_raw_supported((4, 384, 640, 20))           # dtype omitted
    assert not stem_raw_supported((4, 384, 640, 20), jnp.float32)
    assert not stem_raw_supported((4, 384, 640, 20), jnp.int8)  # signed
    assert not stem_raw_supported((4, 384, 636, 20), jnp.uint8)  # W%32
    assert not stem_raw_supported((4, 380, 640, 20), jnp.uint8)  # H%32
    assert not stem_raw_supported((4, 384, 640, 40), jnp.uint8)  # 4C>128
    assert not stem_raw_supported((4, 16, 640, 20), jnp.uint8)   # stem gate


def test_backbone_raw_stem_matches_default(monkeypatch):
    """End-to-end wiring: stem_raw_fetch routed through the raw kernels
    (interpret mode, hardware gates bypassed) reproduces the default path
    on the same parameters — with and without the density fusion."""
    import dataclasses
    from functools import partial

    import jax.experimental.pallas as pl

    import sast_tpu.models.backbone as bb
    import sast_tpu.ops.pallas.stem_conv as sc
    from sast_tpu.config import get_test_config

    monkeypatch.setattr(
        sc, "_pallas_call", partial(pl.pallas_call, interpret=True)
    )
    monkeypatch.setattr(
        bb,
        "_fused_stem_density_dispatch",
        lambda cfg, x: cfg.fuse_stem_density
        and sc.stem_density_fusable(x.shape, x.dtype),
    )
    cfg = get_test_config().model.backbone
    rng = np.random.RandomState(4)
    x = jnp.asarray(
        rng.poisson(0.3, (2, *cfg.in_res_hw, cfg.input_channels))
        .clip(0, 255)
        .astype(np.uint8)
    )
    variables = bb.SASTBackbone(cfg=cfg).init(jax.random.PRNGKey(0), x)
    feats, _states, p = bb.SASTBackbone(cfg=cfg).apply(variables, x)
    for fused in (False, True):
        cfg_raw = dataclasses.replace(
            cfg, stem_raw_fetch=True, fuse_stem_density=fused
        )
        # The interpret-mode ConvDownsample dispatch requires the Pallas
        # branch; stem_raw_fetch only engages inside it.
        feats_r, _s, p_r = bb.SASTBackbone(cfg=cfg_raw).apply(variables, x)
        for k in feats:
            np.testing.assert_allclose(
                np.asarray(feats_r[k]), np.asarray(feats[k]),
                rtol=1e-4, atol=1e-4, err_msg=f"fused={fused} stage {k}",
            )
        np.testing.assert_allclose(np.asarray(p_r), np.asarray(p), atol=0)
