"""Model-level tests: shapes, token masking, recurrence, dense fallback."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sast_tpu.config import get_test_config
from sast_tpu.models.backbone import SASTBackbone, stage_feature_shapes, zero_states
from sast_tpu.models.detector import YoloXDetector


@pytest.fixture(scope="module")
def setup():
    cfg = get_test_config()
    model = YoloXDetector(cfg.model)
    rng = np.random.RandomState(0)
    B = 2
    x = jnp.asarray(
        (rng.rand(B, *cfg.model.backbone.in_res_hw, 20) > 0.9) * 3.0, jnp.float32
    )
    states = zero_states(cfg.model.backbone, B)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, states)
    return cfg, model, variables, x, states


def test_forward_shapes(setup):
    cfg, model, variables, x, states = setup
    out, new_states, p = jax.jit(model.apply)(variables, x, states)
    shapes = stage_feature_shapes(cfg.model.backbone)
    A = sum(
        (shapes[s][0] * shapes[s][1]) for s in cfg.model.fpn.in_stages
    )
    assert out["preds"].shape == (2, A, 5 + cfg.model.head.num_classes)
    assert out["grids"].shape == (A, 2)
    assert len(new_states) == 4
    for idx, (h, c) in enumerate(new_states):
        assert h.shape == (2, *shapes[idx + 1])
    assert p.shape == (4,)


def test_recurrence_changes_output(setup):
    cfg, model, variables, x, states = setup
    app = jax.jit(model.apply)
    out1, st1, _ = app(variables, x, states)
    out2, _, _ = app(variables, x, st1)
    diff = float(
        jnp.abs(
            out1["preds"].astype(jnp.float32) - out2["preds"].astype(jnp.float32)
        ).mean()
    )
    assert diff > 1e-6


def test_zero_input_finite_and_sparse(setup):
    cfg, model, variables, x, states = setup
    out, _, p = jax.jit(model.apply)(variables, jnp.zeros_like(x), states)
    assert bool(jnp.isfinite(out["preds"]).all())
    # zero input selects fewer tokens than dense input
    _, _, p_dense = jax.jit(model.apply)(variables, x, states)
    assert float(p.sum()) <= float(p_dense.sum())


def test_token_masking():
    cfg = get_test_config()
    bb = dataclasses.replace(cfg.model.backbone, enable_masking=True)
    model_cfg = dataclasses.replace(cfg.model, backbone=bb)
    model = YoloXDetector(model_cfg)
    rng = np.random.RandomState(0)
    B = 1
    x = jnp.asarray(rng.rand(B, *bb.in_res_hw, 20), jnp.float32)
    states = zero_states(bb, B)
    h4, w4 = bb.in_res_hw[0] // 4, bb.in_res_hw[1] // 4
    mask0 = jnp.zeros((B, h4, w4), bool)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, states, mask0)
    assert "mask_token" in variables["params"]["backbone"]["stage0"]

    app = jax.jit(model.apply)
    out_nomask, _, _ = app(variables, x, states, mask0)
    mask1 = jnp.ones((B, h4, w4), bool)
    out_masked, _, _ = app(variables, x, states, mask1)
    diff = float(
        jnp.abs(
            out_nomask["preds"].astype(jnp.float32)
            - out_masked["preds"].astype(jnp.float32)
        ).mean()
    )
    assert diff > 1e-6  # masking all tokens changes the output


def test_pallas_interpret_matches_xla():
    """Pallas kernel parity on CPU via interpret mode (small shapes)."""
    from sast_tpu.ops.pallas.sparse_block import sparse_window_block
    import sast_tpu.ops.pallas.sparse_block as sb
    from sast_tpu.models.sast import MaskedSparseAttention
    import jax.experimental.pallas as pl
    from functools import partial

    # monkeypatch pallas_call into interpret mode for CPU execution
    orig = pl.pallas_call
    sbpc = sb.pl.pallas_call
    sb.pl.pallas_call = partial(orig, interpret=True)
    try:
        B, N, HW, C, DH = 1, 4, 8, 16, 8
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(B, N, HW, C), jnp.float32)
        tok = jnp.asarray(rng.rand(B, N, HW) > 0.5)
        win = tok.any(-1) & jnp.asarray([True, True, False, True])
        tok = tok & win[..., None]

        mod_x = MaskedSparseAttention(dim=C, dim_head=DH, dtype=jnp.float32)
        mod_p = MaskedSparseAttention(
            dim=C, dim_head=DH, dtype=jnp.float32, use_pallas=True
        )
        variables = mod_x.init(jax.random.PRNGKey(1), x, tok, win)
        ref = mod_x.apply(variables, x, tok, win)
        got = mod_p.apply(variables, x, tok, win)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5
        )
    finally:
        sb.pl.pallas_call = sbpc
