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
            dim=C, dim_head=DH, dtype=jnp.float32, use_pallas=True,
            pallas_threshold=1.0,  # force the kernel (no density cond)
        )
        variables = mod_x.init(jax.random.PRNGKey(1), x, tok, win)
        ref = mod_x.apply(variables, x, tok, win)
        got = mod_p.apply(variables, x, tok, win)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5
        )
    finally:
        sb.pl.pallas_call = sbpc


def test_stochastic_regularization_rng_plumbing():
    """drop_path / drop_mlp must actually act in train mode (VERDICT r1 #6):
    different rng keys give different outputs, eval mode is the identity
    w.r.t. a drop-free module with the same params."""
    import jax
    import jax.numpy as jnp

    from sast_tpu.models.sast import MaskedSparseAttention

    B, N, hw, C, DH = 2, 4, 6, 32, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (B, N, hw, C), jnp.float32)
    keep = jnp.ones((B, N, hw), bool)

    mod = MaskedSparseAttention(
        dim=C, dim_head=DH, drop_path=0.5, drop_mlp=0.3, dtype=jnp.float32
    )
    variables = mod.init(jax.random.PRNGKey(1), x, keep)

    def run_train(key):
        return mod.apply(
            variables, x, keep, deterministic=False, rngs={"dropout": key}
        )

    y1 = jax.jit(run_train)(jax.random.PRNGKey(2))
    y2 = jax.jit(run_train)(jax.random.PRNGKey(3))
    assert not np.allclose(np.asarray(y1), np.asarray(y2)), (
        "different dropout keys must change train-mode outputs"
    )

    # Eval mode: identical to a module with zero drop rates (same params --
    # DropPath/Dropout are parameter-free).
    mod0 = MaskedSparseAttention(dim=C, dim_head=DH, dtype=jnp.float32)
    y_eval = jax.jit(lambda: mod.apply(variables, x, keep, deterministic=True))()
    y_ref = jax.jit(lambda: mod0.apply(variables, x, keep))()
    np.testing.assert_allclose(np.asarray(y_eval), np.asarray(y_ref), rtol=1e-6)


def test_train_step_stochastic_smoke():
    """A config with nonzero drop rates must train (rngs threaded through the
    scan) and produce a different loss than the deterministic config."""
    import dataclasses

    import jax

    from sast_tpu.config import get_test_config
    from sast_tpu.data.synthetic import synthetic_train_batch
    from sast_tpu.models.backbone import zero_states
    from sast_tpu.training.steps import create_train_state, make_train_step

    cfg = get_test_config()
    att = dataclasses.replace(
        cfg.model.backbone.attention, drop_path=0.4, drop_mlp=0.2
    )
    lstm = dataclasses.replace(cfg.model.backbone.lstm, drop_cell_update=0.2)
    bb = dataclasses.replace(cfg.model.backbone, attention=att, lstm=lstm)
    model = dataclasses.replace(cfg.model, backbone=bb)
    cfg_s = dataclasses.replace(cfg, model=model)

    batch_np = synthetic_train_batch(
        cfg, np.random.RandomState(0), batch_size=2, seq_len=2
    )
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    state_s, model_s = create_train_state(cfg_s, jax.random.PRNGKey(0))
    step_s = jax.jit(make_train_step(model_s, cfg_s))
    lstm0 = zero_states(cfg.model.backbone, 2)
    _, _, m_s = step_s(state_s, batch, lstm0)
    assert np.isfinite(float(m_s["loss"]))

    state_d, model_d = create_train_state(cfg, jax.random.PRNGKey(0))
    step_d = jax.jit(make_train_step(model_d, cfg))
    _, _, m_d = step_d(state_d, batch, lstm0)
    # same params/batch, dropout on vs off -> losses differ
    assert abs(float(m_s["loss"]) - float(m_d["loss"])) > 1e-6


def test_padding_token_mask_geometry():
    from sast_tpu.utils.padding import padding_token_mask

    # gen1: data 240x304 -> model 256x320 (partition_split_32=1)
    m = padding_token_mask((240, 304), (256, 320))
    m = np.asarray(m)
    assert m.shape == (1, 64, 80)
    assert not m[0, 59, 75]   # last fully-real token
    assert m[0, 60, 0]        # first padded row
    assert m[0, 0, 76]        # first padded col
    assert m.sum() == 64 * 80 - 60 * 76
    # no padding -> no mask
    assert padding_token_mask((64, 96), (64, 96)) is None


def test_token_mask_end_to_end_train_step():
    """The static padding mask is produced in make_train_step and flows into
    the stage-0 mask-token path: the mask token must receive gradient
    (VERDICT r1 #7; reference consumer modules/detection.py:124-148)."""
    import jax

    from sast_tpu.config import get_test_config
    from sast_tpu.models.backbone import zero_states
    from sast_tpu.training.steps import create_train_state, make_train_step

    cfg = get_test_config()
    attn = dataclasses.replace(cfg.model.backbone.attention, partition_size=(4, 5))
    bb = dataclasses.replace(
        cfg.model.backbone,
        input_channels=4,
        in_res_hw=(256, 320),
        attention=attn,
        enable_masking=True,
    )
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, backbone=bb),
        dataset=dataclasses.replace(cfg.dataset, name="gen1"),  # data 240x304
    )

    T, B = 2, 1
    L = cfg.training.max_labeled_frames_per_lane
    G = cfg.model.head.max_gt
    rng = np.random.RandomState(0)
    # Batch at DATA resolution; the in-scan padder pads to the model res.
    batch = {
        "ev_repr": (rng.rand(T, B, 240, 304 * 4) > 0.9).astype(np.uint8),
        "frame_tidx": np.zeros((B, L), np.int32),
        "frame_valid": np.array([[True] + [False] * (L - 1)] * B),
        "gt_boxes": np.tile(
            np.array([100.0, 100.0, 40.0, 30.0], np.float32), (B, L, G, 1)
        ),
        "gt_classes": np.zeros((B, L, G), np.int32),
        "gt_valid": np.array(
            [[[True] + [False] * (G - 1)] * L] * B
        ),
        "is_first": np.ones((B,), bool),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    state, model = create_train_state(cfg, jax.random.PRNGKey(0))
    tok_before = np.asarray(
        state.params["backbone"]["stage0"]["mask_token"]
    ).copy()
    step = jax.jit(make_train_step(model, cfg))
    new_state, _, metrics = step(state, batch, zero_states(bb, B))
    assert np.isfinite(float(metrics["loss"]))
    tok_after = np.asarray(new_state.params["backbone"]["stage0"]["mask_token"])
    assert not np.allclose(tok_before, tok_after), (
        "mask token must receive gradient through the padded region"
    )


import contextlib


@contextlib.contextmanager
def _interpret_pallas():
    """Run sparse_block kernels in interpret mode on CPU."""
    import jax.experimental.pallas as pl
    import sast_tpu.ops.pallas.sparse_block as sb
    from functools import partial

    saved = sb.pl.pallas_call
    sb.pl.pallas_call = partial(pl.pallas_call, interpret=True)
    try:
        yield
    finally:
        sb.pl.pallas_call = saved


def test_pallas_vjp_grads_match_xla():
    """Custom-VJP backward (Pallas work-list kernels) == XLA-path autodiff.

    Gradients wrt the input AND every block parameter must match the masked
    XLA formulation the kernel replaces (VERDICT r1 missing #4)."""
    from sast_tpu.models.sast import MaskedSparseAttention

    with _interpret_pallas():
        B, N, HW, C, DH = 1, 4, 8, 16, 8
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(B, N, HW, C), jnp.float32)
        tok = jnp.asarray(rng.rand(B, N, HW) > 0.4)
        win = tok.any(-1) & jnp.asarray([True, False, True, True])
        tok = tok & win[..., None]
        # fixed cotangent-shaping weights so the loss exercises all outputs
        w = jnp.asarray(rng.randn(B, N, HW, C), jnp.float32)

        mod_x = MaskedSparseAttention(dim=C, dim_head=DH, dtype=jnp.float32)
        mod_p = MaskedSparseAttention(
            dim=C, dim_head=DH, dtype=jnp.float32, use_pallas=True,
            pallas_threshold=1.0,  # force the kernel (no density cond)
        )
        variables = mod_x.init(jax.random.PRNGKey(1), x, tok, win)

        def loss(mod):
            def f(params, xin):
                out = mod.apply({"params": params}, xin, tok, win)
                return jnp.sum(out * w)
            return f

        gx_p, gi_p = jax.grad(loss(mod_p), argnums=(0, 1))(
            variables["params"], x
        )
        gx_x, gi_x = jax.grad(loss(mod_x), argnums=(0, 1))(
            variables["params"], x
        )

        np.testing.assert_allclose(
            np.asarray(gi_p), np.asarray(gi_x), rtol=2e-4, atol=1e-5
        )
        flat_p = jax.tree_util.tree_leaves_with_path(gx_p)
        flat_x = {
            jax.tree_util.keystr(p): l
            for p, l in jax.tree_util.tree_leaves_with_path(gx_x)
        }
        for path, leaf in flat_p:
            key = jax.tree_util.keystr(path)
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(flat_x[key]),
                rtol=2e-4, atol=1e-5, err_msg=key,
            )


def test_pallas_vjp_no_windows_kept():
    """Edge case: zero kept windows — forward is the identity on y and every
    parameter gradient must be exactly zero (accumulators still zeroed)."""
    from sast_tpu.ops.pallas.sparse_block import sparse_window_block

    with _interpret_pallas():
        M, HW, C, DH = 3, 8, 16, 8
        rng = np.random.RandomState(3)
        y = jnp.asarray(rng.randn(M, HW, C), jnp.float32)
        tok = jnp.zeros((M, HW), bool)
        win = jnp.zeros((M,), bool)
        params = {
            "ln2_scale": jnp.ones((C,)),
            "ln2_bias": jnp.zeros((C,)),
            "wqkv": jnp.asarray(rng.randn(C, 3 * C) * 0.1, jnp.float32),
            "bqkv": jnp.zeros((3 * C,)),
            "wproj": jnp.asarray(rng.randn(C, C) * 0.1, jnp.float32),
            "bproj": jnp.zeros((C,)),
            "ls1": jnp.full((C,), 1e-2),
            "wglu": jnp.asarray(rng.randn(C, 2 * 32) * 0.1, jnp.float32),
            "bglu": jnp.zeros((2 * 32,)),
            "wout": jnp.asarray(rng.randn(32, C) * 0.1, jnp.float32),
            "bout": jnp.zeros((C,)),
            "ls2": jnp.full((C,), 1e-2),
        }

        def f(yin, p):
            return jnp.sum(
                sparse_window_block(yin, tok, win, p, num_heads=2, dim_head=DH)
            )

        (dy, dp) = jax.grad(f, argnums=(0, 1))(y, params)
        np.testing.assert_allclose(np.asarray(dy), np.ones_like(dy), atol=1e-6)
        for k, v in dp.items():
            np.testing.assert_allclose(
                np.asarray(v), np.zeros_like(v), atol=1e-6, err_msg=k
            )


def test_gather_budget_matches_xla_forward_and_grads():
    """Budget-gather path == masked XLA path, forward and gradients, both
    under budget (gathered branch) and over budget (dense cond fallback)."""
    from sast_tpu.models.sast import MaskedSparseAttention

    B, N, HW, C, DH = 2, 8, 8, 16, 8
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(B, N, HW, C), jnp.float32)
    w = jnp.asarray(rng.randn(B, N, HW, C), jnp.float32)

    mod_x = MaskedSparseAttention(dim=C, dim_head=DH, dtype=jnp.float32)
    mod_g = MaskedSparseAttention(
        dim=C, dim_head=DH, dtype=jnp.float32, gather_budget=0.5
    )

    for n_kept in (3, 14):  # 3 <= K=8 (gathered); 14 > K (dense fallback)
        tok = jnp.asarray(rng.rand(B, N, HW) > 0.4)
        win_flat = np.zeros(B * N, bool)
        win_flat[rng.choice(B * N, n_kept, replace=False)] = True
        win = jnp.asarray(win_flat.reshape(B, N))
        tok = tok & win[..., None]
        variables = mod_x.init(jax.random.PRNGKey(1), x, tok, win)

        def loss(mod):
            def f(params, xin):
                return jnp.sum(mod.apply({"params": params}, xin, tok, win) * w)
            return f

        out_g = mod_g.apply(variables, x, tok, win)
        out_x = mod_x.apply(variables, x, tok, win)
        np.testing.assert_allclose(
            np.asarray(out_g), np.asarray(out_x), rtol=1e-5, atol=1e-6,
            err_msg=f"forward n_kept={n_kept}",
        )

        gg = jax.grad(loss(mod_g), argnums=(0, 1))(variables["params"], x)
        gx = jax.grad(loss(mod_x), argnums=(0, 1))(variables["params"], x)
        for a, b in zip(jax.tree.leaves(gg), jax.tree.leaves(gx)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                err_msg=f"grads n_kept={n_kept}",
            )


def test_inference_step_applies_token_mask():
    """make_inference_step must substitute the mask token at padded regions
    exactly like train/eval (code-review r2: the deployed path previously fed
    raw zero-pad embeddings — train-inference skew)."""
    import jax

    from sast_tpu.config import get_test_config
    from sast_tpu.models.backbone import zero_states
    from sast_tpu.training.steps import create_train_state, make_inference_step

    cfg = get_test_config()
    attn = dataclasses.replace(cfg.model.backbone.attention, partition_size=(4, 5))
    bb = dataclasses.replace(
        cfg.model.backbone,
        input_channels=4,
        in_res_hw=(256, 320),
        attention=attn,
        enable_masking=True,
    )
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, backbone=bb),
        dataset=dataclasses.replace(cfg.dataset, name="gen1"),  # data 240x304
    )

    state, model = create_train_state(cfg, jax.random.PRNGKey(0))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    infer = jax.jit(make_inference_step(model, cfg))

    rng = np.random.RandomState(0)
    # Model-resolution input whose padded band is zeros (as the padder makes).
    x = np.zeros((1, 256, 320, 4), np.float32)
    x[:, :240, :304] = (rng.rand(1, 240, 304, 4) > 0.9) * 3.0
    states = zero_states(bb, 1)
    dets, _, _ = infer(variables, jnp.asarray(x), states)

    # Recompute preds manually WITH and WITHOUT the mask; infer_step's
    # scores must equal the masked variant and differ from the unmasked one.
    from sast_tpu.models.detector import YoloXDetector
    from sast_tpu.models.head import inference_outputs
    from sast_tpu.ops.nms import postprocess
    from sast_tpu.utils.padding import padding_token_mask

    pp = cfg.model.postprocess

    def manual(tm):
        feats, _, _ = model.apply(
            {"params": state.params}, jnp.asarray(x), states, tm,
            method=YoloXDetector.forward_backbone,
        )
        outputs = model.apply(
            variables, feats, train=False, method=YoloXDetector.forward_detect
        )
        dets_m = postprocess(
            inference_outputs(outputs["preds"]),
            num_classes=cfg.model.head.num_classes,
            conf_threshold=pp.confidence_threshold,
            nms_threshold=pp.nms_threshold,
            pre_nms_topk=pp.pre_nms_topk,
            max_detections=pp.max_detections,
        )
        return dets_m, outputs["preds"]

    tm = padding_token_mask(cfg.dataset.resolution_hw, bb.in_res_hw)
    with_mask, preds_mask = manual(tm)
    without_mask, preds_nomask = manual(None)
    np.testing.assert_allclose(
        np.asarray(dets["scores"]), np.asarray(with_mask["scores"]),
        rtol=1e-5, atol=1e-6,
        err_msg="infer_step must produce the masked-path detections",
    )
    # The raw predictions must differ (post-NMS top-K can hide the padded
    # band at random init; the dense preds cannot).
    diff = float(
        jnp.abs(
            preds_mask.astype(jnp.float32) - preds_nomask.astype(jnp.float32)
        ).max()
    )
    assert diff > 1e-6, "mask token substitution must change raw predictions"


def test_pin_partition_layout_is_numerically_identity(setup):
    """pin_partition_layout only inserts optimization_barriers (a layout
    pin for the stage-0 relayout experiment, docs/DESIGN.md 6d); outputs
    must be bit-identical to the unpinned model on the same weights."""
    cfg, model, variables, x, states = setup
    attn = dataclasses.replace(
        cfg.model.backbone.attention, pin_partition_layout=True
    )
    backbone = dataclasses.replace(cfg.model.backbone, attention=attn)
    pinned = YoloXDetector(dataclasses.replace(cfg.model, backbone=backbone))

    out0, st0, p0 = jax.jit(model.apply)(variables, x, states)
    out1, st1, p1 = jax.jit(pinned.apply)(variables, x, states)
    np.testing.assert_array_equal(np.asarray(out0["preds"]), np.asarray(out1["preds"]))
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    for (h0, c0), (h1, c1) in zip(st0, st1):
        np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))


def test_replicate_pad_hw_matches_edge_pad():
    """replicate_pad_hw must be byte-identical to jnp.pad(mode="edge")
    forward AND in gradient — it exists only to change the *lowering* of the
    transpose (local slices+adds instead of GSPMD's partition-id select +
    collective-permute, which deadlocks single-threaded executors; see
    layers.py docstring / MULTICHIP_r03-r04)."""
    from sast_tpu.models.layers import replicate_pad_hw

    x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 7, 3).astype(np.float32))
    for ph, pw in [(0, 0), (1, 1), (2, 3), (3, 0), (0, 2)]:
        a = replicate_pad_hw(x, ph, pw)
        b = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="edge")
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    w = jnp.asarray(np.random.RandomState(1).randn(2, 9, 11, 3).astype(np.float32))

    def f1(x):
        return jnp.sum(replicate_pad_hw(x, 2, 2) * w)

    def f2(x):
        return jnp.sum(
            jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="edge") * w
        )

    g1 = jax.grad(f1)(x)
    g2 = jax.grad(f2)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=0, atol=1e-6)
