"""Checkpoint converter tests.

1. Structural: a synthetic reference-style state_dict converts into exactly
   the pytree produced by model.init (same keys, same shapes) — catches any
   naming/layout drift between the converter and the flax modules.
2. Numerical: the attention-block conversion reproduces torch-computed
   outputs (validates the qkv channel permutation, norm/GLU/proj transposes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sast_tpu.checkpoint.torch_convert import convert_state_dict, _qkv_permutation
from sast_tpu.config import get_test_config
from sast_tpu.models.backbone import zero_states
from sast_tpu.models.detector import YoloXDetector
from sast_tpu.models.sast import MaskedSparseAttention


def _tree_shapes(tree):
    return jax.tree.map(lambda x: tuple(x.shape), tree)


def _synthesize_torch_sd(params, stats):
    """Build a reference-style state_dict from converted-tree templates by
    inverting the converter's transforms (shapes only need to round-trip)."""
    sd = {}

    def base_conv(prefix, p, s):
        sd[f"{prefix}.conv.weight"] = torch.from_numpy(
            np.transpose(np.asarray(p["Conv_0"]["kernel"]), (3, 2, 0, 1)).copy()
        )
        sd[f"{prefix}.bn.weight"] = torch.from_numpy(np.asarray(p["BatchNorm_0"]["scale"]).copy())
        sd[f"{prefix}.bn.bias"] = torch.from_numpy(np.asarray(p["BatchNorm_0"]["bias"]).copy())
        sd[f"{prefix}.bn.running_mean"] = torch.from_numpy(np.asarray(s["BatchNorm_0"]["mean"]).copy())
        sd[f"{prefix}.bn.running_var"] = torch.from_numpy(np.asarray(s["BatchNorm_0"]["var"]).copy())

    def csp(prefix, p, s):
        base_conv(f"{prefix}.conv1", p["BaseConv_0"], s["BaseConv_0"])
        base_conv(f"{prefix}.conv2", p["BaseConv_1"], s["BaseConv_1"])
        base_conv(f"{prefix}.conv3", p["BaseConv_2"], s["BaseConv_2"])
        j = 0
        while f"Bottleneck_{j}" in p:
            bp, bs = p[f"Bottleneck_{j}"], s[f"Bottleneck_{j}"]
            base_conv(f"{prefix}.m.{j}.conv1", bp["BaseConv_0"], bs["BaseConv_0"])
            base_conv(f"{prefix}.m.{j}.conv2", bp["BaseConv_1"], bs["BaseConv_1"])
            j += 1

    def dense(prefix, p, with_bias=True):
        sd[f"{prefix}.weight"] = torch.from_numpy(
            np.transpose(np.asarray(p["kernel"]), (1, 0)).copy()
        )
        if with_bias and "bias" in p:
            sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(p["bias"]).copy())

    def ms_wsa(prefix, p, dim, dim_head):
        perm = _qkv_permutation(dim, dim_head)
        inv = np.argsort(perm)
        sd[f"{prefix}.qkv.weight"] = torch.from_numpy(
            np.transpose(np.asarray(p["qkv"]["kernel"])[:, inv], (1, 0)).copy()
        )
        if "bias" in p["qkv"]:
            sd[f"{prefix}.qkv.bias"] = torch.from_numpy(np.asarray(p["qkv"]["bias"])[inv].copy())
        dense(f"{prefix}.proj", p["proj"])
        for n in ("norm1", "norm2"):
            sd[f"{prefix}.{n}.weight"] = torch.from_numpy(np.asarray(p[n]["scale"]).copy())
            sd[f"{prefix}.{n}.bias"] = torch.from_numpy(np.asarray(p[n]["bias"]).copy())
        sd[f"{prefix}.ls1.gamma"] = torch.from_numpy(np.asarray(p["ls1"]["gamma"]).copy())
        sd[f"{prefix}.ls2.gamma"] = torch.from_numpy(np.asarray(p["ls2"]["gamma"]).copy())
        dense(f"{prefix}.mlp.net.0.proj", p["mlp"]["GLU_0"]["Dense_0"])
        dense(f"{prefix}.mlp.net.2", p["mlp"]["Dense_0"])

    cfg = get_test_config().model
    bb = cfg.backbone
    for i in range(bb.num_stages):
        sp = f"mdl.backbone.stages.{i}"
        st = params["backbone"][f"stage{i}"]
        sd[f"{sp}.downsample_cf2cl.conv.weight"] = torch.from_numpy(
            np.transpose(np.asarray(st["downsample"]["Conv_0"]["kernel"]), (3, 2, 0, 1)).copy()
        )
        sd[f"{sp}.downsample_cf2cl.norm.weight"] = torch.from_numpy(
            np.asarray(st["downsample"]["LayerNorm_0"]["scale"]).copy()
        )
        sd[f"{sp}.downsample_cf2cl.norm.bias"] = torch.from_numpy(
            np.asarray(st["downsample"]["LayerNorm_0"]["bias"]).copy()
        )
        sd[f"{sp}.lstm.conv1x1.weight"] = torch.from_numpy(
            np.transpose(np.asarray(st["lstm"]["Conv_0"]["kernel"]), (3, 2, 0, 1)).copy()
        )
        sd[f"{sp}.lstm.conv1x1.bias"] = torch.from_numpy(
            np.asarray(st["lstm"]["Conv_0"]["bias"]).copy()
        )
        for j in range(bb.num_blocks[i]):
            bp = f"{sp}.att_blocks.{j}.att"
            blk = st[f"block{j}"]
            ms_wsa(f"{bp}.win_attn", blk["win_attn"], bb.stage_dims[i], bb.attention.dim_head)
            ms_wsa(f"{bp}.grid_attn", blk["grid_attn"], bb.stage_dims[i], bb.attention.dim_head)
            if j == 0:
                dense(f"{bp}.to_scores", blk["to_scores"])
                sd[f"{bp}.to_controls.weight"] = torch.from_numpy(
                    np.transpose(np.asarray(blk["to_controls"]["weight"]), (1, 0)).copy()
                )

    for name in ("lateral_conv0", "reduce_conv1", "bu_conv2", "bu_conv1"):
        base_conv(f"mdl.fpn.{name}", params["fpn"][name], stats["fpn"][name])
    for name in ("C3_p4", "C3_p3", "C3_n3", "C3_n4"):
        csp(f"mdl.fpn.{name}", params["fpn"][name], stats["fpn"][name])

    for k in range(3):
        base_conv(f"mdl.head.stems.{k}", params["head"][f"stem{k}"], stats["head"][f"stem{k}"])
        for c in range(2):
            base_conv(
                f"mdl.head.cls_convs.{k}.{c}",
                params["head"][f"cls_conv{k}_{c}"],
                stats["head"][f"cls_conv{k}_{c}"],
            )
            base_conv(
                f"mdl.head.reg_convs.{k}.{c}",
                params["head"][f"reg_conv{k}_{c}"],
                stats["head"][f"reg_conv{k}_{c}"],
            )
        for name, tname in (
            (f"cls_pred{k}", f"mdl.head.cls_preds.{k}"),
            (f"reg_pred{k}", f"mdl.head.reg_preds.{k}"),
            (f"obj_pred{k}", f"mdl.head.obj_preds.{k}"),
        ):
            p = params["head"][name]
            sd[f"{tname}.weight"] = torch.from_numpy(
                np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1)).copy()
            )
            sd[f"{tname}.bias"] = torch.from_numpy(np.asarray(p["bias"]).copy())
    return sd


def test_convert_round_trip_structure_and_values():
    cfg = get_test_config()
    model = YoloXDetector(cfg.model)
    x = jnp.zeros((1, *cfg.model.backbone.in_res_hw, 20), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, zero_states(cfg.model.backbone, 1))
    params0 = jax.tree.map(np.asarray, variables["params"])
    stats0 = jax.tree.map(np.asarray, variables["batch_stats"])

    sd = _synthesize_torch_sd(params0, stats0)
    params1, stats1 = convert_state_dict(sd, cfg.model)

    # identical structure
    assert _tree_shapes(params0) == _tree_shapes(params1)
    assert _tree_shapes(stats0) == _tree_shapes(stats1)
    # identical values (lossless round trip through the torch layout)
    for a, b in zip(jax.tree.leaves(params0), jax.tree.leaves(params1)):
        np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_qkv_permutation_matches_torch_layout():
    """Converted qkv weights reproduce torch-side reference attention."""
    dim, dim_head, S = 16, 8, 5
    heads = dim // dim_head
    rng = np.random.RandomState(0)
    x = rng.randn(S, dim).astype(np.float32)
    w = rng.randn(3 * dim, dim).astype(np.float32)
    b = rng.randn(3 * dim).astype(np.float32)

    # torch reference layout (SAST.py:219): view(-1, heads, dh*3) -> chunk
    xt = torch.from_numpy(x)
    qkv_t = torch.nn.functional.linear(xt, torch.from_numpy(w), torch.from_numpy(b))
    qkv_t = qkv_t.view(1, S, heads, dim_head * 3).transpose(1, 2)
    q_t, k_t, v_t = qkv_t.chunk(3, dim=3)

    # our layout via the converter's permutation
    perm = _qkv_permutation(dim, dim_head)
    w_ours = w.T[:, perm]
    b_ours = b[perm]
    qkv_o = (x @ w_ours + b_ours).reshape(S, 3, heads, dim_head)
    q_o = np.transpose(qkv_o[:, 0], (1, 0, 2))  # (heads, S, dh)

    np.testing.assert_allclose(q_o, q_t[0].numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.transpose(qkv_o[:, 2], (1, 0, 2)), v_t[0].numpy(), rtol=1e-6
    )
