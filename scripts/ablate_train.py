"""Train-step component ablation: where does the gen1-base step go?

Times, with the cliff-aware slope protocol (chained steps via lax.scan,
donated state, operands as runtime args):
  1. full train step (fwd + bwd + AdamW/EMA)
  2. forward + loss only (no grad)
  3. backbone BPTT scan only (no detect/loss)
  4. detect + SimOTA loss only (on captured features)

Usage: python scripts/ablate_train.py [--dataset gen1] [--batch 8]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


from sast_tpu.utils.benchmark import slope_time as _slope_time


def slope_time(build, L1=4, L2=12, blocks=3):
    return _slope_time(build, L1, L2, blocks)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="gen1")
    ap.add_argument("--size", default="base")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seq", type=int, default=None)
    ap.add_argument("--sparsity", type=float, default=0.9)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from sast_tpu.config import get_config
    from sast_tpu.data.synthetic import synthetic_train_batch
    from sast_tpu.models.backbone import zero_states
    from sast_tpu.models.detector import YoloXDetector
    from sast_tpu.models.losses import yolox_loss
    from sast_tpu.training.steps import (
        _backbone_scan,
        create_train_state,
        make_train_step,
    )
    from sast_tpu.utils.benchmark import sync_dispatch
    from sast_tpu.utils.cache import enable_compilation_cache
    from sast_tpu.utils.padding import InputPadder, padding_token_mask

    enable_compilation_cache()
    cfg = get_config(args.dataset, args.size)
    if args.seq:
        cfg = dataclasses.replace(
            cfg, dataset=dataclasses.replace(cfg.dataset, sequence_length=args.seq)
        )
    B = args.batch
    T = cfg.dataset.sequence_length
    state, model = create_train_state(cfg, jax.random.PRNGKey(0))
    batch_np = synthetic_train_batch(
        cfg, np.random.RandomState(0), batch_size=B, sparsity=args.sparsity
    )
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    dt = jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32
    lstm0 = zero_states(cfg.model.backbone, B, dtype=dt)
    in_stages = tuple(cfg.model.fpn.in_stages)
    padder = InputPadder(cfg.model.backbone.in_res_hw)
    token_mask = (
        padding_token_mask(cfg.dataset.resolution_hw, cfg.model.backbone.in_res_hw)
        if cfg.model.backbone.enable_masking
        else None
    )
    nch = cfg.model.backbone.input_channels

    overhead = sync_dispatch()
    print(
        f"# {args.dataset}-{args.size} train-step ablation, B={B} T={T}, "
        f"device={jax.devices()[0]}, overhead {overhead * 1e3:.1f} ms"
    )

    train_step = jax.jit(make_train_step(model, cfg), donate_argnums=(0, 2))

    def build_full(length):
        def run(state, batch, lstm):
            def body(carry, _):
                st, ls = carry
                st, ls, m = train_step(st, batch, ls)
                return (st, ls), m["loss"]

            (st, ls), losses = jax.lax.scan(
                body, (state, lstm), None, length=length
            )
            return losses[-1]

        f = jax.jit(run)
        st0 = jax.tree.map(jnp.copy, state)
        return lambda: f(st0, batch, jax.tree.map(jnp.copy, lstm0))

    def fwd_loss(params, batch_stats, batch, lstm):
        final_states, feats_seq, p_seq = _backbone_scan(
            model, params, batch["ev_repr"], lstm, in_stages,
            deterministic=True, padder=padder, num_channels=nch,
            dropout_rng=None, token_mask=token_mask,
            remat_policy=cfg.training.remat_policy,
        )
        L = batch["frame_tidx"].shape[1]
        lane = jnp.arange(B)[:, None]
        sel = {
            s: f[batch["frame_tidx"], lane].reshape(B * L, *f.shape[2:])
            for s, f in zip(in_stages, feats_seq)
        }
        outputs, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            sel, train=True, method=YoloXDetector.forward_detect,
            mutable=["batch_stats"],
        )
        losses = yolox_loss(
            preds=outputs["preds"], grids=outputs["grids"],
            strides=outputs["strides"],
            gt_boxes=batch["gt_boxes"].reshape(B * L, -1, 4),
            gt_classes=batch["gt_classes"].reshape(B * L, -1),
            gt_valid=batch["gt_valid"].reshape(B * L, -1),
            frame_valid=batch["frame_valid"].reshape(B * L),
            num_classes=cfg.model.head.num_classes,
            topk=cfg.model.head.simota_topk,
        )
        return losses["loss"], final_states

    def build_fwd(length):
        def run(params, batch_stats, batch, lstm):
            def body(carry, _):
                ls, acc = carry
                loss, ls = fwd_loss(params, batch_stats, batch, lstm)
                return (ls, acc + loss), None

            (_, acc), _ = jax.lax.scan(
                body, (lstm, jnp.zeros((), jnp.float32)), None, length=length
            )
            return acc

        f = jax.jit(run)
        return lambda: f(state.params, state.batch_stats, batch, lstm0)

    def build_backbone(length):
        def run(params, ev, lstm):
            def body(carry, _):
                ls, acc = carry
                ls, feats_seq, _ = _backbone_scan(
                    model, params, ev, ls, in_stages,
                    deterministic=True, padder=padder, num_channels=nch,
                    dropout_rng=None, token_mask=token_mask,
                    remat_policy=cfg.training.remat_policy,
                )
                acc = acc + sum(f.sum(dtype=jnp.float32) for f in feats_seq)
                return (ls, acc), None

            (_, acc), _ = jax.lax.scan(
                body, (lstm, jnp.zeros((), jnp.float32)), None, length=length
            )
            return acc

        f = jax.jit(run)
        return lambda: f(state.params, batch["ev_repr"], lstm0)

    rows = [
        ("full train step (fwd+bwd+opt)", build_full),
        ("forward + loss only", build_fwd),
        ("backbone BPTT scan fwd only", build_backbone),
    ]
    for name, build in rows:
        ms = slope_time(build) * 1e3
        print(f"{name:<36} {ms:9.2f} ms/step")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
