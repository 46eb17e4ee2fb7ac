"""Training CLI.

Equivalent of the reference train.py (Hydra CLI -> PL Trainer.fit): builds the
resolved config from dataset/size presets plus dotted overrides, wires the
data module, and runs the training loop with periodic Prophesee validation and
best-AP checkpointing.

Examples:
    python train.py --dataset gen1 --size base --data /data/gen1 \
        --workdir runs/gen1_base
    python train.py --dataset gen4 --size base --data /data/gen4 \
        --set training.learning_rate=2e-4 --resume
"""

from __future__ import annotations

import argparse
import ast
import sys


def parse_overrides(pairs):
    out = {}
    for pair in pairs or []:
        key, _, value = pair.partition("=")
        assert _ == "=", f"override must be key=value: {pair}"
        try:
            out[key] = ast.literal_eval(value)
        except (ValueError, SyntaxError):
            out[key] = value
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", choices=("gen1", "gen4"), default="gen1")
    ap.add_argument("--size", choices=("tiny", "small", "base", "large"), default="base")
    ap.add_argument("--data", required=True, help="preprocessed dataset root")
    ap.add_argument("--workdir", default="runs/default")
    ap.add_argument("--set", dest="overrides", action="append", metavar="KEY=VALUE")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--resume-only-weights", action="store_true")
    ap.add_argument(
        "--resume-wandb-artifact",
        default=None,
        metavar="ENTITY/PROJECT/ARTIFACT:ALIAS",
        help="resume from a W&B model artifact (reference artifact resume)",
    )
    ap.add_argument("--wandb", action="store_true")
    ap.add_argument(
        "--wandb-runpath", default=None,
        help="existing W&B runpath (entity/project/run_id) to resume logging "
        "into; the last component becomes the run id (reference "
        "loggers/utils.py:14-19)",
    )
    ap.add_argument(
        "--sparse-kernel-train", action="store_true",
        help="train through the Pallas window-skipping kernel (custom VJP; "
        "TPU only, requires drop_path/drop_mlp == 0)",
    )
    ap.add_argument(
        "--device-cache", action="store_true",
        help="keep the whole train split's event representations resident "
        "in device HBM and gather clips on device (zero per-step upload; "
        "single process, flip-only augmentation, dataset must fit in HBM — "
        "see sast_tpu/data/device_cache.py)",
    )
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("--val-every", type=int, default=10_000)
    ap.add_argument("--log-every", type=int, default=50)
    ap.add_argument(
        "--profile-steps", metavar="FIRST:LAST", default=None,
        help="capture a jax.profiler trace of these training steps "
        "(inclusive) into <workdir>/trace; view with TensorBoard/xprof",
    )
    args = ap.parse_args()
    if args.wandb_runpath and not args.wandb:
        # Asking to resume a W&B run implies W&B logging; a silent no-op here
        # would drop the resume the user asked for.
        print("--wandb-runpath given: enabling --wandb", file=sys.stderr)
        args.wandb = True

    from sast_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from sast_tpu.parallel.mesh import (
        make_mesh,
        maybe_initialize_distributed,
        process_shard_info,
    )

    # Multi-host: connect to the coordinator BEFORE any device use so
    # jax.devices() spans the pod slice (reference: dist.init_process_group,
    # /root/reference/train.py:91-98).
    maybe_initialize_distributed()

    import jax

    from sast_tpu.config import get_config
    from sast_tpu.data.module import DataModule
    from sast_tpu.training.loop import Trainer
    from sast_tpu.training.optimizer import scale_lr_for_global_batch

    overrides = parse_overrides(args.overrides)
    overrides.setdefault("dataset.path", args.data)
    cfg = get_config(args.dataset, args.size, **overrides)

    rank, world = process_shard_info()
    n_devices = jax.device_count()
    # Reference rule (README Training): lr = base * sqrt(global_batch / 8).
    # Each process feeds batch_size_train lanes; with a single-process
    # multi-device mesh the global batch is still batch_size_train (sharded).
    global_batch = cfg.training.batch_size_train * max(world, 1)
    lr = (
        scale_lr_for_global_batch(cfg.training.learning_rate, global_batch)
        if world > 1
        else cfg.training.learning_rate
    )
    mesh = make_mesh() if n_devices > 1 else None
    print(
        f"rank {rank}/{world}  devices {n_devices}  lr {lr:.3e}"
        + ("  (data-parallel mesh)" if mesh is not None else ""),
        file=sys.stderr,
    )

    dm = DataModule(cfg, rank=rank, world_size=world)
    trainer = Trainer(
        cfg,
        workdir=args.workdir,
        use_wandb=args.wandb,
        wandb_run_id=(
            args.wandb_runpath.rstrip("/").split("/")[-1]
            if args.wandb_runpath
            else None
        ),
        log_every=args.log_every,
        val_every=args.val_every,
        use_pallas_train=args.sparse_kernel_train,
        learning_rate=lr,
        mesh=mesh,
    )
    if args.resume_wandb_artifact:
        ok = trainer.resume_from_artifact(
            args.resume_wandb_artifact, weights_only=args.resume_only_weights
        )
        if not ok:
            # Starting from scratch when the user asked to continue a run
            # would silently overwrite the very checkpoints they wanted.
            sys.exit(
                f"failed to resume from W&B artifact "
                f"{args.resume_wandb_artifact!r} (is --wandb set and the "
                "artifact reachable?)"
            )
    else:
        trainer.maybe_resume(args.resume or args.resume_only_weights,
                             weights_only=args.resume_only_weights)

    # NOTE: like the reference (modules/data/genx.py:161-162), validation
    # during fit streams the *test* split.
    profile_steps = None
    if args.profile_steps:
        first, _, last = args.profile_steps.partition(":")
        profile_steps = (int(first), int(last or first))

    if args.device_cache:
        assert mesh is None and world == 1, (
            "--device-cache is single-process/single-device; use the host "
            "loader for mesh/multi-host runs"
        )
        from sast_tpu.data.device_cache import (
            DeviceCachedEvalStream,
            DeviceCachedTrainStream,
        )

        train_batches = DeviceCachedTrainStream(
            cfg, seed=cfg.training.seed or 0
        )
        # NOTE: like the host path below, validation during fit streams the
        # *test* split (reference quirk, modules/data/genx.py:161-162). The
        # eval cache is built once and reused across validations.
        eval_cache = DeviceCachedEvalStream(cfg, "test")
        eval_loader_fn = lambda: eval_cache  # noqa: E731
    else:
        train_batches = dm.train_batches(seed=cfg.training.seed or 0)
        eval_loader_fn = lambda: dm.eval_batches("test")  # noqa: E731

    trainer.fit(
        train_batches,
        eval_loader_fn=eval_loader_fn,
        max_steps=args.max_steps,
        profile_steps=profile_steps,
    )


if __name__ == "__main__":
    main()
