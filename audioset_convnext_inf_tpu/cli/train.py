"""Distributed training CLI (reference pytorch/main.py train).

    python -m audioset_convnext_inf_tpu.cli.train \
        --train-indexes train_idx.h5 --eval-indexes eval_idx.h5 \
        [--bal-indexes bal_idx.h5] [--model convnext_tiny] \
        [--sampler balanced|uniform|alternate] [--batch-size 128] \
        [--mixup-alpha 1.0] [--early-stop 75000] [--workspace ./workspace] \
        [--resume-iteration N]

Data-parallel over all visible devices (multi-host via
``jax.distributed`` when launched under SLURM). Checkpoints every
--checkpoint-interval iterations include model/optimizer/sampler state and
support exact resume.
"""

from __future__ import annotations

import argparse
import logging
import os


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--train-indexes", required=True)
    parser.add_argument("--eval-indexes", default=None)
    parser.add_argument("--bal-indexes", default=None)
    parser.add_argument("--model", default="convnext_tiny")
    parser.add_argument("--after-stem-dim", type=int, nargs="+", default=[252, 56])
    # frontend geometry (main.py:939-944 flags; defaults here follow the
    # published ConvNeXt recipe - 224 mel bins per checkpoints/config.yaml -
    # not main.py's PANN-era default of 64)
    parser.add_argument("--sample-rate", type=int, default=32000)
    parser.add_argument("--window-size", type=int, default=1024)
    parser.add_argument("--hop-size", type=int, default=320)
    parser.add_argument("--mel-bins", type=int, default=224)
    parser.add_argument("--fmin", type=float, default=50.0)
    parser.add_argument("--fmax", type=float, default=14000.0)
    parser.add_argument("--sampler", default="balanced", choices=["uniform", "balanced", "alternate"])
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--max-lr", type=float, default=4e-4)
    parser.add_argument("--total-steps", type=int, default=75000)
    parser.add_argument("--optimizer", default="adamw", choices=["adam", "adamw"])
    parser.add_argument("--weight-decay", type=float, default=0.01)
    parser.add_argument("--use-wd-scheduler", action="store_true",
                        help="schedule weight decay over training "
                             "(main.py --use_wd_scheduler)")
    parser.add_argument("--mixup-alpha", type=float, default=0.0)
    parser.add_argument("--drop-path-rate", type=float, default=0.1)
    parser.add_argument("--accumulation-steps", type=int, default=1)
    parser.add_argument("--use-speed-perturb", action="store_true")
    parser.add_argument("--use-pydub-augment", action="store_true")
    parser.add_argument("--use-roll-augment", action="store_true")
    parser.add_argument("--black-list-csv", default=None)
    parser.add_argument("--early-stop", type=int, default=None)
    parser.add_argument("--eval-interval", type=int, default=5000)
    parser.add_argument("--checkpoint-interval", type=int, default=5000)
    parser.add_argument("--eval-batch-size", type=int, default=256)
    parser.add_argument("--num-workers", type=int, default=8)
    parser.add_argument("--workspace", default="./workspace")
    parser.add_argument("--resume-iteration", type=int, default=0)
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--f32-ingest", action="store_true",
                        help="ship float32 waveforms host->device instead of "
                             "raw int16 PCM decoded on device (the int16 "
                             "default halves train ingest bandwidth and is "
                             "bit-identical - tests/test_trainer.py)")
    parser.add_argument("--bf16", action="store_true", help="bfloat16 trunk compute")
    parser.add_argument("--block-impl", default="xla",
                        choices=["xla", "xla_approx"],
                        help="block tail: 'xla' = exact erf GELU (reference "
                             "training recipe); 'xla_approx' = tanh GELU, "
                             "~1.3x faster end-to-end (deviation <=1.1e-3)")
    parser.add_argument("--remat-blocks", action="store_true",
                        help="rematerialize blocks in the backward "
                             "(jax.checkpoint): fits batch >= 512 waveforms "
                             "within v5e HBM at the cost of ~1 extra block "
                             "forward per backward")
    parser.add_argument("--fused-train-blocks", action="store_true",
                        help="run stages 3-4 through the fused HWBC Pallas "
                             "kernels in the training step (fused custom-VJP "
                             "backward); needs --block-impl xla_approx and "
                             "batch %% 16 == 0")
    parser.add_argument("--frontend-precision", default=None,
                        choices=["highest", "high", "default"],
                        help="DFT/mel matmul precision; default 'high' "
                             "(bf16x3, ~15 ms/step faster at B=256) with "
                             "--bf16 whose trunk rounding exceeds the "
                             "residual DFT error, else 'highest' (true-f32 "
                             "parity recipe). 'default' (single-pass bf16) "
                             "is the certified SERVING precision; its "
                             "near-silent-bin log error is uncertified for "
                             "training gradients, so opt in explicitly")
    args = parser.parse_args(argv)

    import jax

    from audioset_convnext_inf_tpu.checkpoint import load_checkpoint, save_checkpoint
    from audioset_convnext_inf_tpu.data import (
        AlternateTrainSampler,
        AudioSetDataset,
        BalancedTrainSampler,
        DataLoader,
        EvaluateSampler,
        TrainSampler,
    )
    from audioset_convnext_inf_tpu.engine import Evaluator, StatisticsContainer, summarize
    from audioset_convnext_inf_tpu.engine.trainer import TrainConfig, Trainer
    from audioset_convnext_inf_tpu.models import create_model
    from audioset_convnext_inf_tpu.parallel.dist import initialize_distributed, is_primary

    from audioset_convnext_inf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from audioset_convnext_inf_tpu.utils import MetricLogger, create_logging

    initialize_distributed()
    create_logging(os.path.join(args.workspace, "logs", args.model))
    metrics_logger = MetricLogger(
        run_name=f"{args.model}-bs{args.batch_size}",
        out_dir=os.path.join(args.workspace, "metrics", args.model),
        config=vars(args),
    ) if is_primary() else None

    from audioset_convnext_inf_tpu.config import FrontendConfig

    fe_precision = args.frontend_precision or ("high" if args.bf16 else "highest")
    model = create_model(
        args.model,
        drop_path_rate=args.drop_path_rate,
        after_stem_dim=tuple(args.after_stem_dim),
        use_speed_perturb=args.use_speed_perturb,
        use_pydub_augment=args.use_pydub_augment,
        use_roll_augment=args.use_roll_augment,
        seed=args.seed,
        block_impl=args.block_impl,
        remat_blocks=args.remat_blocks,
        fused_train_blocks=args.fused_train_blocks,
        frontend=FrontendConfig(
            precision=fe_precision, sample_rate=args.sample_rate,
            n_fft=args.window_size, win_length=args.window_size,
            hop_length=args.hop_size, n_mels=args.mel_bins,
            fmin=args.fmin, fmax=args.fmax),
    )
    cfg = model.cfg
    params = model.params
    logging.info("model %s: %d params", args.model, model.count_parameters())

    train_cfg = TrainConfig(
        optimizer=args.optimizer,
        max_lr=args.max_lr,
        total_steps=args.total_steps,
        weight_decay=args.weight_decay,
        use_wd_schedule=args.use_wd_scheduler,
        accumulation_steps=args.accumulation_steps,
        mixup_alpha=args.mixup_alpha,
        seed=args.seed,
        bf16_compute=args.bf16,
    )

    sampler_cls = {
        "uniform": TrainSampler,
        "balanced": BalancedTrainSampler,
        "alternate": AlternateTrainSampler,
    }[args.sampler]
    # mixup needs pairs: double the sampled batch (reference main.py:556-575)
    sample_batch = args.batch_size * (2 if args.mixup_alpha > 0 else 1)
    sampler = sampler_cls(args.train_indexes, sample_batch, args.black_list_csv, args.seed)

    ckpt_root = os.path.join(args.workspace, "checkpoints", args.model)
    stats_path = os.path.join(args.workspace, "statistics", args.model, "statistics.pkl")
    statistics = StatisticsContainer(stats_path)

    trainer = Trainer(cfg, train_cfg, params)

    if args.resume_iteration:
        ck = load_checkpoint(os.path.join(ckpt_root, f"{args.resume_iteration}_iterations"))
        # restore() re-applies the constructor's mesh placement so the
        # compiled step sees identically-sharded params after resume
        trainer.restore(ck["params"], ck["opt_state"], ck["iteration"])
        if ck.get("sampler_state") is not None:
            sampler.load_state_dict(ck["sampler_state"])
            # a checkpoint written before the first post-resume step must
            # re-save the same snapshot, not the prefetch-advanced live state
            trainer.last_sampler_state = ck["sampler_state"]
        try:
            statistics.load_state_dict(args.resume_iteration)
        except FileNotFoundError:
            pass
        logging.info("resumed at iteration %d", ck["iteration"])

    loader = DataLoader(
        AudioSetDataset(training=True, keep_int16=not args.f32_ingest),
        sampler,
        num_workers=args.num_workers,
    )

    # one Evaluator for the whole run: its jitted forward takes params as an
    # argument, so fresh params per eval reuse the same compiled program.
    # Only the primary evaluates; under multi-host SLURM its Evaluator must
    # span only the LOCAL submesh - a global-mesh program launched from one
    # process would touch non-addressable devices and crash/deadlock at the
    # first eval interval. The other hosts simply wait at the next train
    # step's gradient all-reduce while the primary evaluates locally.
    if is_primary() and (args.eval_indexes or args.bal_indexes):
        from audioset_convnext_inf_tpu.parallel.mesh import get_mesh

        eval_mesh = get_mesh(jax.local_devices()) if jax.process_count() > 1 else None
        evaluator = Evaluator(params, cfg, mesh=eval_mesh)
    else:
        evaluator = None

    def eval_fn(params, iteration):
        if evaluator is None:
            return
        ev = evaluator
        ev.set_params(params)
        for tag, path in (("bal", args.bal_indexes), ("test", args.eval_indexes)):
            if not path:
                continue
            eloader = DataLoader(
                AudioSetDataset(),
                EvaluateSampler(path, args.eval_batch_size),
                num_workers=args.num_workers,
                pad_to_batch_size=args.eval_batch_size,
            )
            stats = ev.evaluate(eloader)
            s = summarize(stats)
            logging.info("iter %d %s mAP %.4f AUC %.4f d' %.4f", iteration, tag,
                         s["mAP"], s["mAUC"], s["dprime"])
            statistics.append(iteration, s, tag)
            if metrics_logger is not None:
                metrics_logger.log({f"{tag}/{k}": v for k, v in s.items()}, step=iteration)
        statistics.dump()

    def checkpoint_fn(tr, iteration):
        if not is_primary():
            return
        # the loader prefetches ahead of training, so the live sampler's
        # state is past the consumed data; the trainer tracks the snapshot
        # shipped with the last consumed batch (exact-resume contract)
        state = tr.last_sampler_state
        save_checkpoint(
            os.path.join(ckpt_root, f"{iteration}_iterations"),
            tr.state.params,
            cfg,
            opt_state=tr.state.opt_state,
            sampler_state=state if state is not None else sampler.state_dict(),
            iteration=iteration,
        )
        logging.info("checkpoint saved at iteration %d", iteration)

    trainer.train(
        loader,
        eval_fn=eval_fn,
        eval_interval=args.eval_interval,
        checkpoint_fn=checkpoint_fn,
        checkpoint_interval=args.checkpoint_interval,
        early_stop=args.early_stop,
    )
    if is_primary():
        checkpoint_fn(trainer, trainer.state.step)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
