#!/usr/bin/env python
"""Training CLI.

Keeps the reference CLI contract (/root/reference/train.py:184-252):
``python train.py --config-file <yaml> [--pretrained_path ...] [--debug]
[--amp] [--split N] [--root_data_path ...]``.

Epoch loop mirrors train.py:33-182: constant-LR AdamW, grad accumulation,
clip 1.0, periodic validation + checkpoint-on-best.  Distribution is a
jax.sharding data mesh (multi-host via jax.distributed.initialize — set
COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID env vars instead of the
reference's shared-filesystem IP list).
"""

import argparse
import datetime
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(
        description="Train video action detection models (TPU)."
    )
    parser.add_argument("--config-file",
                        default="./configuration/AVA22_CSN152.yaml")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--amp", action="store_true")
    parser.add_argument("--split", default=0, type=int)
    parser.add_argument("--pretrained_path", default="")
    parser.add_argument("--root_data_path", type=str, default=None)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--resume", default="",
                        help="checkpoint dir to resume from (restores the "
                             "full TrainState + epoch counter; the "
                             "reference's start_epoch is hardcoded 0 — "
                             "/root/reference/train.py:81)")
    return parser.parse_args()


def main():
    args = parse_args()

    from evaluate import setup_cfg
    from class_query_vad_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = setup_cfg(args)
    cfg.CONFIG.EVAL_ONLY = False

    if os.environ.get("NUM_PROCESSES"):
        from class_query_vad_tpu.parallel import initialize_distributed

        initialize_distributed(
            os.environ.get("COORDINATOR_ADDRESS"),
            int(os.environ["NUM_PROCESSES"]),
            int(os.environ.get("PROCESS_ID", 0)),
        )

    from class_query_vad_tpu.datasets import build_dataloader
    from class_query_vad_tpu.engine import (
        create_train_state,
        load_pretrained_params,
        make_train_step,
        run_validation,
        save_checkpoint,
    )
    from class_query_vad_tpu.losses import (
        build_criterion_and_postprocessor,
        build_matcher,
    )
    from class_query_vad_tpu.models import build_model
    from class_query_vad_tpu.parallel import create_mesh, replicate, shard_batch
    from class_query_vad_tpu.utils.logging import (
        MetricsLogger,
        build_log_dir,
        print_log,
    )
    from class_query_vad_tpu.utils.misc import param_count

    dtype = jnp.bfloat16 if (args.amp or cfg.CONFIG.AMP) else jnp.float32
    model = build_model(cfg, dtype=dtype)
    matcher = build_matcher(cfg)
    criterion, postprocess, weight_dict = build_criterion_and_postprocessor(
        cfg, matcher
    )

    rank = jax.process_index()
    world = jax.process_count()
    # log dir + stdout tee (reference utils/utils.py:185-192) and metric
    # sinks (jsonl always; wandb/tensorboard per config — train.py:84-105)
    log_path = build_log_dir(cfg) if rank == 0 else None
    logger = MetricsLogger(
        cfg, rank=rank,
        use_wandb=bool(cfg.CONFIG.LOG.get("USE_WANDB", False)),
        use_tensorboard=bool(cfg.CONFIG.LOG.get("USE_TENSORBOARD", False)),
    )
    train_loader = build_dataloader(cfg, "train", host_id=rank,
                                    num_hosts=world,
                                    num_workers=args.num_workers)
    val_loader = build_dataloader(cfg, "val", host_id=rank, num_hosts=world,
                                  num_workers=args.num_workers)

    mesh = create_mesh(cfg, batch_size=cfg.CONFIG.TRAIN.BATCH_SIZE)
    first_batch, _ = next(iter(train_loader))
    state, tx = create_train_state(
        model, cfg, jax.random.PRNGKey(0), first_batch,
        steps_per_epoch=len(train_loader),
    )
    if cfg.CONFIG.MODEL.PRETRAINED_PATH:
        params = load_pretrained_params(cfg, cfg.CONFIG.MODEL.PRETRAINED_PATH)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        state = state.replace(params=params, opt_state=tx.init(params))
    elif cfg.CONFIG.MODEL.get("LOAD_DETR", False) and cfg.CONFIG.MODEL.get(
        "PRETRAIN_TRANSFORMER_DIR", ""
    ):
        # two-stage init: transplant stage-1 transformer weights
        from class_query_vad_tpu.engine.checkpoint import load_detr_weights

        params = load_detr_weights(
            jax.device_get(state.params),
            cfg.CONFIG.MODEL.PRETRAIN_TRANSFORMER_DIR, cfg,
        )
        params = jax.tree_util.tree_map(jnp.asarray, params)
        state = state.replace(params=params, opt_state=tx.init(params))
    print_log(log_path,
              "Number of parameters: %6.2fM" % (param_count(state.params) / 1e6))

    start_epoch, best_map = 0, 0.0
    if args.resume:
        from class_query_vad_tpu.engine.checkpoint import load_checkpoint

        restored, meta = load_checkpoint(
            args.resume, target=jax.device_get(state)
        )
        state = restored
        start_epoch = int(meta.get("epoch", -1)) + 1
        best_map = float(meta.get("accuracy", 0.0))
        print_log(log_path,
                  f"Resumed from {args.resume}: epoch {start_epoch}, "
                  f"best mAP {best_map:.4f}")

    state = replicate(mesh, state)
    train_step = jax.jit(
        make_train_step(model, criterion, weight_dict, tx), donate_argnums=(0,)
    )

    for epoch in range(start_epoch, cfg.CONFIG.TRAIN.NUM_EPOCHS):
        train_loader.set_epoch(epoch)
        t0 = time.time()
        total_loss, n_steps = 0.0, 0
        window = []
        for batch, _ in train_loader:
            batch = shard_batch(mesh, {
                k: jnp.asarray(v) for k, v in batch.items()
            })
            state, metrics = train_step(state, batch)
            # keep the losses on device: a per-step float() would serialize
            # dispatch against the ~24ms host-materialization RTT
            window.append(metrics)
            n_steps += 1
            if n_steps % cfg.CONFIG.LOG.DISPLAY_FREQ == 0 and rank == 0:
                window = jax.device_get(window)
                total_loss += sum(float(m["total_loss"]) for m in window)
                last = {k: float(v) for k, v in window[-1].items()}
                window = []
                print_log(
                    log_path,
                    f"Epoch [{epoch}] Step [{n_steps}] "
                    f"loss: {last['total_loss']:.4f} "
                    f"({(time.time() - t0) / n_steps:.3f}s/step)"
                )
                # per-key train losses (reference wandb.log, train.py:170-175)
                logger.log({"epoch": epoch, "step": n_steps,
                            **{f"train/{k}": v for k, v in last.items()}})
        total_loss += sum(
            float(m["total_loss"]) for m in jax.device_get(window)
        )
        if rank == 0:
            print_log(log_path,
                      f"Epoch {epoch}: mean loss "
                      f"{total_loss / max(n_steps, 1):.4f} "
                      f"in {time.time() - t0:.1f}s")

        if (epoch + 1) % cfg.CONFIG.TRAIN.EVAL_FREQ == 0:
            barrier = lambda: None
            if world > 1:
                from jax.experimental import multihost_utils

                barrier = lambda: multihost_utils.sync_global_devices(
                    "eval_txt"
                )
            result = run_validation(
                cfg, model, jax.device_get(state.params), postprocess,
                val_loader, rank=rank, world_size=world, barrier=barrier,
                criterion=criterion,
                transfer_dtype=(jnp.bfloat16 if dtype == jnp.bfloat16
                                else None),
            )
            if result is not None:
                best_map = max(best_map, result["mAP"])
                line = {"epoch": epoch, "mAP": result["mAP"],
                        "best_mAP": best_map}
                if "eval_losses" in result:
                    line.update({f"eval/{k}": v
                                 for k, v in result["eval_losses"].items()})
                logger.log(line)
            if rank == 0:
                # save EVERY eval epoch like the reference
                # (/root/reference/train.py:99-103), not only on best
                path = save_checkpoint(
                    cfg, jax.device_get(state), epoch,
                    accuracy=result["mAP"] if result else 0.0,
                )
                print_log(log_path, f"Saved checkpoint {path}")


if __name__ == "__main__":
    main()
