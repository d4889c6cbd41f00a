#!/usr/bin/env python
"""Evaluation CLI.

Keeps the reference CLI contract (/root/reference/evaluate.py:91-156):
``python evaluate.py --config-file <yaml> --pretrained_path <ckpt>
[--split N] [--debug] [--root_data_path ...]`` — builds the model + val
loader, loads the checkpoint (orbax or reference .pth, converted on the
fly), runs validation and prints the JSON metrics line.

TPU runtime replaces the reference's mp.spawn/NCCL plumbing: one process
per host, a jax.sharding data mesh, eval aggregation via the shared txt
protocol.
"""

import argparse
import datetime
import json
import os
import time

import jax
import jax.numpy as jnp


def parse_args():
    parser = argparse.ArgumentParser(
        description="Evaluate video action detection models (TPU)."
    )
    parser.add_argument("--config-file",
                        default="./configuration/AVA22_CSN152.yaml")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--amp", action="store_true",
                        help="bf16 backbone compute")
    parser.add_argument("--split", default=0, type=int)
    parser.add_argument("--pretrained_path", default="")
    parser.add_argument("--root_data_path", type=str, default=None)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--profile", type=str, default=None, metavar="DIR",
                        help="capture a jax.profiler trace of the eval loop "
                             "into DIR (view with TensorBoard/XProf)")
    parser.add_argument("--flops", action="store_true",
                        help="print the model's XLA cost analysis "
                             "(FLOPs/bytes) before evaluating")
    return parser.parse_args()


def setup_cfg(args):
    from class_query_vad_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.merge_from_file(args.config_file)
    now = datetime.datetime.now()
    study, run = now.strftime("%Y-%m-%d"), now.strftime("%H-%M")
    if args.root_data_path:
        cfg.CONFIG.DATA.DATA_PATH = args.root_data_path
        cfg.CONFIG.DATA.LABEL_PATH = os.path.join(
            args.root_data_path, cfg.CONFIG.DATA.LABEL_PATH
        )
    cfg.CONFIG.LOG.RES_DIR = cfg.CONFIG.LOG.RES_DIR.format(study, run)
    cfg.CONFIG.LOG.EXP_NAME = cfg.CONFIG.LOG.EXP_NAME.format(study, run)
    if args.debug:
        cfg.CONFIG.LOG.RES_DIR = f"debug_{study}-{run}/res/"
        cfg.CONFIG.LOG.EXP_NAME = f"debug_{study}-{run}"
    if cfg.CONFIG.DATA.DATASET_NAME == "jhmdb":
        cfg.CONFIG.DATA.SPLIT = args.split
    cfg.CONFIG.MODEL.PRETRAINED_PATH = args.pretrained_path
    cfg.CONFIG.EVAL_ONLY = True
    return cfg


def main():
    args = parse_args()
    from class_query_vad_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    cfg = setup_cfg(args)

    if os.environ.get("NUM_PROCESSES"):
        from class_query_vad_tpu.parallel import initialize_distributed

        initialize_distributed(
            os.environ.get("COORDINATOR_ADDRESS"),
            int(os.environ["NUM_PROCESSES"]),
            int(os.environ.get("PROCESS_ID", 0)),
        )

    from class_query_vad_tpu.datasets import build_dataloader
    from class_query_vad_tpu.engine import load_pretrained_params, run_validation
    from class_query_vad_tpu.losses import (
        build_criterion_and_postprocessor,
        build_matcher,
    )
    from class_query_vad_tpu.models import build_model
    from class_query_vad_tpu.utils.misc import param_count

    dtype = jnp.bfloat16 if (args.amp or cfg.CONFIG.AMP) else jnp.float32
    model = build_model(cfg, dtype=dtype)
    matcher = build_matcher(cfg)
    criterion, postprocess, _ = build_criterion_and_postprocessor(cfg, matcher)

    rank = jax.process_index()
    world = jax.process_count()
    loader = build_dataloader(cfg, "val", host_id=rank, num_hosts=world,
                              num_workers=args.num_workers)

    if cfg.CONFIG.MODEL.PRETRAINED_PATH:
        params = load_pretrained_params(cfg, cfg.CONFIG.MODEL.PRETRAINED_PATH)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    else:
        print("WARNING: no --pretrained_path; evaluating a random init")
        first = next(iter(loader))[0]
        params = jax.jit(model.init, static_argnums=(3,))(
            jax.random.PRNGKey(0), jnp.asarray(first["pixels"]),
            jnp.asarray(first["mask"]), True,
        )
    n_params = param_count(params)
    print("Number of parameters in the model: %6.2fM" % (n_params / 1e6))

    if args.flops:
        from class_query_vad_tpu.utils.flops import model_cost

        first = next(iter(loader))[0]
        cost = model_cost(model, params, jnp.asarray(first["pixels"]),
                          jnp.asarray(first["mask"]))
        print("Model cost analysis: %.2f GFLOPs, %.2f GB accessed"
              % (cost["flops"] / 1e9, cost["bytes_accessed"] / 1e9))

    barrier = lambda: None
    if world > 1:
        from jax.experimental import multihost_utils

        barrier = lambda: multihost_utils.sync_global_devices("eval_txt")

    t0 = time.time()
    # criterion => eval losses are computed/logged and a non-finite total
    # aborts (reference video_action_recognition.py:208-213)
    import contextlib

    profile_ctx = contextlib.nullcontext()
    if args.profile:
        from class_query_vad_tpu.utils.profiling import trace

        profile_ctx = trace(args.profile)
    with profile_ctx:
        result = run_validation(cfg, model, params, postprocess, loader,
                                rank=rank, world_size=world, barrier=barrier,
                                criterion=criterion,
                                transfer_dtype=(jnp.bfloat16 if dtype
                                                == jnp.bfloat16 else None))
    if result is not None:
        line = {"mAP": result["mAP"], "time": time.time() - t0}
        if "v_mAP" in result:
            line["v_mAP"] = result["v_mAP"]
        if "eval_losses" in result:
            line["eval_loss"] = result["eval_losses"]["total_loss"]
        print(json.dumps(line))


if __name__ == "__main__":
    main()
