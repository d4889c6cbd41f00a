"""FLOPs / cost analysis.

Counterpart of /root/reference/utils/flop_counter.py:12-41 (fvcore
FlopCountAnalysis on a dummy input) — here XLA's own compiled cost analysis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def model_cost(model, params, *example_args) -> dict:
    """Compiled-cost analysis of model.apply on the example inputs."""
    lowered = jax.jit(
        lambda p, *a: model.apply(p, *a, True)
    ).lower(params, *example_args)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    return {
        "flops": cost.get("flops", float("nan")),
        "bytes_accessed": cost.get("bytes accessed", float("nan")),
    }


def count_flops(cfg, temp_len=16, height=256, width=320) -> dict:
    """FLOPs of the configured model on a dummy clip (flop_counter.py:19)."""
    from ..models import build_model

    model = build_model(cfg, dtype=jnp.bfloat16)
    pixels = jnp.zeros((1, temp_len, height, width, 3), jnp.float32)
    mask = jnp.zeros((1, height, width), bool)
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), pixels, mask, True
    )
    return model_cost(model, params, pixels, mask)
