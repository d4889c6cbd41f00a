"""Fused two-matmul FFN kernel: out = act(x @ W1 + b1) @ W2 + b2.

Motivation (PERF.md round 3): XLA never fuses two matmuls, so every
transformer FFN round-trips its hidden activation through HBM — at the
fast encoder's AVA shapes ([108,800 tokens, 256] -> 2048 -> 256 at B=2,
bf16) that is ~446 MB of pure traffic per layer (~0.5 ms/layer at v5e
HBM bandwidth) on top of the 228 GFLOP of real work.  This kernel tiles
the token axis and keeps the [TILE, F] hidden block in VMEM, so the
hidden activation never exists in HBM; weights stay VMEM-resident across
grid steps (constant block index).

Numerics mirror ``flax.linen.Dense(dtype=d)`` chains exactly: each dot
accumulates fp32 on the MXU, is cast back to the compute dtype, and the
bias is added in the compute dtype.

Reference counterpart: the torch FFNs in
/root/reference/models/detr/dab_transformer.py:497-523 (encoder) and
/root/reference/models/backbones/vit.py (Mlp) — eager torch fuses
nothing; this is TPU-runtime engineering with no semantic delta.

STATUS (measured, round 3): NOT integrated.  In the full AVA model the
kernel verifies exactly on-chip (max rel err 6e-3 bf16) but LOSES 4%
end-to-end (87.3 vs 84.0 ms/batch at B=2, tiles 1024 and 4096 alike) —
a pallas_call is a fusion/overlap barrier, and XLA already hides the
FFN's hidden-activation traffic behind the neighbouring blend kernels.
Fourth confirmed instance of the kernel-beats-microbench-loses-in-model
pattern (PERF.md).  Kept as a tested reference op for shapes/models
where the FFN is NOT adjacent to long-latency kernels XLA can overlap.
"""

from __future__ import annotations

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class DenseParams(nn.Module):
    """Declares the params of an ``nn.Dense`` (same names, shapes and
    initializers — kernel lecun_normal, bias zeros) WITHOUT computing it,
    so a caller can route the matmul pair through :func:`fused_ffn` while
    keeping a checkpoint-identical param tree."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


def _act(h, kind: str):
    if kind == "relu":
        return jax.nn.relu(h)
    if kind == "gelu_exact":
        return jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(
            h.dtype
        )
    if kind == "gelu_tanh":
        return jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(
            h.dtype
        )
    raise ValueError(f"unknown activation {kind!r}")


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                *, activation: str, precise: bool):
    prec = jax.lax.Precision.HIGHEST if precise else None
    x = x_ref[...]
    h = jax.lax.dot(
        x, w1_ref[...], preferred_element_type=jnp.float32, precision=prec,
    ).astype(x.dtype) + b1_ref[0]
    h = _act(h, activation)
    o = jax.lax.dot(
        h, w2_ref[...], preferred_element_type=jnp.float32, precision=prec,
    ).astype(x.dtype) + b2_ref[0]
    out_ref[...] = o


def ffn_reference(x, w1, b1, w2, b2, activation: str = "relu",
                  dtype=None):
    """XLA composite replicating the flax Dense chain (and this kernel)."""
    dt = dtype or x.dtype
    h = jnp.dot(x.astype(dt), w1.astype(dt)) + b1.astype(dt)
    h = _act(h, activation)
    return jnp.dot(h, w2.astype(dt)) + b2.astype(dt)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9)
)
def fused_ffn(x, w1, b1, w2, b2, activation: str = "relu",
              tile: int = 1024, use_pallas: bool = True,
              precise: bool = False, interpret: bool = False):
    """x [N, C] -> [N, C].  Weights are used in x.dtype (cast here, like
    flax Dense's dtype promotion)."""
    n, c = x.shape
    f = w1.shape[1]
    ok = (
        use_pallas
        and c % 128 == 0 and f % 128 == 0
        and (jax.default_backend() == "tpu" or interpret)
        # Mosaic has no erf/erfc lowering (probed on TPU: "Unimplemented
        # primitive ... erfc") — exact GELU stays on the XLA composite
        and activation != "gelu_exact"
    )
    if not ok:
        return ffn_reference(x, w1, b1, w2, b2, activation)

    dt = x.dtype
    w1 = w1.astype(dt)
    w2 = w2.astype(dt)
    b1 = b1.astype(dt).reshape(1, f)
    b2 = b2.astype(dt).reshape(1, c)
    pad = (-n) % tile
    if pad:
        x = jnp.pad(x, [(0, pad), (0, 0)])
    steps = x.shape[0] // tile

    out = pl.pallas_call(
        functools.partial(
            _ffn_kernel, activation=activation, precise=precise,
        ),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0)),
            pl.BlockSpec((c, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], c), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2 ** 20,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, w1, b1, w2, b2)
    return out[:n] if pad else out


def _fused_ffn_fwd(x, w1, b1, w2, b2, activation, tile, use_pallas,
                   precise, interpret):
    out = fused_ffn(x, w1, b1, w2, b2, activation, tile, use_pallas,
                    precise, interpret)
    return out, (x, w1, b1, w2, b2)


def _fused_ffn_bwd(activation, tile, use_pallas, precise, interpret,
                   res, g):
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: ffn_reference(*a, activation=activation), x, w1, b1,
        w2, b2,
    )
    return vjp(g)


fused_ffn.defvjp(_fused_ffn_fwd, _fused_ffn_bwd)
