"""Flash self-attention for the ViT backbone (Pallas, TPU).

The einsum attention in :class:`..models.vit.ViTAttention` materializes the
[B, H, N, N] score tensor in HBM several times per block (~900 MB of
traffic at N=2560) — the dominant cost of the ViT at serving shapes
(PERF.md).  This kernel never materializes scores in HBM: for one
(batch, head, q-block) grid step it keeps the full K/V of that head in
VMEM (N x 64 bf16 = 320 KB at AVA shapes), computes the [BQ, N] scores in
fp32 registers/VMEM, softmaxes row-wise (the whole row is present — no
online rescaling needed), and writes only the [BQ, D] output.

Layout trick: q, k and v are never transposed or split — the kernel reads
them as LANE SLICES of the fused qkv matmul output [B, N, 3C] via three
BlockSpec index maps (head h's q = lanes [h*D,(h+1)*D), k = C + that,
v = 2C + that), and writes head h's output into lanes [h*D,(h+1)*D) of
[B, N, C].  The surrounding model code is the same fused-qkv matmul and
output projection as the einsum path.

Reference semantics: joint space-time attention of
/root/reference/models/backbones/vit_utils.py:66-109 (fused qkv, softmax,
weighted sum; the q/v-bias trick lives in the caller).  Backward: flash
recompute — the VJP re-runs the einsum formulation under jax.vjp, so
training pays the einsum's HBM traffic but needs no saved score tensor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _flash_kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float, d: int):
    """One (batch, head-pair, q-block) step.  The lane dim of every block is
    TWO heads wide (2*d = 128 — the Mosaic minimum lane-block width); the
    pair is split by static lane slices in-kernel and attended separately."""
    q = q_ref[0]                                   # [BQ, 2D]
    k = k_ref[0]                                   # [N, 2D]
    v = v_ref[0]
    outs = []
    for hh in range(2):
        sl = slice(hh * d, (hh + 1) * d)
        s = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                  # [BQ, N] fp32
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        outs.append(jax.lax.dot_general(
            p, v[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))
    out_ref[0] = jnp.concatenate(outs, axis=-1).astype(out_ref.dtype)


def _pick_bq(n: int) -> int:
    # Large q-blocks: every grid step costs ~13us of fixed overhead
    # (PERF.md), so fewer/fatter steps win while the [BQ, N] fp32 score
    # tile stays within VMEM (~13 MB at 1280 x 2560).
    for bq in (1280, 1024, 512, 256, 128, 64):
        if n % bq == 0 and bq * n * 4 <= 14 * 2 ** 20:
            return bq
    return 0


def flash_supported(n: int, c: int, num_heads: int) -> bool:
    d = c // num_heads
    return (
        _pick_bq(n) > 0
        and 2 * d == 128              # lane blocks are head PAIRS of width 128
        and num_heads % 2 == 0
        # full-row scores [BQ, N] fp32 + K/V pair in VMEM must fit comfortably
        and _pick_bq(n) * n * 4 * 2 + 2 * n * 2 * d * 2 < 64 * 2 ** 20
    )


def _flash_fwd_impl(qkv: jnp.ndarray, num_heads: int, scale: float):
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    assert 2 * d == 128 and num_heads % 2 == 0 and c % 128 == 0
    bq = _pick_bq(n)
    npairs = num_heads // 2
    grid = (b, npairs, n // bq)

    # lane-block index g selects the 128-lane window [g*128, (g+1)*128) =
    # heads (2g, 2g+1); k/v live at lane offsets C and 2C = npairs blocks
    q_spec = pl.BlockSpec((1, bq, 2 * d), lambda bi, g, i: (bi, i, g))
    k_spec = pl.BlockSpec((1, n, 2 * d), lambda bi, g, i: (bi, 0, npairs + g))
    v_spec = pl.BlockSpec(
        (1, n, 2 * d), lambda bi, g, i: (bi, 0, 2 * npairs + g)
    )
    out_spec = pl.BlockSpec((1, bq, 2 * d), lambda bi, g, i: (bi, i, g))

    return pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, d=d),
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20,
        ),
    )(qkv, qkv, qkv)


def attention_from_qkv_ref(qkv: jnp.ndarray, num_heads: int, scale: float):
    """Einsum formulation (the XLA path) from fused qkv [B, N, 3C]."""
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    q, k, v = (
        qkv[..., :c].reshape(b, n, num_heads, d),
        qkv[..., c : 2 * c].reshape(b, n, num_heads, d),
        qkv[..., 2 * c :].reshape(b, n, num_heads, d),
    )
    s = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    mx = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    e = jnp.exp((s - mx).astype(jnp.float32)).astype(qkv.dtype)
    den = e.astype(jnp.float32).sum(axis=-1, keepdims=True)
    p = e / den.astype(qkv.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", p, v).reshape(b, n, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def flash_attention_qkv(qkv: jnp.ndarray, num_heads: int, scale: float):
    """out [B, N, C] from fused qkv [B, N, 3C] (q | k | v along lanes)."""
    return _flash_fwd_impl(qkv, num_heads, scale)


def _fwd(qkv, num_heads, scale):
    return _flash_fwd_impl(qkv, num_heads, scale), (qkv,)


def _bwd(num_heads, scale, res, g):
    (qkv,) = res
    _, vjp = jax.vjp(
        lambda x: attention_from_qkv_ref(x, num_heads, scale), qkv
    )
    return vjp(g.astype(qkv.dtype))


flash_attention_qkv.defvjp(_fwd, _bwd)
