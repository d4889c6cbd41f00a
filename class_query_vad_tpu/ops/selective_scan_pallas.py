"""Pallas TPU kernel for the Mamba S6 selective scan.

TPU-native replacement for the reference CUDA kernels' hot path
(/root/reference/selective_scan/csrc/selective_scan/cus/selective_scan.cpp:
158-241; chunked executable spec in test_selective_scan_easy.py:14-97).

Design:
* time-major layout [L, KD] so each recurrence step reads one contiguous
  row; state h is [N, KD] float32 — N (=4..16) on sublanes, channels on
  lanes — so every per-step VPU op runs at full lane width;
* grid = (B, L/CHUNK): TPU grids execute sequentially, so the state lives
  in a VMEM scratch carried across chunk steps while Pallas double-buffers
  the next chunk's HBM->VMEM fetches behind the current chunk's compute;
* the input projection (delta_bias + softplus) and the D*u skip term are
  fused into the kernel;
* gradients: jax.custom_vjp whose backward differentiates the associative
  reference implementation (ops.selective_scan) — same math, so the VJP is
  exact; the kernel accelerates the forward/inference path.

I/O contract matches ops.selective_scan.selective_scan (without
return_last_state).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .selective_scan import selective_scan as _reference_scan


def _scan_kernel(u_ref, delta_ref, bc_ref, a_t_ref, d_ref, bias_ref, y_ref,
                 h_ref, *, chunk: int, groups: int, n_state: int,
                 delta_softplus: bool):
    """One (batch, chunk) grid step.

    u_ref, delta_ref, y_ref: [1, CHUNK, KD]; bc_ref: [1, CHUNK, 2*G*N];
    a_t_ref: [N, KD] (= A^T); d_ref, bias_ref: [1, KD]; h_ref (scratch):
    [N, KD] float32.
    """
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)

    a_t = a_t_ref[:]                                   # [N, KD]
    d = d_ref[0]
    bias = bias_ref[0]
    kd = a_t.shape[1]
    dk = kd // groups

    def _expand_bc(row, base):
        """Build [N, KD] from G*N scalars (Mosaic has no lane reshape:
        static scalar extracts + broadcasts instead)."""
        rows = []
        for n in range(n_state):
            blocks = [
                jnp.full((1, dk), row[base + g * n_state + n])
                for g in range(groups)
            ]
            rows.append(jnp.concatenate(blocks, axis=1))
        return jnp.concatenate(rows, axis=0)           # [N, KD]

    def step(i, _):
        u_i = u_ref[0, i, :]                           # [KD]
        delta_i = delta_ref[0, i, :] + bias
        if delta_softplus:
            delta_i = jax.nn.softplus(delta_i)
        bc_row = bc_ref[0, i, :]                       # [2*G*N]
        b_i = _expand_bc(bc_row, 0)
        c_i = _expand_bc(bc_row, groups * n_state)
        a_i = jnp.exp(delta_i[None, :] * a_t)          # [N, KD]
        h = a_i * h_ref[:] + (delta_i * u_i)[None, :] * b_i
        h_ref[:] = h
        y_ref[0, i, :] = (c_i * h).sum(axis=0) + d * u_i
        return 0

    jax.lax.fori_loop(0, chunk, step, 0, unroll=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _scan_pallas(u_t, delta_t, bc_t, a_t, d, bias, shape_info,
                 delta_softplus=True):
    chunk, groups, n_state = shape_info
    return _pallas_forward(u_t, delta_t, bc_t, a_t, d, bias, chunk, groups,
                           n_state, delta_softplus)


def _pallas_forward(u_t, delta_t, bc_t, a_t, d, bias, chunk, groups, n_state,
                    delta_softplus):
    bsz, L, kd = u_t.shape
    n_chunks = L // chunk
    grid = (bsz, n_chunks)
    kernel = functools.partial(
        _scan_kernel, chunk=chunk, groups=groups, n_state=n_state,
        delta_softplus=delta_softplus,
    )
    interpret = jax.devices()[0].platform == "cpu"
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, kd), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, kd), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, bc_t.shape[-1]), lambda b, c: (b, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_state, kd), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kd), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kd), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, kd), lambda b, c: (b, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, L, kd), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_state, kd), jnp.float32)],
        interpret=interpret,
    )(u_t, delta_t, bc_t, a_t, d, bias)


def selective_scan_pallas(
    u: jnp.ndarray,                 # [B, KD, L]
    delta: jnp.ndarray,             # [B, KD, L]
    A: jnp.ndarray,                 # [KD, N]
    B: jnp.ndarray,                 # [B, G, N, L] or [B, N, L]
    C: jnp.ndarray,
    D: Optional[jnp.ndarray] = None,
    delta_bias: Optional[jnp.ndarray] = None,
    delta_softplus: bool = False,
    chunk: Optional[int] = None,
):
    """Pallas-accelerated selective scan (forward); backward falls back to
    the associative formulation via custom_vjp."""
    in_dtype = u.dtype
    if B.ndim == 3:
        B = B[:, None]
    if C.ndim == 3:
        C = C[:, None]
    bsz, kd, L = u.shape
    groups, n_state = B.shape[1], B.shape[2]

    if chunk is None:
        chunk = next((c for c in (256, 128, 64, 32) if L % c == 0), 0)
    if chunk == 0 or L % chunk != 0 or kd % 128 != 0:
        # shapes the kernel doesn't tile cleanly -> associative fallback
        return _reference_scan(u, delta, A, B, C, D, delta_bias,
                               delta_softplus)

    u_t = jnp.swapaxes(u, 1, 2).astype(jnp.float32)          # [B, L, KD]
    delta_t = jnp.swapaxes(delta, 1, 2).astype(jnp.float32)
    bc = jnp.concatenate([B, C], axis=1)                      # [B, 2G, N, L]
    bc_t = bc.reshape(bsz, 2 * groups * n_state, L)
    bc_t = jnp.swapaxes(bc_t, 1, 2).astype(jnp.float32)       # [B, L, 2GN]
    a_t = A.astype(jnp.float32).T                             # [N, KD]
    d = (D if D is not None else jnp.zeros((kd,)))
    d = d.astype(jnp.float32)[None]
    bias = (delta_bias if delta_bias is not None else jnp.zeros((kd,)))
    bias = bias.astype(jnp.float32)[None]

    y_t = _scan_pallas(
        u_t, delta_t, bc_t, a_t, d, bias,
        (chunk, groups, n_state), delta_softplus,
    )
    return jnp.swapaxes(y_t, 1, 2).astype(in_dtype)


def _scan_pallas_fwd(u_t, delta_t, bc_t, a_t, d, bias, shape_info,
                     delta_softplus):
    chunk, groups, n_state = shape_info
    y = _pallas_forward(u_t, delta_t, bc_t, a_t, d, bias, chunk, groups,
                        n_state, delta_softplus)
    return y, (u_t, delta_t, bc_t, a_t, d, bias)


def _ref_from_tmajor(u_t, delta_t, bc_t, a_t, d, bias, shape_info,
                     delta_softplus):
    chunk, groups, n_state = shape_info
    bsz, L, kd = u_t.shape
    u = jnp.swapaxes(u_t, 1, 2)
    delta = jnp.swapaxes(delta_t, 1, 2)
    bc = jnp.swapaxes(bc_t, 1, 2).reshape(bsz, 2 * groups, n_state, L)
    return jnp.swapaxes(
        _reference_scan(
            u, delta, a_t.T, bc[:, :groups], bc[:, groups:], d[0],
            delta_bias=bias[0], delta_softplus=delta_softplus,
        ),
        1, 2,
    )


def _scan_pallas_bwd(shape_info, delta_softplus, residuals, g):
    u_t, delta_t, bc_t, a_t, d, bias = residuals
    _, vjp = jax.vjp(
        lambda *args: _ref_from_tmajor(*args, shape_info, delta_softplus),
        u_t, delta_t, bc_t, a_t, d, bias,
    )
    return vjp(g.astype(jnp.float32))


_scan_pallas.defvjp(_scan_pallas_fwd, _scan_pallas_bwd)
