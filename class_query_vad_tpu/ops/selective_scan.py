"""Mamba S6 selective scan — TPU-native.

Replaces the reference CUDA extensions ``selective_scan_cuda_{core,ndstate,
oflex}`` (host fns /root/reference/selective_scan/csrc/selective_scan/cus/
selective_scan.cpp:158-349; executable spec in
/root/reference/selective_scan/test_selective_scan_easy.py:14-97 and the
pytest tolerance matrix in test_selective_scan.py:373-502).

Recurrence (per batch b, channel d, state n, step l):

    h_l = exp(delta_l * A[d, n]) * h_{l-1} + delta_l * B[b, g, n, l] * u_l
    y_l = sum_n C[b, g, n, l] * h_l (+ D[d] * u_l)

TPU design: the time recurrence is a first-order linear recurrence
``h_l = a_l * h_{l-1} + b_l`` → ``jax.lax.associative_scan`` (log-depth, fully
parallel over B×D×N on the VPU) with float32 carries regardless of the input
dtype, which is what keeps bf16 @ seqlen-4096 inside the reference kernel's
tolerance envelope.  There is no hand-written backward: the scan is
differentiated by XLA (the reference needs reverse_scan.cuh, ~400 lines).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _scan_combine(left, right):
    a_l, b_l = left
    a_r, b_r = right
    return a_l * a_r, b_l * a_r + b_r


def selective_scan(
    u: jnp.ndarray,                 # [B, KD, L]
    delta: jnp.ndarray,             # [B, KD, L]
    A: jnp.ndarray,                 # [KD, N]
    B: jnp.ndarray,                 # [B, G, N, L] (or [B, N, L] -> G=1)
    C: jnp.ndarray,                 # [B, G, N, L] (or [B, N, L])
    D: Optional[jnp.ndarray] = None,       # [KD]
    delta_bias: Optional[jnp.ndarray] = None,  # [KD]
    delta_softplus: bool = False,
    return_last_state: bool = False,
):
    """Selective scan with the reference kernels' exact I/O contract.

    Returns y [B, KD, L] (dtype of u), optionally with last_state [B, KD, N]
    in float32 — matching the CUDA modules' (out, x[...,-1]) convention.
    """
    in_dtype = u.dtype
    if B.ndim == 3:
        B = B[:, None]
    if C.ndim == 3:
        C = C[:, None]

    bsz, kd, L = u.shape
    groups = B.shape[1]
    n_state = A.shape[1]
    dk = kd // groups

    u_f = u.astype(jnp.float32)
    delta_f = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta_f = delta_f + delta_bias.astype(jnp.float32)[None, :, None]
    if delta_softplus:
        delta_f = jax.nn.softplus(delta_f)

    # Broadcast everything to [B, L, G, DK, N]; scan along axis=1 (time).
    delta_t = jnp.moveaxis(delta_f, -1, 1).reshape(bsz, L, groups, dk)
    u_t = jnp.moveaxis(u_f, -1, 1).reshape(bsz, L, groups, dk)
    A_g = A.astype(jnp.float32).reshape(groups, dk, n_state)
    B_t = jnp.moveaxis(B.astype(jnp.float32), -1, 1)    # [B, L, G, N]
    C_t = jnp.moveaxis(C.astype(jnp.float32), -1, 1)    # [B, L, G, N]

    a = jnp.exp(delta_t[..., None] * A_g[None, None])                  # [B,L,G,DK,N]
    b = (delta_t * u_t)[..., None] * B_t[:, :, :, None, :]             # [B,L,G,DK,N]

    _, h = jax.lax.associative_scan(_scan_combine, (a, b), axis=1)     # [B,L,G,DK,N]

    y = jnp.einsum("blgdn,blgn->blgd", h, C_t)                          # [B,L,G,DK]
    y = jnp.moveaxis(y.reshape(bsz, L, kd), 1, -1)                      # [B,KD,L]
    if D is not None:
        y = y + D.astype(jnp.float32)[None, :, None] * u_f

    y = y.astype(in_dtype)
    if return_last_state:
        last = h[:, -1].reshape(bsz, kd, n_state)
        return y, last
    return y


def selective_scan_sequential(
    u, delta, A, B, C, D=None, delta_bias=None, delta_softplus=False,
    return_last_state=False,
):
    """lax.scan (sequential-in-time) variant.

    O(L) depth but minimal memory traffic; preferred for short L inside
    other scans, and doubles as an independent check of the associative form.
    """
    in_dtype = u.dtype
    if B.ndim == 3:
        B = B[:, None]
    if C.ndim == 3:
        C = C[:, None]
    bsz, kd, L = u.shape
    groups = B.shape[1]
    n_state = A.shape[1]
    dk = kd // groups

    delta_f = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta_f = delta_f + delta_bias.astype(jnp.float32)[None, :, None]
    if delta_softplus:
        delta_f = jax.nn.softplus(delta_f)

    u_t = jnp.moveaxis(u.astype(jnp.float32), -1, 0).reshape(L, bsz, groups, dk)
    d_t = jnp.moveaxis(delta_f, -1, 0).reshape(L, bsz, groups, dk)
    B_t = jnp.moveaxis(B.astype(jnp.float32), -1, 0)
    C_t = jnp.moveaxis(C.astype(jnp.float32), -1, 0)
    A_g = A.astype(jnp.float32).reshape(groups, dk, n_state)

    def step(h, inp):
        u_l, d_l, b_l, c_l = inp
        a = jnp.exp(d_l[..., None] * A_g[None])
        h = a * h + (d_l * u_l)[..., None] * b_l[:, :, None, :]
        y = jnp.einsum("bgdn,bgn->bgd", h, c_l)
        return h, y

    h0 = jnp.zeros((bsz, groups, dk, n_state), jnp.float32)
    h_last, ys = jax.lax.scan(step, h0, (u_t, d_t, B_t, C_t))
    y = jnp.moveaxis(ys.reshape(L, bsz, kd), 0, -1)
    if D is not None:
        y = y + D.astype(jnp.float32)[None, :, None] * u.astype(jnp.float32)
    y = y.astype(in_dtype)
    if return_last_state:
        return y, h_last.reshape(bsz, kd, n_state)
    return y
