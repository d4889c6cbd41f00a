"""Block-level VideoMamba oracle (round-2 verdict item 5).

An independent NUMPY implementation of the published Mamba recurrence
(Gu & Dao 2023, eqs. 2-4: zero-order-hold discretization
h_t = exp(dt*A) h_{t-1} + dt*B_t*x_t, y_t = C_t h_t + D x_t) plus the
Vim/VideoMamba v2 bidirectional block structure (shared in/out
projections, per-direction conv1d/x_proj/dt_proj/A/D, per-direction
z-gating, backward branch on the flipped sequence) — written step-by-step
with Python loops, no jax, no shared code with the implementation under
test.  Parity-tests models/videomamba.py's BiMamba/VideoMambaBlock
against it, closing the "function computed is untested" gap (the external
VideoMamba package the reference imports is not available here;
/root/reference/models/backbones/mamba.py:15-20).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from class_query_vad_tpu.models.videomamba import BiMamba, VideoMambaBlock


def _silu(x):
    return x / (1.0 + np.exp(-x))


def _softplus(x):
    return np.logaddexp(0.0, x)


def _branch_oracle(x, conv_k, conv_b, xproj_k, dt_k, dt_b, A_log, D,
                   dt_rank, n):
    """One direction: conv1d -> silu -> x_proj -> dt_proj -> per-step scan.

    x: [B, L, Di].  conv_k: [K, 1, Di] (flax depthwise layout).
    Returns y [B, L, Di].
    """
    bsz, L, di = x.shape
    K = conv_k.shape[0]

    # causal depthwise cross-correlation, left-padded K-1 zeros
    xp = np.concatenate([np.zeros((bsz, K - 1, di)), x], axis=1)
    h = np.zeros_like(x)
    for t in range(L):
        for k in range(K):
            h[:, t] += conv_k[k, 0] * xp[:, t + k]
    h = _silu(h + conv_b)

    dbl = h @ xproj_k                                   # [B, L, R+2N]
    dt_low = dbl[..., :dt_rank]
    Bm = dbl[..., dt_rank:dt_rank + n]                  # [B, L, N]
    Cm = dbl[..., dt_rank + n:]
    dt = _softplus(dt_low @ dt_k + dt_b)                # [B, L, Di]

    A = -np.exp(A_log)                                  # [Di, N]
    state = np.zeros((bsz, di, n))
    y = np.zeros((bsz, L, di))
    for t in range(L):
        da = np.exp(dt[:, t][..., None] * A)            # [B, Di, N]
        state = da * state + (
            dt[:, t][..., None] * Bm[:, t][:, None, :] * h[:, t][..., None]
        )
        y[:, t] = np.einsum("bdn,bn->bd", state, Cm[:, t]) + D * h[:, t]
    return y


def bimamba_oracle(u, p, dt_rank, n):
    """u [B, L, D]; p = flax param dict of one BiMamba module."""
    xz = u @ p["in_proj"]["kernel"]
    di = xz.shape[-1] // 2
    x, z = xz[..., :di], xz[..., di:]

    y_f = _branch_oracle(
        x, p["conv1d"]["kernel"], p["conv1d"]["bias"],
        p["x_proj"]["kernel"], p["dt_proj_kernel"], p["dt_proj_bias"],
        p["A_log"], p["D"], dt_rank, n,
    ) * _silu(z)
    xb, zb = x[:, ::-1], z[:, ::-1]
    y_b = _branch_oracle(
        xb, p["conv1d_b"]["kernel"], p["conv1d_b"]["bias"],
        p["x_proj_b"]["kernel"], p["dt_proj_b_kernel"], p["dt_proj_b_bias"],
        p["A_b_log"], p["D_b"], dt_rank, n,
    ) * _silu(zb)
    y = y_f + y_b[:, ::-1]
    return y @ p["out_proj"]["kernel"]


def _np_tree(p):
    return jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), p)


@pytest.mark.parametrize("seed", [0, 3])
def test_bimamba_matches_published_recurrence(seed):
    d_model, n, L, bsz = 32, 4, 14, 2
    dt_rank = math.ceil(d_model / 16)
    rng = np.random.default_rng(seed)
    u = rng.normal(size=(bsz, L, d_model)).astype(np.float32)

    m = BiMamba(d_model, d_state=n)
    params = m.init(jax.random.PRNGKey(seed), jnp.asarray(u))
    # random-perturb every param: the zero/structured inits would mask
    # layout mistakes (e.g. a transposed projection)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves = [
        jnp.asarray(l) + 0.3 * jnp.asarray(
            rng.normal(size=l.shape), jnp.float32)
        for l in leaves
    ]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    got = np.asarray(m.apply(params, jnp.asarray(u)), np.float64)
    want = bimamba_oracle(
        u.astype(np.float64), _np_tree(params["params"]), dt_rank, n)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_videomamba_block_is_prenorm_residual():
    d_model, n, L = 32, 4, 10
    rng = np.random.default_rng(1)
    u = rng.normal(size=(1, L, d_model)).astype(np.float32)
    blk = VideoMambaBlock(d_model, d_state=n)
    params = blk.init(jax.random.PRNGKey(0), jnp.asarray(u))
    got = np.asarray(blk.apply(params, jnp.asarray(u)), np.float64)

    p = _np_tree(params["params"])
    ln = p["norm"]
    mu = u.mean(-1, keepdims=True)
    var = u.var(-1, keepdims=True)
    y = (u - mu) / np.sqrt(var + 1e-5) * ln["scale"] + ln["bias"]
    want = u + bimamba_oracle(
        y.astype(np.float64), p["mixer"], math.ceil(d_model / 16), n)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
