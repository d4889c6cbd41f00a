"""Golden tests for the 3D multi-scale deformable attention op.

Oracle: a direct per-sample-point numpy trilinear sampler implementing the
CUDA kernel contract (/root/reference/ops/src/cuda/ms_deform_im2col_cuda_t.cuh
:34-115,424-431).  The reference's own test used the 2D sampler; here the 3D
path is tested directly (SURVEY.md §4 note).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from class_query_vad_tpu.ops import ms_deform_attn_3d_xla, directional_offset_init


def oracle(value, shapes, locs, weights):
    """value [B,S,H,D]; locs [B,Q,H,L,P,3] (x,y,t); weights [B,Q,H,L,P]."""
    bsz, _, heads, depth = value.shape
    _, q, _, nl, p, _ = locs.shape
    starts = np.cumsum([0] + [t * h * w for t, h, w in shapes])
    out = np.zeros((bsz, q, heads, depth), np.float64)
    for b in range(bsz):
        for qi in range(q):
            for m in range(heads):
                for l, (t, h, w) in enumerate(shapes):
                    vol = value[b, starts[l] : starts[l + 1], m].reshape(t, h, w, depth)
                    for pi in range(p):
                        x, y, tt = locs[b, qi, m, l, pi]
                        wgt = weights[b, qi, m, l, pi]
                        ti = tt * t - 0.5
                        yi = y * h - 0.5
                        xi = x * w - 0.5
                        if not (-1 < ti < t and -1 < yi < h and -1 < xi < w):
                            continue
                        t0, y0, x0 = int(np.floor(ti)), int(np.floor(yi)), int(np.floor(xi))
                        lt, ly, lx = ti - t0, yi - y0, xi - x0
                        acc = np.zeros(depth)
                        for dt in (0, 1):
                            for dy in (0, 1):
                                for dx in (0, 1):
                                    tc, yc, xc = t0 + dt, y0 + dy, x0 + dx
                                    if 0 <= tc < t and 0 <= yc < h and 0 <= xc < w:
                                        cw = (
                                            (lt if dt else 1 - lt)
                                            * (ly if dy else 1 - ly)
                                            * (lx if dx else 1 - lx)
                                        )
                                        acc += cw * vol[tc, yc, xc]
                        out[b, qi, m] += wgt * acc
    return out.reshape(bsz, q, heads * depth)


@pytest.mark.parametrize("depth", [8, 16])
def test_forward_matches_oracle(rng, depth):
    shapes = [(4, 6, 8), (4, 3, 4), (2, 2, 2)]
    bsz, q, heads, p = 2, 5, 4, 3
    s = sum(t * h * w for t, h, w in shapes)
    value = rng.normal(size=(bsz, s, heads, depth)).astype(np.float32)
    # Locations mostly inside with some outside to exercise the guards.
    locs = rng.uniform(-0.2, 1.2, size=(bsz, q, heads, len(shapes), p, 3)).astype(
        np.float32
    )
    w = rng.uniform(size=(bsz, q, heads, len(shapes), p)).astype(np.float32)
    w = w / w.sum(axis=(-1, -2), keepdims=True)

    got = np.asarray(
        ms_deform_attn_3d_xla(
            jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(w)
        )
    )
    want = oracle(value, shapes, locs, w)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gradients_flow(rng):
    shapes = [(2, 4, 4), (2, 2, 2)]
    bsz, q, heads, p, depth = 1, 3, 2, 2, 4
    s = sum(t * h * w for t, h, w in shapes)
    value = jnp.asarray(rng.normal(size=(bsz, s, heads, depth)), jnp.float32)
    locs = jnp.asarray(
        rng.uniform(0.2, 0.8, size=(bsz, q, heads, len(shapes), p, 3)), jnp.float32
    )
    w = jnp.asarray(rng.uniform(size=(bsz, q, heads, len(shapes), p)), jnp.float32)

    def f(v, l, a):
        return (ms_deform_attn_3d_xla(v, shapes, l, a) ** 2).sum()

    gv, gl, ga = jax.grad(f, argnums=(0, 1, 2))(value, locs, w)
    assert np.isfinite(np.asarray(gv)).all()
    assert np.abs(np.asarray(gl)).sum() > 0  # sampling-location grads exist
    assert np.abs(np.asarray(ga)).sum() > 0


def test_numeric_gradcheck(rng):
    """Finite-difference check on sampling locations (the hard gradient —
    the reference needed six CUDA col2im kernel variants for this)."""
    shapes = [(2, 3, 3)]
    bsz, q, heads, p, depth = 1, 2, 1, 1, 2
    s = sum(t * h * w for t, h, w in shapes)
    value = jnp.asarray(rng.normal(size=(bsz, s, heads, depth)), jnp.float32)
    locs = jnp.asarray(
        rng.uniform(0.3, 0.7, size=(bsz, q, heads, 1, p, 3)), jnp.float32
    )
    w = jnp.asarray(rng.uniform(0.5, 1.0, size=(bsz, q, heads, 1, p)), jnp.float32)

    def f(l):
        return ms_deform_attn_3d_xla(value, shapes, l, w).sum()

    f = jax.jit(f)
    g = np.asarray(jax.grad(f)(locs)).ravel()
    eps = 1e-3
    flat = np.asarray(locs).ravel()
    for i in range(0, flat.size, 2):
        lp, lm = flat.copy(), flat.copy()
        lp[i] += eps
        lm[i] -= eps
        fp = float(f(jnp.asarray(lp.reshape(locs.shape))))
        fm = float(f(jnp.asarray(lm.reshape(locs.shape))))
        fd = (fp - fm) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=2e-2, atol=2e-3)


def test_directional_offset_init():
    bias = directional_offset_init(8, 4, 4)
    assert bias.shape == (8 * 4 * 4 * 3,)
    grid = np.asarray(bias).reshape(8, 4, 4, 3)
    # first half of heads carry temporal extent, scaled by point index
    assert np.all(grid[:4, :, 0, 2] != 0)
    assert np.all(grid[4:, :, :, 2] == 0)
    np.testing.assert_allclose(grid[:, :, 3, :], grid[:, :, 0, :] * 4, rtol=1e-5)


def test_blocked_matches_xla(rng):
    """The blocked-gather fast path must match the reference XLA gather
    formulation exactly (same zero-pad edge semantics)."""
    from class_query_vad_tpu.ops.deform_attn import (
        ms_deform_attn_3d_blocked,
        ms_deform_attn_3d_xla,
    )

    shapes = ((3, 6, 7), (2, 3, 4))
    S = sum(t * h * w for t, h, w in shapes)
    B, Q, H, D, P = 2, 50, 4, 8, 5
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.5, 1.5, size=(B, Q, H, 2, P, 3)), jnp.float32)
    w = jnp.asarray(rng.uniform(size=(B, Q, H, 2, P)), jnp.float32)
    a = ms_deform_attn_3d_xla(v, shapes, loc, w)
    b = ms_deform_attn_3d_blocked(v, shapes, loc, w, query_chunk=16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_packed_matches_xla(rng):
    """The corner-packed row-gather path (one wide row per sample — the
    TPU-fast exact formulation, PERF.md round 2) must match the reference
    XLA gather formulation exactly."""
    from class_query_vad_tpu.ops.deform_attn import (
        ms_deform_attn_3d_packed,
        ms_deform_attn_3d_xla,
    )

    shapes = ((3, 6, 7), (2, 3, 4))
    S = sum(t * h * w for t, h, w in shapes)
    B, Q, H, D, P = 2, 50, 4, 8, 5
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.5, 1.5, size=(B, Q, H, 2, P, 3)), jnp.float32)
    w = jnp.asarray(rng.uniform(size=(B, Q, H, 2, P)), jnp.float32)
    a = ms_deform_attn_3d_xla(v, shapes, loc, w)
    b = ms_deform_attn_3d_packed(v, shapes, loc, w, query_chunk=16)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_packed_gradients_match_xla(rng):
    from class_query_vad_tpu.ops.deform_attn import (
        ms_deform_attn_3d_packed,
        ms_deform_attn_3d_xla,
    )

    shapes = ((2, 4, 5), (2, 2, 3))
    S = sum(t * h * w for t, h, w in shapes)
    B, Q, H, D, P = 1, 12, 2, 4, 3
    v = jnp.asarray(rng.normal(size=(B, S, H, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0.1, 0.9, size=(B, Q, H, 2, P, 3)), jnp.float32)
    w = jnp.asarray(rng.uniform(size=(B, Q, H, 2, P)), jnp.float32)

    def loss(fn, v, loc, w):
        return (fn(v, shapes, loc, w) ** 2).sum()

    g_ref = jax.grad(lambda *a: loss(ms_deform_attn_3d_xla, *a), (0, 1, 2))(
        v, loc, w
    )
    g_new = jax.grad(lambda *a: loss(ms_deform_attn_3d_packed, *a), (0, 1, 2))(
        v, loc, w
    )
    for r, n in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(r), np.asarray(n), atol=3e-4,
                                   rtol=1e-3)


@pytest.mark.parametrize("depth", [30, 32, 71, 128])
def test_channel_sweep(rng, depth):
    """Channel sweep mirroring the reference acceptance matrix
    (/root/reference/ops/test.py:84-86: channels [30, 32, 64, 71, 1025,
    2048, 3096]) — odd / non-lane-aligned depths must agree across the
    blocked and corner-packed implementations and the golden XLA path."""
    from class_query_vad_tpu.ops.deform_attn import (
        ms_deform_attn_3d_blocked,
        ms_deform_attn_3d_packed,
        ms_deform_attn_3d_xla,
    )

    shapes = ((2, 5, 6), (2, 3, 3))
    S = sum(t * h * w for t, h, w in shapes)
    B, Q, H, P = 1, 20, 2, 4
    v = jnp.asarray(rng.normal(size=(B, S, H, depth)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.3, 1.3, size=(B, Q, H, 2, P, 3)), jnp.float32)
    w = jnp.asarray(rng.uniform(size=(B, Q, H, 2, P)), jnp.float32)
    a = ms_deform_attn_3d_xla(v, shapes, loc, w)
    b = ms_deform_attn_3d_blocked(v, shapes, loc, w, query_chunk=8)
    c = ms_deform_attn_3d_packed(v, shapes, loc, w, query_chunk=8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-5)


@pytest.mark.parametrize("depth", [30, 71])
def test_channel_sweep_gradients(rng, depth):
    """Numerical gradient check at non-aligned channel counts (counterpart
    of check_gradient_numerical, ops/test.py:63-79)."""
    from class_query_vad_tpu.ops.deform_attn import ms_deform_attn_3d_packed

    shapes = ((2, 3, 4),)
    S = sum(t * h * w for t, h, w in shapes)
    B, Q, H, P = 1, 6, 2, 3
    v = rng.uniform(size=(B, S, H, depth)).astype(np.float32)
    loc = rng.uniform(0.15, 0.85, size=(B, Q, H, 1, P, 3)).astype(np.float32)
    w = (rng.uniform(size=(B, Q, H, 1, P)) + 1e-5).astype(np.float32)

    def loss(v_, loc_, w_):
        return (
            ms_deform_attn_3d_packed(v_, shapes, loc_, w_, query_chunk=8) ** 2
        ).sum()

    if True:
        g = jax.grad(loss, (0, 1, 2))(*map(jnp.asarray, (v, loc, w)))
        eps = 1e-2
        for pos, (arr, grad, idx) in enumerate((
            (v, g[0], (0, 3, 1, depth - 1)),
            (loc, g[1], (0, 2, 0, 0, 1, 2)),
            (w, g[2], (0, 4, 1, 0, 2)),
        )):
            ap, am = arr.copy(), arr.copy()
            ap[idx] += eps
            am[idx] -= eps
            args_p = [jnp.asarray(x) for x in (v, loc, w)]
            args_m = [jnp.asarray(x) for x in (v, loc, w)]
            args_p[pos] = jnp.asarray(ap)
            args_m[pos] = jnp.asarray(am)
            fd = (float(loss(*args_p)) - float(loss(*args_m))) / (2 * eps)
            np.testing.assert_allclose(float(np.asarray(grad)[idx]), fd,
                                       rtol=1e-1, atol=1e-4)
