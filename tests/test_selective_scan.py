"""Golden tests for the selective scan op.

Oracle: direct numpy recurrence implementing the reference kernels' contract
(/root/reference/selective_scan/test_selective_scan_easy.py:14-97 chunked
spec; pytest matrix at test_selective_scan.py:373-502).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from class_query_vad_tpu.ops import selective_scan, selective_scan_sequential


def oracle(u, delta, A, B, C, D=None, delta_bias=None, delta_softplus=False):
    b, kd, L = u.shape
    g = B.shape[1]
    n = A.shape[1]
    dk = kd // g
    d = delta.astype(np.float64)
    if delta_bias is not None:
        d = d + delta_bias[None, :, None]
    if delta_softplus:
        d = np.log1p(np.exp(-np.abs(d))) + np.maximum(d, 0)
    u64 = u.astype(np.float64)
    ys = np.zeros((b, kd, L))
    h = np.zeros((b, kd, n))
    A64 = A.astype(np.float64)
    for l in range(L):
        for gi in range(g):
            sl = slice(gi * dk, (gi + 1) * dk)
            a = np.exp(d[:, sl, l][:, :, None] * A64[None, sl])
            h[:, sl] = a * h[:, sl] + (d[:, sl, l] * u64[:, sl, l])[:, :, None] * B[
                :, gi, :, l
            ][:, None, :]
            ys[:, sl, l] = (h[:, sl] * C[:, gi, :, l][:, None, :]).sum(-1)
    if D is not None:
        ys = ys + D[None, :, None] * u64
    return ys, h


@pytest.mark.parametrize("L", [16, 64, 257])
@pytest.mark.parametrize("with_d,with_bias,softplus", [(True, True, True), (False, False, False)])
def test_matches_oracle(rng, L, with_d, with_bias, softplus):
    b, g, dk, n = 2, 2, 4, 8
    kd = g * dk
    u = rng.normal(size=(b, kd, L)).astype(np.float32)
    # positive delta (as produced by softplus in practice; the reference test
    # matrix also draws delta from 0.5*rand) keeps the recurrence contractive
    delta = (0.5 * rng.uniform(size=(b, kd, L))).astype(np.float32)
    A = (-0.5 - rng.uniform(size=(kd, n))).astype(np.float32)
    B = rng.normal(size=(b, g, n, L)).astype(np.float32)
    C = rng.normal(size=(b, g, n, L)).astype(np.float32)
    D = rng.normal(size=(kd,)).astype(np.float32) if with_d else None
    bias = (0.1 * rng.normal(size=(kd,))).astype(np.float32) if with_bias else None

    y, last = selective_scan(
        *map(jnp.asarray, (u, delta, A, B, C)),
        D=None if D is None else jnp.asarray(D),
        delta_bias=None if bias is None else jnp.asarray(bias),
        delta_softplus=softplus,
        return_last_state=True,
    )
    y_ref, h_ref = oracle(u, delta, A, B, C, D, bias, softplus)
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(last), h_ref, rtol=2e-3, atol=2e-3)


# Reference acceptance grid (test_selective_scan.py:373-502): itype
# {fp32, fp16, bf16} x seqlen {64..4096} x {delta_bias, softplus, D} x
# varBC_groups {1, 2}, with per-dtype tolerance envelopes.  The full 336-cell
# product is pruned to an L x dtype sweep crossed with flag combos that cover
# every flag in both states (pairwise-style), keeping 1-core CPU time sane.
_REF_TOL = {  # reference :398-400
    np.float32: dict(rtol=6e-4, atol=2e-3),
    np.float16: dict(rtol=3e-3, atol=5e-3),
    "bfloat16": dict(rtol=3e-2, atol=5e-2),
}
_FLAG_COMBOS = [  # (with_d, with_bias, softplus, groups)
    (True, True, True, 2),
    (False, False, False, 1),
    (True, False, True, 1),
    (False, True, False, 2),
]


@pytest.mark.parametrize("L", [64, 256, 1024, 4096])
@pytest.mark.parametrize("itype", ["float32", "float16", "bfloat16"])
@pytest.mark.parametrize("with_d,with_bias,softplus,g", _FLAG_COMBOS)
def test_reference_grid(rng, L, itype, with_d, with_bias, softplus, g):
    if L == 4096 and (with_d, with_bias, softplus, g) != _FLAG_COMBOS[0]:
        pytest.skip("4096-length oracle is slow; one flag combo covers it")
    jt = jnp.dtype(itype)
    b, dk, n = 2, 4, 8
    kd = g * dk
    # quantize inputs to itype FIRST, then run the float64 oracle on the
    # quantized values — the tolerance then measures kernel error alone
    # (the reference's comparison is likewise against a ref impl fed the
    # same-itype inputs, :432-470)
    u = np.asarray(jnp.asarray(rng.normal(size=(b, kd, L)), jt), np.float64)
    delta = np.asarray(
        jnp.asarray(0.5 * rng.uniform(size=(b, kd, L)), jt), np.float64
    )
    A = (-0.5 - rng.uniform(size=(kd, n))).astype(np.float32)
    B = np.asarray(jnp.asarray(rng.normal(size=(b, g, n, L)), jt), np.float64)
    C = np.asarray(jnp.asarray(rng.normal(size=(b, g, n, L)), jt), np.float64)
    D = rng.normal(size=(kd,)).astype(np.float32) if with_d else None
    bias = (0.1 * rng.normal(size=(kd,))).astype(np.float32) if with_bias else None

    y = selective_scan(
        jnp.asarray(u, jt), jnp.asarray(delta, jt), jnp.asarray(A),
        jnp.asarray(B, jt), jnp.asarray(C, jt),
        D=None if D is None else jnp.asarray(D),
        delta_bias=None if bias is None else jnp.asarray(bias),
        delta_softplus=softplus,
    )
    y_ref, _ = oracle(
        u.astype(np.float32), delta.astype(np.float32), A,
        B.astype(np.float32), C.astype(np.float32), D, bias, softplus,
    )
    tol = _REF_TOL["bfloat16" if itype == "bfloat16" else np.dtype(itype).type]
    np.testing.assert_allclose(
        np.asarray(y, np.float64), y_ref, **tol,
        err_msg=f"L={L} itype={itype} flags={(with_d, with_bias, softplus, g)}",
    )


@pytest.mark.parametrize("itype", ["float32", "bfloat16"])
@pytest.mark.parametrize("L", [64, 512])
def test_gradients_dtype_grid(rng, itype, L):
    """Associative vs sequential implementations must agree on gradients
    across dtype x L (two independent impls; counterpart of the reference's
    CUDA-vs-ref grad comparison :471-502)."""
    jt = jnp.dtype(itype)
    b, g, dk, n = 1, 2, 4, 4
    kd = g * dk
    u = jnp.asarray(rng.normal(size=(b, kd, L)), jt)
    delta = jnp.asarray(0.4 * rng.uniform(size=(b, kd, L)), jt)
    A = -1.0 - jnp.asarray(rng.uniform(size=(kd, n)), jnp.float32)
    B = jnp.asarray(rng.normal(size=(b, g, n, L)), jt)
    C = jnp.asarray(rng.normal(size=(b, g, n, L)), jt)
    D = jnp.asarray(rng.normal(size=(kd,)), jnp.float32)
    bias = jnp.asarray(0.1 * rng.normal(size=(kd,)), jnp.float32)

    def loss(fn, u_, d_):
        return (fn(u_, d_, A, B, C, D, bias, True).astype(jnp.float32) ** 2).sum()

    ga = jax.grad(lambda u_, d_: loss(selective_scan, u_, d_), (0, 1))(u, delta)
    gs = jax.grad(
        lambda u_, d_: loss(selective_scan_sequential, u_, d_), (0, 1)
    )(u, delta)
    tol = dict(rtol=1e-3, atol=1e-3) if itype == "float32" else dict(
        rtol=3e-2, atol=5e-2
    )
    for a, s in zip(ga, gs):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(s, np.float64), **tol
        )


def test_assoc_vs_sequential(rng):
    b, g, dk, n, L = 1, 1, 8, 4, 128
    kd = g * dk
    u = rng.normal(size=(b, kd, L)).astype(np.float32)
    delta = (0.3 * rng.normal(size=(b, kd, L))).astype(np.float32)
    A = (-1.0 - rng.uniform(size=(kd, n))).astype(np.float32)
    B = rng.normal(size=(b, g, n, L)).astype(np.float32)
    C = rng.normal(size=(b, g, n, L)).astype(np.float32)

    y1 = selective_scan(*map(jnp.asarray, (u, delta, A, B, C)), delta_softplus=True)
    y2 = selective_scan_sequential(
        *map(jnp.asarray, (u, delta, A, B, C)), delta_softplus=True
    )
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-4)


def test_bf16_long_sequence(rng):
    """bf16 inputs with fp32 carries must stay within the reference kernel's
    tolerance envelope at seqlen 4096 (SURVEY.md §7.3 hard part #2)."""
    b, g, dk, n, L = 1, 1, 4, 4, 2048
    kd = g * dk
    u = rng.normal(size=(b, kd, L)).astype(np.float32)
    delta = (0.2 * rng.normal(size=(b, kd, L))).astype(np.float32)
    A = (-1.0 - rng.uniform(size=(kd, n))).astype(np.float32)
    B = rng.normal(size=(b, g, n, L)).astype(np.float32)
    C = rng.normal(size=(b, g, n, L)).astype(np.float32)

    y_ref, _ = oracle(u, delta, A, B, C, None, None, True)
    y_bf16 = selective_scan(
        jnp.asarray(u, jnp.bfloat16),
        jnp.asarray(delta, jnp.bfloat16),
        jnp.asarray(A),
        jnp.asarray(B, jnp.bfloat16),
        jnp.asarray(C, jnp.bfloat16),
        delta_softplus=True,
    )
    err = np.abs(np.asarray(y_bf16, np.float64) - y_ref)
    scale = np.abs(y_ref).mean()
    assert err.mean() / scale < 0.08  # bf16 input-quantization noise floor


def test_gradients(rng):
    b, g, dk, n, L = 1, 1, 2, 2, 32
    kd = g * dk
    args = (
        rng.normal(size=(b, kd, L)).astype(np.float32),
        (0.3 * rng.normal(size=(b, kd, L))).astype(np.float32),
        (-1.0 - rng.uniform(size=(kd, n))).astype(np.float32),
        rng.normal(size=(b, g, n, L)).astype(np.float32),
        rng.normal(size=(b, g, n, L)).astype(np.float32),
    )

    def loss(u, delta, A, B, C):
        return (selective_scan(u, delta, A, B, C, delta_softplus=True) ** 2).sum()

    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*map(jnp.asarray, args))
    for gr in grads:
        assert np.isfinite(np.asarray(gr)).all()
        assert np.abs(np.asarray(gr)).sum() > 0

    # finite-difference check on A (couples into the scan nonlinearly)
    eps = 1e-3
    A = args[2]
    gA = np.asarray(grads[2])
    Ap, Am = A.copy(), A.copy()
    Ap[0, 0] += eps
    Am[0, 0] -= eps
    fp = float(loss(*map(jnp.asarray, (args[0], args[1], Ap, args[3], args[4]))))
    fm = float(loss(*map(jnp.asarray, (args[0], args[1], Am, args[3], args[4]))))
    np.testing.assert_allclose(gA[0, 0], (fp - fm) / (2 * eps), rtol=2e-2)


def test_pallas_scan_matches_reference(rng):
    """Pallas kernel (interpret mode on CPU) vs the associative reference,
    forward and gradients, at kernel-tiling shapes."""
    import jax

    from class_query_vad_tpu.ops.selective_scan import selective_scan
    from class_query_vad_tpu.ops.selective_scan_pallas import (
        selective_scan_pallas,
    )

    B, G, DK, N, L = 2, 4, 32, 4, 64
    KD = G * DK
    u = jnp.asarray(rng.normal(size=(B, KD, L)), jnp.float32)
    delta = jnp.asarray(rng.uniform(0, 0.5, size=(B, KD, L)), jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(KD, N)) * 0.5, jnp.float32))
    Bm = jnp.asarray(rng.normal(size=(B, G, N, L)), jnp.float32)
    Cm = jnp.asarray(rng.normal(size=(B, G, N, L)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(KD,)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(KD,)) * 0.1, jnp.float32)

    ref = selective_scan(u, delta, A, Bm, Cm, D, bias, True)
    pal = selective_scan_pallas(u, delta, A, Bm, Cm, D, bias, True, chunk=32)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(pal), atol=1e-5)

    g_ref = jax.grad(
        lambda u_: (selective_scan(u_, delta, A, Bm, Cm, D, bias, True) ** 2).sum()
    )(u)
    g_pal = jax.grad(
        lambda u_: (
            selective_scan_pallas(u_, delta, A, Bm, Cm, D, bias, True, chunk=32) ** 2
        ).sum()
    )(u)
    np.testing.assert_allclose(np.asarray(g_ref), np.asarray(g_pal),
                               rtol=1e-4, atol=1e-4)


def test_pallas_scan_fallback_odd_shapes(rng):
    """Non-tiling shapes route to the associative implementation."""
    from class_query_vad_tpu.ops.selective_scan import selective_scan
    from class_query_vad_tpu.ops.selective_scan_pallas import (
        selective_scan_pallas,
    )

    B, KD, N, L = 1, 48, 4, 37
    u = jnp.asarray(rng.normal(size=(B, KD, L)), jnp.float32)
    delta = jnp.asarray(rng.uniform(0, 0.5, size=(B, KD, L)), jnp.float32)
    A = -jnp.exp(jnp.asarray(rng.normal(size=(KD, N)) * 0.5, jnp.float32))
    Bm = jnp.asarray(rng.normal(size=(B, N, L)), jnp.float32)
    Cm = jnp.asarray(rng.normal(size=(B, N, L)), jnp.float32)
    ref = selective_scan(u, delta, A, Bm, Cm)
    pal = selective_scan_pallas(u, delta, A, Bm, Cm)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(pal), atol=1e-5)
