"""Fused FFN kernel: interpret-mode parity with the XLA composite, grads,
and the encoder layer's Dense-compatible param tree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from class_query_vad_tpu.ops.fused_ffn import ffn_reference, fused_ffn


def _inputs(n=300, c=128, f=256, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, c)), dtype)
    w1 = jnp.asarray(rng.normal(size=(c, f)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(f,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(f, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("act", ["relu", "gelu_exact"])
def test_fused_ffn_matches_reference(dtype, act):
    x, w1, b1, w2, b2 = _inputs(dtype=dtype)
    # n=300 is not a multiple of the tile: exercises the pad+slice path
    got = fused_ffn(x, w1, b1, w2, b2, act, 128, True, False, True)
    want = ffn_reference(x, w1, b1, w2, b2, act)
    assert got.dtype == want.dtype
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol)


def test_fused_ffn_grads_match_composite():
    x, w1, b1, w2, b2 = _inputs(n=64, dtype=jnp.float32)

    def loss_fused(*a):
        return fused_ffn(*a, "relu", 64, True, False, True).sum()

    def loss_ref(*a):
        return ffn_reference(*a, activation="relu").sum()

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_encoder_layer_param_tree_is_dense_compatible():
    """linear1/linear2 must keep nn.Dense's names and shapes (checkpoint
    compatibility with trees saved before the fused-FFN rewrite)."""
    from class_query_vad_tpu.models.fast_encoder import FastEncoderLayer

    layer = FastEncoderLayer(d_model=64, d_ffn=128, n_levels=1, n_heads=8,
                             n_points=8, radius=1, window="2d")
    x = jnp.zeros((1, 16, 64))
    pos = jnp.zeros((1, 16, 64))
    params = layer.init(jax.random.PRNGKey(0), x, pos, ((1, 4, 4),), None)
    p = params["params"]
    assert set(p["linear1"].keys()) == {"kernel", "bias"}
    assert p["linear1"]["kernel"].shape == (64, 128)
    assert p["linear2"]["kernel"].shape == (128, 64)
    # values flow: CPU path must equal the old Dense chain (pure function
    # of the same params); smoke: finite output, dtype preserved
    out = layer.apply(params, x + 1.0, pos, ((1, 4, 4),), None)
    assert np.isfinite(np.asarray(out)).all()
