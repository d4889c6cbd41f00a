"""windowed_blend_fused_head: the in-kernel tanh+softmax+blend must match
the XLA composite (the fast encoder's original module math) in forward
and route gradients through the composite."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from class_query_vad_tpu.ops.fast_deform_pallas import (
    _fused2d_composite,
    windowed_blend_fused_head,
)


@pytest.mark.parametrize("hw,dtype", [
    ((8, 16, 20), jnp.bfloat16),
    ((4, 8, 10), jnp.float32),
    ((4, 5, 7), jnp.bfloat16),      # non-multiple-of-8 grid (pad path)
])
def test_fused_matches_composite(hw, dtype):
    t, h, w = hw
    b, nl, c, nh, p = 1, 4, 256, 8, 8
    kp = nh * p
    rng = np.random.default_rng(0)
    aligned = [jnp.asarray(rng.normal(size=(b, t, h, w, c)), dtype)
               for _ in range(nl)]
    fused = jnp.asarray(rng.normal(size=(b, t, h, w, 3 * nl * kp)), dtype)

    out_k = windowed_blend_fused_head(
        aligned, fused, nh=nh, radius=1.0, use_pallas=True, interpret=True)
    vol = jnp.stack(aligned, axis=1)
    out_c = _fused2d_composite(vol, fused, nh, 1.0, False, True)

    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_c),
        atol=(2e-2 if dtype == jnp.bfloat16 else 2e-5),
        rtol=(2e-2 if dtype == jnp.bfloat16 else 1e-4),
    )


def test_fused_gradients_flow():
    t, h, w = 4, 8, 10
    b, nl, c, nh, p = 1, 2, 256, 8, 8
    kp = nh * p
    rng = np.random.default_rng(1)
    aligned = [jnp.asarray(rng.normal(size=(b, t, h, w, c)), jnp.float32)
               for _ in range(nl)]
    fused = jnp.asarray(
        rng.normal(size=(b, t, h, w, 3 * nl * kp)), jnp.float32)

    def loss_k(f):
        return windowed_blend_fused_head(
            aligned, f, nh=nh, radius=1.0, use_pallas=True,
            interpret=True).sum()

    def loss_c(f):
        vol = jnp.stack(aligned, axis=1)
        return _fused2d_composite(vol, f, nh, 1.0, False, True).sum()

    gk = jax.grad(loss_k)(fused)
    gc = jax.grad(loss_c)(fused)
    assert np.isfinite(np.asarray(gk)).all()
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gc),
                               atol=1e-3, rtol=1e-3)
