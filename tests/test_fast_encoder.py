"""Tests for the gather-free windowed deformable attention (fast encoder).

This is a TPU-native architectural variant (no reference counterpart), so
the oracle is a naive per-sample trilinear sampler implementing the SAME
windowed semantics, written in numpy loops.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from class_query_vad_tpu.ops.fast_deform import (
    align_level,
    window_masses,
    windowed_blend,
    windowed_blend_fused,
    windowed_deform_attn,
)


def _naive_windowed(values, offsets, weights):
    """values [B,T,H,W,nh,D]; offsets [B,T,H,W,nh,1,P,3] (x,y,t);
    weights [B,T,H,W,nh,1,P].  Zero padding outside the volume."""
    B, T, H, W, nh, D = values.shape
    P = weights.shape[-1]
    out = np.zeros_like(values)

    def sample(b, h, tt, yy, xx):
        t0, y0, x0 = int(np.floor(tt)), int(np.floor(yy)), int(np.floor(xx))
        ft, fy, fx = tt - t0, yy - y0, xx - x0
        acc = np.zeros(D, values.dtype)
        for ct in (0, 1):
            for cy in (0, 1):
                for cx in (0, 1):
                    ti, yi, xi = t0 + ct, y0 + cy, x0 + cx
                    if 0 <= ti < T and 0 <= yi < H and 0 <= xi < W:
                        wgt = (
                            (ft if ct else 1 - ft)
                            * (fy if cy else 1 - fy)
                            * (fx if cx else 1 - fx)
                        )
                        acc += wgt * values[b, ti, yi, xi, h]
        return acc

    for b in range(B):
        for t in range(T):
            for y in range(H):
                for x in range(W):
                    for h in range(nh):
                        for p in range(P):
                            dx, dy, dt = offsets[b, t, y, x, h, 0, p]
                            out[b, t, y, x, h] += weights[
                                b, t, y, x, h, 0, p
                            ] * sample(b, h, t + dt, y + dy, x + dx)
    return out


def test_windowed_blend_matches_naive_sampler():
    rng = np.random.default_rng(0)
    B, T, H, W, nh, D, P, R = 1, 3, 4, 5, 2, 3, 4, 1
    values = rng.normal(size=(B, T, H, W, nh, D)).astype(np.float32)
    offsets = rng.uniform(-R + 1e-3, R - 1e-3, (B, T, H, W, nh, 1, P, 3)).astype(
        np.float32
    )
    weights = rng.uniform(0.1, 1.0, (B, T, H, W, nh, 1, P)).astype(np.float32)

    masses = window_masses(jnp.asarray(offsets), jnp.asarray(weights), R)
    got = np.asarray(windowed_blend([jnp.asarray(values)], masses, R))
    want = _naive_windowed(values, offsets, weights)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # the production (layout-aware, mass-recomputing) path is numerically
    # identical to the spec path
    fused = np.asarray(
        windowed_blend_fused(
            [jnp.asarray(values)], jnp.asarray(offsets), jnp.asarray(weights), R
        )
    )
    np.testing.assert_allclose(fused, want, rtol=1e-5, atol=1e-5)


def test_window_masses_partition_of_unity():
    rng = np.random.default_rng(1)
    offsets = jnp.asarray(rng.uniform(-1.9, 1.9, (2, 7, 4, 2, 3, 3)), jnp.float32)
    weights = jnp.asarray(rng.uniform(0.0, 1.0, (2, 7, 4, 2, 3)), jnp.float32)
    masses = window_masses(offsets, weights, radius=2)
    np.testing.assert_allclose(
        np.asarray(masses.sum(axis=(-1, -2, -3))),
        np.asarray(weights.sum(-1)),
        rtol=1e-5,
    )


def test_align_level_roundtrip_properties():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 2, 8, 12, 5)), jnp.float32)

    down = align_level(x, (4, 6))
    want = np.asarray(x).reshape(1, 2, 4, 2, 6, 2, 5).mean(axis=(3, 5))
    np.testing.assert_allclose(np.asarray(down), want, rtol=1e-5)

    # constant maps are preserved exactly by up/down
    const = jnp.full((1, 1, 4, 4, 2), 3.5, jnp.float32)
    np.testing.assert_allclose(np.asarray(align_level(const, (8, 8))), 3.5)
    np.testing.assert_allclose(np.asarray(align_level(const, (2, 2))), 3.5)

    # 2x upsample reproduces linear ramps in the interior (half-pixel phase)
    ramp = jnp.broadcast_to(
        jnp.arange(6, dtype=jnp.float32)[None, None, None, :, None],
        (1, 1, 4, 6, 1),
    )
    up = np.asarray(align_level(ramp, (8, 12)))[0, 0, 2, 2:-2, 0]
    expect = (np.arange(12, dtype=np.float32) / 2 - 0.25)[2:-2]
    np.testing.assert_allclose(up, expect, rtol=1e-5)


def test_align_level_matches_stepwise_cascade():
    """The composed-matrix resize must equal the dyadic _up2/_down2 cascade
    it replaces, including multi-step and mixed up/down axes."""
    from class_query_vad_tpu.ops.fast_deform import _down2, _up2

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 3, 16, 8, 6)), jnp.float32)

    def cascade(feat, out_hw):
        for axis, target in ((2, out_hw[0]), (3, out_hw[1])):
            while feat.shape[axis] < target:
                feat = _up2(feat, axis)
            while feat.shape[axis] > target:
                feat = _down2(feat, axis)
        return feat

    for out_hw in ((4, 32), (64, 2), (16, 8), (2, 2), (32, 16)):
        np.testing.assert_allclose(
            np.asarray(align_level(x, out_hw)),
            np.asarray(cascade(x, out_hw)),
            rtol=2e-5, atol=2e-5, err_msg=str(out_hw),
        )

    with pytest.raises(ValueError):
        align_level(x, (12, 8))


def test_windowed_deform_attn_multilevel_shapes_and_grad():
    rng = np.random.default_rng(3)
    B, T, nh, D, P, R = 1, 2, 2, 4, 3, 1
    levels = [
        jnp.asarray(rng.normal(size=(B, T, 8, 8, nh, D)), jnp.float32),
        jnp.asarray(rng.normal(size=(B, T, 4, 4, nh, D)), jnp.float32),
    ]
    offsets = jnp.asarray(
        rng.uniform(-0.9, 0.9, (B, T, 8, 8, nh, 2, P, 3)), jnp.float32
    )
    weights = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(B, T, 8, 8, nh, 2 * P)), jnp.float32)
    ).reshape(B, T, 8, 8, nh, 2, P)

    def f(offs):
        return windowed_deform_attn(levels, offs, weights, R).sum()

    val, grad = jax.value_and_grad(f)(offsets)
    assert np.isfinite(float(val))
    g = np.asarray(grad)
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


def test_fast_encoder_model_forward():
    from class_query_vad_tpu.config import get_cfg_custom
    from class_query_vad_tpu.models import build_model

    cfg = get_cfg_custom("configuration/AVA22_ViT-B.yaml")
    cfg.CONFIG.MODEL.ENCODER_TYPE = "fast_attention"
    cfg.CONFIG.MODEL.FAST_RADIUS = 1
    cfg.CONFIG.DATA.TEMP_LEN = 4
    cfg.CONFIG.MODEL.TEMP_LEN = 4
    cfg.CONFIG.ViT.DEPTH = 1
    cfg.CONFIG.MODEL.ENC_LAYERS = 2
    cfg.CONFIG.MODEL.DEC_LAYERS = 1

    model = build_model(cfg)
    pixels = jnp.zeros((1, 4, 64, 96, 3), jnp.float32)
    mask = jnp.zeros((1, 64, 96), bool)
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), pixels, mask, True
    )
    out = jax.jit(model.apply, static_argnums=(3,))(params, pixels, mask, True)
    for k in ("pred_logits", "pred_boxes", "pred_logits_b"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_windowed_blend_pallas_matches_fused():
    from class_query_vad_tpu.ops.fast_deform import windowed_blend_fused
    from class_query_vad_tpu.ops.fast_deform_pallas import (
        windowed_blend_pallas,
        windowed_blend_pallas_ok,
    )

    rng = np.random.default_rng(5)
    B, T, H, W, nh, D, L, P, R = 2, 3, 8, 16, 8, 32, 2, 4, 1
    assert windowed_blend_pallas_ok(T, H, W, nh * D, R)
    aligned = [
        jnp.asarray(rng.normal(size=(B, T, H, W, nh, D)), jnp.float32)
        for _ in range(L)
    ]
    offsets = jnp.asarray(
        rng.uniform(-0.95, 0.95, (B, T, H, W, nh, L, P, 3)), jnp.float32
    )
    weights = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(B, T, H, W, nh, L * P)), jnp.float32)
    ).reshape(B, T, H, W, nh, L, P)

    want = np.asarray(windowed_blend_fused(aligned, offsets, weights, R))
    got = np.asarray(
        windowed_blend_pallas(aligned, offsets, weights, R, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_windowed_blend_pallas_grads():
    from class_query_vad_tpu.ops.fast_deform import windowed_blend_fused
    from class_query_vad_tpu.ops.fast_deform_pallas import windowed_blend_pallas

    rng = np.random.default_rng(6)
    B, T, H, W, nh, D, L, P, R = 1, 2, 8, 8, 8, 32, 1, 2, 1
    aligned = [jnp.asarray(rng.normal(size=(B, T, H, W, nh, D)), jnp.float32)]
    offsets = jnp.asarray(
        rng.uniform(-0.9, 0.9, (B, T, H, W, nh, L, P, 3)), jnp.float32
    )
    weights = jnp.asarray(
        rng.uniform(0.1, 1.0, (B, T, H, W, nh, L, P)), jnp.float32
    )

    def f_pallas(o, w_):
        return windowed_blend_pallas(aligned, o, w_, R, interpret=True).sum()

    def f_xla(o, w_):
        return windowed_blend_fused(aligned, o, w_, R).sum()

    gp = jax.grad(f_pallas, argnums=(0, 1))(offsets, weights)
    gx = jax.grad(f_xla, argnums=(0, 1))(offsets, weights)
    for a_, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_windowed_blend_comps_matches_fused_with_padding():
    """The comps entry (contiguous-lane layout + W-padding for non-8-multiple
    grids) must equal the reference fused blend, including the pallas
    interpret path on a W=10 grid."""
    from class_query_vad_tpu.ops.fast_deform import windowed_blend_fused
    from class_query_vad_tpu.ops.fast_deform_pallas import windowed_blend_comps

    rng = np.random.default_rng(7)
    B, T, H, W, nh, D, L, P = 1, 3, 8, 10, 8, 32, 2, 4
    aligned = [
        jnp.asarray(rng.normal(size=(B, T, H, W, nh, D)), jnp.float32)
        for _ in range(L)
    ]
    offsets = jnp.asarray(
        rng.uniform(-0.95, 0.95, (B, T, H, W, nh, L, P, 3)), jnp.float32
    )
    weights = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(B, T, H, W, nh, L * P)), jnp.float32)
    ).reshape(B, T, H, W, nh, L, P)
    want = np.asarray(windowed_blend_fused(aligned, offsets, weights, 1))

    # comps layout: [B, J, T, H, W, nh*P]
    dx = offsets[..., 0].transpose(0, 5, 1, 2, 3, 4, 6).reshape(B, L, T, H, W, -1)
    dy = offsets[..., 1].transpose(0, 5, 1, 2, 3, 4, 6).reshape(B, L, T, H, W, -1)
    dt = offsets[..., 2].transpose(0, 5, 1, 2, 3, 4, 6).reshape(B, L, T, H, W, -1)
    a = weights.transpose(0, 5, 1, 2, 3, 4, 6).reshape(B, L, T, H, W, -1)

    # comps entry takes flat-lane values [B, T, H, W, nh*D]
    flat = [v.reshape(B, T, H, W, nh * D) for v in aligned]
    want_flat = want.reshape(B, T, H, W, nh * D)

    got_xla = np.asarray(
        windowed_blend_comps(flat, dx, dy, dt, a, nh=nh, use_pallas=False)
    )
    np.testing.assert_allclose(got_xla, want_flat, rtol=1e-5, atol=1e-5)

    got_pk = np.asarray(
        windowed_blend_comps(flat, dx, dy, dt, a, nh=nh, use_pallas=True,
                             interpret=True)
    )
    np.testing.assert_allclose(got_pk, want_flat, rtol=1e-5, atol=1e-5)


def test_flat_lane_softmax_matches_reference():
    """The encoder's matmul-denominator softmax over (L, P) lanes per head
    equals jax.nn.softmax on the transposed layout."""
    rng = np.random.default_rng(8)
    nh, L, P = 8, 4, 8
    kp = nh * P
    logits = jnp.asarray(rng.normal(size=(5, L * kp)) * 3, jnp.float32)
    head_ind = jnp.asarray(
        (jnp.arange(L * kp)[:, None] // P % nh)
        == (jnp.arange(L * kp)[None, :] // P % nh),
        jnp.float32,
    )
    z = logits - jnp.max(logits, -1, keepdims=True)
    e = jnp.exp(z)
    got = np.asarray(e / jnp.einsum("...k,kc->...c", e, head_ind))
    # reference: reshape (L, nh, P) -> per-head softmax over (L, P)
    ref_in = np.asarray(logits).reshape(5, L, nh, P).transpose(0, 2, 1, 3)
    ref = np.asarray(
        jax.nn.softmax(jnp.asarray(ref_in).reshape(5, nh, L * P), -1)
    ).reshape(5, nh, L, P).transpose(0, 2, 1, 3).reshape(5, L * kp)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_blend_kernel_vjp_matches_xla_oracle():
    """The backward Pallas kernels (dvol reversed stencil + dcomps) must
    match jax.vjp of the XLA reference for every input."""
    from class_query_vad_tpu.ops.fast_deform_pallas import (
        _blend,
        _blend_xla_vol,
    )

    rng = np.random.default_rng(11)
    B, J, T, H, W, C, KP = 2, 2, 3, 8, 16, 256, 64
    vol = jnp.asarray(rng.normal(size=(B, J, T, H, W, C)), jnp.float32)
    dx, dy, dt = (
        jnp.asarray(rng.uniform(-0.97, 0.97, (B, J, T, H, W, KP)), jnp.float32)
        for _ in range(3)
    )
    a = jnp.asarray(rng.uniform(0.05, 1, (B, J, T, H, W, KP)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(B, T, H, W, C)), jnp.float32)

    out_k, vjp_k = jax.vjp(lambda *z: _blend(*z, False, True), vol, dx, dy, dt, a)
    out_x, vjp_x = jax.vjp(lambda *z: _blend_xla_vol(*z), vol, dx, dy, dt, a)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                               rtol=1e-5, atol=1e-5)
    for name, gk, gx in zip(("dvol", "ddx", "ddy", "ddt", "da"),
                            vjp_k(g), vjp_x(g)):
        np.testing.assert_allclose(
            np.asarray(gk), np.asarray(gx), rtol=1e-4, atol=1e-4,
            err_msg=name,
        )


def test_windowed_blend_comps_2d_matches_fused_dt0():
    """The spatial-only window (dt=None) must equal the 3D fused blend with
    all temporal offsets at 0, on XLA, pallas-interpret, and its VJP."""
    from class_query_vad_tpu.ops.fast_deform import windowed_blend_fused
    from class_query_vad_tpu.ops.fast_deform_pallas import (
        _blend2d,
        _blend_xla_vol_2d,
        windowed_blend_comps,
    )

    rng = np.random.default_rng(11)
    B, T, H, W, nh, D, L, P = 1, 2, 8, 10, 8, 32, 2, 4
    aligned = [
        jnp.asarray(rng.normal(size=(B, T, H, W, nh, D)), jnp.float32)
        for _ in range(L)
    ]
    off_xy = jnp.asarray(
        rng.uniform(-0.95, 0.95, (B, T, H, W, nh, L, P, 2)), jnp.float32
    )
    offsets = jnp.concatenate(
        [off_xy, jnp.zeros((B, T, H, W, nh, L, P, 1))], axis=-1
    )
    weights = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(B, T, H, W, nh, L * P)), jnp.float32)
    ).reshape(B, T, H, W, nh, L, P)
    want = np.asarray(
        windowed_blend_fused(aligned, offsets, weights, 1)
    ).reshape(B, T, H, W, nh * D)

    flat = [v.reshape(B, T, H, W, nh * D) for v in aligned]
    dx = off_xy[..., 0].transpose(0, 5, 1, 2, 3, 4, 6).reshape(B, L, T, H, W, -1)
    dy = off_xy[..., 1].transpose(0, 5, 1, 2, 3, 4, 6).reshape(B, L, T, H, W, -1)
    a = weights.transpose(0, 5, 1, 2, 3, 4, 6).reshape(B, L, T, H, W, -1)

    got_xla = np.asarray(
        windowed_blend_comps(flat, dx, dy, None, a, nh=nh, use_pallas=False)
    )
    np.testing.assert_allclose(got_xla, want, rtol=1e-5, atol=1e-5)

    got_pk = np.asarray(
        windowed_blend_comps(flat, dx, dy, None, a, nh=nh, use_pallas=True,
                             interpret=True)
    )
    np.testing.assert_allclose(got_pk, want, rtol=1e-5, atol=1e-5)

    # VJP of the kernel entry vs direct grad of the XLA oracle
    vol = jnp.stack(flat, axis=1)
    ph, pw = 0, (-W) % 8
    volp = jnp.pad(vol, [(0, 0), (0, 0), (0, 0), (0, ph), (0, pw), (0, 0)])
    comps = [jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, ph), (0, pw), (0, 0)])
             for x in (dx, dy, a)]

    def f_k(v, dx_, dy_, a_):
        return _blend2d(v, dx_, dy_, a_, False, True).sum()

    def f_x(v, dx_, dy_, a_):
        return _blend_xla_vol_2d(v, dx_, dy_, a_, nh).sum()

    gk = jax.grad(f_k, argnums=(0, 1, 2, 3))(volp, *comps)
    gx = jax.grad(f_x, argnums=(0, 1, 2, 3))(volp, *comps)
    for a_, b_ in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_fast_encoder_2d_window_forward_and_grad():
    """FastDeformableEncoder with window='2d' builds, runs, and its params
    carry 2-component offset lanes."""
    from class_query_vad_tpu.models.fast_encoder import FastDeformableEncoder

    rng = np.random.default_rng(12)
    levels = [(2, 8, 8), (2, 4, 4)]
    srcs = [jnp.asarray(rng.normal(size=(1, t, h, w, 256)), jnp.float32)
            for t, h, w in levels]
    poses = [jnp.asarray(rng.normal(size=(1, t, h, w, 256)), jnp.float32)
             for t, h, w in levels]
    enc = FastDeformableEncoder(
        num_layers=1, n_levels=2, n_points=4, window="2d", use_pallas=False)
    params = enc.init(jax.random.PRNGKey(0), srcs, poses, None)
    off_k = params["params"]["layers_0"]["self_attn"][
        "sampling_offsets_kernel"]
    assert off_k.shape == (256, 2 * 2 * 8 * 4)          # L * 2 comps * nh*P
    outs = enc.apply(params, srcs, poses, None)
    assert [o.shape for o in outs] == [s.shape for s in srcs]
    g = jax.grad(
        lambda p: sum(jnp.sum(o) for o in enc.apply(p, srcs, poses, None))
    )(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def _naive_native_sample(vol, dx, dy, a, nh):
    """numpy oracle: per-query bilinear sample of the native-resolution
    volume at the align_corners=False mapped position + offset."""
    B, T, Hv, Wv, C = vol.shape
    _, _, Hq, Wq, KP = dx.shape
    P = KP // nh
    d = C // nh
    out = np.zeros((B, T, Hq, Wq, C), np.float32)
    for b in range(B):
        for t in range(T):
            for yq in range(Hq):
                for xq in range(Wq):
                    py0 = (yq + 0.5) * Hv / Hq - 0.5
                    px0 = (xq + 0.5) * Wv / Wq - 0.5
                    for h in range(nh):
                        for p in range(P):
                            k = h * P + p
                            py = py0 + dy[b, t, yq, xq, k]
                            px = px0 + dx[b, t, yq, xq, k]
                            y0, x0 = int(np.floor(py)), int(np.floor(px))
                            fy, fx = py - y0, px - x0
                            acc = np.zeros(d, np.float32)
                            for cy in (0, 1):
                                for cx in (0, 1):
                                    yi, xi = y0 + cy, x0 + cx
                                    if 0 <= yi < Hv and 0 <= xi < Wv:
                                        wgt = (fy if cy else 1 - fy) * (
                                            fx if cx else 1 - fx)
                                        acc += wgt * vol[
                                            b, t, yi, xi,
                                            h * d : (h + 1) * d]
                            out[b, t, yq, xq, h * d : (h + 1) * d] += (
                                a[b, t, yq, xq, k] * acc)
    return out


@pytest.mark.parametrize("vshape,qshape", [
    ((4, 5), (8, 10)),     # value coarser than queries (upsample case)
    ((8, 10), (8, 10)),    # same resolution
    ((8, 12), (4, 6)),     # value finer than queries (downsample case)
])
def test_native_blend_level_matches_naive(vshape, qshape):
    from class_query_vad_tpu.ops.fast_deform import native_blend_level

    rng = np.random.default_rng(13)
    B, T, nh, d, P = 1, 2, 2, 3, 4
    Hv, Wv = vshape
    Hq, Wq = qshape
    vol = rng.normal(size=(B, T, Hv, Wv, nh * d)).astype(np.float32)
    dx = rng.uniform(-0.97, 0.97, (B, T, Hq, Wq, nh * P)).astype(np.float32)
    dy = rng.uniform(-0.97, 0.97, (B, T, Hq, Wq, nh * P)).astype(np.float32)
    a = rng.uniform(0.05, 1.0, (B, T, Hq, Wq, nh * P)).astype(np.float32)

    got = np.asarray(native_blend_level(
        jnp.asarray(vol), jnp.asarray(dx), jnp.asarray(dy), jnp.asarray(a),
        nh))
    want = _naive_native_sample(vol, dx, dy, a, nh)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_fast_encoder_native_mode_model_forward():
    """FAST_CROSS_LEVEL: native threads through config -> spec ->
    transformer -> encoder and produces finite outputs + grads."""
    from class_query_vad_tpu.config import get_cfg_custom
    from class_query_vad_tpu.models import build_model

    cfg = get_cfg_custom("configuration/AVA22_ViT-B.yaml")
    cfg.CONFIG.MODEL.ENCODER_TYPE = "fast_attention"
    cfg.CONFIG.MODEL.FAST_RADIUS = 1
    cfg.CONFIG.MODEL.FAST_WINDOW = "2d"
    cfg.CONFIG.MODEL.FAST_CROSS_LEVEL = "native"
    cfg.CONFIG.DATA.TEMP_LEN = 4
    cfg.CONFIG.MODEL.TEMP_LEN = 4
    cfg.CONFIG.ViT.DEPTH = 1
    cfg.CONFIG.MODEL.ENC_LAYERS = 1
    cfg.CONFIG.MODEL.DEC_LAYERS = 1

    model = build_model(cfg)
    pixels = jnp.zeros((1, 4, 64, 96, 3), jnp.float32)
    mask = jnp.zeros((1, 64, 96), bool)
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), pixels, mask, True
    )
    out = jax.jit(model.apply, static_argnums=(3,))(params, pixels, mask, True)
    for k in ("pred_logits", "pred_boxes", "pred_logits_b"):
        assert np.isfinite(np.asarray(out[k])).all(), k


def test_windowed_blend_native_pallas_matches_oracle():
    """The native-mode Pallas kernel (repeat + stride-R taps + phase rows)
    must equal the XLA oracle sum over levels, including 8-padding of a
    non-multiple-of-8 query grid, mixed ratios, and a finer level routed
    to the XLA path; its custom VJP must match the oracle's grads."""
    from class_query_vad_tpu.ops.fast_deform import native_blend_level
    from class_query_vad_tpu.ops.fast_deform_pallas import (
        windowed_blend_native,
    )

    rng = np.random.default_rng(17)
    B, T, nh, d, P = 2, 2, 8, 32, 4
    C = nh * d
    # query grid (12, 20): 12 not a multiple of 8 -> pad path; levels at
    # ratios 1, 2, 4 (kernel) and one FINER level (24, 40) -> XLA path
    H, W = 12, 20
    vshapes = [(12, 20), (6, 10), (3, 5), (24, 40)]
    values = [
        jnp.asarray(rng.normal(size=(B, T, hv, wv, C)), jnp.float32)
        for hv, wv in vshapes
    ]
    J = len(values)
    dx = jnp.asarray(rng.uniform(-0.97, 0.97, (B, J, T, H, W, nh * P)),
                     jnp.float32)
    dy = jnp.asarray(rng.uniform(-0.97, 0.97, (B, J, T, H, W, nh * P)),
                     jnp.float32)
    a = jnp.asarray(rng.uniform(0.05, 1.0, (B, J, T, H, W, nh * P)),
                    jnp.float32)

    want = sum(
        np.asarray(native_blend_level(values[j], dx[:, j], dy[:, j], a[:, j],
                                      nh))
        for j in range(J)
    )
    got = np.asarray(windowed_blend_native(
        values, dx, dy, a, nh=nh, use_pallas=True, interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def f_k(vals, dxx, dyy, aa):
        return windowed_blend_native(vals, dxx, dyy, aa, nh=nh,
                                     use_pallas=True, interpret=True).sum()

    def f_x(vals, dxx, dyy, aa):
        return sum(
            native_blend_level(vals[j], dxx[:, j], dyy[:, j], aa[:, j], nh)
            for j in range(J)
        ).sum()

    gk = jax.grad(f_k, argnums=(0, 1, 2, 3))(values, dx, dy, a)
    gx = jax.grad(f_x, argnums=(0, 1, 2, 3))(values, dx, dy, a)
    for a_, b_ in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_windowed_blend_native_pallas_ratio8_production_grid():
    """AVA grid-0 shape family: 64x80 queries over the full dyadic pyramid
    (ratios 1/2/4/8) through the Pallas kernel, one t-row."""
    from class_query_vad_tpu.ops.fast_deform import native_blend_level
    from class_query_vad_tpu.ops.fast_deform_pallas import (
        windowed_blend_native,
    )

    rng = np.random.default_rng(19)
    B, T, nh, d, P = 1, 1, 8, 32, 2
    C = nh * d
    H, W = 64, 80
    vshapes = [(64, 80), (32, 40), (16, 20), (8, 10)]
    values = [
        jnp.asarray(rng.normal(size=(B, T, hv, wv, C)), jnp.float32)
        for hv, wv in vshapes
    ]
    J = len(values)
    dx = jnp.asarray(rng.uniform(-0.97, 0.97, (B, J, T, H, W, nh * P)),
                     jnp.float32)
    dy = jnp.asarray(rng.uniform(-0.97, 0.97, (B, J, T, H, W, nh * P)),
                     jnp.float32)
    a = jnp.asarray(rng.uniform(0.05, 1.0, (B, J, T, H, W, nh * P)),
                    jnp.float32)

    want = sum(
        np.asarray(native_blend_level(values[j], dx[:, j], dy[:, j], a[:, j],
                                      nh))
        for j in range(J)
    )
    got = np.asarray(windowed_blend_native(
        values, dx, dy, a, nh=nh, use_pallas=True, interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_windowed_blend_native_pallas_3d_matches_oracle():
    """The 3d native kernel (3 t-shift refs x stride-R spatial taps) must
    equal the XLA oracle, including grads through its custom VJP."""
    from class_query_vad_tpu.ops.fast_deform import native_blend_level
    from class_query_vad_tpu.ops.fast_deform_pallas import (
        windowed_blend_native,
    )

    rng = np.random.default_rng(23)
    B, T, nh, d, P = 2, 3, 8, 32, 2
    C = nh * d
    H, W = 8, 16
    vshapes = [(8, 16), (4, 8), (2, 4)]
    values = [
        jnp.asarray(rng.normal(size=(B, T, hv, wv, C)), jnp.float32)
        for hv, wv in vshapes
    ]
    J = len(values)
    shape = (B, J, T, H, W, nh * P)
    dx = jnp.asarray(rng.uniform(-0.97, 0.97, shape), jnp.float32)
    dy = jnp.asarray(rng.uniform(-0.97, 0.97, shape), jnp.float32)
    dt = jnp.asarray(rng.uniform(-0.97, 0.97, shape), jnp.float32)
    a = jnp.asarray(rng.uniform(0.05, 1.0, shape), jnp.float32)

    want = sum(
        np.asarray(native_blend_level(values[j], dx[:, j], dy[:, j], a[:, j],
                                      nh, dt=dt[:, j]))
        for j in range(J)
    )
    got = np.asarray(windowed_blend_native(
        values, dx, dy, a, nh=nh, use_pallas=True, interpret=True, dt=dt,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def f_k(vals, dxx, dtt):
        return windowed_blend_native(vals, dxx, dy, a, nh=nh,
                                     use_pallas=True, interpret=True,
                                     dt=dtt).sum()

    def f_x(vals, dxx, dtt):
        return sum(
            native_blend_level(vals[j], dxx[:, j], dy[:, j], a[:, j], nh,
                               dt=dtt[:, j])
            for j in range(J)
        ).sum()

    gk = jax.grad(f_k, argnums=(0, 1, 2))(values, dx, dt)
    gx = jax.grad(f_x, argnums=(0, 1, 2))(values, dx, dt)
    for a_, b_ in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)
