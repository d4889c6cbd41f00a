"""Pallas TPU kernel for the windowed deformable blend (radius = 1).

The XLA path (:func:`.fast_deform.windowed_blend_fused`) re-reads the value
volume and the output accumulator for every one of the 27 * L shift terms —
bandwidth-bound at ~22 ms/layer (bf16) at AVA shapes.  This kernel keeps
the output tile resident in VMEM across all shifts and value levels, so
each value byte is read ~9x (3 t-offsets x 3 h-copies) instead of ~81x,
and the per-shift interpolation masses are recomputed on the fly from
lane-friendly [.., nh*P] tensors and expanded to the 256-lane head layout
with one small MXU matmul against a constant block-selector.

Decomposition of the 3^3 shift window (no overlapping BlockSpecs on TPU):

* **h shifts** — three HBM copies of the padded volume, pre-sliced at
  h-offsets 0/1/2 and stacked on a leading axis; each of the nine input
  refs picks one copy via a constant in its index_map;
* **t shifts** — the padded t axis is blocked at size 1, so index_map
  offsets (+0/+1/+2) select element-granularity t rows;
* **w shifts** — in-kernel static sublane slices of the (W+2)-wide block.

Grid is (T, H/Ht, J) with J innermost: the output block is revisited
across the J value levels and zero-initialised at j == 0.

Constraints: radius == 1, H and W multiples of 8 (holds for AVA levels 0-1,
which carry ~94% of tokens; callers fall back to the XLA path otherwise).
The backward pass reuses the XLA implementation via jax.custom_vjp, so
training gets correct (slower) gradients while inference takes the kernel.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _selector(nh: int, p: int, d: int) -> np.ndarray:
    """[nh*p, nh*d] block selector: S[k, c] = 1 iff k // p == c // d.
    hat @ S sums the per-point masses within each head and broadcasts the
    result over that head's d lanes in ONE MXU matmul (a chained
    [.., nh] @ [nh, c] two-stage version measured slower — tiny-N matmuls
    waste MXU output lanes)."""
    s = np.zeros((nh * p, nh * d), np.float32)
    s[np.arange(nh * p)[:, None],
      (np.arange(nh * p) // p)[:, None] * d + np.arange(d)[None, :]] = 1.0
    return s


def _blend_kernel(s_ref, dx_ref, dy_ref, dt_ref, a_ref, *refs,
                  precise: bool):
    vp_refs, out_ref = refs[:-1], refs[-1]
    prec = jax.lax.Precision.HIGHEST if precise else None
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    ht_, w, kp = dx_ref.shape[2], dx_ref.shape[3], dx_ref.shape[4]
    c = out_ref.shape[-1]
    dx = dx_ref[0, 0].astype(jnp.float32)     # [Ht, W, nh*P]
    dy = dy_ref[0, 0].astype(jnp.float32)
    dt = dt_ref[0, 0].astype(jnp.float32)
    a = a_ref[0, 0].astype(jnp.float32)
    sel = s_ref[...]

    # per-axis hat weights for the three integer shifts (-1, 0, +1)
    hx = [jnp.maximum(0.0, 1.0 - jnp.abs(dx - (k - 1))) for k in range(3)]
    hy = [jnp.maximum(0.0, 1.0 - jnp.abs(dy - (k - 1))) for k in range(3)]
    htt = [jnp.maximum(0.0, 1.0 - jnp.abs(dt - (k - 1))) for k in range(3)]

    acc = out_ref[0]                           # [Ht, W, C] fp32
    for it in range(3):
        at = a * htt[it]
        for ih in range(3):
            vp = vp_refs[it * 3 + ih][0, 0, 0]  # [Ht, W+2, C]
            aty = at * hy[ih]
            for ix in range(3):
                hat = (aty * hx[ix]).reshape(ht_ * w, kp)
                # the selector is exact 0/1; default MXU precision rounds
                # the fp32 hats to one bf16 pass (~1e-3 rel) — fine for the
                # bf16 deployment dtype, HIGHEST for fp32 mode
                m = jax.lax.dot(
                    hat, sel, preferred_element_type=jnp.float32,
                    precision=prec,
                ).reshape(ht_, w, c)
                acc = acc + m * vp[:, ix : ix + w, :].astype(jnp.float32)
    out_ref[0] = acc


def _blend_kernel_v2(s_ref, dx_ref, dy_ref, dt_ref, a_ref, vp0, vp1, vp2,
                     out_ref, *, precise: bool):
    """Single-copy variant: the whole padded (H+2, W+2) plane of one t-row
    is one block, so h- and w-shifts are both in-kernel static slices and
    the volume needs NO h-copies in HBM.  The three t-shifts come from
    three refs into the SAME array whose index maps are offset by +0/+1/+2.
    Each value byte is read 3x (t-shifts) instead of 9x, and the halo-stack
    write (3x volume) disappears entirely."""
    prec = jax.lax.Precision.HIGHEST if precise else None
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    h, w, kp = dx_ref.shape[2], dx_ref.shape[3], dx_ref.shape[4]
    c = out_ref.shape[-1]
    dx = dx_ref[0, 0].astype(jnp.float32)     # [H, W, nh*P]
    dy = dy_ref[0, 0].astype(jnp.float32)
    dt = dt_ref[0, 0].astype(jnp.float32)
    a = a_ref[0, 0].astype(jnp.float32)
    sel = s_ref[...]

    hx = [jnp.maximum(0.0, 1.0 - jnp.abs(dx - (k - 1))) for k in range(3)]
    hy = [jnp.maximum(0.0, 1.0 - jnp.abs(dy - (k - 1))) for k in range(3)]
    htt = [jnp.maximum(0.0, 1.0 - jnp.abs(dt - (k - 1))) for k in range(3)]

    acc = out_ref[0]                           # [H, W, C] fp32
    for it, vp_ref in enumerate((vp0, vp1, vp2)):
        vplane = vp_ref[0, 0]                  # [H+2, W+2, C]
        at = a * htt[it]
        for ih in range(3):
            vh = vplane[ih : ih + h]           # [H, W+2, C]
            aty = at * hy[ih]
            for ix in range(3):
                hat = (aty * hx[ix]).reshape(h * w, kp)
                m = jax.lax.dot(
                    hat, sel, preferred_element_type=jnp.float32,
                    precision=prec,
                ).reshape(h, w, c)
                acc = acc + m * vh[:, ix : ix + w, :].astype(jnp.float32)
    out_ref[0] = acc


def _v2_vmem_mb(t: int, h: int, w: int, c: int, kp: int,
                vol_bytes: int = 2, comp_bytes: int = 2) -> float:
    """Double-buffered VMEM working set of the v2 kernel in MB."""
    vp = 3 * (h + 2) * (w + 2) * c * vol_bytes   # three t-row planes
    comps = 4 * h * w * kp * comp_bytes
    out = h * w * c * 4
    return (2 * (vp + comps) + 2 * out) / 2 ** 20


def _blend_pallas_b1_v2(vp, dx, dy, dt, a, *, precise=False, interpret=False):
    """vp [J, T+2, H+2, W+2, C] (zero-padded volume, no copies); dx/dy/dt/a
    [J, T, H, W, nh*P] -> out [T, H, W, C] float32."""
    jl, tp2, hp, wp, c = vp.shape
    t, h, w = tp2 - 2, hp - 2, wp - 2
    kp = dx.shape[-1]
    grid = (t, jl)

    vp_specs = [
        pl.BlockSpec(
            (1, 1, hp, wp, c),
            functools.partial(lambda ti, j, *, dt_: (j, ti + dt_, 0, 0, 0),
                              dt_=dt_),
        )
        for dt_ in range(3)
    ]
    comp_spec = pl.BlockSpec((1, 1, h, w, kp), lambda ti, j: (j, ti, 0, 0, 0))
    sel = jnp.asarray(_selector(8, kp // 8, c // 8))

    return pl.pallas_call(
        functools.partial(_blend_kernel_v2, precise=precise),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kp, c), lambda ti, j: (0, 0)),
            comp_spec, comp_spec, comp_spec, comp_spec,
            *vp_specs,
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda ti, j: (ti, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, h, w, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(sel, dx, dy, dt, a, *([vp] * 3))


def _blend_kernel_v2_2d(s_ref, dx_ref, dy_ref, a_ref, vp_ref, out_ref,
                        *, precise: bool):
    """Spatial-only (x, y) window: 9 shifts, values read ONCE (no t-halo).
    Same single-copy plane layout as _blend_kernel_v2."""
    prec = jax.lax.Precision.HIGHEST if precise else None
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    h, w, kp = dx_ref.shape[2], dx_ref.shape[3], dx_ref.shape[4]
    c = out_ref.shape[-1]
    dx = dx_ref[0, 0].astype(jnp.float32)     # [H, W, nh*P]
    dy = dy_ref[0, 0].astype(jnp.float32)
    a = a_ref[0, 0].astype(jnp.float32)
    sel = s_ref[...]

    hx = [jnp.maximum(0.0, 1.0 - jnp.abs(dx - (k - 1))) for k in range(3)]
    hy = [jnp.maximum(0.0, 1.0 - jnp.abs(dy - (k - 1))) for k in range(3)]

    acc = out_ref[0]                           # [H, W, C] fp32
    vplane = vp_ref[0, 0]                      # [H+2, W+2, C]
    for ih in range(3):
        vh = vplane[ih : ih + h]               # [H, W+2, C]
        ay = a * hy[ih]
        for ix in range(3):
            hat = (ay * hx[ix]).reshape(h * w, kp)
            m = jax.lax.dot(
                hat, sel, preferred_element_type=jnp.float32,
                precision=prec,
            ).reshape(h, w, c)
            acc = acc + m * vh[:, ix : ix + w, :].astype(jnp.float32)
    out_ref[0] = acc


def _v2d_vmem_mb(h: int, w: int, c: int, kp: int,
                 vol_bytes: int = 2, comp_bytes: int = 2) -> float:
    """Double-buffered VMEM working set of the 2D kernel in MB."""
    vp = (h + 2) * (w + 2) * c * vol_bytes
    comps = 3 * h * w * kp * comp_bytes
    out = h * w * c * 4
    return (2 * (vp + comps) + 2 * out) / 2 ** 20


def _blend_pallas_b1_v2_2d(vp, dx, dy, a, *, precise=False, interpret=False):
    """vp [J, T, H+2, W+2, C] (h/w zero-padded); dx/dy/a [J, T, H, W, nh*P]
    -> out [T, H, W, C] float32."""
    jl, t, hp, wp, c = vp.shape
    h, w = hp - 2, wp - 2
    kp = dx.shape[-1]
    grid = (t, jl)

    vp_spec = pl.BlockSpec((1, 1, hp, wp, c), lambda ti, j: (j, ti, 0, 0, 0))
    comp_spec = pl.BlockSpec((1, 1, h, w, kp), lambda ti, j: (j, ti, 0, 0, 0))
    sel = jnp.asarray(_selector(8, kp // 8, c // 8))

    return pl.pallas_call(
        functools.partial(_blend_kernel_v2_2d, precise=precise),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kp, c), lambda ti, j: (0, 0)),
            comp_spec, comp_spec, comp_spec,
            vp_spec,
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda ti, j: (ti, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, h, w, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(sel, dx, dy, a, vp)


def _rep_axis(x, r: int, axis: int):
    """Nearest-neighbour repeat along a non-lane axis via broadcast+reshape
    (Mosaic-friendly; jnp.repeat lowers the same way)."""
    if r == 1:
        return x
    s = list(x.shape)
    x = jnp.broadcast_to(
        jnp.expand_dims(x, axis + 1), s[: axis + 1] + [r] + s[axis + 1 :]
    )
    s[axis] *= r
    return x.reshape(s)


def _native_kernel_2d(s_ref, dx_ref, dy_ref, a_ref, *refs,
                      ratios, pres=None, precise: bool):
    """Native-resolution multi-level blend (cross_level='native').

    One t-row of the full query plane per grid step; each value level
    arrives at its OWN resolution (ratio R = query/native, a power of two
    >= 1) padded by (2, 2+extra) cells.  Per level the plane is
    nearest-repeated to query resolution in VMEM and the 4 candidate taps
    per axis are static slices at stride-R offsets; the hat weights get
    the static align_corners=False phase phi(x) = frac((x+0.5)/R - 0.5)
    added before the mass matmul.  Math pinned to
    fast_deform.native_blend_level (the XLA/numpy oracle).

    ``pres[j]``: the plane arrives PRE-repeated by this factor (nearest
    repeat composes exactly, so XLA pre-repeats the tiny coarse planes and
    the in-kernel repeat ratio stays <= 2 — Mosaic compile time explodes
    with the in-kernel unroll ratio, measured 18 s at r<=4 vs 275 s at
    r=8 on the AVA grid-0 shape).  Slice offsets and phases always use
    the FULL ratio.
    """
    prec = jax.lax.Precision.HIGHEST if precise else None
    vp_refs, out_ref = refs[:-1], refs[-1]
    h, w, kp = dx_ref.shape[2], dx_ref.shape[3], dx_ref.shape[4]
    c = out_ref.shape[-1]
    sel = s_ref[...]
    pres = pres or (1,) * len(ratios)

    acc = jnp.zeros((h, w, c), jnp.float32)
    for j, (vp_ref, r) in enumerate(zip(vp_refs, ratios)):
        dx = dx_ref[j, 0].astype(jnp.float32)    # [H, W, kp]
        dy = dy_ref[j, 0].astype(jnp.float32)
        a = a_ref[j, 0].astype(jnp.float32)
        if r > 1:
            # int32 iota + cast: Mosaic rejects a float-typed tpu.iota
            fx = jax.lax.broadcasted_iota(
                jnp.int32, (1, w, 1), 1).astype(jnp.float32)
            fy = jax.lax.broadcasted_iota(
                jnp.int32, (h, 1, 1), 0).astype(jnp.float32)
            px = (fx + 0.5) / r - 0.5
            py = (fy + 0.5) / r - 0.5
            dx = dx + (px - jnp.floor(px))
            dy = dy + (py - jnp.floor(py))
            taps = range(-1, 3)
        else:
            # phi == 0: the s=2 tap weight hat(dx - 2) is identically 0
            taps = range(-1, 2)
        hx = {s: jnp.maximum(0.0, 1.0 - jnp.abs(dx - s)) for s in taps}
        hy = {s: jnp.maximum(0.0, 1.0 - jnp.abs(dy - s)) for s in taps}

        # nearest repeat composes exactly: the plane arrives pre-repeated
        # by pres[j] from XLA, the kernel only repeats the residual factor
        r2 = r // pres[j]
        plane = vp_ref[0]              # [(Hv+4+e)*pre, (Wv+4+e)*pre, C]
        rep_h = _rep_axis(plane, r2, 0)
        for sy in taps:
            uh = r * (sy + 2) - r // 2
            vh = _rep_axis(rep_h[uh : uh + h], r2, 1)  # [H, W+pad, C]
            ay = a * hy[sy]
            for sx in taps:
                ux = r * (sx + 2) - r // 2
                m = jax.lax.dot(
                    (ay * hx[sx]).reshape(h * w, kp), sel,
                    preferred_element_type=jnp.float32, precision=prec,
                ).reshape(h, w, c)
                acc = acc + m * vh[:, ux : ux + w, :].astype(jnp.float32)
    out_ref[0] = acc


def _native_kernel_3d(s_ref, dx_ref, dy_ref, dt_ref, a_ref, *refs,
                      ratios, pres=None, precise: bool):
    """3d-window variant of _native_kernel_2d's spatial logic: per level,
    three t-shift refs into the SAME t-padded volume (index maps offset by
    +0/+1/+2, like _blend_kernel_v2) x the 4x4 stride-R spatial taps."""
    prec = jax.lax.Precision.HIGHEST if precise else None
    nlev = len(ratios)
    vp_refs, out_ref = refs[:-1], refs[-1]
    h, w, kp = dx_ref.shape[2], dx_ref.shape[3], dx_ref.shape[4]
    c = out_ref.shape[-1]
    sel = s_ref[...]
    pres = pres or (1,) * nlev

    acc = jnp.zeros((h, w, c), jnp.float32)
    for j in range(nlev):
        r = ratios[j]
        dx = dx_ref[j, 0].astype(jnp.float32)
        dy = dy_ref[j, 0].astype(jnp.float32)
        dt = dt_ref[j, 0].astype(jnp.float32)
        a = a_ref[j, 0].astype(jnp.float32)
        if r > 1:
            fx = jax.lax.broadcasted_iota(
                jnp.int32, (1, w, 1), 1).astype(jnp.float32)
            fy = jax.lax.broadcasted_iota(
                jnp.int32, (h, 1, 1), 0).astype(jnp.float32)
            px = (fx + 0.5) / r - 0.5
            py = (fy + 0.5) / r - 0.5
            dx = dx + (px - jnp.floor(px))
            dy = dy + (py - jnp.floor(py))
            taps = range(-1, 3)
        else:
            taps = range(-1, 2)
        hx = {s: jnp.maximum(0.0, 1.0 - jnp.abs(dx - s)) for s in taps}
        hy = {s: jnp.maximum(0.0, 1.0 - jnp.abs(dy - s)) for s in taps}

        r2 = r // pres[j]
        for it in range(3):
            plane = vp_refs[3 * j + it][0]
            att = a * jnp.maximum(0.0, 1.0 - jnp.abs(dt - (it - 1)))
            rep_h = _rep_axis(plane, r2, 0)
            for sy in taps:
                uh = r * (sy + 2) - r // 2
                vh = _rep_axis(rep_h[uh : uh + h], r2, 1)
                ay = att * hy[sy]
                for sx in taps:
                    ux = r * (sx + 2) - r // 2
                    m = jax.lax.dot(
                        (ay * hx[sx]).reshape(h * w, kp), sel,
                        preferred_element_type=jnp.float32, precision=prec,
                    ).reshape(h, w, c)
                    acc = acc + m * vh[:, ux : ux + w, :].astype(jnp.float32)
    out_ref[0] = acc


def _native_pallas_b1_3d(vps, dx, dy, dt, a, ratios, pres=None, *,
                         precise=False, interpret=False):
    """vps: per level [T+2, (Hv+4+eh)*pre, (Wv+4+ew)*pre, C] (t zero-padded
    by 1, spatially pre-repeated by pres[j]); dx/dy/dt/a [J, T, H, W, nh*P]
    -> out [T, H, W, C] float32."""
    jl, t = len(vps), dx.shape[1]
    h, w, kp = dx.shape[2], dx.shape[3], dx.shape[4]
    c = vps[0].shape[-1]

    vp_specs, vp_args = [], []
    for v in vps:
        for st in range(3):
            vp_specs.append(pl.BlockSpec(
                (1,) + v.shape[1:],
                functools.partial(lambda ti, *, st_: (ti + st_, 0, 0, 0),
                                  st_=st),
            ))
            vp_args.append(v)
    comp_spec = pl.BlockSpec((jl, 1, h, w, kp), lambda ti: (0, ti, 0, 0, 0))
    sel = jnp.asarray(_selector(8, kp // 8, c // 8))

    return pl.pallas_call(
        functools.partial(_native_kernel_3d, ratios=tuple(ratios),
                          pres=tuple(pres) if pres else None,
                          precise=precise),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((kp, c), lambda ti: (0, 0)),
            comp_spec, comp_spec, comp_spec, comp_spec,
            *vp_specs,
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda ti: (ti, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, h, w, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(sel, dx, dy, dt, a, *vp_args)


def _native_pallas_b1_2d(vps, dx, dy, a, ratios, pres=None, *,
                         precise=False, interpret=False):
    """vps: per level [T, (Hv+4+eh)*pre, (Wv+4+ew)*pre, C] (zero-padded
    then spatially pre-repeated by pres[j] — see windowed_blend_native for
    the extra-pad math); dx/dy/a [J, T, H, W, nh*P] -> out [T, H, W, C]
    float32."""
    jl, t = len(vps), dx.shape[1]
    h, w, kp = dx.shape[2], dx.shape[3], dx.shape[4]
    c = vps[0].shape[-1]

    vp_specs = [
        pl.BlockSpec((1,) + v.shape[1:], lambda ti: (ti, 0, 0, 0))
        for v in vps
    ]
    comp_spec = pl.BlockSpec((jl, 1, h, w, kp), lambda ti: (0, ti, 0, 0, 0))
    sel = jnp.asarray(_selector(8, kp // 8, c // 8))

    return pl.pallas_call(
        functools.partial(_native_kernel_2d, ratios=tuple(ratios),
                          pres=tuple(pres) if pres else None,
                          precise=precise),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((kp, c), lambda ti: (0, 0)),
            comp_spec, comp_spec, comp_spec,
            *vp_specs,
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda ti: (ti, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, h, w, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(sel, dx, dy, a, *vps)


def _native_vmem_mb(h, w, c, kp, vshapes, inkernel_ratios,
                    vol_bytes=2, comp_bytes=2) -> float:
    """Double-buffered VMEM working set of the native kernel in MB,
    including the repeated-plane temporaries.  ``vshapes`` are the
    PRE-repeated padded plane sizes; ``inkernel_ratios`` the residual
    in-kernel repeat factors (full ratio / pre-repeat)."""
    vp = sum((hv) * (wv) * c * vol_bytes for hv, wv in vshapes)
    rep = max(
        (hv * r) * wv * c * 4 + h * (wv * r) * c * 4
        for (hv, wv), r in zip(vshapes, inkernel_ratios)
    )
    comps = 3 * len(vshapes) * h * w * kp * comp_bytes
    out = h * w * c * 4
    return (2 * (vp + comps) + 2 * out + rep + h * w * c * 4) / 2 ** 20


def windowed_blend_native(
    values: Sequence[jnp.ndarray],   # per level [B, T, Hv, Wv, C] NATIVE res
    dx: jnp.ndarray,                 # [B, J, T, H, W, nh*P] native-px offsets
    dy: jnp.ndarray,
    a: jnp.ndarray,
    nh: int = 8,
    use_pallas: bool = True,
    precise: bool = False,
    interpret: bool = False,
    dt: jnp.ndarray | None = None,   # temporal offsets -> 3d window (XLA)
) -> jnp.ndarray:
    """cross_level='native' blend for one query grid: every level sampled
    at its own resolution at the query's align_corners=False-mapped
    position (fast_deform.native_blend_level semantics,
    |offset| < 1 native pixel/frame).

    Levels coarser than or equal to the query grid (integer dyadic ratio)
    take the Pallas kernel; finer levels (their contribution is only a
    query-grid-sized output) take the XLA oracle.  Mosaic compile time
    explodes with the IN-KERNEL repeat ratio (kernel-only, measured on
    TPU at the AVA shapes: 2d r<=4 compiles in 18 s, r<=8 in 275 s; 3d
    r<=2 in ~2 min, r<=8 blew past 27 min), so coarse levels are
    spatially PRE-repeated in XLA (nearest repeat composes exactly) down
    to an in-kernel residual of <= _NATIVE_INKERNEL_CAP — every dyadic
    coarser level takes the kernel regardless of ratio.
    Backward is the XLA oracle's VJP via custom_vjp.
    """
    from .fast_deform import native_blend_level

    h, w = dx.shape[3], dx.shape[4]
    c = values[0].shape[-1]

    kernel_levels, xla_levels = [], []
    for j, v in enumerate(values):
        hv, wv = v.shape[2], v.shape[3]
        ok = (
            h % hv == 0 and w % wv == 0 and h // hv == w // wv
            and (h // hv) & (h // hv - 1) == 0
        )
        (kernel_levels if ok else xla_levels).append(j)

    out = None
    ph, pw = (-h) % 8, (-w) % 8
    t_reads = 1 if dt is None else 3
    kl_ratios = [h // values[j].shape[2] for j in kernel_levels]
    kl_pres = [max(1, r // _NATIVE_INKERNEL_CAP) for r in kl_ratios]
    pallas_ok = (
        use_pallas and nh == 8 and c % 256 == 0 and kernel_levels
        and _native_vmem_mb(
            h + ph, w + pw, c, dx.shape[-1],
            [((values[j].shape[2] + 4) * pre, (values[j].shape[3] + 4) * pre)
             for j, pre in zip(kernel_levels, kl_pres)],
            [r // pre for r, pre in zip(kl_ratios, kl_pres)],
            t_reads * values[0].dtype.itemsize, dx.dtype.itemsize,
        ) <= 96.0
    )
    if pallas_ok:
        kl = kernel_levels
        vols = tuple(values[j] for j in kl)
        if dt is None:
            out = _native_blend2d_pallas_entry(
                vols, dx[:, kl], dy[:, kl], a[:, kl],
                (h, w), precise, interpret,
            )
        else:
            out = _native_blend3d_pallas_entry(
                vols, dx[:, kl], dy[:, kl], dt[:, kl], a[:, kl],
                (h, w), precise, interpret,
            )
    else:
        xla_levels = list(range(len(values)))

    for j in xla_levels:
        contrib = native_blend_level(
            values[j], dx[:, j], dy[:, j], a[:, j], nh,
            dt=None if dt is None else dt[:, j],
        )
        out = contrib if out is None else out + contrib
    return out


# Mosaic compile time explodes with the IN-KERNEL nearest-repeat unroll
# ratio (measured: 18 s at r<=4 vs 275 s at r=8 on the 2d AVA grid-0
# shape; 3d worse).  Levels with a larger query/native ratio are
# pre-repeated in XLA down to this residual factor — nearest repeat
# composes exactly, and the pre-repeated coarse planes are tiny
# (level 3 at AVA grid 0: 8x10 -> 32x40, ~5 MB bf16 per layer).
_NATIVE_INKERNEL_CAP = 1


def _pre_repeat_spatial(v, r1, h_axis, w_axis):
    if r1 == 1:
        return v
    return jnp.repeat(jnp.repeat(v, r1, axis=h_axis), r1, axis=w_axis)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _native_blend2d_pallas_entry(vols, dx, dy, a, hw, precise, interpret):
    h, w = hw
    ph, pw = (-h) % 8, (-w) % 8
    ratios = tuple(h // v.shape[2] for v in vols)
    pres = tuple(max(1, r // _NATIVE_INKERNEL_CAP) for r in ratios)
    vps = []
    for v, r, pre in zip(vols, ratios, pres):
        # pad 2 cells each side for the 4-tap window, plus enough extra on
        # the high side that the repeated plane covers the 8-padded query
        # grid: r*(Nv+4+e) >= (N+pad) + 4r - r//2 with r*Nv == N
        eh = max(0, -(-(ph - r // 2) // r))
        ew = max(0, -(-(pw - r // 2) // r))
        vp = jnp.pad(v, [(0, 0), (0, 0), (2, 2 + eh), (2, 2 + ew), (0, 0)])
        vps.append(_pre_repeat_spatial(vp, pre, 2, 3))
    comps = (dx, dy, a)
    if ph or pw:
        grid_pad = [(0, 0), (0, 0), (0, 0), (0, ph), (0, pw), (0, 0)]
        comps = tuple(jnp.pad(x, grid_pad) for x in comps)
    # ONE pallas_call PER LEVEL, summed in XLA: the combined 4-level
    # kernel exceeds Mosaic's scheduling budget at the AVA grid-0 shape
    # (compile helper dies; 3 levels compile in 25 s, each single level
    # in ~10 s) and the extra fp32 partial-sum traffic is ~0.1 ms/layer
    out = None
    for j in range(len(vps)):
        fn = functools.partial(
            _native_pallas_b1_2d, ratios=ratios[j : j + 1],
            pres=pres[j : j + 1], precise=precise, interpret=interpret,
        )
        o = jax.vmap(lambda vs, dxx, dyy, aa: fn(vs, dxx, dyy, aa))(
            (vps[j],), *(x[:, j : j + 1] for x in comps)
        )
        out = o if out is None else out + o
    if ph or pw:
        out = out[:, :, :h, :w]
    return out


def _native_entry_fwd(vols, dx, dy, a, hw, precise, interpret):
    return (
        _native_blend2d_pallas_entry(vols, dx, dy, a, hw, precise, interpret),
        (vols, dx, dy, a),
    )


def _native_entry_bwd(hw, precise, interpret, res, g):
    from .fast_deform import native_blend_level

    vols, dx, dy, a = res

    def f(vols_, dx_, dy_, a_):
        return sum(
            native_blend_level(vols_[j], dx_[:, j], dy_[:, j], a_[:, j], 8)
            for j in range(len(vols_))
        )

    _, vjp = jax.vjp(f, vols, dx, dy, a)
    return vjp(g.astype(jnp.float32))


_native_blend2d_pallas_entry.defvjp(_native_entry_fwd, _native_entry_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _native_blend3d_pallas_entry(vols, dx, dy, dt, a, hw, precise,
                                 interpret):
    h, w = hw
    ph, pw = (-h) % 8, (-w) % 8
    ratios = tuple(h // v.shape[2] for v in vols)
    pres = tuple(max(1, r // _NATIVE_INKERNEL_CAP) for r in ratios)
    vps = []
    for v, r, pre in zip(vols, ratios, pres):
        eh = max(0, -(-(ph - r // 2) // r))
        ew = max(0, -(-(pw - r // 2) // r))
        vp = jnp.pad(v, [(0, 0), (1, 1), (2, 2 + eh), (2, 2 + ew), (0, 0)])
        vps.append(_pre_repeat_spatial(vp, pre, 2, 3))
    comps = (dx, dy, dt, a)
    if ph or pw:
        grid_pad = [(0, 0), (0, 0), (0, 0), (0, ph), (0, pw), (0, 0)]
        comps = tuple(jnp.pad(x, grid_pad) for x in comps)
    # per-level pallas_calls summed in XLA (see the 2d entry's rationale)
    out = None
    for j in range(len(vps)):
        fn = functools.partial(
            _native_pallas_b1_3d, ratios=ratios[j : j + 1],
            pres=pres[j : j + 1], precise=precise, interpret=interpret,
        )
        o = jax.vmap(
            lambda vs, dxx, dyy, dtt, aa: fn(vs, dxx, dyy, dtt, aa)
        )((vps[j],), *(x[:, j : j + 1] for x in comps))
        out = o if out is None else out + o
    if ph or pw:
        out = out[:, :, :h, :w]
    return out


def _native3_fwd(vols, dx, dy, dt, a, hw, precise, interpret):
    return (
        _native_blend3d_pallas_entry(vols, dx, dy, dt, a, hw, precise,
                                     interpret),
        (vols, dx, dy, dt, a),
    )


def _native3_bwd(hw, precise, interpret, res, g):
    from .fast_deform import native_blend_level

    vols, dx, dy, dt, a = res

    def f(vols_, dx_, dy_, dt_, a_):
        return sum(
            native_blend_level(vols_[j], dx_[:, j], dy_[:, j], a_[:, j], 8,
                               dt=dt_[:, j])
            for j in range(len(vols_))
        )

    _, vjp = jax.vjp(f, vols, dx, dy, dt, a)
    return vjp(g.astype(jnp.float32))


_native_blend3d_pallas_entry.defvjp(_native3_fwd, _native3_bwd)


def _blend_xla_vol_2d(vol, dx, dy, a, nh: int = 8):
    """XLA oracle for the spatial-only window on the unpadded stacked
    volume [B, J, T, H, W, C]; comps [B, J, T, H, W, nh*P]."""
    b, jl, t, h, w, c = vol.shape
    d = c // nh
    vp_pad = jnp.pad(vol, [(0, 0), (0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])
    out = jnp.zeros((b, t, h, w, nh, d), jnp.float32)
    for j in range(jl):
        vj = vp_pad[:, j].reshape(b, t, h + 2, w + 2, nh, d).astype(jnp.float32)
        dxj = dx[:, j].astype(jnp.float32)
        dyj = dy[:, j].astype(jnp.float32)
        aj = a[:, j].astype(jnp.float32)
        for sy in range(3):
            hy = jnp.maximum(0.0, 1.0 - jnp.abs(dyj - (sy - 1)))
            ay = aj * hy
            for sx in range(3):
                hx = jnp.maximum(0.0, 1.0 - jnp.abs(dxj - (sx - 1)))
                m = (ay * hx).reshape(b, t, h, w, nh, -1).sum(-1)
                out = out + m[..., None] * vj[
                    :, :, sy : sy + h, sx : sx + w
                ]
    return out.reshape(b, t, h, w, c)


def _bwd2d_dcomps_kernel(r_ref, e_ref, g_ref, dx_ref, dy_ref, a_ref, vp_ref,
                         da_ref, ddx_ref, ddy_ref, *, precise: bool):
    """2D gradients wrt (dx, dy, a).  g and comps centred, values as the
    forward's single padded plane.  r = per-head <G, vp_s> reduces C -> nh;
    e expands nh -> nh*P."""
    prec = jax.lax.Precision.HIGHEST if precise else None
    h, w, kp = dx_ref.shape[2], dx_ref.shape[3], dx_ref.shape[4]
    g = g_ref[0].astype(jnp.float32)                  # [H, W, C]
    dx = dx_ref[0, 0].astype(jnp.float32)
    dy = dy_ref[0, 0].astype(jnp.float32)
    a = a_ref[0, 0].astype(jnp.float32)
    rmat = r_ref[...]
    emat = e_ref[...]

    def hat(u):
        return jnp.maximum(0.0, 1.0 - jnp.abs(u))

    def dhat(u):
        # XLA subgradient conventions: abs'(0) = +1, max splits |u|==1 ties
        au = jnp.abs(u)
        inner = jnp.where(u >= 0.0, -1.0, 1.0)
        return jnp.where(
            au < 1.0, inner, jnp.where(au == 1.0, 0.5 * inner, 0.0)
        )

    hx = [hat(dx - (k - 1)) for k in range(3)]
    hy = [hat(dy - (k - 1)) for k in range(3)]
    dhx = [dhat(dx - (k - 1)) for k in range(3)]
    dhy = [dhat(dy - (k - 1)) for k in range(3)]

    da = jnp.zeros((h, w, kp), jnp.float32)
    ddx = jnp.zeros((h, w, kp), jnp.float32)
    ddy = jnp.zeros((h, w, kp), jnp.float32)
    vplane = vp_ref[0, 0]                              # [H+2, W+2, C]
    for ih in range(3):
        vh = vplane[ih : ih + h]
        for ix in range(3):
            gv = g * vh[:, ix : ix + w, :].astype(jnp.float32)
            r = jax.lax.dot(
                gv.reshape(h * w, -1), rmat,
                preferred_element_type=jnp.float32, precision=prec,
            )
            rk = jax.lax.dot(
                r, emat, preferred_element_type=jnp.float32, precision=prec,
            ).reshape(h, w, kp)
            da = da + rk * (hx[ix] * hy[ih])
            ddx = ddx + rk * (a * hy[ih]) * dhx[ix]
            ddy = ddy + rk * (a * hx[ix]) * dhy[ih]
    da_ref[0, 0] = da.astype(da_ref.dtype)
    ddx_ref[0, 0] = ddx.astype(ddx_ref.dtype)
    ddy_ref[0, 0] = ddy.astype(ddy_ref.dtype)


def _bwd2d_dvol_kernel(s_ref, gp_ref, dxp_ref, dyp_ref, ap_ref, out_ref,
                       *, precise: bool):
    """2D gradient wrt the value volume — reversed stencil: cotangent G and
    comps arrive as padded planes, dvol is centred.
    dvol[q] = sum_d m(q + d, s = -d) * G(q + d)."""
    prec = jax.lax.Precision.HIGHEST if precise else None
    h, w = out_ref.shape[2], out_ref.shape[3]
    kp = dxp_ref.shape[-1]
    c = out_ref.shape[-1]
    sel = s_ref[...]

    gp = gp_ref[0]                                     # [H+2, W+2, C]
    dxp = dxp_ref[0, 0].astype(jnp.float32)            # [H+2, W+2, kp]
    dyp = dyp_ref[0, 0].astype(jnp.float32)
    ap = ap_ref[0, 0].astype(jnp.float32)

    acc = jnp.zeros((h, w, c), jnp.float32)
    for ih in range(3):
        sy = 1 - ih
        gs = gp[ih : ih + h]                           # [H, W+2, C]
        dys = dyp[ih : ih + h]
        dxs = dxp[ih : ih + h]
        aps = ap[ih : ih + h]
        hy = aps * jnp.maximum(0.0, 1.0 - jnp.abs(dys - sy))
        for ix in range(3):
            sx = 1 - ix
            hat = hy[:, ix : ix + w, :] * jnp.maximum(
                0.0, 1.0 - jnp.abs(dxs[:, ix : ix + w, :] - sx)
            )
            m = jax.lax.dot(
                hat.reshape(h * w, kp), sel,
                preferred_element_type=jnp.float32, precision=prec,
            ).reshape(h, w, c)
            acc = acc + m * gs[:, ix : ix + w, :].astype(jnp.float32)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _bwd2d_b1(gp, vp, dxp, dyp, ap, dxc, dyc, ac, g_center,
              vol_dtype, comp_dtype, *, precise=False, interpret=False):
    """Single-batch 2D backward: returns (dvol, ddx, ddy, da).

    gp    [T, H+2, W+2, C]     padded cotangent
    vp    [J, T, H+2, W+2, C]  padded values (forward's input)
    d*p/ap [J, T, H+2, W+2, kp] padded comps
    d*c/ac [J, T, H, W, kp]     centred comps
    g_center [T, H, W, C]       centred cotangent
    """
    jl, t, hp, wp, c = vp.shape
    h, w = hp - 2, wp - 2
    kp = dxc.shape[-1]
    grid = (t, jl)
    params = pltpu.CompilerParams(
        vmem_limit_bytes=110 * 2 ** 20,
        dimension_semantics=("arbitrary", "arbitrary"),
    )

    sel = jnp.asarray(_selector(8, kp // 8, c // 8))
    d_ = c // 8
    rmat = jnp.zeros((c, 8), jnp.float32).at[
        jnp.arange(c), jnp.arange(c) // d_].set(1.0)
    emat = jnp.zeros((8, kp), jnp.float32).at[
        jnp.arange(kp) // (kp // 8), jnp.arange(kp)].set(1.0)

    gp_spec = pl.BlockSpec((1, hp, wp, c), lambda ti, j: (ti, 0, 0, 0))
    padded_j = lambda lanes: pl.BlockSpec(
        (1, 1, hp, wp, lanes), lambda ti, j: (j, ti, 0, 0, 0)
    )
    comp_c_spec = pl.BlockSpec(
        (1, 1, h, w, kp), lambda ti, j: (j, ti, 0, 0, 0)
    )
    gc_spec = pl.BlockSpec((1, h, w, c), lambda ti, j: (ti, 0, 0, 0))
    out_j = lambda lanes: pl.BlockSpec(
        (1, 1, h, w, lanes), lambda ti, j: (j, ti, 0, 0, 0)
    )

    dvol = pl.pallas_call(
        functools.partial(_bwd2d_dvol_kernel, precise=precise),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kp, c), lambda ti, j: (0, 0)),
            gp_spec, padded_j(kp), padded_j(kp), padded_j(kp),
        ],
        out_specs=out_j(c),
        out_shape=jax.ShapeDtypeStruct((jl, t, h, w, c), vol_dtype),
        compiler_params=params,
        interpret=interpret,
    )(sel, gp, dxp, dyp, ap)

    da, ddx, ddy = pl.pallas_call(
        functools.partial(_bwd2d_dcomps_kernel, precise=precise),
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, 8), lambda ti, j: (0, 0)),
            pl.BlockSpec((8, kp), lambda ti, j: (0, 0)),
            gc_spec,
            comp_c_spec, comp_c_spec, comp_c_spec,
            padded_j(c),
        ],
        out_specs=[out_j(kp)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((jl, t, h, w, kp), comp_dtype)
        ] * 3,
        compiler_params=params,
        interpret=interpret,
    )(rmat, emat, g_center, dxc, dyc, ac, vp)
    return dvol, ddx, ddy, da


def _pad_hw1(x):
    pads = [(0, 0)] * x.ndim
    pads[-3] = (1, 1)
    pads[-2] = (1, 1)
    return jnp.pad(x, pads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _blend2d(vol, dx, dy, a, precise=False, interpret=False):
    """vol [B, J, T, H, W, C] (unpadded) -> out [B, T, H, W, C] fp32.
    Spatial-only window; forward AND backward run Pallas kernels (the
    XLA-oracle path is the fallback when the plane exceeds VMEM)."""
    b, jl, t, h, w, c = vol.shape
    kp = dx.shape[-1]
    if _v2d_vmem_mb(h, w, c, kp, vol.dtype.itemsize,
                    dx.dtype.itemsize) <= 96.0:
        vp = jnp.pad(vol, [(0, 0), (0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])
        return jax.vmap(
            functools.partial(_blend_pallas_b1_v2_2d, precise=precise,
                              interpret=interpret)
        )(vp, dx, dy, a)
    return _blend_xla_vol_2d(vol, dx, dy, a)


def _blend2d_fwd(vol, dx, dy, a, precise, interpret):
    return _blend2d(vol, dx, dy, a, precise, interpret), (vol, dx, dy, a)


def _blend2d_bwd(precise, interpret, res, g):
    vol, dx, dy, a = res
    b, jl, t, h, w, c = vol.shape
    kp = dx.shape[-1]
    if _v2d_vmem_mb(h, w, c, kp, vol.dtype.itemsize,
                    dx.dtype.itemsize) > 96.0:
        _, vjp = jax.vjp(_blend_xla_vol_2d, vol, dx, dy, a)
        return vjp(g.astype(jnp.float32))
    return jax.vmap(
        functools.partial(
            _bwd2d_b1, vol_dtype=vol.dtype, comp_dtype=dx.dtype,
            precise=precise, interpret=interpret,
        )
    )(_pad_hw1(g), _pad_hw1(vol), _pad_hw1(dx), _pad_hw1(dy), _pad_hw1(a),
      dx, dy, a, g)


_blend2d.defvjp(_blend2d_fwd, _blend2d_bwd)


def _pick_ht(t: int, h: int, w: int, c: int, budget_mb: float = 24.0) -> int:
    """Largest divisor of h whose VMEM working set fits the budget."""
    for ht_ in (h, h // 2, h // 4, h // 8, 8):
        if ht_ <= 0 or h % ht_:
            continue
        # double-buffered: 2x on every input/output block
        mb = 2 * (9 * ht_ * (w + 2) * c * 2 + ht_ * w * c * 4
                  + 4 * ht_ * w * 64 * 2) / 2 ** 20
        if mb <= budget_mb:
            return ht_
    return 8


def _blend_pallas_b1(vps, dx, dy, dt, a, *, precise=False, interpret=False):
    """vps [3, J, T+2, H, W+2, C] (h-copies stacked); dx/dy/dt/a
    [J, T, H, W, nh*P] -> out [T, H, W, C] float32."""
    _, jl, tp2, h, wp, c = vps.shape
    t = tp2 - 2
    w = wp - 2
    kp = dx.shape[-1]
    ht_ = _pick_ht(t, h, w, c)
    grid = (t, h // ht_, jl)

    vp_specs = [
        pl.BlockSpec(
            (1, 1, 1, ht_, wp, c),
            functools.partial(
                lambda ti, hb, j, *, k, dt_: (k, j, ti + dt_, hb, 0, 0),
                k=k, dt_=dt_,
            ),
        )
        for dt_ in range(3)
        for k in range(3)
    ]
    comp_spec = pl.BlockSpec(
        (1, 1, ht_, w, kp), lambda ti, hb, j: (j, ti, hb, 0, 0)
    )
    sel = jnp.asarray(_selector(8, kp // 8, c // 8))

    return pl.pallas_call(
        functools.partial(_blend_kernel, precise=precise),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kp, c), lambda ti, hb, j: (0, 0)),
            comp_spec, comp_spec, comp_spec, comp_spec,
            *vp_specs,
        ],
        out_specs=pl.BlockSpec(
            (1, ht_, w, c), lambda ti, hb, j: (ti, hb, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((t, h, w, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # default scoped-vmem limit is 16 MB; v5e has far more physical
            # VMEM and bigger blocks amortize DMA, so raise the ceiling
            vmem_limit_bytes=100 * 2 ** 20,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(sel, dx, dy, dt, a, *([vps] * 9))


def _blend_xla(vp_pad, dx, dy, dt, a, nh: int = 8):
    """Reference math on the kernel's stacked inputs (used for the backward
    pass and as the numerical oracle).  vp_pad [B, J, T+2, H+2, W+2, C];
    components [B, J, T, H, W, nh*P]."""
    b, jl, _, hp2, wp2, c = vp_pad.shape
    t, h, w = dx.shape[2], dx.shape[3], dx.shape[4]
    d = c // nh
    out = jnp.zeros((b, t, h, w, nh, d), jnp.float32)
    for j in range(jl):
        vj = vp_pad[:, j].reshape(b, t + 2, hp2, wp2, nh, d).astype(jnp.float32)
        dxj = dx[:, j].astype(jnp.float32)
        dyj = dy[:, j].astype(jnp.float32)
        dtj = dt[:, j].astype(jnp.float32)
        aj = a[:, j].astype(jnp.float32)
        for st in range(3):
            htt = jnp.maximum(0.0, 1.0 - jnp.abs(dtj - (st - 1)))
            for sy in range(3):
                hy = jnp.maximum(0.0, 1.0 - jnp.abs(dyj - (sy - 1)))
                aty = aj * htt * hy
                for sx in range(3):
                    hx = jnp.maximum(0.0, 1.0 - jnp.abs(dxj - (sx - 1)))
                    m = (aty * hx).reshape(b, t, h, w, nh, -1).sum(-1)
                    out = out + m[..., None] * vj[
                        :, st : st + t, sy : sy + h, sx : sx + w
                    ]
    return out.reshape(b, t, h, w, c)


def _blend_xla_vol(vol, dx, dy, dt, a, nh: int = 8):
    """XLA oracle on the unpadded stacked volume [B, J, T, H, W, C]."""
    vp_pad = jnp.pad(vol, [(0, 0), (0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    return _blend_xla(vp_pad, dx, dy, dt, a, nh)


def _halo_stack(x, axis_t, axis_h):
    """Pad x by 1 on (t, h, w) spatial axes and stack the three h-offset
    copies on a new leading axis (the kernel's halo decomposition)."""
    pads = [(0, 0)] * x.ndim
    for ax in (axis_t, axis_t + 1, axis_t + 2):
        pads[ax] = (1, 1)
    xp = jnp.pad(x, pads)
    h = x.shape[axis_h]
    sl = [slice(None)] * xp.ndim
    copies = []
    for k in range(3):
        sl[axis_h] = slice(k, k + h)
        copies.append(xp[tuple(sl)])
    return jnp.stack(copies, axis=0)


def _bwd_dcomps_kernel(r_ref, e_ref, g_ref, dx_ref, dy_ref, dt_ref, a_ref,
                       *refs, precise: bool):
    """Gradients wrt (dx, dy, dt, a) — forward halo structure: vp haloed,
    cotangent G and comps centred.  r = per-head <G, vp_s> reduces C -> nh;
    e expands nh -> nh*P."""
    vp_refs = refs[:-4]
    da_ref, ddx_ref, ddy_ref, ddt_ref = refs[-4:]
    prec = jax.lax.Precision.HIGHEST if precise else None

    ht_, w, kp = dx_ref.shape[2], dx_ref.shape[3], dx_ref.shape[4]
    g = g_ref[0].astype(jnp.float32)                  # [Ht, W, C]
    dx = dx_ref[0, 0].astype(jnp.float32)
    dy = dy_ref[0, 0].astype(jnp.float32)
    dt = dt_ref[0, 0].astype(jnp.float32)
    a = a_ref[0, 0].astype(jnp.float32)
    rmat = r_ref[...]
    emat = e_ref[...]

    def hat(u):
        return jnp.maximum(0.0, 1.0 - jnp.abs(u))

    def dhat(u):
        # matches XLA's subgradient conventions exactly: abs'(0) = +1
        # (lax.abs uses select(u >= 0)) and max splits the |u| == 1 tie in
        # half — both kinks are reachable when tanh saturates offsets
        au = jnp.abs(u)
        inner = jnp.where(u >= 0.0, -1.0, 1.0)
        return jnp.where(
            au < 1.0, inner, jnp.where(au == 1.0, 0.5 * inner, 0.0)
        )

    hx = [hat(dx - (k - 1)) for k in range(3)]
    hy = [hat(dy - (k - 1)) for k in range(3)]
    htt = [hat(dt - (k - 1)) for k in range(3)]
    dhx = [dhat(dx - (k - 1)) for k in range(3)]
    dhy = [dhat(dy - (k - 1)) for k in range(3)]
    dhtt = [dhat(dt - (k - 1)) for k in range(3)]

    da = jnp.zeros((ht_, w, kp), jnp.float32)
    ddx = jnp.zeros((ht_, w, kp), jnp.float32)
    ddy = jnp.zeros((ht_, w, kp), jnp.float32)
    ddt = jnp.zeros((ht_, w, kp), jnp.float32)
    for it in range(3):
        for ih in range(3):
            vp = vp_refs[it * 3 + ih][0, 0, 0]
            for ix in range(3):
                gv = (g * vp[:, ix : ix + w, :].astype(jnp.float32))
                r = jax.lax.dot(
                    gv.reshape(ht_ * w, -1), rmat,
                    preferred_element_type=jnp.float32, precision=prec,
                )
                rk = jax.lax.dot(
                    r, emat, preferred_element_type=jnp.float32,
                    precision=prec,
                ).reshape(ht_, w, kp)
                da = da + rk * (hx[ix] * hy[ih] * htt[it])
                ddx = ddx + rk * (a * hy[ih] * htt[it]) * dhx[ix]
                ddy = ddy + rk * (a * hx[ix] * htt[it]) * dhy[ih]
                ddt = ddt + rk * (a * hx[ix] * hy[ih]) * dhtt[it]
    da_ref[0, 0] = da.astype(da_ref.dtype)
    ddx_ref[0, 0] = ddx.astype(ddx_ref.dtype)
    ddy_ref[0, 0] = ddy.astype(ddy_ref.dtype)
    ddt_ref[0, 0] = ddt.astype(ddt_ref.dtype)


def _bwd_dvol_kernel(s_ref, *refs, precise: bool):
    """Gradient wrt the value volume — reversed stencil: the cotangent G
    and the comps are haloed, output dvol is centred.

    dvol[q] = sum_d m(q + d, s = -d) * G(q + d): slice index k on an input
    selects position offset d = k - 1, and the hat shift argument is then
    s = -(k - 1) = 1 - k.
    """
    g_refs = refs[:9]
    dx_refs = refs[9:18]
    dy_refs = refs[18:27]
    dt_refs = refs[27:36]
    a_refs = refs[36:45]
    out_ref = refs[45]
    prec = jax.lax.Precision.HIGHEST if precise else None

    ht_, w = out_ref.shape[2], out_ref.shape[3]
    kp = dx_refs[0].shape[-1]
    c = out_ref.shape[-1]
    sel = s_ref[...]

    acc = jnp.zeros((ht_, w, c), jnp.float32)
    for it in range(3):
        st = 1 - it
        for ih in range(3):
            sy = 1 - ih
            i9 = it * 3 + ih
            gs = g_refs[i9][0, 0]                   # [Ht, W+2, C]
            dxs = dx_refs[i9][0, 0, 0]              # [Ht, W+2, kp]
            dys = dy_refs[i9][0, 0, 0]
            dts = dt_refs[i9][0, 0, 0]
            as_ = a_refs[i9][0, 0, 0]
            hty = (
                as_.astype(jnp.float32)
                * jnp.maximum(0.0, 1.0 - jnp.abs(dts.astype(jnp.float32) - st))
                * jnp.maximum(0.0, 1.0 - jnp.abs(dys.astype(jnp.float32) - sy))
            )
            for ix in range(3):
                sx = 1 - ix
                hat = hty[:, ix : ix + w, :] * jnp.maximum(
                    0.0,
                    1.0 - jnp.abs(
                        dxs[:, ix : ix + w, :].astype(jnp.float32) - sx
                    ),
                )
                m = jax.lax.dot(
                    hat.reshape(ht_ * w, kp), sel,
                    preferred_element_type=jnp.float32, precision=prec,
                ).reshape(ht_, w, c)
                acc = acc + m * gs[:, ix : ix + w, :].astype(jnp.float32)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def _bwd_b1(gvs, vps, dxh, dyh, dth, ah, dxc, dyc, dtc, ac, g_center,
            vol_dtype, comp_dtype, *, precise=False, interpret=False):
    """Single-batch backward: returns (dvol, ddx, ddy, ddt, da).

    gvs   [3, T+2, H, W+2, C]   haloed cotangent
    vps   [3, J, T+2, H, W+2, C] haloed values (forward's input)
    d*h/ah [3, J, T+2, H, W+2, kp] haloed comps
    d*c/ac [J, T, H, W, kp]      centred comps
    g_center [T, H, W, C]        centred cotangent
    """
    _, jl, tp2, h, wp, c = vps.shape
    t, w = tp2 - 2, wp - 2
    kp = dxc.shape[-1]
    ht_ = _pick_ht(t, h, w, c)
    grid = (t, h // ht_, jl)
    params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 2 ** 20,
        dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
    )

    halo6 = [
        pl.BlockSpec(
            (1, 1, 1, ht_, wp, None),
            functools.partial(
                lambda ti, hb, j, *, k, dt_: (k, j, ti + dt_, hb, 0, 0),
                k=k, dt_=dt_,
            ),
        )
        for dt_ in range(3)
        for k in range(3)
    ]

    def sized(specs, lanes):
        return [
            pl.BlockSpec(sp.block_shape[:-1] + (lanes,), sp.index_map)
            for sp in specs
        ]

    ghalo = [
        pl.BlockSpec(
            (1, 1, ht_, wp, c),
            functools.partial(
                lambda ti, hb, j, *, k, dt_: (k, ti + dt_, hb, 0, 0),
                k=k, dt_=dt_,
            ),
        )
        for dt_ in range(3)
        for k in range(3)
    ]
    comp_c_spec = pl.BlockSpec(
        (1, 1, ht_, w, kp), lambda ti, hb, j: (j, ti, hb, 0, 0)
    )
    gc_spec = pl.BlockSpec((1, ht_, w, c), lambda ti, hb, j: (ti, hb, 0, 0))
    out_j_spec = lambda lanes: pl.BlockSpec(
        (1, 1, ht_, w, lanes), lambda ti, hb, j: (j, ti, hb, 0, 0)
    )

    sel = jnp.asarray(_selector(8, kp // 8, c // 8))
    # rmat [c, nh]: R[ch, h] = 1 iff ch // d == h (per-head C reduction)
    d_ = c // 8
    rmat = jnp.zeros((c, 8), jnp.float32).at[
        jnp.arange(c), jnp.arange(c) // d_].set(1.0)
    emat = jnp.zeros((8, kp), jnp.float32).at[
        jnp.arange(kp) // (kp // 8), jnp.arange(kp)].set(1.0)

    dvol = pl.pallas_call(
        functools.partial(_bwd_dvol_kernel, precise=precise),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kp, c), lambda ti, hb, j: (0, 0)),
            *ghalo,
            *sized(halo6, kp), *sized(halo6, kp),
            *sized(halo6, kp), *sized(halo6, kp),
        ],
        out_specs=out_j_spec(c),
        out_shape=jax.ShapeDtypeStruct((jl, t, h, w, c), vol_dtype),
        compiler_params=params,
        interpret=interpret,
    )(sel, *([gvs] * 9), *([dxh] * 9), *([dyh] * 9), *([dth] * 9),
      *([ah] * 9))

    da, ddx, ddy, ddt = pl.pallas_call(
        functools.partial(_bwd_dcomps_kernel, precise=precise),
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, 8), lambda ti, hb, j: (0, 0)),
            pl.BlockSpec((8, kp), lambda ti, hb, j: (0, 0)),
            gc_spec,
            comp_c_spec, comp_c_spec, comp_c_spec, comp_c_spec,
            *sized(halo6, c),
        ],
        out_specs=[out_j_spec(kp)] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((jl, t, h, w, kp), comp_dtype)
        ] * 4,
        compiler_params=params,
        interpret=interpret,
    )(rmat, emat, g_center, dxc, dyc, dtc, ac, *([vps] * 9))
    return dvol, ddx, ddy, ddt, da


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _blend(vol, dx, dy, dt, a, precise=False, interpret=False):
    """vol [B, J, T, H, W, C] (unpadded) -> out [B, T, H, W, C] fp32."""
    b, jl, t, h, w, c = vol.shape
    kp = dx.shape[-1]
    if _v2_vmem_mb(t, h, w, c, kp, vol.dtype.itemsize,
                   dx.dtype.itemsize) <= 96.0:
        vp = jnp.pad(
            vol, [(0, 0), (0, 0), (1, 1), (1, 1), (1, 1), (0, 0)]
        )                                        # [B, J, T+2, H+2, W+2, C]
        return jax.vmap(
            functools.partial(_blend_pallas_b1_v2, precise=precise,
                              interpret=interpret)
        )(vp, dx, dy, dt, a)
    vps = _halo_stack(vol, 2, 3)                 # [3, B, J, T+2, H, W+2, C]
    vps = jnp.moveaxis(vps, 0, 1)                # [B, 3, J, ...]
    return jax.vmap(
        functools.partial(_blend_pallas_b1, precise=precise,
                          interpret=interpret)
    )(vps, dx, dy, dt, a)


def _blend_fwd(vol, dx, dy, dt, a, precise, interpret):
    return (_blend(vol, dx, dy, dt, a, precise, interpret),
            (vol, dx, dy, dt, a))


def _blend_bwd(precise, interpret, res, g):
    vol, dx, dy, dt, a = res
    vps = jnp.moveaxis(_halo_stack(vol, 2, 3), 0, 1)
    gvs = jnp.moveaxis(_halo_stack(g, 1, 2), 0, 1)   # [B, 3, T+2, H, W+2, C]
    dxh = jnp.moveaxis(_halo_stack(dx, 2, 3), 0, 1)
    dyh = jnp.moveaxis(_halo_stack(dy, 2, 3), 0, 1)
    dth = jnp.moveaxis(_halo_stack(dt, 2, 3), 0, 1)
    ah = jnp.moveaxis(_halo_stack(a, 2, 3), 0, 1)
    dvol, ddx, ddy, ddt, da = jax.vmap(
        functools.partial(
            _bwd_b1, vol_dtype=vol.dtype, comp_dtype=dx.dtype,
            precise=precise, interpret=interpret,
        )
    )(gvs, vps, dxh, dyh, dth, ah, dx, dy, dt, a, g)
    return dvol, ddx, ddy, ddt, da


_blend.defvjp(_blend_fwd, _blend_bwd)


def windowed_blend_pallas_ok(t: int, h: int, w: int, c: int,
                             radius: int) -> bool:
    """Shapes the kernel supports: R=1, 8-aligned spatial dims, 256 lanes."""
    return radius == 1 and h % 8 == 0 and w % 8 == 0 and c % 256 == 0


def windowed_blend_pallas(
    aligned: Sequence[jnp.ndarray],  # per level [B, T, H, W, nh, D]
    offsets: jnp.ndarray,            # [B, T, H, W, nh, L, P, 3]
    weights: jnp.ndarray,            # [B, T, H, W, nh, L, P]
    radius: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in replacement for windowed_blend_fused on supported shapes.
    Returns [B, T, H, W, nh, D] float32."""
    b, t, h, w, nh, d = aligned[0].shape
    p = weights.shape[-1]
    assert radius == 1, "pallas blend kernel supports radius=1 only"
    vol = jnp.stack(
        [v.reshape(b, t, h, w, nh * d) for v in aligned], axis=1
    )                                               # [B, J, T, H, W, C]
    comps = []
    for comp in range(3):
        x = offsets[..., comp]                      # [B, T, H, W, nh, L, P]
        x = x.transpose(0, 5, 1, 2, 3, 4, 6).reshape(b, -1, t, h, w, nh * p)
        comps.append(x)
    dx, dy, dt = comps
    a = weights.transpose(0, 5, 1, 2, 3, 4, 6).reshape(b, -1, t, h, w, nh * p)
    out = _blend(vol, dx, dy, dt, a, False, interpret)
    return out.reshape(b, t, h, w, nh, d)


def windowed_blend_comps(
    aligned: Sequence[jnp.ndarray],  # per level [B, T, H, W, C] (flat lanes)
    dx: jnp.ndarray,                 # [B, J, T, H, W, nh*P]
    dy: jnp.ndarray,
    dt: jnp.ndarray,
    a: jnp.ndarray,
    nh: int = 8,
    use_pallas: bool = True,
    precise: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Radius-1 blend from pre-sliced per-level components (the fast
    encoder's native layout — contiguous lane slices, no transposes).

    ``aligned`` carries FLAT channels [B, T, H, W, C=nh*D]: a trailing
    (nh, D=32) split would waste 3/4 of every (8, 128) memory tile, 4x-ing
    the HBM traffic of the alignment cascades that feed this op.

    Query grids whose H/W are not multiples of 8 are zero-padded up to the
    next multiple (padded queries carry zero weights and are sliced away),
    so every level can take the kernel.  Returns [B, T, H, W, C] fp32.

    ``dt=None`` selects the spatial-only (x, y) window: 9 shifts instead
    of 27 and the value volume is read once instead of 3x.
    """
    b, t, h, w, c = aligned[0].shape
    vol = jnp.stack(list(aligned), axis=1)
    # The Pallas paths (_selector, the 2d backward's rmat/emat) group
    # weights-to-channels assuming 8 heads; other head counts take XLA.
    if use_pallas and nh == 8 and c % 256 == 0:
        ph, pw = (-h) % 8, (-w) % 8
        comps = (dx, dy, a) if dt is None else (dx, dy, dt, a)
        if ph or pw:
            grid_pad = [(0, 0), (0, 0), (0, 0), (0, ph), (0, pw), (0, 0)]
            vol = jnp.pad(vol, grid_pad)
            comps = tuple(jnp.pad(x, grid_pad) for x in comps)
        if dt is None:
            out = _blend2d(vol, *comps, precise, interpret)
        else:
            out = _blend(vol, *comps, precise, interpret)
        if ph or pw:
            out = out[:, :, :h, :w]
        return out
    if dt is None:
        return _blend_xla_vol_2d(vol, dx, dy, a, nh)
    return _blend_xla_vol(vol, dx, dy, dt, a, nh)


# ---------------------------------------------------------------------------
# Fused-head blend: tanh + per-head softmax + level slicing INSIDE the kernel
# ---------------------------------------------------------------------------

def _head_ind(nl: int, nh: int, p: int) -> np.ndarray:
    """[nl*nh*p, nl*nh*p] same-head indicator for the flat-lane softmax
    denominator; weight-lane layout is (level, head, point) so
    head(k) = (k // p) % nh (fast_encoder.py's flat softmax trick)."""
    k = np.arange(nl * nh * p)
    return ((k[:, None] // p % nh) == (k[None, :] // p % nh)).astype(
        np.float32
    )


def _fused_kernel_2d(s_ref, hi_ref, f_ref, vp_ref, out_ref,
                     *, nl: int, kp: int, radius: float, round_bf16: bool,
                     precise: bool):
    """One t-row of one query grid, ALL value levels in one launch.

    f_ref [1, H, W, 3*nl*kp] is the RAW fused offset+weight head output
    (fast_encoder.py lane layout: offsets (level, comp, head, point) in
    [0, 2*nl*kp), weight logits (level, head, point) after); the kernel
    computes radius*tanh offsets, the max-subtracted per-head softmax
    (denominator = one MXU matmul against the same-head indicator), and
    the 9-tap stride-1 blend over the nl aligned planes — none of the
    tanh/softmax/level-stack intermediates ever touch HBM.
    ``round_bf16`` reproduces the XLA module path's bf16 storage of the
    tanh offsets and softmax weights (FAST_DTYPE=bfloat16 semantics).
    """
    prec = jax.lax.Precision.HIGHEST if precise else None
    h, w, c = out_ref.shape[1], out_ref.shape[2], out_ref.shape[3]
    sel = s_ref[...]
    hind = hi_ref[...]
    f = f_ref[0]                                      # [H, W, 3*nl*kp]
    nw0 = 2 * nl * kp

    off = radius * jnp.tanh(f[..., :nw0].astype(jnp.float32))
    logits = f[..., nw0:].astype(jnp.float32)         # [H, W, nl*kp]
    z = logits - jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(z)
    denom = jax.lax.dot(
        e.reshape(h * w, nl * kp), hind,
        preferred_element_type=jnp.float32, precision=prec,
    ).reshape(h, w, nl * kp)
    a_all = e / denom
    if round_bf16:
        off = off.astype(jnp.bfloat16).astype(jnp.float32)
        a_all = a_all.astype(jnp.bfloat16).astype(jnp.float32)

    acc = jnp.zeros((h, w, c), jnp.float32)
    for j in range(nl):
        dx = off[..., (2 * j) * kp:(2 * j + 1) * kp]
        dy = off[..., (2 * j + 1) * kp:(2 * j + 2) * kp]
        a = a_all[..., j * kp:(j + 1) * kp]
        hx = [jnp.maximum(0.0, 1.0 - jnp.abs(dx - (k - 1))) for k in range(3)]
        hy = [jnp.maximum(0.0, 1.0 - jnp.abs(dy - (k - 1))) for k in range(3)]
        vplane = vp_ref[j, 0]                         # [H+2, W+2, C]
        for ih in range(3):
            vh = vplane[ih : ih + h]                  # [H, W+2, C]
            ay = a * hy[ih]
            for ix in range(3):
                hat = (ay * hx[ix]).reshape(h * w, kp)
                m = jax.lax.dot(
                    hat, sel, preferred_element_type=jnp.float32,
                    precision=prec,
                ).reshape(h, w, c)
                acc = acc + m * vh[:, ix : ix + w, :].astype(jnp.float32)
    out_ref[0] = acc


def _fused_pallas_b1_2d(vp, f, *, radius, round_bf16, precise, interpret):
    """vp [J, T, H+2, W+2, C] (h/w zero-padded); f [T, H, W, 3*J*kp]
    -> out [T, H, W, C] fp32."""
    jl, t, hp, wp, c = vp.shape
    h, w = hp - 2, wp - 2
    kp = f.shape[-1] // (3 * jl)
    sel = jnp.asarray(_selector(8, kp // 8, c // 8))
    hind = jnp.asarray(_head_ind(jl, 8, kp // 8))

    return pl.pallas_call(
        functools.partial(
            _fused_kernel_2d, nl=jl, kp=kp, radius=radius,
            round_bf16=round_bf16, precise=precise,
        ),
        grid=(t,),
        in_specs=[
            pl.BlockSpec((kp, c), lambda ti: (0, 0)),
            pl.BlockSpec((jl * kp, jl * kp), lambda ti: (0, 0)),
            pl.BlockSpec((1, h, w, f.shape[-1]), lambda ti: (ti, 0, 0, 0)),
            pl.BlockSpec((jl, 1, hp, wp, c), lambda ti: (0, ti, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda ti: (ti, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t, h, w, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2 ** 20,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(sel, hind, f, vp)


def _fused2d_vmem_mb(h, w, c, nl, kp, vol_bytes=2, f_bytes=2) -> float:
    vp = nl * (h + 2) * (w + 2) * c * vol_bytes
    fb = h * w * 3 * nl * kp * f_bytes
    out = h * w * c * 4
    # + fp32 intermediates held across the level loop (off/e/denom/a)
    scratch = 4 * h * w * 3 * nl * kp * 4
    return (2 * (vp + fb) + 2 * out + scratch) / 2 ** 20


def _fused2d_composite(vol, fused, nh, radius, precise, interpret):
    """XLA replica of the fused kernel's math — the module's original
    tanh / flat-softmax / level-slice path feeding :func:`_blend2d`
    (whose custom_vjp supplies the Pallas backward) — used as this op's
    gradient path and non-TPU fallback."""
    b, jl, t, h, w, c = vol.shape
    kp = fused.shape[-1] // (3 * jl)
    nw0 = 2 * jl * kp
    raw = radius * jnp.tanh(fused[..., :nw0])
    logits = fused[..., nw0:].astype(jnp.float32)
    hind = jnp.asarray(_head_ind(jl, nh, kp // nh))
    z = logits - jax.lax.stop_gradient(
        jnp.max(logits, axis=-1, keepdims=True)
    )
    e = jnp.exp(z)
    a_flat = (e / jnp.einsum("...k,kc->...c", e, hind)).astype(fused.dtype)
    dx = jnp.stack(
        [raw[..., (2 * j) * kp:(2 * j + 1) * kp] for j in range(jl)], axis=1)
    dy = jnp.stack(
        [raw[..., (2 * j + 1) * kp:(2 * j + 2) * kp] for j in range(jl)],
        axis=1)
    a = jnp.stack(
        [a_flat[..., j * kp:(j + 1) * kp] for j in range(jl)], axis=1)
    return _blend2d(vol, dx, dy, a, precise, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _fused2d(vol, fused, nh, radius, use_pallas, precise, interpret):
    b, jl, t, h, w, c = vol.shape
    kp = fused.shape[-1] // (3 * jl)
    ok = (
        use_pallas and nh == 8 and c % 256 == 0 and kp % 8 == 0
        and _fused2d_vmem_mb(h + (-h) % 8, w + (-w) % 8, c, jl, kp,
                             vol.dtype.itemsize,
                             fused.dtype.itemsize) <= 96.0
    )
    if not ok:
        return _fused2d_composite(vol, fused, nh, radius, precise, interpret)
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        vol = jnp.pad(vol, [(0, 0), (0, 0), (0, 0), (0, ph), (0, pw), (0, 0)])
        fused = jnp.pad(fused, [(0, 0), (0, 0), (0, ph), (0, pw), (0, 0)])
    vp = jnp.pad(vol, [(0, 0), (0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])
    out = jax.vmap(
        functools.partial(
            _fused_pallas_b1_2d, radius=float(radius),
            round_bf16=fused.dtype == jnp.bfloat16, precise=precise,
            interpret=interpret,
        )
    )(vp, fused)
    if ph or pw:
        out = out[:, :, :h, :w]
    return out


def _fused2d_fwd(vol, fused, nh, radius, use_pallas, precise, interpret):
    return (_fused2d(vol, fused, nh, radius, use_pallas, precise, interpret),
            (vol, fused))


def _fused2d_bwd(nh, radius, use_pallas, precise, interpret, res, g):
    vol, fused = res
    _, vjp = jax.vjp(
        lambda v, f: _fused2d_composite(v, f, nh, radius, precise,
                                        interpret),
        vol, fused,
    )
    return vjp(g.astype(jnp.float32))


_fused2d.defvjp(_fused2d_fwd, _fused2d_bwd)


def windowed_blend_fused_head(
    aligned: Sequence[jnp.ndarray],  # per level [B, T, H, W, C] (flat lanes)
    fused: jnp.ndarray,              # [B, T, H, W, 3*nl*nh*P] raw head output
    nh: int = 8,
    radius: float = 1.0,
    use_pallas: bool = True,
    precise: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Spatial-window radius-1 blend taking the RAW fused offset+weight
    head output: tanh, the flat per-head softmax and the per-level
    component slicing all happen inside one Pallas launch per (batch, t)
    covering every value level — replacing 1 tanh + 1 softmax + 12 stack
    materializations + 4 kernel launches per grid per layer on the XLA
    side.  Gradients route through the XLA composite (recompute) into
    :func:`_blend2d`'s Pallas backward.  Returns [B, T, H, W, C] fp32.
    """
    vol = jnp.stack(list(aligned), axis=1)
    return _fused2d(vol, fused, nh, radius, use_pallas, precise, interpret)
