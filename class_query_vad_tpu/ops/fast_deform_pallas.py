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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _blend(vp_pad, dx, dy, dt, a, precise=False, interpret=False):
    """vp_pad [B, J, T+2, H+2, W+2, C] -> out [B, T, H, W, C] fp32."""
    h = dx.shape[3]
    vps = jnp.stack([vp_pad[:, :, :, k : k + h] for k in range(3)], axis=1)
    return jax.vmap(
        functools.partial(_blend_pallas_b1, precise=precise,
                          interpret=interpret)
    )(vps, dx, dy, dt, a)


def _blend_fwd(vp_pad, dx, dy, dt, a, precise, interpret):
    return (_blend(vp_pad, dx, dy, dt, a, precise, interpret),
            (vp_pad, dx, dy, dt, a))


def _blend_bwd(precise, interpret, res, g):
    _, vjp = jax.vjp(_blend_xla, *res)
    return vjp(g)


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
    pad = [(0, 0), (0, 0), (1, 1), (1, 1), (1, 1), (0, 0)]
    vp_pad = jnp.pad(vol, pad)
    comps = []
    for comp in range(3):
        x = offsets[..., comp]                      # [B, T, H, W, nh, L, P]
        x = x.transpose(0, 5, 1, 2, 3, 4, 6).reshape(b, -1, t, h, w, nh * p)
        comps.append(x)
    dx, dy, dt = comps
    a = weights.transpose(0, 5, 1, 2, 3, 4, 6).reshape(b, -1, t, h, w, nh * p)
    out = _blend(vp_pad, dx, dy, dt, a, False, interpret)
    return out.reshape(b, t, h, w, nh, d)


def windowed_blend_comps(
    aligned: Sequence[jnp.ndarray],  # per level [B, T, H, W, nh, D]
    dx: jnp.ndarray,                 # [B, J, T, H, W, nh*P]
    dy: jnp.ndarray,
    dt: jnp.ndarray,
    a: jnp.ndarray,
    use_pallas: bool = True,
    precise: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Radius-1 blend from pre-sliced per-level components (the fast
    encoder's native layout — contiguous lane slices, no transposes).

    Query grids whose H/W are not multiples of 8 are zero-padded up to the
    next multiple (padded queries carry zero weights and are sliced away),
    so every level can take the kernel.  Returns [B, T, H, W, nh, D] fp32.
    """
    b, t, h, w, nh, d = aligned[0].shape
    c = nh * d
    vol = jnp.stack([v.reshape(b, t, h, w, c) for v in aligned], axis=1)
    if use_pallas and c % 256 == 0:
        ph, pw = (-h) % 8, (-w) % 8
        if ph or pw:
            grid_pad = [(0, 0), (0, 0), (0, 0), (0, ph), (0, pw), (0, 0)]
            vol = jnp.pad(vol, grid_pad)
            dx, dy, dt, a = (jnp.pad(x, grid_pad) for x in (dx, dy, dt, a))
        vp_pad = jnp.pad(
            vol, [(0, 0), (0, 0), (1, 1), (1, 1), (1, 1), (0, 0)]
        )
        out = _blend(vp_pad, dx, dy, dt, a, precise, interpret)
        if ph or pw:
            out = out[:, :, :h, :w]
        return out.reshape(b, t, h, w, nh, d)
    vp_pad = jnp.pad(vol, [(0, 0), (0, 0), (1, 1), (1, 1), (1, 1), (0, 0)])
    return _blend_xla(vp_pad, dx, dy, dt, a, nh).reshape(b, t, h, w, nh, d)
