"""Fast deformable encoder — gather-free windowed multi-scale attention.

A TPU-first alternative to :class:`.deform_encoder.DeformableEncoder`
(selected with ``CONFIG.MODEL.ENCODER_TYPE = 'fast_attention'``).  It keeps
the reference encoder's macro-structure — per-token multi-scale deformable
self-attention + FFN with post-norm residuals, matching the layer layout of
/root/reference/models/detr/dab_transformer.py:484-523 — but replaces the
unconstrained sampler with :mod:`..ops.fast_deform`'s window-clamped blend:
offsets are ``radius * tanh(head(q))`` pixels on the query's own grid, so
trilinear sampling reduces to (2R+1)^3 statically-shifted dense
multiply-adds instead of HBM gathers.  See PERF.md for the measured gap
this closes.

Like the reference transformer (dab_transformer.py:307-329), the encoder
carries ONE flattened token stream [B, sum(t*h*w), C] across layers: every
per-token stage (value/output projections, offset+weight heads, softmax,
FFN, norms) is a single fused op over all levels, and only the windowed
blend splits the stream back into level grids.  (An earlier per-level-list
formulation issued 4x the ops and scheduled poorly at B>1.)

Differences from the exact path (intentional, documented):
* offsets are bounded to +-radius pixels of the query grid per layer
  (multi-scale levels + depth still give a global receptive field);
* cross-level values are pre-aligned to the query grid with power-of-two
  resampling rather than sampled at the native level resolution;
* no valid-ratio rescaling — padding is handled by zeroing padded values,
  identical in effect to the reference's zero-filled sampler corners.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.deform_attn import (
    directional_offset_init_l2hp,
    directional_offset_init_l3hp,
)
from ..ops.fast_deform import align_all_levels

from ..ops.fast_deform_pallas import (
    windowed_blend_comps,
    windowed_blend_fused_head,
    windowed_blend_native,
)

Shapes = Tuple[Tuple[int, int, int], ...]     # per level (T, H, W)


def _split_levels(flat: jnp.ndarray, shapes: Shapes) -> List[jnp.ndarray]:
    """[B, N, ...] -> per level [B, T, H, W, ...] along the token axis."""
    out, start = [], 0
    for t, h, w in shapes:
        n = t * h * w
        out.append(
            flat[:, start : start + n].reshape(
                (flat.shape[0], t, h, w) + flat.shape[2:]
            )
        )
        start += n
    return out


class FastDeformAttn3D(nn.Module):
    """Windowed multi-scale deformable self-attention over level grids.

    Heads (value/offset/weight/output projections) are shared across query
    levels, like the reference MSDeformAttn's single set of projections over
    the flattened token stream (ms_deform_attn.py:117-163).  Operates on the
    flat [B, N, C] stream; ``shapes`` gives each level's (T, H, W).
    """

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 8
    radius: int = 1
    window: str = "3d"       # "3d" = (x, y, t) taps; "2d" = (x, y) only
    # cross-level value access: "resample" pre-aligns every level onto the
    # query grid with power-of-two resampling; "native" samples each level
    # at its own resolution at the query's align_corners=False-mapped
    # position (the EXACT encoder's geometry, deform_encoder.py:78-87) with
    # offsets bounded to +-radius native pixels — transplants from exact
    # checkpoints are then function-equivalent in-window on EVERY level
    # (utils/transplant.py), not only the own-grid case.
    cross_level: str = "resample"
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(
        self,
        src_flat: jnp.ndarray,               # [B, N, C]
        pos_flat: jnp.ndarray,               # [B, N, C]
        shapes: Shapes,                      # per level (T, H, W)
        mask_flat: jnp.ndarray | None,       # [B, N] True = padded
    ) -> jnp.ndarray:
        nh, nl, np_, r = self.n_heads, self.n_levels, self.n_points, self.radius
        head_dim = self.d_model // nh
        kp = nh * np_
        b = src_flat.shape[0]
        # "2d" drops the temporal taps: 9 shifts instead of 27 and the
        # value volume is read once per level instead of 3x — ~2.5x faster
        # blend at AVA shapes.  Temporal mixing still happens in the
        # backbone (joint space-time attention / 3D convs); see PERF.md.
        nc = 3 if self.window == "3d" else 2

        value_proj = nn.Dense(self.d_model, dtype=self.dtype, name="value_proj")
        # lane layouts are (level, component, head, point) for offsets and
        # (level, head, point) for weights: per-(level, component) slices
        # are contiguous lane ranges, so the blend consumes them without
        # any lane-padded transposes (see ops/fast_deform_pallas.py).
        # The offset and weight heads both consume q, so their kernels are
        # declared separately (clean init semantics) but applied as ONE
        # fused matmul — offsets in lanes [0, nl*nc*kp), weight logits in
        # [nl*nc*kp, nl*(nc+1)*kp).
        off_init = (directional_offset_init_l3hp if nc == 3
                    else directional_offset_init_l2hp)
        off_kernel = self.param(
            "sampling_offsets_kernel", nn.initializers.zeros,
            (self.d_model, nl * nc * kp),
        )
        off_bias = self.param(
            "sampling_offsets_bias",
            lambda *_: off_init(nh, nl, np_),
            (nl * nc * kp,),
        )
        w_kernel = self.param(
            "attention_weights_kernel", nn.initializers.zeros,
            (self.d_model, nl * kp),
        )
        w_bias = self.param(
            "attention_weights_bias", nn.initializers.zeros, (nl * kp,)
        )
        head_kernel = jnp.concatenate(
            [off_kernel, w_kernel], axis=1
        ).astype(self.dtype)
        head_bias = jnp.concatenate([off_bias, w_bias]).astype(self.dtype)
        output_proj = nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")

        # values stay FLAT [.., C]: a trailing (nh, 32) head split would
        # tile to (8, 128) with 3/4 of every lane tile wasted, 4x-ing the
        # HBM traffic of the alignment resamples (measured: 4.3 -> 1.1
        # ms/layer).  The blend kernel consumes flat lanes; only the XLA
        # fallback needs nh, passed as a scalar.
        values_flat = value_proj(src_flat)
        if mask_flat is not None:
            values_flat = jnp.where(mask_flat[..., None], 0.0, values_flat)
        values = _split_levels(values_flat, shapes)

        # one fused offset+weight head matmul over the whole stream
        fused = (src_flat + pos_flat) @ head_kernel + head_bias
        # PER-HEAD max subtraction on the weight-logit lanes, done once
        # here so every downstream softmax (the XLA path below AND the
        # fused Pallas kernel, which subtracts the global max of these
        # already-normalized logits — then exactly 0) sees per-head
        # denominators >= 1.  A GLOBAL max alone is NOT enough: once
        # training spreads head logit ranges past ~88 (observed at step
        # ~78 of the synthetic fast-vs-exact run, lr 1e-3), the low
        # heads' exp underflows to denormals and the softmax backward's
        # 1/denom**2 overflows -> NaN params.  Softmax is shift-invariant,
        # so values are unchanged up to dtype rounding.
        wl = fused[..., nl * nc * kp:].astype(jnp.float32)
        lg = wl.reshape(wl.shape[:-1] + (nl, nh, np_))
        mx = jax.lax.stop_gradient(lg.max(axis=(-3, -1), keepdims=True))
        wl = (lg - mx).reshape(wl.shape).astype(fused.dtype)
        fused = jnp.concatenate([fused[..., : nl * nc * kp], wl], axis=-1)

        use_pallas = self.use_pallas and jax.default_backend() == "tpu"
        native = self.cross_level == "native"

        if (not native and nc == 2 and r == 1 and use_pallas and nh == 8
                and self.d_model % 256 == 0 and np_ % 8 == 0):
            # fully fused route: tanh, the flat per-head softmax and the
            # per-level component slicing happen INSIDE the blend kernel
            # (one launch per grid covering all levels) — none of those
            # intermediates or the dx/dy/a stacks touch HBM.  Gradients
            # route through the XLA composite into the Pallas backward
            # (ops/fast_deform_pallas.windowed_blend_fused_head).
            grids = [(h, w) for _, h, w in shapes]
            aligned_all = align_all_levels(values, grids)
            fused_levels = _split_levels(fused.astype(self.dtype), shapes)
            outs = []
            for i, (t, h, w) in enumerate(shapes):
                out = windowed_blend_fused_head(
                    aligned_all[i], fused_levels[i], nh=nh, radius=float(r),
                    use_pallas=True,
                    precise=jnp.dtype(self.dtype) == jnp.float32,
                ).astype(self.dtype)
                outs.append(out.reshape(b, t * h * w, self.d_model))
            return output_proj(jnp.concatenate(outs, axis=1))

        raw = r * jnp.tanh(fused[..., : nl * nc * kp])
        logits = fused[..., nl * nc * kp :].astype(jnp.float32)

        # flat-lane per-head softmax: with lanes (L, h, P), head(k) is
        # (k // P) % nh; the denominator is one matmul against a constant
        # same-head indicator, and subtracting the row max (constant within
        # every head group) keeps it stable — no (.., nh, L*P) reshape ever
        # materializes in a lane-padded layout.
        head_ind = jnp.asarray(
            (jnp.arange(nl * kp)[:, None] // np_ % nh)
            == (jnp.arange(nl * kp)[None, :] // np_ % nh),
            jnp.float32,
        )
        z = logits - jax.lax.stop_gradient(
            jnp.max(logits, axis=-1, keepdims=True)
        )
        e = jnp.exp(z)
        a_flat = (
            e / jnp.einsum("...k,kc->...c", e, head_ind)
        ).astype(self.dtype)

        if native and r != 1:
            raise ValueError("cross_level='native' supports radius=1 only")
        if native and len({t for t, _, _ in shapes}) != 1:
            # the spatial-only native sampler reads each level at the
            # query's own frame index; mixed temporal extents (possible
            # with CSN pyramids) would mis-align frames
            raise ValueError(
                f"cross_level='native' needs equal T on all levels, got "
                f"{shapes}"
            )
        aligned_all = None
        if not native:
            # aligned_all[i][j] = level j on query grid i, each pair one
            # composed-matrix resize from the native level
            grids = [(h, w) for _, h, w in shapes]
            aligned_all = align_all_levels(values, grids)

        raw_levels = _split_levels(raw, shapes)
        a_levels = _split_levels(a_flat, shapes)
        outs = []
        for i, (t, h, w) in enumerate(shapes):
            rw, af = raw_levels[i], a_levels[i]
            dx = jnp.stack(
                [rw[..., (nc * j + 0) * kp : (nc * j + 1) * kp]
                 for j in range(nl)], axis=1)
            dy = jnp.stack(
                [rw[..., (nc * j + 1) * kp : (nc * j + 2) * kp]
                 for j in range(nl)], axis=1)
            dt = (jnp.stack(
                [rw[..., (nc * j + 2) * kp : (nc * j + 3) * kp]
                 for j in range(nl)], axis=1) if nc == 3 else None)
            a = jnp.stack(
                [af[..., j * kp : (j + 1) * kp] for j in range(nl)],
                axis=1)

            if native:
                out = windowed_blend_native(
                    values, dx, dy, a, nh=nh, use_pallas=use_pallas,
                    precise=jnp.dtype(self.dtype) == jnp.float32,
                    dt=dt,
                ).astype(self.dtype)
            elif r == 1:
                out = windowed_blend_comps(
                    aligned_all[i], dx, dy, dt, a, nh=nh,
                    use_pallas=use_pallas,
                    precise=jnp.dtype(self.dtype) == jnp.float32,
                ).astype(self.dtype)
            else:
                # general-radius XLA path (kernel is radius-1 only); a 2d
                # window is expressed as dt = 0 (all temporal mass on the
                # centre tap)
                from ..ops.fast_deform import windowed_blend_fused

                if dt is None:
                    dt = jnp.zeros_like(dx)
                offsets = jnp.stack([dx, dy, dt], axis=-1).reshape(
                    b, nl, t, h, w, nh, np_, 3
                ).transpose(0, 2, 3, 4, 5, 1, 6, 7)
                weights = a.reshape(b, nl, t, h, w, nh, np_).transpose(
                    0, 2, 3, 4, 5, 1, 6
                )
                headed = [
                    v.reshape(v.shape[:4] + (nh, head_dim))
                    for v in aligned_all[i]
                ]
                out = windowed_blend_fused(headed, offsets, weights, r)
            outs.append(out.reshape(b, t * h * w, self.d_model))
        return output_proj(jnp.concatenate(outs, axis=1))


class FastEncoderLayer(nn.Module):
    """Windowed deformable self-attn + FFN, post-norm (mirrors
    DeformableTransformerEncoderLayer, dab_transformer.py:484-523).
    Operates on the flat [B, N, C] token stream."""

    d_model: int = 256
    d_ffn: int = 2048
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 8
    radius: int = 1
    window: str = "3d"
    cross_level: str = "resample"
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = True

    @nn.compact
    def __call__(
        self, src_flat, pos_flat, shapes: Shapes, mask_flat,
        deterministic: bool = True,
    ):
        attn = FastDeformAttn3D(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            self.radius, self.window, self.cross_level, self.dtype,
            self.use_pallas, name="self_attn",
        )(src_flat, pos_flat, shapes, mask_flat)
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        # NOTE: routing this Dense pair through ops/fused_ffn's Pallas
        # kernel (hidden activation VMEM-resident, no HBM round-trip) was
        # measured IN-MODEL at 87.3 vs 84.0 ms/batch — a 4% LOSS despite
        # the ~446 MB/layer traffic win, at tile 1024 and 4096 alike: the
        # pallas_call is a fusion/overlap barrier and XLA was already
        # hiding the FFN traffic behind the blend kernels (4th confirmed
        # instance of this pattern; see PERF.md).  The kernel stays in
        # ops/fused_ffn.py as a tested reference.
        lin1 = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")
        lin2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")
        norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        drop2 = nn.Dropout(self.dropout, deterministic=deterministic)
        drop3 = nn.Dropout(self.dropout, deterministic=deterministic)

        x = norm1(src_flat + drop(attn))
        y = lin2(drop2(nn.relu(lin1(x))))
        return norm2(x + drop3(y))


class FastDeformableEncoder(nn.Module):
    """Stack of windowed deformable layers.  Takes and returns per-level
    grids; internally flattens to one token stream across all layers."""

    num_layers: int = 6
    d_model: int = 256
    d_ffn: int = 2048
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 8
    radius: int = 1
    window: str = "3d"
    cross_level: str = "resample"
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = True
    remat: bool = False

    @nn.compact
    def __call__(
        self,
        src_levels: Sequence[jnp.ndarray],
        pos_levels: Sequence[jnp.ndarray],
        mask_levels: Sequence[jnp.ndarray] | None,
        deterministic: bool = True,
    ) -> List[jnp.ndarray]:
        b, c = src_levels[0].shape[0], src_levels[0].shape[-1]
        shapes = tuple(tuple(s.shape[1:4]) for s in src_levels)
        x = jnp.concatenate([s.reshape(b, -1, c) for s in src_levels], axis=1)
        pos_flat = jnp.concatenate(
            [p.reshape(b, -1, c) for p in pos_levels], axis=1
        )
        mask_flat = (
            jnp.concatenate([m.reshape(b, -1) for m in mask_levels], axis=1)
            if mask_levels is not None else None
        )

        layer_cls = FastEncoderLayer
        if self.remat:
            layer_cls = nn.remat(FastEncoderLayer, static_argnums=(3, 5))
        for i in range(self.num_layers):
            x = layer_cls(
                self.d_model, self.d_ffn, self.n_levels, self.n_heads,
                self.n_points, self.radius, self.window, self.cross_level,
                self.dropout, self.dtype, self.use_pallas,
                name=f"layers_{i}",
            )(x, pos_flat, shapes, mask_flat, deterministic)
        return _split_levels(x, shapes)
