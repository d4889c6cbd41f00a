"""DAB transformer: level flattening, encoder, common-grid interpolation,
decoder dispatch.

Parity reference: ``Transformer.forward``
(/root/reference/models/detr/dab_transformer.py:296-397):

* levels are flattened to [B, Σ t·h·w, C] with a learned per-level embedding
  added to the positional encodings (:307-329);
* the encoder runs in float32 (autocast-disabled island, :333-334);
* encoder output is un-flattened and every level is resampled onto a common
  (TEMP_LEN, H₂, W₂) grid — the grid of level index -2 — via grid_sample on a
  linspace(-1,1) lattice (``make_interpolated_features``, :239-294); the
  positional encoding of that level is temporally tiled and shared by all
  levels (:286-291);
* single-frame mode (``eff``) slices the centre frame before decoding
  (:379-388); otherwise the decoder batch becomes B*T;
* the decoder consumes memory as levels × (H W) × batch — here re-laid out
  batch-first [BT, L, HW, C].
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .decoder import TransformerDecoder
from .deform_encoder import DeformableEncoder, get_valid_ratio
from .resize import grid_resize_2d, grid_resize_3d, grid_resize_3d_at_frame


def make_interpolated_features(
    features: List[jnp.ndarray],   # per level [B, T_l, H_l, W_l, C]
    num_frames: int,
    level: int = -2,
    frame: int | None = None,
) -> List[jnp.ndarray]:
    """Resample every level onto features[level]'s spatial grid at
    ``num_frames`` temporal extent (dab_transformer.py:239-294).

    ``frame`` computes ONLY that output frame (size-1 t axis) — exactly
    equal to slicing the full result, used by the single-frame decoder so
    the other num_frames - 1 frames are never materialized."""
    tgt = features[level]
    b, t, h, w, c = tgt.shape
    out = []
    for feat in features:
        if feat.shape[1] == num_frames:
            # Reference quirk: the 2D grid_sample path stacks (meshy, meshx)
            # as the (x, y) grid components (dab_transformer.py:257-260), so
            # the sampled map comes out transposed — resample to (w, h) and
            # swap the spatial axes to reproduce it.
            src = feat if frame is None else feat[:, frame : frame + 1]
            out.append(
                jnp.swapaxes(grid_resize_2d(src, (w, h)), -3, -2)
            )
        elif frame is None:
            out.append(grid_resize_3d(feat, (num_frames, h, w)))
        else:
            out.append(
                grid_resize_3d_at_frame(feat, (num_frames, h, w), frame)
            )
    return out


def center_slice_plan(eff_slice: bool, single_frame: bool, fast_window: str,
                      num_levels: int, temp_len: int, t_l: int):
    """Static centre-frame slice plan (frames, weights, transposed2d) for
    the fast encoder, or None when it does not apply (see
    DABTransformer._center_slice_plan).  Module-level so the DETR top can
    compute the plan BEFORE the backbone runs and push the slice into the
    ViT/FPN (backbone.ViTBackboneFPN out_frames)."""
    if not (eff_slice and single_frame and fast_window == "2d"
            and num_levels > 1):
        return None
    if t_l == 1:
        return None                        # already single-frame
    f = temp_len // 2
    if t_l == temp_len:
        return (f,), (1.0,), True
    g = 0.0 if temp_len == 1 else -1.0 + 2.0 * f / (temp_len - 1)
    c = ((g + 1.0) * t_l - 1.0) / 2.0
    i0 = int(math.floor(c))
    frac = c - i0
    i1 = i0 + 1
    w0 = (1.0 - frac) * (1.0 if 0 <= i0 < t_l else 0.0)
    w1 = frac * (1.0 if 0 <= i1 < t_l else 0.0)
    i0c = min(max(i0, 0), t_l - 1)
    i1c = min(max(i1, 0), t_l - 1)
    return (i0c, i1c), (w0, w1), False


class DABTransformer(nn.Module):
    d_model: int = 256
    nhead: int = 8
    num_queries: int = 15
    num_encoder_layers: int = 6
    num_decoder_layers: int = 6
    dim_feedforward: int = 2048
    dropout: float = 0.1
    num_feature_levels: int = 4
    enc_n_points: int = 8
    num_classes: int = 80
    temp_len: int = 32
    single_frame: bool = True            # "eff" mode
    encoder_type: str = "attention"
    fast_radius: int = 1                 # window radius for 'fast_attention'
    fast_dtype: str = "float32"          # compute dtype for the fast encoder
    fast_window: str = "3d"              # '3d' (x,y,t taps) or '2d' (x,y)
    fast_cross_level: str = "resample"   # 'resample' | 'native' (see fast_encoder)
    # Centre-frame encoder slice (single-frame AVA + 2d window only): the
    # 2d-window fast encoder never mixes time — every stage (value/output
    # proj, offset/weight heads, spatial-only blend taps, cross-level
    # alignment, FFN, norms) is per-frame independent — and the decoder
    # consumes ONLY the centre output frame of the common grid, whose
    # temporal lerp reads exactly two encoder frames.  Slicing the levels
    # to those frames BEFORE the encoder is therefore mathematically
    # identical (and grad-identical: unused frames contribute zero grad)
    # while cutting encoder tokens T_l/2-fold (4x at AVA: 54,400 -> 13,600).
    # A dead-code elimination XLA cannot do itself across the opaque Pallas
    # blend kernels.  Config key MODEL.FAST_EFF_SLICE.
    eff_slice: bool = True
    fast_use_pallas: bool = True         # False = XLA-oracle blend path
    decoder_dtype: str = "float32"       # serving dtype for the DAB decoder
    bbox_embed_diff_each_layer: bool = False
    remat: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (self.num_feature_levels, self.d_model),
        )
        if self.encoder_type == "attention":
            self.encoder = DeformableEncoder(
                self.num_encoder_layers, self.d_model, self.dim_feedforward,
                self.num_feature_levels, self.nhead, self.enc_n_points,
                self.dropout, jnp.float32, self.remat, name="encoder",
            )
        elif self.encoder_type == "fast_attention":
            from .fast_encoder import FastDeformableEncoder

            self.encoder = FastDeformableEncoder(
                self.num_encoder_layers, self.d_model, self.dim_feedforward,
                self.num_feature_levels, self.nhead, self.enc_n_points,
                self.fast_radius, self.fast_window, self.fast_cross_level,
                self.dropout, jnp.dtype(self.fast_dtype),
                use_pallas=self.fast_use_pallas, remat=self.remat,
                name="encoder",
            )
        elif self.encoder_type in ("ssm", "vssm"):
            from .ssm_encoder import SSMEncoder

            self.encoder = SSMEncoder(
                self.num_encoder_layers, self.d_model, self.dim_feedforward,
                self.encoder_type, self.dropout, jnp.float32,
                remat=self.remat, name="encoder",
            )
        else:
            raise ValueError(f"unknown encoder_type={self.encoder_type}")
        self.decoder = TransformerDecoder(
            self.num_decoder_layers, self.d_model, self.nhead,
            self.dim_feedforward, self.dropout, self.num_classes,
            query_dim=4,
            bbox_embed_diff_each_layer=self.bbox_embed_diff_each_layer,
            n_levels=self.num_feature_levels,
            dtype=jnp.dtype(self.decoder_dtype),
            remat=self.remat,
            name="decoder",
        )

    def __call__(
        self,
        srcs: List[jnp.ndarray],     # per level [B, T_l, H_l, W_l, C]
        masks: List[jnp.ndarray],    # per level [B, T_l, H_l, W_l] True=pad
        poses: List[jnp.ndarray],    # per level like srcs
        refpoint_embed: jnp.ndarray,  # [NQ, TQ, 4] (TQ = 1 or temp_len)
        deterministic: bool = True,
        pre_sliced=None,  # (orig_t_l, pos_dec): srcs/poses/masks arrive
                          # already centre-sliced by the backbone
                          # (backbone.ViTBackboneFPN out_frames); pos_dec is
                          # the ref level's sine pose at the decode frame
    ):
        b = srcs[0].shape[0]
        spatial_shapes = tuple(tuple(s.shape[1:4]) for s in srcs)

        if self.encoder_type == "fast_attention":
            # TPU-native windowed encoder works on per-level grids directly;
            # no token flattening or valid-ratio machinery needed.
            fdt = jnp.dtype(self.fast_dtype)
            if pre_sliced is not None:
                orig_t, pos_dec = pre_sliced
                plan = center_slice_plan(
                    self.eff_slice, self.single_frame, self.fast_window,
                    self.num_feature_levels, self.temp_len, orig_t,
                )
                assert plan is not None, "pre_sliced inputs without a plan"
                uniq = sorted(set(plan[0]))
                assert srcs[0].shape[1] == len(uniq), (
                    "pre-sliced srcs do not match the slice plan")
                srcs_e, poses_e, masks_e = srcs, poses, masks
            else:
                plan = self._center_slice_plan(spatial_shapes)
                if plan is not None:
                    frames = plan[0]
                    _take = lambda x: jnp.concatenate(
                        [x[:, i : i + 1] for i in frames], axis=1
                    )
                    srcs_e = [_take(s) for s in srcs]
                    poses_e = [_take(p) for p in poses]
                    masks_e = [_take(m) for m in masks]
                else:
                    srcs_e, poses_e, masks_e = srcs, poses, masks
            pos_levels = [
                (p + self.level_embed[l]).astype(fdt)
                for l, p in enumerate(poses_e)
            ]
            mem_levels = self.encoder(
                [s.astype(fdt) for s in srcs_e], pos_levels, masks_e,
                deterministic,
            )
            # hand off in the decoder's serving dtype: with a bf16 decoder
            # the old unconditional fp32 round-trip (encoder bf16 -> fp32
            # interp -> bf16 decoder) was pure HBM traffic
            hdt = jnp.promote_types(jnp.dtype(self.decoder_dtype), fdt)
            mem_levels = [m.astype(hdt) for m in mem_levels]
            if plan is not None:
                if pre_sliced is not None:
                    return self._center_frame_decode_presliced(
                        mem_levels, masks, refpoint_embed, deterministic,
                        plan, pos_dec, fdt, hdt,
                    )
                return self._center_frame_decode(
                    mem_levels, poses, masks, spatial_shapes,
                    refpoint_embed, deterministic, plan, fdt, hdt,
                )
            pos_levels = [p.astype(hdt) for p in pos_levels]
            return self._common_grid_decode(
                mem_levels, pos_levels, masks, spatial_shapes,
                refpoint_embed, deterministic,
            )

        src_flat = jnp.concatenate(
            [s.reshape(b, -1, self.d_model) for s in srcs], axis=1
        ).astype(jnp.float32)
        mask_flat = jnp.concatenate([m.reshape(b, -1) for m in masks], axis=1)
        pos_flat = jnp.concatenate(
            [
                p.reshape(b, -1, self.d_model) + self.level_embed[l][None, None]
                for l, p in enumerate(poses)
            ],
            axis=1,
        ).astype(jnp.float32)
        valid_ratios = jnp.stack([get_valid_ratio(m) for m in masks], axis=1)

        if self.encoder_type in ("ssm", "vssm"):
            # SSM path (dab_transformer.py:341-348): the encoder collapses
            # to the key frame; one level, T = 1.
            memory, key_pos = self.encoder(
                src_flat, pos_flat, spatial_shapes[0], deterministic
            )
            t0, h0, w0 = spatial_shapes[0]
            mem_levels = [memory.reshape(b, 1, h0, w0, self.d_model)]
            pos_common = key_pos.reshape(b, 1, h0, w0, self.d_model)
            mask_common = masks[0][:, :1]
            return self._decode(
                mem_levels, pos_common, mask_common, refpoint_embed,
                deterministic,
            )

        # Last-layer query slice for the EXACT encoder (round 5): layers
        # 1..N-1 must stay full (unconstrained 3D sampling reads every
        # frame of the previous layer), but the FINAL layer's output is
        # only consumed at the centre-lerp frames of each level
        # (make_interpolated_features at frame f), so its queries — offset/
        # weight heads, sampling, FFN — can be restricted to those rows.
        # Same plan math as the fast path; the window gate is irrelevant
        # here (pass "2d") because only the last layer's QUERIES are cut.
        plan = None
        if (self.single_frame and len(spatial_shapes) > 1
                and len({s[0] for s in spatial_shapes}) == 1):
            plan = center_slice_plan(
                self.eff_slice, True, "2d", self.num_feature_levels,
                self.temp_len, spatial_shapes[0][0],
            )

        if plan is not None:
            uniq = sorted(set(plan[0]))
            chunks, start = [], 0
            for (t, h, w) in spatial_shapes:
                chunks.append(
                    (start + uniq[0] * h * w, start + (uniq[-1] + 1) * h * w)
                )
                start += t * h * w
            memory = self.encoder(
                src_flat, spatial_shapes, valid_ratios, pos_flat, mask_flat,
                deterministic, last_layer_chunks=tuple(chunks),
            )
            mem_levels, start, nf = [], 0, len(uniq)
            for (t, h, w) in spatial_shapes:
                size = nf * h * w
                mem_levels.append(
                    memory[:, start : start + size].reshape(
                        b, nf, h, w, self.d_model
                    )
                )
                start += size
            ref_lvl = len(spatial_shapes) - 2
            t_l = spatial_shapes[ref_lvl][0]
            fdec = (self.temp_len // 2) % t_l
            pos_dec = poses[ref_lvl][:, fdec : fdec + 1].astype(jnp.float32)
            return self._center_frame_decode_presliced(
                mem_levels, masks, refpoint_embed, deterministic, plan,
                pos_dec, jnp.float32, jnp.float32,
            )

        memory = self.encoder(
            src_flat, spatial_shapes, valid_ratios, pos_flat, mask_flat,
            deterministic,
        )

        # un-flatten per level
        mem_levels, pos_levels = [], []
        start = 0
        for l, (t, h, w) in enumerate(spatial_shapes):
            size = t * h * w
            mem_levels.append(
                memory[:, start : start + size].reshape(b, t, h, w, self.d_model)
            )
            pos_levels.append(
                pos_flat[:, start : start + size].reshape(b, t, h, w, self.d_model)
            )
            start += size

        return self._common_grid_decode(
            mem_levels, pos_levels, masks, spatial_shapes, refpoint_embed,
            deterministic,
        )

    def _center_slice_plan(self, spatial_shapes):
        """Static plan (frames, weights, transposed2d) for the centre-frame
        encoder slice, or None when it does not apply.  The weights/frames
        reproduce make_interpolated_features' temporal math exactly:
        grid_sample coords on a linspace(-1, 1, temp_len) lattice
        (resize._grid_coords) for the 3d branch, a direct frame slice (with
        the reference's transposed 2D resample quirk) when T_l == temp_len.
        """
        if len(spatial_shapes) <= 1:
            return None
        t_set = {s[0] for s in spatial_shapes}
        if len(t_set) != 1:
            return None
        return center_slice_plan(
            self.eff_slice, self.single_frame, self.fast_window,
            self.num_feature_levels, self.temp_len, t_set.pop(),
        )

    def _center_frame_decode(self, mem_levels, poses, masks, spatial_shapes,
                             refpoint_embed, deterministic, plan, fdt, hdt):
        """Decode from centre-sliced encoder outputs: apply the temporal
        lerp weights (exactly grid_resize_3d_at_frame's math on the
        retained frames) + the spatial resample onto the reference level's
        grid, then the standard single-frame decode."""
        frames, fweights, transposed2d = plan
        ref_lvl = len(spatial_shapes) - 2
        t_l = spatial_shapes[ref_lvl][0]
        h, w = spatial_shapes[ref_lvl][1:3]
        f = self.temp_len // 2

        outs = []
        for m in mem_levels:                  # [B, n_frames, H_l, W_l, C]
            if transposed2d:
                # reference 2D-branch quirk: resample to (w, h) then swap
                # the spatial axes; dtype stays hdt (no fp32 promotion)
                outs.append(
                    jnp.swapaxes(grid_resize_2d(m[:, 0:1], (w, h)), -3, -2)
                )
            else:
                # fp32-promoting lerp, matching p0 * wt0 with fp32 weights
                wts = jnp.asarray(fweights, jnp.float32)
                plane = m[:, 0:1] * wts[0] + m[:, 1:2] * wts[1]
                outs.append(grid_resize_2d(plane, (h, w)))

        pos_common = (
            (poses[ref_lvl] + self.level_embed[ref_lvl]).astype(fdt)
            .astype(hdt)[:, f % t_l : f % t_l + 1]
        )
        mask_common = masks[ref_lvl][:, f % t_l : f % t_l + 1]
        return self._decode(outs, pos_common, mask_common, refpoint_embed,
                            deterministic)

    def _center_frame_decode_presliced(self, mem_levels, masks,
                                       refpoint_embed, deterministic, plan,
                                       pos_dec, fdt, hdt):
        """_center_frame_decode when the backbone already delivered only the
        plan's (unique) frames: identical math, but the temporal lerp
        indexes the sliced t axis and pos_common comes from the backbone's
        decode-frame sine pose instead of a full-T slice."""
        frames, fweights, transposed2d = plan
        uniq = sorted(set(frames))
        ref_lvl = len(mem_levels) - 2
        h, w = mem_levels[ref_lvl].shape[2:4]

        outs = []
        for m in mem_levels:                  # [B, len(uniq), H_l, W_l, C]
            if transposed2d:
                outs.append(
                    jnp.swapaxes(grid_resize_2d(m[:, 0:1], (w, h)), -3, -2)
                )
            else:
                wts = jnp.asarray(fweights, jnp.float32)
                i0, i1 = uniq.index(frames[0]), uniq.index(frames[1])
                plane = m[:, i0 : i0 + 1] * wts[0] + m[:, i1 : i1 + 1] * wts[1]
                outs.append(grid_resize_2d(plane, (h, w)))

        pos_common = (
            (pos_dec + self.level_embed[ref_lvl]).astype(fdt).astype(hdt)
        )
        # level masks are time-replicated; any retained frame equals the
        # decode frame's mask
        mask_common = masks[ref_lvl][:, 0:1]
        return self._decode(outs, pos_common, mask_common, refpoint_embed,
                            deterministic)

    def _common_grid_decode(self, mem_levels, pos_levels, masks,
                            spatial_shapes, refpoint_embed, deterministic):
        if self.num_feature_levels > 1:
            ref_lvl = len(spatial_shapes) - 2
            t_l = spatial_shapes[ref_lvl][0]
            if self.single_frame:
                # compute ONLY the centre frame the decoder consumes
                # (identical to interpolate-then-slice; _decode's centre
                # slice of a size-1 t axis is the identity)
                f = self.temp_len // 2
                mem_levels = make_interpolated_features(
                    mem_levels, self.temp_len, frame=f
                )
                pos_common = pos_levels[ref_lvl][:, f % t_l : f % t_l + 1]
                mask_common = masks[ref_lvl][:, f % t_l : f % t_l + 1]
            else:
                mem_levels = make_interpolated_features(
                    mem_levels, self.temp_len
                )
                pos_common = jnp.tile(
                    pos_levels[ref_lvl], (1, self.temp_len // t_l, 1, 1, 1)
                )
                mask_common = jnp.tile(
                    masks[ref_lvl], (1, self.temp_len // t_l, 1, 1)
                )
        else:
            ref_lvl = 0
            pos_common = pos_levels[0]
            mask_common = masks[0]
        return self._decode(mem_levels, pos_common, mask_common,
                            refpoint_embed, deterministic)

    def _decode(self, mem_levels, pos_common, mask_common, refpoint_embed,
                deterministic):
        b = mem_levels[0].shape[0]
        t, h, w = mem_levels[0].shape[1:4]
        ddt = jnp.dtype(self.decoder_dtype)
        mem = jnp.stack(
            [m.astype(ddt) for m in mem_levels], axis=1
        )                                             # [B, L, T, H, W, C]
        pos_common = pos_common.astype(ddt)

        if self.single_frame:
            mem = mem[:, :, t // 2 : t // 2 + 1]
            pos_common = pos_common[:, t // 2 : t // 2 + 1]
            mask_common = mask_common[:, t // 2 : t // 2 + 1]
            t_dec = 1
        else:
            t_dec = t

        nlev = mem.shape[1]
        # [B, L, T, H, W, C] -> [B*T, L, HW, C] (b-major, t-minor batch)
        mem = mem.transpose(0, 2, 1, 3, 4, 5).reshape(
            b * t_dec, nlev, h * w, self.d_model
        )
        pos_dec = jnp.broadcast_to(
            pos_common.reshape(b, t_dec, 1, h * w, self.d_model),
            (b, t_dec, nlev, h * w, self.d_model),
        ).reshape(b * t_dec, nlev, h * w, self.d_model)
        mask_dec = mask_common.reshape(b * t_dec, h * w)

        # refpoints: [NQ, TQ, 4] -> [B*TQ, NQ, 4]
        nq, tq = refpoint_embed.shape[:2]
        refs = jnp.broadcast_to(
            refpoint_embed[None], (b, nq, tq, 4)
        ).transpose(0, 2, 1, 3).reshape(b * tq, nq, 4)

        tgt = jnp.zeros((b * t_dec, nq, self.d_model), ddt)
        hs, cls_hs, references = self.decoder(
            tgt, mem, mask_dec, pos_dec, refs, (h, w), deterministic
        )
        return hs, cls_hs, references

    def decode_boxes(self, hs: jnp.ndarray, references: jnp.ndarray) -> jnp.ndarray:
        """Box head shared with the decoder's iterative refinement
        (/root/reference/models/model.py:195-210): coord[l] =
        sigmoid(bbox_embed(hs[l]) + inverse_sigmoid(reference[l]))."""
        from ..utils.misc import inverse_sigmoid

        ref = inverse_sigmoid(references)
        if self.bbox_embed_diff_each_layer:
            coords = [
                jax.nn.sigmoid(
                    self.decoder.run_bbox_embed(l, hs[l])[..., :4] + ref[l]
                )
                for l in range(hs.shape[0])
            ]
            return jnp.stack(coords)
        tmp = self.decoder.run_bbox_embed(0, hs)
        return jax.nn.sigmoid(tmp[..., :4] + ref)
