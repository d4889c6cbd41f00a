"""DETR top module: backbone → transformer → heads → output dict.

Parity reference: /root/reference/models/model.py:19-281.

* ``refpoint_embed``: learned anchors, [NQ, 4] in single-frame mode or
  [NQ*TEMP_LEN, 4] in tube mode (:47-51);
* binary actorness head ``class_embed_b`` = Linear(d, 3) (:87);
* class logits = mean over the feature axis of the (dropout-0.5'ed)
  class-query outputs (:219-221) — the class branch emits per-(query, class)
  feature vectors, the head averages them;
* box head shared with the decoder's iterative refinement, computed in
  float32 (:195-210);
* AVA single-frame: outputs collapse to [B, NQ, ...]; tube datasets keep
  [B, T, NQ, ...] (:223-235);
* auxiliary outputs per decoder layer (:237-241).
"""

from __future__ import annotations

from typing import Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp

from .backbone import ViTBackboneFPN
from .spec import ModelSpec, spec_from_cfg
from .transformer import DABTransformer


class DETR(nn.Module):
    spec: ModelSpec
    dtype: jnp.dtype = jnp.float32    # backbone compute dtype (bf16 on TPU)

    def setup(self):
        s = self.spec
        self.num_classes = s.num_classes
        self.num_queries = s.num_queries
        self.temporal_length = s.model_temp_len
        self.single_frame = s.single_frame
        self.dataset_mode = s.dataset_mode
        self.hidden_dim = s.d_model

        if s.is_mamba:
            from .videomamba import build_videomamba

            self.backbone = build_videomamba(
                s.mamba_backbone_type, s.temp_len, dtype=self.dtype,
                name="backbone", remat=s.gradient_checkpointing,
            )
            # mamba_proj MLP (backbone_3d_builder.py:69-76)
            c2 = s.mamba_out_channels * 2
            self.mamba_proj = [
                nn.Dense(s.mamba_out_channels, dtype=jnp.float32,
                         name="mamba_proj_0"),
                nn.LayerNorm(dtype=jnp.float32, name="mamba_proj_1"),
                nn.Dense(s.d_model, use_bias=False, dtype=jnp.float32,
                         name="mamba_proj_3"),
                nn.LayerNorm(dtype=jnp.float32, name="mamba_proj_4"),
                nn.Dense(s.d_model, use_bias=False, dtype=jnp.float32,
                         name="mamba_proj_5"),
            ]
        elif s.is_vit:
            self.backbone = ViTBackboneFPN(
                s, self.hidden_dim, self.dtype, name="backbone"
            )
        else:
            from .csn import build_csn

            self.backbone = build_csn(
                s.backbone_name, dtype=self.dtype,
                remat=s.gradient_checkpointing, last_stride=s.last_stride,
                module_name="backbone",
            )
            # per-level input projections + one extra stride-2 level
            # (reference models/model.py:62-85)
            projs = []
            for i in range(3):
                projs.append(
                    (nn.Conv(self.hidden_dim, (1, 1, 1), dtype=jnp.float32,
                             name=f"input_proj_{i}_conv"),
                     nn.GroupNorm(32, epsilon=1e-5, dtype=jnp.float32,
                                  name=f"input_proj_{i}_norm"))
                )
            projs.append(
                (nn.Conv(self.hidden_dim, (3, 3, 3), strides=(1, 2, 2),
                         padding=1, dtype=jnp.float32,
                         name="input_proj_3_conv"),
                 nn.GroupNorm(32, epsilon=1e-5, dtype=jnp.float32,
                              name="input_proj_3_norm"))
            )
            self.input_proj = projs

        self.transformer = DABTransformer(
            d_model=s.d_model,
            nhead=s.nhead,
            num_queries=s.num_queries,
            num_encoder_layers=s.enc_layers,
            num_decoder_layers=s.dec_layers,
            dim_feedforward=s.dim_feedforward,
            dropout=s.dropout,
            num_feature_levels=s.num_feature_levels,
            enc_n_points=s.enc_n_points,
            num_classes=s.num_classes,
            temp_len=s.temp_len,
            single_frame=s.single_frame,
            encoder_type=s.encoder_type,
            fast_radius=s.fast_radius,
            fast_dtype=s.fast_dtype,
            fast_window=s.fast_window,
            fast_cross_level=s.fast_cross_level,
            eff_slice=s.fast_eff_slice,
            fast_use_pallas=s.fast_use_pallas,
            decoder_dtype=s.decoder_dtype,
            bbox_embed_diff_each_layer=s.bbox_embed_diff_each_layer,
            remat=s.gradient_checkpointing,
            name="transformer",
        )
        n_ref = self.num_queries if self.single_frame else (
            self.num_queries * self.temporal_length
        )
        self.refpoint_embed = self.param(
            "refpoint_embed", nn.initializers.normal(1.0), (n_ref, 4)
        )
        self.class_embed_b = nn.Dense(3, dtype=jnp.float32, name="class_embed_b")
        self.head_dropout = nn.Dropout(0.5)

    def __call__(self, pixels, mask, deterministic: bool = True) -> Dict:
        """pixels [B, T, H, W, 3]; mask [B, H, W] True=pad."""
        if self.spec.is_mamba:
            from .backbone import level_masks_and_poses

            # backbone_3d_builder.py:208-211: concat frame summary onto the
            # token map, 4x temporal maxpool, mamba_proj MLP, one level
            tokens, frame_summary = self.backbone(pixels)
            bsz, t, h, w, c = tokens.shape
            summary = jnp.broadcast_to(
                frame_summary[:, :, None, None, :], tokens.shape
            )
            x = jnp.concatenate([tokens, summary], axis=-1)   # [B,T,h,w,2C]
            x = nn.max_pool(x, (4, 1, 1), strides=(4, 1, 1))
            x = x.astype(jnp.float32)
            lin1, norm1, lin2, norm2, lin3 = self.mamba_proj
            x = norm1(lin1(x))
            x = nn.gelu(x, approximate=False)
            x = lin3(norm2(lin2(x)))
            srcs = [x]
            masks, poses = level_masks_and_poses(srcs, mask, self.hidden_dim)
        elif self.spec.is_vit:
            # Centre-frame slice pushed into the backbone (round 5): when
            # the fast encoder's slice plan applies, the FPN only needs the
            # plan's frames (+/-1 token-frame halo for its 3x3x3 convs), so
            # the ViT last block / FPN / poses never compute the ~6 dead
            # frames at all.  Mathematically identical to slicing after the
            # FPN (transformer plan path) — pinned by tests/test_eff_slice.
            plan = None
            s = self.spec
            if s.encoder_type == "fast_attention":
                from .transformer import center_slice_plan

                t_tokens = pixels.shape[1] // s.vit.tubelet_size
                plan = center_slice_plan(
                    s.fast_eff_slice, s.single_frame, s.fast_window,
                    s.num_feature_levels, s.temp_len, t_tokens,
                )
            if plan is not None:
                dec_frame = (s.temp_len // 2) % t_tokens
                srcs, masks, poses, pos_dec = self.backbone(
                    pixels, mask, deterministic,
                    out_frames=tuple(sorted(set(plan[0]))),
                    dec_frame=dec_frame,
                )
                refs = self.refpoint_embed.reshape(self.num_queries, 1, 4)
                hs, cls_hs, references = self.transformer(
                    srcs, masks, poses, refs, deterministic,
                    pre_sliced=(t_tokens, pos_dec),
                )
                return self._heads_and_outputs(
                    hs, cls_hs, references, pixels, deterministic
                )
            srcs, masks, poses = self.backbone(pixels, mask, deterministic)
        else:
            from .backbone import level_masks_and_poses

            # train-mode BatchNorm uses batch statistics (reference torch
            # semantics); eval uses the stored running statistics
            feats = self.backbone(pixels, not deterministic)
            srcs = []
            for l, feat in enumerate(feats[1:]):           # layers 2..4
                conv, norm = self.input_proj[l]
                srcs.append(norm(conv(feat.astype(jnp.float32))))
            conv, norm = self.input_proj[3]                # extra level
            srcs.append(norm(conv(feats[-1].astype(jnp.float32))))
            masks, poses = level_masks_and_poses(srcs, mask, self.hidden_dim)

        tq = 1 if self.single_frame else self.temporal_length
        refs = self.refpoint_embed.reshape(self.num_queries, tq, 4)

        hs, cls_hs, references = self.transformer(
            srcs, masks, poses, refs, deterministic
        )
        return self._heads_and_outputs(
            hs, cls_hs, references, pixels, deterministic
        )

    def _heads_and_outputs(self, hs, cls_hs, references, pixels,
                           deterministic) -> Dict:
        # hs: [NL, BT, NQ, C]; cls_hs: [NL, BT, NQ, NC, C]; refs: [NL, BT, NQ, 4]
        outputs_class_b = self.class_embed_b(hs)
        outputs_coord = self.transformer.decode_boxes(hs, references)
        outputs_class = self.head_dropout(
            cls_hs, deterministic=deterministic
        ).astype(jnp.float32).mean(axis=-1)              # [NL, BT, NQ, NC]

        nl = hs.shape[0]
        b = pixels.shape[0]
        nq, nc = self.num_queries, self.num_classes
        if self.dataset_mode == "ava":
            if self.single_frame:
                shape = (nl, b, nq)
            else:
                # tube mode: keep the keyframe slice only
                t = self.temporal_length
                outputs_class = outputs_class.reshape(nl, b, t, nq, nc)[:, :, t // 2]
                outputs_coord = outputs_coord.reshape(nl, b, t, nq, 4)[:, :, t // 2]
                outputs_class_b = outputs_class_b.reshape(nl, b, t, nq, 3)[:, :, t // 2]
                shape = (nl, b, nq)
            outputs_class = outputs_class.reshape(*shape, nc)
            outputs_coord = outputs_coord.reshape(*shape, 4)
            outputs_class_b = outputs_class_b.reshape(*shape, 3)
        else:
            t = self.temporal_length
            outputs_class = outputs_class.reshape(nl, b, t, nq, nc)
            outputs_coord = outputs_coord.reshape(nl, b, t, nq, 4)
            outputs_class_b = outputs_class_b.reshape(nl, b, t, nq, 3)

        out = {
            "pred_logits": outputs_class[-1],
            "pred_boxes": outputs_coord[-1],
            "pred_logits_b": outputs_class_b[-1],
            "aux_outputs": [
                {
                    "pred_logits": outputs_class[i],
                    "pred_boxes": outputs_coord[i],
                    "pred_logits_b": outputs_class_b[i],
                }
                for i in range(nl - 1)
            ],
        }
        return out


def build_model(cfg, dtype=jnp.float32) -> DETR:
    """Counterpart of /root/reference/models/model.py:253-281 (model only —
    criterion/postprocessors are built by losses.build)."""
    return DETR(spec_from_cfg(cfg), dtype=dtype)
