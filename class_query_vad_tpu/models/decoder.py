"""DAB-DETR decoder with the paper's dual-branch layer pair.

Each decoder step runs a localization layer then a classification layer:

* ``LocDecoderLayer`` (/root/reference/models/detr/dab_transformer.py:854-997)
  — query self-attention (caller-side projections, projection-free MHA),
  softmax level mixing producing a *query-specific memory*
  (einsum, :943-948), and a concat-key cross-attention where both query and
  key carry a concatenated positional half (2*d_model wide, value d_model)
  with a per-query key axis (attention.py:379,411);
* ``ClsDecoderLayer`` (dab_transformer.py:999-1079) — actor feature
  (stop-gradient) broadcast onto the query-specific memory, ONE ConvBlock
  applied num_conv_blocks times (the reference registers the same module
  object N times, :1017-1018 — weights are shared), class-query
  self-attention, then cross-attention of the per-class queries against the
  conv features; class queries persist across layers (:1077).

Layouts are batch-first: queries [BT, NQ, C], memory [BT, L, HW, C], class
state [BT*NQ, NC, C].  The reference's (sequence, batch) layouts are an
nn.MultiheadAttention artifact with no TPU benefit.  Attention softmax is
max-subtracted in float32 (attention.py:400-401).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.misc import inverse_sigmoid
from .common import MLP, sine_embed_for_position


def _masked_softmax(logits: jnp.ndarray, key_mask: Optional[jnp.ndarray]):
    """Max-subtracted softmax over the last axis; key_mask True = ignore,
    broadcastable to logits."""
    logits = logits.astype(jnp.float32)
    if key_mask is not None:
        logits = jnp.where(key_mask, -jnp.inf, logits)
    logits = logits - jax.lax.stop_gradient(logits.max(axis=-1, keepdims=True))
    return jax.nn.softmax(logits, axis=-1)


class ProjFreeMHA(nn.Module):
    """Projection-free multi-head attention: q/k/v are already projected by
    the caller; only the output projection is owned here
    (/root/reference/models/detr/attention.py:61-188)."""

    embed_dim: int
    num_heads: int
    vdim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None, deterministic=True,
                 logits=None):
        # q: [B, Lq, E]; k: [B, Lk, E]; v: [B, Lk, V]; mask: [B, Lk].
        # ``logits`` short-circuits the q·k dot with caller-computed,
        # already-scaled attention logits [B, nh, Lq, Lk] (used by the
        # decomposed concat-key attention — see ClsDecoderLayer); q/k are
        # then unused and may be None.
        nh = self.num_heads
        vhd = self.vdim // nh
        if logits is None:
            b, lq, _ = q.shape
            hd = self.embed_dim // nh
            scale = float(hd) ** -0.5
            qh = (q * scale).reshape(b, lq, nh, hd)
            kh = k.reshape(b, -1, nh, hd)
            logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh)
        else:
            b, lq = logits.shape[0], logits.shape[2]
        vh = v.reshape(b, -1, nh, vhd)
        mask = None if key_padding_mask is None else key_padding_mask[:, None, None, :]
        attn = _masked_softmax(logits, mask).astype(v.dtype)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b, lq, self.vdim)
        return nn.Dense(self.vdim, dtype=self.dtype, name="out_proj")(out)


class QuerySpecificMHA(nn.Module):
    """Concat-key attention where K/V carry a per-query axis
    (attention.py:342-346,379,411): q [B, NQ, E], k [B, NQ, S, E],
    v [B, NQ, S, V] -> [B, NQ, V]."""

    embed_dim: int
    num_heads: int
    vdim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_padding_mask=None, deterministic=True,
                 logits=None):
        # ``logits``: caller-computed scaled logits [B, nh, NQ, S] replacing
        # the q·k dot (decomposed concat-key path — see LocDecoderLayer);
        # q/k may then be None.
        nh = self.num_heads
        vhd = self.vdim // nh
        if logits is None:
            b, nq, _ = q.shape
            hd = self.embed_dim // nh
            scale = float(hd) ** -0.5
            qh = (q * scale).reshape(b, nq, nh, hd)
            kh = k.reshape(b, nq, -1, nh, hd)
            logits = jnp.einsum("bqhd,bqshd->bhqs", qh, kh)
        else:
            b, nq = logits.shape[0], logits.shape[2]
        vh = v.reshape(b, nq, -1, nh, vhd)
        mask = None if key_padding_mask is None else key_padding_mask[:, None, None, :]
        attn = _masked_softmax(logits, mask).astype(v.dtype)
        attn = nn.Dropout(self.dropout, deterministic=deterministic)(attn)
        out = jnp.einsum("bhqs,bqshd->bqhd", attn, vh).reshape(b, nq, self.vdim)
        return nn.Dense(self.vdim, dtype=self.dtype, name="out_proj")(out)


class ConvBlock(nn.Module):
    """3x3 conv + channel-LN + pointwise MLP residual block
    (dab_transformer.py:78-98); channels-last [N, H, W, C]."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (3, 3), padding=1, dtype=self.dtype, name="conv1")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="conv2")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="conv3")(y)
        return x + y


class LocDecoderLayer(nn.Module):
    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1
    keep_query_pos: bool = False
    n_levels: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.d_model
        dense = lambda name, out=d: nn.Dense(out, dtype=self.dtype, name=name)
        self.sa_qcontent_proj = dense("sa_qcontent_proj")
        self.sa_qpos_proj = dense("sa_qpos_proj")
        self.sa_kcontent_proj = dense("sa_kcontent_proj")
        self.sa_kpos_proj = dense("sa_kpos_proj")
        self.sa_v_proj = dense("sa_v_proj")
        self.self_attn = ProjFreeMHA(d, self.nhead, d, self.dropout, self.dtype,
                                     name="self_attn")
        self.norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")

        self.lvl_w_embed = dense("lvl_w_embed", self.n_levels)
        self.ca_qcontent_proj = dense("ca_qcontent_proj")
        self.ca_qpos_proj = dense("ca_qpos_proj")
        self.ca_kcontent_proj = dense("ca_kcontent_proj")
        self.ca_kpos_proj = dense("ca_kpos_proj")
        self.ca_v_proj = dense("ca_v_proj")
        self.ca_qpos_sine_proj = dense("ca_qpos_sine_proj")
        self.cross_attn = QuerySpecificMHA(2 * d, self.nhead, d, self.dropout,
                                           self.dtype, name="cross_attn")
        self.norm_ = nn.LayerNorm(dtype=self.dtype, name="norm_")
        self.linear1 = dense("linear1", self.dim_feedforward)
        self.linear2 = dense("linear2")
        self.norm2 = nn.LayerNorm(dtype=self.dtype, name="norm2")
        self.norm3 = nn.LayerNorm(dtype=self.dtype, name="norm3")
        self.drop = nn.Dropout(self.dropout)

    def __call__(
        self,
        tgt,                      # [BT, NQ, C]
        memory,                   # [BT, L, HW, C]
        memory_key_padding_mask,  # [BT, HW] True = pad
        pos,                      # [BT, L, HW, C]
        query_pos,                # [BT, NQ, C]
        query_sine_embed,         # [BT, NQ, C]
        is_first: bool,
        deterministic: bool = True,
    ):
        det = deterministic
        bt, nq, d = tgt.shape
        nh = self.nhead
        hd = d // nh

        # --- self attention over queries ---
        q = self.sa_qcontent_proj(tgt) + self.sa_qpos_proj(query_pos)
        k = self.sa_kcontent_proj(tgt) + self.sa_kpos_proj(query_pos)
        v = self.sa_v_proj(tgt)
        tgt2 = self.self_attn(q, k, v, deterministic=det)
        tgt = self.norm1(tgt + self.drop(tgt2, deterministic=det))

        # --- level mixing -> query-specific memory ---
        lvl_w = jax.nn.softmax(self.lvl_w_embed(tgt), axis=-1)
        q_memory = jnp.einsum("bnl,blsc->bnsc", lvl_w, memory)  # [BT, NQ, HW, C]
        q_memory = self.norm_(q_memory)

        # --- concat-key cross attention ---
        q_content = self.ca_qcontent_proj(tgt)
        k_content = self.ca_kcontent_proj(q_memory)
        v_mem = self.ca_v_proj(q_memory)
        k_pos = self.ca_kpos_proj(pos[:, 0])                     # [BT, HW, C]
        if is_first or self.keep_query_pos:
            q_content = q_content + self.ca_qpos_proj(query_pos)
            k_content = k_content + k_pos[:, None]

        qse = self.ca_qpos_sine_proj(query_sine_embed)
        # Concat-key attention, decomposed.  The reference builds per-head
        # [content_hd | sine_hd] queries against per-head
        # [k_content_hd | k_pos_hd] keys (dab_transformer.py:954-988 +
        # attention.py:379); the q·k dot over the 2*hd head then splits
        # exactly into a content term plus a positional term whose key side
        # is SHARED across queries — so the [BT, NQ, HW, 2d] broadcast-concat
        # key never has to be materialized.
        hw = k_content.shape[2]
        scale = float(2 * hd) ** -0.5
        logits = jnp.einsum(
            "bqhd,bqshd->bhqs",
            (q_content * scale).reshape(bt, nq, nh, hd),
            k_content.reshape(bt, nq, hw, nh, hd),
        ) + jnp.einsum(
            "bqhd,bshd->bhqs",
            (qse * scale).reshape(bt, nq, nh, hd),
            k_pos.reshape(bt, hw, nh, hd),
        )

        tgt2 = self.cross_attn(
            None, None, v_mem, key_padding_mask=memory_key_padding_mask,
            deterministic=det, logits=logits,
        )
        tgt = self.norm2(tgt + self.drop(tgt2, deterministic=det))
        tgt_temp = tgt

        # --- FFN ---
        tgt2 = self.linear2(self.drop(nn.relu(self.linear1(tgt)), deterministic=det))
        tgt = self.norm3(tgt + self.drop(tgt2, deterministic=det))
        return tgt, tgt_temp, q_memory


class ClsDecoderLayer(nn.Module):
    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1
    num_conv_blocks: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = self.d_model
        dense = lambda name, out=d: nn.Dense(out, dtype=self.dtype, name=name)
        self.cls_linear1 = dense("cls_linear1", self.dim_feedforward)
        self.cls_linear2 = dense("cls_linear2")
        self.cls_norm = nn.LayerNorm(dtype=self.dtype, name="cls_norm")
        self.conv_norm = nn.LayerNorm(dtype=self.dtype, name="conv_norm")
        # one shared block applied num_conv_blocks times (reference :1017-1018)
        self.conv_block = ConvBlock(d, self.dtype, name="conv_block")
        self.self_attn = ProjFreeMHA(d, self.nhead, d, self.dropout, self.dtype,
                                     name="self_attn")
        self.norm1 = nn.LayerNorm(dtype=self.dtype, name="norm1")
        self.k_proj = dense("k_proj")   # reference uses 1x1 Conv2d = pointwise
        self.v_proj = dense("v_proj")
        self.cls_qpos_sine_proj = dense("cls_qpos_sine_proj")
        self.cross_attn = ProjFreeMHA(2 * d, self.nhead, d, self.dropout,
                                      self.dtype, name="cross_attn")
        self.cls_linear1_ = dense("cls_linear1_", self.dim_feedforward)
        self.cls_linear2_ = dense("cls_linear2_")
        self.cls_norm_ = nn.LayerNorm(dtype=self.dtype, name="cls_norm_")
        self.drop = nn.Dropout(self.dropout)

    def __call__(
        self,
        actor_feature,       # [BT, NQ, C]  (already stop-gradient'ed)
        q_memory,            # [BT, NQ, HW, C]
        pos0,                # [BT, HW, C] level-0 positional embedding
        query_sine_embed,    # [BT, NQ, C]
        class_queries,       # [NC, C] (first layer) or [BT*NQ, NC, C]
        orig_res: Tuple[int, int],
        is_first: bool,
        deterministic: bool = True,
    ):
        det = deterministic
        bt, nq, d = actor_feature.shape
        h, w = orig_res
        hw = h * w

        # separate classification branch FFN
        af2 = self.cls_linear2(
            self.drop(nn.relu(self.cls_linear1(actor_feature)), deterministic=det)
        )
        actor_feature = self.cls_norm(
            actor_feature + self.drop(af2, deterministic=det)
        )

        # actor-centric conv features on the level-0 grid
        cls_feature = actor_feature[:, :, None, :] + q_memory    # [BT, NQ, HW, C]
        cls_feature = self.conv_norm(cls_feature)
        cls_feature = cls_feature.reshape(bt * nq, h, w, d)
        for _ in range(self.num_conv_blocks):
            cls_feature = self.conv_block(cls_feature)
        cls_feature = cls_feature.reshape(bt, nq, hw, d)

        # class-query self-attention (batch = BT*NQ, sequence = NC)
        if is_first:
            nc = class_queries.shape[0]
            query = jnp.broadcast_to(class_queries[None], (bt * nq, nc, d))
        else:
            query = class_queries
            nc = query.shape[1]
        q2 = self.self_attn(query, query, query, deterministic=det)
        query = self.norm1(query + self.drop(q2, deterministic=det))

        # cross-attention: class queries vs actor-conditioned conv features.
        # The reference concatenates [k_proj(conv_feats) | pos0] on the lane
        # axis and [class_query | sine_pos] on the query side
        # (dab_transformer.py:1067-1071); with the whole-lane concat the head
        # split puts content in heads [0, nh/2) and position in heads
        # [nh/2, nh).  Both positional sides are query-/class-independent, so
        # the pos-head logits are computed ONCE per (batch, actor) and
        # broadcast — the [BT*NQ, HW, 2d] key and [BT*NQ, NC, 2d] query
        # concats are never materialized.
        nh = self.nhead
        assert nh % 2 == 0, "decomposed concat-key attention needs even heads"
        hd2 = 2 * d // nh
        nhh = nh // 2
        scale = float(hd2) ** -0.5
        kc = self.k_proj(cls_feature).reshape(bt * nq, hw, nhh, hd2)
        logits_c = jnp.einsum(
            "bqhd,bshd->bhqs",
            (query * scale).reshape(bt * nq, nc, nhh, hd2), kc,
        )
        qp = self.cls_qpos_sine_proj(query_sine_embed)          # [BT, NQ, C]
        logits_p = jnp.einsum(
            "bnhd,bshd->bnhs",
            (qp * scale).reshape(bt, nq, nhh, hd2),
            pos0.reshape(bt, hw, nhh, hd2),
        )                                                        # [BT, NQ, nhh, HW]
        logits_p = jnp.broadcast_to(
            logits_p.reshape(bt * nq, nhh, 1, hw), (bt * nq, nhh, nc, hw)
        )
        logits = jnp.concatenate([logits_c, logits_p], axis=1)
        value = self.v_proj(q_memory).reshape(bt * nq, hw, d)
        cls_out = self.cross_attn(None, None, value, deterministic=det,
                                  logits=logits)

        # FFN
        co2 = self.cls_linear2_(
            self.drop(nn.relu(self.cls_linear1_(cls_out)), deterministic=det)
        )
        cls_out = self.cls_norm_(cls_out + self.drop(co2, deterministic=det))

        next_query = cls_out                                    # [BT*NQ, NC, C]
        cls_out = cls_out.reshape(bt, nq, nc, d)
        return cls_out, next_query


class TransformerDecoder(nn.Module):
    """Decoder loop: per layer, the loc/cls pair + DAB anchor embedding,
    query-scale transformation, modulated HW attention, and iterative box
    refinement with detached reference update
    (/root/reference/models/detr/dab_transformer.py:671-852)."""

    num_layers: int = 6
    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1
    num_classes: int = 80
    query_dim: int = 4
    keep_query_pos: bool = False
    modulate_hw_attn: bool = True
    bbox_embed_diff_each_layer: bool = False
    n_levels: int = 4
    dtype: jnp.dtype = jnp.float32
    # gradient-checkpoint each loc/cls layer pair (reference checkpoints
    # decoder pairs under CONFIG.GRADIENT_CHECKPOINTING,
    # /root/reference/models/detr/dab_transformer.py:765-801).  At JHMDB
    # T=40 the decoder batch is B*T with a 32x32 conv branch — the
    # likeliest OOM site for real training.
    remat: bool = False

    def setup(self):
        d = self.d_model
        loc_cls, cls_cls = LocDecoderLayer, ClsDecoderLayer
        if self.remat:
            loc_cls = nn.remat(LocDecoderLayer, static_argnums=(7, 8))
            cls_cls = nn.remat(ClsDecoderLayer, static_argnums=(6, 7, 8))
        self.layers = [
            loc_cls(d, self.nhead, self.dim_feedforward, self.dropout,
                    self.keep_query_pos, self.n_levels, self.dtype,
                    name=f"layers_{i}")
            for i in range(self.num_layers)
        ]
        self.cls_layers = [
            cls_cls(d, self.nhead, self.dim_feedforward, self.dropout,
                    dtype=self.dtype, name=f"cls_layers_{i}")
            for i in range(self.num_layers)
        ]
        self.norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        self.cls_norm2 = nn.LayerNorm(dtype=self.dtype, name="cls_norm2")
        # fp32 islands regardless of the serving dtype: the sine-embed
        # transformation chain and the iterative box refinement
        # (sigmoid/inverse_sigmoid round-trips) are precision-critical
        f32 = jnp.float32
        self.query_scale = MLP(d, d, 2, dtype=f32, name="query_scale")
        self.ref_point_head = MLP(d, d, 2, dtype=f32, name="ref_point_head")
        if self.modulate_hw_attn:
            self.ref_anchor_head = MLP(d, 2, 2, dtype=f32,
                                       name="ref_anchor_head")
        if self.bbox_embed_diff_each_layer:
            self.bbox_embed = [
                MLP(d, 4, 3, dtype=f32, name=f"bbox_embed_{i}")
                for i in range(self.num_layers)
            ]
        else:
            self.bbox_embed = MLP(d, 4, 3, dtype=f32, name="bbox_embed")
        self.class_queries = self.param(
            "class_queries", nn.initializers.normal(1.0),
            (self.num_classes, d),
        )

    def run_bbox_embed(self, layer_id, x):
        if self.bbox_embed_diff_each_layer:
            return self.bbox_embed[layer_id](x)
        return self.bbox_embed(x)

    def __call__(
        self,
        tgt,                      # [BT, NQ, C] zeros
        memory,                   # [BT, L, HW, C]
        memory_key_padding_mask,  # [BT, HW]
        pos,                      # [BT, L, HW, C]
        refpoints_unsigmoid,      # [BT, NQ, 4]
        orig_res: Tuple[int, int],
        deterministic: bool = True,
    ):
        d = self.d_model
        output = tgt
        reference_points = jax.nn.sigmoid(refpoints_unsigmoid)
        ref_points = [reference_points]
        class_queries = self.class_queries

        intermediate, cls_intermediate = [], []
        for layer_id in range(self.num_layers):
            obj_center = reference_points[..., : self.query_dim]
            query_sine_embed_full = sine_embed_for_position(obj_center, d // 2)
            query_pos = self.ref_point_head(query_sine_embed_full)

            if layer_id == 0:
                pos_transformation = 1.0
            else:
                pos_transformation = self.query_scale(output)
            query_sine_embed = query_sine_embed_full[..., :d] * pos_transformation

            if self.modulate_hw_attn:
                ref_hw = jax.nn.sigmoid(self.ref_anchor_head(output))  # [BT,NQ,2]
                scale_x = (ref_hw[..., 0] / obj_center[..., 2])[..., None]
                scale_y = (ref_hw[..., 1] / obj_center[..., 3])[..., None]
                query_sine_embed = jnp.concatenate(
                    [query_sine_embed[..., : d // 2] * scale_y,
                     query_sine_embed[..., d // 2:] * scale_x],
                    axis=-1,
                )

            output, actor_feature, q_memory = self.layers[layer_id](
                output, memory, memory_key_padding_mask, pos, query_pos,
                query_sine_embed, layer_id == 0, deterministic,
            )
            cls_output, class_queries = self.cls_layers[layer_id](
                jax.lax.stop_gradient(actor_feature), q_memory, pos[:, 0],
                query_sine_embed, class_queries, orig_res, layer_id == 0,
                deterministic,
            )

            # iterative box refinement (detached reference update, :813-823)
            tmp = self.run_bbox_embed(layer_id, output)
            new_reference_points = jax.nn.sigmoid(
                tmp[..., : self.query_dim] + inverse_sigmoid(reference_points)
            )
            if layer_id != self.num_layers - 1:
                ref_points.append(new_reference_points)
            reference_points = jax.lax.stop_gradient(new_reference_points)

            intermediate.append(self.norm(output))
            cls_intermediate.append(self.cls_norm2(cls_output))

        hs = jnp.stack(intermediate)             # [NL, BT, NQ, C]
        cls_hs = jnp.stack(cls_intermediate)     # [NL, BT, NQ, NC, C]
        references = jnp.stack(ref_points)       # [NL, BT, NQ, 4]
        return hs, cls_hs, references
