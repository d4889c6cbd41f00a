"""Hungarian matching on device.

Replaces the reference matchers (/root/reference/models/detr/matcher.py)
which ship every cost matrix to the CPU and call scipy per batch element /
per frame (:73-77, :172-174, :251-252).  Here the costs are computed in
float32 on device and solved with the jitted Jonker–Volgenant LSAP
(ops.lsap), vmapped over the batch (AVA) or batch×frame (UCF/JHMDB) axis —
no host sync in the training step.

Targets are static-shape masked arrays (XLA requirement):
* AVA:   boxes [B, M, 4] cxcywh, n_boxes [B] (valid count; cols >= n_boxes
         are padding).
* UCF:   boxes [B, A, T, 4]; a gt (b, a, t) is valid iff its (cy, w, h) are
         not all zero — the reference's validity test drops box[1:] == 0
         rows (matcher.py:153), where box[0] is the actor/track slot.
* JHMDB: boxes [B, 1, T, 4]; exactly one gt per frame (sizes = [1]*frames,
         matcher.py:240), no validity filter.

Returns per-query assignment arrays instead of index-tuples:
``gt_idx`` [.., NQ] (column matched to each query, garbage when invalid)
and ``match_ok`` [.., NQ] bool.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.lsap import linear_sum_assignment
from ..utils.box_ops import box_cxcywh_to_xyxy, generalized_box_iou, pairwise_l1


class MatchResult(NamedTuple):
    gt_idx: jnp.ndarray    # [..., NQ] int32
    match_ok: jnp.ndarray  # [..., NQ] bool


def _cost_matrix(pred_boxes, pred_logits_b, gt_boxes, cost_class, cost_bbox,
                 cost_giou):
    """pred_boxes [NQ, 4], pred_logits_b [NQ, 3], gt_boxes [M, 4] -> [NQ, M]
    float32 cost (matcher.py:64-72)."""
    pred_boxes = pred_boxes.astype(jnp.float32)
    gt_boxes = gt_boxes.astype(jnp.float32)
    c_bbox = pairwise_l1(pred_boxes, gt_boxes)
    c_giou = -generalized_box_iou(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(gt_boxes)
    )
    p_actor = jax.nn.softmax(pred_logits_b.astype(jnp.float32), axis=-1)[:, 1:2]
    c_class = -jnp.broadcast_to(p_actor, c_bbox.shape)
    return cost_bbox * c_bbox + cost_giou * c_giou + cost_class * c_class


def match_single(pred_boxes, pred_logits_b, gt_boxes, n_valid, cost_class,
                 cost_bbox, cost_giou) -> MatchResult:
    """One LSAP: queries [NQ] vs gts [M] with n_valid live columns."""
    cost = _cost_matrix(pred_boxes, pred_logits_b, gt_boxes, cost_class,
                        cost_bbox, cost_giou)
    nq = cost.shape[0]
    col4row, valid = linear_sum_assignment(cost, n_valid_cols=n_valid)
    return MatchResult(col4row[:nq].astype(jnp.int32), valid[:nq])


def match_ava(outputs, targets, cost_class, cost_bbox, cost_giou) -> MatchResult:
    """outputs: pred_boxes [B, NQ, 4], pred_logits_b [B, NQ, 3];
    targets: boxes [B, M, 4], n_boxes [B]."""
    fn = lambda pb, pl, gb, n: match_single(
        pb, pl, gb, n, cost_class, cost_bbox, cost_giou
    )
    return jax.vmap(fn)(
        outputs["pred_boxes"], outputs["pred_logits_b"],
        targets["boxes"], targets["n_boxes"],
    )


def frame_valid_gt(boxes: jnp.ndarray) -> jnp.ndarray:
    """boxes [..., A, 4] -> [..., A] bool: gt is live iff (cy, w, h) not all
    zero (matcher.py:153 keeps box[1:] != 0 where col 0 is cx of the 4-col
    slice — i.e. columns 1: of the original 5-col row)."""
    return ~jnp.all(boxes[..., 1:] == 0.0, axis=-1)


def match_frames(outputs, targets, cost_class, cost_bbox, cost_giou,
                 filter_empty: bool) -> MatchResult:
    """Per-frame matching for UCF (filter_empty=True) / JHMDB (False).

    outputs: pred_boxes [B, T, NQ, 4], pred_logits_b [B, T, NQ, 3].
    targets: boxes [B, A, T, 4], frame_valid [B, T] bool (un-padded frames).

    Invalid gts and padded frames are matched against PAD cost columns, so
    ``match_ok`` is False there; the reference simply never creates those
    LSAP columns — same assignments on the live submatrix.
    """
    boxes = jnp.swapaxes(targets["boxes"], 1, 2)        # [B, T, A, 4]
    a_slots = boxes.shape[2]
    if filter_empty:
        live = frame_valid_gt(boxes)                    # [B, T, A]
    else:
        live = jnp.ones(boxes.shape[:-1], bool)
    # mask out loader padding slots beyond the sample's real actor count
    # (the JHMDB reference has exactly one gt per frame — sizes = [1]*frames)
    if "n_actors" in targets:
        slot_live = (
            jnp.arange(a_slots)[None, :] < targets["n_actors"][:, None]
        )
        live = live & slot_live[:, None, :]
    live = live & targets["frame_valid"][:, :, None]

    def one(pb, pl, gb, gv):
        # Order-preserving compaction is unnecessary: cost columns for dead
        # gts get PAD cost via n_valid masking → emulate by +inf cost rows.
        cost = _cost_matrix(pb, pl, gb, cost_class, cost_bbox, cost_giou)
        cost = jnp.where(gv[None, :], cost, 1.0e4)
        nq = cost.shape[0]
        col4row, valid = linear_sum_assignment(cost)
        ok = valid[:nq] & jnp.take(gv, jnp.clip(col4row[:nq], 0, gv.shape[0] - 1))
        return MatchResult(col4row[:nq].astype(jnp.int32), ok)

    fn = jax.vmap(jax.vmap(one))
    return fn(outputs["pred_boxes"], outputs["pred_logits_b"], boxes, live)


def build_matcher(cfg):
    """Counterpart of /root/reference/models/detr/matcher.py:256-262."""
    mc = cfg.CONFIG.MATCHER
    name = cfg.CONFIG.DATA.DATASET_NAME
    cc, cb, cg = mc.COST_CLASS, mc.COST_BBOX, mc.COST_GIOU
    if name == "ava":
        return lambda outputs, targets: match_ava(outputs, targets, cc, cb, cg)
    if name == "ucf":
        return lambda outputs, targets: match_frames(
            outputs, targets, cc, cb, cg, filter_empty=True
        )
    if name == "jhmdb":
        return lambda outputs, targets: match_frames(
            outputs, targets, cc, cb, cg, filter_empty=False
        )
    raise ValueError(f"unknown dataset {name}")
