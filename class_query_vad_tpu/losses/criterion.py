"""Set criteria (AVA / UCF / JHMDB) — fully vectorized, on-device.

Parity reference: /root/reference/models/detr/criterion.py.  The reference
builds targets with python loops over list-of-dict targets and in-place
index assignment; here everything is masked static-shape array math so the
whole loss lives inside one jit (including the Hungarian matching).

Loss semantics pinned against the reference:
* AVA ``loss_labels`` (:50-102): CE actorness loss over 3 classes with
  empty-class weight ``eos_coef`` (target 1 = matched, 2 = no-actor);
  multilabel sigmoid-focal loss with label smoothing α: true→(1-α)+α/2,
  false→α/2, matched-query weight ``weight`` (10), normalized by
  n_p = max(Σ raw positive labels, 1); at evaluation plain BCE mean (:88-89).
* AVA ``loss_boxes`` (:118-137): L1 + GIoU over matched pairs / num_boxes
  (total gt count in batch).
* UCF (:261-409): per-frame targets; the class focal loss runs on the FUSED
  logit ``inverse_sigmoid(softmax(logits_b)[...,1:2] * sigmoid(logits))``
  (:320) over ALL frames (padded frames supervise background), normalized
  by bs*t; boxes only over valid gts / num_valid_boxes.
* JHMDB (:536-649): same but the focal loss is sliced to valid frames and
  normalized by valid_len; exactly one gt per frame.
* aux losses: re-match and repeat per decoder layer (:210-223).

``sigmoid_focal_loss`` matches segmentation.py:200-229 (α=0.25, γ=2,
weights multiply the BCE term before the modulating factor, mean over the
class axis then sum).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from ..utils.box_ops import box_cxcywh_to_xyxy, generalized_box_iou
from ..utils.misc import inverse_sigmoid
from .matcher import MatchResult, frame_valid_gt


def dice_loss(inputs: jnp.ndarray, targets: jnp.ndarray,
              num_boxes: float) -> jnp.ndarray:
    """DICE/F-1 loss for masks (reference models/detr/segmentation.py:182-198;
    kept for parity with the segmentation head surface)."""
    probs = jax.nn.sigmoid(inputs).reshape(inputs.shape[0], -1)
    targets = targets.reshape(targets.shape[0], -1)
    numerator = 2.0 * (probs * targets).sum(-1)
    denominator = probs.sum(-1) + targets.sum(-1)
    loss = 1.0 - (numerator + 1.0) / (denominator + 1.0)
    return loss.sum() / num_boxes


def sigmoid_focal_loss(inputs, targets, weights=None, alpha=0.25, gamma=2.0,
                       elem_mask=None):
    """Reference semantics (segmentation.py:200-229): per-element focal
    terms, mean over the last axis, sum over the rest.  ``elem_mask``
    (broadcastable to inputs[:-1]) zeroes masked rows before the sum —
    used for JHMDB's valid-frame slicing."""
    inputs = inputs.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    prob = jax.nn.sigmoid(inputs)
    ce = jnp.clip(inputs, 0) - inputs * targets + jnp.log1p(
        jnp.exp(-jnp.abs(inputs))
    )
    if weights is not None:
        ce = ce * weights
    p_t = prob * targets + (1.0 - prob) * (1.0 - targets)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    loss = loss.mean(axis=-1)
    if elem_mask is not None:
        loss = loss * elem_mask
    return loss.sum()


def weighted_cross_entropy(logits, labels, class_weights):
    """F.cross_entropy with per-class weights: weighted mean
    Σ w[y_i]·nll_i / Σ w[y_i]."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = class_weights[labels]
    return (w * nll).sum() / w.sum()


def _gather_matched(values: jnp.ndarray, match: MatchResult) -> jnp.ndarray:
    """Gather per-gt values at each query's matched gt slot.

    values [..., M, D]; match.gt_idx [..., NQ] -> [..., NQ, D] (exact
    take_along_axis gather — NOT a one-hot matmul, which on TPU would run at
    bf16 matmul precision and break loss parity).  Unmatched entries carry
    slot-0 garbage; callers mask with match_ok.
    """
    idx = jnp.clip(match.gt_idx, 0, values.shape[-2] - 1)
    return jnp.take_along_axis(values, idx[..., None], axis=-2)


def _box_losses(src_boxes, tgt_boxes, pair_ok, denom):
    """Masked L1 + GIoU over matched (query, gt) pairs.

    src_boxes/tgt_boxes: [..., 4] aligned pairs; pair_ok: [...] bool.
    """
    ok = pair_ok.astype(jnp.float32)
    src = src_boxes.astype(jnp.float32)
    tgt = tgt_boxes.astype(jnp.float32)
    l1 = (jnp.abs(src - tgt).sum(-1) * ok).sum() / denom
    giou = generalized_box_iou(
        box_cxcywh_to_xyxy(src)[..., None, :], box_cxcywh_to_xyxy(tgt)[..., None, :]
    )[..., 0, 0]
    giou_loss = ((1.0 - giou) * ok).sum() / denom
    return l1, giou_loss


# --------------------------------------------------------------------------
# AVA
# --------------------------------------------------------------------------

def criterion_ava(
    outputs: Dict,
    targets: Dict,
    matcher: Callable,
    num_classes: int,
    weight: float = 10.0,
    eos_coef: float = 0.1,
    label_smoothing_alpha: float = 0.1,
    evaluation: bool = False,
) -> Dict[str, jnp.ndarray]:
    """targets: boxes [B, M, 4] cxcywh, labels [B, M, NC] multi-hot,
    n_boxes [B]."""
    num_boxes = jnp.maximum(targets["n_boxes"].sum().astype(jnp.float32), 1.0)

    def layer_losses(out):
        match = matcher(out, targets)                 # [B, NQ]
        matched = match.match_ok.astype(jnp.float32)  # [B, NQ]

        # actorness CE: 1 matched / 2 empty, weights [1, 1, eos]
        tgt_b = jnp.where(match.match_ok, 1, 2)
        cw = jnp.array([1.0, 1.0, eos_coef], jnp.float32)
        loss_ce_b = weighted_cross_entropy(out["pred_logits_b"], tgt_b, cw)

        # multilabel focal
        raw_labels = (
            _gather_matched(targets["labels"].astype(jnp.float32), match)
            * matched[..., None]
        )                                             # [B, NQ, NC]
        n_p = jnp.maximum(raw_labels.sum(), 1.0)
        a = label_smoothing_alpha
        true_l, false_l = (1 - a) + a / 2, a / 2
        smoothed = raw_labels * true_l + (1 - raw_labels) * false_l
        target_classes = jnp.where(
            match.match_ok[..., None], smoothed, false_l
        )
        logits = out["pred_logits"].astype(jnp.float32)
        if evaluation:
            p = jax.nn.sigmoid(logits)
            eps = 1e-12
            loss_ce = -(
                target_classes * jnp.log(jnp.clip(p, eps))
                + (1 - target_classes) * jnp.log(jnp.clip(1 - p, eps))
            ).mean()
        else:
            weights = jnp.where(match.match_ok, weight, 1.0)[..., None]
            loss_ce = sigmoid_focal_loss(logits, target_classes, weights) / n_p

        # boxes
        gt_boxes = _gather_matched(targets["boxes"].astype(jnp.float32), match)
        l1, giou = _box_losses(out["pred_boxes"], gt_boxes, match.match_ok,
                               num_boxes)
        return {
            "loss_ce": loss_ce, "loss_ce_b": loss_ce_b,
            "loss_bbox": l1, "loss_giou": giou,
        }

    losses = layer_losses({k: v for k, v in outputs.items() if k != "aux_outputs"})
    for i, aux in enumerate(outputs.get("aux_outputs", [])):
        for k, v in layer_losses(aux).items():
            losses[f"{k}_{i}"] = v
    return losses


# --------------------------------------------------------------------------
# UCF / JHMDB (per-frame tube criteria)
# --------------------------------------------------------------------------

def criterion_frames(
    outputs: Dict,
    targets: Dict,
    matcher: Callable,
    num_classes: int,
    weight: float = 10.0,
    eos_coef: float = 0.1,
    label_smoothing_alpha: float = 0.1,
    jhmdb: bool = False,
) -> Dict[str, jnp.ndarray]:
    """targets: boxes [B, A, T, 4], labels [B, A, T] int (num_classes =
    background), frame_valid [B, T] bool."""
    b, t, nq = outputs["pred_logits"].shape[:3]
    a_slots = targets["boxes"].shape[1]
    frame_valid = targets["frame_valid"]                       # [B, T]
    boxes_t = jnp.swapaxes(targets["boxes"], 1, 2)             # [B, T, A, 4]
    labels_t = jnp.swapaxes(targets["labels"], 1, 2)           # [B, T, A]

    if jhmdb:
        live_gt = jnp.ones(boxes_t.shape[:-1], bool) & frame_valid[:, :, None]
    else:
        live_gt = frame_valid_gt(boxes_t) & frame_valid[:, :, None]
    if "n_actors" in targets:
        slot_live = (
            jnp.arange(a_slots)[None, :] < targets["n_actors"][:, None]
        )
        live_gt = live_gt & slot_live[:, None, :]
    num_valid_boxes = jnp.maximum(live_gt.sum().astype(jnp.float32), 1.0)

    def _sequential_pairing(match_ok):
        """Reference quirk (criterion.py:296-303,380-398): the UCF/JHMDB
        losses do NOT use the matcher's column permutation — they assign the
        k-th matched query (ascending query index; scipy returns sorted
        rows) to the k-th valid gt in actor-slot order.  Reproduce exactly:
        rank each matched query, then map rank -> k-th live slot."""
        rank = jnp.cumsum(match_ok, axis=-1) - 1               # [B, T, NQ]
        order = jnp.argsort(jnp.where(live_gt, 0, 1), axis=-1,
                            stable=True)                        # [B, T, A]
        idx = jnp.clip(rank, 0, live_gt.shape[-1] - 1)
        return jnp.take_along_axis(order, idx, axis=-1)

    def layer_losses(out):
        raw = matcher(out, targets)                    # [B, T, NQ]
        matched = raw.match_ok                         # [B, T, NQ]
        match = MatchResult(_sequential_pairing(matched), matched)

        # actorness CE over all frames
        tgt_b = jnp.where(matched, 1, 2)
        cw = jnp.array([1.0, 1.0, eos_coef], jnp.float32)
        loss_ce_b = weighted_cross_entropy(
            out["pred_logits_b"].reshape(b * t, nq, 3),
            tgt_b.reshape(b * t, nq), cw,
        )

        # per-query class targets (background where unmatched)
        gt_label = _gather_matched(
            labels_t[..., None].astype(jnp.int32), match
        )[..., 0]                                      # [B, T, NQ]
        tgt_cls = jnp.where(matched, gt_label, num_classes)
        onehot = jax.nn.one_hot(tgt_cls, num_classes + 1, dtype=jnp.float32)
        a = label_smoothing_alpha
        true_l = (1 - a) + a / num_classes
        false_l = a / num_classes
        onehot = onehot * (true_l - false_l) + false_l

        # Reference quirk (criterion.py:315-318,578-581): the matched-query
        # upweighting indexes the FULL-length weight rows with the
        # valid-range-relative frame indices (no front_pad slice), so the
        # 10x weights land at frame f - front_pad.  Reproduce via a shift.
        front_pad = jnp.argmax(frame_valid.astype(jnp.int32), axis=1)      # [B]
        shift_idx = jnp.arange(t)[None, :] + front_pad[:, None]            # [B, T]
        shifted = jnp.take_along_axis(
            matched.astype(jnp.int32),
            jnp.broadcast_to(
                jnp.clip(shift_idx, 0, t - 1)[..., None], (b, t, nq)
            ),
            axis=1,
        ) * (shift_idx[..., None] < t)
        weights = jnp.where(shifted.astype(bool), weight, 1.0)[..., None]
        logits = out["pred_logits"].astype(jnp.float32)
        p_b = jax.nn.softmax(
            out["pred_logits_b"].astype(jnp.float32), axis=-1
        )[..., 1:2]
        fused = inverse_sigmoid(jax.nn.sigmoid(logits) * p_b)

        if jhmdb:
            valid_len = jnp.maximum(frame_valid.sum(1), 1).astype(jnp.float32)
            # reference: slice to valid frames, / valid_len (batch size 1)
            loss_ce = sigmoid_focal_loss(
                fused, onehot[..., :-1], weights,
                elem_mask=frame_valid[:, :, None],
            ) / valid_len.mean()
        else:
            loss_ce = sigmoid_focal_loss(fused, onehot[..., :-1], weights) / (b * t)

        # boxes over matched pairs
        gt_boxes = _gather_matched(boxes_t.astype(jnp.float32), match)
        l1, giou = _box_losses(
            out["pred_boxes"], gt_boxes, matched, num_valid_boxes
        )
        return {
            "loss_ce": loss_ce, "loss_ce_b": loss_ce_b,
            "loss_bbox": l1, "loss_giou": giou,
        }

    losses = layer_losses({k: v for k, v in outputs.items() if k != "aux_outputs"})
    for i, aux in enumerate(outputs.get("aux_outputs", [])):
        for k, v in layer_losses(aux).items():
            losses[f"{k}_{i}"] = v
    return losses


# --------------------------------------------------------------------------
# Postprocessors (criterion.py:740-845)
# --------------------------------------------------------------------------

def postprocess_ava(outputs, target_sizes):
    """-> (scores [B, NQ, NC], boxes xyxy abs [B, NQ, 4], actorness [B, NQ, 1])."""
    prob = jax.nn.sigmoid(outputs["pred_logits"].astype(jnp.float32))
    boxes = box_cxcywh_to_xyxy(outputs["pred_boxes"].astype(jnp.float32))
    img_h, img_w = target_sizes[:, 0], target_sizes[:, 1]
    scale = jnp.stack([img_w, img_h, img_w, img_h], axis=1)[:, None, :]
    actor = jax.nn.softmax(
        outputs["pred_logits_b"].astype(jnp.float32), axis=-1
    )[..., 1:2]
    return prob, boxes * scale, actor


def postprocess_frames(outputs, target_sizes):
    """UCF/JHMDB: fused score inverse_sigmoid(sig(logits)*p_b).sigmoid()
    (criterion.py:793-794).  Shapes keep the [B, T, NQ, ...] layout."""
    p_b = jax.nn.softmax(
        outputs["pred_logits_b"].astype(jnp.float32), axis=-1
    )[..., 1:2]
    prob = jax.nn.sigmoid(
        inverse_sigmoid(jax.nn.sigmoid(outputs["pred_logits"].astype(jnp.float32)) * p_b)
    )
    boxes = box_cxcywh_to_xyxy(outputs["pred_boxes"].astype(jnp.float32))
    img_h, img_w = target_sizes[:, 0], target_sizes[:, 1]
    scale = jnp.stack([img_w, img_h, img_w, img_h], axis=1)[:, None, None, :]
    return prob, boxes * scale, p_b


# --------------------------------------------------------------------------
# builder
# --------------------------------------------------------------------------

def build_criterion_and_postprocessor(cfg, matcher):
    """Counterpart of criterion.py:861-900.  Returns (criterion_fn,
    postprocess_fn, weight_dict)."""
    lc = cfg.CONFIG.LOSS_COFS
    weight_dict = {
        "loss_ce": lc.DICE_COF,
        "loss_bbox": lc.BBOX_COF,
        "loss_giou": lc.GIOU_COF,
        "loss_ce_b": lc.PERSON_COF,
    }
    name = cfg.CONFIG.DATA.DATASET_NAME
    nc = cfg.CONFIG.DATA.NUM_CLASSES
    common = dict(
        matcher=matcher,
        num_classes=nc,
        weight=lc.WEIGHT,
        eos_coef=lc.EOS_COF,
        label_smoothing_alpha=cfg.CONFIG.MODEL.LABEL_SMOOTHING_ALPHA,
    )
    if name == "ava":
        crit = lambda o, t, evaluation=False: criterion_ava(
            o, t, evaluation=evaluation, **common
        )
        post = postprocess_ava
    else:
        crit = lambda o, t, evaluation=False: criterion_frames(
            o, t, jhmdb=(name == "jhmdb"), **common
        )
        post = postprocess_frames
    return crit, post, weight_dict
