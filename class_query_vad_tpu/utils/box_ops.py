"""Bounding-box operations in pure jax.numpy.

Functional parity with the reference box utilities
(/root/reference/utils/box_ops.py:25-165), written shape-polymorphic so the
same functions serve the matcher, criterion, and postprocessors under jit.
All functions broadcast over arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(x: jnp.ndarray) -> jnp.ndarray:
    xc, yc, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [xc - 0.5 * w, yc - 0.5 * h, xc + 0.5 * w, yc + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(x: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1
    )


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of [..., 4] xyxy boxes."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Pairwise IoU.

    boxes1: [..., N, 4], boxes2: [..., M, 4] (xyxy) -> iou, union [..., N, M].
    """
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)

    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, min=0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    iou = inter / union
    return iou, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU (https://giou.stanford.edu/) for xyxy boxes.

    Unlike the reference (which asserts on degenerate boxes,
    /root/reference/utils/box_ops.py), degenerate inputs simply produce the
    algebraic result — static-shape padding rows are masked out by callers.
    """
    iou, union = box_iou(boxes1, boxes2)

    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, min=0.0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


def pairwise_l1(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """cdist(.., p=1): boxes1 [..., N, 4] x boxes2 [..., M, 4] -> [..., N, M]."""
    return jnp.abs(boxes1[..., :, None, :] - boxes2[..., None, :, :]).sum(-1)


def batched_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """IoU with a leading batch axis: [B, N, 4] x [B, M, 4] -> [B, N, M]
    (reference utils/box_ops.py:96-122)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter / union, union


def batched_generalized_box_iou(
    boxes1: jnp.ndarray, boxes2: jnp.ndarray
) -> jnp.ndarray:
    """Batched GIoU [B, N, M] (reference utils/box_ops.py:125-141)."""
    iou, union = batched_box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """Bounding boxes (xyxy) around binary masks [N, H, W] -> [N, 4]
    (reference utils/box_ops.py:144-165)."""
    if masks.size == 0:
        return jnp.zeros((0, 4), jnp.float32)
    h, w = masks.shape[-2:]
    y = jnp.arange(h, dtype=jnp.float32)[:, None]
    x = jnp.arange(w, dtype=jnp.float32)[None, :]
    m = masks.astype(jnp.float32)
    x_max = (m * x).reshape(m.shape[0], -1).max(-1)
    x_min = jnp.where(masks.astype(bool), x, 1e8).reshape(m.shape[0], -1).min(-1)
    y_max = (m * y).reshape(m.shape[0], -1).max(-1)
    y_min = jnp.where(masks.astype(bool), y, 1e8).reshape(m.shape[0], -1).min(-1)
    return jnp.stack([x_min, y_min, x_max, y_max], 1)
