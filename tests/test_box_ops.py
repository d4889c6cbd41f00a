import jax.numpy as jnp
import numpy as np

from class_query_vad_tpu.utils import box_ops


def _np_giou(b1, b2):
    """Straightforward numpy GIoU oracle."""
    n, m = len(b1), len(b2)
    out = np.zeros((n, m))
    for i in range(n):
        for j in range(m):
            ax0, ay0, ax1, ay1 = b1[i]
            bx0, by0, bx1, by1 = b2[j]
            inter_w = max(0.0, min(ax1, bx1) - max(ax0, bx0))
            inter_h = max(0.0, min(ay1, by1) - max(ay0, by0))
            inter = inter_w * inter_h
            a1 = (ax1 - ax0) * (ay1 - ay0)
            a2 = (bx1 - bx0) * (by1 - by0)
            union = a1 + a2 - inter
            iou = inter / union
            cw = max(ax1, bx1) - min(ax0, bx0)
            ch = max(ay1, by1) - min(ay0, by0)
            c = cw * ch
            out[i, j] = iou - (c - union) / c
    return out


def test_cxcywh_roundtrip(rng):
    boxes = rng.uniform(0.1, 0.9, size=(17, 4)).astype(np.float32)
    xyxy = box_ops.box_cxcywh_to_xyxy(jnp.asarray(boxes))
    back = box_ops.box_xyxy_to_cxcywh(xyxy)
    np.testing.assert_allclose(np.asarray(back), boxes, rtol=1e-5, atol=1e-6)


def test_giou_matches_oracle(rng):
    c1 = rng.uniform(0.2, 0.8, size=(6, 4)).astype(np.float32)
    c2 = rng.uniform(0.2, 0.8, size=(9, 4)).astype(np.float32)
    c1[:, 2:] = rng.uniform(0.05, 0.3, size=(6, 2))
    c2[:, 2:] = rng.uniform(0.05, 0.3, size=(9, 2))
    b1 = np.asarray(box_ops.box_cxcywh_to_xyxy(jnp.asarray(c1)))
    b2 = np.asarray(box_ops.box_cxcywh_to_xyxy(jnp.asarray(c2)))
    got = np.asarray(box_ops.generalized_box_iou(jnp.asarray(b1), jnp.asarray(b2)))
    want = _np_giou(b1, b2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_giou_batched(rng):
    b = rng.uniform(0.2, 0.5, size=(3, 5, 4)).astype(np.float32)
    b2 = b + 0.1
    got = box_ops.generalized_box_iou(jnp.asarray(b), jnp.asarray(b2))
    assert got.shape == (3, 5, 5)


def test_pairwise_l1(rng):
    a = rng.normal(size=(4, 4)).astype(np.float32)
    b = rng.normal(size=(7, 4)).astype(np.float32)
    got = np.asarray(box_ops.pairwise_l1(jnp.asarray(a), jnp.asarray(b)))
    want = np.abs(a[:, None] - b[None]).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
