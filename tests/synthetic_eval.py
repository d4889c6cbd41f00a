"""Deterministic synthetic AVA eval world for the multi-process txt-merge
test (and reusable by other harnesses).

Same seed -> bit-identical batches/meta/forward outputs in every process,
so a 2-process sharded evaluation (per-rank txt files + barrier + rank-0
merge, reference /root/reference/utils/video_action_recognition.py:231-261)
must reproduce the single-process mAP exactly.

The "model" is a deterministic fake forward (a pure function of the
pixels) so the protocol is exercised without paying a model compile in
each worker process.
"""

import jax
import jax.numpy as jnp
import numpy as np

NQ, NC, T, H, W = 6, 8, 2, 16, 16


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _fake_boxes_scores(px_b):
    """Numpy mirror of fake_forward's query boxes/logits for ONE batch
    element — used so the GT overlaps some detections and mAP is
    meaningfully nonzero."""
    sig = float(px_b.mean())
    q = np.arange(NQ, dtype=np.float32)
    c = np.arange(NC, dtype=np.float32)
    logits = 2.0 * np.sin(sig * 5.0 + q[:, None] * 0.7 + c[None, :] * 1.3)
    cx = _sigmoid(np.sin(sig * 3.0 + q * 1.1))
    cy = _sigmoid(np.cos(sig * 2.0 + q * 0.9))
    wh = 0.1 + 0.2 * _sigmoid(np.sin(q))
    return cx, cy, wh, logits


def make_batches(n_batches=4, batch=2):
    r = np.random.default_rng(7)
    out = []
    for i in range(n_batches):
        px = r.normal(size=(batch, T, H, W, 3)).astype(np.float32)
        mk = np.zeros((batch, H, W), bool)
        meta = []
        for b in range(batch):
            # GT = the first 3 fake-forward query boxes (so detections
            # overlap GT and the Pascal AP is nonzero), labelled with each
            # query's argmax class
            cx, cy, wh, logits = _fake_boxes_scores(px[b])
            raw = np.zeros((3, 6), np.float32)
            labels = np.zeros((3, NC), np.float32)
            for a in range(3):
                raw[a, 2] = (cx[a] - wh[a] / 2) * W
                raw[a, 3] = (cy[a] - wh[a] / 2) * H
                raw[a, 4] = (cx[a] + wh[a] / 2) * W
                raw[a, 5] = (cy[a] + wh[a] / 2) * H
                labels[a, int(np.argmax(logits[a]))] = 1.0
            meta.append({
                "image_id": [f"v{i:03d},{b:02d}"],
                "size": np.asarray([H, W], np.float32),
                "raw_boxes": raw,
                "labels": labels,
            })
        out.append(({"pixels": px, "mask": mk}, meta))
    return out


def fake_forward(params, px, mk):
    """Deterministic pseudo-DETR head outputs from the pixel content."""
    del params, mk
    sig = px.mean(axis=(1, 2, 3, 4)).astype(jnp.float32)        # [B]
    q = jnp.arange(NQ, dtype=jnp.float32)
    c = jnp.arange(NC, dtype=jnp.float32)
    logits = 2.0 * jnp.sin(
        sig[:, None, None] * 5.0 + q[None, :, None] * 0.7 + c[None, None, :] * 1.3
    )
    cx = jax.nn.sigmoid(jnp.sin(sig[:, None] * 3.0 + q[None, :] * 1.1))
    cy = jax.nn.sigmoid(jnp.cos(sig[:, None] * 2.0 + q[None, :] * 0.9))
    wh = jnp.broadcast_to(0.1 + 0.2 * jax.nn.sigmoid(jnp.sin(q))[None, :],
                          cx.shape)
    boxes = jnp.stack([cx, cy, wh, wh], axis=-1)
    logits_b = jnp.stack(
        [jnp.cos(sig[:, None] + q[None, :]),
         jnp.sin(sig[:, None] * 2.0 + q[None, :]),
         jnp.zeros_like(cx)],
        axis=-1,
    )
    return {"pred_logits": logits, "pred_boxes": boxes,
            "pred_logits_b": logits_b}


def make_eval_cfg(base_path, res_dir):
    from class_query_vad_tpu.config import get_cfg_defaults

    cfg = get_cfg_defaults()
    cfg.CONFIG.DATA.DATASET_NAME = "ava"
    cfg.CONFIG.DATA.NUM_CLASSES = NC
    cfg.CONFIG.DATA.LABEL_PATH = ""
    cfg.CONFIG.LOG.BASE_PATH = str(base_path)
    cfg.CONFIG.LOG.RES_DIR = str(res_dir)
    return cfg
