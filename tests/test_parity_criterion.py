"""Golden parity: our on-device matcher/criterion vs the PyTorch reference.

The reference criterion and matcher are pure CPU torch (scipy LSAP); we run
both stacks on identical random inputs and require the loss values to agree
to float32 precision.  This pins the full masked-array reformulation
(static shapes, vmapped LSAP) to the reference's loop-and-index semantics.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from class_query_vad_tpu.losses.criterion import criterion_ava, criterion_frames
from class_query_vad_tpu.losses.matcher import match_ava, match_frames

from reference_oracle import install_reference

install_reference()

from models.detr.matcher import (  # noqa: E402
    HungarianMatcherAVA,
    HungarianMatcherJHMDB,
    HungarianMatcherUCF,
)
from models.detr.criterion import (  # noqa: E402
    SetCriterionAVA,
    SetCriterionJHMDB,
    SetCriterionUCF,
)

COST_CLASS, COST_BBOX, COST_GIOU = 12.0, 5.0, 2.0
WEIGHT, EOS, ALPHA = 10.0, 0.1, 0.1


def _rand_boxes(rng, n):
    cxcy = rng.uniform(0.2, 0.8, size=(n, 2))
    wh = rng.uniform(0.05, 0.3, size=(n, 2))
    return np.concatenate([cxcy, wh], -1).astype(np.float32)


def _outputs_ava(rng, b, nq, nc, aux_layers=2):
    def one():
        return {
            "pred_logits": rng.normal(size=(b, nq, nc)).astype(np.float32),
            "pred_boxes": np.stack([_rand_boxes(rng, nq) for _ in range(b)]),
            "pred_logits_b": rng.normal(size=(b, nq, 3)).astype(np.float32),
        }

    out = one()
    out["aux_outputs"] = [one() for _ in range(aux_layers)]
    return out


def _to_torch_outputs(out):
    t = {k: torch.from_numpy(v) for k, v in out.items() if k != "aux_outputs"}
    t["aux_outputs"] = [
        {k: torch.from_numpy(v) for k, v in a.items()} for a in out["aux_outputs"]
    ]
    return t


def _to_jnp_outputs(out):
    j = {k: jnp.asarray(v) for k, v in out.items() if k != "aux_outputs"}
    j["aux_outputs"] = [
        {k: jnp.asarray(v) for k, v in a.items()} for a in out["aux_outputs"]
    ]
    return j


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ava_criterion_parity(seed):
    rng = np.random.default_rng(seed)
    b, nq, nc, max_m = 2, 15, 80, 12
    out = _outputs_ava(rng, b, nq, nc)

    n_boxes = [int(rng.integers(1, 9)) for _ in range(b)]
    boxes = [_rand_boxes(rng, n) for n in n_boxes]
    labels = [
        (rng.uniform(size=(n, nc)) < 0.05).astype(np.float32) for n in n_boxes
    ]
    for l in labels:  # ensure at least one positive per gt
        l[np.arange(len(l)), np.argmax(np.random.default_rng(0).uniform(size=(len(l), nc)), 1)] = 1.0

    # --- reference ---
    ref_targets = [
        {
            "boxes": torch.from_numpy(
                np.concatenate([np.zeros((n, 1), np.float32), bx], -1)
            ),
            "labels": torch.from_numpy(lb.copy()),
        }
        for n, bx, lb in zip(n_boxes, boxes, labels)
    ]
    matcher = HungarianMatcherAVA(COST_CLASS, COST_BBOX, COST_GIOU)
    crit = SetCriterionAVA(
        WEIGHT, nc, num_queries=nq, matcher=matcher, weight_dict={},
        eos_coef=EOS, losses=["labels", "boxes"], data_file="ava",
        evaluation=False, label_smoothing_alpha=ALPHA,
    )
    with torch.no_grad():
        ref_losses = crit(_to_torch_outputs(out), ref_targets)

    # --- ours ---
    boxes_pad = np.zeros((b, max_m, 4), np.float32)
    labels_pad = np.zeros((b, max_m, nc), np.float32)
    for i, (bx, lb) in enumerate(zip(boxes, labels)):
        boxes_pad[i, : len(bx)] = bx
        labels_pad[i, : len(lb)] = lb
    targets = {
        "boxes": jnp.asarray(boxes_pad),
        "labels": jnp.asarray(labels_pad),
        "n_boxes": jnp.asarray(n_boxes, jnp.int32),
    }
    # Inject the reference's assignment: LSAP optima are not unique under
    # float ties, so the loss math is compared on identical matchings while
    # the matcher itself is checked for cost-optimality below.
    def matcher_fn(o, t):
        t_out = {k: torch.from_numpy(np.asarray(v)) for k, v in o.items()
                 if k != "aux_outputs"}
        idx = matcher(t_out, ref_targets)
        gt_idx = np.zeros((b, nq), np.int32)
        ok = np.zeros((b, nq), bool)
        for i, (qi, gi) in enumerate(idx):
            gt_idx[i, qi.numpy()] = gi.numpy()
            ok[i, qi.numpy()] = True
        from class_query_vad_tpu.losses.matcher import MatchResult
        return MatchResult(jnp.asarray(gt_idx), jnp.asarray(ok))

    ours = criterion_ava(
        _to_jnp_outputs(out), targets, matcher_fn, nc,
        weight=WEIGHT, eos_coef=EOS, label_smoothing_alpha=ALPHA,
    )

    # our matcher must achieve the same optimal total cost as scipy's
    res = match_ava(_to_jnp_outputs(out), targets, COST_CLASS, COST_BBOX,
                    COST_GIOU)
    from class_query_vad_tpu.losses.matcher import _cost_matrix
    for i in range(b):
        cost = np.asarray(_cost_matrix(
            jnp.asarray(out["pred_boxes"][i]),
            jnp.asarray(out["pred_logits_b"][i]),
            jnp.asarray(boxes[i]), COST_CLASS, COST_BBOX, COST_GIOU,
        ))
        qi, gi = [x.numpy() for x in matcher(_to_torch_outputs(out), ref_targets)[i]]
        ref_total = cost[qi, gi].sum()
        ok = np.asarray(res.match_ok[i])
        our_total = cost[np.nonzero(ok)[0], np.asarray(res.gt_idx[i])[ok]].sum()
        assert np.isclose(ref_total, our_total, rtol=1e-4), (i, ref_total, our_total)

    for key in ["loss_ce", "loss_ce_b", "loss_bbox", "loss_giou",
                "loss_ce_0", "loss_bbox_1", "loss_giou_0", "loss_ce_b_1"]:
        ref_v = float(ref_losses[key])
        our_v = float(ours[key])
        assert np.isclose(ref_v, our_v, rtol=2e-4, atol=2e-5), (
            key, ref_v, our_v,
        )


@pytest.mark.parametrize("dataset", ["ucf", "jhmdb"])
@pytest.mark.parametrize("seed", [0, 1])
def test_frame_criterion_parity(dataset, seed):
    rng = np.random.default_rng(seed + (0 if dataset == "ucf" else 10))
    b, t, nq = 1, 8, 10
    nc = 24 if dataset == "ucf" else 21
    n_actors = 3 if dataset == "ucf" else 1
    front_pad, end_pad = 2, 1

    out = {
        "pred_logits": rng.normal(size=(b, t, nq, nc)).astype(np.float32),
        "pred_boxes": np.stack(
            [np.stack([_rand_boxes(rng, nq) for _ in range(t)])] * b
        ),
        "pred_logits_b": rng.normal(size=(b, t, nq, 3)).astype(np.float32),
    }
    out["aux_outputs"] = [
        {
            "pred_logits": rng.normal(size=(b, t, nq, nc)).astype(np.float32),
            "pred_boxes": np.stack(
                [np.stack([_rand_boxes(rng, nq) for _ in range(t)])] * b
            ),
            "pred_logits_b": rng.normal(size=(b, t, nq, 3)).astype(np.float32),
        }
    ]

    # gt tubes: boxes [A, T, 4]; invalid (padded) frames are all-zero rows
    boxes = np.zeros((n_actors, t, 4), np.float32)
    labels = np.full((n_actors, t), nc, np.int64)
    for a in range(n_actors):
        for f in range(front_pad, t - end_pad):
            if dataset == "jhmdb" or rng.uniform() > 0.25:
                boxes[a, f] = _rand_boxes(rng, 1)[0]
                labels[a, f] = rng.integers(0, nc)

    ref_targets = [
        {
            "boxes": torch.from_numpy(
                np.concatenate(
                    [np.zeros((n_actors * t, 1), np.float32),
                     boxes.reshape(n_actors * t, 4)], -1,
                )
            ),
            "labels": torch.from_numpy(labels.copy()),
            "front_pad": front_pad,
            "end_pad": end_pad,
        }
    ]

    if dataset == "ucf":
        matcher = HungarianMatcherUCF(COST_CLASS, COST_BBOX, COST_GIOU, clip_len=t)
        crit_cls = SetCriterionUCF
    else:
        matcher = HungarianMatcherJHMDB(COST_CLASS, COST_BBOX, COST_GIOU, clip_len=t)
        crit_cls = SetCriterionJHMDB
    crit = crit_cls(
        WEIGHT, nc, num_queries=nq, matcher=matcher, weight_dict={},
        eos_coef=EOS, losses=["labels", "boxes"], data_file=dataset,
        evaluation=False, label_smoothing_alpha=ALPHA,
    )
    with torch.no_grad():
        ref_losses = crit(_to_torch_outputs(out), ref_targets)

    frame_valid = np.zeros((b, t), bool)
    frame_valid[:, front_pad : t - end_pad] = True
    targets = {
        "boxes": jnp.asarray(boxes[None]),
        "labels": jnp.asarray(labels[None]),
        "frame_valid": jnp.asarray(frame_valid),
    }
    # inject the reference's per-frame assignment (see AVA test comment)
    live = ~np.all(boxes[..., 1:] == 0.0, axis=-1) if dataset == "ucf" else (
        np.ones((n_actors, t), bool)
    )

    def matcher_fn(o, tg):
        t_out = {k: torch.from_numpy(np.asarray(v)) for k, v in o.items()
                 if k != "aux_outputs"}
        idx = matcher(t_out, ref_targets)
        gt_idx = np.zeros((b, t, nq), np.int32)
        ok = np.zeros((b, t, nq), bool)
        if idx is not None:
            for f_rel, (qi, gi) in enumerate(idx):
                f = front_pad + f_rel
                slots = np.nonzero(live[:, f])[0]
                for q, g in zip(qi.numpy(), gi.numpy()):
                    gt_idx[0, f, q] = slots[g]
                    ok[0, f, q] = True
        from class_query_vad_tpu.losses.matcher import MatchResult
        return MatchResult(jnp.asarray(gt_idx), jnp.asarray(ok))

    ours = criterion_frames(
        _to_jnp_outputs(out), targets, matcher_fn, nc,
        weight=WEIGHT, eos_coef=EOS, label_smoothing_alpha=ALPHA,
        jhmdb=(dataset == "jhmdb"),
    )

    # real matcher must land on matchings with identical match counts
    res = match_frames(
        _to_jnp_outputs(out), targets, COST_CLASS, COST_BBOX, COST_GIOU,
        filter_empty=(dataset == "ucf"),
    )
    ref_res = matcher_fn(_to_jnp_outputs(out), targets)
    assert int(np.asarray(res.match_ok).sum()) == int(
        np.asarray(ref_res.match_ok).sum()
    )

    for key in ["loss_ce", "loss_ce_b", "loss_bbox", "loss_giou",
                "loss_ce_0", "loss_bbox_0", "loss_giou_0"]:
        ref_v = float(ref_losses[key])
        our_v = float(ours[key])
        assert np.isclose(ref_v, our_v, rtol=2e-4, atol=2e-5), (
            key, ref_v, our_v,
        )
