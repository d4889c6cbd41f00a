"""Training-log plotting (reference models/detr/util/plot_utils.py).

The reference plots fields from DETR-style ``log.txt`` JSON-lines; this
framework's :class:`..utils.logging.MetricsLogger` writes the same shape to
``metrics.jsonl``.  matplotlib is optional (not part of the baked TPU
image) — functions raise a clear ImportError when it is missing.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Sequence


def load_log(log_dir: str, log_name: str = "metrics.jsonl") -> List[Dict]:
    """Parse a JSON-lines metrics log into a list of dicts."""
    rows = []
    with open(os.path.join(log_dir, log_name)) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                rows.append(json.loads(line))
    return rows


def _require_matplotlib():
    try:
        import matplotlib.pyplot as plt  # noqa: F401

        return plt
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "plot_utils needs matplotlib; install it or read the "
            "metrics.jsonl files directly"
        ) from e


def plot_logs(
    logs: Sequence[str],
    fields: Iterable[str] = ("total_loss", "loss_bbox", "mAP"),
    ewm_alpha: float = 0.0,
    log_name: str = "metrics.jsonl",
):
    """Plot ``fields`` from one or more experiment dirs, one subplot per
    field, one color per experiment (reference plot_logs semantics with
    pandas/seaborn replaced by stdlib + matplotlib)."""
    if isinstance(logs, (str, os.PathLike)):
        logs = [logs]
    plt = _require_matplotlib()
    fields = list(fields)
    fig, axs = plt.subplots(ncols=len(fields), figsize=(5 * len(fields), 4))
    if len(fields) == 1:
        axs = [axs]
    for log_dir in logs:
        rows = load_log(str(log_dir), log_name)
        for ax, field in zip(axs, fields):
            ys = [r[field] for r in rows if field in r]
            if ewm_alpha > 0:
                sm, out = None, []
                for y in ys:
                    sm = y if sm is None else ewm_alpha * sm + (1 - ewm_alpha) * y
                    out.append(sm)
                ys = out
            ax.plot(ys, label=os.path.basename(str(log_dir)))
            ax.set_title(field)
            ax.legend()
    return fig, axs


def plot_precision_recall(files: Sequence[str]):
    """Plot precision/recall curves saved as .npz with ``precision``,
    ``recall`` and ``ap`` arrays (reference plot_precision_recall on
    coco-eval .pth files, re-homed to numpy archives)."""
    import numpy as np

    plt = _require_matplotlib()
    fig, axs = plt.subplots(ncols=2, figsize=(10, 4))
    for f in files:
        data = np.load(f)
        prec, rec = data["precision"], data["recall"]
        axs[0].plot(rec, prec, label=os.path.basename(str(f)))
        axs[1].plot(rec, label=os.path.basename(str(f)))
        print(
            f"{os.path.basename(str(f))}: mAP={float(data['ap']):.3f} "
            f"score={float(prec.mean()):.3f}"
        )
    axs[0].set_title("Precision / Recall")
    axs[1].set_title("Recall vs results")
    for ax in axs:
        ax.legend()
    return fig, axs
