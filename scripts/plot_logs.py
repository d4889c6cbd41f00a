#!/usr/bin/env python
"""Plot training curves from MetricsLogger jsonl logs.

Counterpart of the reference's models/detr/util/plot_utils.py usage:
``python scripts/plot_logs.py <log_dir> [<log_dir> ...] --fields
train/total_loss mAP --out curves.png``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from class_query_vad_tpu.utils.plot_utils import plot_logs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log_dirs", nargs="+",
                    help="directories containing metrics.jsonl")
    ap.add_argument("--fields", nargs="+", default=["train/total_loss"])
    ap.add_argument("--out", default="curves.png")
    args = ap.parse_args()
    fig, _ = plot_logs(args.log_dirs, fields=tuple(args.fields))
    fig.savefig(args.out, dpi=120, bbox_inches="tight")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
