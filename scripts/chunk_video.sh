#!/usr/bin/env bash
# Cut the 15-minute AVA evaluation segment (minute 15 to minute 30) out of
# each full movie with ffmpeg.  TPU-framework port of the reference's AVA
# preprocessing step (reference datasets/chunk_video.sh).
#
# Usage: chunk_video.sh <in_video_dir> <out_video_dir>
set -euo pipefail

IN_DIR="${1:?usage: chunk_video.sh <in_video_dir> <out_video_dir>}"
OUT_DIR="${2:?usage: chunk_video.sh <in_video_dir> <out_video_dir>}"
mkdir -p "${OUT_DIR}"

for video in "${IN_DIR}"/*; do
  out="${OUT_DIR}/$(basename "${video}")"
  # AVA annotates seconds 902-1798; grab 15:00 + 901 s like the reference
  [ -f "${out}" ] || ffmpeg -ss 900 -t 901 -i "${video}" "${out}"
done
