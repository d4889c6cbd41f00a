#!/usr/bin/env bash
# Extract 30 fps JPEG frames from each (15-minute) AVA segment into one
# directory per video, named <video>_%06d.jpg (reference
# datasets/extract_frame.sh; the AVA dataset loader indexes frames with
# this exact naming).
#
# Usage: extract_frame.sh <in_video_dir> <out_frame_dir>
set -euo pipefail

IN_DIR="${1:?usage: extract_frame.sh <in_video_dir> <out_frame_dir>}"
OUT_DIR="${2:?usage: extract_frame.sh <in_video_dir> <out_frame_dir>}"
mkdir -p "${OUT_DIR}"

for video in "${IN_DIR}"/*; do
  name="$(basename "${video}")"
  name="${name%.*}"                    # strip extension (.webm/.mp4/.mkv)
  mkdir -p "${OUT_DIR}/${name}"
  ffmpeg -i "${video}" -r 30 -q:v 1 "${OUT_DIR}/${name}/${name}_%06d.jpg"
done
