#!/bin/bash
# On-chip runs of the reference's own demo inputs with the reference
# README's command lines (/root/reference/README.md:113-138) — the de-facto
# acceptance suite (SURVEY §4). Random weights (released checkpoints absent
# in this environment), real mp4 decode → tile/window planning → denoise →
# chunked decode → color fix → mp4 write at REAL aspect ratios/frame counts.
#
# Records wall-clock per video; outputs land in results/demo/video/.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-results/demo}
mkdir -p "$OUT"

# aigc_1: 256x256 @ 47 frames, no tiling, propagation at 24,26,28
t0=$(date +%s.%N)
python -m upscale_a_video_tpu.cli \
    -i /root/reference/inputs/aigc_1.mp4 -o "$OUT" \
    -n 150 -g 6 -s 30 -p 24,26,28 --random_weights --no_llava 2>&1
echo "aigc_1 wall $(awk -v a="$t0" -v b="$(date +%s.%N)" 'BEGIN{printf "%.2f", b-a}')s"

# old_movie_1: 480x352 @ 27 frames -> auto-tiling (>=384^2), RAFT flows,
# propagation at 17,18,19 (README's own -p for this clip), wavelet fix
t0=$(date +%s.%N)
python -m upscale_a_video_tpu.cli \
    -i /root/reference/inputs/old_movie_1.mp4 -o "$OUT" \
    -n 100 -g 5 -s 20 -p 17,18,19 --color_fix Wavelet \
    --random_weights --no_llava 2>&1
echo "old_movie_1 wall $(awk -v a="$t0" -v b="$(date +%s.%N)" 'BEGIN{printf "%.2f", b-a}')s"
