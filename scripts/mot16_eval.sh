#!/usr/bin/env bash
# MOT16 evaluation harness — role of ref `modification_tracking/MOT16_eval/eval.sh`.
#
# Runs the tracker over each MOT16 train sequence (N-way parallel like the
# reference's job pool, ref eval.sh:72-95) and scores with TrackEval
# (CLEAR + Identity metrics, ref eval.sh:107-109).
#
# Usage: scripts/mot16_eval.sh <MOT16_ROOT> <TRACKEVAL_ROOT> [CKPT] [METHOD] [JOBS]
# Zero-egress note: MOT16 + TrackEval must already be on disk (the reference
# downloads them; we take paths).
set -euo pipefail

MOT16_ROOT=${1:?MOT16 root (contains train/MOT16-02 ...)}
TRACKEVAL=${2:?TrackEval repo root}
CKPT=${3:-}
METHOD=${4:-strongsort}
JOBS=${5:-2}

OUT=${OUT:-mot16_results}
mkdir -p "$OUT/data"

seqs=(MOT16-02 MOT16-04 MOT16-05 MOT16-09 MOT16-10 MOT16-11 MOT16-13)
running=0
for seq in "${seqs[@]}"; do
  det="$MOT16_ROOT/train/$seq/det/det.txt"
  frames="$MOT16_ROOT/train/$seq/img1"
  [ -f "$det" ] || { echo "missing $det"; exit 1; }
  python track.py \
    --detections "$det" \
    --frames_dir "$frames" \
    ${CKPT:+--ckpt "$CKPT"} \
    --tracking_method "$METHOD" \
    --save_txt "$OUT/data/$seq.txt" &
  running=$((running + 1))
  if [ "$running" -ge "$JOBS" ]; then wait -n; running=$((running - 1)); fi
done
wait

# TrackEval scoring (ref eval.sh:107-109)
python "$TRACKEVAL/scripts/run_mot_challenge.py" \
  --BENCHMARK MOT16 \
  --GT_FOLDER "$MOT16_ROOT/train" \
  --TRACKERS_FOLDER "$OUT" \
  --TRACKERS_TO_EVAL data \
  --METRICS CLEAR Identity \
  --USE_PARALLEL True \
  --NUM_PARALLEL_CORES "$JOBS"
