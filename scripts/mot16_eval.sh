#!/usr/bin/env bash
# MOT16 evaluation harness — role of ref `modification_tracking/MOT16_eval/eval.sh`.
#
# Runs the tracker over each MOT16 train sequence (N-way parallel like the
# reference's job pool, ref eval.sh:72-95) and scores with CLEAR + Identity
# (ref eval.sh:107-109). Scoring defaults to the NATIVE TrackEval-exact
# evaluator (reid_tpu.tracking.metrics.evaluate_mot16: full 9-column gt
# parse, MotChallenge2DBox preprocessing — distractor-matched det removal,
# zero-mark + pedestrian filter, crowd exclusion — then CLEAR/Identity with
# a TrackEval-style COMBINED row). Pass TRACKEVAL=<repo root> to score with
# the external TrackEval instead.
#
# Usage: scripts/mot16_eval.sh <MOT16_ROOT> [CKPT] [METHOD] [JOBS]
# Zero-egress note: MOT16 must already be on disk (the reference downloads
# it; we take a path).
set -euo pipefail

MOT16_ROOT=${1:?MOT16 root (contains train/MOT16-02 ...)}
CKPT=${2:-}
METHOD=${3:-strongsort}
JOBS=${4:-2}
TRACKEVAL=${TRACKEVAL:-}

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

if [ -n "$TRACKEVAL" ]; then
  # external TrackEval scoring (ref eval.sh:107-109)
  python "$TRACKEVAL/scripts/run_mot_challenge.py" \
    --BENCHMARK MOT16 \
    --GT_FOLDER "$MOT16_ROOT/train" \
    --TRACKERS_FOLDER "$OUT" \
    --TRACKERS_TO_EVAL data \
    --METRICS CLEAR Identity \
    --USE_PARALLEL True \
    --NUM_PARALLEL_CORES "$JOBS"
else
  # native TrackEval-exact scoring
  MOT16_ROOT="$MOT16_ROOT" OUT="$OUT" python - <<'EOF'
import os

from reid_tpu.tracking.metrics import (combine_sequences,
                                       combine_sequences_hota, evaluate_mot16)

root, out = os.environ["MOT16_ROOT"], os.environ["OUT"]
seqs = ["MOT16-02", "MOT16-04", "MOT16-05", "MOT16-09", "MOT16-10",
        "MOT16-11", "MOT16-13"]
cols = ["MOTA", "MOTP", "IDF1", "IDP", "IDR", "IDSW", "Frag", "FP", "FN",
        "HOTA", "DetA", "AssA", "LocA"]
per = {}
for seq in seqs:
    per[seq] = evaluate_mot16(
        os.path.join(root, "train", seq, "gt", "gt.txt"),
        os.path.join(out, "data", seq + ".txt"),
        keep_hota_arrays=True)  # needed for combine_sequences_hota pooling
per["COMBINED"] = dict(
    combine_sequences({k: v for k, v in per.items() if k != "COMBINED"}),
    **combine_sequences_hota(
        {k: v for k, v in per.items() if k != "COMBINED"}))
print(f"{'seq':<10}" + "".join(f"{c:>9}" for c in cols))
for seq, m in per.items():
    print(f"{seq:<10}" + "".join(f"{m[c]:>9.3f}" for c in cols))
EOF
fi
