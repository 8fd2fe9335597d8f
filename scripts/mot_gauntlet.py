"""Hard-gauntlet MOT regression gate (VERDICT r4 #2).

Generates the distractor-rich crowd scene (examples/gauntlet.py) in MOT16
on-disk format and drives it END-TO-END through the product path:
`cli.track_main` (real SERes18 embeddings, chunked tracker, --gt scoring
via load_mot_gt -> preprocess_mot -> CLEAR/Identity/HOTA). This is the
scene where `preprocess_mot` runs in anger: distractor-matched det
removal, zero-marked rows, crowd-class exclusion, all live.

Usage:
    python scripts/mot_gauntlet.py                 # all 5 methods, table
    python scripts/mot_gauntlet.py strongsort      # one method
    python scripts/mot_gauntlet.py --variants      # + int8/fastcrop/ds2
    python scripts/mot_gauntlet.py --check         # enforce pinned bands

--check bands are pinned from the 2026-08-19 on-chip run (EVAL.md "Hard
gauntlet"); they are wide enough for seed/precision jitter but trip on
method-logic regressions (a few MOTA points).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples"))

SCENE_DIR = os.environ.get("GAUNTLET_DIR", "/tmp/mot_gauntlet")

METHODS = ["strongsort", "deepocsort", "ocsort", "bytetrack", "botsort"]

# pinned per-method bands (MOTA lo/hi, IDF1 lo/hi, HOTA lo/hi), +-4/5/4
# points around the measured 2026-08-19 on-chip run (EVAL.md "Hard MOT
# gauntlet"): strongsort 53.93/49.61/40.34, deepocsort 57.79/52.35/45.10,
# ocsort 56.10/52.71/44.98, bytetrack 50.69/48.02/41.79, botsort
# 58.51/57.23/48.04. Wide enough for precision jitter (int8/fastcrop/ds2
# deltas measured <= 0.74 MOTA on this scene), tight enough to trip on
# method-logic regressions of a few points.
CHECK_BANDS = {
    "strongsort": ((49.9, 57.9), (44.6, 54.6), (36.3, 44.3)),
    "deepocsort": ((53.8, 61.8), (47.4, 57.4), (41.1, 49.1)),
    "ocsort":     ((52.1, 60.1), (47.7, 57.7), (41.0, 49.0)),
    "bytetrack":  ((46.7, 54.7), (43.0, 53.0), (37.8, 45.8)),
    "botsort":    ((54.5, 62.5), (52.2, 62.2), (44.0, 52.0)),
}


def ensure_scene():
    gt = os.path.join(SCENE_DIR, "gt.txt")
    if not os.path.exists(gt):
        from gauntlet import write_gauntlet
        print("rendering gauntlet scene ->", SCENE_DIR, flush=True)
        write_gauntlet(SCENE_DIR)
    return (os.path.join(SCENE_DIR, "img1"), gt,
            os.path.join(SCENE_DIR, "det.txt"))


def run_method(method, img_dir, gt, det, out_dir, extra_args=()):
    from reid_tpu.cli import track_main
    out_txt = os.path.join(out_dir, f"{method}.txt")
    argv = ["--source", img_dir, "--detections", det,
            "--tracking_method", method, "--save_txt", out_txt,
            "--gt", gt, "--chunk", "16", "--conf_thres", "0.3",
            "--max_dets", "64", *extra_args]
    t0 = time.time()
    m = track_main(argv)
    m["seconds"] = round(time.time() - t0, 1)
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("methods", nargs="*", default=None)
    ap.add_argument("--variants", action="store_true",
                    help="also run int8 / fastcrop / ds2 variants of "
                         "strongsort and report deltas")
    ap.add_argument("--check", action="store_true",
                    help="fail (exit 1) if any method leaves its pinned "
                         "MOTA/IDF1/HOTA band")
    args = ap.parse_args()
    methods = args.methods or METHODS

    img_dir, gt, det = ensure_scene()
    out_dir = os.path.join(SCENE_DIR, "out")
    os.makedirs(out_dir, exist_ok=True)

    results = {}
    for method in methods:
        m = run_method(method, img_dir, gt, det, out_dir)
        results[method] = m
        print(f"{method:11s} MOTA {m['MOTA']:6.2f}  IDF1 {m['IDF1']:6.2f}  "
              f"HOTA {m.get('HOTA', float('nan')):6.2f}  "
              f"IDSW {m.get('IDSW', -1):4.0f}  ({m['seconds']}s)",
              flush=True)

    if args.variants:
        base = results.get("strongsort") or run_method(
            "strongsort", img_dir, gt, det, out_dir)
        for tag, extra in (
            ("int8", ["--int8"]),
            ("fastcrop", ["--crop_hw", "128", "64"]),
            ("ds2", ["--crop_downsample", "2"]),
            # appearance cadence: embed every 2nd/4th frame, skip frames
            # associate on pure motion/IoU (TrackerConfig.embed_every)
            ("embed2", ["--embed_every", "2"]),
            ("embed4", ["--embed_every", "4"]),
        ):
            m = run_method("strongsort", img_dir, gt, det, out_dir,
                           extra_args=extra)
            print(f"strongsort+{tag:9s} MOTA {m['MOTA']:6.2f} "
                  f"(d{m['MOTA'] - base['MOTA']:+.2f})  "
                  f"IDF1 {m['IDF1']:6.2f} "
                  f"(d{m['IDF1'] - base['IDF1']:+.2f})  "
                  f"HOTA {m.get('HOTA', float('nan')):6.2f}  "
                  f"({m['seconds']}s)", flush=True)

    if args.check:
        bad = []
        for method, m in results.items():
            bands = CHECK_BANDS.get(method)
            if bands is None:
                continue
            for key, (lo, hi) in zip(("MOTA", "IDF1", "HOTA"), bands):
                v = m.get(key)
                if v is None or not (lo <= v <= hi):
                    bad.append(f"{method} {key}={v} outside [{lo}, {hi}]")
        if bad:
            print("GAUNTLET CHECK FAILED:\n  " + "\n  ".join(bad))
            sys.exit(1)
        print("gauntlet check OK: all methods inside pinned bands")


if __name__ == "__main__":
    main()
