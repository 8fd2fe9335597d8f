"""Full-scale accuracy dress rehearsal — the turnkey recipe for a real
Market1501 run (VERDICT r2 #5).

One command drives the REAL CLI end-to-end at Market scale on synthetic
data with the reference protocol (751 ids, 256x128, b64; ref
REID_EVAL.md:10-15):

  (a) scratch chain:    train_main (train -> StableHLO export)
                        -> inference_main (TTA embed -> camera de-bias ->
                           Jaccard re-rank -> CMC/mAP)
  (b) pretrained chain: reference-format IBN-ResNet18 torch state_dict
                        -> utils.torch_convert.convert_resnet18_ibn
                        -> fine-tune (--ckpt) -> eval

Swapping the synthetic tree for the real dataset directory is config-only
(--root). Metrics + wall-clock are appended to EVAL.md.

Run: python scripts/dress_rehearsal.py --root /tmp/market_synth \
         [--scale 0.25] [--epochs 2]
`--scale 1.0` is the full 751-id/25k-image protocol; smaller scales shrink
ids/images proportionally for smoke runs.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synth_market(root: str, scale: float = 1.0, seed: int = 0,
                 hard: bool = True):
    """Synthetic Market1501 tree with the real filename grammar
    ({pid:04d}_c{cam}s{seq}_{frame:06d}_{k:02d}.jpg, ref
    dataset_market.py:57 regex) and per-identity appearance structure
    (clothing-block colors + texture) so training/retrieval is learnable.

    `hard` (default, VERDICT r3 #6) injects identity TWINS so the rehearsal
    has discriminative power instead of saturating at rank-1 0.99:
      * 8% of ids are EXACT appearance clones of another id — an
        irreducible ceiling (those queries resolve ~50/50), so a perfect
        run cannot mask regressions by saturating;
      * 15% are near-twins (small color/texture offsets) — separable only
        with decent fine-grained features, the band where optimizer /
        precision / quantization regressions actually move the metric;
      * per-image brightness jitter (0.85-1.15x) raises intra-id variance.
    Measured scratch 2-epoch landing (scale 1.0, on-chip 2026-08-18):
    rank-1 0.600 / mAP 0.550 — mid-slope, far from ceiling, so optimizer /
    precision / quantization regressions actually move the number (the
    multiplicative lighting jitter turned out to bite harder than the
    twin bands alone; mid-slope is MORE discriminative than the ~0.90
    originally aimed for, so the gate is pinned here rather than softening
    the data). `--check` enforces the pinned range (EVAL.md)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    n_ids = max(int(751 * scale), 4)
    train_per_id = max(int(17 * scale * 1.0), 2)
    gallery_per_id = max(int(26 * scale), 2)
    query_per_id = max(int(4 * scale), 1)
    dirs = {
        "bounding_box_train": ("train", n_ids, train_per_id),
        "bounding_box_test": ("gallery", n_ids, gallery_per_id),
        "query": ("query", n_ids, query_per_id),
    }
    # identity appearance: torso/leg colors + head tone + texture freq
    torso = rng.integers(30, 250, (n_ids, 3)).astype(np.float64)
    legs = rng.integers(30, 250, (n_ids, 3)).astype(np.float64)
    head = rng.integers(120, 240, (n_ids, 3)).astype(np.float64)
    freq = rng.uniform(0.05, 0.4, n_ids)

    if hard and n_ids >= 8:
        perm = rng.permutation(n_ids)
        n_hard = max(int(0.08 * n_ids), 1)
        n_sep = max(int(0.15 * n_ids), 1)
        hard_ids = perm[:n_hard]
        sep_ids = perm[n_hard:n_hard + n_sep]
        base_pool = perm[n_hard + n_sep:]
        for i in hard_ids:  # exact clones: irreducible ~50/50 queries
            b = base_pool[rng.integers(len(base_pool))]
            torso[i], legs[i] = torso[b], legs[b]
            head[i], freq[i] = head[b], freq[b]
        for i in sep_ids:   # near-twins: the discriminative band
            b = base_pool[rng.integers(len(base_pool))]
            torso[i] = np.clip(torso[b] + rng.integers(-12, 13, 3), 0, 255)
            legs[i] = np.clip(legs[b] + rng.integers(-12, 13, 3), 0, 255)
            head[i] = head[b]
            freq[i] = np.clip(freq[b] + rng.uniform(-0.02, 0.02), 0.03, 0.45)

    def render(pid, cam, key):
        r = np.random.default_rng(key)
        img = r.integers(0, 60, (128, 64, 3)).astype(np.float32)
        # camera bias: per-camera global tint (what diminish_camera_bias
        # removes at inference)
        tint = np.asarray([15.0 * cam, -8.0 * cam, 5.0 * cam])
        yy = np.arange(128)[:, None, None]
        tex = 25.0 * np.sin(freq[pid] * np.arange(128))[:, None, None]
        img[8:30, 20:44] += head[pid]
        img[30:78, 12:52] += torso[pid] + tex[30:78]
        img[78:120, 16:48] += legs[pid]
        img += tint + r.normal(0, 12, img.shape)
        if hard:  # lighting variation: intra-id variance up
            img *= r.uniform(0.85, 1.15)
        # pose jitter: horizontal shift
        img = np.roll(img, int(r.integers(-6, 7)), axis=1)
        return np.clip(img, 0, 255).astype(np.uint8)

    counts = {}
    for d, (split, ids, per) in dirs.items():
        os.makedirs(os.path.join(root, d), exist_ok=True)
        n = 0
        for pid in range(ids):
            for k in range(per):
                cam = int((pid + k) % 6) + 1
                seq = int(k % 3) + 1
                key = hash((d, pid, k)) % (2**32)
                img = render(pid, cam - 1, key)
                name = f"{pid:04d}_c{cam}s{seq}_{k:06d}_00.jpg"
                Image.fromarray(img).resize((64, 128)).save(
                    os.path.join(root, d, name))
                n += 1
        counts[split] = n
        # junk/distractor images for the gallery (ref junk rules: pid -1)
        if split == "gallery":
            for j in range(max(int(100 * scale), 2)):
                img = np.random.default_rng(j).integers(
                    0, 255, (128, 64, 3)).astype(np.uint8)
                Image.fromarray(img).save(os.path.join(
                    root, d, f"-1_c{j % 6 + 1}s1_{j:06d}_00.jpg"))
    return counts


def reference_format_ibn_state_dict(seed=0):
    """Random torch state_dict in the IBN-Net hub layout (resnet18_ibn_a)
    — what the reference downloads at SERes18_IBN.py:201. Exercises the
    converter + fine-tune chain without network egress."""
    import torch

    g = torch.Generator().manual_seed(seed)
    sd = {}

    def conv(name, o, i, k):
        sd[name] = torch.randn((o, i, k, k), generator=g) * 0.05

    def bn(name, c):
        sd[name + ".weight"] = torch.rand(c, generator=g) + 0.5
        sd[name + ".bias"] = torch.randn(c, generator=g) * 0.05
        sd[name + ".running_mean"] = torch.randn(c, generator=g) * 0.05
        sd[name + ".running_var"] = torch.rand(c, generator=g) * 0.5 + 0.75

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    chans = {1: 64, 2: 128, 3: 256, 4: 512}
    for stage in range(1, 5):
        c = chans[stage]
        cin = chans.get(stage - 1, 64)
        for blk in range(2):
            t = f"layer{stage}.{blk}"
            first = blk == 0 and stage > 1
            conv(f"{t}.conv1.weight", c, cin if first else c, 3)
            if stage < 4:  # IBN stages
                sd[f"{t}.bn1.IN.weight"] = torch.rand(c // 2, generator=g) + .5
                sd[f"{t}.bn1.IN.bias"] = torch.randn(c // 2, generator=g) * .05
                bn(f"{t}.bn1.BN", c - c // 2)
            else:
                bn(f"{t}.bn1", c)
            conv(f"{t}.conv2.weight", c, c, 3)
            bn(f"{t}.bn2", c)
            if first:
                conv(f"{t}.downsample.0.weight", c, cin, 1)
                bn(f"{t}.downsample.1", c)
    return sd


def main():
    p = argparse.ArgumentParser("dress_rehearsal")
    p.add_argument("--root", default="/tmp/market_synth")
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--skip_synth", action="store_true")
    p.add_argument("--skip_pretrained", action="store_true")
    p.add_argument("--skip_scratch", action="store_true")
    p.add_argument("--easy", action="store_true",
                   help="no identity twins / lighting jitter (the pre-r4 "
                        "saturating dataset; hard is the default so the "
                        "rehearsal works as a regression gate)")
    p.add_argument("--int8", action="store_true",
                   help="also evaluate the scratch checkpoint with the int8 "
                        "PTQ embed and report the rank-1/mAP deltas "
                        "(VERDICT r3 #3: int8 quality as metrics)")
    p.add_argument("--check", action="store_true",
                   help="fail if scratch rank-1 leaves the pinned expected "
                        "range for the hard dataset (regression gate)")
    p.add_argument("--expect", type=float, nargs=2, default=(0.55, 0.64),
                   metavar=("LO", "HI"),
                   help="expected scratch rank-1 range for --check "
                        "(default pinned for --scale 1.0, hard mode, from "
                        "the 4-seed on-chip spread 0.5832-0.6032 measured "
                        "2026-08-18/19 — observed range +-0.035, sized to "
                        "trip on a 3-4%% regression; see EVAL.md)")
    p.add_argument("--expect_pretrained", type=float, nargs=2, default=None,
                   metavar=("LO", "HI"),
                   help="expected pretrained-chain rank-1 range for --check "
                        "(off until a hard-mode landing pins it; the "
                        "2026-08-17 pretrained runs used the easy dataset)")
    p.add_argument("--seed", type=int, default=0,
                   help="training seed (dataset synthesis stays seed-0 so "
                        "multi-seed runs measure TRAINER variance — the "
                        "spread that sizes the --check band, ADVICE r4)")
    p.add_argument("--eval_md", default="EVAL.md")
    p.add_argument("--platform", default="",
                   help="force a jax platform (e.g. 'cpu' for a host-only "
                        "plumbing smoke). The JAX_PLATFORMS env var is too "
                        "late under this image: sitecustomize imports jax "
                        "first, so the platform must be set via jax.config "
                        "before any backend initializes (same trick as "
                        "tests/conftest.py).")
    args = p.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from reid_tpu.cli import inference_main, train_main

    results = {"scale": args.scale, "epochs": args.epochs,
               "hard": not args.easy,
               "protocol": f"{args.height}x{args.width} b{args.bs}"}

    t0 = time.time()
    if not args.skip_synth or not os.path.isdir(
            os.path.join(args.root, "bounding_box_train")):
        counts = synth_market(args.root, args.scale, hard=not args.easy)
        print(f"synth dataset: {counts} in {time.time()-t0:.0f}s")
        results["dataset"] = counts
    results["t_synth_s"] = round(time.time() - t0, 1)

    ckpt_dir = os.path.join(args.root, "ckpt")
    os.makedirs(ckpt_dir, exist_ok=True)
    artifact = os.path.join(ckpt_dir, "serving_artifact")

    # ---- (a) scratch chain through the real CLI
    from reid_tpu.utils import save_checkpoint
    if not args.skip_scratch:
        t0 = time.time()
        state = train_main([
            "--root", args.root, "--dataset", "market1501",
            "--bs", str(args.bs), "--epochs", str(args.epochs),
            "--height", str(args.height), "--width", str(args.width),
            "--export", artifact, "--seed", str(args.seed),
        ])
        results["t_train_s"] = round(time.time() - t0, 1)
        results["t_per_epoch_s"] = round(results["t_train_s"] / args.epochs,
                                         1)
        scratch_ckpt = os.path.join(ckpt_dir, "scratch")
        save_checkpoint(scratch_ckpt, {"params": state.params,
                                       "batch_stats": state.batch_stats})
        t0 = time.time()
        cmc, mAP = inference_main([
            "--root", args.root, "--dataset", "market1501",
            "--ckpt", scratch_ckpt, "--bs", str(args.bs),
            "--height", str(args.height), "--width", str(args.width),
        ])
        results["t_eval_s"] = round(time.time() - t0, 1)
        results["scratch_rank1"] = round(float(cmc[0]), 4)
        results["scratch_mAP"] = round(float(mAP), 4)
        print(f"scratch chain: rank1={cmc[0]:.4f} mAP={mAP:.4f}")

        if args.int8:
            # int8 PTQ quality AS METRICS on the trained scratch weights:
            # same eval chain, embed quantized (eval/serving.py)
            t0 = time.time()
            cmc8, mAP8 = inference_main([
                "--root", args.root, "--dataset", "market1501",
                "--ckpt", scratch_ckpt, "--bs", str(args.bs),
                "--height", str(args.height), "--width", str(args.width),
                "--int8",
            ])
            results["t_eval_int8_s"] = round(time.time() - t0, 1)
            results["int8_rank1"] = round(float(cmc8[0]), 4)
            results["int8_mAP"] = round(float(mAP8), 4)
            results["int8_rank1_delta"] = round(
                float(cmc8[0]) - float(cmc[0]), 4)
            results["int8_mAP_delta"] = round(float(mAP8) - float(mAP), 4)
            print(f"int8 eval: rank1={cmc8[0]:.4f} mAP={mAP8:.4f} "
                  f"(delta {results['int8_rank1_delta']:+.4f} / "
                  f"{results['int8_mAP_delta']:+.4f})")

    # ---- (b) pretrained chain: torch state_dict -> convert -> fine-tune
    if not args.skip_pretrained:
        import jax
        import jax.numpy as jnp
        import torch

        from reid_tpu.models import build_model
        from reid_tpu.utils.torch_convert import convert_resnet18_ibn

        t0 = time.time()
        sd_path = os.path.join(ckpt_dir, "resnet18_ibn_a.pt")
        torch.save(reference_format_ibn_state_dict(), sd_path)
        sd = torch.load(sd_path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
        from reid_tpu.data import build_dataset
        raw = build_dataset("market1501", args.root)
        model = build_model("seres18", num_classes=raw.num_train_pids)
        variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
            jax.random.PRNGKey(0),
            jnp.zeros((2, args.height, args.width, 3)))
        variables = convert_resnet18_ibn(sd, variables)
        pre_ckpt = os.path.join(ckpt_dir, "pretrained_trunk")
        save_checkpoint(pre_ckpt, {"params": variables["params"],
                                   "batch_stats": variables["batch_stats"]})
        state = train_main([
            "--root", args.root, "--dataset", "market1501",
            "--bs", str(args.bs), "--epochs", str(args.epochs),
            "--height", str(args.height), "--width", str(args.width),
            "--ckpt", pre_ckpt,
        ])
        ft_ckpt = os.path.join(ckpt_dir, "finetuned")
        save_checkpoint(ft_ckpt, {"params": state.params,
                                  "batch_stats": state.batch_stats})
        cmc, mAP = inference_main([
            "--root", args.root, "--dataset", "market1501",
            "--ckpt", ft_ckpt, "--bs", str(args.bs),
            "--height", str(args.height), "--width", str(args.width),
        ])
        results["t_pretrained_chain_s"] = round(time.time() - t0, 1)
        results["pretrained_rank1"] = round(float(cmc[0]), 4)
        results["pretrained_mAP"] = round(float(mAP), 4)
        print(f"pretrained chain: rank1={cmc[0]:.4f} mAP={mAP:.4f}")

    print(json.dumps(results))
    if args.eval_md:
        with open(args.eval_md, "a") as f:
            f.write(f"\n<!-- dress_rehearsal {time.strftime('%Y-%m-%d')} -->\n"
                    f"```json\n{json.dumps(results, indent=2)}\n```\n")
    if args.check and "scratch_rank1" in results:
        lo, hi = args.expect
        r1 = results["scratch_rank1"]
        if not (lo <= r1 <= hi):
            raise SystemExit(
                f"REGRESSION GATE: scratch rank-1 {r1:.4f} outside the "
                f"pinned range [{lo}, {hi}] for the hard dataset — "
                "training/eval quality moved")
        print(f"check OK: rank-1 {r1:.4f} within [{lo}, {hi}]")
        if "int8_rank1_delta" in results:
            # PTQ quality gate: the measured hard-mode landings are
            # +0.004/-0.002 rank-1/mAP (EVAL.md); a 2-point drift means
            # the quantizer (calibration, scales, routing) regressed.
            d1, dm = results["int8_rank1_delta"], results["int8_mAP_delta"]
            if abs(d1) > 0.02 or abs(dm) > 0.02:
                raise SystemExit(
                    f"REGRESSION GATE: int8 PTQ deltas rank-1 {d1:+.4f} / "
                    f"mAP {dm:+.4f} exceed the 0.02 band — quantizer "
                    "quality moved")
            print(f"check OK: int8 deltas {d1:+.4f}/{dm:+.4f} within 0.02")
        if "pretrained_rank1" in results and args.expect_pretrained:
            plo, phi = args.expect_pretrained
            pr1 = results["pretrained_rank1"]
            if not (plo <= pr1 <= phi):
                raise SystemExit(
                    f"REGRESSION GATE: pretrained-chain rank-1 {pr1:.4f} "
                    f"outside [{plo}, {phi}] — converter/fine-tune path "
                    "quality moved")
            print(f"check OK: pretrained rank-1 {pr1:.4f} "
                  f"within [{plo}, {phi}]")
    return results


if __name__ == "__main__":
    main()
