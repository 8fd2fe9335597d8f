"""Command-line entry points — the reference's L6 scripts rebuilt.

Flag names track the reference parsers:
  * train:     ref image_reid_train.py:559-592
  * inference: ref image_reid_inference.py:138-158
  * video:     ref video_reid_train.py:198-210
  * gan:       ref gan/synthetic_main.py:454-471
  * track:     ref modification_tracking/track_yolov5.py:352-392

Launchers at the repo root: image_reid_train.py, image_reid_inference.py,
video_reid_train.py, synthetic_main.py, track.py.
"""

from __future__ import annotations

import argparse
import os
import sys


def _base_cfg(args):
    import jax.numpy as jnp

    from .config import (Config, DataConfig, LossConfig, ModelConfig,
                         RetrievalConfig, TrainConfig, TrackerConfig)

    sizes = {"market1501": (256, 128), "dukemtmc": (256, 128),
             "veri": (224, 224)}
    h, w = sizes.get(args.dataset, (256, 128))
    if getattr(args, "backbone", "") in ("vit", "swin_v1", "swin_v2"):
        h, w = (448, 224) if args.dataset in ("market1501", "dukemtmc") \
            else (224, 224)
    # optional override (not in the reference parsers; used by small-scale
    # smoke runs and the test suite)
    if getattr(args, "height", 0):
        h = args.height
    if getattr(args, "width", 0):
        w = args.width
    n_cams = {"market1501": 6, "dukemtmc": 8, "veri": 20}.get(args.dataset, 6)
    return Config(
        model=ModelConfig(
            backbone=getattr(args, "backbone", "seres18"),
            num_cams=n_cams,
            renorm=bool(getattr(args, "renorm", False)),
            cam_factor=getattr(args, "cam_factor", -1.0),
        ),
        loss=LossConfig(
            margin=getattr(args, "margin", 0.0),
            center_lamda=getattr(args, "center_lamda", 5e-4),
            epsilon=getattr(args, "epsilon", 0.0),
            tao=getattr(args, "temperature", 1.0),
            xbm=bool(getattr(args, "xbm", False)),
            # SIE XBM trainer gates at epoch > 10, CNN at > 25
            # (ref image_reid_train_xbm.py:167 vs :88)
            xbm_start_epoch=10 if getattr(args, "backbone", "") in
            ("vit", "swin_v1", "swin_v2") else 25,
        ),
        train=TrainConfig(
            batch_size=getattr(args, "bs", 64),
            num_instances=getattr(args, "instance", 4),
            epochs=getattr(args, "epochs", 60),
            seed=getattr(args, "seed", 0),
        ),
        data=DataConfig(dataset=args.dataset, root=args.root,
                        height=h, width=w),
        retrieval=RetrievalConfig(
            dbscan_eps=getattr(args, "eps", 0.55),
            rerank_sparse_s=getattr(args, "rerank_sparse_s", 0),
            search_option=getattr(args, "search_option", "auto"),
        ),
    )


def train_main(argv=None):
    """Ref image_reid_train.py main (:595-697) incl. the continual branch."""
    p = argparse.ArgumentParser("image_reid_train")
    p.add_argument("--root", default="data")
    p.add_argument("--dataset", default="market1501",
                   choices=["market1501", "dukemtmc", "veri"])
    p.add_argument("--backbone", default="seres18")
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--instance", type=int, default=4)
    p.add_argument("--margin", type=float, default=0.0)
    p.add_argument("--epsilon", type=float, default=0.0)
    p.add_argument("--center_lamda", type=float, default=5e-4)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--cam_factor", type=float, default=-1.0)
    p.add_argument("--renorm", action="store_true")
    p.add_argument("--xbm", action="store_true")
    p.add_argument("--continual", action="store_true")
    p.add_argument("--target_dataset", default="dukemtmc")
    p.add_argument("--target_root", default="data")
    p.add_argument("--eps", type=float, default=0.55)
    p.add_argument("--height", type=int, default=0,
                   help="override input height (0 = dataset default)")
    p.add_argument("--width", type=int, default=0)
    p.add_argument("--ckpt", default="")
    p.add_argument("--export", default="",
                   help="write the StableHLO serving artifact here after "
                        "training (ref to_onnx, train_prepare.py:14-47)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from .data import ReIDDataset, build_dataset
    from .train.image_train import (produce_pseudo_data, train_cnn,
                                    train_continual)

    raw = build_dataset(args.dataset, args.root)
    cfg = _base_cfg(args)
    cfg = cfg.replace(model=cfg.model.__class__(
        **{**cfg.model.__dict__, "num_classes": raw.num_train_pids}))
    dataset = ReIDDataset(raw.train, raw.num_train_pids,
                          cfg.data.height, cfg.data.width)
    state, losses = train_cnn(cfg, dataset, use_xbm=args.xbm,
                              ckpt=args.ckpt)

    if args.continual:
        t_raw = build_dataset(args.target_dataset, args.target_root)
        target = ReIDDataset(t_raw.train, t_raw.num_train_pids,
                             cfg.data.height, cfg.data.width)
        records, centroids, k = produce_pseudo_data(state, target, cfg)
        state, losses = train_continual(cfg, state, dataset, records,
                                        centroids, k)
    if args.export:
        from .eval.serving import export_reid_artifact
        export_reid_artifact(state, args.export, cfg.data.height,
                             cfg.data.width)
        print(f"serving artifact -> {args.export}")
    print("training complete")
    return state


def inference_main(argv=None):
    """Ref image_reid_inference.py main (:161-320)."""
    p = argparse.ArgumentParser("image_reid_inference")
    p.add_argument("--root", default="data")
    p.add_argument("--dataset", default="market1501",
                   choices=["market1501", "dukemtmc", "veri"])
    p.add_argument("--backbone", default="seres18")
    p.add_argument("--ckpt", default="")
    p.add_argument("--artifact", default="",
                   help="StableHLO serving artifact: run checkpoint-free "
                        "from the exported embed step (ref --onnx, "
                        "image_reid_inference.py:239)")
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--height", type=int, default=0,
                   help="override input height (0 = dataset default)")
    p.add_argument("--width", type=int, default=0)
    p.add_argument("--no-rerank", action="store_true")
    p.add_argument("--rerank_sparse_s", type=int, default=0,
                   help="top-S approximate Jaccard min-sum (0 = exact; "
                        "big-gallery mode, ~2x at N=23k with S=256)")
    p.add_argument("--search_option", default="auto",
                   choices=["auto", "dense", "sparse", "ivf"],
                   help="gallery-size search policy (the faiss "
                        "search_option 0-3 role, ref faiss_utils.py:"
                        "121-181): auto picks dense/top-S/IVF by N")
    p.add_argument("--eps", type=float, default=0.55)
    p.add_argument("--attributes_mat", default="")
    p.add_argument("--int8", action="store_true",
                   help="serve the embed post-training-quantized to int8 "
                        "(calibrated on the first gallery batch; ~1.2x "
                        "extraction throughput at >=0.9999 feature cosine)")
    args = p.parse_args(argv)
    if not args.ckpt and not args.artifact:
        p.error("need --ckpt or --artifact")
    if args.int8 and args.artifact:
        p.error("--int8 needs --ckpt (export an int8 artifact instead via "
                "export_reid_artifact(int8_calib=...))")

    import jax
    import numpy as np

    from .data import ReIDDataset, build_dataset
    from .eval.inference import run_inference

    raw = build_dataset(args.dataset, args.root)
    cfg = _base_cfg(args)
    cfg = cfg.replace(model=cfg.model.__class__(
        **{**cfg.model.__dict__, "num_classes": raw.num_train_pids}))
    state = embed_fn = None
    if args.artifact:
        from .eval.serving import load_serving_fn
        embed_fn = load_serving_fn(args.artifact)
    else:
        from .models import build_model
        from .train.state import create_train_state
        from .utils import restore_checkpoint
        model = build_model(cfg.model.backbone,
                            num_classes=raw.num_train_pids,
                            num_cams=cfg.model.num_cams)
        state = create_train_state(jax.random.PRNGKey(0), model, cfg, 1,
                                   input_shape=(2, cfg.data.height,
                                                cfg.data.width, 3))
        state = restore_checkpoint(args.ckpt, state)

    query = ReIDDataset(raw.query, raw.num_train_pids, cfg.data.height,
                        cfg.data.width)
    gallery = ReIDDataset(raw.gallery, raw.num_train_pids, cfg.data.height,
                          cfg.data.width)
    if args.int8:
        from .data.loader import make_eval_loader
        from .eval.serving import make_int8_embed_fn
        calib = next(iter(make_eval_loader(
            gallery, min(args.bs, 32))))["images"]
        embed_fn = make_int8_embed_fn(state, calib,
                                      tta_flip=cfg.retrieval.tta_flip)
    attribute_dist = None
    if args.attributes_mat and args.dataset == "market1501":
        from .eval.attributes import get_attribute_dist, get_attributes
        ids, attrs = get_attributes(args.attributes_mat)
        pids = np.concatenate([gallery.labels, query.labels])
        attribute_dist = get_attribute_dist(ids, attrs, pids)
    cmc, mAP = run_inference(state, query, gallery, cfg,
                             rerank=not args.no_rerank,
                             attribute_dist=attribute_dist,
                             embed_fn=embed_fn)
    return cmc, mAP


def video_main(argv=None):
    """Ref video_reid_train.py main (:198-231)."""
    p = argparse.ArgumentParser("video_reid_train")
    p.add_argument("--gt_paths", nargs="+", required=True)
    p.add_argument("--prefix", default="datasets/MOT16/train/")
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--seq_len", type=int, default=10)
    p.add_argument("--crop_factor", type=float, default=1.0)
    args = p.parse_args(argv)

    from .config import Config
    from .train.video_train import VideoTrackletDataset, train_video

    ds = VideoTrackletDataset(args.gt_paths, seq_len=args.seq_len,
                              lamda=args.crop_factor,
                              prefix_image_path=args.prefix)
    variables, losses = train_video(Config(), ds, epochs=args.epochs,
                                    batch_size=args.bs,
                                    seq_len=args.seq_len)
    print(f"video training complete; final loss {losses[-1]:.4f}")
    return variables


def gan_main(argv=None):
    """Ref gan/synthetic_main.py main (:454-506): DCGAN per appearance
    group (--groups, k-means split, one EMA + checkpoint per group) or
    VAE-GAN (--vae [--wasserstein]); then sample synthetic images."""
    p = argparse.ArgumentParser("synthetic_main")
    p.add_argument("--root", default="data")
    p.add_argument("--bs", type=int, default=64)
    p.add_argument("--epochs", type=int, default=120)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--nz", type=int, default=100)
    p.add_argument("--ngf", type=int, default=64)
    p.add_argument("--ndf", type=int, default=64)
    p.add_argument("--groups", type=int, default=1,
                   help="k-means appearance groups (ref --k)")
    p.add_argument("--embed_ckpt", default="",
                   help="torchvision resnet50 .pt for the grouping "
                        "features (ref kmeans_.py:16-34 ImageNet trunk); "
                        "default: pooled color-pyramid representation")
    p.add_argument("--vae", action="store_true",
                   help="train the VAE-GAN instead of DCGAN (ref --vae)")
    p.add_argument("--wasserstein", action="store_true",
                   help="Wasserstein D + gradient penalty (ref --Wassertein "
                        "--gp)")
    p.add_argument("--n_images", type=int, default=1000,
                   help="synthetic images to sample (ref --instances)")
    p.add_argument("--ckpt_dir", default="checkpoint",
                   help="per-group generator checkpoints (ref checkpoint/)")
    p.add_argument("--out", default="synthetic_images")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import numpy as np
    from PIL import Image

    from .data import Market1501, ReIDDataset
    from .gan import (generate_group_images, get_groups, sample_vaegan,
                      train_gan_groups, train_vaegan)

    raw = Market1501(args.root)
    ds = ReIDDataset(raw.train + raw.gallery, raw.num_train_pids, 128, 64)
    # stays uint8 in host RAM (~1/4 the float32 size); the drivers
    # normalize to [-1, 1] per batch
    images = np.stack([ds.load_image(i) for i in range(len(ds))])

    if args.vae:
        vae, state = train_vaegan(images, epochs=args.epochs,
                                  batch_size=args.bs, lr=args.lr,
                                  wasserstein=args.wasserstein,
                                  seed=args.seed)
        imgs = sample_vaegan(vae, state, args.n_images)
    else:
        groups = None
        if args.groups > 1:
            embed_fn = None
            if args.embed_ckpt:
                from .gan import make_resnet_embed_fn
                embed_fn = make_resnet_embed_fn(args.embed_ckpt)
            groups = get_groups(images, args.groups, embed_fn=embed_fn)
            print("group sizes:", np.bincount(groups, minlength=args.groups))
        _, group_states = train_gan_groups(
            images, groups, k=args.groups, epochs=args.epochs,
            batch_size=args.bs, nz=args.nz, ngf=args.ngf, ndf=args.ndf,
            lr=args.lr, seed=args.seed, checkpoint_dir=args.ckpt_dir)
        per_group = (args.n_images + args.groups - 1) // args.groups
        imgs = generate_group_images(group_states, per_group, nz=args.nz,
                                     ngf=args.ngf)[: args.n_images]

    os.makedirs(args.out, exist_ok=True)
    for i, im in enumerate(((imgs + 1) * 127.5).clip(0, 255).astype("uint8")):
        Image.fromarray(im).save(os.path.join(args.out, f"gen_{i:05d}.jpg"))
    print(f"wrote {len(imgs)} images to {args.out}")


def lsro_main(argv=None):
    """Ref gan/train_baseline.py (:214-343): baseline classifier trained on
    real + synthetic (gen_*) images with the LSRO uniform-label loss."""
    p = argparse.ArgumentParser("train_baseline")
    p.add_argument("--root", default="data")
    p.add_argument("--gen_dir", required=True,
                   help="directory of generated gen_*.jpg images "
                        "(ref dcganDataset gen_0000 flags)")
    p.add_argument("--bs", type=int, default=32)
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--backbone", default="baseline")
    p.add_argument("--ckpt", default="",
                   help="save the trained baseline here")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import glob

    import numpy as np
    from PIL import Image

    from .data import Market1501, ReIDDataset
    from .gan import train_lsro_baseline

    raw = Market1501(args.root)
    ds = ReIDDataset(raw.train, raw.num_train_pids, 128, 64)
    # uint8 in host RAM; the driver normalizes per batch
    real = np.stack([ds.load_image(i) for i in range(len(ds))])

    gen_files = sorted(glob.glob(os.path.join(args.gen_dir, "gen_*")))
    if not gen_files:
        p.error(f"no gen_* images under {args.gen_dir}")
    gen = np.stack([
        np.asarray(Image.open(f).convert("RGB").resize((64, 128)))
        for f in gen_files])

    state, history = train_lsro_baseline(
        real, ds.labels, gen, num_classes=raw.num_train_pids,
        epochs=args.epochs, batch_size=args.bs, lr=args.lr,
        backbone=args.backbone, seed=args.seed)
    if args.ckpt:
        from .utils import save_checkpoint
        save_checkpoint(args.ckpt, state)
    print(f"final: loss={history[-1]['loss']:.4f} acc={history[-1]['acc']:.4f}")
    return state, history


def track_main(argv=None):
    """Ref track_yolov5.py (:78-392): one-command serve path —
    video/frames/webcam in -> [detector ->] tracker -> MOT txt
    [+ annotated video]. Detections may come from a MOT det file (pluggable
    detector) or from the built-in CenterNetLite when none is given."""
    p = argparse.ArgumentParser("track")
    p.add_argument("--source", default="",
                   help="video file | frame directory | webcam index "
                        "(ref --source, track_yolov5.py:141-160)")
    p.add_argument("--detections", default="",
                   help="MOT-format det file; omit to run the built-in "
                        "detector (--detector) on --source frames")
    p.add_argument("--frames_dir", default="",
                   help="alias for --source <frame directory>")
    p.add_argument("--ckpt", default="")
    p.add_argument("--detector", default="centernet",
                   choices=["centernet", "yolov5"],
                   help="built-in detector family (ref --yolo-weights role, "
                        "track_yolov5.py:135)")
    p.add_argument("--yolo_variant", default="yolov5s",
                   help="yolov5 width/depth variant (n/s/m/l/x or p)")
    p.add_argument("--det_ckpt", default="",
                   help="detector checkpoint (orbax)")
    p.add_argument("--det_torch", default="",
                   help="torch yolov5*.pt state_dict to convert "
                        "(utils.torch_convert.convert_yolov5)")
    p.add_argument("--det_size", type=int, nargs=2, default=(288, 512),
                   metavar=("H", "W"), help="detector input resolution")
    p.add_argument("--det_base", type=int, default=32,
                   help="CenterNetLite width (must match --det_ckpt)")
    p.add_argument("--backbone", default="seres18")
    p.add_argument("--num_classes", type=int, default=751)
    p.add_argument("--tracking_method", default="strongsort",
                   choices=["strongsort", "deepocsort", "ocsort",
                            "bytetrack", "botsort"])
    p.add_argument("--save_txt", default="out.txt")
    p.add_argument("--save_vid", default="",
                   help="annotated output: .avi/.mp4 file or image directory "
                        "(ref --save-vid, track_yolov5.py:286-333)")
    p.add_argument("--conf_thres", type=float, default=0.5)
    p.add_argument("--max_dets", type=int, default=64)
    p.add_argument("--crop_downsample", type=int, default=1,
                   help="crop ReID boxes from an s x s avg-pooled frame "
                        "(bounds the pooled-frame memory footprint; "
                        "measured NOT faster on TPU — the crop einsum is "
                        "shape-efficiency-bound, not FLOP-bound; "
                        "near-lossless for boxes smaller than s*crop_hw — "
                        "pool+bilinear is not bit-identical to full-res)")
    p.add_argument("--frame_crop_cap", type=int, default=0,
                   help="crop/embed only the top-N valid boxes per frame "
                        "(0 = every det slot); lets --max_dets 300 serve "
                        "pay only for the boxes actually present")
    p.add_argument("--gmc", default="auto", choices=["auto", "on", "off"],
                   help="camera-motion compensation: auto = method default "
                        "(botsort on, others off), on = force for any "
                        "method (upstream StrongSORT ships ecc: true; "
                        "recommended with --embed_every on panning scenes "
                        "— EVAL.md), off = force off")
    p.add_argument("--embed_every", type=int, default=1,
                   help="appearance cadence: embed ReID crops only on "
                        "every k-th frame; in between association is "
                        "appearance-neutral (pure motion/IoU) and the EMA "
                        "feature / NN gallery are untouched. k=1 is "
                        "bit-identical to embedding every frame; the "
                        "chunked path (--chunk) requires chunk %% k == 0. "
                        "Quality trade measured on the hard gauntlet "
                        "(EVAL.md) — cuts the dominant crop+embed stages "
                        "by ~k at MOT16 load")
    p.add_argument("--crop_hw", type=int, nargs=2, default=(256, 128),
                   metavar=("H", "W"),
                   help="ReID crop size (ref TRACKING_EVAL.md:5; "
                        "transformer backbones need their grid multiples, "
                        "e.g. swin 224 112)")
    p.add_argument("--max_frames", type=int, default=0,
                   help="stop after N frames (0 = all)")
    p.add_argument("--chunk", type=int, default=1,
                   help="track N frames per device dispatch through the "
                        "chunked throughput path (make_chunked_tracker); "
                        "requires --detections. 1 = per-frame step path")
    p.add_argument("--int8", action="store_true",
                   help="serve the ReID embed (and the yolov5 detector "
                        "trunk, when selected) in post-training int8 "
                        "(utils/quantize.py); calibrates activation scales "
                        "on the first 8 source frames when available "
                        "(synthetic-noise fallback otherwise, which gives "
                        "weak per-tensor scales — prefer a real --source)")
    p.add_argument("--gt", default="",
                   help="MOT16 gt.txt (full 9-column): score the run with "
                        "the native TrackEval-exact CLEAR/IDF1 metrics "
                        "(MotChallenge2DBox preprocessing incl. distractor-"
                        "matched det removal + zero-mark/pedestrian gt "
                        "filter) after tracking")
    p.add_argument("--benchmark", default="MOT16",
                   choices=["MOT16", "MOT17", "MOT20"],
                   help="gt scoring benchmark: MOT20 widens the distractor "
                        "set with non_mot_vehicle (TrackEval's MOT20 "
                        "branch); MOT16/MOT17 are identical")
    args = p.parse_args(argv)
    if not args.source and args.frames_dir:
        args.source = args.frames_dir
    if not args.source and not args.detections:
        p.error("need --source and/or --detections")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .config import TrackerConfig
    from .models import build_model
    from .tracking.methods import method_config
    from .tracking.mot import load_mot_detections
    from .tracking.pipeline import TrackingPipeline

    cfg = method_config(args.tracking_method,
                        min_confidence=args.conf_thres,
                        max_dets=args.max_dets,
                        crop_hw=tuple(args.crop_hw),
                        crop_downsample=args.crop_downsample,
                        frame_crop_cap=args.frame_crop_cap or None,
                        embed_every=max(1, args.embed_every),
                        gmc={"auto": None, "on": True,
                             "off": False}[args.gmc])
    model = build_model(args.backbone, num_classes=args.num_classes,
                        dtype=jnp.bfloat16)
    dummy = jnp.zeros((2, *cfg.crop_hw, 3), jnp.bfloat16)
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), dummy)
    if args.ckpt:
        from .utils import restore_checkpoint
        variables = restore_checkpoint(args.ckpt, variables)

    if args.int8:
        # calibration crops: ImageNet-normalized patches drawn from the
        # first 8 source frames (a single frame gives weak per-tensor
        # activation scales that can clip real activations — ADVICE r3);
        # synthetic image-range crops as the last-resort fallback, with a
        # documented accuracy caveat in --help
        from .utils.quantize import quantize, quantized_apply

        rng_np = np.random.default_rng(0)
        mean = np.asarray((0.485, 0.456, 0.406), np.float32)
        std = np.asarray((0.229, 0.224, 0.225), np.float32)
        try:
            from .tracking.sources import iter_frames as _itf
            calib_src = [fr for _, fr in _itf(args.source, 8)]
            if not calib_src:
                raise ValueError("empty source")
            patches = []
            for fi, frame0 in enumerate(calib_src):
                h0, w0 = frame0.shape[:2]
                for _ in range(max(32 // len(calib_src), 4)):
                    y = rng_np.integers(0, max(h0 - cfg.crop_hw[0], 1))
                    x = rng_np.integers(0, max(w0 - cfg.crop_hw[1], 1))
                    patch = frame0[y:y + cfg.crop_hw[0],
                                   x:x + cfg.crop_hw[1]]
                    patch = np.asarray(jax.image.resize(
                        jnp.asarray(patch, jnp.float32),
                        (*cfg.crop_hw, 3), "bilinear"))
                    patches.append(patch / 255.0)
            calib = (np.stack(patches) - mean) / std
        except Exception:
            calib = (rng_np.random((32, *cfg.crop_hw, 3),
                                   dtype=np.float32) - mean) / std
        qstate = quantize(model, variables, [jnp.asarray(calib)],
                          train=False)

        def _forward(params, batch_stats, crops):
            return quantized_apply(
                model, {"params": params, "batch_stats": batch_stats},
                qstate, crops.astype(jnp.bfloat16), train=False)
    else:
        def _forward(params, batch_stats, crops):
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                crops.astype(jnp.bfloat16), train=False)

    def embed_fn(params, batch_stats, crops):
        feat, logits = _forward(params, batch_stats, crops)
        if isinstance(logits, tuple):
            # dual-head models (plr_osnet): reference eval emits the part
            # feature only (ref plr_osnet.py:107-110)
            f = feat.astype(jnp.float32)
        else:
            f = jnp.concatenate([feat.astype(jnp.float32),
                                 logits.astype(jnp.float32)], axis=1)
        return f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True),
                               1e-12)

    # derive the tracker's feature width from a probe forward — eval feature
    # sizes differ per backbone (seres18 512, plr_osnet 2560, vit 384,
    # swin 96, agw/resnet50 2048) before the logits concat
    probe = embed_fn(variables["params"], variables.get("batch_stats", {}),
                     jnp.zeros((1, *cfg.crop_hw, 3), jnp.float32))
    feat_dim = int(probe.shape[-1])
    pipe = TrackingPipeline(cfg, embed_fn, variables["params"],
                            variables.get("batch_stats", {}), feat_dim)

    # ---- detections: MOT file, or the built-in CenterNetLite detector
    dets = None
    detect = None
    if args.detections:
        dets = load_mot_detections(args.detections, cfg.max_dets,
                                   min_conf=args.conf_thres)
    elif args.detector == "yolov5":
        from .models.yolo import build_yolo, make_yolo_detector_fn

        det_hw = tuple(args.det_size)
        det_model = build_yolo(args.yolo_variant, num_classes=1,
                               dtype=jnp.bfloat16)
        dvars = jax.jit(lambda k, x: det_model.init(k, x, train=False))(
            jax.random.PRNGKey(1), jnp.zeros((1, *det_hw, 3)))
        if args.det_torch:
            from .utils.torch_convert import (convert_yolov5,
                                              load_torch_state_dict)
            dvars = convert_yolov5(load_torch_state_dict(args.det_torch),
                                   dvars)
        elif args.det_ckpt:
            from .utils import restore_checkpoint
            dvars = restore_checkpoint(args.det_ckpt, dvars)
        qstate_y = None
        if args.int8:
            # int8 trunk for the detector too (same PTQ machinery as the
            # embed): calibrate on the first 8 source frames when available
            # (multi-frame sample -> robust activation scales, ADVICE r3)
            from .models.yolo import quantize_yolo
            try:
                from .tracking.sources import iter_frames as _itf
                calib_list = [fr for _, fr in _itf(args.source, 8)]
                if not calib_list:
                    raise ValueError("empty source")
                calib_frames = np.stack(calib_list)
            except Exception:
                calib_frames = np.random.default_rng(0).integers(
                    0, 255, (8, *det_hw, 3)).astype(np.uint8)
            qstate_y = quantize_yolo(det_model, dvars, calib_frames, det_hw)
        detect = make_yolo_detector_fn(det_model, dvars, det_hw,
                                       max_dets=cfg.max_dets,
                                       conf_thres=args.conf_thres,
                                       qstate=qstate_y)
    else:
        from .models.detector import CenterNetLite
        from .train.detector_train import make_detector_fn

        det_hw = tuple(args.det_size)
        det_model = CenterNetLite(base=args.det_base)
        dvars = jax.jit(lambda k, x: det_model.init(k, x, train=True))(
            jax.random.PRNGKey(1), jnp.zeros((1, *det_hw, 3)))
        if args.det_ckpt:
            from .utils import restore_checkpoint
            dvars = restore_checkpoint(args.det_ckpt, dvars)
        detect = make_detector_fn(det_model, dvars, det_hw,
                                  max_dets=cfg.max_dets)

    # ---- frame source (video / dir / webcam) or blanks for det-only runs
    if args.source:
        from .tracking.sources import iter_frames, source_fps
        frame_iter = iter_frames(args.source, args.max_frames)
        vid_fps = source_fps(args.source)
    else:
        n_frames = max(dets) if dets else 0
        if args.max_frames:
            n_frames = min(n_frames, args.max_frames)
        blank = np.zeros((64, 64, 3), np.uint8)
        frame_iter = ((i, blank) for i in range(1, n_frames + 1))
        vid_fps = 30

    writer = None
    if args.save_vid:
        from .tracking.annotate import AnnotatedVideoWriter
        writer = AnnotatedVideoWriter(args.save_vid, fps=vid_fps)

    empty = (np.zeros((cfg.max_dets, 4), np.float32),
             np.zeros(cfg.max_dets, np.float32),
             np.zeros(cfg.max_dets, bool))
    if args.chunk > 1 and dets is not None and writer is None:
        # chunked throughput path: ceil(T/chunk) device dispatches instead
        # of one per frame (make_chunked_tracker; the bench's MOT16-load
        # operating point runs this exact program)
        items = list(frame_iter)
        f_ids = [i for i, _ in items]
        frames_np = np.stack([f for _, f in items])
        t_total = len(items)
        tlwh_np = np.zeros((t_total, cfg.max_dets, 4), np.float32)
        conf_np = np.zeros((t_total, cfg.max_dets), np.float32)
        valid_np = np.zeros((t_total, cfg.max_dets), bool)
        for i, f_idx in enumerate(f_ids):
            tlwh_np[i], conf_np[i], valid_np[i] = dets.get(f_idx, empty)
        pipe.run_sequence(frames_np, tlwh_np, conf_np, valid_np,
                          chunk=args.chunk, first_frame=f_ids[0],
                          frame_crop_cap=args.frame_crop_cap or None)
    else:
        if args.chunk > 1:
            print("--chunk needs --detections (and no --save_vid); "
                  "falling back to the per-frame path")
        for f_idx, frame in frame_iter:
            if dets is not None:
                tlwh, conf, valid = dets.get(f_idx, empty)
            else:
                tlwh, conf, valid = detect(frame)
            out = pipe.step(f_idx, frame, tlwh, conf, valid)
            if writer is not None:
                writer.write(frame, np.asarray(out["tlwh"]),
                             np.asarray(out["ids"]), np.asarray(out["valid"]))
    if writer is not None:
        writer.close()
        print(f"annotated output -> {args.save_vid}")
    rows = pipe.write(args.save_txt)
    print(f"{rows} rows -> {args.save_txt}; "
          f"timing: {pipe.timing_summary()}")
    if args.gt:
        # TrackEval-exact scoring: full 9-column gt parse + MotChallenge2DBox
        # preprocessing (distractor-matched det removal, zero-mark +
        # pedestrian filter, crowd exclusion) before CLEAR/Identity/HOTA
        from .tracking.metrics import evaluate_mot16
        m = evaluate_mot16(args.gt, args.save_txt,
                           benchmark=args.benchmark)
        print("  ".join(f"{k}: {v:.2f}" for k, v in m.items()
                        if not k.startswith("_")))
        return m
    return rows
