"""reid_tpu — TPU-native real-time ReID + multi-object-tracking framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`SuperbTUM/real-time-ReID-tracking` (reference mounted at /root/reference):

- ``reid_tpu.models``   — Flax model zoo (SERes18-IBN, CARes18, OSNet, PLR-OSNet,
  ViT-SIE, Swin v1/v2, 3D video ResNet, GAN backbones). Reference: ``reid/backbones/``.
- ``reid_tpu.losses``   — triplet family, center, DCC cluster-contrastive, label-smooth
  CE, circle, ranked, XBM. Reference: ``reid/losses/``, ``reid/tricks/XBM.py``.
- ``reid_tpu.ops``      — Pallas tiled pairwise-distance kernel, top-k gallery search,
  k-reciprocal Jaccard re-ranking, camera de-bias, DBSCAN, k-means.
  Reference: ``reid/faiss_utils.py`` (faiss C++/CUDA), ``reid/inference_utils.py``.
- ``reid_tpu.data``     — dataset parsers (Market1501/DukeMTMC/VeRi/MOT16), PK sampler,
  fused device-side augmentation. Reference: ``reid/datasets/``, ``reid/data_*.py``.
- ``reid_tpu.train``    — jit-compiled train steps, LR schedules, XBM / continual
  phases. Reference: ``reid/image_reid_train*.py``, ``reid/train_prepare.py``.
- ``reid_tpu.eval``     — vectorized CMC/mAP, TTA flip inference.
  Reference: ``reid/evaluate.py``, ``reid/image_reid_inference.py``.
- ``reid_tpu.tracking`` — static-shape on-device tracker: vectorized Kalman, DIoU +
  appearance costs, jit Hungarian/auction assignment, track lifecycle, MOT writer.
  Reference: ``modification_tracking/``, ``modification_deepsort/``.
- ``reid_tpu.parallel`` — device-mesh utilities: data-parallel pjit sharding, sharded
  gallery retrieval (replaces faiss IndexShards / NCCL DDP).

All device compute is jit-compiled, batch-static and bfloat16-friendly; the hot
distance/attention ops have Pallas TPU kernels with jnp fallbacks for CPU tests.
"""

__version__ = "0.1.0"
