"""Device-side algorithm ops — the TPU-native replacements for the reference's
native dependencies (faiss C++/CUDA kNN, cuML DBSCAN, numpy re-ranking).

- distance:  Pallas tiled pairwise distance kernel + top-k gallery search
             (replaces faiss bfKnn, ref reid/faiss_utils.py:56-118)
- rerank:    k-reciprocal Jaccard re-ranking (ref faiss_utils.py:142-244)
- camera:    per-camera de-bias whitening (ref reid/inference_utils.py:5-15)
- dbscan:    DBSCAN over precomputed distances (replaces sklearn/cuML)
- kmeans:    jit k-means (replaces faiss KMeans, ref gan/kmeans_.py)
- ivf:       IVF approximate top-k for 100k+ galleries (replaces faiss
             GpuIndexIVFFlat, ref faiss_utils.py:158-181 search options)
"""

from .distance import (
    pairwise_cosine,
    pairwise_l1,
    pairwise_sqeuclidean,
    topk_neighbors,
)
from .camera import diminish_camera_bias, smooth_tracklets
from .rerank import (
    compute_jaccard_distance,
    compute_jaccard_distance_ivf,
    compute_jaccard_distance_sharded,
    jaccard_distance,
)
from .dbscan import dbscan_precomputed
from .kmeans import kmeans
from .ivf import IVFIndex, build_ivf, ivf_topk
from .policy import SearchPlan, choose_search
