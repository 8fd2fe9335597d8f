"""Loss zoo — functional JAX re-designs of ref `reid/losses/`.

All losses are pure functions over (embeddings, logits, labels, state);
stateful pieces (center-loss centers, DCC lookup tables, XBM ring buffer)
are explicit pytrees threaded through the train step.
"""

from .utils import cosine_dist, euclidean_dist, normalize, softmax_weights
from .triplet import (
    hard_example_mining,
    semi_hard_triplet,
    triplet_beta,
    triplet_loss_batch_hard,
    weighted_regularized_triplet,
)
from .center import center_loss
from .dcc import DCCState, dcc_loss, init_dcc, update_dcc_luts
from .identification import (
    cross_entropy_label_smooth,
    focal_loss,
    label_smoothing_nll,
)
from .circle import circle_loss
from .ranked import ranked_loss
from .hybrid import HybridLossState, hybrid_loss, init_hybrid_state
from .xbm import XBMState, init_xbm, xbm_enqueue, xbm_triplet_loss
