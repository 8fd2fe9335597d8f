"""MADGRAD optimizer (Defazio & Jelassi 2021) as an optax transformation.

The reference trains PLR-OSNet (no-PK branch, ref image_reid_train.py:201:
lr=0.01, wd=5e-4, momentum=0.9 default) and the video 3D-ResNet
(ref video_reid_train.py:115: lr=1e-4, wd=5e-4, momentum=0) with
`madgrad.MADGRAD`; optimizer fidelity feeds the ±0.5% rank-1 target, so
this mirrors the pytorch implementation's update exactly
(update-parity-tested in tests/test_train.py):

    lamb_k = lr_k * sqrt(k + 1)
    s_{k+1}  = s_k  + lamb_k * g          (g includes L2: g + wd * p)
    v_{k+1}  = v_k  + lamb_k * g^2
    z_{k+1}  = x_0 - s_{k+1} / (v_{k+1}^(1/3) + eps)
    x_{k+1}  = (1 - c) x_k + c z_{k+1},   c = 1 - momentum

Dual averaging FROM x_0: the initial parameters anchor every step, so the
state carries x_0 alongside the two weighted gradient sums.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
import optax


class MadgradState(NamedTuple):
    count: jnp.ndarray
    grad_sum: Any       # s: weighted gradient sum
    grad_sum_sq: Any    # v: weighted squared-gradient sum
    x0: Any             # initial parameters (dual-averaging anchor)


def madgrad(
    learning_rate: Union[float, Callable[[jnp.ndarray], jnp.ndarray]],
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    eps: float = 1e-6,
) -> optax.GradientTransformation:
    """MADGRAD; `learning_rate` may be a scalar or an optax schedule (the
    schedule enters through lamb_k, matching torch's per-step group lr)."""
    ck = 1.0 - momentum
    lr_fn = learning_rate if callable(learning_rate) \
        else (lambda _: learning_rate)

    def init_fn(params):
        z = jax.tree_util.tree_map(jnp.zeros_like, params)
        return MadgradState(
            count=jnp.zeros((), jnp.int32),
            grad_sum=z,
            grad_sum_sq=jax.tree_util.tree_map(jnp.zeros_like, params),
            x0=jax.tree_util.tree_map(jnp.asarray, params),
        )

    def update_fn(grads, state, params=None):
        if params is None:
            raise ValueError("madgrad requires params")
        lamb = lr_fn(state.count) * jnp.sqrt(state.count.astype(jnp.float32)
                                             + 1.0)

        def leaf(g, p, s, v, x0):
            g = g + weight_decay * p if weight_decay else g
            s = s + lamb * g
            v = v + lamb * g * g
            rms = jnp.cbrt(v) + eps
            z = x0 - s / rms
            new_p = (1.0 - ck) * p + ck * z
            return new_p - p, s, v

        flat = jax.tree_util.tree_map(
            leaf, grads, params, state.grad_sum, state.grad_sum_sq, state.x0)
        updates = jax.tree_util.tree_map(lambda t: t[0], flat,
                                         is_leaf=lambda t: isinstance(t, tuple))
        new_s = jax.tree_util.tree_map(lambda t: t[1], flat,
                                       is_leaf=lambda t: isinstance(t, tuple))
        new_v = jax.tree_util.tree_map(lambda t: t[2], flat,
                                       is_leaf=lambda t: isinstance(t, tuple))
        return updates, MadgradState(count=state.count + 1, grad_sum=new_s,
                                     grad_sum_sq=new_v, x0=state.x0)

    return optax.GradientTransformation(init_fn, update_fn)
