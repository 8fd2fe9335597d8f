"""Serving-artifact export via jax.export (StableHLO).

The deployment-format role of the reference's ONNX export + onnx-simplifier +
ONNX Runtime (ref `reid/train_prepare.py:14-47` to_onnx with a dynamic batch
axis; consumed at `image_reid_train.py:649-650`, `image_reid_inference.py:239`).
Here the serialized artifact is a StableHLO module with a symbolic batch
dimension, re-loadable with `jax.export` and runnable under jit on any
XLA backend.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp


def export_serving_fn(
    fn: Callable,
    example_args: Tuple,
    path: str,
    dynamic_batch: bool = True,
) -> bytes:
    """Serialize `fn(*example_args)` to StableHLO bytes, saved at `path`.

    `fn` must be jittable and closed over its params (like the reference's
    exported ONNX graph embedding the weights).
    """
    from jax import export as jexport

    if dynamic_batch:
        sym = jexport.symbolic_shape("b")
        def to_spec(x):
            shape = (sym[0],) + tuple(x.shape[1:])
            return jax.ShapeDtypeStruct(shape, x.dtype)
    else:
        def to_spec(x):
            return jax.ShapeDtypeStruct(x.shape, x.dtype)

    specs = jax.tree_util.tree_map(to_spec, example_args)
    exported = jexport.export(jax.jit(fn))(*specs)
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    return data


def load_serving_fn(path: str) -> Callable:
    """Deserialize a StableHLO artifact into a callable (ORT-session role)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return jax.jit(exported.call)
