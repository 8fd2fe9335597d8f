"""Post-training int8 quantization for serving (TPU MXU s8xs8->s32).

The reference's deployment format is ONNX consumed by ONNX Runtime
(ref reid/train_prepare.py:14-47, image_reid_inference.py:239); its serving
precision is fp16/fp32. This module goes further down the production-serving
axis the TPU way: one-shot post-training quantization of any Flax model's
Conv/Dense layers to int8, with

MEASURED (v5e, 2026-08-17): end-to-end quantized SERes18 embed runs
36.0k crops/s/chip vs 29.3k bf16 — a 1.23x serving speedup — even though
isolated int8 convs microbench at only 0.61-0.96x bf16 compute
(scripts/int8_probe.py; int8 matmuls hit 1.41x = 54 TOP/s). The win is
bandwidth, not FLOPs: int8 activations halve inter-layer HBM traffic on
the partly memory-bound trunk, and weights shrink 4x (multi-model serving
headroom). bench.py records both precisions. The quantized path provides:

  * per-output-channel symmetric weight scales (absmax/127),
  * per-tensor static activation scales from a calibration pass,
  * the conv executed as s8 x s8 -> s32 (`preferred_element_type`), and the
    dequant rescale + bias left to XLA's elementwise fusion (BatchNorm and
    activations stay in f32/bf16 and fuse into the same epilogue, so no BN
    folding is required for speed).

Everything is built on Flax's method interceptor, so NO model code changes:
`calibrate` observes per-layer input ranges via `Module.sow`, and
`quantized_apply` re-executes each intercepted Conv/Dense with the
quantized kernel while every other module runs untouched.

Typical use (serve path):

    qstate = quantize(model, variables, calib_batches)   # one shot
    feats = quantized_apply(model, variables, qstate, images, train=False)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_COLLECTION = "quant_absmax"

# Route eligible 3x3/s1 convs to the Pallas int8 MXU kernel (ops/qconv.py).
# Default False — measured a net end-to-end LOSS despite per-layer wins
# (see the comment in _quantized_conv).
USE_PALLAS_QCONV = False

# Route eligible stride-1 SE basic blocks to the FUSED Pallas block kernel
# (ops/qblock.py): both convs + BN/IBN + SE + residual in one kernel, so
# no per-conv pallas_call boundary breaks XLA's epilogue fusions (the
# failure mode that keeps USE_PALLAS_QCONV off). Measured OFF
# (scripts/qblock_probe.py --e2e/--attrib, v5e 2026-08-19): isolated
# per-block chains show the kernel 1.1-2.2x faster than XLA int8, but
# end-to-end the full trunk runs 0.92x with all blocks routed and is a
# wash/loss for every routing subset — in-situ attribution shows the
# isolated baseline is layout-crippled (chain boundaries force default
# layouts on XLA), so the "per-block win" does not exist in the real
# graph, and the block22 route costs +0.8 ms/b256 on its own. The e2e
# A/B is the only decision point that counts; XLA's int8 path keeps it.
USE_PALLAS_QBLOCK = False

# Diagnostic: when set, only SEBasicBlock module paths containing this
# substring route to the fused kernel (e.g. "layer4_1"). Lets probes
# attribute the per-boundary cost block by block. None = route all.
QBLOCK_ROUTE_FILTER = None


def _path_str(module: nn.Module) -> str:
    return "/".join(str(p) for p in module.path)


def _canon_padding(p, rank: int):
    """Mirror flax.linen.linear.canonicalize_padding for the common cases."""
    if isinstance(p, str):
        return p
    if isinstance(p, int):
        return [(p, p)] * rank
    out = []
    for e in p:
        out.append((e, e) if isinstance(e, int) else tuple(e))
    return out


def _is_quantizable(module: nn.Module) -> bool:
    return type(module) in (nn.Conv, nn.Dense)


@dataclasses.dataclass(frozen=True)
class QuantState:
    """Int8 kernels + scales, keyed by module path ("a/b/c")."""
    kernels: Dict[str, jnp.ndarray]      # int8, original kernel layout
    w_scales: Dict[str, jnp.ndarray]     # (C_out,) float32
    act_scales: Dict[str, jnp.ndarray]   # () float32, input scale per layer

    def tree(self):
        return {"kernels": self.kernels, "w_scales": self.w_scales,
                "act_scales": self.act_scales}


def calibrate_with_apply(
    apply_fn: Callable,
    variables,
    batches: Sequence[Any],
    select: Optional[Callable[[str, nn.Module], bool]] = None,
    **apply_kwargs,
) -> Dict[str, float]:
    """`calibrate` over a bound `Module.apply` (e.g. a train state's
    apply_fn) — one jit'd sow pass per batch, so it stays fast even through
    a high-latency device link where the eager `calibrate_fn` would
    dispatch hundreds of ops."""
    select = select or (lambda path, m: True)

    def interceptor(next_fun, args, kwargs, ctx):
        if (_is_quantizable(ctx.module) and ctx.method_name == "__call__"
                and select(_path_str(ctx.module), ctx.module)):
            ctx.module.sow(
                _COLLECTION, "absmax",
                jnp.max(jnp.abs(args[0].astype(jnp.float32))),
                reduce_fn=lambda a, b: b if a is None else jnp.maximum(a, b),
                init_fn=lambda: None,
            )
        return next_fun(*args, **kwargs)

    @jax.jit
    def run(v, *xs):
        with nn.intercept_methods(interceptor):
            _, stats = apply_fn(v, *xs, mutable=[_COLLECTION],
                                **apply_kwargs)
        return stats[_COLLECTION]

    out: Dict[str, float] = {}
    for b in batches:
        xs = b if isinstance(b, tuple) else (b,)
        stats = jax.device_get(run(variables, *xs))
        flat = _flatten_sow(stats)
        for k, v in flat.items():
            out[k] = max(out.get(k, 0.0), float(v))
    return out


def calibrate(
    model: nn.Module,
    variables,
    batches: Sequence[Any],
    select: Optional[Callable[[str, nn.Module], bool]] = None,
    **apply_kwargs,
) -> Dict[str, float]:
    """Run calibration batches; return per-layer input absmax.

    `batches`: sequence of positional-arg tuples (or single arrays) for
    `model.apply`. Statistics are gathered with `Module.sow` inside a jit'd
    apply — one compile, device-side maxima.
    """
    return calibrate_with_apply(model.apply, variables, batches,
                                select=select, **apply_kwargs)


def _flatten_sow(tree, prefix=()) -> Dict[str, float]:
    out = {}
    for k, v in tree.items():
        if k == "absmax":
            out["/".join(prefix)] = np.asarray(v).max()
        elif isinstance(v, dict):
            out.update(_flatten_sow(v, prefix + (k,)))
    return out


def quantize_weights(
    model: nn.Module,
    variables,
    act_absmax: Dict[str, float],
) -> QuantState:
    """Per-output-channel symmetric int8 quantization of every layer that
    has a calibrated activation scale."""
    params = variables["params"]
    kernels, w_scales, act_scales = {}, {}, {}
    for path, amax in act_absmax.items():
        node = params
        for part in path.split("/"):
            node = node[part]
        kernel = np.asarray(node["kernel"], np.float32)
        reduce_axes = tuple(range(kernel.ndim - 1))   # all but C_out
        absmax = np.maximum(np.abs(kernel).max(axis=reduce_axes), 1e-12)
        scale = (absmax / 127.0).astype(np.float32)
        q = np.clip(np.round(kernel / scale), -127, 127).astype(np.int8)
        kernels[path] = jnp.asarray(q)
        w_scales[path] = jnp.asarray(scale)
        act_scales[path] = jnp.float32(max(amax, 1e-12) / 127.0)
    return QuantState(kernels, w_scales, act_scales)


def quantize(model: nn.Module, variables, calib_batches: Sequence[Any],
             select: Optional[Callable[[str, nn.Module], bool]] = None,
             **apply_kwargs) -> QuantState:
    """One-shot PTQ: calibrate + quantize."""
    absmax = calibrate(model, variables, calib_batches, select=select,
                       **apply_kwargs)
    return quantize_weights(model, variables, absmax)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _quantized_conv(m: nn.Conv, x, kq, sw, sx):
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127.0, 127.0)
    xq = xq.astype(jnp.int8)
    rank = len(m.kernel_size)
    spatial = "DHW"[3 - rank:] if rank <= 3 else None
    assert spatial is not None, "conv rank > 3 not supported"
    dn = jax.lax.conv_dimension_numbers(
        xq.shape, kq.shape,
        (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"))
    strides = m.strides if m.strides is not None else (1,) * rank
    if isinstance(strides, int):
        strides = (strides,) * rank
    k_dil = m.kernel_dilation if m.kernel_dilation is not None else (1,) * rank
    if isinstance(k_dil, int):
        k_dil = (k_dil,) * rank
    i_dil = m.input_dilation if m.input_dilation is not None else (1,) * rank
    if isinstance(i_dil, int):
        i_dil = (i_dil,) * rank

    pad = _canon_padding(m.padding, rank)
    if USE_PALLAS_QCONV and _on_tpu():
        # MEASURED OFF by default (v5e, 2026-08-19): the Pallas int8 conv
        # (ops/qconv.py) is bit-exact and beats the XLA int8 conv on every
        # trunk shape in isolation (up to +12%: stage4 2.287 vs 2.604 ms
        # at b512, 1.44x vs bf16 — scripts/qconv_probe.py), but routed
        # into the full quantized trunk it LOSES ~12% end-to-end (30.0k
        # vs 34.0k crops/s b256) — the pallas_call boundary breaks XLA's
        # dequant+BN+ReLU+requant epilogue fusions, which are worth more
        # than the MXU win. Kept behind this flag for future jaxlib/
        # Mosaic revisits (or a fused-epilogue kernel that outputs int8).
        from ..ops.qconv import conv3x3_s8, qconv_applicable
        if qconv_applicable(xq.shape, kq.shape, strides, pad,
                            m.feature_group_count, i_dil, k_dil):
            out = conv3x3_s8(
                xq, kq, (sx * sw).astype(jnp.float32),
                out_dtype=m.dtype if m.dtype is not None else jnp.float32)
            if m.use_bias:
                out = out + m.variables["params"]["bias"].astype(out.dtype)
            return out

    y = jax.lax.conv_general_dilated(
        xq, kq, strides, pad,
        lhs_dilation=i_dil, rhs_dilation=k_dil, dimension_numbers=dn,
        feature_group_count=m.feature_group_count,
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (sx * sw)
    if m.use_bias:
        out = out + m.variables["params"]["bias"].astype(jnp.float32)
    return out.astype(m.dtype) if m.dtype is not None else out


def _quantized_dense(m: nn.Dense, x, kq, sw, sx):
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127.0, 127.0)
    xq = xq.astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, kq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (sx * sw)
    if m.use_bias:
        out = out + m.variables["params"]["bias"].astype(jnp.float32)
    return out.astype(m.dtype) if m.dtype is not None else out


def make_qblock_params(variables, qstate: QuantState, prefix: str,
                       planes: int, ibn: bool, downsample: bool):
    """Fold one SEBasicBlock's variables + quantization state into the
    fused kernel's `QBlockParams` (ops/qblock.py).

    `prefix` is the block's module path ("" for a directly-applied block,
    "block41/" inside the full model). It scopes the `qstate` lookups only:
    `variables` must already be the BLOCK's own tree (a bound module's
    `.variables` inside an interceptor is block-scoped). BN affines fold
    with the conv dequant scales per the QBlockParams contract; the IBN
    flavor keeps conv1's dequant vector separate and zero-pads the two
    half-affines to full width (the kernel selects by channel mask)."""
    from ..ops.qblock import QBlockParams, fold_bn

    def node(tree, rel):
        for part in rel.strip("/").split("/"):
            tree = tree[part]
        return tree

    params = variables["params"]
    stats = variables["batch_stats"]
    k1 = qstate.kernels[prefix + "conv1"]
    k2 = qstate.kernels[prefix + "conv2"]
    cin, cout = k1.shape[2], k1.shape[3]
    dq1 = (qstate.act_scales[prefix + "conv1"]
           * qstate.w_scales[prefix + "conv1"])           # (cout,)
    dq2 = (qstate.act_scales[prefix + "conv2"]
           * qstate.w_scales[prefix + "conv2"])

    kw = {}
    if ibn:
        half = cout // 2
        bn_p = node(params, "bn1/BN")
        bn_s = node(stats, "bn1/BN")
        a_bn, c_bn = fold_bn(bn_p["scale"], bn_p["bias"],
                             bn_s["mean"], bn_s["var"])
        in_p = node(params, "bn1/IN")
        pad = jnp.zeros((half,), jnp.float32)
        kw.update(
            a1=jnp.concatenate([pad, jnp.asarray(a_bn, jnp.float32)]),
            c1=jnp.concatenate([pad, jnp.asarray(c_bn, jnp.float32)]),
            dq1_vec=dq1 * jnp.ones((cout,), jnp.float32),
            in_scale=jnp.concatenate(
                [jnp.asarray(in_p["scale"], jnp.float32), pad]),
            in_bias=jnp.concatenate(
                [jnp.asarray(in_p["bias"], jnp.float32), pad]),
        )
    else:
        bn_p, bn_s = node(params, "bn1"), node(stats, "bn1")
        a1, c1 = fold_bn(bn_p["scale"], bn_p["bias"],
                         bn_s["mean"], bn_s["var"])
        kw.update(a1=jnp.asarray(a1) * dq1, c1=jnp.asarray(c1))

    bn2_p, bn2_s = node(params, "bn2"), node(stats, "bn2")
    a2, c2 = fold_bn(bn2_p["scale"], bn2_p["bias"],
                     bn2_s["mean"], bn2_s["var"])
    if downsample:
        kd = qstate.kernels[prefix + "down_conv"]
        dqd = (qstate.act_scales[prefix + "down_conv"]
               * qstate.w_scales[prefix + "down_conv"])
        bnd_p, bnd_s = node(params, "down_bn"), node(stats, "down_bn")
        ad, cd = fold_bn(bnd_p["scale"], bnd_p["bias"],
                         bnd_s["mean"], bnd_s["var"])
        kw.update(wd=kd.reshape(cin, cout), ad=jnp.asarray(ad) * dqd,
                  cd=jnp.asarray(cd),
                  inv_sxd=1.0 / qstate.act_scales[prefix + "down_conv"])

    se = node(params, "seblock")
    return QBlockParams(
        w1=k1.reshape(9, cin, cout), w2=k2.reshape(9, cout, cout),
        a2=jnp.asarray(a2) * dq2, c2=jnp.asarray(c2),
        inv_sx1=1.0 / qstate.act_scales[prefix + "conv1"],
        inv_sx2=1.0 / qstate.act_scales[prefix + "conv2"],
        wfc1=se["fc1"]["kernel"].astype(jnp.bfloat16),
        wfc2=se["fc2"]["kernel"].astype(jnp.bfloat16),
        **kw)


def _qblock_route(m: nn.Module, args, kwargs, qstate: QuantState):
    """Try the fused block kernel for this module call; None = not
    applicable (caller falls through to per-layer interception)."""
    if type(m).__name__ != "SEBasicBlock" or not _on_tpu():
        return None
    train = kwargs.get("train", args[1] if len(args) > 1 else True)
    if train is not False:
        return None
    if m.strides != 1 or m.attention != "se" or m.renorm:
        return None
    x = args[0]
    cin, cout = x.shape[-1], m.planes
    if x.ndim != 4 or cin % 128 or cout % 128:
        return None
    path = _path_str(m)
    if QBLOCK_ROUTE_FILTER is not None and QBLOCK_ROUTE_FILTER not in path:
        return None
    prefix = path + "/" if path else ""
    for rel in ("conv1", "conv2") + (("down_conv",) if m.downsample else ()):
        if prefix + rel not in qstate.kernels:
            return None
    from ..ops.qblock import se_basic_block_s8
    p = make_qblock_params(m.variables, qstate, prefix, m.planes,
                           ibn=m.ibn, downsample=m.downsample)
    out_dtype = m.dtype if m.dtype is not None else jnp.float32
    return se_basic_block_s8(x, p, ibn=m.ibn, out_dtype=out_dtype)


def quantization_interceptor(qstate: QuantState):
    """Linen method interceptor executing calibrated Conv/Dense in int8."""
    kernels, w_scales, act_scales = (qstate.kernels, qstate.w_scales,
                                     qstate.act_scales)

    def interceptor(next_fun, args, kwargs, ctx):
        if (USE_PALLAS_QBLOCK and ctx.method_name == "__call__"):
            out = _qblock_route(ctx.module, args, kwargs, qstate)
            if out is not None:
                return out
        if _is_quantizable(ctx.module) and ctx.method_name == "__call__":
            path = _path_str(ctx.module)
            if path in kernels:
                fn = (_quantized_conv if isinstance(ctx.module, nn.Conv)
                      else _quantized_dense)
                return fn(ctx.module, args[0], kernels[path],
                          w_scales[path], act_scales[path])
        return next_fun(*args, **kwargs)

    return interceptor


def quantized_context(qstate: QuantState):
    """Context manager under which ANY Flax module call — whichever
    apply_fn or helper invokes it — executes its calibrated Conv/Dense
    layers in int8. Must be active while the computation is traced (wrap
    the body of the function you jit, not the jit call site)."""
    return nn.intercept_methods(quantization_interceptor(qstate))


def quantized_apply(model: nn.Module, variables, qstate: QuantState,
                    *args, **kwargs):
    """`model.apply` with calibrated Conv/Dense layers executed in int8.

    Layers without an entry in `qstate` (not selected / not calibrated) run
    in their original precision; all other modules (norms, pooling,
    attention, activations) are untouched — XLA fuses the dequant rescale
    into the following elementwise chain.
    """
    with quantized_context(qstate):
        return model.apply(variables, *args, **kwargs)


def calibrate_fn(fn: Callable, batches: Sequence[Any],
                 select: Optional[Callable[[str, nn.Module], bool]] = None,
                 ) -> Dict[str, float]:
    """Calibrate through an arbitrary callable that invokes Flax modules
    internally (e.g. a full serving step with normalization + TTA, possibly
    with jit'd inner steps). Runs under `jax.disable_jit()` so every module
    call executes eagerly and per-layer input absmax can be read concretely
    (a cached jit'd inner step would otherwise skip tracing — and the
    interceptor — entirely); use the jit-friendly `calibrate` when you hold
    the model + variables directly."""
    select = select or (lambda path, m: True)
    stats: Dict[str, float] = {}

    def interceptor(next_fun, args, kwargs, ctx):
        if (_is_quantizable(ctx.module) and ctx.method_name == "__call__"
                and select(_path_str(ctx.module), ctx.module)):
            path = _path_str(ctx.module)
            v = float(jnp.max(jnp.abs(args[0].astype(jnp.float32))))
            stats[path] = max(stats.get(path, 0.0), v)
        return next_fun(*args, **kwargs)

    with jax.disable_jit(), nn.intercept_methods(interceptor):
        for b in batches:
            xs = b if isinstance(b, tuple) else (b,)
            fn(*xs)
    if not stats:
        raise RuntimeError(
            "calibration observed no Conv/Dense calls - fn does not invoke "
            "Flax modules (or `select` rejected every layer)")
    return stats


def prune_quantized_kernels(params, qstate: QuantState):
    """Replace each quantized layer's f32 kernel with a 1-element placeholder.

    Under `quantized_context` those kernels are never read (the interceptor
    short-circuits Conv/Dense.__call__ before `m.param("kernel")` binds), but
    a jit'd inner step still threads the full params tree through its call —
    and `jax.export` serializes pre-DCE, so the dead f32 kernels would ship
    inside the artifact alongside the int8 ones (measured: +25% instead of
    -75%). Biases and every non-quantized leaf are kept intact."""

    def copy_containers(node):
        if isinstance(node, (dict,)) or hasattr(node, "items"):
            return {k: copy_containers(v) for k, v in node.items()}
        return node

    pruned = copy_containers(params)
    for path in qstate.kernels:
        node = pruned
        for part in path.split("/"):
            node = node[part]
        node["kernel"] = jnp.zeros((1,), jnp.float32)
    return pruned


def make_quantized_embed_fn(model: nn.Module, qstate: QuantState):
    """Serve-path embed contract: fn(params, batch_stats, crops) -> L2-normed
    [feature ‖ logits] — identical signature to the tracking pipeline's
    `embed_fn` (tracking/pipeline.py), but with int8 Conv/Dense layers."""

    def embed_fn(params, batch_stats, crops):
        feat, logits = quantized_apply(
            model, {"params": params, "batch_stats": batch_stats}, qstate,
            crops, train=False)
        f = jnp.concatenate([feat.astype(jnp.float32),
                             logits.astype(jnp.float32)], axis=1)
        return f / jnp.maximum(jnp.linalg.norm(f, axis=1, keepdims=True),
                               1e-12)

    return embed_fn
