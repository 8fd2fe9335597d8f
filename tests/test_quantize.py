"""Post-training int8 quantization (utils/quantize.py).

Covers: exact oracle parity of the quantized conv math, end-to-end accuracy
of a quantized SERes18 embed pass, int8 ops actually present in the traced
graph, and selective-layer quantization.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from reid_tpu.utils.quantize import (
    QuantState, calibrate, make_quantized_embed_fn, quantize,
    quantize_weights, quantized_apply,
)


class TinyConv(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3), padding=1, name="c1")(x)
        x = nn.relu(x)
        return nn.Dense(4, name="d")(x.mean(axis=(1, 2)))


@pytest.fixture(scope="module")
def tiny():
    model = TinyConv()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


def test_calibrate_collects_all_layers(tiny):
    model, variables, x = tiny
    absmax = calibrate(model, variables, [x])
    assert set(absmax) == {"c1", "d"}
    assert absmax["c1"] == pytest.approx(float(jnp.abs(x).max()))


def test_quantized_conv_oracle(tiny):
    """The int8 path must equal the same math done in exact f32 arithmetic:
    conv(xq, wq) * sx * sw  (+ bias). Integer products here stay < 2^24 so
    f32 conv over the integer values is exact."""
    model, variables, x = tiny
    qs = quantize(model, variables, [x])
    got = quantized_apply(model, variables, qs, x)

    # oracle: dequantized f32 conv with the same quantized operands
    params = variables["params"]
    sx = float(qs.act_scales["c1"])
    xq = np.clip(np.round(np.asarray(x) / sx), -127, 127)
    wq = np.asarray(qs.kernels["c1"], np.float32)
    sw = np.asarray(qs.w_scales["c1"])
    y = jax.lax.conv_general_dilated(
        jnp.asarray(xq), jnp.asarray(wq), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, wq.shape, ("NHWC", "HWIO", "NHWC")))
    y = np.asarray(y) * (sx * sw) + np.asarray(params["c1"]["bias"])
    y = np.maximum(y, 0.0).mean(axis=(1, 2))
    sxd = float(qs.act_scales["d"])
    yq = np.clip(np.round(y / sxd), -127, 127)
    dq = np.asarray(qs.kernels["d"], np.float32)
    sd = np.asarray(qs.w_scales["d"])
    want = (yq @ dq) * (sxd * sd) + np.asarray(params["d"]["bias"])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_quantization_error_bounded(tiny):
    model, variables, x = tiny
    qs = quantize(model, variables, [x])
    got = np.asarray(quantized_apply(model, variables, qs, x))
    ref = np.asarray(model.apply(variables, x))
    err = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
    assert err < 0.1, f"relative error {err}"


def test_int8_ops_in_graph(tiny):
    model, variables, x = tiny
    qs = quantize(model, variables, [x])
    jaxpr = str(jax.make_jaxpr(
        lambda v, xx: quantized_apply(model, v, qs, xx))(variables, x))
    assert "i8" in jaxpr and "conv_general_dilated" in jaxpr
    # the conv accumulates in int32
    assert "preferred_element_type=int32" in jaxpr


def test_selective_quantization(tiny):
    model, variables, x = tiny
    qs = quantize(model, variables, [x],
                  select=lambda path, m: path != "d")
    assert set(qs.kernels) == {"c1"}
    got = np.asarray(quantized_apply(model, variables, qs, x))
    ref = np.asarray(model.apply(variables, x))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 0.1


def test_seres18_quantized_embed_close():
    """End-to-end: quantized SERes18 eval features stay aligned with the
    f32 features (per-row cosine), and the serve-path embed contract works."""
    from reid_tpu.models import build_model

    model = build_model("seres18", num_classes=16, num_cams=4)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 64, 32, 3)), jnp.float32)
    variables = jax.jit(
        lambda k, xx: model.init(k, xx, train=True))(jax.random.PRNGKey(0), x)

    qs = quantize(model, variables, [x], train=False)
    feat_q, logits_q = quantized_apply(model, variables, qs, x, train=False)
    feat_f, logits_f = model.apply(variables, x, train=False)

    fq = np.asarray(feat_q, np.float64)
    ff = np.asarray(feat_f, np.float64)
    cos = np.sum(fq * ff, 1) / np.maximum(
        np.linalg.norm(fq, axis=1) * np.linalg.norm(ff, axis=1), 1e-12)
    assert cos.min() > 0.97, f"feature cosine {cos.min()}"

    embed = jax.jit(make_quantized_embed_fn(model, qs))
    e = np.asarray(embed(variables["params"], variables["batch_stats"], x))
    assert e.shape == (8, 512 + 16)
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, atol=1e-4)

    # retrieval-order preservation: nearest neighbor under the quantized
    # embedding matches the f32 one for most probes
    ef = np.asarray(jnp.concatenate(
        [feat_f, logits_f], 1) / jnp.linalg.norm(
            jnp.concatenate([feat_f, logits_f], 1), axis=1, keepdims=True))
    simq = e @ e.T - np.eye(len(e))
    simf = ef @ ef.T - np.eye(len(ef))
    agree = (simq.argmax(1) == simf.argmax(1)).mean()
    assert agree >= 0.75, f"NN agreement {agree}"


def test_quantize_weights_roundtrip(tiny):
    model, variables, _ = tiny
    qs = quantize_weights(model, variables, {"c1": 2.0})
    k = np.asarray(variables["params"]["c1"]["kernel"])
    deq = np.asarray(qs.kernels["c1"], np.float32) * np.asarray(
        qs.w_scales["c1"])
    # dequantized weights within half a quantization step
    step = np.asarray(qs.w_scales["c1"])
    assert np.all(np.abs(deq - k) <= 0.5 * step + 1e-9)
    assert isinstance(qs, QuantState)
