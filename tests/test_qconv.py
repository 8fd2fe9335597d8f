"""Pallas int8 3x3 conv (ops/qconv.py): integer exactness vs a NumPy
oracle, routing predicate, and the quantized-path integration contract.

The oracle is pure NumPy (int32 accumulation) — XLA:CPU's int8
conv_general_dilated lowering is pathologically slow (~100 s for a tiny
shape), so tests must never touch it. On-chip exactness vs the XLA TPU
int8 conv is asserted by scripts/qconv_probe.py.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from reid_tpu.ops.qconv import (conv3x3_s8, conv3x3_s8_dma,
                                qconv_applicable)


def np_conv3x3_s8(x, wq):
    """int32-exact 3x3/s1/SAME NHWC conv oracle."""
    b, h, w, cin = x.shape
    cout = wq.shape[-1]
    xp = np.zeros((b, h + 2, w + 2, cin), np.int32)
    xp[:, 1:-1, 1:-1] = x.astype(np.int32)
    out = np.zeros((b, h, w, cout), np.int64)
    wq = wq.astype(np.int64)
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, dy:dy + h, dx:dx + w].astype(np.int64)
            out += (patch.reshape(-1, cin) @ wq[dy, dx]
                    ).reshape(b, h, w, cout)
    return out.astype(np.int32)


@pytest.mark.smoke
@pytest.mark.parametrize("shape", [(2, 5, 4, 8, 8), (4, 4, 4, 8, 16),
                                   (3, 6, 3, 16, 8)])
def test_qconv_exact_vs_numpy(shape):
    b, h, w, cin, cout = shape
    rng = np.random.default_rng(0)
    x = rng.integers(-127, 128, (b, h, w, cin)).astype(np.int8)
    wq = rng.integers(-127, 128, (3, 3, cin, cout)).astype(np.int8)
    y = conv3x3_s8(jnp.asarray(x), jnp.asarray(wq),
                   jnp.ones((cout,), jnp.float32), img_block=1,
                   interpret=True, out_dtype=jnp.float32)
    ref = np_conv3x3_s8(x, wq).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(y), ref)


@pytest.mark.parametrize("shape", [(2, 5, 4, 8, 8), (4, 4, 4, 8, 16)])
def test_qconv_dma_exact_vs_numpy(shape):
    b, h, w, cin, cout = shape
    rng = np.random.default_rng(3)
    x = rng.integers(-127, 128, (b, h, w, cin)).astype(np.int8)
    wq = rng.integers(-127, 128, (3, 3, cin, cout)).astype(np.int8)
    y = conv3x3_s8_dma(jnp.asarray(x), jnp.asarray(wq),
                       jnp.ones((cout,), jnp.float32), img_block=1,
                       interpret=True, out_dtype=jnp.float32)
    ref = np_conv3x3_s8(x, wq).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(y), ref)


def test_qconv_img_block_invariance():
    rng = np.random.default_rng(1)
    b, h, w, c = 4, 4, 4, 8
    x = rng.integers(-127, 128, (b, h, w, c)).astype(np.int8)
    wq = rng.integers(-127, 128, (3, 3, c, c)).astype(np.int8)
    sc = rng.uniform(0.001, 0.01, (c,)).astype(np.float32)
    outs = [np.asarray(conv3x3_s8(jnp.asarray(x), jnp.asarray(wq),
                                  jnp.asarray(sc), img_block=blk,
                                  interpret=True, out_dtype=jnp.float32))
            for blk in (1, 2, 4)]
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_qconv_scale_epilogue():
    rng = np.random.default_rng(2)
    b, h, w, c = 2, 4, 4, 8
    x = rng.integers(-127, 128, (b, h, w, c)).astype(np.int8)
    wq = rng.integers(-127, 128, (3, 3, c, c)).astype(np.int8)
    sc = rng.uniform(0.001, 0.01, (c,)).astype(np.float32)
    y = np.asarray(conv3x3_s8(jnp.asarray(x), jnp.asarray(wq),
                              jnp.asarray(sc), img_block=1, interpret=True,
                              out_dtype=jnp.float32))
    ref = np_conv3x3_s8(x, wq).astype(np.float32) * sc
    np.testing.assert_allclose(y, ref, rtol=1e-6)


def test_qconv_applicable_predicate():
    ok = dict(strides=(1, 1), padding="SAME", feature_group_count=1,
              i_dil=(1, 1), k_dil=(1, 1))
    assert qconv_applicable((8, 16, 8, 128), (3, 3, 128, 128), **ok)
    assert qconv_applicable((8, 16, 8, 256), (3, 3, 256, 512),
                            strides=(1, 1), padding=[(1, 1), (1, 1)],
                            feature_group_count=1, i_dil=(1, 1),
                            k_dil=(1, 1))
    # rejects: stride 2, 1x1, unaligned channels, groups, dilation, VALID
    assert not qconv_applicable((8, 16, 8, 128), (3, 3, 128, 128),
                                strides=(2, 2), padding="SAME",
                                feature_group_count=1, i_dil=(1, 1),
                                k_dil=(1, 1))
    assert not qconv_applicable((8, 16, 8, 128), (1, 1, 128, 128), **ok)
    assert not qconv_applicable((8, 16, 8, 64), (3, 3, 64, 128), **ok)
    assert not qconv_applicable((8, 16, 8, 128), (3, 3, 128, 128),
                                strides=(1, 1), padding="SAME",
                                feature_group_count=2, i_dil=(1, 1),
                                k_dil=(1, 1))
    assert not qconv_applicable((8, 16, 8, 128), (3, 3, 128, 128),
                                strides=(1, 1), padding="VALID",
                                feature_group_count=1, i_dil=(1, 1),
                                k_dil=(1, 1))
