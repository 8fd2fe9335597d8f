"""Fused int8 SE basic block (ops/qblock.py): kernel vs XLA oracle on all
three block flavors (identity / downsample / IBN-a), plus parity with the
real SEBasicBlock module through the quantized path.

The oracle (`qblock_reference`) replicates the kernel op-for-op with f32
epilogues; on CPU it runs the convs in f32 over integer values (exact
< 2^24), so these tests never touch XLA:CPU's pathologically slow int8
conv lowering (see tests/test_qconv.py).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from reid_tpu.ops.qblock import (QBlockParams, fold_bn, qblock_reference,
                                 se_basic_block_s8)


def make_params(rng, cin, cout, down=False, ibn=False, mip=8):
    def i8(*shape):
        return jnp.asarray(rng.integers(-127, 128, shape), jnp.int8)

    def f32(*shape, lo=-1.0, hi=1.0):
        return jnp.asarray(rng.uniform(lo, hi, shape), jnp.float32)

    half = cout // 2
    kw = {}
    if down:
        kw = dict(wd=i8(cin, cout), ad=f32(cout, lo=0.01, hi=0.1),
                  cd=f32(cout), inv_sxd=jnp.float32(rng.uniform(5, 20)))
    if ibn:
        pad = np.zeros(cout, np.float32)
        ins = np.concatenate([rng.uniform(0.5, 1.5, half), pad[half:]])
        inb = np.concatenate([rng.uniform(-0.5, 0.5, half), pad[half:]])
        a1 = np.concatenate([pad[:half], rng.uniform(0.1, 1.0, half)])
        c1 = np.concatenate([pad[:half], rng.uniform(-0.5, 0.5, half)])
        kw.update(dq1_vec=f32(cout, lo=0.001, hi=0.01),
                  in_scale=jnp.asarray(ins, jnp.float32),
                  in_bias=jnp.asarray(inb, jnp.float32),
                  a1=jnp.asarray(a1, jnp.float32),
                  c1=jnp.asarray(c1, jnp.float32))
    else:
        kw.update(a1=f32(cout, lo=0.001, hi=0.01), c1=f32(cout))
    return QBlockParams(
        w1=i8(9, cin, cout), w2=i8(9, cout, cout),
        a2=f32(cout, lo=0.001, hi=0.01), c2=f32(cout),
        inv_sx1=jnp.float32(rng.uniform(5, 20)),
        inv_sx2=jnp.float32(rng.uniform(5, 20)),
        wfc1=f32(cout, mip).astype(jnp.bfloat16),
        wfc2=f32(mip, cout).astype(jnp.bfloat16),
        **kw)


@pytest.mark.smoke
@pytest.mark.parametrize("flavor", ["identity", "down", "ibn"])
def test_qblock_matches_oracle(flavor):
    rng = np.random.default_rng(
        {"identity": 1, "down": 2, "ibn": 3}[flavor])
    b, h, w = 3, 6, 4
    cin = 8 if flavor != "down" else 16
    cout = 8
    p = make_params(rng, cin, cout, down=(flavor == "down"),
                    ibn=(flavor == "ibn"))
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.float32) \
        .astype(jnp.bfloat16)
    y = se_basic_block_s8(x, p, img_block=1, ibn=(flavor == "ibn"),
                          out_dtype=jnp.float32, interpret=True)
    ref = qblock_reference(x, p, ibn=(flavor == "ibn"))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_qblock_multi_image_block():
    """img_block > 1: per-image SE pooling / IN stats must not leak
    across images in the same grid slab."""
    rng = np.random.default_rng(7)
    b, h, w, c = 4, 4, 4, 8
    p = make_params(rng, c, c, ibn=True)
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.bfloat16)
    y_blk = se_basic_block_s8(x, p, img_block=4, ibn=True,
                              out_dtype=jnp.float32, interpret=True)
    y_one = se_basic_block_s8(x, p, img_block=1, ibn=True,
                              out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(y_blk), np.asarray(y_one),
                               rtol=1e-5, atol=1e-5)
    # and each image equals its solo run (no cross-image contamination)
    y_solo = se_basic_block_s8(x[1:2], p, img_block=1, ibn=True,
                               out_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(y_blk[1]), np.asarray(y_solo[0]),
                               rtol=1e-5, atol=1e-5)


def test_qblock_params_from_module():
    """End-to-end parity with the real SEBasicBlock through the quantized
    interceptor path: fused kernel output stays within bf16 tolerance of
    the unfused quantized module."""
    from flax import linen as nn

    from reid_tpu.models.seres18 import SEBasicBlock
    from reid_tpu.utils.quantize import (make_qblock_params, quantize,
                                         quantized_apply)

    rng = np.random.default_rng(11)
    block = SEBasicBlock(planes=8, strides=1, ibn=False, downsample=False,
                         dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)), jnp.bfloat16)
    variables = block.init(jax.random.PRNGKey(0), x, train=True)
    qs = quantize(block, variables, [x], train=False)

    y_unfused = quantized_apply(block, variables, qs, x, train=False)
    p = make_qblock_params(variables, qs, prefix="", planes=8,
                           ibn=False, downsample=False)
    y_fused = se_basic_block_s8(x, p, img_block=1, out_dtype=jnp.float32,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(y_fused),
                               np.asarray(y_unfused, np.float32),
                               rtol=0.1, atol=0.05)


def test_qblock_module_parity_ibn_down():
    """Same parity check for the IBN flavor and the downsample flavor."""
    from reid_tpu.models.seres18 import SEBasicBlock
    from reid_tpu.utils.quantize import (make_qblock_params, quantize,
                                         quantized_apply)

    rng = np.random.default_rng(13)
    for ibn, down, cin, planes in ((True, False, 8, 8), (False, True, 8, 16)):
        block = SEBasicBlock(planes=planes, strides=1, ibn=ibn,
                             downsample=down, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.normal(size=(2, 4, 4, cin)), jnp.bfloat16)
        variables = block.init(jax.random.PRNGKey(1), x, train=True)
        qs = quantize(block, variables, [x], train=False)
        y_unfused = quantized_apply(block, variables, qs, x, train=False)
        p = make_qblock_params(variables, qs, prefix="", planes=planes,
                               ibn=ibn, downsample=down)
        y_fused = se_basic_block_s8(x, p, img_block=1, ibn=ibn,
                                    out_dtype=jnp.float32, interpret=True)
        np.testing.assert_allclose(
            np.asarray(y_fused), np.asarray(y_unfused, np.float32),
            rtol=0.1, atol=0.05, err_msg=f"ibn={ibn} down={down}")


def test_qblock_params_traceable_under_jit():
    """make_qblock_params must build from TRACED variables: the interceptor
    calls it inside the jitted serving step, where BN params are tracers
    (regression: fold_bn used host numpy and raised
    TracerArrayConversionError on the first jit'd quantized apply)."""
    from reid_tpu.models.seres18 import SEBasicBlock
    from reid_tpu.utils.quantize import make_qblock_params, quantize

    rng = np.random.default_rng(17)
    block = SEBasicBlock(planes=8, strides=1, ibn=True, downsample=False,
                         dtype=jnp.bfloat16)
    x = jnp.asarray(rng.normal(size=(2, 4, 4, 8)), jnp.bfloat16)
    variables = block.init(jax.random.PRNGKey(2), x, train=True)
    qs = quantize(block, variables, [x], train=False)

    @jax.jit
    def fold(v):
        p = make_qblock_params(v, qs, prefix="", planes=8,
                               ibn=True, downsample=False)
        return p.a2, p.c2

    a2, c2 = fold(variables)   # must trace, not raise
    p_host = make_qblock_params(variables, qs, prefix="", planes=8,
                                ibn=True, downsample=False)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(p_host.a2),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(p_host.c2),
                               rtol=1e-6)
