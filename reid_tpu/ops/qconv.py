"""Pallas int8 MXU conv — 3x3 stride-1 SAME, NHWC, s8 x s8 -> s32.

The int8 serving path (`utils/quantize.py`) executes convs via XLA's
`conv_general_dilated(preferred_element_type=int32)`, which measured only
0.61-0.96x the bf16 conv on the v5e (`scripts/int8_probe.py`) — the chip's
~2x int8 MXU peak is wasted by the lowering. This kernel reformulates the
trunk's dominant conv shape (3x3, stride 1, SAME — every non-downsample
conv of SERes18/CARes18/EMARes18, ref `reid/backbones/SERes18_IBN.py:96-128`)
as nine shifted int8 MATMULS, which XLA/Mosaic does map onto the int8 MXU
at full rate:

    y[b,h,w,:] = sum_{dy,dx} x[b,h+dy,w+dx,:] @ W[dy,dx]   (zero-padded)

On the flattened row axis r = (b*H + h)*W + w, the tap (dy,dx) input is
`roll(x2d, -(dy*W+dx))` with rows where (h+dy, w+dx) leaves the image
masked to zero — cross-image and block-wraparound leakage rows are exactly
the masked ones, so a single flat roll is correct for a whole image block.
The kernel holds the int32 accumulator and the full 9-tap weight stack in
VMEM, reads each activation byte from HBM exactly once, and fuses the
per-output-channel dequant rescale into the epilogue (bf16 out).

Integer exactness: the accumulation is pure s8*s8->s32 — outputs equal
XLA's int8 conv BIT-EXACTLY before the f32 rescale (tested).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAPS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def _row_masks(nimg: int, h: int, w: int):
    """Per-tap validity of each flattened row (static, computed at trace).

    Row r holds output pixel (h_i, w_i) = ((r // w) % h, r % w); tap
    (dy, dx) contributes iff 0 <= h_i+dy < h and 0 <= w_i+dx < w."""
    rows = nimg * h * w
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    hi = (r // w) % h
    wi = r % w
    masks = []
    for dy, dx in _TAPS:
        ok_h = (hi + dy >= 0) & (hi + dy < h)
        ok_w = (wi + dx >= 0) & (wi + dx < w)
        masks.append(ok_h & ok_w)
    return masks


def _qconv_kernel(x_ref, w_ref, scale_ref, out_ref, *, nimg, h, w,
                  out_dtype):
    # y[r] = sum_t x[r+off_t] @ W_t  ==  sum_t roll(x @ W_t, -off_t)[r]:
    # doing the dot FIRST and rolling the int32 product sidesteps Mosaic's
    # missing int8 rotate ("Rotate with non-32-bit data") at identical
    # integer math — the per-tap roll moves the s32 partial product, and
    # the boundary mask zeroes the same output rows either way.
    x2d = x_ref[:]                              # (nimg*h*w, cin) int8
    masks = _row_masks(nimg, h, w)
    acc = None
    rows = nimg * h * w
    for t, (dy, dx) in enumerate(_TAPS):
        p = jax.lax.dot_general(
            x2d, w_ref[t],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        shift = (-(dy * w + dx)) % rows
        if shift:
            p = pltpu.roll(p, shift, 0)
        p = jnp.where(masks[t], p, 0)
        acc = p if acc is None else acc + p
    out_ref[:] = (acc.astype(jnp.float32) * scale_ref[:]).astype(out_dtype)


def conv3x3_s8(x: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray,
               img_block: int = 0, out_dtype=jnp.bfloat16,
               interpret: bool = False) -> jnp.ndarray:
    """3x3 / stride-1 / SAME conv: int8 NHWC x int8 HWIO -> `out_dtype`.

    Args:
      x:     (B, H, W, Cin) int8 activations.
      wq:    (3, 3, Cin, Cout) int8 kernel (per-output-channel quantized).
      scale: (Cout,) f32 dequant scale (act_scale * w_scale), multiplied
             into the s32 accumulator in the epilogue.
      img_block: images per grid step (0 = auto from a ~12 MB VMEM budget).

    Returns (B, H, W, Cout).
    """
    b, h, w, cin = x.shape
    cout = wq.shape[-1]
    assert wq.shape[:3] == (3, 3, cin), wq.shape

    if img_block <= 0:
        # budget: x block + int32 acc + int32 tap product + out block +
        # 9-tap weights <~ 10 MB (leave room for double buffering)
        per_img = h * w * (cin + 4 * cout + 4 * cout + 2 * cout)
        img_block = max(1, min(b, int(8e6 - 9 * cin * cout) // per_img))
        while b % img_block:
            img_block -= 1
    assert b % img_block == 0, (b, img_block)

    rows_blk = img_block * h * w
    x2d = x.reshape(b * h * w, cin)
    w9 = wq.reshape(9, cin, cout)
    scale2d = scale.reshape(1, cout).astype(jnp.float32)

    kernel = functools.partial(_qconv_kernel, nimg=img_block, h=h, w=w,
                               out_dtype=out_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b // img_block,),
        in_specs=[
            pl.BlockSpec((rows_blk, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_blk, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h * w, cout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * cin * cout,
            bytes_accessed=b * h * w * (cin + 2 * cout) + 9 * cin * cout,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, w9, scale2d)
    return out.reshape(b, h, w, cout)


def _qconv_ncat_kernel(x_ref, w_ref, scale_ref, out_ref, *, nimg, h, w,
                       cout, out_dtype):
    """v1.5: ONE s8xs8->s32 dot against the N-concatenated weight
    (cin, 9*cout) — bigger N amortizes MXU pipeline overhead at the small
    K=cin of the trunk shapes — then the 9 int32 product slices are rolled
    and mask-accumulated exactly as in _qconv_kernel."""
    x2d = x_ref[:]                              # (rows, cin) int8
    p = jax.lax.dot_general(
        x2d, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)       # (rows, 9*cout)
    masks = _row_masks(nimg, h, w)
    rows = nimg * h * w
    acc = None
    for t, (dy, dx) in enumerate(_TAPS):
        seg = p[:, t * cout:(t + 1) * cout]
        shift = (-(dy * w + dx)) % rows
        if shift:
            seg = pltpu.roll(seg, shift, 0)
        seg = jnp.where(masks[t], seg, 0)
        acc = seg if acc is None else acc + seg
    out_ref[:] = (acc.astype(jnp.float32) * scale_ref[:]).astype(out_dtype)


def conv3x3_s8_ncat(x: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray,
                    img_block: int = 0, out_dtype=jnp.bfloat16,
                    interpret: bool = False) -> jnp.ndarray:
    """`conv3x3_s8` contract, N-concatenated single-dot kernel."""
    b, h, w, cin = x.shape
    cout = wq.shape[-1]
    assert wq.shape[:3] == (3, 3, cin), wq.shape

    if img_block <= 0:
        # x + int32 (rows, 9*cout) product + acc + out + weights <~ 8 MB
        per_img = h * w * (cin + 4 * 9 * cout + 4 * cout + 2 * cout)
        img_block = max(1, min(b, int(8e6 - 9 * cin * cout) // per_img))
        while b % img_block:
            img_block -= 1
    assert b % img_block == 0, (b, img_block)
    rows_blk = img_block * h * w

    x2d = x.reshape(b * h * w, cin)
    # (3,3,cin,cout) -> (cin, 9*cout): tap-major along N
    w9 = jnp.transpose(wq.reshape(9, cin, cout), (1, 0, 2)).reshape(
        cin, 9 * cout)
    scale2d = scale.reshape(1, cout).astype(jnp.float32)

    kernel = functools.partial(_qconv_ncat_kernel, nimg=img_block, h=h,
                               w=w, cout=cout, out_dtype=out_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b // img_block,),
        in_specs=[
            pl.BlockSpec((rows_blk, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, 9 * cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_blk, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h * w, cout), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * cin * cout,
            bytes_accessed=b * h * w * (cin + 2 * cout) + 9 * cin * cout,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, w9, scale2d)
    return out.reshape(b, h, w, cout)


def _qconv_bitshift_kernel(x_ref, w_ref, scale_ref, out_ref, xcat_ref, *,
                           nimg, h, w, cin, out_dtype):
    """v3: im2col built IN REGISTERS via the int8->uint32 bitcast trick.

    Mosaic cannot rotate int8 vectors and DMA row offsets must be 8-aligned,
    but int8 rows pack 4-per-word along sublanes — so a shift by s rows is,
    on the uint32 view W (rows/4, cin), the pure-32-bit expression

        q, r = divmod(s, 4)
        xs = (roll(W, -q) >> 8r) | (roll(W, -(q+1)) << (32-8r))    (r > 0)

    (XLA packs the minor byte first, so byte k of word m is row 4m+k.)
    All nine shifted operands are masked, written lane-concatenated into a
    (rows, 9*cin) VMEM buffer, and contracted in ONE s8xs8->s32 dot with
    K = 9*cin — the MXU-utilization fix for the trunk's small-K shapes."""
    rows = nimg * h * w
    nwords = rows // 4
    x2d = x_ref[:]
    xu = pltpu.bitcast(x2d, jnp.uint32)            # (rows/4, cin)
    masks = _row_masks(nimg, h, w)
    for t, (dy, dx) in enumerate(_TAPS):
        s = dy * w + dx
        q, r = divmod(s, 4)
        wq = xu if q % nwords == 0 else pltpu.roll(xu, (-q) % nwords, 0)
        if r == 0:
            xs_u = wq
        else:
            wq1 = pltpu.roll(xu, (-(q + 1)) % nwords, 0)
            xs_u = (wq >> jnp.uint32(8 * r)) | (wq1 << jnp.uint32(32 - 8 * r))
        xs = pltpu.bitcast(xs_u, jnp.int8)         # (rows, cin)
        xcat_ref[:, t * cin:(t + 1) * cin] = jnp.where(masks[t], xs,
                                                       jnp.int8(0))
    acc = jax.lax.dot_general(
        xcat_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out_ref[:] = (acc.astype(jnp.float32) * scale_ref[:]).astype(out_dtype)


def conv3x3_s8_bitshift(x: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray,
                        img_block: int = 0, out_dtype=jnp.bfloat16,
                        interpret: bool = False) -> jnp.ndarray:
    """`conv3x3_s8` contract, register-im2col kernel (_qconv_bitshift_kernel)."""
    b, h, w, cin = x.shape
    cout = wq.shape[-1]
    assert wq.shape[:3] == (3, 3, cin), wq.shape

    if img_block <= 0:
        per_img = h * w * (10 * cin + 6 * cout)
        img_block = max(1, min(b, int(8e6 - 9 * cin * cout) // per_img))
        while b % img_block:
            img_block -= 1
    assert b % img_block == 0, (b, img_block)
    rows_blk = img_block * h * w
    assert rows_blk % 4 == 0, rows_blk

    x2d = x.reshape(b * h * w, cin)
    w9 = wq.reshape(9 * cin, cout)
    scale2d = scale.reshape(1, cout).astype(jnp.float32)

    kernel = functools.partial(_qconv_bitshift_kernel, nimg=img_block, h=h,
                               w=w, cin=cin, out_dtype=out_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b // img_block,),
        in_specs=[
            pl.BlockSpec((rows_blk, cin), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_blk, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h * w, cout), out_dtype),
        scratch_shapes=[pltpu.VMEM((rows_blk, 9 * cin), jnp.int8)],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * cin * cout,
            bytes_accessed=b * h * w * (cin + 2 * cout) + 9 * cin * cout,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, w9, scale2d)
    return out.reshape(b, h, w, cout)


def _qconv_dma_kernel(x_ref, w_ref, scale_ref, out_ref, xh, xcat, sems, *,
                      nimg, h, w, cin, pad, out_dtype):
    """DMA-im2col variant: the 9 shifted operands are materialized in VMEM
    by address-level DMA copies (no register shifts — DMA reads at any row
    offset), lane-concatenated into one (rows, 9*cin) int8 buffer, and
    contracted in ONE s8xs8->s32 MXU dot over K = 9*cin. The only VPU work
    left is the boundary masking of int8 segments and the dequant epilogue."""
    rows = nimg * h * w
    i = pl.program_id(0)
    # halo window from the padded HBM activation (logical row r = r + pad)
    hdma = pltpu.make_async_copy(
        x_ref.at[pl.ds(i * rows, rows + 2 * pad), :], xh, sems.at[9])
    hdma.start()
    hdma.wait()
    copies = []
    for t, (dy, dx) in enumerate(_TAPS):
        off = dy * w + dx
        c = pltpu.make_async_copy(
            xh.at[pl.ds(pad + off, rows), :],
            xcat.at[:, pl.ds(t * cin, cin)], sems.at[t])
        c.start()
        copies.append(c)
    masks = _row_masks(nimg, h, w)
    for t in range(9):
        copies[t].wait()
        seg = xcat[:, t * cin:(t + 1) * cin]
        xcat[:, t * cin:(t + 1) * cin] = jnp.where(masks[t], seg,
                                                   jnp.int8(0))
    acc = jax.lax.dot_general(
        xcat[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out_ref[:] = (acc.astype(jnp.float32) * scale_ref[:]).astype(out_dtype)


def conv3x3_s8_dma(x: jnp.ndarray, wq: jnp.ndarray, scale: jnp.ndarray,
                   img_block: int = 0, out_dtype=jnp.bfloat16,
                   interpret: bool = False) -> jnp.ndarray:
    """`conv3x3_s8` contract, DMA-im2col kernel (see _qconv_dma_kernel)."""
    b, h, w, cin = x.shape
    cout = wq.shape[-1]
    assert wq.shape[:3] == (3, 3, cin), wq.shape
    pad = ((w + 1 + 7) // 8) * 8     # DMA slice SHAPES must be 8-aligned

    if img_block <= 0:
        per_img = h * w * (10 * cin + 10 * cout)
        img_block = max(1, min(b, int(8e6 - 9 * cin * cout) // per_img))
        while b % img_block:
            img_block -= 1
    assert b % img_block == 0, (b, img_block)
    rows_blk = img_block * h * w

    x2d = jnp.pad(x.reshape(b * h * w, cin), ((pad, pad), (0, 0)))
    w9 = wq.reshape(9 * cin, cout)
    scale2d = scale.reshape(1, cout).astype(jnp.float32)

    kernel = functools.partial(_qconv_dma_kernel, nimg=img_block, h=h, w=w,
                               cin=cin, pad=pad, out_dtype=out_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(b // img_block,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # stays in HBM
            pl.BlockSpec((9 * cin, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_blk, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h * w, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((rows_blk + 2 * pad, cin), jnp.int8),
            pltpu.VMEM((rows_blk, 9 * cin), jnp.int8),
            pltpu.SemaphoreType.DMA((10,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * w * 9 * cin * cout,
            bytes_accessed=b * h * w * (cin + 2 * cout) + 9 * cin * cout,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x2d, w9, scale2d)
    return out.reshape(b, h, w, cout)


def qconv_applicable(x_shape: Tuple[int, ...], kq_shape: Tuple[int, ...],
                     strides, padding, feature_group_count: int,
                     i_dil, k_dil) -> bool:
    """True when `conv3x3_s8` covers this conv (the SERes18 trunk's
    dominant shape): 3x3, stride 1, SAME, no dilation/groups, Cin and Cout
    both lane-aligned (>=128 keeps the int8 (32,128) tiles dense)."""
    if len(x_shape) != 4 or kq_shape[:2] != (3, 3):
        return False
    if feature_group_count != 1:
        return False
    if tuple(strides) != (1, 1):
        return False
    if tuple(i_dil) != (1, 1) or tuple(k_dil) != (1, 1):
        return False
    if isinstance(padding, str):
        if padding.upper() != "SAME":
            return False
    else:
        if tuple(tuple(p) for p in padding) != ((1, 1), (1, 1)):
            return False
    cin, cout = kq_shape[2], kq_shape[3]
    return cin % 128 == 0 and cout % 128 == 0


def conv3x3_s8_reference(x, wq, scale, out_dtype=jnp.bfloat16):
    """XLA int8 conv with the same contract (oracle for exactness tests)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, wq.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, wq, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * scale).astype(out_dtype)
