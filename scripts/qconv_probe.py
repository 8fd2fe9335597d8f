"""Probe: Pallas int8 3x3 conv vs XLA int8 conv vs XLA bf16 conv on the
SERes18 trunk's real layer configs (VERDICT r4 #1, measure-first).

Shapes are the serving-embed operating points (crop 256x128 -> post-stem
64x32; stages at 64x32/32x16/16x8 spatial). Exactness: the Pallas kernel's
s32 accumulation must match XLA's int8 conv BIT-EXACTLY (integer math).

Run on chip:  python scripts/qconv_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from reid_tpu.ops.qconv import (conv3x3_s8, conv3x3_s8_bitshift,
                                conv3x3_s8_ncat, conv3x3_s8_reference)


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, x, w, iters=20, reps=3):
    """In-jit dependent chain: `iters` executions in ONE dispatch, so the
    relay's ~2 ms amortized dispatch overhead (ROUND_NOTES r2) does not
    pollute per-op times. The data dependency is a runtime-true select the
    compiler cannot fold (where(c > -2^30, x, x^1) for ints)."""

    @jax.jit
    def chain(x0, w0):
        def body(carry, _):
            c, acc = carry
            if x0.dtype == jnp.int8:
                xx = jnp.where(c > jnp.int32(-2**30), x0, x0 ^ 1)
            else:
                xx = x0 + (c.astype(x0.dtype) * 0)
            y = fn(xx, w0)
            c2 = y.reshape(-1)[0].astype(jnp.int32)
            return (c2, acc + y.reshape(-1)[1].astype(jnp.float32)), None
        (c, acc), _ = jax.lax.scan(
            body, (jnp.int32(0), jnp.float32(0)), None, length=iters)
        return acc

    out = chain(x, w)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chain(x, w)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


# (name, B, H, W, Cin, Cout) — B=512 crops (a realistic embed batch:
# chunk 16 x 50 dets at MOT16 load is 800; 512 keeps staging fast)
CONFIGS = [
    ("stage2 32x16 c128", 512, 32, 16, 128, 128),
    ("stage3 16x8  c256", 512, 16, 8, 256, 256),
    ("stage4 16x8  c512", 512, 16, 8, 512, 512),
    # fastcrop variants (crop 128x64 -> stages at 16x8/8x4)
    ("fc-stage4 8x4 c512", 512, 8, 4, 512, 512),
]


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for name, b, h, w, cin, cout in CONFIGS:
        x8 = jnp.asarray(rng.integers(-127, 128, (b, h, w, cin)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)),
                         jnp.int8)
        sc = jnp.asarray(rng.uniform(0.001, 0.01, (cout,)), jnp.float32)
        xbf = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.bfloat16)
        wbf = jnp.asarray(rng.normal(size=(3, 3, cin, cout)), jnp.bfloat16)

        flops = 2 * b * h * w * 9 * cin * cout

        dn = jax.lax.conv_dimension_numbers(
            xbf.shape, wbf.shape, ("NHWC", "HWIO", "NHWC"))
        conv_bf = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn))
        candidates = [
            ("xla-i8", jax.jit(lambda x, w: conv3x3_s8_reference(x, w, sc)),
             conv3x3_s8_reference),
            ("roll", jax.jit(lambda x, w: conv3x3_s8(x, w, sc)),
             conv3x3_s8),
            ("ncat", jax.jit(lambda x, w: conv3x3_s8_ncat(x, w, sc)),
             conv3x3_s8_ncat),
            ("bitshift",
             jax.jit(lambda x, w: conv3x3_s8_bitshift(x, w, sc)),
             conv3x3_s8_bitshift),
        ]
        ones = jnp.ones((cout,), jnp.float32)
        yx = conv3x3_s8_reference(x8, w8, ones, out_dtype=jnp.float32)
        t_bf = timeit(conv_bf, xbf, wbf)
        line = (f"{name}: bf16 {t_bf*1e3:.3f} ms "
                f"({flops/t_bf/1e12:.0f} TF/s)")
        for cname, jitted, raw in candidates:
            try:
                exact = bool(jnp.all(
                    raw(x8, w8, ones, out_dtype=jnp.float32) == yx))
                t = timeit(jitted, x8, w8)
                line += (f" | {cname} {t*1e3:.3f} ms "
                         f"({flops/t/1e12:.0f} TOP/s, {t_bf/t:.2f}x"
                         f"{'' if exact else ', INEXACT'})")
            except Exception as e:
                line += f" | {cname} ERROR {type(e).__name__}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
