"""Probe: does XLA:TPU execute int8 matmul/conv natively, and how fast?

Decides whether a quantized int8 serving path is worth building (v5e MXU
peak is 2x int8 vs bf16). Run on the real chip:

    PYTHONPATH=/root/.axon_site python scripts/int8_probe.py

Prints wall times for bf16 vs int8 matmul and conv at serving-like shapes.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, iters=20, reps=3):
    out = fn(*args)
    _sync(out)  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            o = fn(*args)
            acc = o if acc is None else acc + o.astype(acc.dtype)
        _sync(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    M = N = K = 4096

    a_bf = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    b_bf = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
    a_i8 = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    b_i8 = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)

    mm_bf = jax.jit(lambda a, b: jnp.dot(a, b))
    mm_i8 = jax.jit(
        lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int32))

    t_bf = timeit(mm_bf, a_bf, b_bf)
    flops = 2 * M * N * K
    print(f"matmul bf16 {M}x{K}x{N}: {t_bf*1e3:.3f} ms "
          f"({flops/t_bf/1e12:.1f} TF/s)")
    try:
        t_i8 = timeit(mm_i8, a_i8, b_i8)
        print(f"matmul int8 {M}x{K}x{N}: {t_i8*1e3:.3f} ms "
              f"({flops/t_i8/1e12:.1f} TOP/s)  speedup {t_bf/t_i8:.2f}x")
    except Exception as e:
        print("matmul int8 FAILED:", type(e).__name__, e)

    # conv at ReID-serving shape: 256 crops, 64x32 spatial, 128ch, 3x3
    B, H, W, C = 256, 64, 32, 128
    x_bf = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
    w_bf = jnp.asarray(rng.normal(size=(3, 3, C, C)), jnp.bfloat16)
    x_i8 = jnp.asarray(rng.integers(-127, 127, (B, H, W, C)), jnp.int8)
    w_i8 = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C)), jnp.int8)

    dn = jax.lax.conv_dimension_numbers(x_bf.shape, w_bf.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    conv_bf = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn))
    conv_i8 = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.int32))

    t_cbf = timeit(conv_bf, x_bf, w_bf)
    cflops = 2 * B * H * W * C * C * 9
    print(f"conv bf16 {B}x{H}x{W}x{C} 3x3: {t_cbf*1e3:.3f} ms "
          f"({cflops/t_cbf/1e12:.1f} TF/s)")
    try:
        t_ci8 = timeit(conv_i8, x_i8, w_i8)
        print(f"conv int8 {B}x{H}x{W}x{C} 3x3: {t_ci8*1e3:.3f} ms "
              f"({cflops/t_ci8/1e12:.1f} TOP/s)  speedup {t_cbf/t_ci8:.2f}x")
    except Exception as e:
        print("conv int8 FAILED:", type(e).__name__, e)

    # mixed int8 activation x int8 weight with f32 rescale epilogue (the
    # actual quantized-serving pattern: XLA should fuse the dequant scale)
    sx = jnp.float32(0.05)
    sw = jnp.asarray(rng.uniform(0.01, 0.1, (C,)), jnp.float32)

    @jax.jit
    def conv_q(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return jnp.maximum(y.astype(jnp.float32) * (sx * sw), 0.0)

    try:
        t_q = timeit(conv_q, x_i8, w_i8)
        print(f"conv int8+dequant+relu: {t_q*1e3:.3f} ms "
              f"speedup vs bf16 {t_cbf/t_q:.2f}x")
    except Exception as e:
        print("conv int8+dequant FAILED:", type(e).__name__, e)


if __name__ == "__main__":
    main()
