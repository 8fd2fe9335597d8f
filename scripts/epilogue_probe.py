"""Probe: what do the VPU-bound layers (IBN / SE / MetaAconC / GeM) cost
inside the SERVING embed, bf16 and int8? (VERDICT r4 #4, measure-first.)

Strategy: ablate each layer family to identity inside the real SERes18
apply via module-path-aware interception, and measure the embed time delta
at the serving batch. If the combined delta is small, the Pallas fusion is
closed by measurement; if large, it sizes the win of a fused kernel.

Run on chip:  python scripts/epilogue_probe.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, iters=20, reps=3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = None
        for _ in range(iters):
            o = fn(*args)
            acc = o if acc is None else acc + o
        _sync(acc)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    from reid_tpu.models import build_model
    from reid_tpu.models.layers import IBN, SEBlock, InstanceNorm

    print("devices:", jax.devices(), flush=True)
    model = build_model("seres18", num_classes=751, num_cams=6,
                        dtype=jnp.bfloat16)
    variables = jax.jit(lambda k, xx: model.init(k, xx, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((8, 256, 128, 3), jnp.bfloat16))
    rng = np.random.default_rng(0)
    batch = 256
    x = jax.device_put(jnp.asarray(
        rng.normal(size=(batch, 256, 128, 3)), jnp.bfloat16))

    def make_apply(skip_kinds):
        def interceptor(next_fun, args, kwargs, ctx):
            m = ctx.module
            if isinstance(m, SEBlock) and "se" in skip_kinds \
                    and ctx.method_name == "__call__":
                return jnp.ones_like(args[0][..., :1, :1, :])  # gate = 1
            if isinstance(m, InstanceNorm) and "in" in skip_kinds \
                    and ctx.method_name == "__call__":
                return args[0].astype(m.dtype)
            return next_fun(*args, **kwargs)

        @jax.jit
        def apply(v, xx):
            with nn.intercept_methods(interceptor):
                f, l = model.apply(v, xx, train=False)
            return f.astype(jnp.float32)
        return apply

    base = timeit(make_apply(()), variables, x)
    print(f"bf16 embed b{batch}: {base*1e3:.3f} ms "
          f"({batch/base:.0f} crops/s)", flush=True)
    for kinds, label in ((("se",), "SE gate = 1"),
                         (("in",), "InstanceNorm = id"),
                         (("se", "in"), "both")):
        t = timeit(make_apply(tuple(kinds)), variables, x)
        print(f"  -{label}: {t*1e3:.3f} ms (saves {(base-t)*1e3:.3f} ms, "
              f"{100*(base-t)/base:.1f}%)", flush=True)

    # same ablation inside the int8 quantized path
    from reid_tpu.utils.quantize import quantize, quantized_context
    calib = jnp.asarray(rng.normal(size=(64, 256, 128, 3)), jnp.bfloat16)
    qs = quantize(model, variables, [calib], train=False)

    def make_qapply(skip_kinds):
        def interceptor(next_fun, args, kwargs, ctx):
            m = ctx.module
            if isinstance(m, SEBlock) and "se" in skip_kinds \
                    and ctx.method_name == "__call__":
                return jnp.ones_like(args[0][..., :1, :1, :])
            if isinstance(m, InstanceNorm) and "in" in skip_kinds \
                    and ctx.method_name == "__call__":
                return args[0].astype(m.dtype)
            return next_fun(*args, **kwargs)

        @jax.jit
        def apply(v, xx):
            with quantized_context(qs), nn.intercept_methods(interceptor):
                f, l = model.apply(v, xx, train=False)
            return f.astype(jnp.float32)
        return apply

    qbase = timeit(make_qapply(()), variables, x)
    print(f"int8 embed b{batch}: {qbase*1e3:.3f} ms "
          f"({batch/qbase:.0f} crops/s)", flush=True)
    for kinds, label in ((("se",), "SE gate = 1"),
                         (("in",), "InstanceNorm = id"),
                         (("se", "in"), "both")):
        t = timeit(make_qapply(tuple(kinds)), variables, x)
        print(f"  -{label}: {t*1e3:.3f} ms (saves {(qbase-t)*1e3:.3f} ms, "
              f"{100*(qbase-t)/qbase:.1f}%)", flush=True)


if __name__ == "__main__":
    main()
