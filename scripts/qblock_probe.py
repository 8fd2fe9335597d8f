"""Probe: fused Pallas int8 SE basic block (ops/qblock.py) vs the unfused
quantized path vs bf16, per block and END-TO-END (the decision point that
routed USE_PALLAS_QCONV off: per-layer wins must survive the full trunk).

Run on chip:  python scripts/qblock_probe.py            # per-block
              python scripts/qblock_probe.py --e2e      # full embed A/B
"""

import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit_chain(fn, x, iters=20, reps=3):
    """In-jit dependent chain (see scripts/qconv_probe.py): per-op time
    free of the relay's dispatch overhead."""

    @jax.jit
    def chain(x0):
        def body(carry, _):
            c, acc = carry
            xx = x0 + (c.astype(x0.dtype) * 0)
            y = fn(xx)
            c2 = y.reshape(-1)[0].astype(jnp.float32)
            return (c2, acc + y.reshape(-1)[1].astype(jnp.float32)), None
        (c, acc), _ = jax.lax.scan(
            body, (jnp.float32(0), jnp.float32(0)), None, length=iters)
        return acc

    _sync(chain(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = chain(x)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


# the four fusable blocks at the serving-embed operating point
# (crop 256x128 -> stages 64x32 / 32x16 / 16x8 / 16x8), b256
BLOCKS = [
    ("block22 ibn c128", 256, 32, 16, 128, 128, True, False),
    ("block32 ibn c256", 256, 16, 8, 256, 256, True, False),
    ("block41 down 256->512", 256, 16, 8, 256, 512, False, True),
    ("block42 c512", 256, 16, 8, 512, 512, False, False),
]


def per_block():
    from test_qblock import make_params
    from reid_tpu.ops.qblock import se_basic_block_s8, qblock_reference

    print("devices:", jax.devices(), flush=True)
    for name, b, h, w, cin, cout, ibn, down in BLOCKS:
        rng = np.random.default_rng(0)
        p = make_params(rng, cin, cout, down=down, ibn=ibn,
                        mip=max(8, cout // 16))
        x = jax.device_put(jnp.asarray(
            rng.normal(size=(b, h, w, cin)), jnp.bfloat16))

        t_fused = timeit_chain(
            lambda a: se_basic_block_s8(a, p, ibn=ibn,
                                        out_dtype=jnp.bfloat16), x)
        t_oracle = timeit_chain(
            lambda a: qblock_reference(a, p, ibn=ibn).astype(jnp.bfloat16),
            x)
        # exactness on real Mosaic
        y = se_basic_block_s8(x, p, ibn=ibn, out_dtype=jnp.float32)
        r = qblock_reference(x, p, ibn=ibn)
        ya, ra = np.asarray(y), np.asarray(r)
        rel = np.max(np.abs(ya - ra) / (np.abs(ra) + 1e-3))
        flops = 2 * b * h * w * 9 * cout * (cin + cout)
        print(f"{name:24s} fused {t_fused*1e3:7.3f} ms "
              f"({flops/t_fused/1e12:5.1f} TOP/s)  "
              f"xla-int8-chain {t_oracle*1e3:7.3f} ms "
              f"({t_oracle/t_fused:.2f}x)  maxrel {rel:.1e}", flush=True)


def _e2e_setup():
    from reid_tpu.models import build_model
    from reid_tpu.utils import quantize as qz

    print("devices:", jax.devices(), flush=True)
    model = build_model("seres18", num_classes=751, num_cams=6,
                        dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    variables = jax.jit(lambda k, xx: model.init(k, xx, train=True))(
        jax.random.PRNGKey(0), jnp.zeros((8, 256, 128, 3), jnp.bfloat16))
    batch = 256
    x = jax.device_put(jnp.asarray(
        rng.normal(size=(batch, 256, 128, 3)), jnp.bfloat16))
    calib = jnp.asarray(rng.normal(size=(64, 256, 128, 3)), jnp.bfloat16)
    qs = qz.quantize(model, variables, [calib], train=False)

    def embed(v, xx):
        with qz.quantized_context(qs):
            f, l = model.apply(v, xx, train=False)
        return f.astype(jnp.float32)

    def measure(variables, x, batch):
        @jax.jit
        def chain(v, x0):
            def body(carry, _):
                c, acc = carry
                xx = x0 + (c.astype(x0.dtype) * 0)
                f = embed(v, xx)
                return (f[0, 0].astype(jnp.bfloat16),
                        acc + f[0, 1]), None
            (c, acc), _ = jax.lax.scan(
                body, (jnp.bfloat16(0), jnp.float32(0)), None, length=10)
            return acc

        _sync(chain(variables, x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(chain(variables, x))
            best = min(best, (time.perf_counter() - t0) / 10)
        return best

    return qz, embed, measure, model, variables, x, batch


def e2e():
    import numpy as np
    qz, embed, measure, model, variables, x, batch = _e2e_setup()
    results = {}
    feats = {}
    for flag in (False, True):
        qz.USE_PALLAS_QBLOCK = flag
        best = measure(variables, x, batch)
        results[flag] = best
        feats[flag] = np.asarray(jax.jit(embed)(variables, x))
        print(f"USE_PALLAS_QBLOCK={flag}: {best*1e3:.3f} ms/b{batch} "
              f"({batch/best/1e3:.1f}k crops/s)", flush=True)
    f0, f1 = feats[False], feats[True]
    cos = (f0 * f1).sum(1) / (np.linalg.norm(f0, axis=1)
                              * np.linalg.norm(f1, axis=1) + 1e-12)
    print(f"speedup {results[False]/results[True]:.3f}x; "
          f"feature cosine min {cos.min():.6f}", flush=True)


def attrib():
    """Route one block at a time: in-situ boundary-cost attribution.
    Per-block in-isolation deltas (per_block probe) say routing block22
    should SAVE ~2.4 ms/b256; whatever each single-block routing actually
    changes vs OFF is (in-situ kernel delta + its pallas_call boundary
    cost)."""
    qz, embed, measure, model, variables, x, batch = _e2e_setup()
    base = None
    for filt in (None, "block22", "block32", "block41", "block42", "ALL"):
        if filt is None:
            qz.USE_PALLAS_QBLOCK = False
            qz.QBLOCK_ROUTE_FILTER = None
        else:
            qz.USE_PALLAS_QBLOCK = True
            qz.QBLOCK_ROUTE_FILTER = None if filt == "ALL" else filt
        best = measure(variables, x, batch)
        tag = "OFF" if filt is None else filt
        if base is None:
            base = best
        print(f"route={tag:8s}: {best*1e3:.3f} ms/b{batch} "
              f"(delta {1e3*(best-base):+.3f} ms)", flush=True)
    qz.USE_PALLAS_QBLOCK = False
    qz.QBLOCK_ROUTE_FILTER = None


if __name__ == "__main__":
    if "--attrib" in sys.argv:
        attrib()
    elif "--e2e" in sys.argv:
        e2e()
    else:
        per_block()
