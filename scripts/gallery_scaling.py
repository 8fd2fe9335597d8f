"""Measure large-gallery retrieval scaling on one chip (VERDICT r3 #5).

The reference's faiss role covers 100k+ galleries (ref
faiss_utils.py:121-181: IndexShards, GpuIndexIVFFlat with nlist/nprobe).
This script produces the measured curve that backs ops/policy.py's
defaults:

  1. self-kNN (the Jaccard initial ranking): brute-force `topk_neighbors`
     vs `ivf_topk` at N in {50k, 100k, 200k}, D=1280 — wall-clock and
     recall@1/@k1 against the brute-force truth.
  2. Jaccard re-rank at N=100k: top-S sparse min-sum (the dense (N,N) sim
     matrix is ~40 GB at 100k — infeasible single-chip, which is exactly
     why the policy exists) with brute-force vs IVF initial ranking.

Results append to ROUND_NOTES.md and print as JSON.

Run: PYTHONPATH=/root/repo python scripts/gallery_scaling.py [--quick]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synth_gallery(n, d=1280, n_clusters=None, seed=0):
    """Clustered unit-norm gallery, synthesized ON DEVICE (ReID galleries
    are id-clustered; IVF recall on uniform data is the wrong regime).
    Device-side generation matters here: a 200k x 1280 f32 gallery is 1 GB,
    which is minutes of H2D through the axon relay but milliseconds of
    jax.random on chip."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen(key):
        nc = n_clusters or max(n // 64, 8)
        kc, ki, kn = jax.random.split(key, 3)
        centers = jax.random.normal(kc, (nc, d), jnp.float32)
        idx = jax.random.randint(ki, (n,), 0, nc)
        g = centers[idx] * 4.0 + jax.random.normal(kn, (n, d), jnp.float32)
        return g / jnp.linalg.norm(g, axis=1, keepdims=True)

    return gen(jax.random.PRNGKey(seed))


def main():
    import jax
    import jax.numpy as jnp

    from reid_tpu.ops import build_ivf, ivf_topk, topk_neighbors
    from reid_tpu.ops.policy import choose_search

    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="50k/100k only, fewer probe settings")
    p.add_argument("--notes", default="ROUND_NOTES.md")
    p.add_argument("--jaccard-n", type=int, default=0,
                   help="run ONLY the full-rerank boundary leg at this N "
                        "(fresh process per N avoids OOM fragmentation)")
    args = p.parse_args()

    def sync(x):
        return float(jnp.sum(jnp.where(jnp.isfinite(x), x, 0.0)))

    out = {"d": 1280, "k": 20, "rows": []}
    sizes = ([] if args.jaccard_n
             else [50_000, 100_000] if args.quick
             else [50_000, 100_000, 200_000])
    k = 20

    for n in sizes:
        g = synth_gallery(n)
        q = g[:4096]  # self-kNN regime: queries = gallery rows

        # brute force (blocked matmul path)
        d_bf, i_bf = topk_neighbors(q, g, k=k)
        sync(d_bf)
        t0 = time.perf_counter()
        d_bf, i_bf = topk_neighbors(q, g, k=k)
        sync(d_bf)
        t_bf = time.perf_counter() - t0
        i_bf_np = np.asarray(i_bf)

        plan = choose_search(n)
        row = {"n": n, "bf_s_per_4k_queries": round(t_bf, 3),
               "plan": plan.strategy, "ivf": {}}

        # IVF leg bounded to n <= 100k: at 200k the padded (C, B, D)
        # bucket tensor OOMs HBM under cluster skew (measured 2026-08-18),
        # and the 50k/100k legs already decide the policy (bf wins 5-8x)
        if n <= 100_000:
            try:
                t0 = time.perf_counter()
                index = build_ivf(jax.random.PRNGKey(0), g, nlist=512)
                sync(index.centroids)
                row["ivf_build_s"] = round(time.perf_counter() - t0, 1)
                row["nlist"] = int(index.centroids.shape[0])
                row["bucket_pad"] = int(index.buckets.shape[1])

                probes = [8] if args.quick else [8, 16]
                for nprobe in probes:
                    d_i, i_i = ivf_topk(index, q, k=k, nprobe=nprobe)
                    sync(d_i)
                    t0 = time.perf_counter()
                    d_i, i_i = ivf_topk(index, q, k=k, nprobe=nprobe)
                    sync(d_i)
                    t_i = time.perf_counter() - t0
                    i_i_np = np.asarray(i_i)
                    r1 = float(np.mean(i_i_np[:, 0] == i_bf_np[:, 0]))
                    rk = float(np.mean([
                        len(set(i_i_np[r]) & set(i_bf_np[r])) / k
                        for r in range(i_i_np.shape[0])]))
                    row["ivf"][str(nprobe)] = {
                        "s_per_4k_queries": round(t_i, 3),
                        "speedup_vs_bf": round(t_bf / max(t_i, 1e-9), 2),
                        "recall@1": round(r1, 4),
                        f"recall@{k}": round(rk, 4)}
                    print(f"N={n} nprobe={nprobe}: bf {t_bf:.3f}s ivf "
                          f"{t_i:.3f}s ({t_bf/max(t_i,1e-9):.1f}x) "
                          f"r@1 {r1:.4f} r@{k} {rk:.4f}", flush=True)
                del index
            except Exception as e:
                row["ivf"]["error"] = type(e).__name__
                print(f"N={n} ivf leg failed: {type(e).__name__}",
                      flush=True)
        else:
            print(f"N={n}: bf {t_bf:.3f}s per 4k queries (ivf leg skipped: "
                  "bucket pad OOMs at this scale)", flush=True)
        out["rows"].append(row)
        del g, q

    # Jaccard wall-clock at its single-chip feasibility boundary. The
    # Jaccard OUTPUT is an (N, N) f32 matrix — 6.4 GB at 40k, 40 GB at
    # 100k — so beyond ~50k the correct product operation is kNN retrieval
    # (IVF, measured above), not a full re-rank matrix; the policy encodes
    # exactly that.
    if not args.quick:
        from reid_tpu.ops import (compute_jaccard_distance,
                                  compute_jaccard_distance_ivf)
        # largest feasible single-chip full re-rank: the pipeline holds a
        # handful of (N, N) f32/bool live at once (V, the expansion
        # matmuls, J), so try 40k and step down on RESOURCE_EXHAUSTED.
        # NOTE: a failed OOM attempt fragments HBM and can poison smaller
        # retries in the SAME process (measured: 23k fails after a 40k+30k
        # OOM even though it fits fresh) — for a clean boundary, run each N
        # in its own process via --jaccard-n.
        for n in ([args.jaccard_n] if args.jaccard_n
                  else (40_000, 30_000, 23_000)):
            g = synth_gallery(n)
            plan = choose_search(n)
            try:
                t0 = time.perf_counter()
                j_s = compute_jaccard_distance(g, k1=20, k2=6,
                                               sparse_s=plan.sparse_s)
                sync(j_s[:64])
                t_sparse = time.perf_counter() - t0
                del j_s
                t0 = time.perf_counter()
                j_ivf = compute_jaccard_distance_ivf(
                    g, k1=20, k2=6, sparse_s=plan.sparse_s,
                    nlist=512, nprobe=64)
                sync(j_ivf[:64])
                t_ivf = time.perf_counter() - t0
                del j_ivf
            except Exception as e:
                print(f"jaccard {n}: {type(e).__name__} -> stepping down",
                      flush=True)
                del g
                continue
            out["jaccard_full_rerank"] = {
                "n": n, "sparse_s": plan.sparse_s,
                "bf_rank_s": round(t_sparse, 1),
                "ivf_rank_s": round(t_ivf, 1),
                "note": ("(N,N) jaccard output is 6.4 GB at 40k / 40 GB at "
                         "100k: beyond ~50k the policy routes to IVF kNN "
                         "retrieval, not a full re-rank matrix")}
            print(f"jaccard {n}: bf-rank {t_sparse:.1f}s  "
                  f"ivf-rank {t_ivf:.1f}s", flush=True)
            break

    print(json.dumps(out))
    if args.notes:
        with open(args.notes, "a") as f:
            f.write(f"\n<!-- gallery_scaling {time.strftime('%Y-%m-%d')} -->\n"
                    f"```json\n{json.dumps(out, indent=1)}\n```\n")


if __name__ == "__main__":
    main()
