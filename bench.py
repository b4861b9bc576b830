"""Benchmark: latent-factor rows sampled/sec/chip on MovieLens-10M rank 32.

North-star metric (BASELINE.json / BASELINE.md): rows/s/chip, sweeps/s and
RMSE@40 sweeps on an ML-10M-shaped problem at rank 32.  The reference repo
publishes no numbers and Julia is unavailable in this sandbox (SURVEY.md
§8), so ``vs_baseline`` is computed against the literature-anchored
estimate of the reference's per-core throughput: 1e5 rows/s (upper end of
the O(1e4-1e5) range for a Julia per-row K=32 sampler; documented in
SURVEY §8 — re-derive when a Julia runtime is available).

Prints ONE JSON line on stdout.  Runs on whatever jax.devices() offers
(the single tunneled TPU chip under the driver; CPU works for smoke via
BENCH_SMOKE=1).
"""
import json
import os
import sys
import time

import numpy as np

JULIA_ROWS_PER_S_ANCHOR = 1e5  # SURVEY §8 literature anchor, per core


def main():
    import jax

    if os.environ.get("BENCH_CONFIG") == "chembl":
        return chembl_bench()
    smoke = os.environ.get("BENCH_SMOKE") == "1"
    variant = "100k" if smoke else "10m"
    sweeps_timed = 10 if smoke else 40
    rank = 32

    import bayesiandatafusion_jl_tpu as bdf
    from bayesiandatafusion_jl_tpu.models.datasets import load_movielens
    from bayesiandatafusion_jl_tpu.models.engine import MacauEngine
    from bayesiandatafusion_jl_tpu.utils.config import MacauConfig
    from bayesiandatafusion_jl_tpu.utils.rng import sweep_key

    # The axon loopback relay stalls minutes on the FIRST device->host
    # transfer of a process, then is fast; pay it on a background thread
    # overlapped with the host-side data/layout build.
    import threading
    import jax.numpy as jnp
    tw = time.time()

    def _warm():
        _ = float(jax.jit(lambda: jnp.zeros(()))())
        print(f"# d2h warmup: {time.time()-tw:.1f}s", file=sys.stderr)

    warm_thread = threading.Thread(target=_warm)
    warm_thread.start()

    t0 = time.time()
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".cache", f"ml{variant}.npz")
    if os.path.exists(cache):
        z = np.load(cache)
        from bayesiandatafusion_jl_tpu.models.data import IndexedDF
        df = IndexedDF(z["idx"], z["vals"], tuple(z["shape"]))
    else:
        df = load_movielens(variant)
        os.makedirs(os.path.dirname(cache), exist_ok=True)
        np.savez(cache, idx=df.idx, vals=df.vals, shape=df.shape)
    rd = bdf.RelationData.from_indexed_df(df, relation_name="ratings")
    n_test = min(100_000, df.nnz // 10)
    rd.assign_to_test(0, n_test, seed=7)
    cfg = MacauConfig(num_latent=rank, burnin=sweeps_timed, psamples=0,
                      clamp=(1.0, 5.0), verbose=False, dtype="float32",
                      gram_dtype="bfloat16", seed=42,
                      # 25 widths cut gather/einsum padding 1.22 -> 1.13
                      # (measured r2: 75.9 -> 68.2 ms/sweep)
                      bucket_widths=(8, 12, 16, 20, 24, 28, 32, 40, 48, 56,
                                     64, 80, 96, 112, 128, 160, 192, 224,
                                     256, 320, 384, 512, 768, 1024, 2048))
    eng = MacauEngine(rd, cfg)
    build_s = time.time() - t0
    print(f"# data+layout build: {build_s:.1f}s "
          f"(nnz={df.nnz}, shape={df.shape})", file=sys.stderr)

    warm_thread.join()
    key = jax.random.key(cfg.seed)
    state = eng.init_state(jax.random.fold_in(key, 0))
    # compile + warmup (excluded from timing)
    t0 = time.time()
    state, metrics = eng._sweep_jit(eng.problem.arrays, state,
                                    sweep_key(key, 1), 0.0)
    jax.block_until_ready(metrics)
    compile_s = time.time() - t0
    print(f"# first sweep (compile+run): {compile_s:.1f}s", file=sys.stderr)

    n_rows = sum(es.n for es in eng.problem.entity_specs)
    t0 = time.time()
    for s in range(1, sweeps_timed + 1):
        state, metrics = eng._sweep_jit(eng.problem.arrays, state,
                                        sweep_key(key, s + 1), 1.0)
    # force completion with a real D2H (block_until_ready can return
    # before execution finishes on the axon relay backend)
    _ = float(metrics["r0.rmse_avg"])
    elapsed = time.time() - t0
    sweeps_per_s = sweeps_timed / elapsed
    rows_per_s = n_rows * sweeps_per_s
    rmse = float(metrics["r0.rmse_avg"])
    print(f"# {sweeps_timed} sweeps in {elapsed:.2f}s | "
          f"RMSE(avg)={rmse:.4f} | device={jax.devices()[0]}",
          file=sys.stderr)

    print(json.dumps({
        "metric": f"rows_sampled_per_s_per_chip (ML-{variant} rank {rank}; "
                  f"sweeps/s={sweeps_per_s:.3f}, rmse@{sweeps_timed}={rmse:.4f})",
        "value": round(rows_per_s, 1),
        "unit": "rows/s",
        "vs_baseline": round(rows_per_s / JULIA_ROWS_PER_S_ANCHOR, 2),
    }))


def chembl_bench():
    """Secondary config (BASELINE.md #3): Macau + ECFP side features, CG
    link-matrix solver.  BENCH_CONFIG=chembl python bench.py"""
    import jax
    import jax.numpy as jnp
    from bayesiandatafusion_jl_tpu.models.datasets import synthetic_chembl
    from bayesiandatafusion_jl_tpu.models.engine import MacauEngine
    from bayesiandatafusion_jl_tpu.utils.config import MacauConfig
    from bayesiandatafusion_jl_tpu.utils.rng import sweep_key

    t0 = time.time()
    _ = float(jax.jit(lambda: jnp.zeros(()))())
    print(f"# d2h warmup: {time.time()-t0:.1f}s", file=sys.stderr)
    rd = synthetic_chembl(n_compounds=15_000, n_targets=346,
                          n_features=32_000, nnz=300_000, seed=3)
    rd.assign_to_test(0, 30_000, seed=7)
    cfg = MacauConfig(num_latent=32, burnin=20, psamples=0, verbose=False,
                      dtype="float32", gram_dtype="bfloat16",
                      use_ff=False, cg_maxiter=100, seed=42)
    eng = MacauEngine(rd, cfg)
    key = jax.random.key(cfg.seed)
    state = eng.init_state(jax.random.fold_in(key, 0))
    state, m = eng._sweep_jit(eng.problem.arrays, state, sweep_key(key, 1),
                              0.0)
    _ = float(m["r0.rmse_sample"])
    sweeps = 20
    t0 = time.time()
    for s in range(2, sweeps + 2):
        state, m = eng._sweep_jit(eng.problem.arrays, state,
                                  sweep_key(key, s), 1.0)
    rmse = float(m["r0.rmse_avg"])
    dt = (time.time() - t0) / sweeps
    n_rows = sum(es.n for es in eng.problem.entity_specs)
    print(json.dumps({
        "metric": f"chembl macau-CG rows/s/chip (rmse@{sweeps}={rmse:.4f})",
        "value": round(n_rows / dt, 1),
        "unit": "rows/s",
        "vs_baseline": round(n_rows / dt / JULIA_ROWS_PER_S_ANCHOR, 2),
    }))


if __name__ == "__main__":
    main()
