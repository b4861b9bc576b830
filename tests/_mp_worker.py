"""Worker for the 2-process jax.distributed test (tests/test_multiprocess.py).

Each process owns 2 CPU devices; the global mesh has 4. Both processes
build the identical RelationData and run ShardedMacauEngine sweeps over
the global mesh; process 0 writes the factors (original instance order)
for comparison against the single-process engine.

Run: python tests/_mp_worker.py <pid> <nproc> <port> <out.npz>
"""
import sys


def _configure():
    """Worker-process jax config (must precede backend init).  NOT run at
    import: the parent test imports this module for build_problem/config
    after its own backends are already initialized."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.config.update("jax_enable_x64", True)


def build_problem(variant: str = "dense_int8"):
    import numpy as np

    import bayesiandatafusion_jl_tpu as bdf

    rng = np.random.default_rng(0)
    n1, n2, k = 41, 29, 3
    # headsplit_dual uses N < F so the Woodbury dual solver engages
    f = 60 if variant == "headsplit_dual" else 23
    feat = (rng.random((n1, f)) < 0.25).astype(np.float64)
    U = rng.standard_normal((n1, k))
    V = rng.standard_normal((n2, k))
    R = U @ V.T + 0.1 * rng.standard_normal((n1, n2))
    mask = rng.random((n1, n2)) < 0.5
    if variant == "headsplit_dual":
        mask[:, 0] = True              # head partner instance (deg 41)
    df = bdf.IndexedDF(np.stack(np.nonzero(mask), 1), R[mask], (n1, n2))
    rd = bdf.RelationData.from_matrix(df, feat1=feat)
    rd.assign_to_test(0, 40, seed=3)
    return rd


def config(variant: str = "dense_int8"):
    from bayesiandatafusion_jl_tpu.utils.config import MacauConfig

    if variant == "headsplit_dual":
        # VERDICT r2 #5 matrix: head-entity ghost-slot splitting +
        # block-pipelined exchange + the Woodbury dual beta solver, all
        # across a REAL process boundary (gather path, so heads engage)
        return MacauConfig(num_latent=3, burnin=1, psamples=2,
                           verbose=False, dtype="float64", use_ff=False,
                           seed=7, dense_gram=False,
                           head_split_degree=20, exchange_blocks=2,
                           beta_solver="dual")
    # dense_gram=True: the two-process run also covers sharded device_put
    # of the dense M/W slabs and the dense feature operand; dense_int8
    # covers the int8 slab stores + quantized contraction across processes
    return MacauConfig(num_latent=3, burnin=1, psamples=2, verbose=False,
                       dtype="float64", use_ff=False, cg_tol=1e-12, seed=7,
                       dense_gram=True, dense_int8=True)


N_SWEEPS = 3


def main():
    _configure()
    import jax
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    variant = sys.argv[5] if len(sys.argv) > 5 else "dense_int8"
    from bayesiandatafusion_jl_tpu.parallel.mesh import initialize_distributed
    initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
    assert len(jax.devices()) == 2 * nproc, jax.devices()
    assert len(jax.local_devices()) == 2

    import numpy as np

    from bayesiandatafusion_jl_tpu.parallel.mesh import data_mesh
    from bayesiandatafusion_jl_tpu.parallel.sharded import ShardedMacauEngine
    from bayesiandatafusion_jl_tpu.utils.rng import sweep_key

    rd = build_problem(variant)
    cfg = config(variant)
    eng = ShardedMacauEngine(rd, cfg, mesh=data_mesh())
    if variant == "headsplit_dual":
        assert any(m.n_head for m in eng.problem.ent_meta), "no heads"
        assert eng.problem.entity_specs[0].solver == "dual"
    key = jax.random.key(cfg.seed)
    sr, ss = eng.init_state(jax.random.fold_in(key, 0))
    p = eng.problem
    for s in range(N_SWEEPS):
        sr, ss, metrics = eng._sweep_jit(p.arrays_sh, p.arrays_rep, sr, ss,
                                         sweep_key(key, s + 1), 1.0)
    rmse = float(metrics["r0.rmse_sample"])  # replicated -> local fetch
    U = eng.factors_original_order(sr)
    if pid == 0:
        np.savez(out, rmse=rmse, **{f"U{i}": u for i, u in enumerate(U)})
    print(f"worker {pid}: ok rmse={rmse:.6f}", flush=True)


if __name__ == "__main__":
    main()
