"""Pallas kernel correctness vs the XLA reference paths (interpret mode on
CPU; the TPU-compiled path is exercised by bench.py on hardware)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from bayesiandatafusion_jl_tpu.ops.mvn import chol_sample


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(orig, interpret=True))


def test_pallas_chol_sample_matches_xla(interpret_pallas):
    from bayesiandatafusion_jl_tpu.ops.pallas_chol import chol_sample_pallas
    rng = np.random.default_rng(0)
    B, K = 37, 8
    A = rng.standard_normal((B, K, K)).astype(np.float32) * 0.3
    P = A @ A.transpose(0, 2, 1) + 2 * np.eye(K, dtype=np.float32)
    b = rng.standard_normal((B, K)).astype(np.float32)
    xi = rng.standard_normal((B, K)).astype(np.float32)
    want = np.asarray(chol_sample(jnp.asarray(P), jnp.asarray(b),
                                  jnp.asarray(xi)))
    got = np.asarray(chol_sample_pallas(jnp.asarray(P), jnp.asarray(b),
                                        jnp.asarray(xi), tile=16))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pallas_chol_jitter_and_exact_tile(interpret_pallas):
    from bayesiandatafusion_jl_tpu.ops.pallas_chol import chol_sample_pallas
    rng = np.random.default_rng(1)
    B, K = 16, 4  # B == tile: no padding branch
    A = rng.standard_normal((B, K, K)).astype(np.float32) * 0.3
    P = A @ A.transpose(0, 2, 1) + np.eye(K, dtype=np.float32)
    b = rng.standard_normal((B, K)).astype(np.float32)
    xi = np.zeros((B, K), np.float32)
    want = np.asarray(chol_sample(jnp.asarray(P + 0.5 * np.eye(K, dtype=np.float32)),
                                  jnp.asarray(b), jnp.asarray(xi)))
    got = np.asarray(chol_sample_pallas(jnp.asarray(P), jnp.asarray(b),
                                        jnp.asarray(xi), jitter=0.5,
                                        tile=16))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pallas_chol_tiled_slab_matches_xla(interpret_pallas):
    """Column-slab kernel (32 < K <= 96; ops/pallas_chol.py) vs XLA.
    Small K keeps the interpret run fast; TPU timing is in round notes
    (K=48: 5.15 ms vs XLA 488.8 ms at B=82k)."""
    from bayesiandatafusion_jl_tpu.ops.pallas_chol import (
        chol_sample_pallas_tiled)
    rng = np.random.default_rng(2)
    B, K = 20, 12
    A = rng.standard_normal((B, K, K)).astype(np.float32) * 0.3
    P = A @ A.transpose(0, 2, 1) + 3 * np.eye(K, dtype=np.float32)
    b = rng.standard_normal((B, K)).astype(np.float32)
    xi = rng.standard_normal((B, K)).astype(np.float32)
    want = np.asarray(chol_sample(jnp.asarray(P), jnp.asarray(b),
                                  jnp.asarray(xi)))
    got = np.asarray(chol_sample_pallas_tiled(
        jnp.asarray(P), jnp.asarray(b), jnp.asarray(xi), tile=8))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pallas_chol_inv_matches_numpy(interpret_pallas):
    from bayesiandatafusion_jl_tpu.ops.pallas_chol import chol_inv_pallas
    rng = np.random.default_rng(3)
    B, K = 19, 8
    A = rng.standard_normal((B, K, K)).astype(np.float32) * 0.3
    P = A @ A.transpose(0, 2, 1) + 2 * np.eye(K, dtype=np.float32)
    want = np.linalg.inv(np.linalg.cholesky(P.astype(np.float64)))
    got = np.asarray(chol_inv_pallas(jnp.asarray(P), tile=8))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pallas_chol_blocked_matches_xla(interpret_pallas):
    """Blocked K>96 path (chol_sample_blocked) on a small proxy: K=20
    with block=8 exercises nb=3 panels AND the identity K-padding."""
    from bayesiandatafusion_jl_tpu.ops.pallas_chol import chol_sample_blocked
    rng = np.random.default_rng(4)
    B, K = 23, 20
    A = rng.standard_normal((B, K, K)).astype(np.float32) * 0.3
    P = A @ A.transpose(0, 2, 1) + 3 * np.eye(K, dtype=np.float32)
    b = rng.standard_normal((B, K)).astype(np.float32)
    xi = rng.standard_normal((B, K)).astype(np.float32)
    want = np.asarray(chol_sample(jnp.asarray(P), jnp.asarray(b),
                                  jnp.asarray(xi), jitter=0.25))
    got = np.asarray(chol_sample_blocked(
        jnp.asarray(P), jnp.asarray(b), jnp.asarray(xi), jitter=0.25,
        block=8, tile=8))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pallas_chol_packed_matches_xla(interpret_pallas):
    from bayesiandatafusion_jl_tpu.ops.pallas_chol import chol_sample_packed
    rng = np.random.default_rng(5)
    B, K = 21, 8
    C = K * (K + 1) // 2
    A = rng.standard_normal((B, K, K)).astype(np.float32) * 0.3
    P = A @ A.transpose(0, 2, 1)
    Lam = (2 * np.eye(K) + 0.1).astype(np.float32)
    b = rng.standard_normal((B, K)).astype(np.float32)
    xi = rng.standard_normal((B, K)).astype(np.float32)
    iu, ju = np.triu_indices(K)
    Pp = P[:, iu, ju]
    want = np.asarray(chol_sample(jnp.asarray(P + Lam), jnp.asarray(b),
                                  jnp.asarray(xi), jitter=0.25))
    got = np.asarray(chol_sample_packed(
        jnp.asarray(Pp), jnp.asarray(b), jnp.asarray(xi),
        jnp.asarray(Lam), jitter=0.25, tile=16))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_pallas_chol_packed_tiled_matches_xla(interpret_pallas):
    """Packed column-slab sampler (32 < K <= 96): offset-translated slab
    recurrence on the triu-packed P must match the XLA reference."""
    from bayesiandatafusion_jl_tpu.ops.pallas_chol import (
        chol_sample_packed_tiled)
    rng = np.random.default_rng(7)
    B, K = 9, 40
    A = rng.standard_normal((B, K, K)).astype(np.float32) * 0.2
    P = A @ A.transpose(0, 2, 1)
    Lam = (2 * np.eye(K) + 0.05).astype(np.float32)
    b = rng.standard_normal((B, K)).astype(np.float32)
    xi = rng.standard_normal((B, K)).astype(np.float32)
    iu, ju = np.triu_indices(K)
    Pp = P[:, iu, ju]
    want = np.asarray(chol_sample(jnp.asarray(P + Lam), jnp.asarray(b),
                                  jnp.asarray(xi), jitter=0.25))
    got = np.asarray(chol_sample_packed_tiled(
        jnp.asarray(Pp), jnp.asarray(b), jnp.asarray(xi),
        jnp.asarray(Lam), jitter=0.25, tile=8))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


@pytest.mark.slow
def test_engine_dense_packed_matches_full(interpret_pallas):
    """All-dense entity + pallas => packed-triangle pipeline (engine.py);
    must match the pallas='off' dense path on the same seed."""
    import bayesiandatafusion_jl_tpu as bdf
    from bayesiandatafusion_jl_tpu.models.engine import MacauEngine
    from bayesiandatafusion_jl_tpu.utils.config import MacauConfig

    rng = np.random.default_rng(6)
    n1, n2, k = 40, 25, 6
    R = rng.standard_normal((n1, n2))
    mask = rng.random((n1, n2)) < 0.5

    def build():
        df = bdf.IndexedDF(np.stack(np.nonzero(mask), 1), R[mask],
                           (n1, n2))
        rd = bdf.RelationData.from_indexed_df(df)
        rd.assign_to_test(0, 50, seed=2)
        return rd

    for k_lat in (k, 34):   # 34 exercises the 32 < K <= 96 packed slab
        outs = {}
        for pallas in ("on", "off"):
            cfg = MacauConfig(num_latent=k_lat, burnin=2, psamples=2,
                              verbose=False, dtype="float32", seed=9,
                              pallas=pallas, dense_gram=True)
            eng = MacauEngine(build(), cfg)
            if pallas == "on":   # confirm the packed gate actually fires
                assert eng.problem.dense_plans
            outs[pallas] = eng.run()
        np.testing.assert_allclose(outs["on"]["RMSE"], outs["off"]["RMSE"],
                                   rtol=5e-4, atol=5e-4)
        a = np.asarray(outs["on"]["state"]["ent"][0]["U"])
        b_ = np.asarray(outs["off"]["state"]["ent"][0]["U"])
        np.testing.assert_allclose(a, b_, rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_sharded_packed_tiled_matches_single(interpret_pallas):
    """32 < K <= 96 packed column-slab path on the SHARDED engine: the
    8-device run (exchange-block slicing + per-chunk kernel padding) must
    match the single-device packed run at 1e-8 (f64, interpret kernels)."""
    import bayesiandatafusion_jl_tpu as bdf
    from bayesiandatafusion_jl_tpu.models.engine import MacauEngine
    from bayesiandatafusion_jl_tpu.parallel.mesh import data_mesh
    from bayesiandatafusion_jl_tpu.parallel.sharded import ShardedMacauEngine
    from bayesiandatafusion_jl_tpu.utils.config import MacauConfig
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(13)
    n1, n2 = 37, 29
    R = rng.standard_normal((n1, n2))
    mask = rng.random((n1, n2)) < 0.6

    def build():
        df = bdf.IndexedDF(np.stack(np.nonzero(mask), 1), R[mask],
                           (n1, n2))
        rd = bdf.RelationData.from_indexed_df(df)
        rd.assign_to_test(0, 40, seed=2)
        return rd

    cfg = MacauConfig(num_latent=34, burnin=1, psamples=1, verbose=False,
                      dtype="float64", pallas="on", dense_gram=True,
                      exchange_blocks=2, seed=11)
    e1 = MacauEngine(build(), cfg)
    r1 = e1.run(num_sweeps=2)
    e8 = ShardedMacauEngine(build(), cfg, mesh=data_mesh())
    r8 = e8.run(num_sweeps=2)
    U8 = e8.factors_original_order(r8["state"][0])
    for ei in range(2):
        np.testing.assert_allclose(
            U8[ei], np.asarray(r1["state"]["ent"][ei]["U"]),
            rtol=1e-8, atol=1e-8)


def test_int8_pair_ok_layout_invariant_guards():
    """Eligibility comes from the observation index, not a stored layout:
    counts beyond int8 and int32-overflowable big-axis fibers decline."""
    from bayesiandatafusion_jl_tpu.ops.dense_gram import int8_pair_ok
    rng = np.random.default_rng(3)
    idx = np.stack([rng.integers(0, 10, 500), rng.integers(0, 8, 500),
                    rng.integers(0, 5, 500)], 1)
    assert int8_pair_ok(idx, (10, 8, 5))
    # duplicate multiplicity > 127
    dup = np.tile(np.array([[1, 2, 3]]), (130, 1))
    assert not int8_pair_ok(np.concatenate([idx, dup]), (10, 8, 5))
    # a fiber along the big partner axis (axis 1) that would overflow the
    # int32 accumulator: 140k observations at fixed (axis0, axis2)
    n_fib = 140_000
    fib = np.stack([np.zeros(n_fib, np.int64),
                    rng.integers(0, 200_000, n_fib),
                    np.zeros(n_fib, np.int64)], 1)
    assert not int8_pair_ok(fib, (10, 200_000, 5))


def test_unknown_accumulation_rejected():
    from bayesiandatafusion_jl_tpu.utils.config import MacauConfig
    with pytest.raises(ValueError):
        MacauConfig(accumulation="window")  # removed r1 experiment


@pytest.mark.slow
def test_pallas_chol_packed_transposed_matches_batchlead(interpret_pallas):
    """transposed=True (kernel-layout [C, B] / [K, B] inputs) must produce
    exactly the batch-leading path's samples — both kernels, both pad and
    exact-tile shapes."""
    from bayesiandatafusion_jl_tpu.ops.pallas_chol import (
        chol_sample_packed_dispatch)
    rng = np.random.default_rng(8)
    for K, B, tile_pad in ((8, 21, True), (40, 16, False)):
        C = K * (K + 1) // 2
        A = rng.standard_normal((B, K, K)).astype(np.float32) * 0.3
        P = A @ A.transpose(0, 2, 1)
        Lam = (2 * np.eye(K) + 0.1).astype(np.float32)
        b = rng.standard_normal((B, K)).astype(np.float32)
        xi = rng.standard_normal((B, K)).astype(np.float32)
        iu, ju = np.triu_indices(K)
        Pp = P[:, iu, ju]
        want = np.asarray(chol_sample_packed_dispatch(
            jnp.asarray(Pp), jnp.asarray(b), jnp.asarray(xi),
            jnp.asarray(Lam), jitter=0.25))
        got = np.asarray(chol_sample_packed_dispatch(
            jnp.asarray(Pp.T.copy()), jnp.asarray(b.T.copy()),
            jnp.asarray(xi), jnp.asarray(Lam), jitter=0.25,
            transposed=True))
        np.testing.assert_array_equal(got, want)


def test_engine_pair_pad_store_matches_unpadded(interpret_pallas,
                                                monkeypatch):
    """Sampler-granule-padded pair store (engine pair_pad_dims, r5): the
    packed pipeline on a padded M/W store must reproduce the unpadded
    run — pad cells are exact zeros, pad rows draw the prior and are
    sliced off.  Forced on at CPU test scale via the min-cells gate."""
    import bayesiandatafusion_jl_tpu as bdf
    from bayesiandatafusion_jl_tpu.models import engine as eng_mod
    from bayesiandatafusion_jl_tpu.utils.config import MacauConfig

    rng = np.random.default_rng(17)
    n1, n2 = 45, 30
    R = rng.standard_normal((n1, n2))
    mask = rng.random((n1, n2)) < 0.5

    def build():
        df = bdf.IndexedDF(np.stack(np.nonzero(mask), 1), R[mask],
                           (n1, n2))
        rd = bdf.RelationData.from_indexed_df(df)
        rd.assign_to_test(0, 60, seed=2)
        return rd

    monkeypatch.setattr(eng_mod, "_PAIR_PAD_GRAN", 64)
    for k_lat in (6, 34):     # unrolled and column-slab samplers
        outs = {}
        for min_cells in (0.0, 1e18):     # padded store / plain store
            monkeypatch.setattr(eng_mod, "_PAIR_PAD_MIN_CELLS", min_cells)
            cfg = MacauConfig(num_latent=k_lat, burnin=3, psamples=3,
                              verbose=False, dtype="float32", seed=9,
                              pallas="on", dense_gram=True)
            eng = eng_mod.MacauEngine(build(), cfg)
            if min_cells == 0.0:
                assert eng.problem.pair_pad_dims == {0: (64, 64)}
            else:
                assert not eng.problem.pair_pad_dims
            outs[min_cells] = eng.run()
        np.testing.assert_allclose(outs[0.0]["RMSE"], outs[1e18]["RMSE"],
                                   rtol=1e-5, atol=1e-5)
        a = np.asarray(outs[0.0]["state"]["ent"][0]["U"])
        b_ = np.asarray(outs[1e18]["state"]["ent"][0]["U"])
        assert a.shape == b_.shape == (n1, k_lat)
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-4)


def test_engine_pair_pad_multirelation_consistent(interpret_pallas,
                                                  monkeypatch):
    """Per-ENTITY pad consistency (r5 fusion-graph crash): a big padded
    pair sharing an entity with small unpadded pairs must emit ONE
    padded extent for that entity across all its contributions."""
    import bayesiandatafusion_jl_tpu as bdf
    from bayesiandatafusion_jl_tpu.models import engine as eng_mod
    from bayesiandatafusion_jl_tpu.utils.config import MacauConfig

    rng = np.random.default_rng(29)
    nc, nt, na = 50, 30, 20
    c = bdf.Entity("c", count=nc)
    t = bdf.Entity("t", count=nt)
    a = bdf.Entity("a", count=na)
    rd = bdf.RelationData()
    for name, e2, n2 in (("big", t, nt), ("small", a, na)):
        R = rng.standard_normal((nc, n2))
        mask = rng.random((nc, n2)) < 0.6
        rd.add_relation(bdf.IndexedDF(np.stack(np.nonzero(mask), 1),
                                      R[mask], (nc, n2)), name, [c, e2])
    rd.assign_to_test("big", 40, seed=2)
    monkeypatch.setattr(eng_mod, "_PAIR_PAD_GRAN", 64)
    # threshold between the two relations' cell counts: only "big" (1500
    # cells) crosses it; "small" (1000) must still pad its shared c axis
    monkeypatch.setattr(eng_mod, "_PAIR_PAD_MIN_CELLS", 1200.0)
    cfg = MacauConfig(num_latent=5, burnin=3, psamples=3, verbose=False,
                      dtype="float32", seed=3, pallas="on",
                      dense_gram=True)
    eng = eng_mod.MacauEngine(rd, cfg)
    # both entities of the big relation pad; the small relation pads
    # only its shared c axis
    assert eng.problem.pair_pad_dims == {0: (64, 64), 1: (64, 20)}
    res = eng.run()
    assert np.isfinite(res["big"]["RMSE"])
    assert np.asarray(res["state"]["ent"][0]["U"]).shape == (nc, 5)


def test_windowed_expand_matches_gather(interpret_pallas):
    """ops/pallas_gather (r5): the partner-sorted windowed lane-gather
    expand must reproduce the plain row gather exactly, including
    multi-block hot windows and padded tail slots (probe-validated at
    0.377 ns/obs on chip — 6.4x the XLA gather wall; the focus-order
    radix permutation is future work, see the module docstring)."""
    from bayesiandatafusion_jl_tpu.ops.pallas_gather import (
        build_window_plan, windowed_expand)
    rng = np.random.default_rng(31)
    K, n_table, n_obs = 8, 512, 5000
    part = np.sort(rng.integers(0, n_table, n_obs)).astype(np.int32)
    # a hot window spanning several 1024-slot blocks
    part[:2500] = rng.integers(0, 128, 2500)
    part = np.sort(part)
    lanes, wmap, slot_of = build_window_plan(part, n_table)
    UT = jnp.asarray(rng.standard_normal((K, n_table)).astype(np.float32))
    out = np.asarray(windowed_expand(UT, jnp.asarray(lanes),
                                     jnp.asarray(wmap)))
    ref = np.asarray(UT)[:, part]
    np.testing.assert_array_equal(out[:, slot_of], ref)
