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


def test_unknown_accumulation_rejected():
    from bayesiandatafusion_jl_tpu.utils.config import MacauConfig
    with pytest.raises(ValueError):
        MacauConfig(accumulation="window")  # removed r1 experiment
