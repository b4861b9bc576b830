"""Pallas TPU kernel: fused batched Cholesky factorize-solve-sample.

Replaces the XLA path ``cholesky + 3 triangular_solves`` (ops/mvn.py) which
lowers to a loop of tiny ops and runs ~400ms for 82k x 32x32 batches on a
v5e — two orders of magnitude off speed-of-light for ~1 GFLOP.

TPU-native design: the batch axis is laid out as the **lane** dimension —
inputs are transposed to ``P^T [K, K, B]`` so every scalar step of the
K-step right-looking Cholesky recurrence becomes one elementwise VPU op
over a [*, B-lane] tile.  The j-loop is fully unrolled (K static), so the
kernel is straight-line vector code: K^3/3 multiply-adds per lane for the
factorization, plus one forward and one backward substitution.  The MVN
identity ``u = mu + L^{-T} xi = L^{-T}(L^{-1} b + xi)`` folds the three
solves of the reference formulation (SURVEY §4.2) into two.

Reference semantics: sample_user's per-row chol/solve (src/macau.jl [MED]).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_sample_kernel(P_ref, b_ref, xi_ref, u_ref, *, K: int):
    """One tile: P [K, K, T], b/xi/u [K, T] — batch on lanes."""
    # right-looking Cholesky, fully unrolled; A holds the trailing matrix
    A = [[P_ref[i, j, :] for j in range(K)] for i in range(K)]
    _chol_solve_sample(A, b_ref, xi_ref, u_ref, K)


def _chol_sample_lam_kernel(P_ref, lam_ref, b_ref, xi_ref, u_ref, *, K: int):
    """Same, with the prior precision Lambda [K, K] added in-register —
    saves a full [N, K, K] broadcast+add pass over HBM in the engine."""
    A = [[P_ref[i, j, :] + lam_ref[i, j] for j in range(K)]
         for i in range(K)]
    _chol_solve_sample(A, b_ref, xi_ref, u_ref, K)


def _chol_solve_sample(A, b_ref, xi_ref, u_ref, K):
    L = [[None] * K for _ in range(K)]
    for j in range(K):
        d = jnp.sqrt(A[j][j])
        inv = 1.0 / d
        L[j][j] = d
        for i in range(j + 1, K):
            L[i][j] = A[i][j] * inv
        for i in range(j + 1, K):
            lij = L[i][j]
            for k in range(j + 1, i + 1):
                A[i][k] = A[i][k] - lij * L[k][j]

    # forward solve L y = b
    y = [None] * K
    for i in range(K):
        s = b_ref[i, :]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]

    # u = L^{-T} (y + xi)  (backward solve)
    u = [None] * K
    for i in range(K - 1, -1, -1):
        s = y[i] + xi_ref[i, :]
        for k in range(i + 1, K):
            s = s - L[k][i] * u[k]
        u[i] = s / L[i][i]

    for i in range(K):
        u_ref[i, :] = u[i]


def _chol_sample_slab_kernel(P_ref, b_ref, xi_ref, u_ref, A, R, U, *,
                             K: int):
    """Column-slab variant for K > 32 (docs/ROUND1_NOTES: the fully
    unrolled kernel overflows the Mosaic compile helper at K >= 48).

    Layout: A [K_col, K_row(sublane), T(lane)] — P is symmetric, so the
    input transpose [K, K, T] reads as "column j = A[j]" for free.  The
    right-looking recurrence then touches only CONTIGUOUS sublane slabs
    ``A[j, k:, :]`` (~K^2/2 vector statements, vs K^3/6 scalar statements
    unrolled — K=128 compiles at ~8.5k slabs).  L overwrites A's lower
    triangle; both solves run column-oriented so they also see slabs
    (the backward solve uses sum-over-sublanes instead of row access).
    """
    A[...] = P_ref[...]
    for j in range(K):
        d = jnp.sqrt(A[j, j, :])
        inv = 1.0 / d
        A[j, j, :] = d
        if j + 1 < K:
            A[j, j + 1:, :] = A[j, j + 1:, :] * inv[None, :]
        for k in range(j + 1, K):
            A[k, k:, :] = A[k, k:, :] - A[j, k:, :] * A[j, k, :][None, :]

    # forward solve L y = b (y overwrites R)
    R[...] = b_ref[...]
    for k in range(K):
        yk = R[k, :] / A[k, k, :]
        R[k, :] = yk
        if k + 1 < K:
            R[k + 1:, :] = R[k + 1:, :] - A[k, k + 1:, :] * yk[None, :]

    # backward solve L^T u = y + xi, column-oriented:
    # u_i = (v_i - sum_{k>i} L[k,i] u_k) / L[i,i]; L[k>i, i] = A[i, i+1:, :]
    R[...] = R[...] + xi_ref[...]
    for i in range(K - 1, -1, -1):
        v = R[i, :]
        if i + 1 < K:
            v = v - jnp.sum(A[i, i + 1:, :] * U[i + 1:, :], axis=0)
        U[i, :] = v / A[i, i, :]
    u_ref[...] = U[...]


def chol_sample_pallas_tiled(P: jax.Array, b: jax.Array, xi: jax.Array,
                             jitter: float = 0.0,
                             tile: int = 256) -> jax.Array:
    """Fused Cholesky-solve-sample for 32 < K <= 96 (column-slab kernel).

    Unlike :func:`chol_sample_pallas`, Lambda is NOT fused — pass
    P' = P + Lambda (the engine uses fuse_lambda=False for these K).

    K > 96 is unsupported: the slab kernel's ~K^2/2 unrolled statements
    overflow the Mosaic compile helper at K=128, and the masked-fori
    alternative measured ~100x slower than the slab (full-matrix RMW per
    column step) — worse than even XLA with host-side batch chunking.
    r2 probes: /tmp/tpuq jobs 61/83/84.
    """
    B, K, _ = P.shape
    if K > 96:
        raise ValueError("chol_sample_pallas_tiled supports K <= 96; "
                         "use the XLA path (chunk the batch if it OOMs)")
    dtype = P.dtype
    if jitter:
        P = P + jitter * jnp.eye(K, dtype=dtype)
    # VMEM budget: A scratch + P block = 2 * K*K*tile * 4B; tile floor is
    # 128 (lane dim of the b/xi/u blocks)
    while K * K * tile * 4 * 2 > 9_500_000 and tile > 128:
        tile //= 2
    pad = (-B) % tile
    if pad:
        eye = jnp.broadcast_to(jnp.eye(K, dtype=dtype), (pad, K, K))
        P = jnp.concatenate([P, eye], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad, K), dtype)], axis=0)
        xi = jnp.concatenate([xi, jnp.zeros((pad, K), dtype)], axis=0)
    Bp = B + pad
    Pt = jnp.transpose(P, (1, 2, 0))   # [K, K, Bp]; symmetric => col view
    bt = b.T
    xt = xi.T

    in_specs = [
        pl.BlockSpec((K, K, tile), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, tile), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    u_spec = pl.BlockSpec((K, tile), lambda i: (0, i),
                          memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_chol_sample_slab_kernel, K=K),
        grid=(Bp // tile,),
        in_specs=in_specs,
        out_specs=u_spec,
        out_shape=jax.ShapeDtypeStruct((K, Bp), dtype),
        scratch_shapes=[pltpu.VMEM((K, K, tile), dtype),
                        pltpu.VMEM((K, tile), dtype),
                        pltpu.VMEM((K, tile), dtype)],
    )(Pt, bt, xt)
    return out.T[:B]


def chol_sample_pallas(P: jax.Array, b: jax.Array, xi: jax.Array,
                       jitter: float = 0.0,
                       tile: int = 512,
                       Lambda: jax.Array | None = None) -> jax.Array:
    """Sample u ~ N(P'^{-1} b, P'^{-1}) for P [B, K, K]; b, xi [B, K],
    where P' = P (+ Lambda broadcast, when given — fused in-kernel).

    f32 only (VPU); pads B to a tile multiple (padded lanes factor a dummy
    identity so no NaNs leak into real lanes via compiler reassociation).
    """
    B, K, _ = P.shape
    dtype = P.dtype
    if jitter:
        P = P + jitter * jnp.eye(K, dtype=dtype)
    pad = (-B) % tile
    if pad:
        eye = jnp.broadcast_to(jnp.eye(K, dtype=dtype), (pad, K, K))
        if Lambda is not None:
            # padded lanes get P=I and will also receive +Lambda; ensure
            # they stay PD — I + Lambda is PD, so nothing to do
            pass
        P = jnp.concatenate([P, eye], axis=0)
        b = jnp.concatenate([b, jnp.zeros((pad, K), dtype)], axis=0)
        xi = jnp.concatenate([xi, jnp.zeros((pad, K), dtype)], axis=0)
    Bp = B + pad
    Pt = jnp.transpose(P, (1, 2, 0))   # [K, K, Bp]
    bt = b.T                           # [K, Bp]
    xt = xi.T

    grid = (Bp // tile,)
    tile_spec = [
        pl.BlockSpec((K, K, tile), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    if Lambda is None:
        out = pl.pallas_call(
            functools.partial(_chol_sample_kernel, K=K),
            grid=grid,
            in_specs=tile_spec,
            out_specs=pl.BlockSpec((K, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, Bp), dtype),
        )(Pt, bt, xt)
    else:
        out = pl.pallas_call(
            functools.partial(_chol_sample_lam_kernel, K=K),
            grid=grid,
            in_specs=[tile_spec[0],
                      pl.BlockSpec((K, K), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
                      tile_spec[1], tile_spec[2]],
            out_specs=pl.BlockSpec((K, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, Bp), dtype),
        )(Pt, Lambda.astype(dtype), bt, xt)
    return out.T[:B]
