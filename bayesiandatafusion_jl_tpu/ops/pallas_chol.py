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
import numpy as np
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


def _chol_sample_packed_kernel(P_ref, lam_ref, b_ref, xi_ref, u_ref, *,
                               K: int, tri):
    """Packed-triangle variant of the unrolled K<=32 kernel: P arrives as
    the [K(K+1)/2, T] symmetric packing the dense-Gramian einsum emits
    natively (ops/dense_gram.py) — the [N, K^2] expand pass disappears
    and the kernel streams HALF the P bytes.  The recurrence only ever
    reads the lower triangle, so ``A[i][j] = P[tri[i,j]]``; arithmetic
    is identical to the full kernel (same values, same op order), making
    the sampled u bit-identical to the expand+full path."""
    A = [[P_ref[tri[i][j], :] + lam_ref[i, j] if j <= i else None
          for j in range(K)] for i in range(K)]
    _chol_solve_sample(A, b_ref, xi_ref, u_ref, K)


def chol_sample_packed(Pp: jax.Array, b: jax.Array, xi: jax.Array,
                       Lambda: jax.Array, jitter: float = 0.0,
                       tile: int = 512,
                       transposed: bool = False) -> jax.Array:
    """Sample u ~ N(P'^{-1} b, P'^{-1}) from PACKED upper-triangle
    precision rows: Pp [B, K(K+1)/2] (np.triu_indices order), with
    P' = unpack(Pp) + Lambda (+ jitter I).  K <= 32 (unrolled kernel).

    ``transposed=True``: Pp arrives [K(K+1)/2, B] and b [K, B] — the
    kernel's native layout, as emitted by
    ``dense_gram_contrib(packed=True, transposed=True)`` — skipping the
    XLA transposes of the batch-leading layout (xi stays [B, K]: its
    draw shape is part of the shared randoms spec).
    """
    K = Lambda.shape[0]
    if transposed:
        C, B = Pp.shape
    else:
        B, C = Pp.shape
    assert C == K * (K + 1) // 2
    dtype = Pp.dtype
    lam = Lambda.astype(dtype)
    if jitter:
        # fold into the (replicated) Lambda add — same total diagonal
        lam = lam + jitter * jnp.eye(K, dtype=dtype)
    iu, ju = np.triu_indices(K)
    tri_of = np.zeros((K, K), np.int32)
    tri_of[iu, ju] = np.arange(len(iu), dtype=np.int32)
    tri = np.maximum(tri_of, tri_of.T).tolist()
    pad = (-B) % tile
    if pad:
        # padded lanes factor P = I (diag-packed ones) so no NaNs leak
        eyep = np.zeros((C,), np.float32)
        eyep[tri_of[np.arange(K), np.arange(K)]] = 1.0
        if transposed:
            Pp = jnp.concatenate(
                [Pp, jnp.broadcast_to(jnp.asarray(eyep, dtype)[:, None],
                                      (C, pad))], axis=1)
            b = jnp.concatenate([b, jnp.zeros((K, pad), dtype)], axis=1)
        else:
            Pp = jnp.concatenate(
                [Pp, jnp.broadcast_to(jnp.asarray(eyep, dtype), (pad, C))],
                axis=0)
            b = jnp.concatenate([b, jnp.zeros((pad, K), dtype)], axis=0)
        xi = jnp.concatenate([xi, jnp.zeros((pad, K), dtype)], axis=0)
    Bp = B + pad
    Ppt = Pp if transposed else Pp.T
    bt = b if transposed else b.T
    out = pl.pallas_call(
        functools.partial(_chol_sample_packed_kernel, K=K, tri=tri),
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((C, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, K), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, Bp), dtype),
    )(Ppt, lam, bt, xi.T)
    return out.T[:B]


def _tri_offsets(K: int):
    """off[j] = packed index of the diagonal (j, j) in np.triu_indices
    row-major order.  Upper-triangle ROW-major is lower-triangle
    COLUMN-major under symmetry: packed[off[j] + (k - j)] == L-column
    entry (k, j) for k >= j — so every column slab the Cholesky
    recurrence touches is a CONTIGUOUS sublane range at a static offset."""
    return [j * K - j * (j - 1) // 2 for j in range(K)]


def _chol_sample_packed_slab_kernel(P_ref, lam_ref, b_ref, xi_ref, u_ref,
                                    A, R, U, *, K: int):
    """Packed-triangle column-slab sampler for 32 < K <= 96: P arrives as
    the [K(K+1)/2, T] symmetric packing the dense-Gramian einsum emits
    natively — no [N, K^2] expand pass, no [K, K, N] transpose, and the
    kernel streams HALF the P bytes of the full slab kernel.  The slab
    statements are a 1:1 offset translation of _chol_sample_slab_kernel
    (same values, same op order).  Lambda arrives packed+lane-broadcast
    and is added on load (the full-P path pays an [N,K,K] XLA
    broadcast-add instead)."""
    off = _tri_offsets(K)
    A[...] = P_ref[...] + lam_ref[...]
    for j in range(K):
        oj = off[j]
        d = jnp.sqrt(A[oj, :])
        inv = 1.0 / d
        A[oj, :] = d
        if j + 1 < K:
            A[oj + 1:oj + K - j, :] = A[oj + 1:oj + K - j, :] * inv[None, :]
        for k in range(j + 1, K):
            ok = off[k]
            A[ok:ok + K - k, :] = (A[ok:ok + K - k, :]
                                   - A[oj + k - j:oj + K - j, :]
                                   * A[oj + k - j, :][None, :])

    # forward solve L y = b (y overwrites R); L[k:, j] = A[off_j + k - j]
    R[...] = b_ref[...]
    for k in range(K):
        ok = off[k]
        yk = R[k, :] / A[ok, :]
        R[k, :] = yk
        if k + 1 < K:
            R[k + 1:, :] = (R[k + 1:, :]
                            - A[ok + 1:ok + K - k, :] * yk[None, :])

    # backward solve L^T u = y + xi (column-oriented)
    R[...] = R[...] + xi_ref[...]
    for i in range(K - 1, -1, -1):
        oi = off[i]
        v = R[i, :]
        if i + 1 < K:
            v = v - jnp.sum(A[oi + 1:oi + K - i, :] * U[i + 1:, :], axis=0)
        U[i, :] = v / A[oi, :]
    u_ref[...] = U[...]


def chol_sample_packed_tiled(Pp: jax.Array, b: jax.Array, xi: jax.Array,
                             Lambda: jax.Array, jitter: float = 0.0,
                             tile: int = 512,
                             transposed: bool = False) -> jax.Array:
    """Packed-triangle fused sampler for 32 < K <= 96 (column-slab kernel):
    Pp [B, K(K+1)/2] in np.triu_indices order, P' = unpack(Pp) + Lambda
    (+ jitter I).  ``transposed=True``: Pp [C, B] / b [K, B] kernel-layout
    inputs (see :func:`chol_sample_packed`)."""
    K = Lambda.shape[0]
    if transposed:
        C, B = Pp.shape
    else:
        B, C = Pp.shape
    assert C == K * (K + 1) // 2
    dtype = Pp.dtype
    lam = Lambda.astype(dtype)
    if jitter:
        lam = lam + jitter * jnp.eye(K, dtype=dtype)
    iu, ju = np.triu_indices(K)
    lam_p = lam[iu, ju]                       # [C] packed (symmetric)
    # VMEM: A scratch + P block + lam block = 3 * C * tile * 4B
    while 3 * C * tile * 4 > 9_500_000 and tile > 128:
        tile //= 2
    pad = (-B) % tile
    if pad:
        # padded lanes get P = 0 and factor 0 + Lambda (PD) — no NaNs
        if transposed:
            Pp = jnp.concatenate([Pp, jnp.zeros((C, pad), dtype)], axis=1)
            b = jnp.concatenate([b, jnp.zeros((K, pad), dtype)], axis=1)
        else:
            Pp = jnp.concatenate([Pp, jnp.zeros((pad, C), dtype)], axis=0)
            b = jnp.concatenate([b, jnp.zeros((pad, K), dtype)], axis=0)
        xi = jnp.concatenate([xi, jnp.zeros((pad, K), dtype)], axis=0)
    Bp = B + pad
    Ppt = Pp if transposed else Pp.T
    bt = b if transposed else b.T
    lam_b = jnp.broadcast_to(lam_p[:, None], (C, tile))
    out = pl.pallas_call(
        functools.partial(_chol_sample_packed_slab_kernel, K=K),
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((C, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tile), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, Bp), dtype),
        scratch_shapes=[pltpu.VMEM((C, tile), dtype),
                        pltpu.VMEM((K, tile), dtype),
                        pltpu.VMEM((K, tile), dtype)],
    )(Ppt, lam_b, bt, xi.T)
    return out.T[:B]


def chol_sample_packed_dispatch(Pp: jax.Array, b: jax.Array, xi: jax.Array,
                                Lambda: jax.Array,
                                jitter: float = 0.0,
                                transposed: bool = False) -> jax.Array:
    """Packed-precision sampler across the K ladder: unrolled kernel for
    K <= 32, packed column-slab kernel for 32 < K <= 96."""
    K = Lambda.shape[0]
    if K <= 32:
        return chol_sample_packed(Pp, b, xi, Lambda, jitter,
                                  transposed=transposed)
    return chol_sample_packed_tiled(Pp, b, xi, Lambda, jitter,
                                    transposed=transposed)


def _chol_inv_slab_kernel(P_ref, W_ref, A, *, K: int):
    """Factor P = L L^T (column-slab recurrence, as the sampler kernel)
    and emit W = L^{-1} — the building block of the BLOCKED K > 96 path
    (:func:`chol_sample_blocked`): with explicit panel inverses, all the
    O(K^3) off-diagonal work becomes batched matmuls the MXU runs
    natively, and only the two K<=64 triangular pieces stay on the VPU.

    W is built row-by-row from the finished factor:
    ``w_i = (e_i - sum_{k<i} L[i,k] w_k) / L[i,i]``.  Rows of W carry
    zeros beyond their diagonal, so the unrolled [i, T] slab terms read
    exact zeros from the pre-cleared output block — no masking needed —
    and the e_i contribution reduces to ``W[i,i] = 1/L[i,i]``.
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

    # L (column-slab) is A[j, i, :] = L[i, j] for i >= j
    W_ref[...] = jnp.zeros_like(W_ref)
    W_ref[0, 0, :] = 1.0 / A[0, 0, :]
    for i in range(1, K):
        inv = 1.0 / A[i, i, :]
        s = A[0, i, :][None, :] * W_ref[0, :i, :]
        for k in range(1, i):
            s = s + A[k, i, :][None, :] * W_ref[k, :i, :]
        W_ref[i, :i, :] = -s * inv[None, :]
        W_ref[i, i, :] = inv


def chol_inv_pallas(P: jax.Array, tile: int = 128) -> jax.Array:
    """W = cholesky(P)^{-1} (lower triangular), batched: P [B, K, K] ->
    W [B, K, K].  K <= 64 (slab statement budget); batch rides the lanes
    as in the sampler kernels."""
    B, K, _ = P.shape
    dtype = P.dtype
    while K * K * tile * 4 * 3 > 9_500_000 and tile > 128:
        tile //= 2
    pad = (-B) % tile
    if pad:
        eye = jnp.broadcast_to(jnp.eye(K, dtype=dtype), (pad, K, K))
        P = jnp.concatenate([P, eye], axis=0)
    Bp = B + pad
    Pt = jnp.transpose(P, (1, 2, 0))   # [K, K, Bp]; symmetric => col view
    out = pl.pallas_call(
        functools.partial(_chol_inv_slab_kernel, K=K),
        grid=(Bp // tile,),
        in_specs=[pl.BlockSpec((K, K, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((K, K, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, K, Bp), dtype),
        scratch_shapes=[pltpu.VMEM((K, K, tile), dtype)],
    )(Pt)
    # out[i, j, b] = W[b, i, j]
    return jnp.transpose(out, (2, 0, 1))[:B]


def chol_sample_blocked(P: jax.Array, b: jax.Array, xi: jax.Array,
                        jitter: float = 0.0, block: int = 64,
                        tile: int = 128) -> jax.Array:
    """Fused Cholesky-solve-sample for K > 96 via block-panel recursion.

    Blocked right-looking Cholesky with ``block``-wide panels: the
    diagonal panels are factored AND inverted in one Pallas kernel
    (:func:`chol_inv_pallas`); every off-diagonal panel, Schur update,
    and substitution step is then a batched [B, block, block] matmul —
    MXU work XLA schedules well — instead of the VPU slab statements
    that overflow the Mosaic compile budget at K = 128.

        L_jj^{-1} = W_jj = chol_inv(P_jj - sum_{k<j} L_jk L_jk^T)
        L_ij = (P_ij - sum_{k<j} L_ik L_jk^T) W_jj^T          (i > j)
        y_i  = W_ii (b_i - sum_{k<i} L_ik y_k)                (forward)
        u_i  = W_ii^T (y_i + xi_i - sum_{k>i} L_ki^T u_k)     (backward)

    K is padded up to a multiple of ``block`` with an identity diagonal
    (zero-coupled, so padded components sample to exactly zero).  All
    matmul glue runs at Precision.HIGHEST: the TPU default (one bf16
    pass) injects ~1e-3 relative error into L21/Schur — measured 2.6e-3
    on the sampled u, vs 2e-6 with full-f32 passes at ~no wall cost
    (the panels dominate).
    """
    hi = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
    B, K, _ = P.shape
    dtype = P.dtype
    if jitter:
        P = P + jitter * jnp.eye(K, dtype=dtype)
    padk = (-K) % block
    if padk:
        Kp = K + padk
        Pp = jnp.zeros((B, Kp, Kp), dtype)
        Pp = Pp.at[:, :K, :K].set(P)
        Pp = Pp.at[:, K:, K:].set(jnp.eye(padk, dtype=dtype))
        P = Pp
        b = jnp.concatenate([b, jnp.zeros((B, padk), dtype)], axis=1)
        xi = jnp.concatenate([xi, jnp.zeros((B, padk), dtype)], axis=1)
    nb = P.shape[1] // block

    def blk(i, j):
        return P[:, i * block:(i + 1) * block, j * block:(j + 1) * block]

    L = {}   # off-diagonal panels (i > j)
    W = {}   # inverted diagonal factors
    for j in range(nb):
        S = blk(j, j)
        for k in range(j):
            S = S - hi("bik,bjk->bij", L[j, k], L[j, k])
        W[j] = chol_inv_pallas(S, tile=tile)
        for i in range(j + 1, nb):
            Sij = blk(i, j)
            for k in range(j):
                Sij = Sij - hi("bik,bjk->bij", L[i, k], L[j, k])
            L[i, j] = hi("bik,bjk->bij", Sij, W[j])

    bs = [b[:, i * block:(i + 1) * block] for i in range(nb)]
    xs = [xi[:, i * block:(i + 1) * block] for i in range(nb)]
    y = [None] * nb
    for i in range(nb):
        s = bs[i]
        for k in range(i):
            s = s - hi("bij,bj->bi", L[i, k], y[k])
        y[i] = hi("bij,bj->bi", W[i], s)
    u = [None] * nb
    for i in range(nb - 1, -1, -1):
        s = y[i] + xs[i]
        for k in range(i + 1, nb):
            s = s - hi("bji,bj->bi", L[k, i], u[k])
        u[i] = hi("bji,bj->bi", W[i], s)
    return jnp.concatenate(u, axis=1)[:, :K]


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
