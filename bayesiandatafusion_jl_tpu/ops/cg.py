"""Blocked conjugate-gradient solver for the side-information link matrix.

Reference: the matrix-free beta solve — ``(X'X + lambda I) B = RHS`` with K
right-hand sides solved simultaneously, matvec ``w = X'(X v) + lambda v``
on the sparse binary feature matrix, never forming X'X (src/macau.jl /
src/sparsebinmatrix.jl [MED], SURVEY.md §4.4).  The reference parallelizes
the matvec across Julia workers (ParallelSBM); here the matvec is two
segment-sums that shard over the nnz axis under shard_map (psum-reduced —
SURVEY §3 parallelism table).

K columns run as simultaneous vector-CG recurrences sharing matvecs
(per-column scalar step sizes), under ``lax.while_loop`` with static shapes.
Warm-started from the previous sweep's beta (SURVEY §9.2).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def block_cg(
    matvec: Callable[[jax.Array], jax.Array],
    rhs: jax.Array,       # [F, K]
    x0: jax.Array,        # [F, K] warm start
    tol: float = 1e-6,
    maxiter: int = 200,
    precond_diag: jax.Array | None = None,  # [F] Jacobi preconditioner
    precond: Callable[[jax.Array], jax.Array] | None = None,  # M^{-1} r
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Solve A x = rhs for SPD A, K columns at once.

    Returns ``(x, n_iters, true_resid_rel)`` where ``true_resid_rel`` is
    the max-over-columns RELATIVE residual ``||rhs - A x|| / ||rhs||``
    recomputed from scratch at exit (one extra matvec) — the loop itself
    tests the cheap RECURSIVE residual, which in f32 drifts from the true
    one and stalls around ~1e-5 relative, so the exit-time recomputation
    is what makes the reported accuracy honest.

    With ``precond_diag`` (e.g. diag(X'X) + lambda = squared column sums +
    lambda) runs Jacobi-preconditioned CG — the feature columns of
    ECFP-style matrices have wildly varying counts, and the diagonal
    scaling roughly halves the iteration count at the same tolerance.
    """
    dtype = rhs.dtype
    rhs_nrm2 = jnp.maximum(jnp.sum(rhs * rhs, axis=0),
                           jnp.asarray(1e-30, dtype))  # [K]
    tol2 = jnp.asarray(tol * tol, dtype)
    minv = None if precond_diag is None else \
        (1.0 / precond_diag)[:, None].astype(dtype)

    def prec(r):
        if precond is not None:   # e.g. Nystrom (ops/precond.py)
            return precond(r)
        return r if minv is None else r * minv

    r0 = rhs - matvec(x0)
    z0 = prec(r0)
    rz0 = jnp.sum(r0 * z0, axis=0)

    def cond(state):
        _, r, _, _, it = state
        rs = jnp.sum(r * r, axis=0)
        return jnp.logical_and(it < maxiter,
                               jnp.max(rs / rhs_nrm2) > tol2)

    def body(state):
        x, r, p, rz, it = state
        Ap = matvec(p)
        denom = jnp.sum(p * Ap, axis=0)
        safe = denom > 0
        a = jnp.where(safe, rz / jnp.where(safe, denom, 1.0), 0.0)
        x = x + a * p
        r = r - a * Ap
        z = prec(r)
        rz_new = jnp.sum(r * z, axis=0)
        b = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        p = z + b * p
        return (x, r, p, rz_new, it + 1)

    x, r, p, rz, it = jax.lax.while_loop(
        cond, body, (x0, r0, z0, rz0, jnp.asarray(0, jnp.int32)))
    r_true = rhs - matvec(x)
    resid_rel = jnp.sqrt(jnp.max(jnp.sum(r_true * r_true, axis=0)
                                 / rhs_nrm2))
    return x, it, resid_rel
