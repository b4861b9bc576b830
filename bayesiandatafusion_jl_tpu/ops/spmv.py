"""Bucketed sparse-binary matvec for the side-information matrix.

The CG link-matrix solve (SURVEY §4.4) is dominated by the matvec
``w = X'(X v) + lambda v`` on the sparse binary feature matrix.  Plain
segment-sums over the nnz axis run at ~12 GB/s effective on TPU (XLA
scatter); re-using the degree-bucketed layout machinery (ops/layout.py)
turns each product into gather + masked einsum + a SMALL row-level
segment-sum — ~5x faster at ChEMBL shapes (600k nnz).

Reference counterpart: ``A_mul_B!`` / ``At_mul_B!`` on SparseBinMatrix
(src/sparsebinmatrix.jl [MED]).
"""
from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .layout import build_mode_layout


def build_bucketed_matvec(rows: np.ndarray, cols: np.ndarray,
                          shape: Tuple[int, int],
                          widths=(8, 16, 32, 64, 128, 256, 512, 1024, 2048),
                          row_pad: int = 8,
                          dtype=np.float32) -> Dict[str, list]:
    """Host-side build: bucketed layouts for X@V (by-row) and X.T@U
    (by-column) of a binary COO matrix."""
    idx = np.stack([np.asarray(rows, np.int64),
                    np.asarray(cols, np.int64)], axis=1)
    ones = np.ones(idx.shape[0])
    out = {}
    for key, mode, n in (("fwd", 0, shape[0]), ("t", 1, shape[1])):
        ml = build_mode_layout(idx, ones, mode, n, widths=widths,
                               row_pad=row_pad, dtype=dtype)
        out[key] = [{"inst": jnp.asarray(b.inst),
                     "part": jnp.asarray(b.part[0]),
                     "mask": jnp.asarray(b.mask)} for b in ml.buckets]
    return out


def bucketed_spmm(buckets: Sequence[Dict[str, jax.Array]], n_out: int,
                  v: jax.Array) -> jax.Array:
    """y[i] = sum_{j in support(i)} v[j] for one direction's buckets.

    v: [n_in, K] -> y: [n_out, K].
    """
    y_rows, inst = [], []
    for ba in buckets:
        z = v.at[ba["part"]].get(mode="promise_in_bounds")  # [rows, W, K]
        y_rows.append(jnp.einsum("rwk,rw->rk", z,
                                 ba["mask"].astype(z.dtype)))
        inst.append(ba["inst"])
    if not y_rows:
        return jnp.zeros((n_out, v.shape[1]), v.dtype)
    return jax.ops.segment_sum(jnp.concatenate(y_rows),
                               jnp.concatenate(inst), num_segments=n_out)
