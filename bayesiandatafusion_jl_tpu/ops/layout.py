"""Degree-bucketed observation layout (the TPU replacement for IndexedDF).

The reference gathers each instance's observations through a per-instance
inverted index (``IndexedDF.index[mode][i] -> row ids``; src/IndexedDF.jl
[MED], SURVEY.md §3) — a ragged, pointer-chasing structure.  On TPU we
re-layout once at compile time (SURVEY §9.0): for each (relation, mode) the
observations are grouped by instance, degree-sorted, and packed into a small
set of dense blocks ("buckets") of fixed width.  Instances whose degree
exceeds the widest bucket are *chunked* into several rows that scatter-add
into the same accumulator row — this is the skew handling for head entities
(SURVEY §7.7 / §9.2).

Every array here is static-shaped, so the whole Gibbs sweep jit-compiles
once with zero retracing.
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np


@dataclasses.dataclass
class Bucket:
    """One fixed-width block of packed observations for a (relation, mode).

    rows r of this bucket contribute to instance ``inst[r]`` of the focus
    mode; ``part[d][r, w]`` indexes the d-th *other* mode's factor matrix
    (other modes in relation order, focus mode excluded).  Padding entries
    have mask 0 / val 0 / part 0 (index 0 is a valid row; its contribution
    is zeroed by the mask so the scatter-add is a no-op).
    """

    width: int
    inst: np.ndarray          # [rows] int32
    part: List[np.ndarray]    # (arity-1) x [rows, width] int32
    val: np.ndarray           # [rows, width] f32/f64 — centered, 0-padded
    mask: np.ndarray          # [rows, width] f32/f64 — 1 for real entries

    @property
    def n_rows(self) -> int:
        return int(self.inst.shape[0])


@dataclasses.dataclass
class ModeLayout:
    """All buckets for one (relation, mode) pair."""

    buckets: List[Bucket]
    n_instances: int
    arity: int
    nnz: int

    @property
    def padded_nnz(self) -> int:
        return sum(b.n_rows * b.width for b in self.buckets)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_mode_layout(
    idx: np.ndarray,           # [nnz, D] int32 observation indices
    centered_vals: np.ndarray, # [nnz] float (v - mean_r)
    mode: int,
    n_instances: int,
    widths: Sequence[int] = (8, 32, 128, 512, 2048),
    row_pad: int = 8,
    dtype=np.float32,
) -> ModeLayout:
    """Pack one relation's observations for sampling ``mode``'s entity."""
    idx = np.asarray(idx, np.int32)
    nnz, D = idx.shape
    widths = sorted(set(int(w) for w in widths))
    wmax = widths[-1]
    other_modes = [d for d in range(D) if d != mode]

    # CSR-by-instance: stable sort by focus-mode index
    order = np.argsort(idx[:, mode], kind="stable")
    sidx = idx[order]
    svals = np.asarray(centered_vals, np.float64)[order]
    deg = np.bincount(idx[:, mode], minlength=n_instances)
    ptr = np.zeros(n_instances + 1, np.int64)
    np.cumsum(deg, out=ptr[1:])

    # chunk each instance's observation run into (start, len) pieces,
    # assigning each piece to the smallest bucket width that fits
    pieces_per_width = {w: [] for w in widths}  # w -> list of (inst, start, length)
    for i in range(n_instances):
        s, e = int(ptr[i]), int(ptr[i + 1])
        d = e - s
        if d == 0:
            continue
        off = s
        while d > wmax:
            pieces_per_width[wmax].append((i, off, wmax))
            off += wmax
            d -= wmax
        if d > 0:
            w = next(w for w in widths if w >= d)
            pieces_per_width[w].append((i, off, d))

    buckets: List[Bucket] = []
    for w in widths:
        pieces = pieces_per_width[w]
        if not pieces:
            continue
        n_rows = _round_up(len(pieces), row_pad)
        inst = np.zeros(n_rows, np.int32)
        part = [np.zeros((n_rows, w), np.int32) for _ in other_modes]
        val = np.zeros((n_rows, w), dtype)
        mask = np.zeros((n_rows, w), dtype)
        for r, (i, off, length) in enumerate(pieces):
            inst[r] = i
            sl = slice(off, off + length)
            for k, d in enumerate(other_modes):
                part[k][r, :length] = sidx[sl, d]
            val[r, :length] = svals[sl]
            mask[r, :length] = 1.0
        buckets.append(Bucket(width=w, inst=inst, part=part, val=val, mask=mask))

    return ModeLayout(buckets=buckets, n_instances=n_instances, arity=D, nnz=nnz)
