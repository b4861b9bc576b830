"""Canonical workloads: MovieLens ratings and ChEMBL-IC50-shaped data.

The reference's README drives MovieLens (ratings RMSE, ``clamp=[1,5]``) and
ChEMBL IC50 with ECFP side features (``class_cut = log10(200)``) — SURVEY.md
§1.  This sandbox has zero egress, so each loader falls back to a
shape-matched synthetic generator (power-law degree skew included, since
head-entity skew is exactly what the bucketed layout must handle).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from .data import Entity, IndexedDF, RelationData

# ChEMBL activity threshold used by the reference README [HIGH; SURVEY §1]
CLASS_CUT_IC50 = float(np.log10(200))

_ML_SHAPES = {
    "100k": (943, 1682, 100_000),
    "1m": (6040, 3706, 1_000_209),
    "10m": (71567, 10681, 10_000_054),
}

# filenames that count as a dropped-in real ratings file (the standing
# BASELINE.md data request to the driver) — checked in .cache/ and one
# directory level below it (ml-100k/u.data etc.)
_REAL_RATINGS_NAMES = ("ratings.dat", "u.data", "ratings.csv",
                       "ratings.txt")


def find_real_ratings(cache_dir: Optional[str] = None) -> Optional[str]:
    """Path of a real MovieLens-family ratings file under ``.cache/``,
    or None.  The landing pad for the real-data north-star validation
    (VERDICT r3 #5): the day a file lands, ``bench.py`` benches on it
    with no env var needed and ``tests/test_realdata.py`` un-skips."""
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".cache")
    if not os.path.isdir(cache_dir):
        return None
    for name in _REAL_RATINGS_NAMES:
        p = os.path.join(cache_dir, name)
        if os.path.isfile(p):
            return p
    for sub in sorted(os.listdir(cache_dir)):
        d = os.path.join(cache_dir, sub)
        if not os.path.isdir(d):
            continue
        for name in _REAL_RATINGS_NAMES:
            p = os.path.join(d, name)
            if os.path.isfile(p):
                return p
    return None


def load_movielens(variant: str = "100k",
                   path: Optional[str] = None,
                   seed: int = 0) -> IndexedDF:
    """MovieLens ratings as an IndexedDF (user x movie).

    If ``path`` points at a ``u.data`` / ``ratings.dat`` file, parse it;
    otherwise generate a synthetic dataset with the right shape, sparsity,
    skew and a rank-32 latent signal (ratings in [1, 5]).
    """
    if path is not None and os.path.exists(path):
        return _parse_movielens_file(path)
    n_users, n_movies, nnz = _ML_SHAPES[variant]
    return synthetic_ratings(n_users, n_movies, nnz, seed=seed)


def _parse_movielens_file(path: str) -> IndexedDF:
    """Robust ratings-file parser — the landing pad for real data
    (``BENCH_DATA=... python bench.py``; VERDICT r2 weak #6).

    Handles every MovieLens-family layout without trusting the filename:
    the separator is inferred from the LINE CONTENT per line (``::`` /
    tab / comma / whitespace), header lines and blank lines are skipped,
    malformed lines are skipped (counted, reported on stderr), and
    arbitrary gappy 1-based ids are densified via np.unique.  Extra
    columns (timestamps) are ignored.
    """
    import sys
    users: list = []
    movies: list = []
    vals: list = []
    bad = 0
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if "::" in line:
                parts = line.split("::")
            elif "\t" in line:
                parts = line.split("\t")
            elif "," in line:
                parts = line.split(",")
            else:
                parts = line.split()
            if len(parts) < 3:
                bad += 1
                continue
            try:
                u = int(parts[0])
                m = int(parts[1])
                v = float(parts[2])
            except ValueError:
                bad += 1          # header or junk line
                continue
            users.append(u)
            movies.append(m)
            vals.append(v)
    if bad:
        print(f"# parse {path}: skipped {bad} non-data lines",
              file=sys.stderr)
    if not users:
        raise ValueError(f"no ratings parsed from {path}")
    u_arr = np.asarray(users, np.int64)
    m_arr = np.asarray(movies, np.int64)
    _, u_arr = np.unique(u_arr, return_inverse=True)
    _, m_arr = np.unique(m_arr, return_inverse=True)
    idx = np.stack([u_arr, m_arr], axis=1)
    return IndexedDF(idx, np.asarray(vals, np.float64),
                     (int(u_arr.max()) + 1, int(m_arr.max()) + 1))


def synthetic_ratings(n_users: int, n_movies: int, nnz: int,
                      rank: int = 32, noise: float = 0.6,
                      seed: int = 0) -> IndexedDF:
    """Rank-``rank`` ratings matrix sample with power-law movie popularity
    and lognormal user activity (matches MovieLens-like skew: head movies
    carry thousands of ratings; SURVEY §9.2)."""
    rng = np.random.default_rng(seed)
    # popularity / activity profiles
    movie_p = (1.0 / np.arange(1, n_movies + 1) ** 0.8)
    movie_p /= movie_p.sum()
    user_p = rng.lognormal(0.0, 1.0, n_users)
    user_p /= user_p.sum()
    movie_cdf = np.cumsum(movie_p)
    user_cdf = np.cumsum(user_p)

    def draw(n):  # inverse-CDF sampling (much faster than rng.choice w/ p)
        u = np.searchsorted(user_cdf, rng.random(n)).astype(np.int64)
        m = np.searchsorted(movie_cdf, rng.random(n)).astype(np.int64)
        return np.unique(u * n_movies + m)

    target = nnz
    key = draw(int(target * 1.6) + 1024)
    while len(key) < target:  # rare: heavy-skew dedup fell short
        key = np.unique(np.concatenate([key, draw(target)]))
    sel = rng.permutation(len(key))[:target]
    u, m = key[sel] // n_movies, key[sel] % n_movies
    # rank-`rank` signal scaled into the star range
    U = rng.standard_normal((n_users, rank)) / np.sqrt(rank)
    V = rng.standard_normal((n_movies, rank)) / np.sqrt(rank)
    vals = 3.5 + 1.1 * np.sum(U[u] * V[m], axis=1) \
        + noise * rng.standard_normal(target)
    vals = np.clip(np.round(vals * 2) / 2, 1.0, 5.0)
    idx = np.stack([u, m], axis=1)
    return IndexedDF(idx, vals, (n_users, n_movies))


def synthetic_chembl(n_compounds: int = 15_000, n_targets: int = 346,
                     n_features: int = 32_000, nnz: int = 300_000,
                     feat_per_compound: int = 40, rank: int = 16,
                     feat_frac: float = 0.85, obs_noise: float = 0.25,
                     seed: int = 0) -> RelationData:
    """ChEMBL-IC50-shaped fusion problem: compound x target activities on
    the log10(IC50 nM) scale (active <=> value < CLASS_CUT_IC50 =
    log10(200), the reference README convention) with sparse binary
    ECFP-like compound features driving the latents (SURVEY §1: the Macau
    paper's benchmark shape).

    Two properties make the generator DISCRIMINATIVE (VERDICT r2 #4 —
    the r2 version gave features ~12% of latent variance and uniform
    compound degrees, so featureless BPMF matched Macau and AUC guarded
    nothing):

    - ``feat_frac`` of each latent dim's variance comes from the feature
      map (ECFP determines activity, as in the real assay panels);
    - compound degrees follow a power law (most compounds have a handful
      of measurements — exactly where the ChEMBL workload needs the side
      information, Macau paper §IV), so stripping features must cost AUC.
    """
    rng = np.random.default_rng(seed)
    # sparse binary features
    fr = np.repeat(np.arange(n_compounds),
                   rng.poisson(feat_per_compound, n_compounds))
    fc = rng.integers(0, n_features, len(fr))
    feat_key = np.unique(fr.astype(np.int64) * n_features + fc)
    fr, fc = feat_key // n_features, feat_key % n_features
    from ..ops.sparse import SparseBinMatrix
    F = SparseBinMatrix(fr.astype(np.int32), fc.astype(np.int32),
                        (n_compounds, n_features))
    # feature-dominated latents: normalize the feature map to unit
    # per-dim std, then mix with `1 - feat_frac` residual chemistry
    beta = rng.standard_normal((n_features, rank))
    Uf = F.matmul(beta)
    Uf /= Uf.std(axis=0, keepdims=True) + 1e-12
    Uc = (np.sqrt(feat_frac) * Uf
          + np.sqrt(1.0 - feat_frac) * rng.standard_normal(
              (n_compounds, rank)))
    Ut = rng.standard_normal((n_targets, rank))
    # power-law compound panel sizes (head compounds screened widely,
    # the long tail measured once or twice)
    comp_p = 1.0 / np.arange(1, n_compounds + 1) ** 0.7
    comp_p /= comp_p.sum()
    comp_cdf = np.cumsum(comp_p)
    c = np.searchsorted(comp_cdf, rng.random(int(nnz * 1.6)))
    c = rng.permutation(c)
    t = rng.integers(0, n_targets, len(c))
    key = np.unique(c.astype(np.int64) * n_targets + t)
    key = rng.permutation(key)[:nnz]
    c, t = key // n_targets, key % n_targets
    # values on the log10(IC50 nM) scale that CLASS_CUT_IC50 = log10(200)
    # applies to (active <=> value < cut, the reference README convention)
    # — centered near the cut so the classification split is non-degenerate
    lic50 = 2.2 + 0.8 * np.sum(Uc[c] * Ut[t], axis=1) / np.sqrt(rank) \
        + obs_noise * rng.standard_normal(len(c))
    df = IndexedDF(np.stack([c, t], axis=1), lic50,
                   (n_compounds, n_targets))
    rd = RelationData.from_matrix(df, feat1=F,
                                  names=("compound", "target"),
                                  relation_name="ic50",
                                  class_cut=CLASS_CUT_IC50)
    return rd
