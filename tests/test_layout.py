"""The bucketed layout must be a lossless re-layout of the observations
(SURVEY.md §9.0): for every instance, the union of its bucket rows'
(partner-tuple, value) pairs equals its raw observation set."""
import numpy as np

from bayesiandatafusion_jl_tpu.ops.layout import build_mode_layout


def _reconstruct(ml, arity, mode):
    """instance -> multiset of (other-mode indices..., value)."""
    out = {}
    for b in ml.buckets:
        for r in range(b.n_rows):
            for w in range(b.width):
                if b.mask[r, w] == 0:
                    continue
                partners = tuple(int(p[r, w]) for p in b.part)
                out.setdefault(int(b.inst[r]), []).append(
                    (partners, float(b.val[r, w])))
    return out


def _raw(idx, vals, mode):
    out = {}
    other = [d for d in range(idx.shape[1]) if d != mode]
    for n in range(idx.shape[0]):
        out.setdefault(int(idx[n, mode]), []).append(
            (tuple(int(idx[n, d]) for d in other), float(vals[n])))
    return out


def _check(idx, vals, mode, n, widths):
    ml = build_mode_layout(idx, vals, mode, n, widths=widths, dtype=np.float64)
    got = _reconstruct(ml, idx.shape[1], mode)
    want = _raw(idx, vals, mode)
    assert set(got) == set(want)
    for i in want:
        assert sorted(got[i]) == sorted(want[i]), f"instance {i}"
    assert ml.nnz == idx.shape[0]
    # every bucket's row count is padded to a multiple of 8
    for b in ml.buckets:
        assert b.n_rows % 8 == 0


def test_layout_matrix():
    rng = np.random.default_rng(0)
    mask = rng.random((30, 25)) < 0.3
    idx = np.stack(np.nonzero(mask), 1)
    vals = rng.standard_normal(idx.shape[0])
    for mode in (0, 1):
        _check(idx, vals, mode, mask.shape[mode], widths=(4, 16, 64))


def test_layout_head_chunking():
    # degree 50 instance with widest bucket 8 -> chunked into 7 rows
    rng = np.random.default_rng(1)
    idx = np.stack([np.zeros(50, np.int64), np.arange(50)], 1)
    extra = np.stack([np.ones(3, np.int64), np.arange(3)], 1)
    idx = np.concatenate([idx, extra])
    vals = rng.standard_normal(len(idx))
    _check(idx, vals, 0, 2, widths=(4, 8))


def test_layout_empty_instances():
    # instances with zero observations simply never appear
    idx = np.array([[5, 0], [5, 1]])
    vals = np.array([1.0, 2.0])
    ml = build_mode_layout(idx, vals, 0, 10, widths=(4,), dtype=np.float64)
    got = _reconstruct(ml, 2, 0)
    assert set(got) == {5}


def test_layout_tensor():
    rng = np.random.default_rng(2)
    shape = (8, 7, 5)
    mask = rng.random(shape) < 0.4
    idx = np.stack(np.nonzero(mask), 1)
    vals = rng.standard_normal(idx.shape[0])
    for mode in range(3):
        _check(idx, vals, mode, shape[mode], widths=(4, 16))


def test_native_matches_numpy():
    """The C++ one-pass builder must produce bit-identical layouts."""
    import pytest
    from bayesiandatafusion_jl_tpu import native
    from bayesiandatafusion_jl_tpu.ops.layout import (
        _build_mode_layout_native, _build_mode_layout_numpy)
    if native.lib() is None:
        pytest.skip("native lib not built")
    rng = np.random.default_rng(7)
    shape = (60, 45, 8)
    mask = rng.random(shape) < 0.2
    idx = np.stack(np.nonzero(mask), 1).astype(np.int32)
    cv = rng.standard_normal(idx.shape[0])
    for mode in range(3):
        a = _build_mode_layout_native(idx, cv, mode, shape[mode], (4, 16), 8)
        b = _build_mode_layout_numpy(idx, cv, mode, shape[mode], (4, 16), 8,
                                     np.float32)
        assert [x.width for x in a.buckets] == [x.width for x in b.buckets]
        for ba, bb in zip(a.buckets, b.buckets):
            np.testing.assert_array_equal(ba.inst, bb.inst)
            for pa, pb in zip(ba.part, bb.part):
                np.testing.assert_array_equal(pa, pb)
            np.testing.assert_allclose(ba.val, bb.val, rtol=1e-6)
            np.testing.assert_array_equal(ba.mask, bb.mask)
