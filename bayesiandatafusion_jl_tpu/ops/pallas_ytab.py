"""Fused packed-triangle quantized-table kernel.

The int8 Gramian paths quantize, per sweep, the partner table
``Y = U[:, iu] * U[:, ju]`` ([n, K(K+1)/2], plus the raw factor block)
against per-column max scales (ops/dense_gram._quantize_cols).  In XLA
that is a lane-dim gather-expand to an [n, C] f32 table (1.01 GB at
Netflix scale), a colmax reduce, and a round/clip pass — ~14 ms of the
128 ms netflix sweep and 6.8/14.9 ms at K=64/96 on ML-10M (r4 profiler
+ probe data).  These kernels keep the f32 table IN REGISTERS: each row
block reads only U ([bn, K]) and expands the triangle with K static
slice-broadcast multiplies (``np.triu_indices`` enumerates the packing
row-major, so ``Y = concat_i(u[:, i:i+1] * u[:, i:])`` — plain exact
f32 VPU ops; a one-hot-matmul variant was bitwise only at
Precision.HIGHEST, whose 6-pass f32 emulation erased the win, r4
probe).  Pass 1 max-reduces; pass 2 quantizes and writes int8.  HBM
traffic drops from ~4 passes over the f32 table to two reads of U plus
one int8 write.

Bitwise-identical to the XLA path by construction: the same f32
products, f32 max (exact, order-independent), and the one shared
round/clip convention (dense_gram._q8) — so engine-parity invariants
hold whichever path runs.  ``n_valid`` masks pad rows out of the scale
computation exactly like ``_quantize_cols``'s prefix slice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# compile size grows with K (K concat pieces) and the in-register table
# with K^2; cap at K=64 (C+K=2144)
_MAX_K = 64


def _pick_bn(ck: int) -> int:
    """Row block: Mosaic's stack holds ~6-7 [bn, CK] f32 copies of the
    expanded table (concat pieces + abs/mask temporaries) — bn=1024 at
    K=32 sat 376 KB over the 16 MB scoped-vmem limit (r4 probe); budget
    ~4 MB of modeled 3-copy working set = bn=512 at K<=32, 128 at
    K=64."""
    b = 1024
    while b > 8 and 3 * b * ck * 4 > 4_000_000:
        b //= 2
    return b


def _expand(u, si, sj):
    """[bn, K] f32 -> [bn, C + K]: packed-triangle products then the raw
    factor columns (the fused [Ypack | U] layout).

    The triangle expand is a STATIC lane gather.  The fast TPU form is a
    one-hot selection matmul, but a plain f32 dot truncates U to bf16 on
    the MXU (not bitwise) and Precision.HIGHEST's 6-pass emulation
    erases the win (r4 probes: 1.6 ms inexact / 12.9 ms exact at
    netflix scale; a slice-broadcast variant was exact but lane-
    shuffle-bound at 17.6 ms).  This uses the classic 3-term bf16 SPLIT:
    u == h1 + h2 + h3 exactly (8+8+8 significand bits cover f32's 24),
    each one-hot bf16 x bf16 dot selects its term exactly (operands are
    already bf16 — the MXU truncates nothing), and the f32 sums
    reconstruct u exactly.  3x the (tiny) dot work, bitwise output."""
    h1 = u.astype(jnp.bfloat16)
    r1 = u - h1.astype(jnp.float32)
    h2 = r1.astype(jnp.bfloat16)
    h3 = (r1 - h2.astype(jnp.float32)).astype(jnp.bfloat16)

    def sel(S):
        return (jnp.dot(h1, S, preferred_element_type=jnp.float32)
                + jnp.dot(h2, S, preferred_element_type=jnp.float32)
                + jnp.dot(h3, S, preferred_element_type=jnp.float32))

    yi = sel(si)
    yj = sel(sj)
    return jnp.concatenate([yi * yj, u], axis=1)


def _kern_colmax(u_ref, si_ref, sj_ref, o_ref, *, bn, n_valid):
    i = pl.program_id(0)
    u = u_ref[...].astype(jnp.float32)
    t = jnp.abs(_expand(u, si_ref[...], sj_ref[...]))
    if n_valid is not None:
        row = i * bn + jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
        t = jnp.where(row < n_valid, t, 0.0)
    m = jnp.max(t, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        o_ref[...] = m

    @pl.when(i > 0)
    def _():
        o_ref[...] = jnp.maximum(o_ref[...], m)


def _kern_quant(u_ref, si_ref, sj_ref, s_ref, o_ref):
    u = u_ref[...].astype(jnp.float32)
    t = _expand(u, si_ref[...], sj_ref[...])
    q = jnp.clip(jnp.round(t / s_ref[...]), -127.0, 127.0)
    o_ref[...] = q.astype(jnp.int8)


_sel_cache = {}


def _selectors(K: int):
    if K not in _sel_cache:
        iu, ju = np.triu_indices(K)
        C = len(iu)
        Si = np.zeros((K, C), np.float32)
        Sj = np.zeros((K, C), np.float32)
        Si[iu, np.arange(C)] = 1.0
        Sj[ju, np.arange(C)] = 1.0
        # numpy arrays (ml_dtypes bf16), NOT jnp — caching device arrays
        # created inside a trace leaks tracers across jit calls
        _sel_cache[K] = (Si.astype(jnp.bfloat16),
                         Sj.astype(jnp.bfloat16))
    return _sel_cache[K]


@functools.partial(jax.jit, static_argnums=(1, 2))
def ytab_quantize_pallas(U: jax.Array, n_valid: int | None = None,
                         out_rows: int | None = None):
    """(YZ8 [n, C+K] int8, scales [C+K] f32) — the fused path's
    quantized [Ypack | U] operand, bitwise equal to
    ``_quantize_cols(Uf[:, iu] * Uf[:, ju])`` + ``_quantize_cols(Uf)``
    stacked.  K <= 64; rows are zero-padded to the block internally
    (zero products affect neither the colmax nor the sliced output).

    ``out_rows`` (>= n) emits that many rows, the extras exact int8
    zeros — the fused contraction needs the partner padded to V8's
    contract extent, and folding the pad here deletes a downstream
    [n, C+K] int8 concat copy (~1 ms at Netflix scale, r4)."""
    n, K = U.shape
    assert K <= _MAX_K, (U.shape,)
    Si, Sj = _selectors(K)
    C = K * (K + 1) // 2
    CK = C + K
    bn = _pick_bn(CK)
    n_out = n if out_rows is None else max(int(out_rows), n)
    n_pad = -(-n_out // bn) * bn
    if n_pad != n:
        U = jnp.concatenate(
            [U, jnp.zeros((n_pad - n, K), U.dtype)])
    grid = (n_pad // bn,)
    sel_specs = [
        pl.BlockSpec((K, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    mx = pl.pallas_call(
        functools.partial(_kern_colmax, bn=bn, n_valid=n_valid),
        grid=grid,
        in_specs=[pl.BlockSpec((bn, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] + sel_specs,
        out_specs=pl.BlockSpec((1, CK), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, CK), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(U, Si, Sj)
    from .dense_gram import _INV127, _floor_scale
    s = _floor_scale(mx[0] * _INV127, jnp.float32)
    YZ8 = pl.pallas_call(
        _kern_quant,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bn, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + sel_specs + [
            pl.BlockSpec((1, CK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, CK), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, CK), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(U, Si, Sj, s.reshape(1, CK))
    return YZ8[:n_out], s
