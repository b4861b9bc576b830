"""Pallas TPU kernel: streaming segmented sum of instance-sorted Gramian rows.

Replaces ``jax.ops.segment_sum`` for the [rows, K, K] -> [N, K, K]
accumulation (XLA's scatter path runs at ~25 GB/s effective; this kernel
streams rows sequentially — they are sorted by target instance within each
bucket by construction — into a sliding VMEM window and flushes completed
windows to HBM with DMA, so both sides move at full memory bandwidth).

Contract: ``inst`` must be non-decreasing.  Output slots never touched
(gap instances) keep their initial value, so the caller passes a
zero-initialized output via input/output aliasing; the engine adds the
prior precision Lambda inside the Cholesky kernel (ops/pallas_chol.py).

STATUS: correct under the Pallas interpreter (tests/test_pallas.py) but
NOT wired into the engine — manual ``make_async_copy`` into an
ANY-memory-space output crashes this toolchain's remote Mosaic compiler
(HTTP 500; minimal repro in round-1 history), the same class of bug that
blocks the sublane dynamic_gather.  Re-test on toolchain updates; the
engine keeps XLA ``segment_sum`` (~13 ms/sweep at ML-10M) until then.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(inst_ref, P_ref, init_in, out_hbm, acc, prev, base_ref, sem, *,
            C: int, K: int, W: int, n_chunks: int):
    del init_in  # aliased with out_hbm; prior contents read back on flush
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        base_ref[0] = inst_ref[0, 0, 0]

    def flush(base):
        # read-modify-write so chained per-bucket calls accumulate
        dma_in = pltpu.make_async_copy(out_hbm.at[pl.ds(base, W)], prev,
                                       sem)
        dma_in.start()
        dma_in.wait()
        acc[:] = acc[:] + prev[:]
        dma = pltpu.make_async_copy(acc, out_hbm.at[pl.ds(base, W)], sem)
        dma.start()
        dma.wait()

    sub = C // 8

    def body(r, _):
        t = inst_ref[0, r // sub, r % sub]
        base = base_ref[0]

        @pl.when(t - base >= W)
        def _slide():
            flush(base)
            acc[:] = jnp.zeros_like(acc)
            base_ref[0] = t

        tgt = t - base_ref[0]
        acc[pl.ds(tgt, 1)] = acc[pl.ds(tgt, 1)] + P_ref[pl.ds(r, 1)]
        return 0

    jax.lax.fori_loop(0, C, body, 0)

    @pl.when(i == n_chunks - 1)
    def _final():
        flush(base_ref[0])


def segsum_sorted_pallas(P_rows: jax.Array, inst: jax.Array, n: int,
                         chunk: int = 512, window: int = 1024,
                         init: jax.Array | None = None) -> jax.Array:
    """Sum rows into [n, K, K] by sorted ``inst``.

    ``init`` (default zeros) seeds the output — pass a previous call's
    result to accumulate several sorted row streams (one per bucket).
    Untouched slots keep their init value.
    """
    R, K, _ = P_rows.shape
    dtype = P_rows.dtype
    pad = (-R) % chunk
    if pad:
        P_rows = jnp.concatenate(
            [P_rows, jnp.zeros((pad, K, K), dtype)], axis=0)
        last = inst[-1] if R else jnp.asarray(0, inst.dtype)
        inst = jnp.concatenate(
            [inst, jnp.full((pad,), last, inst.dtype)])
    Rp = R + pad
    n_chunks = Rp // chunk
    inst3d = inst.reshape(n_chunks, 8, chunk // 8)
    n_pad = n + window  # final window may extend past n; sliced off below
    if init is None:
        init_arr = jnp.zeros((n_pad, K, K), dtype)
    else:
        init_arr = jnp.concatenate(
            [init, jnp.zeros((n_pad - n, K, K), dtype)], axis=0)

    out = pl.pallas_call(
        functools.partial(_kernel, C=chunk, K=K, W=window,
                          n_chunks=n_chunks),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 8, chunk // 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, K, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n_pad, K, K), dtype),
        scratch_shapes=[pltpu.VMEM((window, K, K), dtype),
                        pltpu.VMEM((window, K, K), dtype),
                        pltpu.SMEM((1,), jnp.int32),
                        pltpu.SemaphoreType.DMA],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(inst3d.astype(jnp.int32), P_rows, init_arr)
    return out[:n]


# ---------------------------------------------------------------------------
# Variant 2: windowed one-hot reduction — built ONLY from constructs verified
# to compile on this toolchain (PrefetchScalarGridSpec index maps, output
# block revisiting, vector compares, MXU dots).  The [rows]->[N] scatter is
# re-expressed per (window, chunk) pair as onehot[W, C] @ P_chunk[C, K*K]:
# the one-hot is built by comparing the chunk's (static-at-compile) instance
# ids against the window's slot iota — no data-dependent addressing at all.
# ---------------------------------------------------------------------------

def _window_kernel(wtbl, btbl, first, oh_ref, P_ref, out_ref, *,
                   C: int, W: int, KK: int):
    i = pl.program_id(0)

    @pl.when(first[i] == 1)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    contrib = jax.lax.dot_general(
        oh_ref[0], P_ref[0].astype(oh_ref.dtype),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [W, KK]
    out_ref[:] = out_ref[:] + contrib


def plan_windowed_segsum(inst_list, n: int, chunk: int = 512,
                         window: int = 512):
    """Host-side plan: (window, chunk-block) pairs + static one-hots.

    ``inst_list``: per-bucket COMPILE-TIME instance ids (non-decreasing
    within each bucket).  Returns a dict of device arrays + static meta.
    """
    import numpy as np
    inst_parts, bucket_pads = [], []
    for inst in inst_list:
        inst = np.asarray(inst, np.int64)
        pad = (-len(inst)) % chunk
        bucket_pads.append(pad)
        if pad:
            inst = np.concatenate([inst, np.full(pad, -1, np.int64)])
        inst_parts.append(inst)
    inst_cat = np.concatenate(inst_parts) if inst_parts else         np.zeros(0, np.int64)
    n_blocks = max(len(inst_cat) // chunk, 1)
    if len(inst_cat) == 0:
        inst_cat = np.full(chunk, -1, np.int64)
    blocks = inst_cat.reshape(n_blocks, chunk)

    n_win = -(-n // window)
    pairs = []
    for b in range(n_blocks):
        real = blocks[b][blocks[b] >= 0]
        if len(real) == 0:
            continue
        for w in range(int(real.min()) // window,
                       int(real.max()) // window + 1):
            pairs.append((w, b))
    pairs.sort()
    wtbl = np.asarray([p[0] for p in pairs], np.int32)
    btbl = np.asarray([p[1] for p in pairs], np.int32)
    first = np.asarray(
        [1 if (i == 0 or wtbl[i] != wtbl[i - 1]) else 0
         for i in range(len(pairs))], np.int32)
    oh = np.zeros((len(pairs), window, chunk), np.float32)
    for pi, (w, b) in enumerate(pairs):
        slot = blocks[b] - w * window
        ok = (slot >= 0) & (slot < window)
        oh[pi, slot[ok], np.nonzero(ok)[0]] = 1.0
    return {"oh": jnp.asarray(oh, jnp.bfloat16),
            "wtbl": jnp.asarray(wtbl), "btbl": jnp.asarray(btbl),
            "first": jnp.asarray(first),
            "meta": (chunk, window, n_win, n_blocks,
                     tuple(bucket_pads))}


def segsum_windowed_pallas(P_rows_list, plan, n: int):
    """Apply a plan_windowed_segsum plan to runtime per-bucket P rows.

    NOTE: the one-hot contraction runs in bf16 (exact for the 0/1
    one-hot; P rows round to bf16 before the dot) — pair with
    gram_dtype=bfloat16, where the Gramian inputs are bf16 anyway.
    """
    chunk, window, n_win, n_blocks, bucket_pads = plan["meta"]
    K = P_rows_list[0].shape[-1]
    dtype = P_rows_list[0].dtype
    P_parts = []
    for P, pad in zip(P_rows_list, bucket_pads):
        if pad:
            P = jnp.concatenate(
                [P, jnp.zeros((pad, K, K), dtype)], axis=0)
        P_parts.append(P.reshape(-1, K * K))
    P_cat = jnp.concatenate(P_parts)
    n_pairs = plan["wtbl"].shape[0]

    out = pl.pallas_call(
        functools.partial(_window_kernel, C=chunk, W=window, KK=K * K),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(n_pairs,),
            in_specs=[
                pl.BlockSpec((1, window, chunk),
                             lambda i, wt, bt, fs: (i, 0, 0)),
                pl.BlockSpec((1, chunk, K * K),
                             lambda i, wt, bt, fs: (bt[i], 0, 0)),
            ],
            out_specs=pl.BlockSpec((window, K * K),
                                   lambda i, wt, bt, fs: (wt[i], 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_win * window, K * K), dtype),
    )(plan["wtbl"], plan["btbl"], plan["first"], plan["oh"],
      P_cat.reshape(n_blocks, chunk, K * K))
    return out.reshape(n_win * window, K, K)[:n]
