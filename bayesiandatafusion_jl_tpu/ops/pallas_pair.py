"""Pair-path Pallas contraction: both Gramian orientations of the stored
int8 (M8, W8) pair at the MXU s8 rate, with the dequant epilogue in-kernel.

The dense PAIR path (ops/dense_gram.dense_gram_contrib with ``w_scale``,
reference: the per-row ``sample_user`` Gramian, SURVEY §4.2/§5.4) issues,
per 2-ary mode,

    mode 0:  Pt = M8  @ YZ8      b = W8  @ Z8       (contract axis 1)
    mode 1:  Pt = M8' @ YZ8      b = W8' @ Z8       (contract axis 0)

as XLA int8 einsums.  Measured at ML-10M shapes (71.6k x 10.7k, r4 job_j
probes, K=32) the mode-0 orientation runs near the s8 MXU rate but the
mode-1 contraction — contracting the stored MAJOR axis — manages only
~197 TOP/s against ~300 for the Pallas masked-pair kernels on the same
shapes, and XLA's quantize of the partner table can't fuse across the
pallas boundary when the ytab kernel is used, which kept the ytab kernel
size-gated off at ML-10M scale (VERDICT r4 weak #1: the engineering
artifact this kernel family removes).

These kernels mirror ops/pallas_fused's flip_out+dq family with the mask
and value operands loaded from the SEPARATE stored pair instead of being
derived from one array:

  - int8 blocks of M8 and W8 are loaded once per (focus, contract) tile,
  - both MXU dots accumulate in EXACT int32 (associative — any block
    order yields bitwise-identical sums, the engine-parity invariant),
  - the last contraction step dequantizes per output column with
    ALPHA-FOLDED scales and writes the KERNEL layout (Pt [C, n],
    b [K, n]) the packed Cholesky sampler consumes directly — no
    downstream dequant pass, no [N, C] -> [C, N] transpose, no alpha
    multiply in the engine.

Shapes must be multiples of the adaptive block sizes — the engine pads
the stored pair at build time (pad cells are exact zero counts/values,
so they contribute nothing) and the partner tables are padded to the
contract extent by the caller (ops/dense_gram._pair_kernel_contrib).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fused import _VMEM_BUDGET, _pick_block


def _auto_contract_block_pair(n_contract: int, bf: int, ck: int, k: int,
                              granule: int, swap_scratch: bool) -> int:
    """Contract-block divisor search under the VMEM budget for the pair
    kernels: TWO double-buffered int8 lhs blocks (M8 and W8), the int8
    partner blocks, the resident int32 scratch accumulators, and (focus-
    cols) Mosaic's operand-swap relayout stack — the same model as
    ops/pallas_fused._auto_contract_block with ``out_bufs=2`` lhs-doubled
    (the un-modeled swap scratch cost a 44 KB-over-limit compile failure
    once, r4; budget it)."""
    best = 0
    for d in range(granule, min(n_contract, 4096) + 1, granule):
        if n_contract % d:
            continue
        # 3x the [bf, ck+k] f32 tile set: int32 scratch accumulators plus
        # DOUBLE-BUFFERED output tiles — Mosaic double-buffers outputs
        # too, which the first model missed (probe died 1.97 MB over the
        # scoped limit at bf=512/bc=384, K=64)
        vmem = 2 * (2 * bf * d + d * (ck + k)) + 3 * 4 * bf * (ck + k)
        if swap_scratch:
            vmem += 2 * d * (bf + ck + k)
        if vmem <= _VMEM_BUDGET:
            best = d
    return best


def _kern_pair_rows_tq(m_ref, w_ref, yz_ref, z_ref, syz_ref, sz_ref,
                       pt_ref, bv_ref, pm_acc, bv_acc, *, C):
    """Focus-rows (mode 0) pair kernel, kernel-layout + dequant epilogue:
    natural-orientation MXU dots accumulate exact int32 in VMEM scratch;
    the last contraction step dequantizes, slices the packed-triangle
    block in-register, and writes the [C, bf] / [K, bf] tiles with ONE
    in-register transpose each (the scratch-transpose scheme of
    ops/pallas_fused._kern_focus_rows_i8_tq)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    pm = jnp.dot(m_ref[...], yz_ref[...], preferred_element_type=jnp.int32)
    bv = jnp.dot(w_ref[...], z_ref[...], preferred_element_type=jnp.int32)

    @pl.when(j == 0)
    def _():
        pm_acc[...] = pm
        bv_acc[...] = bv

    @pl.when(j > 0)
    def _():
        pm_acc[...] = pm_acc[...] + pm
        bv_acc[...] = bv_acc[...] + bv

    @pl.when(j == nj - 1)
    def _():
        pmf = pm_acc[...].astype(jnp.float32) * syz_ref[...]
        pt_ref[...] = pmf[:, :C].T
        bv_ref[...] = (bv_acc[...].astype(jnp.float32) * sz_ref[...]).T


def _kern_pair_cols_tq(m_ref, w_ref, yz_ref, z_ref, syz_ref, sz_ref,
                       pt_ref, bv_ref, pm_acc, bv_acc, *, C):
    """Focus-cols (mode 1) pair kernel: the operand-swapped dot_general
    (both operands contract dim 0) emits [CK, bf] directly — the kernel
    layout with no transpose anywhere — and the dequant epilogue slices
    the packed block at the last step."""
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    dn = (((0,), (0,)), ((), ()))
    pm = jax.lax.dot_general(yz_ref[...], m_ref[...], dn,
                             preferred_element_type=jnp.int32)
    bv = jax.lax.dot_general(z_ref[...], w_ref[...], dn,
                             preferred_element_type=jnp.int32)

    @pl.when(i == 0)
    def _():
        pm_acc[...] = pm
        bv_acc[...] = bv

    @pl.when(i > 0)
    def _():
        pm_acc[...] = pm_acc[...] + pm
        bv_acc[...] = bv_acc[...] + bv

    @pl.when(i == ni - 1)
    def _():
        pmf = pm_acc[...].astype(jnp.float32) * syz_ref[...].T
        pt_ref[...] = pmf[:C]
        bv_ref[...] = bv_acc[...].astype(jnp.float32) * sz_ref[...].T


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def pair_contract_pallas(M8: jax.Array, W8: jax.Array, YZ8: jax.Array,
                         Z8: jax.Array, s_yz: jax.Array, s_z: jax.Array,
                         focus_axis: int, pref_f: int = 1024,
                         pref_c: int | None = None):
    """(Pt [C, n_focus_padded] f32, b [K, n_focus_padded] f32) — the pair
    path's mode contraction in the kernel layout, dequantized in-kernel.

    ``M8``/``W8`` are the stored int8 pair ([n0, n1], block-multiple
    padded, pad cells 0).  ``YZ8 [n_contract, C+K]`` is the quantized
    [Ypack | U] partner table (ops/pallas_ytab or _quantize_cols —
    bitwise-identical either way), ``Z8`` its trailing factor block, and
    ``s_yz``/``s_z`` the per-column dequant scales — pre-multiplied by
    alpha when the caller wants the alpha-folded contract.  Only the C
    packed columns of the mask dot are emitted (the trailing K "count"
    columns ride the scratch and are sliced away in-register — the pair
    path's b needs no count term, W8 being centered at build).

    int32 sums are exact, so the kernel is bitwise-equal to the XLA
    einsum path followed by the same f32 scale multiply."""
    n0, n1 = M8.shape
    ck = YZ8.shape[1]
    k = Z8.shape[1]
    C = ck - k
    syz = s_yz.astype(jnp.float32).reshape(1, ck)
    sz = s_z.astype(jnp.float32).reshape(1, k)
    if focus_axis == 0:
        # shrink the focus block until a contract block fits the VMEM
        # budget — at K=64 the [bf, CK] int32 scratch pair alone is 18 MB
        # at bf=1024 (first probe died 11.75 MB over the scoped limit)
        bf = _pick_block(n0, pref_f, 8)
        bc = 0
        while bf > 8:
            bc = (_auto_contract_block_pair(n1, bf, ck, k, 128, False)
                  if pref_c is None else _pick_block(n1, pref_c, 128))
            if bc:
                break
            bf = _pick_block(n0, bf // 2, 8)
        if not bc:
            bc = _pick_block(n1, 512, 128)
        assert bf and bc, (M8.shape, "not blockable")
        grid = (n0 // bf, n1 // bc)
        return pl.pallas_call(
            functools.partial(_kern_pair_rows_tq, C=C),
            grid=grid,
            in_specs=[
                pl.BlockSpec((bf, bc), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bf, bc), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bc, ck), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bc, k), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ck), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, k), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((C, bf), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, bf), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((C, n0), jnp.float32),
                       jax.ShapeDtypeStruct((k, n0), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((bf, ck), jnp.int32),
                            pltpu.VMEM((bf, k), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(M8, W8, YZ8, Z8, syz, sz)
    bf = _pick_block(n1, min(pref_f, 512), 128)
    bc = 0
    while bf > 128:
        bc = (_auto_contract_block_pair(n0, bf, ck, k, 256, True)
              if pref_c is None else _pick_block(n0, pref_c, 8))
        if bc:
            break
        bf = _pick_block(n1, bf // 2, 128)
    if not bc:
        bc = _pick_block(n0, 1024, 8)
    assert bf and bc, (M8.shape, "not blockable")
    grid = (n1 // bf, n0 // bc)
    return pl.pallas_call(
        functools.partial(_kern_pair_cols_tq, C=C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bc, bf), lambda jf, i: (i, jf),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, bf), lambda jf, i: (i, jf),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, ck), lambda jf, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, k), lambda jf, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ck), lambda jf, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda jf, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((C, bf), lambda jf, i: (0, jf),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bf), lambda jf, i: (0, jf),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((C, n1), jnp.float32),
                   jax.ShapeDtypeStruct((k, n1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((ck, bf), jnp.int32),
                        pltpu.VMEM((k, bf), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(M8, W8, YZ8, Z8, syz, sz)
