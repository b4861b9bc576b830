"""Fused masked-pair Pallas kernel: both Gramian orientations from ONE
stored int8 value array.

The sparse-regime dense path (ops/dense_gram.fused_gram_contrib) needs,
per sweep, BOTH contractions of the stored ``V8 [n0, n1]``:

    mode 0:  PM0 = (V8 != 0)  @ YZ1     BV0 = V8  @ Z1      (contract n1)
    mode 1:  PM1 = (V8 != 0)' @ YZ0     BV1 = V8' @ Z0      (contract n0)

In plain XLA the two dots want OPPOSITE layouts of the same 8 GB operand,
and the compiler materializes a full transposed copy (Netflix-scale OOM:
``copy(V8)`` = 7.96 GB, r3 failure log).  These kernels instead load
[bF, bC] int8 blocks once into VMEM, derive the observation mask
in-register, and issue the MXU dots in whichever orientation the mode
needs — no second copy, no HBM mask materialization.  Measured on v5e at
Netflix scale (480k x 17.7k, r32): ~100 TFLOP/s both orientations (vs
16-27 for the mask-materializing einsum).

The mask dot's RHS carries the packed-triangle partner table AND the raw
partner factors side by side (``YZ = [Ypack | U]``, C+K columns) so one
dot yields both P and the mean-correction term; the value dot ``V8 @ U``
is the second MXU issue of the same loaded block.

Shapes must be multiples of the block sizes — callers pad V8 at build
time (pad cells are 0 = unobserved, so they contribute nothing) and pad
partner rows to match; block sizes adapt downward to divide the shapes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(n: int, pref: int, floor: int) -> int:
    b = pref
    while b > floor and n % b:
        b //= 2
    return b if n % b == 0 else 0


_VMEM_BUDGET = 12_000_000  # bytes; c=3584 at Netflix scale (14 MB) OOMs


def _auto_contract_block(n_contract: int, bf: int, ck: int, k: int,
                         granule: int, out_bufs: int = 1,
                         swap_scratch: bool = False,
                         budget: float | None = None) -> int:
    """Largest ``granule``-multiple divisor of ``n_contract`` (<= 4096)
    whose per-step VMEM footprint — double-buffered int8 input blocks
    plus the resident int32 output tile — fits the budget.

    The contract block sets how often the [bf, ck+k] int32 output tile
    pays a VPU read-modify-write accumulate: ~560 VPU cycles against
    ~2.3 dot-cycles per contracted element at CK=592, so bc=512 costs
    ~24% and bc=2560 ~5%.  Netflix-scale probe (r3s3, n1=17920):
    bc=512 -> 50.3 ms / 203 TOP/s, bc=2560 -> 39.7 ms / 257 TOP/s.

    ``out_bufs=2`` models the flip_out focus-rows kernel, whose natural-
    orientation scratch accumulator doubles the resident output bytes
    (plus Mosaic's transpose working space, ~4*bf*(ck+k)).
    ``swap_scratch`` models the flip_out focus-cols kernel: its operand-
    swapped dot_general contracts dim 0 of BOTH operands, and Mosaic
    stages in-register transposed copies (~bc*(bf+ck+k) bytes of scoped
    stack).  Without this term the engine program sat 44 KB over the
    16 MB scoped-vmem limit and failed to compile (r4 probe)."""
    best = 0
    cap = _VMEM_BUDGET if budget is None else budget
    for d in range(granule, min(n_contract, 4096) + 1, granule):
        if n_contract % d:
            continue
        vmem = 2 * (bf * d + d * (ck + k)) + out_bufs * 4 * bf * (ck + k)
        if swap_scratch:
            vmem += d * (bf + ck + k)
        if vmem <= cap:
            best = d
    return best


def _kern_focus_rows_i8(w_ref, yz_ref, z_ref, pm_ref, bv_ref):
    """int8 orientation of :func:`_kern_focus_rows`: the mask is an exact
    0/1 int8 operand and ``yz``/``z`` are per-column-quantized int8, so
    both dots run at the MXU s8 rate and accumulate in EXACT int32 —
    per-column dequantization happens outside the kernel (one broadcast
    multiply), mirroring ops/dense_gram._quantize_cols semantics."""
    j = pl.program_id(1)
    w8 = w_ref[...]
    m = (w8 != 0).astype(jnp.int8)
    pm = jnp.dot(m, yz_ref[...], preferred_element_type=jnp.int32)
    bv = jnp.dot(w8, z_ref[...], preferred_element_type=jnp.int32)

    @pl.when(j == 0)
    def _():
        pm_ref[...] = pm
        bv_ref[...] = bv

    @pl.when(j > 0)
    def _():
        pm_ref[...] = pm_ref[...] + pm
        bv_ref[...] = bv_ref[...] + bv


def _kern_focus_cols_i8(w_ref, yz_ref, z_ref, pm_ref, bv_ref):
    i = pl.program_id(1)
    w8 = w_ref[...]
    m = (w8 != 0).astype(jnp.int8)
    dn = (((0,), (0,)), ((), ()))
    pm = jax.lax.dot_general(m, yz_ref[...], dn,
                             preferred_element_type=jnp.int32)
    bv = jax.lax.dot_general(w8, z_ref[...], dn,
                             preferred_element_type=jnp.int32)

    @pl.when(i == 0)
    def _():
        pm_ref[...] = pm
        bv_ref[...] = bv

    @pl.when(i > 0)
    def _():
        pm_ref[...] = pm_ref[...] + pm
        bv_ref[...] = bv_ref[...] + bv


def _kern_focus_rows_i8_t(w_ref, yz_ref, z_ref, pm_ref, bv_ref,
                          pm_acc, bv_acc):
    """flip_out variant of :func:`_kern_focus_rows_i8`: the MXU dots stay
    in their natural orientation, accumulate into a VMEM scratch, and ONE
    in-register transpose per focus block at the last contraction step
    writes the [ck, bf] output tile — the kernel-layout emission that
    deletes the downstream [N, C] -> [C, N] HBM transpose pass
    (VERDICT r3 #3: ~2 GB/sweep of pure traffic at Netflix scale)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    w8 = w_ref[...]
    m = (w8 != 0).astype(jnp.int8)
    pm = jnp.dot(m, yz_ref[...], preferred_element_type=jnp.int32)
    bv = jnp.dot(w8, z_ref[...], preferred_element_type=jnp.int32)

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
        pm_ref[...] = pm_acc[...].T
        bv_ref[...] = bv_acc[...].T


def _kern_focus_cols_i8_t(w_ref, yz_ref, z_ref, pm_ref, bv_ref):
    """flip_out variant of :func:`_kern_focus_cols_i8`: the [ck, bf]
    output orientation falls out of swapping the dot operands (both
    contract dim 0) — no transpose anywhere."""
    i = pl.program_id(1)
    w8 = w_ref[...]
    m = (w8 != 0).astype(jnp.int8)
    dn = (((0,), (0,)), ((), ()))
    pm = jax.lax.dot_general(yz_ref[...], m, dn,
                             preferred_element_type=jnp.int32)
    bv = jax.lax.dot_general(z_ref[...], w8, dn,
                             preferred_element_type=jnp.int32)

    @pl.when(i == 0)
    def _():
        pm_ref[...] = pm
        bv_ref[...] = bv

    @pl.when(i > 0)
    def _():
        pm_ref[...] = pm_ref[...] + pm
        bv_ref[...] = bv_ref[...] + bv


def _kern_focus_rows_i8_tq(w_ref, yz_ref, z_ref, syz_ref, sz_ref,
                           pt_ref, pmm_ref, bv_ref, pm_acc, bv_acc, *,
                           C):
    """Dequanting flip variant (r4, plain-engine epilogue): accumulates
    the EXACT int32 sums in scratch like _kern_focus_rows_i8_t, then at
    the last contraction step dequantizes per column, SPLITS the packed
    block from the mean-count columns, and writes all three f32 outputs
    transposed — deleting the downstream [560, 480k] dequant pass and
    the 1 GB Pt sublane-slice split (~6 ms/sweep at netflix scale).
    Values bitwise-equal the fallback's (int32 -> f32) * scale."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    w8 = w_ref[...]
    m = (w8 != 0).astype(jnp.int8)
    pm = jnp.dot(m, yz_ref[...], preferred_element_type=jnp.int32)
    bv = jnp.dot(w8, z_ref[...], preferred_element_type=jnp.int32)

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
        pmm_ref[...] = pmf[:, C:].T
        bv_ref[...] = (bv_acc[...].astype(jnp.float32)
                       * sz_ref[...]).T


def _kern_focus_cols_i8_tq(w_ref, yz_ref, z_ref, syz_ref, sz_ref,
                           pt_ref, pmm_ref, bv_ref, pm_acc, bv_acc, *,
                           C):
    """Dequanting flip variant of the focus-cols kernel: int32 scratch
    accumulation across the contraction grid, one dequant+split write at
    the last step (outputs already [*, bf] from the operand swap)."""
    i = pl.program_id(1)
    ni = pl.num_programs(1)
    w8 = w_ref[...]
    m = (w8 != 0).astype(jnp.int8)
    dn = (((0,), (0,)), ((), ()))
    pm = jax.lax.dot_general(yz_ref[...], m, dn,
                             preferred_element_type=jnp.int32)
    bv = jax.lax.dot_general(z_ref[...], w8, dn,
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
        pmm_ref[...] = pmf[C:]
        bv_ref[...] = (bv_acc[...].astype(jnp.float32) * sz_ref[...].T)


def _kern_focus_rows_t(w_ref, yz_ref, z_ref, pm_ref, bv_ref,
                       pm_acc, bv_acc, *, op_dtype):
    """float flip_out focus-rows kernel (same scratch-transpose scheme as
    the i8 variant, f32 accumulation)."""
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    w8 = w_ref[...]
    m = (w8 != 0).astype(op_dtype)
    w = w8.astype(op_dtype)
    pm = jnp.dot(m, yz_ref[...], preferred_element_type=jnp.float32)
    bv = jnp.dot(w, z_ref[...], preferred_element_type=jnp.float32)

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
        pm_ref[...] = pm_acc[...].T
        bv_ref[...] = bv_acc[...].T


def _kern_focus_cols_t(w_ref, yz_ref, z_ref, pm_ref, bv_ref, *, op_dtype):
    """float flip_out focus-cols kernel (operand-swapped dots)."""
    i = pl.program_id(1)
    w8 = w_ref[...]
    m = (w8 != 0).astype(op_dtype)
    w = w8.astype(op_dtype)
    dn = (((0,), (0,)), ((), ()))
    pm = jax.lax.dot_general(yz_ref[...], m, dn,
                             preferred_element_type=jnp.float32)
    bv = jax.lax.dot_general(z_ref[...], w, dn,
                             preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        pm_ref[...] = pm
        bv_ref[...] = bv

    @pl.when(i > 0)
    def _():
        pm_ref[...] = pm_ref[...] + pm
        bv_ref[...] = bv_ref[...] + bv


def _kern_focus_rows(w_ref, yz_ref, z_ref, pm_ref, bv_ref, *, op_dtype):
    j = pl.program_id(1)
    w8 = w_ref[...]
    m = (w8 != 0).astype(op_dtype)
    w = w8.astype(op_dtype)
    pm = jnp.dot(m, yz_ref[...], preferred_element_type=jnp.float32)
    bv = jnp.dot(w, z_ref[...], preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        pm_ref[...] = pm
        bv_ref[...] = bv

    @pl.when(j > 0)
    def _():
        pm_ref[...] = pm_ref[...] + pm
        bv_ref[...] = bv_ref[...] + bv


def _kern_focus_cols(w_ref, yz_ref, z_ref, pm_ref, bv_ref, *, op_dtype):
    i = pl.program_id(1)
    w8 = w_ref[...]
    m = (w8 != 0).astype(op_dtype)
    w = w8.astype(op_dtype)
    dn = (((0,), (0,)), ((), ()))
    pm = jax.lax.dot_general(m, yz_ref[...], dn,
                             preferred_element_type=jnp.float32)
    bv = jax.lax.dot_general(w, z_ref[...], dn,
                             preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _():
        pm_ref[...] = pm
        bv_ref[...] = bv

    @pl.when(i > 0)
    def _():
        pm_ref[...] = pm_ref[...] + pm
        bv_ref[...] = bv_ref[...] + bv


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def fused_pair_pallas(V8: jax.Array, YZ: jax.Array, Z: jax.Array,
                      focus_axis: int, pref_f: int = 1024,
                      pref_c: int | None = None, flip_out: bool = False,
                      dq: tuple | None = None):
    """(PM [n_focus, CK], BV [n_focus, K]) from the stored int8 array —
    or, with ``flip_out=True``, the KERNEL layout (PM [CK, n_focus],
    BV [K, n_focus]) the packed Cholesky sampler consumes directly, so
    the caller never pays the [N, C] -> [C, N] XLA transpose pass
    (VERDICT r3 #3).  Focus-cols emits it by swapping the dot operands
    (free); focus-rows accumulates naturally in VMEM scratch and
    transposes each output tile once, in-register, at the last
    contraction step.

    ``YZ [n_contract, C+K]`` and ``Z [n_contract, K]`` are the partner
    tables, where the contract axis is ``V8.shape[1 - focus_axis]``.  All
    shapes must be divisible by the adaptive block sizes (pad with zeros).

    ``pref_f`` is the preferred focus block (halved until it divides the
    shape; default 1024).  It amortizes partner-table re-reads in the
    focus-cols orientation — bf=128 made mode 1 bandwidth-bound at
    Netflix scale (~48 GB/call vs 18 GB at bf=512).  ``pref_c`` None
    (default) picks the contract block by divisor search under the VMEM
    budget (:func:`_auto_contract_block` — the dominant tuning axis); an
    explicit value is halved until it divides, as for ``pref_f``.

    Two arithmetic modes, selected by the partner dtype:

    - float YZ/Z: mask/value operands cast to the partner dtype, MXU dots
      accumulate f32 (bf16 rate).
    - int8 YZ/Z (per-column-quantized, ops/dense_gram._quantize_cols):
      s8 x s8 -> EXACT int32 dots at the MXU s8 rate (2x bf16); outputs
      are int32 and the caller dequantizes per output column.  Overflow
      eligibility (127 * max|code| * n_contract < 2^31) is the caller's
      contract (ops/dense_gram plans it from the stored encoding).
    """
    n0, n1 = V8.shape
    ck = YZ.shape[1]
    k = Z.shape[1]
    C = ck - k
    op_dtype = YZ.dtype
    int8 = op_dtype == jnp.int8
    out_dt = jnp.int32 if int8 else jnp.float32
    assert dq is None or (flip_out and int8), \
        "dq epilogue is a flip_out int8 option"
    if dq is not None:
        syz = dq[0].astype(jnp.float32).reshape(1, ck)
        sz = dq[1].astype(jnp.float32).reshape(1, k)
    if focus_axis == 0:
        # shrink the focus block until a contract block fits the VMEM
        # budget: at K=64 (ck+k=2208) the flip/dq scratch accumulators
        # alone are 18 MB at bf=1024 — the old flat 512 fallback compiled
        # a 27 MB stack and died on the scoped-vmem limit (r5 probe)
        bf = _pick_block(n0, pref_f, 8)
        bc = 0
        while bf > 8:
            # flip paths: 3x the [bf, ck+k] f32 tile set resident (1x
            # int32 scratch pair + DOUBLE-BUFFERED output tiles — Mosaic
            # double-buffers outputs too, r5 probe) against a 14 MB cap
            # (~2 MB measured Mosaic slop under the 16 MB scoped limit);
            # the non-flip kernels keep the proven 12 MB/1-buffer model.
            bc = (_auto_contract_block(
                      n1, bf, ck, k, 128,
                      out_bufs=3 if flip_out else 1,
                      budget=14e6 if flip_out else None)
                  if pref_c is None else _pick_block(n1, pref_c, 128))
            if bc:
                break
            nxt = _pick_block(n0, bf // 2, 8)
            if nxt == bf:
                break
            bf = nxt
        if not bc:
            bc = _pick_block(n1, 512, 128)
        assert bf and bc, (V8.shape, "not blockable")
        grid = (n0 // bf, n1 // bc)
        if dq is not None:
            return pl.pallas_call(
                functools.partial(_kern_focus_rows_i8_tq, C=C),
                grid=grid,
                in_specs=[
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
                    pl.BlockSpec((k, bf), lambda i, j: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[jax.ShapeDtypeStruct((C, n0), jnp.float32),
                           jax.ShapeDtypeStruct((k, n0), jnp.float32),
                           jax.ShapeDtypeStruct((k, n0), jnp.float32)],
                scratch_shapes=[pltpu.VMEM((bf, ck), jnp.int32),
                                pltpu.VMEM((bf, k), jnp.int32)],
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary")),
            )(V8, YZ, Z, syz, sz)
        if flip_out:
            kern = (_kern_focus_rows_i8_t if int8 else
                    functools.partial(_kern_focus_rows_t,
                                      op_dtype=op_dtype))
            out_specs = [
                pl.BlockSpec((ck, bf), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, bf), lambda i, j: (0, i),
                             memory_space=pltpu.VMEM),
            ]
            out_shape = [jax.ShapeDtypeStruct((ck, n0), out_dt),
                         jax.ShapeDtypeStruct((k, n0), out_dt)]
            scratch = [pltpu.VMEM((bf, ck), out_dt),
                       pltpu.VMEM((bf, k), out_dt)]
        else:
            kern = (_kern_focus_rows_i8 if int8 else
                    functools.partial(_kern_focus_rows,
                                      op_dtype=op_dtype))
            out_specs = [
                pl.BlockSpec((bf, ck), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bf, k), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ]
            out_shape = [jax.ShapeDtypeStruct((n0, ck), out_dt),
                         jax.ShapeDtypeStruct((n0, k), out_dt)]
            scratch = []
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((bf, bc), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bc, ck), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((bc, k), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(V8, YZ, Z)
    bf = _pick_block(n1, min(pref_f, 512), 128)   # focus columns: bf=512
    # measured best (bigger strided column blocks alias HBM channels)
    # granule 256 (not 512) when flip_out shrinks the feasible set: at
    # netflix shapes the swap-scratch term rejects bc=3584 and granule
    # 512's next divisor is 1024; 256 admits 1792 (fewer accumulates)
    bc = 0
    while bf > 128:
        # out_bufs=3 under flip: int32 scratch + double-buffered output
        # tiles (see the focus-rows note); 14 MB cap for flip paths
        bc = (_auto_contract_block(n0, bf, ck, k,
                                   256 if flip_out else 512,
                                   out_bufs=3 if flip_out else 1,
                                   swap_scratch=flip_out,
                                   budget=14e6 if flip_out else None)
              if pref_c is None
              else _pick_block(n0, pref_c, 8))    # contraction rows
        if bc:
            break
        nxt = _pick_block(n1, bf // 2, 128)
        if nxt == bf:
            break
        bf = nxt
    if not bc:
        bc = _pick_block(n0, 1024, 8)
    assert bf and bc, (V8.shape, "not blockable")
    grid = (n1 // bf, n0 // bc)
    if dq is not None:
        return pl.pallas_call(
            functools.partial(_kern_focus_cols_i8_tq, C=C),
            grid=grid,
            in_specs=[
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
                pl.BlockSpec((k, bf), lambda jf, i: (0, jf),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[jax.ShapeDtypeStruct((C, n1), jnp.float32),
                       jax.ShapeDtypeStruct((k, n1), jnp.float32),
                       jax.ShapeDtypeStruct((k, n1), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((ck, bf), jnp.int32),
                            pltpu.VMEM((k, bf), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary")),
        )(V8, YZ, Z, syz, sz)
    if flip_out:
        kern = (_kern_focus_cols_i8_t if int8 else
                functools.partial(_kern_focus_cols_t, op_dtype=op_dtype))
        out_specs = [
            pl.BlockSpec((ck, bf), lambda jf, i: (0, jf),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bf), lambda jf, i: (0, jf),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [jax.ShapeDtypeStruct((ck, n1), out_dt),
                     jax.ShapeDtypeStruct((k, n1), out_dt)]
    else:
        kern = (_kern_focus_cols_i8 if int8 else
                functools.partial(_kern_focus_cols, op_dtype=op_dtype))
        out_specs = [
            pl.BlockSpec((bf, ck), lambda jf, i: (jf, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bf, k), lambda jf, i: (jf, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [jax.ShapeDtypeStruct((n1, ck), out_dt),
                     jax.ShapeDtypeStruct((n1, k), out_dt)]
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bc, bf), lambda jf, i: (i, jf),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, ck), lambda jf, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, k), lambda jf, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(V8, YZ, Z)
