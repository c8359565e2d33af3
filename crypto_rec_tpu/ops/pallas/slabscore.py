"""Fused slab-gather + dot Pallas kernel — the packed-index hot loop.

The XLA packed retrieve path (models/lsh/index.packed_retrieve_core)
gathers each query's per-table bucket windows as aligned W-row blocks into
an HBM temporary ([q_block, L*B, W, d]) and then einsums it against the
queries.  That materialization is the bottleneck: the candidate tensor is
written to HBM by the gather and read back by the einsum, tripling the
traffic of the slab bytes themselves, and the per-query matvec einsum
cannot amortize it.

This kernel removes the round trip: one loop step per QUERY — the query's
L table windows are DMA'd together (HBM -> VMEM, NBUF queries deep) and
scored with a VPU f32 multiply + lane reduce.  Only the [q, L, win] dot
products ever touch HBM; candidate row ids are recovered OUTSIDE the
kernel by gathering packed_rows at just the top-k survivors' positions
(slab_topk).

Cost model (v5e probes, benchmarks/experiments/probe_r3_*.py +
probe_r4_*.py — all wall numbers include the testbed's fixed
dispatch+sync overhead per call, measured DIRECTLY at 25.1 ms with a
trivial jitted op, probe_r4_batch.py):
  * kernel real time at the 2M bench point (q=8192, L=8, win=640):
    ~11-18 ms int8, ~17-19 ms bf16 (run-to-run tunnel variance ±15%) —
    int8's half bytes DO win inside the kernel; the end-to-end gap
    narrows because the f32-dots epilogue and dispatch are shared.  An
    MXU [L*win, d] x [d, 128] replicated-query matmul scores no faster
    than the exact-f32 VPU form (which therefore stays), and a
    block-transposed slab layout ([n_pad/128, d, 128], sublane-axis
    reduce, probe_r4_blk.py) measured only ~9% faster at identical DMA
    contiguity — not worth a second layout;
  * stage-1 selection is the epilogue wall: jax.lax.top_k lowers to a
    full sort (~43 ms real at [8192, 5120]); approx_max_k is the
    cheapest correct selector, and running it PER TABLE-WINDOW
    ([q*L, win] -> top_k, see slab_topk) keeps the exact union guarantee
    on 8x narrower rows (probe_r4_batch.py: flat 162.4k -> per-table
    173.9k q/s at q=32768).  Selector designs measured WORSE: k
    sequential max/mask in-kernel passes (434 ms, round 2); a strided
    binned top-1 reduce (probe_r3_binned.py: recall 0.9997 -> 0.974);
    an XLA group-max pre-reduction over 8/16/32-lane groups
    (probe_r4_select.py: recall COLLAPSES to 0.50/0.41/0.35 — LSH
    near-ties are adjacent in their bucket's CSR run, so one group
    shadows all but one);
  * throughput is batch-sensitive purely through the 25 ms dispatch:
    q=8192 -> 121k q/s, q=32768 -> 174k q/s (int8, recall 0.9998) at an
    identical ~200k q/s dispatch-free rate (probe_r4_batch.py);
  * bandwidth decomposition (probe_r5_kernel.py, v5e 2M point, q=32768,
    int8, win=640): the RAW kernel streams 21.5 GB of slab reads in
    75 ms = 285 GB/s, ~35% of v5e HBM — the kernel was never the round-4
    "20% of HBM" term; the gap to wall time is the selection epilogue
    (stage-1 + dedup ~47 ms) and the 25 ms testbed dispatch.  Negative
    result: deeper DMA pipelining is a no-op (nbuf 4/8/12 within 1.2%,
    q_tile 16 vs 32 within 1%) — the pipeline is already bandwidth-bound,
    so further kernel work should target the epilogue, not the DMAs.
    kernel+stage1 wall 122 ms -> 268k q/s dispatch-inclusive, ~338k
    dispatch-free at the measured 25 ms.  Negative result #2
    (probe_r5_int4.py, same point): NIBBLE-PACKED int4 slabs (two CSR
    rows per byte, half the DMA bytes, VPU unpack in-kernel) measured
    84.4 ms raw vs int8's 84.8 — DMA bytes are NOT the binding
    constraint at this window size (the VPU multiply+reduce work is
    unchanged and absorbs the saved bandwidth), and int4's global-scale
    quantization noise (~0.016 on a unit dot) is comparable to the
    2M clustered corpus's planted-vs-sibling margin, collapsing
    recall@10 0.9998 -> 0.30.  int8 global-scale is the speed-of-light
    dtype for this kernel form; don't revisit narrower slabs without an
    exact-rerank design that avoids the [q, survivors, d] gather;
  * window masking is OFF on the production path ("maskless"): the
    out-of-window lanes of the aligned overfetch are real neighboring
    CSR rows — scoring them is free multiprobe (recall 0.9993 -> 0.9997
    at the 2M bench point) and skipping the mask removes an in-register
    pass whose concat form cost ~45 ms.  Pad-sentinel rows are killed by
    id in the dedup stage.  strict=True restores exact reference window
    semantics for parity tests.

Mosaic constraint that shaped the design: a dynamic-start HBM->VMEM DMA
must start at a sublane-tile boundary (8 rows f32 / 16 bf16 / 32 int8).
Window starts are therefore aligned DOWN to _ALIGN=32 rows host-side (the
`pl.multiple_of` hint carries the proof into the kernel) and the window is
widened by one extra 128 block; a per-window `head` offset masks the
[0, head) prefix.

Supports bf16 slabs and GLOBAL-scale int8 slabs (pack_index
scale_mode="global" — one scalar scale, raw dots order-preserving; the
caller dequantizes just the top-k SCORES with the stored scalar; half
the DMA bytes of bf16).  Per-row-scale int8 keeps
the XLA path (a [win, 1] f32 scale DMA is not lane-tileable).  Cosine
only: rows are pre-normalized by pack_index, so the dot IS the
similarity.  Reference semantics mirrored: one window per hash table per
query, L-table union downstream
(/root/reference/lib/lsh_cube.hpp:77-106).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALIGN = 32  # covers the sublane tile of f32 (8), bf16 (16), and int8 (32)

# VMEM budget for the slab pipeline scratch (the chip has ~16 MB more or
# less shared with the compiler's own buffers; leave room for the query
# tile, dots tile, and double-buffered output)
_VMEM_SCRATCH_BUDGET = 10 * 1024 * 1024


def _make_kernel(L: int, win: int, d: int, qt: int, nbuf: int = 4,
                 unroll: int = 1, mask: bool = True):
    """Fallback form: one loop step per (query, table) WINDOW — L-times
    less VMEM scratch than the fused form (one [win, d] slot per buffer),
    used when the fused pipeline would overflow the VMEM budget.  VPU f32
    scoring, in-register window masking.

    Hardware record (v5e, 2026-08-21, 2M bench point, maskless + approx
    epilogue): 55.6k q/s vs the fused form's 99.2k — functional and
    within 1.8x, so the VMEM escape hatch is a measured path, not an
    untested branch."""
    def kernel(meta_ref, packed_hbm, q_ref, dots_ref, slab, sem_s):
        total = qt * L

        def dma(slot, w):
            qi = w // L
            l = w % L
            start = pl.multiple_of(meta_ref[qi, l], _ALIGN)
            return pltpu.make_async_copy(
                packed_hbm.at[pl.ds(start, win), :],
                slab.at[slot], sem_s.at[slot],
            )

        # warm-up: fill the pipeline
        def warm(w, _):
            dma(w % nbuf, w).start()
            return 0

        depth = min(nbuf - 1, total)
        jax.lax.fori_loop(0, depth, warm, 0, unroll=True)

        def step(w, _):
            @pl.when(w + depth < total)
            def _():
                dma((w + depth) % nbuf, w + depth).start()

            slot = w % nbuf
            dma(slot, w).wait()
            qi = w // L
            l = w % L
            x = slab[slot]                                   # [win, d]
            # VPU f32 multiply + lane reduce.  An MXU matvec would need a
            # [d, 1] rhs, and Mosaic (libtpu 2026-08-21) rejects both the
            # (d,) -> (d, 1) vector reshape and 1-D-rhs tpu.matmul; the VPU
            # form is legal, and exact-f32 (vs the matvec's bf16 products).
            vec = q_ref[qi, :]                               # [d] f32
            dots = jnp.sum(
                x.astype(jnp.float32) * vec[None, :], axis=1
            )                                                # [win]
            if mask:
                head = meta_ref[qi, L + l]
                size = meta_ref[qi, 2 * L + l]
                lane = jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)[:, 0]
                valid = (lane >= head) & (lane < head + size)
                dots = jnp.where(valid, dots, -jnp.inf)
            dots_ref[qi, l, :] = dots
            return 0

        # Mosaic supports only unroll=1 or a FULL unroll of the loop
        jax.lax.fori_loop(
            0, total, step, 0, unroll=(total if unroll else 1)
        )

    return kernel


def _make_kernel_fused(L: int, win: int, d: int, qt: int, nbuf: int = 4,
                       mask: bool = False):
    """One loop step per QUERY: the L table windows are DMA'd together into
    one [L, win, d] slot and scored with a VPU f32 multiply + lane reduce.

    Rationale (v5e probes): at constant scored bytes, halving the window
    count raised q/s 1.4x — the per-window kernel is bound by
    per-iteration overhead (scalar-core address math, DMA wait
    bookkeeping), not by DMA bytes.  Fusing the L windows of a query cuts
    loop iterations by L while keeping the DMA pipeline depth (all L
    copies are in flight at once, nbuf queries deep).

    mask=False (production) emits raw dots for every lane of the aligned
    window — out-of-window lanes are real neighboring CSR rows, i.e. free
    multiprobe (see module docstring).  mask=True restores exact window
    semantics in-register (strict/parity mode).
    """
    def kernel(meta_ref, packed_hbm, q_ref, dots_ref, slab, sem_s):
        def dma(slot, qi, l):
            start = pl.multiple_of(meta_ref[qi, l], _ALIGN)
            return pltpu.make_async_copy(
                packed_hbm.at[pl.ds(start, win), :],
                slab.at[slot, l], sem_s.at[slot, l],
            )

        def issue(slot, qi):
            for l in range(L):
                dma(slot, qi, l).start()

        depth = min(nbuf - 1, qt)
        for pre in range(depth):
            issue(pre, pre)

        def step(qi, _):
            @pl.when(qi + depth < qt)
            def _():
                issue((qi + depth) % nbuf, qi + depth)

            slot = qi % nbuf
            for l in range(L):
                dma(slot, qi, l).wait()
            x = slab[slot].reshape(L * win, d)
            # VPU f32 multiply + lane reduce (see _make_kernel: Mosaic on
            # this toolchain rejects every 1-column MXU matvec form)
            vec = q_ref[qi, :]                               # [d] f32
            dots = jnp.sum(
                x.astype(jnp.float32) * vec[None, :], axis=1
            ).reshape(L, win)                                # [L, win]
            if mask:
                # in-register window mask: lane j of table l is valid iff
                # head <= j < head + size (head/size are SMEM scalars;
                # each table row is masked separately and the f32 rows
                # concatenated — Mosaic rejects concatenating i1 masks)
                lane = jax.lax.broadcasted_iota(jnp.int32, (1, win), 1)
                rows = []
                for l in range(L):
                    head_l = meta_ref[qi, L + l]
                    size_l = meta_ref[qi, 2 * L + l]
                    valid_l = (lane >= head_l) & (lane < head_l + size_l)
                    rows.append(
                        jnp.where(valid_l, dots[l:l + 1], -jnp.inf)
                    )
                dots = jnp.concatenate(rows, axis=0)         # [L, win]
            dots_ref[qi] = dots
            return 0

        jax.lax.fori_loop(0, qt, step, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("per_table", "q_tile", "interpret", "unroll", "fuse_l",
                     "nbuf", "mask", "shared_slab"),
)
def slab_window_dots(
    packed: jax.Array,           # [L, n_pad, d] bf16/int8 CSR-ordered slabs
    packed_scale: Optional[jax.Array],  # [L, n_pad] f32 (int8 slabs only)
    starts: jax.Array,           # [q, L] int32 window starts within a table
    sizes: jax.Array,            # [q, L] int32 valid rows per window
    queries: jax.Array,          # [q, d] f32, pre-normalized for cosine
    per_table: int,
    q_tile: int = 16,
    interpret: bool = False,
    unroll: int = 1,
    fuse_l: bool = True,
    nbuf: int = 4,
    mask: bool = True,
    shared_slab: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """-> (dots [q, L, win] f32, aligned window starts [q, L] int32,
           LOCAL to each table).

    shared_slab=True: `packed` is ONE slab ([1, n_pad, d]) and every one
    of the starts.shape[1] windows reads it — the hypercube form, where a
    query's `probes` vertex windows all live in the single vertex-CSR
    slab (window t of the LSH form reads slab t instead).

    win = (per_table + _ALIGN) rounded up to a 128 lane multiple.  With
    mask=True the valid rows of window (q, l) sit at lanes
    [head, head + size) where head = starts - aligned_starts < _ALIGN and
    out-of-window lanes are -inf — exactly the per_table window semantics
    of packed_retrieve_core.  With mask=False every lane carries its raw
    dot (aligned-overfetch multiprobe; see module docstring) — only
    pad-sentinel rows need downstream id masking.  Lane j of table l
    holds the dot against CSR position aligned_starts[q, l] + j — feed
    the pair to slab_topk to recover row ids for the survivors.

    The fused form's VMEM scratch is nbuf*L*win*d slab bytes; when that
    exceeds the budget the call automatically shrinks nbuf (floor 2) and
    then falls back to the per-window kernel (L-times less scratch).
    """
    n_pad, d = packed.shape[1], packed.shape[2]
    L = starts.shape[1] if shared_slab else packed.shape[0]
    if shared_slab and packed.shape[0] != 1:
        raise ValueError("shared_slab expects packed [1, n_pad, d]")
    if shared_slab and packed_scale is not None:
        raise ValueError("shared_slab covers scale-free slabs only")
    q = queries.shape[0]
    win = (per_table + _ALIGN + 127) // 128 * 128
    if n_pad < win:
        raise ValueError(f"window {win} exceeds packed length {n_pad}")
    if unroll != 1 and fuse_l:
        raise ValueError(
            "unroll applies only to the per-window kernel; pass fuse_l=False"
        )
    itemsize = jnp.dtype(packed.dtype).itemsize
    if fuse_l:
        # VMEM guard (fused scratch = nbuf * L * win * d slab bytes):
        # shrink the pipeline before giving up on the fused form
        while nbuf > 2 and nbuf * L * win * d * itemsize > _VMEM_SCRATCH_BUDGET:
            nbuf -= 1
        if nbuf * L * win * d * itemsize > _VMEM_SCRATCH_BUDGET:
            fuse_l = False
            nbuf = 4
    if not fuse_l and nbuf * win * d * itemsize > _VMEM_SCRATCH_BUDGET:
        raise ValueError(
            f"slab window {win}x{d} ({itemsize}B) exceeds the VMEM scratch "
            f"budget even unfused; reduce per_table"
        )
    # int8 with packed_scale=None is the GLOBAL-scale layout (pack_index
    # scale_mode="global"): one scalar scale for the whole index, so the
    # raw dots are order-preserving and need no dequant — callers rerank
    # the survivors exactly in f32.  Per-row scale gets the XLA epilogue.

    # align starts down to the DMA tile; clamp so start + win stays in range
    aligned = jnp.minimum((starts // _ALIGN) * _ALIGN, n_pad - win)
    head = starts - aligned
    size = jnp.minimum(jnp.minimum(sizes, per_table), win - head)

    pad_q = (-q) % q_tile
    if pad_q:
        aligned = jnp.pad(aligned, ((0, pad_q), (0, 0)))
        head = jnp.pad(head, ((0, pad_q), (0, 0)))
        size = jnp.pad(size, ((0, pad_q), (0, 0)))
        queries = jnp.pad(queries, ((0, pad_q), (0, 0)))
    qp = q + pad_q

    # absolute row offsets into the flattened [L * n_pad, d] slab array;
    # n_pad is a 512 multiple (pack_index), so the l * n_pad shift keeps
    # the _ALIGN divisibility proof intact (shared_slab: all windows read
    # the one slab, offset 0)
    l_off = (
        jnp.zeros((L,), jnp.int32) if shared_slab
        else jnp.arange(L, dtype=jnp.int32) * n_pad
    )
    meta = jnp.concatenate(
        [aligned + l_off[None, :], head, size], axis=1
    ).astype(jnp.int32)                                   # [qp, 3L]

    if fuse_l:
        kernel = _make_kernel_fused(L, win, d, q_tile, nbuf, mask)
        scratch = [
            pltpu.VMEM((nbuf, L, win, d), packed.dtype),
            pltpu.SemaphoreType.DMA((nbuf, L)),
        ]
    else:
        nbuf = max(nbuf, 2 * unroll)
        kernel = _make_kernel(L, win, d, q_tile, nbuf, unroll, mask)
        scratch = [
            pltpu.VMEM((nbuf, win, d), packed.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ]
    dots = pl.pallas_call(
        kernel,
        grid=(qp // q_tile,),
        in_specs=[
            pl.BlockSpec((q_tile, 3 * L), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((q_tile, d), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((q_tile, L, win), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((qp, L, win), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(
        meta,
        packed.reshape(-1, d),
        queries.astype(jnp.float32),
    )
    dots = dots[:q]
    aligned = aligned[:q]

    if packed_scale is not None:
        # Per-row dequant applied OUTSIDE the kernel: a [win, 1] f32 DMA is
        # not lane-tileable on TPU (Mosaic requires 128-aligned slices in
        # the last dim), so the scale windows are gathered in XLA as
        # _ALIGN-row blocks — aligned starts make the block cover exact.
        # Masked lanes stay -inf (scale > 0 everywhere, pad scale = 1).
        nblk = n_pad // _ALIGN
        l_blk = (jnp.arange(L, dtype=jnp.int32) * nblk)[None, :, None]
        bidx = l_blk + (aligned // _ALIGN)[:, :, None] + jnp.arange(
            win // _ALIGN, dtype=jnp.int32
        )                                                  # [q, L, win/ALIGN]
        scale_win = packed_scale.reshape(L * nblk, _ALIGN)[bidx].reshape(
            q, L, win
        )
        dots = dots * scale_win
    return dots, aligned


def _dedup_topk_pairs(
    scores: jax.Array,   # [q, m] with -inf pads
    ids: jax.Array,      # [q, m] with sentinel >= n_rows on pads
    n_rows: int,
    top_k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Sort-dedup (score, id) pairs by id and re-select top_k — the same
    stage-2 epilogue as packed_retrieve_core.

    One multi-operand lax.sort carries the score payload THROUGH the id
    sort instead of argsort + take_along_axis: TPU random gathers run at
    ~100M elem/s, and the three [q, m] payload gathers were the single
    largest term of the 32k-batch epilogue (probe_r4_epilogue.py: dedup
    stage 66.5 ms before, ids-gather 25 ms — the pipeline is
    gather-bound, not sort-bound)."""
    q = scores.shape[0]
    raw_sorted, s_sorted = jax.lax.sort((ids, scores), num_keys=1)
    dup = jnp.concatenate(
        [jnp.zeros((q, 1), bool), raw_sorted[:, 1:] == raw_sorted[:, :-1]],
        axis=1,
    )
    s_sorted = jnp.where(
        dup | (raw_sorted >= n_rows) | ~jnp.isfinite(s_sorted),
        -jnp.inf, s_sorted,
    )
    s2, pos2 = jax.lax.top_k(s_sorted, top_k)
    ids_sorted = jnp.minimum(raw_sorted, n_rows - 1)
    out_ids = jnp.where(
        s2 > -jnp.inf, jnp.take_along_axis(ids_sorted, pos2, axis=1), -1
    )
    return s2, out_ids


def slab_topk(
    dots: jax.Array,          # [q, L, win] from slab_window_dots
    aligned_starts: jax.Array,  # [q, L] local CSR positions of lane 0
    packed_rows: jax.Array,   # [L, n_pad] int32 CSR-ordered row ids
    n_rows: int,
    top_k: int,
    exact: bool = True,
    stage1_width: int = 0,
    stage1_per_table: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Two-stage dedup top-k over kernel dots.

    Stage 1 (exact=False, production) selects PER TABLE-WINDOW: an
    approx_max_k of top_k lanes over each [win] row of the [q*L, win]
    reshape.  Rows within one window are DISTINCT corpus rows (a row
    appears once per table), so if >= top_k lanes beat a lane in its own
    window, >= top_k distinct rows beat it globally — the union of
    per-window top-k's provably contains the global dedup top-k, the same
    worst-case guarantee as a flat L*top_k selection.  The per-table form
    runs the selector on win-wide rows instead of L*win-wide ones
    (probe_r4_batch.py, v5e 2M point: flat 162.4k -> per-table 173.9k q/s
    at q=32768, recall identical at 0.9998).  Stage 2 gathers the
    survivors' row ids from packed_rows and sort-dedups to the final
    top_k.

    NOT viable instead (probe_r4_select.py): any segmented pre-max along
    the CSR lane axis (group-max G=8/16/32) collapses recall 0.9997 ->
    0.50/0.41/0.35 — near-ties are ADJACENT in their bucket's CSR run in
    every table, so one group shadows all but one of them.  Co-location
    of near neighbors is intrinsic to LSH layouts; don't revisit.

    exact=True keeps the bit-stable flat lax.top_k sort form for parity
    tests (on TPU it lowers to a full variadic sort, ~43 ms real at the
    2M bench shapes — probe_r3_approx.py).

    stage1_width (approx flat form only) caps the stage-1 survivor count
    below the L*top_k worst-case guarantee; at the 2M bench point top-20
    retrieval with stage1_width=96 measured the SAME planted recall as
    the full 160 at 1.5x the q/s.  When set, the flat selector is used.

    stage1_per_table overrides the per-table selector's per-window kk
    BELOW top_k (keeps the cheap win-wide selector rows while relaxing the
    containment guarantee from top_k to kk) — the top-P>10 CF form, where
    rank-P-tail neighbor weights tolerate approximation.  Takes precedence
    over stage1_width.

    -> (scores [q, top_k] descending, row ids [q, top_k], -1 pad)."""
    q, L, win = dots.shape
    n_pad = packed_rows.shape[1]
    if not exact and (stage1_per_table or not stage1_width):
        # per-table stage 1 (see docstring guarantee); kk floor keeps
        # L * kk >= top_k so stage 2 can still emit top_k survivors
        kk = min(max(stage1_per_table or top_k, -(-top_k // L)), win)
        rows = dots.reshape(q * L, win)
        s1, lane = jax.lax.approx_max_k(rows, kk, recall_target=0.9)
        s1 = s1.reshape(q, L * kk)
        lane = lane.reshape(q, L, kk)
        gpos = (
            jnp.arange(L, dtype=jnp.int32)[None, :, None] * n_pad
            + jnp.minimum(aligned_starts[:, :, None] + lane, n_pad - 1)
        ).reshape(q, L * kk)
        ids1 = packed_rows.reshape(-1)[gpos]
        ids1 = jnp.where(s1 > -jnp.inf, ids1, n_rows)
        return _dedup_topk_pairs(s1, ids1, n_rows, top_k)
    flat = dots.reshape(q, L * win)
    m1 = min(L * top_k, L * win)
    if stage1_width:
        m1 = min(m1, max(stage1_width, top_k))
    if exact:
        s1, pos1 = jax.lax.top_k(flat, m1)             # [q, m1]
    else:
        s1, pos1 = jax.lax.approx_max_k(flat, m1, recall_target=0.9)
    l_of = pos1 // win
    lane = pos1 % win
    a0 = jnp.take_along_axis(aligned_starts, l_of, axis=1)     # [q, m1]
    gpos = l_of * n_pad + jnp.minimum(a0 + lane, n_pad - 1)
    ids1 = packed_rows.reshape(-1)[gpos]               # [q, m1]
    ids1 = jnp.where(s1 > -jnp.inf, ids1, n_rows)
    return _dedup_topk_pairs(s1, ids1, n_rows, top_k)


def packed_retrieve_pallas(
    packed: jax.Array,           # [L, n_pad, d] CSR-ordered corpus copies
    packed_rows: jax.Array,      # [L, n_pad] int32, sentinel n past the end
    packed_scale: Optional[jax.Array],  # [L, n_pad] f32 (int8 slabs)
    bucket_starts: jax.Array,    # [L, n_buckets + 1]
    n_rows: int,
    queries: jax.Array,          # [q, d]
    q_buckets: jax.Array,        # [q, L]
    top_k: int,
    per_table: int,
    q_tile: int = 16,
    interpret: bool = False,
    strict: bool = False,
    stage1_width: int = 0,
    stage1_per_table: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Pallas counterpart of packed_retrieve_core (cosine, unfiltered):
    same pseudo-random window offsets, same dedup top-k epilogue — the
    slab windows never round-trip through an HBM temporary.

    strict=False (production): maskless aligned-overfetch windows (a
    recall-superset of the reference's bucket windows) + approx stage-1
    selection — the measured-fastest correct form (module docstring).
    strict=True: exact reference window semantics + exact top_k, for
    parity against packed_retrieve_core."""
    L = packed.shape[0]
    l_idx = jnp.arange(L, dtype=jnp.int32)
    start = bucket_starts[l_idx[None, :], q_buckets]            # [q, L]
    end = bucket_starts[l_idx[None, :], q_buckets + 1]
    size = end - start
    # identical window-offset derivation to packed_retrieve_core
    golden = jnp.int32(-1640531527)
    mix = (q_buckets * golden) ^ (l_idx[None, :] * jnp.int32(40503))
    s0 = start + jnp.remainder(
        jnp.abs(mix), jnp.maximum(size - per_table, 0) + 1
    )
    sizes = jnp.minimum(end - s0, per_table)

    qv = queries.astype(jnp.float32)
    qv = qv / jnp.maximum(jnp.linalg.norm(qv, axis=1, keepdims=True), 1e-30)
    # Negative result (v5e, 2026-08-20): a kernel variant that fused the
    # per-window top-k after the dot (k sequential max/mask passes on the
    # VPU, emitting [q, L, top_k] instead of [q, L, win]) measured 434 ms vs
    # 206 ms for this dots-out + XLA-top-k form at the 2M-row bench point —
    # the serial selection stalls the MXU/DMA pipeline far longer than the
    # [q, L, win] HBM round trip it saves.  Don't re-fuse the top-k.
    dots, a0 = slab_window_dots(
        packed, packed_scale, s0, sizes, qv,
        per_table=per_table, q_tile=q_tile, interpret=interpret,
        mask=strict,
    )
    return slab_topk(dots, a0, packed_rows, n_rows, top_k, exact=strict,
                     stage1_width=stage1_width,
                     stage1_per_table=stage1_per_table)


def packed_retrieve_pallas_euclid(
    packed: jax.Array,           # [L, n_pad, d_aug] AUGMENTED slabs
    packed_rows: jax.Array,      # [L, n_pad] int32, sentinel n past the end
    packed_detailed,             # [L, n_pad] fingerprints or None
    bucket_starts: jax.Array,    # [L, n_buckets + 1]
    n_rows: int,
    d: int,                      # original (un-augmented) dimensionality
    queries: jax.Array,          # [q, d] RAW euclidean queries
    q_buckets: jax.Array,        # [q, L]
    q_detailed,                  # [q, L] fingerprints or None
    gscale,                      # f32 scalar (int8 slabs) or None (bf16)
    aug_scale: jax.Array,        # f32 scalar: the norm column's query comp
    top_k: int,
    per_table: int,
    q_tile: int = 16,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Euclidean retrieval over AUGMENTED slabs (pack_index augment=True):
    the kernel's plain dot against the augmented query [q, s, 0-pad] is
    the monotone rank x·q - |x|²/2, so euclidean rides the exact same
    maskless DMA pipeline + approx epilogue as cosine; final scores are
    -sqrt(max(|q|² - 2·rank, 0)) = -distance, computed on the top_k
    survivors only.

    Window starts jump to the query's exact-fingerprint run when the
    fingerprint plane is present (the same (bucket, fingerprint) CSR
    contract as packed_retrieve_core) — lanes past the run are the
    aligned-overfetch multiprobe bonus, scored by TRUE distance, so recall
    is a superset of the reference's filtered bucket fetch
    (/root/reference/lib/data_structures/cust_hashtable.hpp:73-103)."""
    from crypto_rec_tpu.models.lsh.index import _fp_run_starts

    L, n_pad, d_aug = packed.shape
    q = queries.shape[0]
    l_idx = jnp.arange(L, dtype=jnp.int32)
    start = bucket_starts[l_idx[None, :], q_buckets]            # [q, L]
    end = bucket_starts[l_idx[None, :], q_buckets + 1]
    size = end - start
    if packed_detailed is not None and q_detailed is not None:
        flat_fp = packed_detailed.reshape(-1)
        base = l_idx[None, :] * n_pad
        s0 = _fp_run_starts(
            lambda p: flat_fp[base + p], start, end, q_detailed, n_pad
        )
    else:
        golden = jnp.int32(-1640531527)
        mix = (q_buckets * golden) ^ (l_idx[None, :] * jnp.int32(40503))
        s0 = start + jnp.remainder(
            jnp.abs(mix), jnp.maximum(size - per_table, 0) + 1
        )
    sizes = jnp.minimum(end - s0, per_table)

    qv = queries.astype(jnp.float32)
    q_aug = jnp.concatenate(
        [
            qv,
            jnp.broadcast_to(
                jnp.asarray(aug_scale, jnp.float32), (q, 1)
            ),
            jnp.zeros((q, d_aug - d - 1), jnp.float32),
        ],
        axis=1,
    )
    dots, a0 = slab_window_dots(
        packed, None, s0, sizes, q_aug,
        per_table=per_table, q_tile=q_tile, interpret=interpret, mask=False,
    )
    rank, ids = slab_topk(dots, a0, packed_rows, n_rows, top_k, exact=False)
    if gscale is not None:
        rank = rank * gscale                       # int8: dequant the rank
    qsq = jnp.sum(qv * qv, axis=1, keepdims=True)
    score = -jnp.sqrt(jnp.maximum(qsq - 2.0 * rank, 0.0))
    return jnp.where(ids >= 0, score, -jnp.inf), ids
