"""Pallas fused distance + top-k scan kernel.

The hot serving kernel: for each (query-tile, table-tile) grid cell it
computes the MXU matmul, applies the metric epilogue, reduces each 128-lane
bin to its min (the same binned-candidate scheme as `lax.approx_min_k`), and
folds the winners into a per-query running top-k held in the revisited output
block. The [Q, N] score matrix NEVER reaches HBM — at large Q that matrix's
write+read round trip is what dominates the XLA scan path (e.g. 16384×1M
bf16 scores = 64 GB of HBM traffic per batch).

HBM traffic per search  =  read table once  +  tiny aux/in/out.

Replaces, in one fused program, what the reference does with per-thread
sorted buffers + SimSIMD microkernels (reference: include/usearch/index.hpp:
845-956 sorted_buffer_gt; index_plugins.hpp:1678-2015 metric dispatch;
index_plugins.hpp:2071-2164 exact_search_t).

Approximation contract: one candidate per 128-wide bin per table tile —
identical to `approx_min_k`'s binning; recall@k ≥ ~99.5% for k ≤ 16 at
production table sizes (collision probability ≈ C(k,2)·128/N per query).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..enums import MetricKind, ScalarKind
from .distances import MASKED

DEFAULT_Q_TILE = 512
DEFAULT_T_TILE = 2048
_LANES = 128


def _vmem_params(interpret):
    """Raise the scoped-VMEM ceiling (default 16 MB): f32 tables at the
    default tile shapes sit just past it (observed 16.25 MB at
    1M x 256 f32, Q=8192); physical VMEM is far larger."""
    if interpret:
        return None
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

#: top-k capacity of the output accumulator (one lane group)
KPAD = 128


def _epilogue(metric: MetricKind, dots, q_aux, t_aux):
    """dots [QT, T] + per-query aux [2, QT] + per-row aux [4, T] → dists."""
    dots = dots.astype(jnp.float32)
    t_sq = t_aux[0, :][None, :]
    penalty = t_aux[2, :][None, :]
    q_sq = q_aux[0, :][:, None]
    if metric == MetricKind.IP:
        d = 1.0 - dots
    elif metric == MetricKind.Cos:
        denom = jnp.sqrt(q_sq) * jnp.sqrt(t_sq)
        safe = jnp.where(denom == 0.0, 1.0, denom)
        base = 1.0 - dots / safe
        one_zero = (q_sq == 0.0) ^ (t_sq == 0.0)
        both_zero = (q_sq == 0.0) & (t_sq == 0.0)
        d = jnp.where(both_zero, 0.0, jnp.where(one_zero, 1.0, base))
    elif metric == MetricKind.L2sq:
        d = jnp.maximum(q_sq + t_sq - 2.0 * dots, 0.0)
    else:
        raise ValueError(f"pallas scan supports ip/cos/l2sq, got {metric}")
    return d + penalty


def _epilogue_t(metric: MetricKind, dots, q_aux, t_aux, shifted: bool = False):
    """Transposed epilogue: dots [T, QT] + q aux [2, QT] + row aux [4, T].

    ``shifted``: emit a per-query MONOTONE transform of the distance instead
    of the distance itself (ip/cos: drop the ``1 -`` offset; l2sq: drop the
    per-query ``q_sq`` term). Orderings — hence argmins and top-k sets — are
    unchanged, but values sit near 0 instead of near 1, where bf16's fixed
    8-bit mantissa buys ~2⁸× finer absolute resolution. Only valid when the
    selected winners are re-scored exactly afterwards (compact mode)."""
    dots = dots.astype(jnp.float32)
    if t_aux.shape[0] == 1:  # lean IP aux: penalty row only
        t_sq = None
        penalty = t_aux[0, :][:, None]
    else:
        t_sq = t_aux[0, :][:, None]
        penalty = t_aux[2, :][:, None]
    q_sq = q_aux[0, :][None, :]
    if metric == MetricKind.IP:
        d = -dots if shifted else 1.0 - dots
    elif metric == MetricKind.Cos:
        denom = jnp.sqrt(q_sq) * jnp.sqrt(t_sq)
        safe = jnp.where(denom == 0.0, 1.0, denom)
        off = 0.0 if shifted else 1.0
        base = off - dots / safe
        one_zero = (q_sq == 0.0) ^ (t_sq == 0.0)
        both_zero = (q_sq == 0.0) & (t_sq == 0.0)
        d = jnp.where(both_zero, off - 1.0, jnp.where(one_zero, off, base))
    elif metric == MetricKind.L2sq:
        if shifted:
            d = t_sq - 2.0 * dots
        else:
            d = jnp.maximum(q_sq + t_sq - 2.0 * dots, 0.0)
    else:
        raise ValueError(f"pallas scan supports ip/cos/l2sq, got {metric}")
    return d + penalty


def _make_kernel(metric: MetricKind, k: int, t_tile: int, n_t_tiles: int):
    n_bins = t_tile // _LANES

    def kernel(q_ref, q_aux_ref, tile_ref, t_aux_ref, out_d_ref, out_i_ref):
        # The output blocks are revisited across the inner (table) grid axis —
        # they double as the running top-k accumulators, no scratch needed.
        ti = pl.program_id(1)

        @pl.when(ti == 0)
        def _init():
            out_d_ref[:] = jnp.full_like(out_d_ref, MASKED)
            out_i_ref[:] = jnp.full_like(out_i_ref, -1)

        acc = jnp.int32 if q_ref.dtype == jnp.int8 else jnp.float32
        dots = jax.lax.dot_general(
            q_ref[:],
            tile_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc,
        )
        d = _epilogue(metric, dots, q_aux_ref[:], t_aux_ref[:])
        qt = d.shape[0]

        # Per-128-lane bin mins via static slices (a [qt, nb, 128] reshape
        # forces a real relayout copy on TPU — slices don't).
        bv_cols = []
        ba_cols = []
        for b in range(n_bins):
            seg = d[:, b * _LANES : (b + 1) * _LANES]
            bv_cols.append(jnp.min(seg, axis=-1))
            ba_cols.append(jnp.argmin(seg, axis=-1).astype(jnp.int32) + b * _LANES)
        bin_v = jnp.stack(bv_cols, axis=-1)  # [QT, n_bins]
        bin_i = jnp.stack(ba_cols, axis=-1) + ti * t_tile

        cand_v = jnp.concatenate([out_d_ref[:, :k], bin_v], axis=-1)  # [QT, k+n_bins]
        cand_i = jnp.concatenate([out_i_ref[:, :k], bin_i], axis=-1)

        # k-step selection: extract the min k times, masking each winner.
        width = cand_v.shape[-1]
        sel_v = []
        sel_i = []
        for _ in range(k):
            m = jnp.min(cand_v, axis=-1, keepdims=True)  # [QT, 1]
            am = jnp.argmin(cand_v, axis=-1)  # [QT]
            onehot = jax.lax.broadcasted_iota(jnp.int32, (qt, width), 1) == am[:, None]
            iv = jnp.sum(jnp.where(onehot, cand_i, 0), axis=-1)
            sel_v.append(m[:, 0])
            sel_i.append(iv)
            cand_v = jnp.where(onehot, MASKED, cand_v)
        out_d_ref[:, :k] = jnp.stack(sel_v, axis=-1)
        out_i_ref[:, :k] = jnp.stack(sel_i, axis=-1)

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 5, 6, 7, 8))
def pallas_search(
    metric: MetricKind,
    q: jnp.ndarray,          # [Q, D] storage dtype (bf16/f32/f16/i8)
    table: jnp.ndarray,      # [N, D] same dtype; N % t_tile == 0
    stats: jnp.ndarray,      # [N, 2] f32 (sqnorm, sum)
    valid: jnp.ndarray,      # [N] bool
    k: int,
    q_tile: int = DEFAULT_Q_TILE,
    t_tile: int = DEFAULT_T_TILE,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused scan: returns (dists [Q, k] f32, row ids [Q, k] i32, -1 = none)."""
    n, d_width = table.shape
    n_q = q.shape[0]
    assert n % t_tile == 0, (n, t_tile)
    assert n_q % q_tile == 0, (n_q, q_tile)
    assert k <= KPAD
    n_t_tiles = n // t_tile
    n_q_tiles = n_q // q_tile

    # per-row aux [4, N]: (sqnorm, sum, penalty, 0) — lane-major layout
    penalty = jnp.where(valid, 0.0, MASKED).astype(jnp.float32)
    t_aux = jnp.stack(
        [stats[:, 0], stats[:, 1], penalty, jnp.zeros_like(penalty)], axis=0
    )
    qf = q.astype(jnp.float32)
    q_sq = jnp.sum(qf * qf, axis=1)
    q_aux = jnp.stack([q_sq, jnp.sum(qf, axis=1)], axis=0)  # [2, Q]

    kernel = _make_kernel(metric, k, t_tile, n_t_tiles)
    grid = (n_q_tiles, n_t_tiles)

    out_d, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, d_width), lambda qi, ti: (qi, 0)),
            pl.BlockSpec((2, q_tile), lambda qi, ti: (0, qi)),
            pl.BlockSpec((t_tile, d_width), lambda qi, ti: (ti, 0)),
            pl.BlockSpec((4, t_tile), lambda qi, ti: (0, ti)),
        ],
        out_specs=[
            pl.BlockSpec((q_tile, KPAD), lambda qi, ti: (qi, 0)),
            pl.BlockSpec((q_tile, KPAD), lambda qi, ti: (qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_q, KPAD), jnp.float32),
            jax.ShapeDtypeStruct((n_q, KPAD), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=_vmem_params(interpret),
    )(q, q_aux, table, t_aux)

    d_out = out_d[:, :k]
    i_out = out_i[:, :k]
    i_out = jnp.where(d_out >= MASKED / 2, -1, i_out)
    return d_out, i_out


def _make_dma_kernel(metric: MetricKind, k: int, t_tile: int, n_t_tiles: int, merge_every: int):
    """1-D-grid kernel: one grid cell per query tile; the table streams
    through a double-buffered VMEM window via explicit DMA (the guide's
    pipeline pattern). Amortizes per-cell overhead over the whole table and
    merges candidates only every `merge_every` tiles."""
    from jax.experimental.pallas import tpu as pltpu

    assert merge_every % 2 == 0 or merge_every == 1, "even merge_every keeps DMA slots static"
    assert n_t_tiles % merge_every == 0, (n_t_tiles, merge_every)
    n_bins = t_tile // _LANES
    group_bins = n_bins * merge_every
    n_groups = n_t_tiles // merge_every

    def kernel(q_ref, q_aux_ref, table_ref, t_aux_ref, out_d_ref, out_i_ref,
               tbuf, abuf, sems):
        qt = q_ref.shape[0]

        def table_dma(slot, idx):
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(idx * t_tile, t_tile), :],
                tbuf.at[slot],
                sems.at[slot, 0],
            )

        def aux_dma(slot, idx):
            return pltpu.make_async_copy(
                t_aux_ref.at[:, pl.ds(idx * t_tile, t_tile)],
                abuf.at[slot],
                sems.at[slot, 1],
            )

        table_dma(0, 0).start()
        aux_dma(0, 0).start()

        out_d_ref[:] = jnp.full_like(out_d_ref, MASKED)
        out_i_ref[:] = jnp.full_like(out_i_ref, -1)

        # Outer loop over tile groups; the group body is unrolled so DMA
        # buffer slots and bin columns are static (merge_every even ⇒
        # (g*merge_every + j) % 2 == j % 2).
        def group(gi, _):
            base_tile = gi * merge_every
            bv_cols = []
            bi_cols = []
            for j in range(merge_every):
                if merge_every == 1:
                    # slot parity follows the (traced) group index
                    slot = jax.lax.rem(gi, 2)
                    nxt_slot = jax.lax.rem(gi + 1, 2)
                else:
                    slot = j % 2
                    nxt_slot = (j + 1) % 2
                ti = base_tile + j

                @pl.when(ti + 1 < n_t_tiles)
                def _prefetch():
                    table_dma(nxt_slot, ti + 1).start()
                    aux_dma(nxt_slot, ti + 1).start()

                table_dma(slot, ti).wait()
                aux_dma(slot, ti).wait()

                dots = jax.lax.dot_general(
                    q_ref[:],
                    tbuf[slot],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                d = _epilogue(metric, dots, q_aux_ref[:], abuf[slot])
                base_col = ti * t_tile
                for b in range(n_bins):
                    seg = d[:, b * _LANES : (b + 1) * _LANES]
                    bv_cols.append(jnp.min(seg, axis=-1))
                    bi_cols.append(
                        jnp.argmin(seg, axis=-1).astype(jnp.int32)
                        + base_col
                        + b * _LANES
                    )

            bin_v = jnp.stack(bv_cols, axis=-1)  # [QT, group_bins]
            bin_i = jnp.stack(bi_cols, axis=-1)
            cand_v = jnp.concatenate([out_d_ref[:, :k], bin_v], axis=-1)
            cand_i = jnp.concatenate([out_i_ref[:, :k], bin_i], axis=-1)
            width = cand_v.shape[-1]
            sel_v = []
            sel_i = []
            for _ in range(k):
                m = jnp.min(cand_v, axis=-1, keepdims=True)
                am = jnp.argmin(cand_v, axis=-1)
                onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, (qt, width), 1) == am[:, None]
                )
                iv = jnp.sum(jnp.where(onehot, cand_i, 0), axis=-1)
                sel_v.append(m[:, 0])
                sel_i.append(iv)
                cand_v = jnp.where(onehot, MASKED, cand_v)
            out_d_ref[:, :k] = jnp.stack(sel_v, axis=-1)
            out_i_ref[:, :k] = jnp.stack(sel_i, axis=-1)
            return 0

        jax.lax.fori_loop(0, n_groups, group, 0)

    return kernel, group_bins


@functools.partial(jax.jit, static_argnums=(0, 5, 6, 7, 8, 9))
def pallas_search_dma(
    metric: MetricKind,
    q: jnp.ndarray,
    table: jnp.ndarray,
    stats: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    q_tile: int = DEFAULT_Q_TILE,
    t_tile: int = DEFAULT_T_TILE,
    merge_every: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Double-buffered streaming variant of `pallas_search`: same results,
    table DMA'd tile-by-tile inside the kernel so the grid has only Q/q_tile
    cells and candidate merges run once per `merge_every` tiles."""
    from jax.experimental.pallas import tpu as pltpu

    n, d_width = table.shape
    n_q = q.shape[0]
    assert n % t_tile == 0 and n_q % q_tile == 0 and k <= KPAD
    n_t_tiles = n // t_tile

    penalty = jnp.where(valid, 0.0, MASKED).astype(jnp.float32)
    t_aux = jnp.stack(
        [stats[:, 0], stats[:, 1], penalty, jnp.zeros_like(penalty)], axis=0
    )
    qf = q.astype(jnp.float32)
    q_aux = jnp.stack([jnp.sum(qf * qf, axis=1), jnp.sum(qf, axis=1)], axis=0)

    kernel, group_bins = _make_dma_kernel(metric, k, t_tile, n_t_tiles, merge_every)
    grid = (n_q // q_tile,)

    out_d, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_tile, d_width), lambda qi: (qi, 0)),
            pl.BlockSpec((2, q_tile), lambda qi: (0, qi)),
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # t_aux stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((q_tile, KPAD), lambda qi: (qi, 0)),
            pl.BlockSpec((q_tile, KPAD), lambda qi: (qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_q, KPAD), jnp.float32),
            jax.ShapeDtypeStruct((n_q, KPAD), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, t_tile, d_width), table.dtype),
            pltpu.VMEM((2, 4, t_tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
        compiler_params=_vmem_params(interpret),
    )(q, q_aux, table, t_aux)

    d_out = out_d[:, :k]
    i_out = jnp.where(d_out >= MASKED / 2, -1, out_i[:, :k])
    return d_out, i_out


def _make_binned_kernel(metric: MetricKind, t_tile: int, split_dot: bool = False):
    """Merge-free cell: matmul + epilogue + per-128-lane bin min, written to
    the cell's own output slice exactly once. No accumulator revisits, no
    in-kernel selection — the cross-bin top-k runs OUTSIDE on the tiny
    [Q, N/128] surface.

    ``split_dot``: compute one [qt, 128] matmul per bin and reduce it
    immediately — the [qt, t_tile] score block never materializes in VMEM,
    which permits much larger table tiles (fewer grid cells)."""
    n_bins = t_tile // _LANES

    def kernel(q_ref, q_aux_ref, tile_ref, t_aux_ref, out_v_ref, out_i_ref):
        # outputs are [n_bins, q_tile] blocks: the lane (last) dim must be a
        # multiple of 128, which q_tile is and n_bins isn't
        ti = pl.program_id(1)
        acc = jnp.int32 if q_ref.dtype == jnp.int8 else jnp.float32
        bv = []
        bi = []
        if split_dot:
            q_aux = q_aux_ref[:]
            for b in range(n_bins):
                sl = slice(b * _LANES, (b + 1) * _LANES)
                dots_b = jax.lax.dot_general(
                    q_ref[:],
                    tile_ref[sl, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=acc,
                )
                d_b = _epilogue(metric, dots_b, q_aux, t_aux_ref[:, sl])
                bv.append(jnp.min(d_b, axis=-1))
                bi.append(jnp.argmin(d_b, axis=-1).astype(jnp.int32) + b * _LANES)
        else:
            dots = jax.lax.dot_general(
                q_ref[:],
                tile_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=acc,
            )
            d = _epilogue(metric, dots, q_aux_ref[:], t_aux_ref[:])
            for b in range(n_bins):
                seg = d[:, b * _LANES : (b + 1) * _LANES]
                bv.append(jnp.min(seg, axis=-1))
                bi.append(jnp.argmin(seg, axis=-1).astype(jnp.int32) + b * _LANES)
        out_v_ref[:] = jnp.stack(bv, axis=0)  # [n_bins, qt]
        out_i_ref[:] = jnp.stack(bi, axis=0) + ti * t_tile

    return kernel


def _make_binned_t_kernel(
    metric: MetricKind, t_tile: int, compute_bf16: bool = False, compact: bool = False
):
    """Transposed merge-free cell: the matmul emits [t_tile, qt] so each
    128-row bin is a SUBLANE group — the per-bin min/argmin reduce along the
    sublane axis after a free major-dim reshape (no lane-dim slicing, no
    stack relayout; the lane-dim variant spends ~55% of its cell time in the
    64 unrolled slice-mins).

    ``compute_bf16``: cast i8 tiles to bf16 in VMEM before the dot — i8 HBM
    traffic with bf16 MXU throughput (Mosaic's int8 matmul measured 2.6×
    slower than bf16 on v5e). ±127 products summed over ≤512 dims stay
    within bf16's 8-bit mantissa ≈ 0.4% — fine for candidate GENERATION
    (the binned approximation already tolerates more).

    ``compact``: emit bf16 bin minima and int8 WITHIN-bin argmins (0..127)
    instead of f32 + global i32 — 2× + 4× less candidate-surface HBM
    traffic. The global row id is reconstructed outside from the bin's
    position (id = bin*128 + within) and the final k winners are re-scored
    exactly in f32, so returned distances lose no precision."""
    n_bins = t_tile // _LANES

    def kernel(q_ref, q_aux_ref, tile_ref, t_aux_ref, out_v_ref, out_i_ref):
        ti = pl.program_id(1)
        qt = q_ref.shape[0]
        if compute_bf16 and q_ref.dtype != jnp.bfloat16:
            # candidate generation at bf16 MXU rate for i8 AND f32/f16
            # storage: a full-precision f32 dot runs the MXU in multi-pass
            # mode (~3-8x slower); the bf16 cast costs one VPU pass per tile
            # and the compact path re-scores the k winners exactly in f32.
            # f16 needs a two-step cast: Mosaic has no direct f16->bf16
            # (and no f16 matmul at all on this backend).
            def _bf16(x):
                if x.dtype == jnp.float16:
                    return x.astype(jnp.float32).astype(jnp.bfloat16)
                return x.astype(jnp.bfloat16)

            lhs, rhs, acc = _bf16(tile_ref[:]), _bf16(q_ref[:]), jnp.float32
        else:
            lhs, rhs = tile_ref[:], q_ref[:]
            acc = jnp.int32 if q_ref.dtype == jnp.int8 else jnp.float32
        dots = jax.lax.dot_general(
            lhs,
            rhs,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc,
        )  # [t_tile, qt]
        d = _epilogue_t(metric, dots, q_aux_ref[:], t_aux_ref[:], shifted=compact)
        d3 = d.reshape(n_bins, _LANES, qt)  # major-dim split: no relayout
        within = jnp.argmin(d3, axis=1).astype(jnp.int32)  # [n_bins, qt]
        if compact:
            out_v_ref[:] = jnp.min(d3, axis=1).astype(jnp.bfloat16)
            out_i_ref[:] = within.astype(jnp.int8)
        else:
            out_v_ref[:] = jnp.min(d3, axis=1)
            base = jax.lax.broadcasted_iota(jnp.int32, (n_bins, qt), 0) * _LANES
            out_i_ref[:] = within + base + ti * t_tile

    return kernel


def _rescore_exact(metric, q, q_aux, table, stats, valid, ids):
    """Exact f32 distances for [Q, k] candidate row ids + ascending re-sort.

    Restores full precision after bf16 candidate selection: gathers the k
    winner rows (tiny — Q·k rows), recomputes the metric in f32, and sorts.
    """
    rows = table[ids].astype(jnp.float32)  # [Q, k, W]
    qf = q.astype(jnp.float32)  # [Q, W]
    # HIGHEST: the contract is full-precision rescoring — default matmul
    # precision truncates f32 operands to bf16 passes (distances._dot rule)
    dots = jnp.einsum("qkw,qw->qk", rows, qf, precision=jax.lax.Precision.HIGHEST)
    t_sq = stats[ids, 0]  # [Q, k]
    q_sq = q_aux[0, :][:, None]  # [Q, 1]
    if metric == MetricKind.IP:
        d = 1.0 - dots
    elif metric == MetricKind.Cos:
        denom = jnp.sqrt(q_sq) * jnp.sqrt(t_sq)
        safe = jnp.where(denom == 0.0, 1.0, denom)
        base = 1.0 - dots / safe
        one_zero = (q_sq == 0.0) ^ (t_sq == 0.0)
        both_zero = (q_sq == 0.0) & (t_sq == 0.0)
        d = jnp.where(both_zero, 0.0, jnp.where(one_zero, 1.0, base))
    else:  # L2sq
        d = jnp.maximum(q_sq + t_sq - 2.0 * dots, 0.0)
    d = d + jnp.where(valid[ids], 0.0, MASKED)
    order = jnp.argsort(d, axis=1)
    return jnp.take_along_axis(d, order, axis=1), jnp.take_along_axis(ids, order, axis=1)


@functools.partial(jax.jit, static_argnums=(0, 5, 6, 7, 8, 9, 10, 11, 12, 13))
def pallas_search_binned(
    metric: MetricKind,
    q: jnp.ndarray,
    table: jnp.ndarray,
    stats: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    q_tile: int = DEFAULT_Q_TILE,
    t_tile: int = 4096,
    interpret: bool = False,
    split_dot: bool = False,
    transposed: bool = False,
    compute_bf16: bool = False,
    compact: bool = False,
    oversample: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused scan, merge-free variant: the kernel emits per-bin minima
    [Q, N/128] (128× smaller than the score matrix) and one `approx_min_k`
    outside selects the global top-k. Same binned-approximation contract as
    `lax.approx_min_k`. ``oversample`` (compact mode only) selects that
    multiple of k candidates for the exact rescore."""
    n, d_width = table.shape
    n_q = q.shape[0]
    assert n % t_tile == 0 and n_q % q_tile == 0
    n_t_tiles = n // t_tile
    n_q_tiles = n_q // q_tile
    n_bins = t_tile // _LANES
    total_bins = n // _LANES

    penalty = jnp.where(valid, 0.0, MASKED).astype(jnp.float32)
    if metric == MetricKind.IP and transposed:
        # lean aux: IP's epilogue uses only the penalty row — a [1, N]
        # surface instead of [4, N] (saves 1.2 GB of HBM at 100M rows)
        t_aux = penalty[None, :]
        aux_rows = 1
    else:
        t_aux = jnp.stack(
            [stats[:, 0], stats[:, 1], penalty, jnp.zeros_like(penalty)], axis=0
        )
        aux_rows = 4
    qf = q.astype(jnp.float32)
    q_aux = jnp.stack([jnp.sum(qf * qf, axis=1), jnp.sum(qf, axis=1)], axis=0)

    assert not (compact and not transposed), "compact requires transposed=True"
    kernel = (
        _make_binned_t_kernel(metric, t_tile, compute_bf16, compact)
        if transposed
        else _make_binned_kernel(metric, t_tile, split_dot)
    )
    v_dtype = jnp.bfloat16 if compact else jnp.float32
    i_dtype = jnp.int8 if compact else jnp.int32
    out_v, out_i = pl.pallas_call(
        kernel,
        grid=(n_q_tiles, n_t_tiles),
        in_specs=[
            pl.BlockSpec((q_tile, d_width), lambda qi, ti: (qi, 0)),
            pl.BlockSpec((2, q_tile), lambda qi, ti: (0, qi)),
            pl.BlockSpec((t_tile, d_width), lambda qi, ti: (ti, 0)),
            pl.BlockSpec((aux_rows, t_tile), lambda qi, ti: (0, ti)),
        ],
        out_specs=[
            pl.BlockSpec((n_bins, q_tile), lambda qi, ti: (ti, qi)),
            pl.BlockSpec((n_bins, q_tile), lambda qi, ti: (ti, qi)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((total_bins, n_q), v_dtype),
            jax.ShapeDtypeStruct((total_bins, n_q), i_dtype),
        ],
        interpret=interpret,
        compiler_params=_vmem_params(interpret),
    )(q, q_aux, table, t_aux)

    if compact:
        # OVERSAMPLE the candidate pool before the exact rescore: bf16 bin
        # minima can misrank candidates whose true distances differ by less
        # than bf16's resolution, and bins collide at rate ~C(k,2)·128/N —
        # selecting 4k bins and keeping the exact-rescored top k recovers
        # both losses for a ~Q·3k·row gather (≪ one table read)
        kk = min(max(oversample, 1) * k, 4 * _LANES, total_bins)
        _, sel = jax.lax.approx_min_k(out_v.T, kk)  # bf16 in, no f32 copy
        sel = sel.astype(jnp.int32)
        within = jnp.take_along_axis(out_i.T.astype(jnp.int32), sel, axis=1)
        ids = sel * _LANES + within
        d_out, i_out = _rescore_exact(metric, q, q_aux, table, stats, valid, ids)
        return d_out[:, :k], jnp.where(
            d_out[:, :k] >= MASKED / 2, -1, i_out[:, :k]
        )

    d_sel, sel = jax.lax.approx_min_k(out_v.T, k)
    i_sel = jnp.take_along_axis(out_i.T, sel.astype(jnp.int32), axis=1)
    i_sel = jnp.where(d_sel >= MASKED / 2, -1, i_sel)
    return d_sel, i_sel


def _make_binned_t_min_kernel(metric: MetricKind, t_tile: int):
    """Minima-only transposed cell for the EXACT path: emits per-128-row-bin
    minima [n_bins, qt] and nothing else — the bin ARGmins are not needed
    (winning bins are fully rescored outside), which halves the candidate
    surface's HBM traffic vs the approx kernel."""
    n_bins = t_tile // _LANES

    def kernel(q_ref, q_aux_ref, tile_ref, t_aux_ref, out_v_ref):
        qt = q_ref.shape[0]
        acc = jnp.int32 if q_ref.dtype == jnp.int8 else jnp.float32
        lhs, rhs = tile_ref[:], q_ref[:]
        if lhs.dtype == jnp.float16:  # Mosaic has no f16 matmul: widen
            lhs, rhs = lhs.astype(jnp.float32), rhs.astype(jnp.float32)
        dots = jax.lax.dot_general(
            lhs,
            rhs,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc,
        )  # [t_tile, qt]
        d = _epilogue_t(metric, dots, q_aux_ref[:], t_aux_ref[:])
        out_v_ref[:] = jnp.min(d.reshape(n_bins, _LANES, qt), axis=1)

    return kernel


#: extra bins selected beyond k in the exact path — absorbs f32 accumulation-
#: order epsilons between the kernel's bin minima and the rescore arithmetic
#: (for i8 the int32 dot is exact on both sides and the slack is free margin)
_EXACT_BIN_SLACK = 4
#: query-chunk HBM budget for the rescore gather tensor [chunk, b, 128, D]
_RESCORE_BUDGET = 128 * 1024 * 1024


def _select_bins_exact(bv, b: int, m: int = 4):
    """EXACT top-b bin selection over [Q, n_bins] minima.

    Fast path: per-lane top-m extraction (staged_topk's stage 1). That hides
    a true top-b bin only if >m of them share a lane (bin_id % 128). The miss
    is DETECTED, not assumed away: τ = b-th best survivor; a hidden bin's
    value is ≥ its lane's m-th extracted value, so if every lane's m-th
    extracted value is > τ nothing better than the survivors is hidden and
    the survivor top-b is exact. Otherwise fall back to full `lax.top_k`
    (compiled but ~never executed; triggers on adversarial layouts/ties)."""
    n_q, n_bins = bv.shape
    ids = jnp.broadcast_to(jnp.arange(n_bins, dtype=jnp.int32)[None, :], bv.shape)
    s = n_bins // 128
    if n_bins % 128 or s < 2 * m or b > m * 128:
        neg, sel = jax.lax.top_k(-bv, b)
        return -neg, jnp.take_along_axis(ids, sel, axis=1)

    d3 = bv.reshape(n_q, s, 128)
    i3 = ids.reshape(n_q, s, 128)
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (n_q, s, 128), 1)
    vals, idl = [], []
    for _ in range(m):
        am = jnp.argmin(d3, axis=1)
        vals.append(jnp.min(d3, axis=1))
        idl.append(jnp.take_along_axis(i3, am[:, None, :], axis=1)[:, 0])
        d3 = jnp.where(sub_iota == am[:, None, :], MASKED, d3)
    lane_mth = vals[-1]  # [n_q, 128]: worst extracted per lane
    d_small = jnp.stack(vals, axis=1).reshape(n_q, m * 128)
    i_small = jnp.stack(idl, axis=1).reshape(n_q, m * 128)
    neg, sel = jax.lax.top_k(-d_small, b)
    d_sel = -neg
    i_sel = jnp.take_along_axis(i_small, sel, axis=1)
    tau = d_sel[:, -1]  # b-th best survivor per query
    exact_ok = jnp.all(jnp.min(lane_mth, axis=1) > tau)

    def full(_):
        negf, self_ = jax.lax.top_k(-bv, b)
        return -negf, jnp.take_along_axis(ids, self_, axis=1)

    return jax.lax.cond(exact_ok, lambda _: (d_sel, i_sel), full, None)


@functools.partial(jax.jit, static_argnums=(0, 5, 6, 7, 8))
def pallas_search_exact(
    metric: MetricKind,
    q: jnp.ndarray,
    table: jnp.ndarray,
    stats: jnp.ndarray,
    valid: jnp.ndarray,
    k: int,
    q_tile: int = DEFAULT_Q_TILE,
    t_tile: int = 4096,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """EXACT fused top-k: binned-minima kernel → top-(k+slack) bins → full
    rescore of the selected bins' rows.

    Exactness: any row with distance < d_(k) (the true k-th smallest) makes
    its 128-row bin's minimum < d_(k); a bin outside the top-k bins by
    minimum therefore holds no top-k row, so rescoring every row of the
    selected bins recovers the exact result (bin selection itself is
    miss-detected, see `_select_bins_exact`; the slack absorbs accumulation-
    order epsilons). Replaces the reference's exact mode
    (index.hpp:4251-4268 search_exact_ / index_plugins.hpp:2071 exact_search_t)
    at scan speed instead of sort speed: HBM traffic = one table read + a
    [N/128, Q] f32 candidate surface + a Q·(k+slack)·128-row block gather.
    """
    n, d_width = table.shape
    n_q = q.shape[0]
    assert n % t_tile == 0 and n_q % q_tile == 0
    n_bins = t_tile // _LANES
    total_bins = n // _LANES

    penalty = jnp.where(valid, 0.0, MASKED).astype(jnp.float32)
    if metric == MetricKind.IP:
        t_aux = penalty[None, :]
        aux_rows = 1
    else:
        t_aux = jnp.stack(
            [stats[:, 0], stats[:, 1], penalty, jnp.zeros_like(penalty)], axis=0
        )
        aux_rows = 4
    qf = q.astype(jnp.float32)
    q_sq = jnp.sum(qf * qf, axis=1)
    q_aux = jnp.stack([q_sq, jnp.sum(qf, axis=1)], axis=0)

    kernel = _make_binned_t_min_kernel(metric, t_tile)
    out_v = pl.pallas_call(
        kernel,
        grid=(n_q // q_tile, n // t_tile),
        in_specs=[
            pl.BlockSpec((q_tile, d_width), lambda qi, ti: (qi, 0)),
            pl.BlockSpec((2, q_tile), lambda qi, ti: (0, qi)),
            pl.BlockSpec((t_tile, d_width), lambda qi, ti: (ti, 0)),
            pl.BlockSpec((aux_rows, t_tile), lambda qi, ti: (0, ti)),
        ],
        out_specs=pl.BlockSpec((n_bins, q_tile), lambda qi, ti: (ti, qi)),
        out_shape=jax.ShapeDtypeStruct((total_bins, n_q), jnp.float32),
        interpret=interpret,
        compiler_params=_vmem_params(interpret),
    )(q, q_aux, table, t_aux)

    b = min(k + _EXACT_BIN_SLACK, total_bins)
    _, bins = _select_bins_exact(out_v.T, b)  # [Q, b] bin ids

    # Rescore all rows of the selected bins exactly, in query chunks sized to
    # a fixed gather budget (the [chunk, b, 128, D] tensor is the big one).
    tblk = table.reshape(total_bins, _LANES, d_width)
    vblk = valid.reshape(total_bins, _LANES)
    sblk = stats[:, 0].reshape(total_bins, _LANES)
    row_bytes = d_width * table.dtype.itemsize + 8
    chunk = int(np.clip(_RESCORE_BUDGET // max(b * _LANES * row_bytes, 1), 8, 512))
    chunk = min(chunk, n_q)
    n_chunks = (n_q + chunk - 1) // chunk
    pad = n_chunks * chunk - n_q
    if pad:
        q = jnp.concatenate([q, q[:pad]])
        q_sq = jnp.concatenate([q_sq, q_sq[:pad]])
        bins = jnp.concatenate([bins, bins[:pad]])

    q_c = q.reshape(n_chunks, chunk, -1)
    qs_c = q_sq.reshape(n_chunks, chunk)
    b_c = bins.reshape(n_chunks, chunk, b)
    width = b * _LANES

    def one_chunk(args):
        qc, qsq, bc = args
        rows = tblk[bc].reshape(chunk, width, d_width)  # block gather
        ok = vblk[bc].reshape(chunk, width)
        t_sq = sblk[bc].reshape(chunk, width)
        bdims = (((1,), (2,)), ((0,), (0,)))
        if qc.dtype == jnp.int8:
            d_ = jax.lax.dot_general(qc, rows, bdims, preferred_element_type=jnp.int32)
        elif qc.dtype == jnp.float32:
            d_ = jax.lax.dot_general(qc, rows, bdims, precision=jax.lax.Precision.HIGHEST)
        else:
            d_ = jax.lax.dot_general(qc, rows, bdims, preferred_element_type=jnp.float32)
        d_ = d_.astype(jnp.float32)
        if metric == MetricKind.IP:
            dist = 1.0 - d_
        elif metric == MetricKind.Cos:
            denom = jnp.sqrt(qsq)[:, None] * jnp.sqrt(t_sq)
            safe_d = jnp.where(denom == 0.0, 1.0, denom)
            base = 1.0 - d_ / safe_d
            one_zero = (qsq[:, None] == 0.0) ^ (t_sq == 0.0)
            both_zero = (qsq[:, None] == 0.0) & (t_sq == 0.0)
            dist = jnp.where(both_zero, 0.0, jnp.where(one_zero, 1.0, base))
        else:  # L2sq
            dist = jnp.maximum(qsq[:, None] + t_sq - 2.0 * d_, 0.0)
        dist = jnp.where(ok, dist, MASKED)
        ids = (
            bc[:, :, None] * _LANES
            + jax.lax.broadcasted_iota(jnp.int32, (chunk, b, _LANES), 2)
        ).reshape(chunk, width)
        # full top_k (width is small): keeps the exact contract airtight —
        # staged selection here could miss same-lane duplicates
        neg, sel = jax.lax.top_k(-dist, k)
        d_out = -neg
        i_out = jnp.take_along_axis(ids, sel, axis=1)
        return d_out, jnp.where(d_out >= MASKED / 2, -1, i_out)

    d_all, i_all = jax.lax.map(one_chunk, (q_c, qs_c, b_c))
    d_out = d_all.reshape(n_chunks * chunk, k)[:n_q]
    i_out = i_all.reshape(n_chunks * chunk, k)[:n_q]
    return d_out, i_out.astype(jnp.int32)


def supports(metric: MetricKind, kind: ScalarKind) -> bool:
    # F16 is excluded: Mosaic on this backend has no f16 matmul, no
    # f16->bf16 cast, and even f32-widened f16 loads fail the TPU compile
    # (probed 3 ways, scripts logs /tmp/f16retry); f16 tables serve through
    # the XLA scan path, which lowers f16 fine.
    return metric in (MetricKind.IP, MetricKind.Cos, MetricKind.L2sq) and kind in (
        ScalarKind.BF16,
        ScalarKind.F32,
        ScalarKind.I8,
    )
