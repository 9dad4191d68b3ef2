"""Pallas double-buffered IVF probe kernel.

The IVF probe's inner move — "gather this query's nprobe partition windows
and score them" — is a bandwidth problem: each window is a CONTIGUOUS run of
rows in the dense cluster-major table (ivf.py build_inplace), but XLA's
gather lowering never issues wide DMAs for it (measured ~15× off the DMA
roofline: ~25 ms real vs ~1.6 ms of traffic at nprobe=4 on 100M rows).

This kernel streams each window with an explicit `make_async_copy` HBM→VMEM
DMA, double-buffered against the window's compute, exactly the engine the
reference reaches for with its `prefetch` hook (reference:
include/usearch/index.hpp:1506-1524, 3971-3987) and its beam-search inner
loop (index.hpp:4175-4246) — re-imagined as: one window = one DMA = one
MXU matvec + VPU top-k fold.

Structure per grid cell (q_sub queries):
- starts/offs/lens [q_sub, nprobe] arrive as SMEM blocks → DMA addresses;
- loop over q_sub·nprobe windows: DMA window rows [W, D] (+ aux [a, W]),
  dot [W, D]×[D, q_sub] on the MXU (all cell queries share the matmul — the
  non-owning lanes are masked before the fold, costing nothing: the MXU
  processes ≤128 output columns in one pass either way);
- fold top-bin_m per 128-row bin into a per-lane (per-query) running top-k
  kept in a VMEM scratch accumulator [KPAD, q_sub] (lanes are queries, so
  the fold is lane-independent — no transposes, no cross-lane traffic);
- one [k, q_sub]→[q_sub, k] transpose per cell writes the output block
  (block specs need lane dims of 128 or full-array, which [n_q, KPAD]
  blocks satisfy and [KPAD, q_sub] blocks would not).

Returned ids are GLOBAL table row positions (the dense layout's positions
ARE slots).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..enums import MetricKind, ScalarKind
from .distances import MASKED
from .pallas_scan import _LANES

#: queries per grid cell; SMEM per cell = 3 · q_sub · nprobe · 4 B
_Q_SUB = 8
#: top-k accumulator depth (sublane dimension of the scratch accumulator)
_KPAD = 128


def _window_dists(metric: MetricKind, dots, q_sq, t_aux_w):
    """dots [W, q_sub] + q_sq [q_sub] + window aux [aux_rows, W] → f32
    RANK-FORM distances [W, q_sub] with the deleted-row penalty folded in.

    The rank form drops every term that is constant along the lane (query)
    axis — for L2sq the ``q_sq`` addend and the final clamp, for cos the
    per-lane ``1/sqrt(q_sq)`` scale and the ``1 +`` shift. Ordering within
    a lane is preserved (the dropped transforms are strictly monotonic per
    lane), so the running top-k fold is unaffected; `_rank_epilogue`
    restores final metric values once per cell after the fold. This keeps
    the in-loop expression structurally identical to IP's (one broadcast
    multiply-add over the aux column), which is what keeps the kernel
    inside the Mosaic scoped-VMEM envelope: the old in-loop L2/cos
    epilogues measured 118-126 MB of kernel stack where IP needs <48 MB at
    the same (w_pad, bin_m) — the exact compile failure BENCH_DATASETS r3
    hit on every l2sq/cos family (scripts/tpu_grouped_vmem_matrix.py)."""
    dots = dots.astype(jnp.float32)
    if t_aux_w.shape[0] == 1:  # lean IP aux: penalty row only
        t_sq = None
        penalty = t_aux_w[0, :][:, None]
    else:
        t_sq = t_aux_w[0, :][:, None]
        penalty = t_aux_w[2, :][:, None]
    if metric == MetricKind.IP:
        d = 1.0 - dots
    elif metric == MetricKind.Cos:
        # rank form: -dot/|t|; |q| scaling + the "1 +" shift move to the
        # epilogue. Zero-norm semantics (reference index_plugins.hpp:1353):
        # t==0 rows score 0 → epilogue 1; both-zero rows score -1 →
        # epilogue 1 + (-1)·1 = 0; zero queries have dots == 0 exactly.
        rsqrt_t = jnp.where(t_sq == 0.0, 0.0, 1.0 / jnp.sqrt(t_sq))
        d = -(dots * rsqrt_t)
        both_zero = (t_sq == 0.0) & (q_sq[None, :] == 0.0)
        d = jnp.where(both_zero, -1.0, d)
    elif metric in (MetricKind.L2sq, MetricKind.Hamming):
        # rank form: |t|² - 2·dot; the + |q|² shift and ≥0 clamp move to
        # the epilogue. Hamming over packed bits is the SAME expression —
        # pop(t) - 2·and_count, epilogue adds pop(q) (the stats rows carry
        # popcounts for b1 tables and the dot is the bit-plane and-count).
        d = t_sq - 2.0 * dots
    else:
        raise ValueError(f"probe kernel supports ip/cos/l2sq/hamming, got {metric}")
    return d + penalty


def _rank_epilogue(metric: MetricKind, acc, q_sq):
    """Map the fold's rank-form accumulator [g, k_pad] back to final metric
    distances using the per-lane constants dropped by `_window_dists`.
    MASKED/penalty slots (≥ MASKED/2) pass through untouched so callers'
    empty-slot detection keeps working."""
    if metric == MetricKind.IP:
        return acc
    qs = q_sq[:, None]
    keep = acc >= MASKED / 2
    if metric in (MetricKind.L2sq, MetricKind.Hamming):
        return jnp.where(keep, acc, jnp.maximum(acc + qs, 0.0))
    # cos
    scale = jnp.where(qs == 0.0, 1.0, 1.0 / jnp.sqrt(qs))
    return jnp.where(keep, acc, 1.0 + acc * scale)


def _win_dots(w, qv, acc_t):
    """One window's candidate dots [w_pad, g] on the MXU.

    uint8 operands are PACKED bit rows: the dot decomposes bit-plane-wise
    (feature j*8+s pairs bit s of byte j), eight i8 matmuls over the raw
    bytes whose shift/mask run on the VPU in VMEM — the unpacked window
    never exists (packbits.bit_dot, in-kernel form)."""
    dn = (((1,), (1,)), ((), ()))
    if qv.dtype == jnp.uint8:
        # Mosaic has no 8-bit vector shifts (arith.shrui on vector<i8>
        # fails to legalize) — widen to i32 for the shift/mask, cast back
        # to i8 for the MXU operand
        w32 = w.astype(jnp.int32)
        q32 = qv.astype(jnp.int32)
        dots = None
        for s in range(8):
            w_s = ((w32 >> s) & 1).astype(jnp.int8)
            q_s = ((q32 >> s) & 1).astype(jnp.int8)
            d0 = jax.lax.dot_general(
                w_s, q_s, dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            dots = d0 if dots is None else dots + d0
        return dots
    return jax.lax.dot_general(
        w, qv, dimension_numbers=dn, preferred_element_type=acc_t
    )


def _make_probe_kernel(
    metric: MetricKind, k: int, nprobe: int, w_pad: int, q_sub: int, bin_m: int
):
    nb_w = w_pad // _LANES

    def kernel(
        st_ref,      # [q_sub, nprobe] i32 SMEM — clamped window starts
        off_ref,     # [q_sub, nprobe] i32 SMEM — window offset inside the DMA
        len_ref,     # [q_sub, nprobe] i32 SMEM — window length
        q_ref,       # [q_sub, D] VMEM
        q_aux_ref,   # [q_sub, 2] VMEM f32 (q_sq, q_sum)
        table_ref,   # [cap2, D] HBM
        t_aux_ref,   # [aux_rows, cap2] HBM f32
        out_d_ref,   # [q_sub, KPAD] f32
        out_i_ref,   # [q_sub, KPAD] i32
        wbuf,        # [2, w_pad, D] VMEM scratch
        abuf,        # [2, aux_rows, w_pad] VMEM f32 scratch
        acc_d,       # [KPAD, q_sub] f32 scratch — running top-k (lane=query)
        acc_i,       # [KPAD, q_sub] i32 scratch
        sems,        # [2, 2] DMA semaphores
    ):
        n_win = q_sub * nprobe
        acc_t = (
            jnp.int32
            if q_ref.dtype in (jnp.int8, jnp.uint8)
            else jnp.float32
        )

        def win_dma(slot, widx):
            # starts are pre-aligned to 128 rows (ivf.py); the hint lets
            # Mosaic prove divisibility by the HBM memref tiling
            s = pl.multiple_of(st_ref[widx // nprobe, jax.lax.rem(widx, nprobe)], 128)
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(s, w_pad), :], wbuf.at[slot], sems.at[slot, 0]
            )

        def aux_dma(slot, widx):
            s = pl.multiple_of(st_ref[widx // nprobe, jax.lax.rem(widx, nprobe)], 128)
            return pltpu.make_async_copy(
                t_aux_ref.at[:, pl.ds(s, w_pad)], abuf.at[slot], sems.at[slot, 1]
            )

        win_dma(0, 0).start()
        aux_dma(0, 0).start()
        acc_d[:] = jnp.full_like(acc_d, MASKED)
        acc_i[:] = jnp.full_like(acc_i, -1)
        q_sq = q_aux_ref[:, 0]

        def body(widx, _):
            slot = jax.lax.rem(widx, 2)
            nxt = jax.lax.rem(widx + 1, 2)

            @pl.when(widx + 1 < n_win)
            def _prefetch():
                win_dma(nxt, widx + 1).start()
                aux_dma(nxt, widx + 1).start()

            win_dma(slot, widx).wait()
            aux_dma(slot, widx).wait()

            qi = widx // nprobe
            pj = jax.lax.rem(widx, nprobe)
            s = st_ref[qi, pj]
            off = off_ref[qi, pj]
            ln = len_ref[qi, pj]

            dots = _win_dots(wbuf[slot], q_ref[:], acc_t)  # [w_pad, q_sub]
            d = _window_dists(metric, dots, q_sq, abuf[slot])

            # mask: rows inside [off, off+len) AND the owning query's lane
            r = jax.lax.broadcasted_iota(jnp.int32, (w_pad, q_sub), 0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (w_pad, q_sub), 1)
            keep = (r >= off) & (r < off + ln) & (lane == qi)
            d = jnp.where(keep, d, MASKED)

            # top-bin_m per 128-row bin (sublane extraction after a free
            # major split). bin_m=2 makes per-window same-bin collisions a
            # third-order event (needs 3+ of the true top-k in one bin);
            # bin_m=k is exact within the window.
            d3 = d.reshape(nb_w, _LANES, q_sub)
            sub3 = jax.lax.broadcasted_iota(jnp.int32, (nb_w, _LANES, q_sub), 1)
            base = jax.lax.broadcasted_iota(jnp.int32, (nb_w, q_sub), 0) * _LANES
            bds = []
            bis = []
            for _i in range(bin_m):
                mn = jnp.min(d3, axis=1)                               # [nb_w, q_sub]
                am = jnp.argmin(d3, axis=1).astype(jnp.int32)
                bds.append(mn)
                bis.append(s + base + am)
                if _i + 1 < bin_m:
                    d3 = jnp.where(sub3 == am[:, None, :], MASKED, d3)
            bin_d = jnp.concatenate(bds, axis=0)                       # [bin_m·nb_w, q_sub]
            bin_i = jnp.concatenate(bis, axis=0)

            # fold into the running per-lane top-k (k min-extraction passes)
            cand_d = jnp.concatenate([acc_d[:k, :], bin_d], axis=0)
            cand_i = jnp.concatenate([acc_i[:k, :], bin_i], axis=0)
            rows = cand_d.shape[0]
            sub_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, q_sub), 0)
            sel_d = []
            sel_i = []
            for _j in range(k):
                m = jnp.min(cand_d, axis=0)                            # [q_sub]
                am2 = jnp.argmin(cand_d, axis=0)                       # [q_sub]
                onehot = sub_iota == am2[None, :]
                iv = jnp.sum(jnp.where(onehot, cand_i, 0), axis=0)
                sel_d.append(m)
                sel_i.append(iv)
                cand_d = jnp.where(onehot, MASKED, cand_d)
            acc_d[:k, :] = jnp.stack(sel_d, axis=0)
            acc_i[:k, :] = jnp.stack(sel_i, axis=0)
            return 0

        jax.lax.fori_loop(0, n_win, body, 0)
        # one transpose per cell: [KPAD, q_sub] scratch → [q_sub, KPAD] block
        out_d_ref[:] = _rank_epilogue(metric, acc_d[:].T, q_sq)
        out_i_ref[:] = acc_i[:].T

    return kernel


def _make_grouped_kernel(
    metric: MetricKind, k_pad: int, w_pad: int, g: int, bin_m: int,
    n_slots: int = 2, fold_every: int = 1, with_aux: bool = True,
):
    """Partition-grouped cell: G (query, partition) PAIRS sorted by
    partition; the cell's distinct windows are DMA'd and matmul'd ONCE
    against all G pair-queries (full MXU column utilization — the per-query
    kernel's [W, D]×[D, 8] matvec left 15/16 of the MXU idle and measured
    5.8× off the DMA roofline). A pair's lane is live only during its own
    window (lane_widx == w), so the per-lane fold accumulates exactly that
    pair's window candidates.

    ``fold_every``: windows per running-fold invocation. The k_pad
    min-extraction passes run over tiny [~100, g] surfaces whose cost is
    per-PASS fixed overhead, not elements (on-chip: k=1 → k=10 adds only
    ~0.5 us/window while the fold is ~2.5 of the 7.5 us total), so
    batching F windows' bin candidates into one fold divides that cost by
    ~F. Between folds candidates land in a [F·bin_m·nb_w, g] VMEM ring;
    after each fold the ring resets to MASKED so a tail fold (w ==
    n_win-1 mid-phase) cannot re-fold stale candidates into duplicates.
    The ring stride rounds up to 8 sublanes — misaligned ref-slice stores
    are pathologically slow on this Mosaic (see _make_binned_probe_kernel).

    ``with_aux=False`` (IP over a fully-live table only): skips the
    per-window aux DMA and the penalty add entirely — the aux row would be
    all zeros, and the second DMA issue per window is pure overhead (the
    aux-free dotonly diagnostic runs at 3.45 us/window where this kernel
    measures ~7.5)."""
    nb_w = w_pad // _LANES
    n_cand = bin_m * nb_w
    n_cand_pad = ((n_cand + 7) // 8) * 8

    def kernel(
        meta_ref,    # [1, 8, g] i32 SMEM — rows: 0 wst, 1 woff, 2 wlen, 3 wcnt
        q_ref,       # [g, D] VMEM — gathered pair-query rows
        q_aux_ref,   # [g, 8] VMEM f32 — cols: 0 q_sq, 1 q_sum, 2 pair widx
        table_ref,   # [cap2, D] HBM
        t_aux_ref,   # [aux_rows, cap2] HBM f32
        out_d_ref,   # [g, k_pad] f32
        out_i_ref,   # [g, k_pad] i32
        wbuf,        # [2, w_pad, D] VMEM scratch
        abuf,        # [2, aux_rows, w_pad] VMEM f32 scratch
        acc_d,       # [k_pad, g] f32 scratch
        acc_i,       # [k_pad, g] i32 scratch
        cbuf_d,      # [fold_every·n_cand, g] f32 scratch (fold ring)
        cbuf_i,      # [fold_every·n_cand, g] i32 scratch
        sems,        # [2, 2] DMA semaphores
    ):
        n_win = meta_ref[0, 3, 0]
        acc_t = (
            jnp.int32
            if q_ref.dtype in (jnp.int8, jnp.uint8)
            else jnp.float32
        )

        def win_dma(slot, w):
            s = pl.multiple_of(meta_ref[0, 0, w], 128)
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(s, w_pad), :], wbuf.at[slot], sems.at[slot, 0]
            )

        def aux_dma(slot, w):
            s = pl.multiple_of(meta_ref[0, 0, w], 128)
            return pltpu.make_async_copy(
                t_aux_ref.at[:, pl.ds(s, w_pad)], abuf.at[slot], sems.at[slot, 1]
            )

        # fill the ring: slots 0..n_slots-2 start immediately (window w's
        # slot is w % n_slots; the body prefetches w + n_slots - 1). Depth
        # >2 keeps more window DMAs in flight — the lever for SPARSE probe
        # densities (pairs/chunk < 1), where windows stop being
        # back-to-back in HBM and a depth-2 ring exposes the fetch latency
        # (measured cliff: 11.5 us/window at density 0.75 vs 5.9 at 1.0).
        for w0 in range(n_slots - 1):
            @pl.when(w0 < n_win)
            def _start(w0=w0):
                win_dma(w0, w0).start()
                if with_aux:
                    aux_dma(w0, w0).start()
        acc_d[:] = jnp.full_like(acc_d, MASKED)
        acc_i[:] = jnp.full_like(acc_i, -1)
        if fold_every > 1:
            cbuf_d[:] = jnp.full_like(cbuf_d, MASKED)
            cbuf_i[:] = jnp.full_like(cbuf_i, -1)
        q_sq = q_aux_ref[:, 0]
        # pair→window ownership rides q_aux as f32 (exact for ints < 2^24);
        # a separate [1, g] i32 VMEM block would violate the min-tile rule
        lane_widx = q_aux_ref[:, 2]  # [g] f32

        def _fold(bin_d, bin_i):
            cand_d = jnp.concatenate([acc_d[:, :], bin_d], axis=0)
            cand_i = jnp.concatenate([acc_i[:, :], bin_i], axis=0)
            rows = cand_d.shape[0]
            sub_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, g), 0)
            sel_d = []
            sel_i = []
            for _j in range(k_pad):
                m = jnp.min(cand_d, axis=0)
                am2 = jnp.argmin(cand_d, axis=0)
                onehot = sub_iota == am2[None, :]
                iv = jnp.sum(jnp.where(onehot, cand_i, 0), axis=0)
                sel_d.append(m)
                sel_i.append(iv)
                cand_d = jnp.where(onehot, MASKED, cand_d)
            acc_d[:, :] = jnp.stack(sel_d, axis=0)
            acc_i[:, :] = jnp.stack(sel_i, axis=0)

        def body(w, _):
            slot = jax.lax.rem(w, n_slots)
            nxt = jax.lax.rem(w + n_slots - 1, n_slots)

            @pl.when(w + n_slots - 1 < n_win)
            def _prefetch():
                win_dma(nxt, w + n_slots - 1).start()
                if with_aux:
                    aux_dma(nxt, w + n_slots - 1).start()

            win_dma(slot, w).wait()
            if with_aux:
                aux_dma(slot, w).wait()

            s = meta_ref[0, 0, w]
            off = meta_ref[0, 1, w]
            ln = meta_ref[0, 2, w]

            dots = _win_dots(wbuf[slot], q_ref[:], acc_t)  # [w_pad, g] — ONE matmul for every pair probing this window
            if with_aux:
                d = _window_dists(metric, dots, q_sq, abuf[slot])
            else:  # IP over a fully-live table: rank form needs no aux
                d = 1.0 - dots.astype(jnp.float32)

            r = jax.lax.broadcasted_iota(jnp.int32, (w_pad, g), 0)
            keep = (
                (r >= off)
                & (r < off + ln)
                & (lane_widx[None, :] == w.astype(jnp.float32))
            )
            d = jnp.where(keep, d, MASKED)

            d3 = d.reshape(nb_w, _LANES, g)
            sub3 = jax.lax.broadcasted_iota(jnp.int32, (nb_w, _LANES, g), 1)
            base = jax.lax.broadcasted_iota(jnp.int32, (nb_w, g), 0) * _LANES
            bds = []
            bis = []
            for _i in range(bin_m):
                mn = jnp.min(d3, axis=1)
                am = jnp.argmin(d3, axis=1).astype(jnp.int32)
                bds.append(mn)
                bis.append(s + base + am)
                if _i + 1 < bin_m:
                    d3 = jnp.where(sub3 == am[:, None, :], MASKED, d3)
            bin_d = jnp.concatenate(bds, axis=0)
            bin_i = jnp.concatenate(bis, axis=0)

            if fold_every == 1:
                _fold(bin_d, bin_i)
                return 0

            # stash this window's candidates in the fold ring; fold when
            # the ring fills or the window stream ends
            if n_cand_pad > n_cand:
                pad = jnp.full((n_cand_pad - n_cand, g), MASKED)
                bin_d = jnp.concatenate([bin_d, pad], axis=0)
                bin_i = jnp.concatenate(
                    [bin_i, jnp.full((n_cand_pad - n_cand, g), -1, jnp.int32)],
                    axis=0,
                )
            phase = jax.lax.rem(w, fold_every)
            for ph in range(fold_every):
                @pl.when(phase == ph)
                def _store(ph=ph):
                    cbuf_d[ph * n_cand_pad:(ph + 1) * n_cand_pad, :] = bin_d
                    cbuf_i[ph * n_cand_pad:(ph + 1) * n_cand_pad, :] = bin_i

            @pl.when((phase == fold_every - 1) | (w == n_win - 1))
            def _flush():
                _fold(cbuf_d[:, :], cbuf_i[:, :])
                cbuf_d[:] = jnp.full_like(cbuf_d, MASKED)
                cbuf_i[:] = jnp.full_like(cbuf_i, -1)
            return 0

        jax.lax.fori_loop(0, n_win, body, 0)
        out_d_ref[:] = _rank_epilogue(metric, acc_d[:].T, q_sq)
        out_i_ref[:] = acc_i[:].T

    return kernel


def _make_grouped_nofold_kernel(
    metric: MetricKind, w_pad: int, g: int, bin_m: int, out_pad: int,
    n_slots: int = 2,
):
    """_make_grouped_kernel with the k_pad-pass running fold DELETED: each
    pair-lane's window bin-candidates (bin_m per 128-row bin, the recall-
    proven extract) land directly in a wide accumulator via one aligned
    full-array where; the exact top-k merge runs outside in XLA. The fold
    was measured to DOUBLE the per-window cost (k=1 → k=10: 6.4 → 13.4
    us/window, scripts/tpu_probe_kernel_profile.py); everything else —
    DMA pattern, epilogue, off/len/lane masks, bin extract — is
    byte-identical to the proven kernel, so distances are final metric
    values and deleted/filtered rows are already penalty-masked.

    n_slots: DMA ring depth — with 2 the prefetch depth is 1 window; a
    deeper ring keeps more HBM copies in flight to hide issue latency."""
    nb_w = w_pad // _LANES
    n_cand = bin_m * nb_w

    def kernel(
        meta_ref,    # [1, 8, g] i32 SMEM — rows: 0 wst, 1 woff, 2 wlen, 3 wcnt
        q_ref,       # [g, D] VMEM — gathered pair-query rows
        q_aux_ref,   # [g, 8] VMEM f32 — cols: 0 q_sq, 1 q_sum, 2 pair widx
        table_ref,   # [cap2, D] HBM
        t_aux_ref,   # [aux_rows, cap2] HBM f32
        out_d_ref,   # [g, out_pad] f32
        out_i_ref,   # [g, out_pad] i32
        wbuf,        # [n_slots, w_pad, D] VMEM scratch
        abuf,        # [n_slots, aux_rows, w_pad] VMEM f32 scratch
        acc_d,       # [out_pad, g] f32 scratch
        acc_i,       # [out_pad, g] i32 scratch
        sems,        # [n_slots, 2] DMA semaphores
    ):
        n_win = meta_ref[0, 3, 0]
        acc_t = (
            jnp.int32
            if q_ref.dtype in (jnp.int8, jnp.uint8)
            else jnp.float32
        )

        def win_dma(slot, w):
            s = pl.multiple_of(meta_ref[0, 0, w], 128)
            return pltpu.make_async_copy(
                table_ref.at[pl.ds(s, w_pad), :], wbuf.at[slot], sems.at[slot, 0]
            )

        def aux_dma(slot, w):
            s = pl.multiple_of(meta_ref[0, 0, w], 128)
            return pltpu.make_async_copy(
                t_aux_ref.at[:, pl.ds(s, w_pad)], abuf.at[slot], sems.at[slot, 1]
            )

        # fill the ring: slots 0..n_slots-2 start immediately (window w's
        # slot is w % n_slots; the body prefetches w + n_slots - 1)
        for w0 in range(n_slots - 1):
            @pl.when(w0 < n_win)
            def _start(w0=w0):
                win_dma(w0, w0).start()
                aux_dma(w0, w0).start()
        acc_d[:] = jnp.full_like(acc_d, MASKED)
        acc_i[:] = jnp.full_like(acc_i, -1)
        q_sq = q_aux_ref[:, 0]
        lane_widx = q_aux_ref[:, 2]  # [g] f32

        def body(w, _):
            slot = jax.lax.rem(w, n_slots)
            nxt = jax.lax.rem(w + n_slots - 1, n_slots)

            @pl.when(w + n_slots - 1 < n_win)
            def _prefetch():
                win_dma(nxt, w + n_slots - 1).start()
                aux_dma(nxt, w + n_slots - 1).start()

            win_dma(slot, w).wait()
            aux_dma(slot, w).wait()

            s = meta_ref[0, 0, w]
            off = meta_ref[0, 1, w]
            ln = meta_ref[0, 2, w]

            dots = _win_dots(wbuf[slot], q_ref[:], acc_t)  # [w_pad, g] — ONE matmul for every pair probing this window
            d = _window_dists(metric, dots, q_sq, abuf[slot])

            r = jax.lax.broadcasted_iota(jnp.int32, (w_pad, g), 0)
            own = lane_widx[None, :] == w.astype(jnp.float32)
            keep = (r >= off) & (r < off + ln) & own
            d = jnp.where(keep, d, MASKED)

            d3 = d.reshape(nb_w, _LANES, g)
            sub3 = jax.lax.broadcasted_iota(jnp.int32, (nb_w, _LANES, g), 1)
            base = jax.lax.broadcasted_iota(jnp.int32, (nb_w, g), 0) * _LANES
            bds = []
            bis = []
            for _i in range(bin_m):
                mn = jnp.min(d3, axis=1)
                am = jnp.argmin(d3, axis=1).astype(jnp.int32)
                bds.append(mn)
                bis.append(s + base + am)
                if _i + 1 < bin_m:
                    d3 = jnp.where(sub3 == am[:, None, :], MASKED, d3)
            if out_pad > n_cand:
                bds.append(jnp.full((out_pad - n_cand, g), MASKED))
                bis.append(jnp.full((out_pad - n_cand, g), -1, jnp.int32))
            bin_d = jnp.concatenate(bds, axis=0)     # [out_pad, g]
            bin_i = jnp.concatenate(bis, axis=0)
            acc_d[:, :] = jnp.where(own, bin_d, acc_d[:, :])
            acc_i[:, :] = jnp.where(own, bin_i, acc_i[:, :])
            return 0

        jax.lax.fori_loop(0, n_win, body, 0)
        out_d_ref[:] = _rank_epilogue(metric, acc_d[:].T, q_sq)
        out_i_ref[:] = acc_i[:].T

    return kernel


@functools.partial(jax.jit, static_argnums=(0, 6, 7, 8, 9, 10))
def pallas_ivf_probe_grouped_nofold(
    metric: MetricKind,
    q_g: jnp.ndarray,        # [P, D] gathered pair-query rows; P % g == 0
    q_aux_g: jnp.ndarray,    # [P, 8] f32: cols 0 q_sq, 1 q_sum, 2 pair widx
    table: jnp.ndarray,      # [cap2, D] dense cluster-major
    t_aux: jnp.ndarray,      # [aux_rows, cap2] f32
    meta: jnp.ndarray,       # [cells, 8, g] i32
    w_pad: int,
    g: int = 128,
    bin_m: int = 4,
    interpret: bool = False,
    n_slots: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold-free grouped probe: per-PAIR final metric distances + GLOBAL
    row ids for the top-bin_m rows of each 128-row bin of the pair's
    window ([P, out_pad] f32 ascending-unsorted, [P, out_pad] i32;
    MASKED/-1 = empty slot). Callers merge outside (exact top-k)."""
    p_total, d_width = q_g.shape
    cap2 = table.shape[0]
    aux_rows = t_aux.shape[0]
    assert p_total % g == 0 and w_pad % _LANES == 0 and cap2 >= w_pad
    assert n_slots >= 2
    n_cand = bin_m * (w_pad // _LANES)
    out_pad = ((n_cand + _LANES - 1) // _LANES) * _LANES
    cells = p_total // g

    kernel = _make_grouped_nofold_kernel(metric, w_pad, g, bin_m, out_pad, n_slots)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=(cells,),
        in_specs=[
            pl.BlockSpec((1, 8, g), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, d_width), lambda i: (i, 0)),
            pl.BlockSpec((g, 8), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((g, out_pad), lambda i: (i, 0)),
            pl.BlockSpec((g, out_pad), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p_total, out_pad), jnp.float32),
            jax.ShapeDtypeStruct((p_total, out_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_slots, w_pad, d_width), table.dtype),
            pltpu.VMEM((n_slots, aux_rows, w_pad), jnp.float32),
            pltpu.VMEM((out_pad, g), jnp.float32),
            pltpu.VMEM((out_pad, g), jnp.int32),
            pltpu.SemaphoreType.DMA((n_slots, 2)),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # the unrolled bin-extract temporaries sit just past the 16 MB
            # default scoped-VMEM limit at spilled-100M window shapes
            # (w_pad 2560: 16.15 MB), and the grouped kernel's exact
            # bin_m=k mode keeps ~k live [w_pad, g] surfaces; physical
            # VMEM is 128 MB (dispatch guards the pathological combos)
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(meta, q_g, q_aux_g, table, t_aux)
    d_out = out_d
    return d_out, jnp.where(d_out >= MASKED / 2, -1, out_i)


def _make_binned_probe_kernel(
    w_pad: int, g: int, wb: int, bw: int, keep: int, out_pad: int,
    sel: str = "pack", n_slots: int = 2,
):
    """Fold-free grouped probe cell (i8 tables, selection by raw MXU dot).

    The v1 kernels spent ~2× their window time in the k_pad-pass running
    top-k fold and another ~2× in per-window epilogue/mask passes (measured
    on-chip: k=1→k=10 DOUBLES the per-window cost; even k=1 sits ~25× off
    the DMA roofline — scripts/tpu_probe_kernel_profile.py). This kernel
    deletes all of it:

    - selection key = ((-dot) << 5) | row_in_bin — ONE i32 min-reduce per
      `bw`-row bin replaces bin_m×(min+argmin) AND carries the argmin in the
      low bits (i8 dots fit: |dot| ≤ 127²·D < 2^26 for D ≤ 2048);
    - NO in-kernel top-k fold: each pair-lane emits its own window's
      per-bin winners (same 1-per-32-rows candidate density the recall-
      validated bin_m=4@128 kept) and the exact merge runs outside in XLA;
    - NO off/len window masks and NO aux/penalty DMA: every row of the
      padded window is a legitimate candidate (neighbor-cluster rows can
      only help recall); deleted/filtered/pad rows are masked OUTSIDE on
      the merged top-(k+slack) — ivf.py falls back to the masked path when
      the live fraction is low;
    - windows are processed `wb` per loop iteration to amortize the fixed
      per-iteration scalar/DMA overhead (the dominant term at k=1).
    """
    nbw = w_pad // bw

    def kernel(
        meta_ref,    # [1, 8, g] i32 SMEM — rows: 0 wst, 1 woff, 2 wlen, 3 wcnt
        q_ref,       # [g, D] i8 VMEM — gathered pair-query rows
        q_aux_ref,   # [g, 8] f32 VMEM — col 2 = pair widx
        table_ref,   # [cap2, D] HBM i8
        out_d_ref,   # [g, out_pad] f32 — raw keyed distance (-dot), MASKED pad
        out_i_ref,   # [g, out_pad] i32 — global row ids
        wbuf,        # [n_slots, wb, w_pad, D] VMEM i8
        acc_d,       # [out_pad, g] f32 scratch
        acc_i,       # [out_pad, g] i32 scratch
        sems,        # [n_slots, wb] DMA semaphores
    ):
        n_win = meta_ref[0, 3, 0]
        n_iter = (n_win + wb - 1) // wb
        n_cand = keep * nbw

        def _wslice(slot, wi):
            # wb == 1 keeps the 3-D [2, w_pad, D] buffer of the proven v1
            # kernels — a 4-D destination slice de-pipelines the DMA
            return wbuf.at[slot] if wb == 1 else wbuf.at[slot, wi]

        def _wc(it, wi):
            # wb == 1 never reads past lane n_win-1 ≤ g-1; only multi-window
            # batches can step past the meta lane bound on the tail
            w = it * wb + wi
            return w if wb == 1 else jnp.minimum(w, g - 1)

        def start_iter(slot, it):
            for wi in range(wb):
                s = pl.multiple_of(meta_ref[0, 0, _wc(it, wi)], 128)
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(s, w_pad), :],
                    _wslice(slot, wi),
                    sems.at[slot, wi],
                ).start()

        def wait_iter(slot, it):
            for wi in range(wb):
                s = pl.multiple_of(meta_ref[0, 0, _wc(it, wi)], 128)
                pltpu.make_async_copy(
                    table_ref.at[pl.ds(s, w_pad), :],
                    _wslice(slot, wi),
                    sems.at[slot, wi],
                ).wait()

        # fill the DMA ring: iterations 0..n_slots-2 start now; the body
        # keeps n_slots-1 iterations in flight
        for it0 in range(n_slots - 1):
            @pl.when(it0 < n_iter)
            def _start(it0=it0):
                start_iter(it0, it0)
        acc_d[:] = jnp.full_like(acc_d, MASKED)
        acc_i[:] = jnp.full_like(acc_i, -1)
        lane_widx = q_aux_ref[:, 2]              # [g] f32 pair→window slot

        def body(it, _):
            # Mosaic constraints mapped the hard way: misaligned ref-slice
            # stores (acc[lo:lo+nbw], nbw % 8 != 0) cost ~40 us/window;
            # loop-carried vector tuples and keep>1 masking rounds crash
            # the compiler outright. The surviving shape: scratch refs
            # updated by ONE full-array aligned where per window.
            slot = jax.lax.rem(it, n_slots)
            nxt = jax.lax.rem(it + n_slots - 1, n_slots)

            @pl.when(it + n_slots - 1 < n_iter)
            def _prefetch():
                start_iter(nxt, it + n_slots - 1)

            wait_iter(slot, it)

            for wi in range(wb):
                # static unroll (dynamic wbuf[slot, wi] indexing inside a
                # nested fori_loop measured 44 us/window, 5x worse than v1);
                # wb stays ≤2 to hold the unrolled temporaries under the
                # 16 MB scoped-VMEM limit
                w = it * wb + wi
                s = meta_ref[0, 0, _wc(it, wi)]
                dots = jax.lax.dot_general(
                    wbuf[slot] if wb == 1 else wbuf[slot, wi],
                    q_ref[:],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # [w_pad, g]
                own = lane_widx[None, :] == w.astype(jnp.float32)
                if sel == "dotonly":    # diagnostic: DMA + MXU + loop floor
                    acc_d[:8, :] = acc_d[:8, :] + dots[:8, :].astype(jnp.float32)
                    continue
                bds = []
                bis = []
                if sel == "pack":
                    # top-`keep` per bw-row bin on packed i32 keys: the sub
                    # bits make keys unique per row, so masking the exact
                    # winner key is tie-safe even for duplicate vectors
                    sub = jax.lax.broadcasted_iota(jnp.int32, (w_pad, g), 0) & (bw - 1)
                    key = ((-dots) << 5) | sub
                    k3 = key.reshape(nbw, bw, g)
                    base = jax.lax.broadcasted_iota(jnp.int32, (nbw, g), 0) * bw
                    for ki in range(keep):
                        mn = jnp.min(k3, axis=1)                # [nbw, g]
                        nd = jax.lax.shift_right_arithmetic(mn, 5)
                        bds.append(nd.astype(jnp.float32))      # raw -dot key
                        bis.append(s + base + (mn & (bw - 1)))
                        if ki + 1 < keep:
                            k3 = jnp.where(k3 == mn[:, None, :], jnp.int32(2**31 - 1), k3)
                else:
                    # "fminarg": f32 min+argmin rounds over bw-row bins with
                    # position masking — the v1 grouped kernel's proven-fast
                    # bin-extract primitive, minus its fold/epilogue/masks
                    d3 = (-dots).astype(jnp.float32).reshape(nbw, bw, g)
                    sub3 = jax.lax.broadcasted_iota(jnp.int32, (nbw, bw, g), 1)
                    base = jax.lax.broadcasted_iota(jnp.int32, (nbw, g), 0) * bw
                    for ki in range(keep):
                        mn = jnp.min(d3, axis=1)                # [nbw, g]
                        am = jnp.argmin(d3, axis=1).astype(jnp.int32)
                        bds.append(mn)
                        bis.append(s + base + am)
                        if ki + 1 < keep:
                            d3 = jnp.where(sub3 == am[:, None, :], MASKED, d3)
                if out_pad > n_cand:
                    bds.append(jnp.full((out_pad - n_cand, g), MASKED))
                    bis.append(jnp.full((out_pad - n_cand, g), -1, jnp.int32))
                cand_d = jnp.concatenate(bds, axis=0)           # [out_pad, g]
                cand_i = jnp.concatenate(bis, axis=0)
                acc_d[:, :] = jnp.where(own, cand_d, acc_d[:, :])
                acc_i[:, :] = jnp.where(own, cand_i, acc_i[:, :])
            return 0

        jax.lax.fori_loop(0, n_iter, body, 0)
        out_d_ref[:] = acc_d[:].T
        out_i_ref[:] = acc_i[:].T

    return kernel


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10, 11))
def pallas_ivf_probe_binned(
    q_g: jnp.ndarray,        # [P, D] i8 gathered pair-query rows; P % g == 0
    q_aux_g: jnp.ndarray,    # [P, 8] f32: col 2 = pair widx
    table: jnp.ndarray,      # [cap2, D] i8 dense cluster-major
    meta: jnp.ndarray,       # [cells, 8, g] i32: rows 0 wst, 1 woff, 2 wlen, 3 wcnt
    w_pad: int,
    g: int = 128,
    bw: int = 8,
    keep: int = 1,
    wb: int = 1,
    sel: str = "pack",
    interpret: bool = False,
    n_slots: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold-free grouped probe. Returns per-PAIR raw keys (-dot as f32,
    MASKED = empty slot) and GLOBAL row ids for the top-`keep` rows of
    each bw-row bin of the pair's window: ([P, out_pad] f32, [P, out_pad]
    i32). Selection is by max inner product on raw i8 dots — callers
    compute true metric distances for the merged winners outside."""
    p_total, d_width = q_g.shape
    cap2 = table.shape[0]
    assert p_total % g == 0 and w_pad % _LANES == 0 and cap2 >= w_pad
    assert table.dtype == jnp.int8 and d_width <= 2048
    assert keep >= 1 and bw >= 2 * keep
    assert bw <= (32 if sel == "pack" else 128)  # pack carries 5 sub bits
    nbins = keep * (w_pad // bw)
    out_pad = ((nbins + _LANES - 1) // _LANES) * _LANES
    cells = p_total // g

    assert n_slots >= 2
    kernel = _make_binned_probe_kernel(w_pad, g, wb, bw, keep, out_pad, sel, n_slots)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=(cells,),
        in_specs=[
            pl.BlockSpec((1, 8, g), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, d_width), lambda i: (i, 0)),
            pl.BlockSpec((g, 8), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((g, out_pad), lambda i: (i, 0)),
            pl.BlockSpec((g, out_pad), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p_total, out_pad), jnp.float32),
            jax.ShapeDtypeStruct((p_total, out_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM(
                (n_slots, w_pad, d_width) if wb == 1
                else (n_slots, wb, w_pad, d_width),
                table.dtype,
            ),
            pltpu.VMEM((out_pad, g), jnp.float32),
            pltpu.VMEM((out_pad, g), jnp.int32),
            pltpu.SemaphoreType.DMA((n_slots, wb)),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # the unrolled bin-extract temporaries sit just past the 16 MB
            # default scoped-VMEM limit at spilled-100M window shapes
            # (w_pad 2560: 16.15 MB), and the grouped kernel's exact
            # bin_m=k mode keeps ~k live [w_pad, g] surfaces; physical
            # VMEM is 128 MB (dispatch guards the pathological combos)
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(meta, q_g, q_aux_g, table)
    return out_d, out_i


@functools.partial(jax.jit, static_argnums=(0, 6, 7, 8, 9, 10, 11, 12, 13))
def pallas_ivf_probe_grouped(
    metric: MetricKind,
    q_g: jnp.ndarray,        # [P, D] gathered pair-query rows; P % g == 0
    q_aux_g: jnp.ndarray,    # [P, 8] f32: cols 0 q_sq, 1 q_sum, 2 pair widx
    table: jnp.ndarray,      # [cap2, D] dense cluster-major
    t_aux: jnp.ndarray,      # [aux_rows, cap2] f32
    meta: jnp.ndarray,       # [cells, 8, g] i32: rows 0 wst, 1 woff, 2 wlen, 3 wcnt
    k: int,
    w_pad: int,
    g: int = 128,
    bin_m: int = 4,
    interpret: bool = False,
    n_slots: int = 2,
    fold_every: int = 1,
    with_aux: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Grouped probe: returns per-PAIR (dists [P, k] f32, ids [P, k] i32).
    ``n_slots``: DMA ring depth; ``fold_every``: windows per running-fold
    invocation; ``with_aux=False``: IP fully-live fast path — skips the
    per-window aux DMA + penalty add (see _make_grouped_kernel)."""
    p_total, d_width = q_g.shape
    cap2 = table.shape[0]
    aux_rows = t_aux.shape[0]
    assert p_total % g == 0 and w_pad % _LANES == 0 and cap2 >= w_pad
    assert with_aux or metric == MetricKind.IP
    k_pad = max(k, 8)
    cells = p_total // g
    bin_m = min(bin_m, k_pad)
    n_cand_pad = ((bin_m * (w_pad // _LANES) + 7) // 8) * 8

    kernel = _make_grouped_kernel(
        metric, k_pad, w_pad, g, bin_m, n_slots, fold_every, with_aux
    )
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=(cells,),
        in_specs=[
            pl.BlockSpec((1, 8, g), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((g, d_width), lambda i: (i, 0)),
            pl.BlockSpec((g, 8), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((g, k_pad), lambda i: (i, 0)),
            pl.BlockSpec((g, k_pad), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((p_total, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((p_total, k_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_slots, w_pad, d_width), table.dtype),
            pltpu.VMEM((n_slots, aux_rows, w_pad), jnp.float32),
            pltpu.VMEM((k_pad, g), jnp.float32),
            pltpu.VMEM((k_pad, g), jnp.int32),
            pltpu.VMEM((max(fold_every, 1) * n_cand_pad, g), jnp.float32),
            pltpu.VMEM((max(fold_every, 1) * n_cand_pad, g), jnp.int32),
            pltpu.SemaphoreType.DMA((n_slots, 2)),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # the unrolled bin-extract temporaries sit just past the 16 MB
            # default scoped-VMEM limit at spilled-100M window shapes
            # (w_pad 2560: 16.15 MB), and the grouped kernel's exact
            # bin_m=k mode keeps ~k live [w_pad, g] surfaces; physical
            # VMEM is 128 MB (dispatch guards the pathological combos)
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(meta, q_g, q_aux_g, table, t_aux)

    d_out = out_d[:, :k]
    i_out = out_i[:, :k]
    return d_out, jnp.where(d_out >= MASKED / 2, -1, i_out)


@functools.partial(jax.jit, static_argnums=(0, 7, 8, 9, 10, 11))
def pallas_ivf_probe(
    metric: MetricKind,
    q: jnp.ndarray,          # [Q, D] storage dtype; Q % q_sub == 0
    table: jnp.ndarray,      # [cap2, D] dense cluster-major
    t_aux: jnp.ndarray,      # [aux_rows, cap2] f32 (stats + penalty rows)
    starts_c: jnp.ndarray,   # [Q, nprobe] i32 clamped DMA starts
    offs: jnp.ndarray,       # [Q, nprobe] i32 window offset inside the DMA
    lens: jnp.ndarray,       # [Q, nprobe] i32 window lengths
    k: int,
    nprobe: int,
    w_pad: int,              # static DMA window rows (multiple of 128)
    bin_m: int = 2,          # candidates kept per 128-row bin per window
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Probe-scan `nprobe` dense windows per query; returns
    (dists [Q, k] f32 ascending, global row ids [Q, k] i32, -1 = none)."""
    n_q, d_width = q.shape
    cap2 = table.shape[0]
    aux_rows = t_aux.shape[0]
    q_sub = _Q_SUB
    assert n_q % q_sub == 0, (n_q, q_sub)
    assert w_pad % _LANES == 0 and cap2 >= w_pad
    assert k <= _KPAD

    if q.dtype == jnp.uint8:
        # b1 packed storage: the per-query stats carry BIT counts (for
        # {0,1} vectors popcount == sum == sum of squares), not sums of the
        # raw packed byte values — hamming's epilogue restores
        # pop(q)+pop(t)-2·and from q_sq, so packed-byte sums would shift
        # every returned distance by a per-query constant
        pc = jnp.sum(jax.lax.population_count(q).astype(jnp.float32), axis=1)
        q_aux = jnp.stack([pc, pc], axis=1)
    else:
        qf = q.astype(jnp.float32)
        q_aux = jnp.stack([jnp.sum(qf * qf, axis=1), jnp.sum(qf, axis=1)], axis=1)

    kernel = _make_probe_kernel(metric, k, nprobe, w_pad, q_sub, min(bin_m, k))
    grid = (n_q // q_sub,)

    out_d, out_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((q_sub, nprobe), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((q_sub, nprobe), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((q_sub, nprobe), lambda i: (i, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((q_sub, d_width), lambda i: (i, 0)),
            pl.BlockSpec((q_sub, 2), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),   # table stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),   # t_aux stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((q_sub, _KPAD), lambda i: (i, 0)),
            pl.BlockSpec((q_sub, _KPAD), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_q, _KPAD), jnp.float32),
            jax.ShapeDtypeStruct((n_q, _KPAD), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, w_pad, d_width), table.dtype),
            pltpu.VMEM((2, aux_rows, w_pad), jnp.float32),
            pltpu.VMEM((_KPAD, q_sub), jnp.float32),
            pltpu.VMEM((_KPAD, q_sub), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            # the unrolled bin-extract temporaries sit just past the 16 MB
            # default scoped-VMEM limit at spilled-100M window shapes
            # (w_pad 2560: 16.15 MB), and the grouped kernel's exact
            # bin_m=k mode keeps ~k live [w_pad, g] surfaces; physical
            # VMEM is 128 MB (dispatch guards the pathological combos)
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
    )(starts_c, offs, lens, q, q_aux, table, t_aux)

    d_out = out_d[:, :k]
    i_out = out_i[:, :k]
    i_out = jnp.where(d_out >= MASKED / 2, -1, i_out)
    return d_out, i_out
