"""IVF partitioned scan — the TPU-native ANN structure replacing HNSW graph
traversal (reference: include/usearch/index.hpp:1981-4319).

A k-means coarse quantizer (kmeans.py, mirroring kmeans_clustering_gt)
partitions table rows. A query scores all centroids (one small matmul),
probes the best `nprobe` partitions, and runs the fused distance + top-k over
candidates only. The probe budget maps from `expansion_search` the way `ef`
bounds the HNSW beam: candidate rows scanned ≈ expansion_search ×
connectivity, matching the reference's distance budget at equal recall
targets (BENCHMARKS.md ef sweeps).

Layouts (both cluster-major — the locality the reference's `compact`
chases, index.hpp:3590-3682):
- `optimize()` builds a PARTITION-CONTIGUOUS copy of the live rows
  ([C, P, D]); probing gathers whole [P, D] blocks. Fast build, 2x memory.
- `optimize(reorder=True)` permutes the table ITSELF into dense cluster-major
  order (starts/lens, no padding, zero extra memory — the 100M-in-one-chip
  layout); probing gathers fixed 256-row blocks covering each partition
  window and masks the overscan. The structure persists through
  save/load/view (persist.py).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .enums import MetricKind, ScalarKind
from .kmeans import kmeans_fit
from .ops.distances import MASKED, row_stats, tile_dists
from .ops.topk import masked_topk, merge_topk, staged_topk as _staged_topk

_QUERY_CHUNK = 256


_DENSE_BLOCK = 256  # rows per gather block in the dense in-place layout

import os as _os

#: Pallas probe flavor: "group" (partition-grouped pairs — shared window
#: DMA + full-width matmul; the default), "nofold" (grouped kernel minus
#: the in-kernel fold, exact merge outside — same recall, pending on-chip
#: timing), "bin" (fold-free packed-key kernel — its narrow-bin configs
#: crash this image's Mosaic on TPU, opt-in only), "pair" (per-query
#: windows), "xla" handled by USEARCH_TPU_KERNEL / exact.set_kernel_backend.
_PROBE_MODE = _os.environ.get("USEARCH_TPU_PROBE", "group")

#: live-fraction floor below which the binned kernel (which masks deleted/
#: filtered rows AFTER its top-(k+slack) merge) defers to the in-kernel
#: penalty paths — under heavy filters the post-merge slack would starve
_BIN_LIVE_FLOOR = 0.5

#: binned-kernel candidate granularity: _BIN_KEEP winners per _BIN_BW-row
#: bin. True neighbors CONCENTRATE (often in one cluster window, sometimes
#: in adjacent duplicate rows), so wide single-winner bins lose same-bin
#: collisions (measured at 60k rows / 128 parts vs XLA 0.9844: 1@32 →
#: 0.826, 1@8 → 0.9961, 4@32 → 0.9984). NOTE: this image's Mosaic crashes
#: on bw<32 reduces and keep>1 masking rounds on REAL TPU — the "bin"
#: mode is opt-in (interpret/CPU and future toolchains); "nofold" is the
#: supported fold-free path.
_BIN_BW = int(_os.environ.get("USEARCH_TPU_BIN_BW", "32"))
_BIN_KEEP = int(_os.environ.get("USEARCH_TPU_BIN_KEEP", "4"))
#: query-axis chunk cap for the Pallas probe kernels. The r3/r4 "Q=16384
#: launch at 100M kills the TPU worker" was ROOT-CAUSED in r5 (bisection:
#: scripts/tpu_qfault_bisect.py): not a kernel fault but HBM exhaustion
#: from the coarse probe selection's full [Q, C] f32 score matrix (4.3 GB
#: at Q=16384 x C=65536, on top of a 12.3 GB table). `_probe_select` now
#: bounds that surface to [2048, C] chunks, and Q=16384 single launches
#: serve at 96M x C=65536 (bisect PASS). The cap stays as a generic
#: batch-splitting valve (window sharing is per launch, so per-launch QPS
#: matches the capped batch); override via the env knob.
_PROBE_QCHUNK = int(_os.environ.get("USEARCH_TPU_PROBE_QCHUNK", "16384"))
#: grouped-kernel DMA ring depth: window fetches in flight. 2 = classic
#: double buffering; deeper rings help SPARSE probe densities
#: (Q*nprobe/C < 1) where consecutive windows stop being adjacent in HBM
#: and the fetch latency leaks into the critical path
_PROBE_RING = int(_os.environ.get("USEARCH_TPU_PROBE_RING", "0"))  # 0 = adaptive
#: grouped-kernel candidates kept per 128-row bin (0 = the adaptive default:
#: 4 on wide probe surfaces, k on narrow ones). A/B knob for the in-kernel
#: bin-extract cost / same-bin-collision recall trade.
_GROUP_BINM = int(_os.environ.get("USEARCH_TPU_GROUP_BINM", "0"))
#: in-kernel bin-select primitive: "pack" (i32 packed-key min) or
#: "fminarg" (f32 min+argmin rounds, the v1 kernel's extract)
_BIN_SEL = _os.environ.get("USEARCH_TPU_BIN_SEL", "pack")


@jax.jit
def _shadow_extend(valid, shadow_pos, shadow_src):
    """Re-enable shadow (spill-duplicate) positions in a composed validity
    mask: shadow ``pos`` is live iff its primary ``src`` is live."""
    return valid.at[shadow_pos].set(valid[shadow_src])


@jax.jit
def _shadow_canon(ids, shadow_pos, shadow_src):
    """Map probe-result positions back to primary slots: shadow positions
    (found by binary search over the sorted shadow list) become their
    primary's position; everything else passes through. -1 stays -1."""
    s = shadow_pos.shape[0]
    j = jnp.clip(jnp.searchsorted(shadow_pos, ids), 0, s - 1)
    hit = (shadow_pos[j] == ids) & (ids >= 0)
    return jnp.where(hit, shadow_src[j], ids)


def _dedup_trim_host(d, slots, k: int):
    """Keep the first occurrence of each slot (ascending-distance order),
    trim to k. Vectorized host numpy: O(Q·kk²) bools."""
    d_np = np.asarray(d)
    s_np = np.asarray(slots)
    kk = d_np.shape[1]
    j = np.arange(kk)
    dup = (s_np[:, :, None] == s_np[:, None, :]) & (j[None, None, :] < j[None, :, None])
    bad = dup.any(-1) | (s_np < 0)
    push = np.argsort(bad, axis=1, kind="stable")[:, :k]  # firsts forward
    out_d = np.take_along_axis(d_np, push, axis=1)
    out_s = np.take_along_axis(s_np, push, axis=1)
    kept_bad = np.take_along_axis(bad, push, axis=1)
    out_d[kept_bad] = MASKED
    out_s[kept_bad] = -1
    return out_d, out_s


@functools.partial(jax.jit, static_argnums=(1,))
def _fresh_probe_mask(fresh_slots, cap: int):
    """[cap] bool — False at fresh slots: hides their (missing or stale)
    entries in the built layout so only the fresh side-scan serves them."""
    safe = jnp.where(fresh_slots >= 0, fresh_slots, cap)  # OOB pads: dropped
    return jnp.ones((cap,), jnp.bool_).at[safe].set(False)


@functools.partial(jax.jit, static_argnums=(0, 1, 7, 8, 9))
def _fresh_topk(metric, kind, q, table, stats, valid, fresh_slots, ndim: int, k: int,
                metric_fn=None):
    """Exact top-k of queries against the fresh overflow list, gathered from
    the LIVE table (never a stale copy). One small [Q, F] tile."""
    safe = jnp.maximum(fresh_slots, 0)
    rows = table[safe]
    rstats = stats[safe]
    qs = row_stats(q, kind)
    d = tile_dists(metric, kind, q, qs, rows, rstats, ndim, metric_fn)
    ok = (fresh_slots >= 0) & valid[safe]
    d, idx = masked_topk(d, ok, k)
    slots = jnp.where(idx >= 0, fresh_slots[jnp.clip(idx, 0, None)], -1)
    return d, slots


class IVFPartitions:
    """Built partition structure over an Index's device table.

    Two layouts:
    - copied (`part_table` set): cluster-major duplicate of the live rows —
      fastest to build, costs 2x table memory;
    - dense in-place (`starts`/`lens` set): `optimize(reorder=True)` PERMUTED
      the Index's own table cluster-major (the reference's `compact` move,
      index.hpp:3590-3682, including the slot_transition remapping) with NO
      per-partition padding: partition ci occupies rows
      [starts[ci], starts[ci]+lens[ci]). Probing gathers whole fixed-size row
      BLOCKS covering each window (block-DMA efficiency) and masks rows
      outside the window — zero memory waste, which is what fits IVF at
      100M rows in one chip's HBM.
    """

    def __init__(
        self,
        centroids,
        part_table,
        part_stats,
        part_slots,
        avg_rows,
        built_count,
        inplace_shape=None,
        starts=None,
        lens=None,
        p_win=0,
        block=_DENSE_BLOCK,
    ):
        self.centroids = centroids        # jnp [C, D] f32 (padded width)
        self.part_table = part_table      # jnp [C, P, D] or None (in-place)
        self.part_stats = part_stats      # jnp [C, P, 2] or None
        self.part_slots = part_slots      # jnp [C, P] i32 global slot ids, -1 pad (copied layout)
        self.avg_rows_per_part = avg_rows
        self.built_count = built_count
        self.inplace_shape = inplace_shape  # (C, p_win) when table is cluster-major
        self.starts = starts              # jnp [C] i32 row offsets (dense layout)
        self.lens = lens                  # jnp [C] i32 partition lengths
        self.p_win = p_win                # static probe-window rows (max len)
        self.block = block                # gather-block rows
        self.spilled = False              # SOAR spill: slots may repeat across partitions
        # Incremental maintenance: slots added/overwritten SINCE the build.
        # Their rows live in the main table but not (or stale) in the built
        # layout — they are scanned exactly from a "fresh" overflow list and
        # masked out of the probed scan (the IVF analog of HNSW's always-
        # incremental insert, reference index.hpp:2780-2880).
        self.fresh_np = np.zeros(0, dtype=np.int64)
        self._fresh_cache = None          # (cap, padded slots dev, probe mask dev)
        # copied layout: partition-aligned validity, keyed on the IDENTITY
        # of the composed validity array (jnp arrays are immutable; keeping
        # the keyed reference alive makes `is` a sound cache key)
        self._pv_cache = None             # (valid ref, part_valid dev)
        self._probe_valid_cache = None    # (valid ref, mask ref, composed)
        self._live_cache = None           # (valid ref, live fraction)
        # dense-layout SOAR shadows: duplicate positions + their primaries
        self.shadow_np_pos = np.zeros(0, dtype=np.int32)   # sorted ascending
        self.shadow_np_src = np.zeros(0, dtype=np.int32)
        self._shadow_dev = None           # (pos dev, src dev)
        self._shadow_valid_cache = None   # (valid ref, extended valid dev)

    def set_shadows(self, pos: np.ndarray, src: np.ndarray) -> None:
        """Install dense-layout spill shadows (sorted by position)."""
        o = np.argsort(pos, kind="stable")
        self.shadow_np_pos = np.ascontiguousarray(pos[o], dtype=np.int32)
        self.shadow_np_src = np.ascontiguousarray(src[o], dtype=np.int32)
        self._shadow_dev = None
        self._shadow_valid_cache = None
        self.spilled = self.shadow_np_pos.size > 0

    def _shadows(self):
        if self._shadow_dev is None:
            self._shadow_dev = (
                jnp.asarray(self.shadow_np_pos),
                jnp.asarray(self.shadow_np_src),
            )
        return self._shadow_dev

    def _shadow_valid(self, valid):
        """Composed validity extended onto shadow positions: a duplicate is
        alive iff its primary is alive under the SAME composed mask (so
        deletions and filters propagate for free). Cached by mask identity."""
        c = self._shadow_valid_cache
        if c is None or c[0] is not valid:
            pos, src = self._shadows()
            self._shadow_valid_cache = (valid, _shadow_extend(valid, pos, src))
        return self._shadow_valid_cache[1]

    @staticmethod
    def _quantize(
        index, n_partitions: Optional[int], p_cap_mult: float = 4.0, spill: float = 0.0
    ):
        """Coarse quantizer + capped chunking shared by both layouts.
        Returns (chunk member lists of OLD slots, per-chunk centroids, P, n).

        ``p_cap_mult`` bounds chunk depth at that multiple of the average:
        the copied [C, P, D] layout pays real memory for depth skew (4x);
        the dense layout pays only probe-window overscan, so it splits
        tighter (1.5x) — splitting there costs nothing but probe slots.

        ``spill``: SOAR-style spilled assignments (ScaNN) — the ``spill``
        fraction of points with the smallest (d2 - d1) margin are ALSO
        stored in their second-nearest cluster. Fixes the recall ceiling
        when the neighbor radius exceeds the cell radius (neighbors
        straddling a Voronoi boundary get found from either side) at the
        cost of `spill`×N duplicate rows in the copied layout."""
        live = index._live_slots()
        n = len(live)
        if n_partitions is None:
            # √N-ish partitioning: probe cost ~ nprobe·√N rows
            n_partitions = max(1, int(math.sqrt(n)))
        n_partitions = min(n_partitions, n)

        # device-resident rows: no table round trip through the host
        rows = index._table[jnp.asarray(live)]  # storage dtype: no f32 table copy
        if index._is_set_index:
            # quantizer space for sorted-set tables: the dense presence
            # sketch (jaccard-similar sets land near each other in L2)
            rows = _set_sketch(rows)
        elif index._metric_kind == MetricKind.Divergence:
            # Hellinger embedding: L2 over sqrt-probabilities tracks JS
            # divergence far better than L2 over raw coordinates
            rows = jnp.sqrt(jnp.maximum(rows.astype(jnp.float32), 0.0))
        elif index._dtype == ScalarKind.B1:
            # quantizer space for packed-bit tables: the UNPACKED {0,1}
            # bits — hamming IS squared L2 there, so a plain L2 k-means
            # partitions the hamming/tanimoto/sorensen neighborhoods
            from .ops.packbits import unpack_bits

            rows = unpack_bits(rows)
        km_metric = (
            index._metric_kind
            if index._metric_kind in (MetricKind.Cos, MetricKind.IP, MetricKind.L2sq)
            else MetricKind.L2sq
        )
        skipped_flat = False
        if n_partitions > 4096:
            # flat Lloyd's is ∝ N·k·D per iteration — infeasible at the
            # 100M-row / 30k-partition scale; two-level fit is ~√k cheaper.
            # With spill, SKIP the fit's internal flat pass: the top-2 sweep
            # below provides both the Voronoi assignment and the spill
            # targets in one pass (two back-to-back sweeps double the FLOPs
            # and the HBM peak).
            from .kmeans import kmeans_hierarchical

            skipped_flat = spill > 0
            assigns, _, centroids = kmeans_hierarchical(
                rows, n_partitions, metric=km_metric, max_iterations=25, seed=0,
                return_dists=False, flat_assign=not skipped_flat,
            )
        else:
            assigns, _, centroids = kmeans_fit(
                rows, n_partitions, metric=km_metric, max_iterations=25, seed=0
            )
        c = centroids.shape[0]

        # SOAR spill sweep FIRST — at large c it also provides the Voronoi
        # assignment (a1), so everything below derives from the final assigns
        spill_lists = [None] * c
        if spill > 0 and c > 1 and n > 1:
            from .kmeans import assign_flat

            pt = min(8192, 1 << (n - 1).bit_length())
            n_pad = ((n + pt - 1) // pt) * pt
            rows_p = (
                jnp.concatenate(
                    [rows, jnp.broadcast_to(rows[:1], (n_pad - n, rows.shape[1]))]
                )
                if n_pad > n
                else rows
            )
            ct = min(16384, 1 << (c - 1).bit_length())
            a1, d1, a2, d2 = assign_flat(
                km_metric, rows_p, jnp.asarray(centroids), pt, ct, True
            )
            if skipped_flat:
                # the hierarchical fit skipped its flat pass — a1 IS the
                # Voronoi assignment (keyed on the skip itself, not on the
                # actual centroid count, which can fall below 4096 when the
                # fit collapses empty coarse cells)
                assigns = np.asarray(a1[:n], dtype=np.int64)
            a2 = np.asarray(a2[:n])
            margin = np.asarray(d2[:n], np.float64) - np.asarray(d1[:n], np.float64)
            ok = (a2 >= 0) & (a2 < c) & (margin < 1e37)
            spill_n = min(int(spill * n), int(ok.sum()), max(n - 1, 0))
            if spill_n:
                cand = np.nonzero(ok)[0]
                sel = cand[np.argsort(margin[cand], kind="stable")[:spill_n]]
                spill_slots = live[sel].astype(np.int32)
                spill_into = a2[sel]
                so = np.argsort(spill_into, kind="stable")
                s_into, s_slots = spill_into[so], spill_slots[so]
                s_start = np.searchsorted(s_into, np.arange(c))
                s_end = np.searchsorted(s_into, np.arange(c), side="right")
                for ci in range(c):
                    if s_end[ci] > s_start[ci]:
                        spill_lists[ci] = s_slots[s_start[ci] : s_end[ci]]

        counts = np.bincount(assigns, minlength=c)
        # Cap partition depth at 4x the average: a skewed cluster would
        # otherwise inflate the cluster-major layout (memory/padding ∝
        # P_max). Oversized clusters split into chunks that share the same
        # centroid — ties in the centroid scores keep the chunks adjacent in
        # the probe ranking.
        avg = max(int(np.ceil(n / max(c, 1))), 1)
        p_cap = ((int(p_cap_mult * avg) + 7) // 8) * 8
        # Absolute chunk cap: when the fit collapses (natural cluster count
        # below n_partitions, e.g. blob-structured corpora), avg — and with
        # it the 1.5x/4x relative cap — explodes; a 15k-row probe window
        # put the grouped Pallas kernel's [w_pad, g] temporaries at 118 MB
        # of scoped VMEM (10M x 96d run). Splitting at 4096 keeps every
        # window kernel-compilable; probe cost is unchanged (same rows, one
        # extra DMA per split, and tied centroid scores keep split chunks
        # adjacent in the probe ranking).
        p_cap = min(p_cap, int(_os.environ.get("USEARCH_TPU_PCAP", "4096")))
        p_max = min(max(int(counts.max()), 8), p_cap)
        p_max = ((p_max + 7) // 8) * 8  # sublane-align partition depth

        order = np.argsort(assigns, kind="stable")
        sorted_assigns = assigns[order]
        sorted_slots = live[order].astype(np.int32)
        starts = np.searchsorted(sorted_assigns, np.arange(c))
        ends = np.searchsorted(sorted_assigns, np.arange(c), side="right")

        chunk_rows = []
        chunk_spill = []  # parallel bool arrays: True at spilled (duplicate) members
        chunk_centroids = []
        for ci in range(c):
            members = sorted_slots[starts[ci] : ends[ci]]
            flags = np.zeros(len(members), dtype=bool)
            if spill_lists[ci] is not None:
                members = np.concatenate([members, spill_lists[ci]])
                flags = np.concatenate(
                    [flags, np.ones(len(spill_lists[ci]), dtype=bool)]
                )
            for off in range(0, max(len(members), 1), p_max):
                chunk_rows.append(members[off : off + p_max])
                chunk_spill.append(flags[off : off + p_max])
                chunk_centroids.append(centroids[ci])
        return chunk_rows, chunk_spill, np.stack(chunk_centroids), p_max, n

    @staticmethod
    def build(
        index, n_partitions: Optional[int] = None, spill: float = 0.0
    ) -> "IVFPartitions":
        chunk_rows, _, centroids, p_max, n = IVFPartitions._quantize(
            index, n_partitions, spill=spill
        )
        c = len(chunk_rows)
        part_slots = np.full((c, p_max), -1, dtype=np.int32)
        for ci, members in enumerate(chunk_rows):
            part_slots[ci, : len(members)] = members

        # Partition-contiguous copies: rows/stats materialized cluster-major.
        slots_dev = jnp.asarray(part_slots)
        safe = jnp.maximum(slots_dev, 0)
        part_table = index._table[safe]            # [C, P, D]
        part_stats = index._stats[safe]            # [C, P, 2]

        out = IVFPartitions(
            centroids=jnp.asarray(centroids),
            part_table=part_table,
            part_stats=part_stats,
            part_slots=slots_dev,
            avg_rows=max(n / c, 1.0),
            built_count=n,
        )
        out.spilled = spill > 0
        return out

    @staticmethod
    def build_inplace(
        index, n_partitions: Optional[int] = None, spill: float = 0.0
    ) -> "IVFPartitions":
        """Permute the Index's OWN table into DENSE cluster-major order:
        partition ci occupies rows [starts[ci], starts[ci]+lens[ci]) with no
        per-partition padding (the reference's `compact` + slot_transition
        remapping, index.hpp:3590-3682). Keys are untouched; slots change.

        ``spill`` > 0 adds SOAR spilled assignments as SHADOW rows: the
        spilled fraction is physically DUPLICATED inside its second-nearest
        cluster's window (spill×N extra rows — not the copied layout's 2×),
        but stays invisible to the index proper: shadow positions are
        valid=False (the exact scan never sees them), keyless, and excluded
        from the free-slot ring. Probes re-enable them through the
        shadow-extended validity mask (alive iff their PRIMARY row is alive
        under the composed deletion/filter mask) and results map back to the
        primary slot before the duplicate-trim."""
        from .exact import pad_rows as _pad

        chunk_rows, chunk_spill, centroids, p_max, n = IVFPartitions._quantize(
            index, n_partitions, p_cap_mult=1.5, spill=spill
        )
        c = len(chunk_rows)
        lens = np.array([len(m) for m in chunk_rows], dtype=np.int32)
        starts = np.zeros(c, dtype=np.int32)
        starts[1:] = np.cumsum(lens[:-1])
        body = int(lens.sum())
        p_win = max(((int(lens.max(initial=1)) + 7) // 8) * 8, 8)
        cap2 = max(_pad(body, 65536), 65536) if body > 65536 else _pad(body, 1024)
        cap2 = ((cap2 + _DENSE_BLOCK - 1) // _DENSE_BLOCK) * _DENSE_BLOCK

        # position -> old slot (or -1 for padding); all padding sits at the
        # tail — the body is gap-free
        old_of_pos = np.full(cap2, -1, dtype=np.int32)
        is_shadow = np.zeros(cap2, dtype=bool)
        if body:
            old_of_pos[:body] = np.concatenate(chunk_rows)
            is_shadow[:body] = np.concatenate(chunk_spill)

        old_dev = jnp.asarray(old_of_pos)
        safe = jnp.maximum(old_dev, 0)
        primary = (old_of_pos >= 0) & ~is_shadow

        @jax.jit
        def permute(table, stats, old_dev, safe, primary_dev):
            ok = (old_dev >= 0)[:, None]
            new_table = jnp.where(ok, table[safe], jnp.zeros((), table.dtype))
            new_stats = jnp.where(ok, stats[safe], 0.0)
            return new_table, new_stats, primary_dev

        new_table, new_stats, new_valid = permute(
            index._table, index._stats, old_dev, safe, jnp.asarray(primary)
        )

        # host-side slot transition (reindex_keys_/slot_transition semantics);
        # shadow positions carry no key and never enter the keymap
        new_slot_keys = np.zeros(cap2, dtype=np.uint64)
        new_slot_keys[primary] = index._slot_keys[old_of_pos[primary]]
        from .keymap import KeyMap

        keymap = KeyMap(multi=index._multi)
        pos = np.nonzero(primary)[0]
        keymap.insert_many(new_slot_keys[pos], pos.astype(np.uint64))

        # shadow bookkeeping: duplicate position -> its primary's NEW position
        shadow_np_pos = np.nonzero(is_shadow)[0].astype(np.int32)
        if shadow_np_pos.size:
            new_pos_of_old = np.full(int(index._capacity), -1, dtype=np.int32)
            new_pos_of_old[old_of_pos[primary]] = pos.astype(np.int32)
            shadow_np_src = new_pos_of_old[old_of_pos[shadow_np_pos]]
            ok_sh = shadow_np_src >= 0  # drop shadows whose primary vanished
            shadow_np_pos = shadow_np_pos[ok_sh]
            shadow_np_src = shadow_np_src[ok_sh]
        else:
            shadow_np_src = np.zeros(0, dtype=np.int32)

        index._table = new_table
        index._stats = new_stats
        index._valid = new_valid
        index._capacity = cap2
        index._slot_keys = new_slot_keys
        index._keymap = keymap
        # shadow positions hold live duplicate bytes — they must never be
        # recycled for new rows while this layout serves
        index._free_slots = np.nonzero(~(old_of_pos >= 0))[0].tolist()
        index._next_slot = cap2
        if index._host_f64 is not None:
            new_f64 = np.zeros((cap2, index._ndim), dtype=np.float64)
            occupied = old_of_pos >= 0
            new_f64[occupied] = index._host_f64[old_of_pos[occupied]]
            index._host_f64 = new_f64

        out = IVFPartitions(
            centroids=jnp.asarray(centroids),
            part_table=None,
            part_stats=None,
            part_slots=None,
            avg_rows=max(n / c, 1.0),
            built_count=n,
            inplace_shape=(c, p_win),
            starts=jnp.asarray(starts),
            lens=jnp.asarray(lens),
            p_win=p_win,
        )
        if shadow_np_pos.size:
            out.set_shadows(shadow_np_pos, shadow_np_src)
        return out

    def _shape(self):
        if self.inplace_shape is not None:
            return self.inplace_shape
        return (int(self.part_slots.shape[0]), int(self.part_slots.shape[1]))

    # ------------------------------------------------------------------
    # Incremental maintenance (fresh overflow list)
    # ------------------------------------------------------------------

    def add_fresh(self, slots) -> None:
        """Record slots whose rows were added/overwritten after the build.
        They are served by an exact side-scan until the next `optimize`."""
        new = np.asarray(slots, dtype=np.int64)
        if self.shadow_np_pos.size:
            # a recycled slot now holds a DIFFERENT vector: shadows pointing
            # at it would serve the old bytes under the new identity — kill
            # them permanently (their window rows stay masked: valid[pos] is
            # False and the extended mask no longer re-enables them)
            kill = np.isin(self.shadow_np_src.astype(np.int64), new)
            if kill.any():
                self.set_shadows(
                    self.shadow_np_pos[~kill], self.shadow_np_src[~kill]
                )
        if self.fresh_np.size:
            new = new[~np.isin(new, self.fresh_np)]
        if new.size:
            self.fresh_np = np.concatenate([self.fresh_np, new])
            self._fresh_cache = None

    def remove_fresh(self, slots) -> None:
        """Prune removed slots from the fresh list (the validity mask already
        hides them; pruning keeps the list and its persisted form minimal)."""
        if self.fresh_np.size:
            keep = ~np.isin(self.fresh_np, np.asarray(slots, dtype=np.int64))
            if not keep.all():
                self.fresh_np = self.fresh_np[keep]
                self._fresh_cache = None

    def _fresh_state(self, cap: int):
        # keyed on cap too: reserve() grows the validity mask between
        # searches and the probe mask must match its new length
        if self._fresh_cache is None or self._fresh_cache[0] != cap:
            f = self.fresh_np
            f_pad = max(((len(f) + 127) // 128) * 128, 128)
            padded = np.full(f_pad, -1, dtype=np.int32)
            padded[: len(f)] = f
            fresh_dev = jnp.asarray(padded)
            self._fresh_cache = (cap, fresh_dev, _fresh_probe_mask(fresh_dev, cap))
        return self._fresh_cache[1], self._fresh_cache[2]

    def _probe_pallas_ok(self, index, q, k: int) -> bool:
        """Dense-layout probes ride the double-buffered Pallas DMA kernel
        (ops/pallas_probe.py) when the backend allows it — XLA's gather
        lowering leaves the block gather ~15× off the DMA roofline."""
        from .exact import _use_pallas
        from .ops import pallas_scan

        # the grouped kernels pad their (query, probe) pair list to a lane
        # multiple internally, so ANY query count rides them (single-query
        # serving included); only the per-query pair kernel needs Q % 8 == 0.
        # b1 binary metrics ride the kernels too: the in-kernel bit-plane
        # dot (pallas_probe._win_dots) makes hamming exactly the L2sq rank
        # form over popcount stats; tanimoto/sorensen (non-affine in the
        # per-lane constants) SELECT by hamming in-kernel and re-rank
        # exactly outside via the popcount identity
        # (_ivf_probe_search_dense_binary).
        kernel_metric_ok = pallas_scan.supports(
            index._metric_kind, index._dtype
        ) or (
            index._metric_kind
            in (MetricKind.Hamming, MetricKind.Tanimoto, MetricKind.Sorensen)
            and index._dtype == ScalarKind.B1
        )
        return (
            _use_pallas()
            and k <= 128
            and (_PROBE_MODE != "pair" or q.shape[0] % 8 == 0)
            and kernel_metric_ok
            and index._metric_fn is None  # UDFs score on gathered candidates
        )

    def _live_frac(self, valid) -> float:
        """Fraction of live slots in the composed validity mask, cached by
        mask identity — one scalar fetch per (table version, filter)."""
        c = self._live_cache
        if c is None or c[0] is not valid:
            self._live_cache = (valid, float(jnp.mean(valid)))
        return self._live_cache[1]

    def _binned_ok(self, index, valid, k: int, nprobe: int, w_pad: int) -> bool:
        """Preconditions for the fold-free binned kernel: i8 storage,
        dot-selectable metric, a probe surface wide enough that 1-per-32-row
        bin candidates cover k, and a mostly-live mask (deleted/filtered
        rows are masked after the merge, not during selection)."""
        nbins = _BIN_KEEP * (w_pad // _BIN_BW)
        return (
            _PROBE_MODE == "bin"
            and index._dtype == ScalarKind.I8
            and index._metric_kind in (MetricKind.IP, MetricKind.Cos, MetricKind.L2sq)
            and index._table.shape[1] <= 2048
            and nprobe * nbins >= 8 * k
            and self._live_frac(valid) >= _BIN_LIVE_FLOOR
        )

    def nprobe_for(self, expansion_search: int, connectivity: int = 16) -> int:
        budget = max(expansion_search, 1) * max(connectivity, 1)
        c, _ = self._shape()
        return int(np.clip(math.ceil(budget / self.avg_rows_per_part), 1, c))

    def scanned_rows(self, expansion_search: int, connectivity: int = 16) -> int:
        return int(
            self.nprobe_for(expansion_search, connectivity) * self._shape()[1]
            + self.fresh_np.size
        )

    def search(self, index, q, valid, k: int, expansion_search: int):
        nprobe = self.nprobe_for(expansion_search, index._connectivity)
        fresh_n = int(self.fresh_np.size)
        if fresh_n:
            fresh_dev, probe_mask = self._fresh_state(int(valid.shape[0]))
            c = self._probe_valid_cache
            if c is None or c[0] is not valid or c[1] is not probe_mask:
                self._probe_valid_cache = (
                    valid, probe_mask, jnp.logical_and(valid, probe_mask)
                )
            probe_valid = self._probe_valid_cache[2]
        else:
            probe_valid = valid
        d, slots = self._search_built(index, q, probe_valid, k, nprobe)
        if fresh_n:
            kf = min(k, int(fresh_dev.shape[0]))
            df, sf = _fresh_topk(
                index._metric_kind,
                index._dtype,
                q,
                index._table,
                index._stats,
                valid,
                fresh_dev,
                index._ndim,
                kf,
                index._metric_fn,
            )
            return merge_topk(jnp.asarray(d), jnp.asarray(slots),
                              df, sf.astype(jnp.int32), k)
        return d, slots

    def _search_built(self, index, q, valid, k: int, nprobe: int):
        if self.inplace_shape is not None:
            if self.spilled and self.shadow_np_pos.size:
                # shadow duplicates: probe with the extended mask at doubled
                # depth, map winners to primary slots, drop duplicates
                kk = min(2 * k, 128)
                valid_ext = self._shadow_valid(valid)
                d, slots = self._search_dense(index, q, valid_ext, kk, nprobe)
                pos, src = self._shadows()
                slots = _shadow_canon(jnp.asarray(slots), pos, src)
                return _dedup_trim_host(d, slots, k)
            return self._search_dense(index, q, valid, k, nprobe)
        kk = min(2 * k, int(self.part_slots.shape[0] * self.part_slots.shape[1])) \
            if self.spilled else k
        pv = self._pv_cache
        if pv is None or pv[0] is not valid:
            self._pv_cache = (valid, _part_valid_compute(valid, self.part_slots))
        d, slots = _ivf_probe_search(
            index._metric_kind,
            index._dtype,
            q,
            self._pv_cache[1],
            self.centroids,
            self.part_table,
            self.part_stats,
            self.part_slots,
            index._ndim,
            kk,
            nprobe,
            index._metric_fn,
        )
        if self.spilled and kk > k:
            # spilled rows live in two partitions: a probe that hits both
            # yields the same slot twice; keep first occurrences (ascending
            # distance order), trim to k.
            return _dedup_trim_host(d, slots, k)
        return d, slots

    def _search_dense(self, index, q, valid, k: int, nprobe: int):
        # over-cap batches split into sequential kernel launches (the
        # Q=16384 single-launch configuration faulted the TPU worker at
        # 100M scale); results concatenate exactly — each query's result
        # depends only on its own probe windows
        if q.shape[0] > _PROBE_QCHUNK:
            parts = [
                self._search_dense(
                    index, q[off : off + _PROBE_QCHUNK], valid, k, nprobe
                )
                for off in range(0, int(q.shape[0]), _PROBE_QCHUNK)
            ]
            return (
                jnp.concatenate([d for d, _ in parts]),
                jnp.concatenate([s for _, s in parts]),
            )
        # +128: window starts are aligned DOWN to 128 rows for the
        # DMA, so the padded window must cover p_win + the shift
        w_pad = max(((self.p_win + 127) // 128) * 128 + 128, 256)
        if w_pad <= int(index._capacity) and self._probe_pallas_ok(index, q, k):
            args = (
                index._metric_kind,
                index._dtype,
                q,
                valid,
                self.centroids,
                index._table,
                index._stats,
                self.starts,
                self.lens,
                k,
                nprobe,
                w_pad,
            )
            if index._metric_kind in (MetricKind.Tanimoto, MetricKind.Sorensen):
                # hamming-selected, exactly re-ranked (popcount identity)
                return _ivf_probe_search_dense_binary(*args)
            if _PROBE_MODE == "pair":
                return _ivf_probe_search_dense_pallas(*args)
            if _PROBE_MODE == "bin" and self._binned_ok(
                index, valid, k, nprobe, w_pad
            ):
                return _ivf_probe_search_dense_binned(
                    *args, 128, _BIN_BW, _BIN_KEEP
                )
            if (
                _PROBE_MODE in ("nofold", "bin")
                and k <= 64
                and nprobe * (w_pad // 128) >= 8 * k
            ):
                # wide probe surfaces: bin_m=4 per 128-row bin (the v1
                # kernel's recall-proven density) merged exactly outside;
                # small surfaces fall through to the grouped kernel's
                # exact-in-window bin_m=k
                return _ivf_probe_search_dense_nofold(*args)
            # grouped kernel scoped-VMEM guard: the exact-in-window mode
            # (bin_m=k, taken when the probe surface is narrow) keeps ~k
            # live [w_pad, g] window surfaces on the stack; past the
            # kernel's 96 MB ceiling fall back to the XLA probe. bin_m is
            # clamped to the kernel's own min(k, 16) so large k doesn't
            # over-estimate. The rank-form in-loop distances
            # (_window_dists) keep L2sq/cos inside the same envelope as IP
            # (verified scripts/tpu_grouped_vmem_matrix.py: all metrics OK
            # at w_pad 4352 / bin_m 10).
            bin_m_eff = 4 if nprobe * (w_pad // 128) >= 8 * k else min(k, 16)
            if (bin_m_eff + 15) * w_pad * 512 <= 96 * 1024 * 1024:
                return _ivf_probe_search_dense_grouped(
                    *args, 128, self._live_frac(valid) >= 1.0
                )
        return _ivf_probe_search_dense(
            index._metric_kind,
            index._dtype,
            q,
            valid,
            self.centroids,
            index._table,
            index._stats,
            self.starts,
            self.lens,
            index._ndim,
            k,
            nprobe,
            self.p_win,
            self.block,
            index._metric_fn,
        )



@jax.jit
def _part_valid_compute(valid, part_slots):
    """Partition-aligned validity [C, P]: pad slots (-1) and deleted rows
    are False. One flat gather per VALIDITY CHANGE instead of one per query
    chunk — the per-chunk ``valid[cand]`` elementwise gather lowered to a
    slow scalar gather (~80 ms per batch at width 10240, TPU microprofile),
    while ``part_valid[prc]`` rides the same block-DMA as the row gather."""
    return (part_slots >= 0) & valid[jnp.maximum(part_slots, 0)]


@functools.partial(jax.jit, static_argnums=(0, 1, 8, 9, 10, 11))
def _ivf_probe_search(
    metric: MetricKind,
    kind: ScalarKind,
    q,                # [Q, D] storage dtype
    part_valid,       # [C, P] bool (pad ∧ deletion mask, partition-aligned)
    centroids,        # [C, D] f32
    part_table,       # [C, P, D]
    part_stats,       # [C, P, 2]
    part_slots,       # [C, P] i32
    ndim: int,
    k: int,
    nprobe: int,
    metric_fn=None,
):
    """Probe `nprobe` partitions per query; candidates arrive as whole
    partition blocks (contiguous reads). Queries run in fixed chunks so the
    [chunk, nprobe, P, D] gather stays bounded."""
    from .ops.distances import row_stats

    n_q = q.shape[0]
    p = part_table.shape[1]
    q_stats = row_stats(q, kind)
    qf = _query_f32(kind, q, metric)

    # empty partitions (all entries invalid/pad) rank last so probe slots
    # are never spent gathering fully-masked blocks
    probes = _probe_select(
        _centroid_metric(metric), qf, centroids,
        jnp.sum(part_valid, axis=1, dtype=jnp.int32), nprobe,
    )  # [Q, nprobe]

    # chunk size bounded so the gathered [chunk, nprobe*P, D] tensor stays
    # within a fixed HBM budget
    row_bytes = part_table.shape[-1] * part_table.dtype.itemsize + 12
    generic = metric_fn is not None or metric in GENERIC_PROBE_METRICS
    if metric == MetricKind.Jaccard:
        # the membership comparison broadcasts [chunk, X, Wq, Wt] bools
        row_bytes *= max(part_table.shape[-1], 1)
    elif generic:
        # broadcast f32 intermediates ([chunk, X, D] for divergence/UDF)
        row_bytes *= 8
    budget = 128 * 1024 * 1024
    chunk = int(np.clip(budget // max(nprobe * p * row_bytes, 1), 8, _QUERY_CHUNK))
    chunk = min(chunk, n_q)
    n_chunks = (n_q + chunk - 1) // chunk
    pad = n_chunks * chunk - n_q
    if pad:
        q = jnp.concatenate([q, q[:pad]])
        q_stats = jnp.concatenate([q_stats, q_stats[:pad]])
        probes = jnp.concatenate([probes, probes[:pad]])

    q_c = q.reshape(n_chunks, chunk, -1)
    qs_c = q_stats.reshape(n_chunks, chunk, 2)
    pr_c = probes.reshape(n_chunks, chunk, nprobe)

    def one_chunk(args):
        qc, qsc, prc = args
        # block gather: [chunk, nprobe, P, ...] — contiguous [P, D] reads
        rows = part_table[prc].reshape(chunk, nprobe * p, -1)
        rstats = part_stats[prc].reshape(chunk, nprobe * p, 2)
        cand = part_slots[prc].reshape(chunk, nprobe * p)
        ok = part_valid[prc].reshape(chunk, nprobe * p)

        if generic:
            from .ops.distances import gathered_dists

            dist = gathered_dists(metric, kind, qc, rows, ndim, metric_fn)
        else:
            # raw-operand batched matvec: no widened HBM copy (see
            # _dense_probe_core)
            bdims = (((1,), (2,)), ((0,), (0,)))
            d_ = _probe_dot(kind, qc, rows, bdims)
            q_sq = qsc[:, 0]
            t_sq = rstats[..., 0]
            dist = _probe_metric_dists(
                metric, d_, q_sq, t_sq, qsc[:, 1], rstats[..., 1], ndim
            )
        dist = jnp.where(ok, dist, MASKED)
        kk = min(k, dist.shape[1])
        d_out, ids = _staged_topk(dist, cand, kk)
        ids = jnp.where(d_out >= MASKED / 2, -1, ids)
        if k > kk:
            extra = k - kk
            d_out = jnp.concatenate([d_out, jnp.full((chunk, extra), MASKED)], axis=1)
            ids = jnp.concatenate([ids, jnp.full((chunk, extra), -1, jnp.int32)], axis=1)
        return d_out, ids

    d_all, i_all = jax.lax.map(one_chunk, (q_c, qs_c, pr_c))
    d_all = d_all.reshape(n_chunks * chunk, k)[:n_q]
    i_all = i_all.reshape(n_chunks * chunk, k)[:n_q]
    return d_all, i_all.astype(jnp.int32)


def _dense_probe_core(
    metric, kind, qc, qsc, prc, starts, lens, vblk, tblk, sblk, cap2, block,
    nblk, k, ndim=0, metric_fn=None,
):
    """Score one query chunk against its probed windows in the dense layout.
    Traceable core shared by the single-chip probe and the sharded
    (shard_map) probe. ``vblk`` is the validity mask pre-reshaped to
    [nb, block]: gathered through the SAME bidx block-DMA pattern as the
    rows — a flat ``valid[cand]`` elementwise gather lowered to a slow
    scalar gather and cost ~80 ms of a 131 ms probe batch on TPU.
    Returns (dists [chunk, k], local positions [chunk, k])."""
    chunk, nprobe = prc.shape
    nb = tblk.shape[0]
    r = nblk * block
    st = starts[prc]                                 # [chunk, nprobe]
    ln = lens[prc]
    blk0 = st // block
    bidx = jnp.minimum(
        blk0[:, :, None]
        + jax.lax.broadcasted_iota(jnp.int32, (chunk, nprobe, nblk), 2),
        nb - 1,
    )
    rows = tblk[bidx].reshape(chunk, nprobe * r, -1)  # block gather
    # global positions of the gathered rows (positions ARE slots)
    cand = (
        (blk0 * block)[:, :, None]
        + jax.lax.broadcasted_iota(jnp.int32, (chunk, nprobe, r), 2)
    ).reshape(chunk, nprobe * r)
    st_f = jnp.repeat(st, r, axis=1)
    ln_f = jnp.repeat(ln, r, axis=1)
    in_win = (cand >= st_f) & (cand < st_f + ln_f) & (cand < cap2)
    # clamped duplicate blocks carry misaligned validity rows, but their
    # cand positions fail in_win, so the mismatch never surfaces
    ok = in_win & vblk[bidx].reshape(chunk, nprobe * r)

    # Batched matvec on RAW storage operands: dot_general widens i8 inside
    # the fused contraction. (An explicit .astype(int32) before an einsum
    # materialized the widened [chunk, nprobe*r, D] tensor in HBM — 4x the
    # gather bytes again as i32 write+read; it dominated probe time at 100M:
    # 16 ms/chunk observed vs ~0.3 ms of useful gather traffic.)
    if metric_fn is not None or metric in GENERIC_PROBE_METRICS:
        from .ops.distances import gathered_dists

        dist = gathered_dists(metric, kind, qc, rows, ndim, metric_fn)
    else:
        bdims = (((1,), (2,)), ((0,), (0,)))
        d_ = _probe_dot(kind, qc, rows, bdims)
        q_sq = qsc[:, 0]
        if metric != MetricKind.IP:
            sg = sblk[bidx]
            t_sq = sg[..., 0].reshape(chunk, nprobe * r)
            t_sum = sg[..., 1].reshape(chunk, nprobe * r)
        else:
            t_sq = t_sum = None
        dist = _probe_metric_dists(metric, d_, q_sq, t_sq, qsc[:, 1], t_sum, ndim)
    dist = jnp.where(ok, dist, MASKED)
    kk = min(k, dist.shape[1])
    d_out, ids = _staged_topk(dist, cand, kk)
    ids = jnp.where(d_out >= MASKED / 2, -1, ids)
    if k > kk:
        extra = k - kk
        d_out = jnp.concatenate([d_out, jnp.full((chunk, extra), MASKED)], axis=1)
        ids = jnp.concatenate([ids, jnp.full((chunk, extra), -1, jnp.int32)], axis=1)
    return d_out, ids


#: binary metrics with an IVF probe path: the coarse quantizer runs over the
#: UNPACKED {0,1} bit space (hamming distance IS squared L2 there), and the
#: candidate scoring uses bit-dots + popcount identities (reference binary
#: metric semantics: index_plugins.hpp:1392-1478; HNSW over binary indexes:
#: cpp/test.cpp:780 test_tanimoto)
BINARY_PROBE_METRICS = (
    MetricKind.Hamming, MetricKind.Tanimoto, MetricKind.Sorensen
)

#: metrics with no dot decomposition: probed candidates are scored by the
#: full per-pair formula on the gathered rows (distances.gathered_dists) —
#: sub-linear serving for the whole metric tail, matching the reference's
#: metric-generic HNSW (index.hpp:1936; set-vector HNSW cpp/test.cpp:909)
GENERIC_PROBE_METRICS = (
    MetricKind.Haversine, MetricKind.Divergence, MetricKind.Jaccard
)


#: presence-sketch width for sorted-set rows (jaccard set indexes): the
#: coarse quantizer clusters sets in this dense space
_SET_SKETCH_DIM = 128


def _set_sketch(rows):
    """Embed padded sorted-integer-set rows [N, W] (-1 = pad) into a dense
    presence histogram [N, S] f32: each element hashes (Knuth multiplicative)
    to one of S buckets. Jaccard-similar sets share most elements, hence
    most bucket counts — L2 over sketches ranks the same neighborhoods, so
    a plain k-means partitions them for probing (the candidate scoring then
    computes EXACT jaccard on the gathered set rows)."""
    r = rows.astype(jnp.uint32)
    ok = rows != -1
    h = ((r * jnp.uint32(2654435761)) >> 7) % jnp.uint32(_SET_SKETCH_DIM)
    one = jax.nn.one_hot(h.astype(jnp.int32), _SET_SKETCH_DIM, dtype=jnp.float32)
    return jnp.sum(one * ok[..., None].astype(jnp.float32), axis=-2)


def _query_f32(kind, q, metric=None):
    """Query rows in centroid space: unpacked {0,1} bits for b1 storage,
    presence sketches for int32 set rows, the Hellinger embedding (sqrt of
    the probability coordinates — L2 there tracks JS divergence) for the
    divergence metric (all matching the quantizer's fit space), plain f32
    cast otherwise."""
    if kind == ScalarKind.B1:
        from .ops.packbits import unpack_bits

        return unpack_bits(q).astype(jnp.float32)
    if q.dtype == jnp.int32:  # sorted-set storage (jaccard set index)
        return _set_sketch(q)
    qf = q.astype(jnp.float32)
    if metric == MetricKind.Divergence:
        return jnp.sqrt(jnp.maximum(qf, 0.0))
    return qf


def _centroid_metric(metric):
    """Partition-ranking metric: binary metrics rank by L2 over the bit
    space (hamming == l2sq on {0,1} vectors; tanimoto/sorensen are
    popcount-normalized variants of the same neighborhood structure);
    pearson and the generic tail (haversine/divergence/jaccard-sketch/UDF)
    rank by L2 too, matching their quantizer fit space — each metric's own
    epilogue applies exactly on the probed candidates."""
    if metric in (MetricKind.IP, MetricKind.Cos, MetricKind.L2sq):
        return metric
    return MetricKind.L2sq


def _probe_dot(kind, qc, rows, bdims):
    """Batched candidate dot on RAW storage operands; b1 computes
    popcount(a AND b) bit-plane-wise on the PACKED bytes (bit_dot) so the
    8x-unpacked candidate tensor never materializes in HBM."""
    if kind == ScalarKind.B1:
        from .ops.packbits import bit_dot

        return bit_dot(qc, rows, bdims)
    if kind == ScalarKind.I8:
        return jax.lax.dot_general(qc, rows, bdims, preferred_element_type=jnp.int32)
    if qc.dtype == jnp.float32:
        return jax.lax.dot_general(qc, rows, bdims, precision=jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(qc, rows, bdims, preferred_element_type=jnp.float32)


def _probe_metric_dists(metric, d_, q_sq, t_sq, q_sum=None, t_sum=None, ndim=0):
    """Probe epilogue: raw dots [chunk, X] + per-query stat q_sq [chunk] +
    per-candidate stat t_sq [chunk, X] → final distances. For b1 storage
    the stats carry popcounts and the dot is the and-count, so the binary
    identities apply directly. ``t_sq`` may be None for IP (unused);
    pearson additionally needs the sum stats + the logical ndim."""
    d_ = d_.astype(jnp.float32)
    if metric == MetricKind.IP:
        return 1.0 - d_
    if metric == MetricKind.Pearson:
        # one-pass sample correlation (reference metric_pearson_gt,
        # index_plugins.hpp:1511-1550) over the probed candidates
        n = jnp.float32(ndim)
        num = n * d_ - q_sum[:, None] * t_sum
        den = (n * q_sq - q_sum * q_sum)[:, None] * (n * t_sq - t_sum * t_sum)
        safe = jnp.where(den <= 0.0, 1.0, den)
        return jnp.where(den <= 0.0, 0.0, 1.0 - num / jnp.sqrt(safe))
    if metric == MetricKind.Cos:
        denom = jnp.sqrt(q_sq)[:, None] * jnp.sqrt(t_sq)
        safe_d = jnp.where(denom == 0, 1.0, denom)
        base = 1.0 - d_ / safe_d
        one_zero = (q_sq[:, None] == 0) ^ (t_sq == 0)
        both_zero = (q_sq[:, None] == 0) & (t_sq == 0)
        return jnp.where(both_zero, 0.0, jnp.where(one_zero, 1.0, base))
    if metric == MetricKind.L2sq:
        return jnp.maximum(q_sq[:, None] + t_sq - 2.0 * d_, 0.0)
    pop_q, pop_t = q_sq[:, None], t_sq
    if metric == MetricKind.Hamming:
        return pop_q + pop_t - 2.0 * d_
    if metric == MetricKind.Tanimoto:
        union = pop_q + pop_t - d_
        return jnp.where(union == 0.0, 0.0, 1.0 - d_ / jnp.where(union == 0.0, 1.0, union))
    if metric == MetricKind.Sorensen:
        denom = pop_q + pop_t
        return jnp.where(denom == 0.0, 0.0, 1.0 - 2.0 * d_ / jnp.where(denom == 0.0, 1.0, denom))
    raise ValueError(f"probe epilogue: unsupported metric {metric}")


def _score_centroids(metric, qf, centroids, lens=None):
    """Rank partitions for probing; empty (len 0) chunks rank last."""
    dots = jax.lax.dot_general(
        qf, centroids, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if metric == MetricKind.L2sq:
        c_sq = jnp.sum(centroids * centroids, axis=1)
        q_sq0 = jnp.sum(qf * qf, axis=1, keepdims=True)
        cdist = q_sq0 + c_sq[None, :] - 2.0 * dots
    else:
        cdist = -dots
    if lens is not None:
        cdist = cdist + jnp.where(lens == 0, MASKED, 0.0)[None, :]
    return cdist


#: query-chunk for the coarse probe selection: bounds the [chunk, C] score
#: matrix. The full [Q, C] surface was THE r3/r4 "Q=16384 fault" — at
#: Q=16384 x C=65536 it is 4.3 GB of f32 (plus top_k temporaries) on top of
#: a 12.3 GB table, and the launch died with RESOURCE_EXHAUSTED (bisected
#: in scripts/tpu_qfault_bisect.py: pair count, nprobe, grid and the 2^31
#: table-byte boundary all pass; the fault follows Q x C x table-residency).
_COARSE_QCHUNK = 2048

#: coarse-selection reduction: "approx" = lax.approx_max_k (TPU-optimized
#: partial reduce; measured 8x faster than lax.top_k at [2048, 65536] —
#: 248 ms -> 7 ms real per Q=16384 batch, selection recall 0.985 at the
#: default target), "exact" = lax.top_k, "auto" = approx on accelerators,
#: exact on CPU (keeps tests bit-deterministic). The partitions approx
#: misses are the marginal tail of the nprobe ranking, so the effect on
#: final recall@10 is far below the selection-recall delta.
_COARSE_SELECT = _os.environ.get("USEARCH_TPU_COARSE", "auto")
_COARSE_RT = float(_os.environ.get("USEARCH_TPU_COARSE_RT", "0.95"))


def _coarse_topk_ids(neg_scores, nprobe):
    approx = _COARSE_SELECT == "approx" or (
        _COARSE_SELECT == "auto" and jax.default_backend() != "cpu"
    )
    if approx and nprobe < neg_scores.shape[-1]:
        return jax.lax.approx_max_k(neg_scores, nprobe, recall_target=_COARSE_RT)[1]
    return jax.lax.top_k(neg_scores, nprobe)[1]


def _probe_select(metric, qf, centroids, lens, nprobe):
    """Top-``nprobe`` partitions per query with the [*, C] score surface
    bounded to ``_COARSE_QCHUNK`` queries at a time."""
    n_q = qf.shape[0]
    chunk = _COARSE_QCHUNK
    if n_q <= chunk:
        return _coarse_topk_ids(-_score_centroids(metric, qf, centroids, lens), nprobe)
    pad = (-n_q) % chunk
    qp = jnp.concatenate([qf, qf[:pad]]) if pad else qf

    def one(qc):
        return _coarse_topk_ids(-_score_centroids(metric, qc, centroids, lens), nprobe)

    probes = jax.lax.map(one, qp.reshape(-1, chunk, qf.shape[1]))
    return probes.reshape(-1, nprobe)[:n_q]


def _binned_pairs(q, probes, starts, lens, cap2, w_pad, nprobe, g):
    """Shared (query, probe)-pair construction for the grouped kernels:
    pairs sorted by partition so a cell's distinct windows are DMA'd once;
    returns the gathered pair rows, packed SMEM metadata and the inverse
    permutation back to (query, probe) order."""
    n_q = q.shape[0]
    c = lens.shape[0]
    p0 = n_q * nprobe
    p_total = ((p0 + g - 1) // g) * g
    part = probes.reshape(-1)
    qid = jnp.arange(p0, dtype=jnp.int32) // nprobe
    if p_total > p0:
        part = jnp.concatenate([part, jnp.full(p_total - p0, c, jnp.int32)])
        qid = jnp.concatenate([qid, jnp.zeros(p_total - p0, jnp.int32)])
    order = jnp.argsort(part)                              # pads (=c) sort last
    part_s = part[order]
    qid_s = qid[order]

    starts_ext = jnp.concatenate([starts, jnp.zeros(1, starts.dtype)])
    lens_ext = jnp.concatenate([lens, jnp.zeros(1, lens.dtype)])
    st_raw = starts_ext[part_s].astype(jnp.int32)
    ln = lens_ext[part_s].astype(jnp.int32)
    st_c = jnp.minimum((st_raw // 128) * 128, cap2 - w_pad)
    off = st_raw - st_c

    cells = p_total // g
    ps2 = part_s.reshape(cells, g)
    prev = jnp.concatenate([jnp.full((cells, 1), -1, ps2.dtype), ps2[:, :-1]], axis=1)
    flag = ps2 != prev                                     # window transitions
    widx = jnp.cumsum(flag, axis=1) - 1                    # [cells, g] slot per pair
    wcnt = jnp.sum(flag, axis=1, dtype=jnp.int32)
    # dense per-cell window lists WITHOUT scatters: the flagged pairs
    # (window starts) appear in lane order, so a stable per-cell
    # lane-compaction sort (key: non-starts last) lands window w's
    # (start, off, len) exactly in slot w — 2x cheaper than three
    # [cells, g]-indexed scatters on this backend. Slots >= wcnt hold
    # arbitrary (but range-clamped) survivors; kernels never read them.
    key = jnp.where(flag, 0, 1).astype(jnp.int32)
    _, st_s, off_s, ln_s = jax.lax.sort(
        (key, st_c.reshape(cells, g), off.reshape(cells, g),
         ln.reshape(cells, g)),
        dimension=1, is_stable=True, num_keys=1,
    )
    z = jnp.zeros((cells, g), jnp.int32)
    meta = jnp.stack(
        [st_s, off_s, ln_s, jnp.broadcast_to(wcnt[:, None], (cells, g)),
         z, z, z, z], axis=1,
    )
    q_g = q[qid_s]
    return q_g, qid_s, widx, meta, order, p0, p_total


@functools.partial(jax.jit, static_argnums=(0, 1, 9, 10, 11, 12, 13))
def _ivf_probe_search_dense_nofold(
    metric: MetricKind,
    kind: ScalarKind,
    q,                # [Q, D] storage dtype
    valid,            # [cap2] bool (deletions ∧ filter ∧ fresh)
    centroids,        # [C, D] f32
    table,            # [cap2, D] dense cluster-major
    stats,            # [cap2, 2] f32
    starts,           # [C] i32
    lens,             # [C] i32
    k: int,
    nprobe: int,
    w_pad: int,
    g: int = 128,
    bin_m: int = 4,
):
    """Fold-free grouped probe: the v1 kernel with its in-kernel running
    top-k fold deleted (the fold alone DOUBLED per-window cost). The
    kernel emits each pair's bin_m-per-128-row-bin candidates with FINAL
    metric distances (epilogue + off/len/lane masks + deleted-row penalty
    all unchanged in-kernel); the exact merge is a per-window top-t plus
    one staged top-k outside. Selection semantics — and therefore recall —
    are identical to the v1 grouped kernel's recall-proven extract."""
    from .ops.pallas_probe import pallas_ivf_probe_grouped_nofold

    n_q, d_w = q.shape
    cap2 = table.shape[0]
    qf = _query_f32(kind, q)
    probes = _probe_select(_centroid_metric(metric), qf, centroids, lens, nprobe)

    q_g, qid_s, widx, meta, order, p0, p_total = _binned_pairs(
        q, probes, starts, lens, cap2, w_pad, nprobe, g
    )
    q_sq = jnp.sum(qf * qf, axis=1)
    q_sum = jnp.sum(qf, axis=1)
    q_aux_g = jnp.zeros((p_total, 8), jnp.float32)
    q_aux_g = q_aux_g.at[:, 0].set(q_sq[qid_s])
    q_aux_g = q_aux_g.at[:, 1].set(q_sum[qid_s])
    q_aux_g = q_aux_g.at[:, 2].set(widx.reshape(-1).astype(jnp.float32))

    penalty = jnp.where(valid, 0.0, MASKED).astype(jnp.float32)
    if metric == MetricKind.IP:
        t_aux = penalty[None, :]
    else:
        t_aux = jnp.stack(
            [stats[:, 0], stats[:, 1], penalty, jnp.zeros_like(penalty)], axis=0
        )

    pd, pi = pallas_ivf_probe_grouped_nofold(
        metric, q_g, q_aux_g, table, t_aux, meta, w_pad, g, bin_m,
        jax.default_backend() == "cpu",
    )

    # exact per-window top-t (width ≤ a few lane rows), then the staged
    # cross-window merge in original pair order
    out_pad = pd.shape[1]
    t = min(max(k, 16), out_pad)
    wn, ws = jax.lax.top_k(-pd, t)                         # [P, t]
    wd = -wn
    wi = jnp.take_along_axis(pi, ws, axis=1)
    inv = jnp.argsort(order)
    r_d = wd[inv[:p0]].reshape(n_q, nprobe * t)
    r_i = wi[inv[:p0]].reshape(n_q, nprobe * t)
    d_out, ids = _staged_topk(r_d, r_i, k)
    return d_out, jnp.where(d_out >= MASKED / 2, -1, ids)


@functools.partial(jax.jit, static_argnums=(0, 1, 9, 10, 11, 12, 13))
def _ivf_probe_search_dense_binary(
    metric: MetricKind,
    kind: ScalarKind,
    q,                # [Q, W] packed uint8 rows
    valid,            # [cap2] bool
    centroids,        # [C, D] f32 (unpacked bit space)
    table,            # [cap2, W] uint8 dense cluster-major
    stats,            # [cap2, 2] f32 — col 0 carries POPCOUNTS for b1
    starts,           # [C] i32
    lens,             # [C] i32
    k: int,
    nprobe: int,
    w_pad: int,
    g: int = 128,
    bin_m: int = 8,
):
    """Tanimoto/sorensen over packed-bit tables via the grouped Pallas
    window kernel: candidates are SELECTED by hamming (the kernel's
    L2sq-rank-form-over-popcount path — in-kernel bit-plane and-counts,
    pallas_probe._win_dots) and re-ranked EXACTLY outside through the
    popcount identity ``and = (pop(q) + pop(t) - hamming) / 2`` — the
    intersection count is recoverable from the kernel's hamming output
    plus the stats row, so the true metric costs one [Q, kk] stats gather
    and NO candidate row fetch. The re-rank happens per-window BEFORE any
    cross-window merge, so the only hamming-ordered selection is the
    kernel's top-``bin_m``-per-128-row-bin extract — hamming values are
    small integers with pervasive ties that tanimoto breaks differently,
    which is why ``bin_m`` defaults to 8 here (4 → 0.85 recall@10, 8 →
    0.99 on the clustered test corpus). The reference serves these
    metrics through the same graph walk it uses for hamming
    (index_plugins.hpp:1420-1478, cpp/test.cpp:780)."""
    from .ops.pallas_probe import pallas_ivf_probe_grouped_nofold

    n_q, d_w = q.shape
    cap2 = table.shape[0]
    qf = _query_f32(kind, q)
    probes = _probe_select(MetricKind.L2sq, qf, centroids, lens, nprobe)

    q_g, qid_s, widx, meta, order, p0, p_total = _binned_pairs(
        q, probes, starts, lens, cap2, w_pad, nprobe, g
    )
    q_sq = jnp.sum(qf * qf, axis=1)                        # == popcount(q)
    q_aux_g = jnp.zeros((p_total, 8), jnp.float32)
    q_aux_g = q_aux_g.at[:, 0].set(q_sq[qid_s])
    q_aux_g = q_aux_g.at[:, 1].set(q_sq[qid_s])
    q_aux_g = q_aux_g.at[:, 2].set(widx.reshape(-1).astype(jnp.float32))

    penalty = jnp.where(valid, 0.0, MASKED).astype(jnp.float32)
    t_aux = jnp.stack(
        [stats[:, 0], stats[:, 1], penalty, jnp.zeros_like(penalty)], axis=0
    )

    pd, pi = pallas_ivf_probe_grouped_nofold(
        MetricKind.Hamming, q_g, q_aux_g, table, t_aux, meta, w_pad, g, bin_m,
        jax.default_backend() == "cpu",
    )

    # per-window top-t by hamming (the only place selection order matters:
    # within one window's candidates), then re-rank those t to the TRUE
    # metric via the popcount identity BEFORE any cross-window merge — the
    # merges run on final metric values, so they lose nothing
    out_pad = pd.shape[1]
    t = min(max(2 * k, 24), out_pad)
    wn, ws = jax.lax.top_k(-pd, t)                         # [P, t]
    d_h = -wn                                              # hamming dists
    wi = jnp.take_along_axis(pi, ws, axis=1)

    safe = jnp.clip(wi, 0, cap2 - 1)
    pop_t = stats[safe, 0]                                 # [P, t]
    pop_q = q_sq[qid_s][:, None]                           # [P, 1] pair query
    and_ = jnp.maximum((pop_q + pop_t - d_h) * 0.5, 0.0)
    if metric == MetricKind.Tanimoto:
        union = pop_q + pop_t - and_
        dt = jnp.where(
            union == 0.0, 0.0, 1.0 - and_ / jnp.where(union == 0.0, 1.0, union)
        )
    elif metric == MetricKind.Sorensen:
        den = pop_q + pop_t
        dt = jnp.where(
            den == 0.0, 0.0, 1.0 - 2.0 * and_ / jnp.where(den == 0.0, 1.0, den)
        )
    else:
        raise ValueError(f"binary rerank serves tanimoto/sorensen, got {metric}")
    dt = jnp.where((wi >= 0) & (d_h < MASKED / 2), dt, MASKED)

    inv = jnp.argsort(order)
    r_d = dt[inv[:p0]].reshape(n_q, nprobe * t)            # true metric
    r_i = wi[inv[:p0]].reshape(n_q, nprobe * t)
    d_out, ids = _staged_topk(r_d, r_i, k)
    return d_out, jnp.where(d_out >= MASKED / 2, -1, ids)


@functools.partial(jax.jit, static_argnums=(0, 1, 9, 10, 11, 12, 13, 14))
def _ivf_probe_search_dense_binned(
    metric: MetricKind,
    kind: ScalarKind,
    q,                # [Q, D] i8 storage rows
    valid,            # [cap2] bool (deletions ∧ filter ∧ fresh)
    centroids,        # [C, D] f32
    table,            # [cap2, D] i8 dense cluster-major
    stats,            # [cap2, 2] f32
    starts,           # [C] i32
    lens,             # [C] i32
    k: int,
    nprobe: int,
    w_pad: int,
    g: int = 128,
    bw: Optional[int] = None,
    keep: Optional[int] = None,
):
    """Fold-free binned probe (i8 tables): the Pallas kernel emits each
    pair's per-32-row-bin winners selected by raw MXU dot; the exact
    top-k merge, true metric distances, deleted/filter masking and
    duplicate removal all run OUTSIDE in XLA on the merged top-(k+slack).

    vs the v1 grouped kernel this deletes the in-kernel running fold and
    every per-window epilogue/mask pass (measured 2× + 2× of window time,
    scripts/tpu_probe_kernel_profile.py). Selection by raw dot is exact
    for IP; for cos/l2sq on i8 it rides the storage invariant that i8
    rows are unit-normalized (±127 scale), so per-row norms vary only by
    truncation — true distances are still computed exactly for the merged
    candidates via the stats gather below. Callers must route heavily
    masked searches (low live fraction) to the masked paths instead."""
    from .ops.pallas_probe import pallas_ivf_probe_binned

    n_q, d_w = q.shape
    cap2 = table.shape[0]
    qf = _query_f32(kind, q)
    probes = _probe_select(_centroid_metric(metric), qf, centroids, lens, nprobe)

    q_g, qid_s, widx, meta, order, p0, p_total = _binned_pairs(
        q, probes, starts, lens, cap2, w_pad, nprobe, g
    )
    q_aux_g = jnp.zeros((p_total, 8), jnp.float32)
    q_aux_g = q_aux_g.at[:, 2].set(widx.reshape(-1).astype(jnp.float32))

    # windows-per-iteration: amortize fixed DMA/scalar overhead without
    # overflowing VMEM (wbuf is [2, wb, w_pad, D] i8)
    wb = max(1, min(2, (6 << 20) // max(2 * w_pad * d_w, 1)))
    if bw is None:
        bw = _BIN_BW
    if keep is None:
        keep = _BIN_KEEP
    pd, pi = pallas_ivf_probe_binned(
        q_g, q_aux_g, table, meta, w_pad, g, bw, keep, wb, _BIN_SEL,
        jax.default_backend() == "cpu",
    )

    # exact per-window top-t over the bin winners (width ≤ a few lanes-rows,
    # cheap) BEFORE the cross-window merge: staged_topk keeps top-m per
    # LANE, and raw [nprobe·out_pad] rows alias every window's bin-j onto
    # lane j (out_pad % 128 == 0) — merging unreduced windows dropped real
    # recall (0.92 vs 0.98 XLA at 60k×128 parts)
    out_pad = pd.shape[1]
    # non-IP metrics select by raw dot but rank by the true metric below:
    # wider per-window/merge slack absorbs the i8-norm selection noise
    # (cos/l2sq lost ~0.036 recall at t=16/kk=k+32 on the blob corpus)
    slack = 32 if metric == MetricKind.IP else 96
    t = min(max(k, slack // 2), out_pad)
    wn, ws = jax.lax.top_k(-pd, t)                         # [P, t]
    wd = -wn
    wi = jnp.take_along_axis(pi, ws, axis=1)
    inv = jnp.argsort(order)                               # sorted pos of pair i
    r_d = wd[inv[:p0]].reshape(n_q, nprobe * t)            # raw -dot keys
    r_i = wi[inv[:p0]].reshape(n_q, nprobe * t)
    kk = min(k + slack, nprobe * t)
    d1, i1 = _staged_topk(r_d, r_i, kk)                    # [Q, kk]

    safe = jnp.clip(i1, 0, cap2 - 1)
    alive = valid[safe] & (i1 >= 0)
    dot = -d1                                              # raw i8 dot
    q_sq = jnp.sum(qf * qf, axis=1, keepdims=True)         # [Q, 1]
    if metric == MetricKind.IP:
        dt = 1.0 - dot
    elif metric == MetricKind.Cos:
        t_sq = stats[safe, 0]
        denom = jnp.sqrt(q_sq) * jnp.sqrt(t_sq)
        base = 1.0 - dot / jnp.where(denom == 0.0, 1.0, denom)
        one_zero = (q_sq == 0.0) ^ (t_sq == 0.0)
        both_zero = (q_sq == 0.0) & (t_sq == 0.0)
        dt = jnp.where(both_zero, 0.0, jnp.where(one_zero, 1.0, base))
    elif metric == MetricKind.L2sq:
        t_sq = stats[safe, 0]
        dt = jnp.maximum(q_sq + t_sq - 2.0 * dot, 0.0)
    else:
        raise ValueError(f"binned probe supports ip/cos/l2sq, got {metric}")
    dt = jnp.where(alive & (d1 < MASKED / 2), dt, MASKED)

    # drop duplicate rows (window padding overlaps a probed neighbor):
    # sort by id, mask repeats, then the final exact top-k
    o = jnp.argsort(i1, axis=1)
    si = jnp.take_along_axis(i1, o, axis=1)
    sd = jnp.take_along_axis(dt, o, axis=1)
    dup = si == jnp.concatenate(
        [jnp.full((n_q, 1), -2, si.dtype), si[:, :-1]], axis=1
    )
    sd = jnp.where(dup, MASKED, sd)
    neg, pos = jax.lax.top_k(-sd, k)
    d_out = -neg
    ids = jnp.take_along_axis(si, pos, axis=1)
    return d_out, jnp.where(d_out >= MASKED / 2, -1, ids)


@functools.partial(jax.jit, static_argnums=(0, 1, 9, 10, 11, 12, 13))
def _ivf_probe_search_dense_grouped(
    metric: MetricKind,
    kind: ScalarKind,
    q,                # [Q, D] storage dtype
    valid,            # [cap2] bool
    centroids,        # [C, D] f32
    table,            # [cap2, D] dense cluster-major
    stats,            # [cap2, 2] f32
    starts,           # [C] i32
    lens,             # [C] i32
    k: int,
    nprobe: int,
    w_pad: int,
    g: int = 128,
    all_live: bool = False,
):
    """Partition-GROUPED probe through the Pallas DMA kernel: (query, probe)
    pairs are sorted by partition so queries probing the same partition
    share one window DMA and one [W, D]×[D, G] matmul — at batch sizes where
    partitions are probed by many queries this cuts HBM traffic toward ONE
    table read per batch and runs the MXU at full column utilization (the
    per-query matvec variant measured 5.8× off the DMA roofline).

    Round-1's 'query-grouped probing rejected' analysis (PARITY.md) assumed
    dedup machinery in the XLA gather path; the sorted-pair kernel gets the
    sharing for free via lane masks."""
    from .ops.pallas_probe import pallas_ivf_probe_grouped

    n_q, d_w = q.shape
    cap2 = table.shape[0]
    qf = _query_f32(kind, q)
    probes = _probe_select(_centroid_metric(metric), qf, centroids, lens, nprobe)

    q_g, qid_s, widx, meta, order, p0, p_total = _binned_pairs(
        q, probes, starts, lens, cap2, w_pad, nprobe, g
    )
    q_sq = jnp.sum(qf * qf, axis=1)
    q_sum = jnp.sum(qf, axis=1)
    # q_aux widened to 8 lanes; the pair→window slot rides col 2 as f32
    q_aux_g = jnp.zeros((p_total, 8), jnp.float32)
    q_aux_g = q_aux_g.at[:, 0].set(q_sq[qid_s])
    q_aux_g = q_aux_g.at[:, 1].set(q_sum[qid_s])
    q_aux_g = q_aux_g.at[:, 2].set(widx.reshape(-1).astype(jnp.float32))

    penalty = jnp.where(valid, 0.0, MASKED).astype(jnp.float32)
    if metric == MetricKind.IP:
        t_aux = penalty[None, :]
    else:
        t_aux = jnp.stack(
            [stats[:, 0], stats[:, 1], penalty, jnp.zeros_like(penalty)], axis=0
        )

    bin_m = _GROUP_BINM or (4 if nprobe * (w_pad // 128) >= 8 * k else k)
    # adaptive DMA ring: at sparse probe densities (pairs/chunk < 2)
    # windows stop being back-to-back in HBM and deeper prefetch hides the
    # fetch latency (100M A/Bs at depth 8: nprobe=2 +13%, nprobe=4 +34% —
    # the r4 "nprobe=4-6 dip" was this threshold sitting at density 1/2);
    # at dense coverage depth is neutral, so keep the lean ring there
    n_chunks = int(lens.shape[0])
    ring = _PROBE_RING or (8 if n_q * nprobe < 2 * n_chunks else 2)
    # IP over a fully-live mask skips the per-window aux DMA + penalty add
    # (on-chip: 8.2 → 5.6 us/window at the 100M shape); the caller asserts
    # liveness via `all_live` (a host-known fact, so it is a static arg)
    auxless = all_live and metric == MetricKind.IP
    pd, pi = pallas_ivf_probe_grouped(
        metric, q_g, q_aux_g, table, t_aux, meta,
        k, w_pad, g, min(bin_m, 16),
        jax.default_backend() == "cpu", ring, 1, not auxless,
    )

    # per-pair results back to (query, probe) order via the INVERSE
    # permutation gather — two [P, k] scatters measured 160 ms at the
    # flagship P=1.05M where argsort+gathers run in ~20 ms
    # (scripts/tpu_merge_alternatives.py)
    inv = jnp.argsort(order)
    r_d = pd[inv[:p0]].reshape(n_q, nprobe * k)
    r_i = pi[inv[:p0]].reshape(n_q, nprobe * k)
    d_out, ids = _staged_topk(r_d, r_i, k)
    return d_out, jnp.where(d_out >= MASKED / 2, -1, ids)


@functools.partial(jax.jit, static_argnums=(0, 1, 9, 10, 11))
def _ivf_probe_search_dense_pallas(
    metric: MetricKind,
    kind: ScalarKind,
    q,                # [Q, D] storage dtype, Q % 8 == 0
    valid,            # [cap2] bool (composed: deletions ∧ filter ∧ fresh)
    centroids,        # [C, D] f32
    table,            # [cap2, D] dense cluster-major
    stats,            # [cap2, 2] f32
    starts,           # [C] i32
    lens,             # [C] i32
    k: int,
    nprobe: int,
    w_pad: int,
):
    """Dense-layout probe through the double-buffered Pallas DMA kernel:
    centroid scoring + probe selection stay XLA; each (query, probe) window
    streams HBM→VMEM as ONE contiguous DMA inside the kernel."""
    from .ops.pallas_probe import pallas_ivf_probe

    cap2 = table.shape[0]
    qf = _query_f32(kind, q)
    probes = _probe_select(_centroid_metric(metric), qf, centroids, lens, nprobe)  # empties rank last
    st = starts[probes]
    ln = lens[probes]
    # DMA starts must be 128-row aligned: Mosaic requires dynamic slice
    # indices provably divisible by the memref tiling (sublane tiling for
    # the table rows, 128-lane tiling for the [aux, N] slice). The window
    # mask absorbs the shift via `offs`; w_pad carries the extra 128 rows.
    st_al = (st // 128) * 128
    st_c = jnp.minimum(st_al, cap2 - w_pad)                # clamped DMA starts
    offs = st - st_c
    penalty = jnp.where(valid, 0.0, MASKED).astype(jnp.float32)
    if metric == MetricKind.IP:
        t_aux = penalty[None, :]
    else:
        t_aux = jnp.stack(
            [stats[:, 0], stats[:, 1], penalty, jnp.zeros_like(penalty)], axis=0
        )
    # candidates per bin per window: measured on TPU at 4M×96d (C=4096,
    # blob corpus), bin_m=2 loses real recall when a query's true top-k
    # concentrates in ONE cluster window (nprobe=16: 0.903 vs 0.976 for the
    # XLA probe; nprobe=64: 0.921 vs 0.995) — neighbors pack 3+ per 128-row
    # bin far more often than the independence guess suggested. bin_m=4
    # matches XLA recall to within 0.002 in the grouped kernel at the same
    # shapes; small probe surfaces get exact-in-window k.
    bin_m = 4 if nprobe * (w_pad // 128) >= 8 * k else k
    return pallas_ivf_probe(
        metric,
        q,
        table,
        t_aux,
        st_c.astype(jnp.int32),
        offs.astype(jnp.int32),
        ln.astype(jnp.int32),
        k,
        nprobe,
        w_pad,
        bin_m,
        jax.default_backend() == "cpu",
    )


@functools.partial(jax.jit, static_argnums=(0, 1, 9, 10, 11, 12, 13, 14))
def _ivf_probe_search_dense(
    metric: MetricKind,
    kind: ScalarKind,
    q,                # [Q, D] storage dtype
    valid,            # [cap2] bool
    centroids,        # [C, D] f32
    table,            # [cap2, D] dense cluster-major
    stats,            # [cap2, 2] (unused and may be any shape for IP)
    starts,           # [C] i32 partition row offsets
    lens,             # [C] i32 partition lengths
    ndim: int,
    k: int,
    nprobe: int,
    p_win: int,       # static max partition length (probe window)
    block: int,       # gather-block rows
    metric_fn=None,
):
    """Dense-layout probe: partition ci lives at table rows
    [starts[ci], starts[ci]+lens[ci]) — no padding gaps, so the IVF costs NO
    extra table memory. Each probe gathers the whole row BLOCKS covering its
    window (long contiguous DMA reads, like the copied [C, P, D] layout) and
    masks the ≤block-1 overscan rows at each end."""
    from .ops.distances import row_stats

    n_q = q.shape[0]
    cap2 = table.shape[0]
    nb = cap2 // block
    q_stats = row_stats(q, kind)
    qf = _query_f32(kind, q, metric)

    probes = _probe_select(_centroid_metric(metric), qf, centroids, lens, nprobe)

    tblk = table.reshape(nb, block, -1)
    vblk = valid.reshape(nb, block)  # block-gathered with the rows (see core)
    use_stats = metric != MetricKind.IP
    sblk = stats.reshape(nb, block, 2) if use_stats else None
    # blocks covering a window that starts anywhere inside a block
    nblk = (p_win - 1) // block + 2
    r = nblk * block  # gathered rows per probe

    row_bytes = table.shape[-1] * table.dtype.itemsize + 12
    if metric == MetricKind.Jaccard:
        # membership comparison broadcasts [chunk, X, Wq, Wt] bools
        row_bytes *= max(table.shape[-1], 1)
    elif metric_fn is not None or metric in GENERIC_PROBE_METRICS:
        row_bytes *= 8  # broadcast f32 intermediates
    budget = 128 * 1024 * 1024
    chunk = int(np.clip(budget // max(nprobe * r * row_bytes, 1), 8, _QUERY_CHUNK))
    chunk = min(chunk, n_q)
    n_chunks = (n_q + chunk - 1) // chunk
    pad = n_chunks * chunk - n_q
    if pad:
        q = jnp.concatenate([q, q[:pad]])
        q_stats = jnp.concatenate([q_stats, q_stats[:pad]])
        probes = jnp.concatenate([probes, probes[:pad]])

    q_c = q.reshape(n_chunks, chunk, -1)
    qs_c = q_stats.reshape(n_chunks, chunk, 2)
    pr_c = probes.reshape(n_chunks, chunk, nprobe)

    def one_chunk(args):
        qc, qsc, prc = args
        return _dense_probe_core(
            metric, kind, qc, qsc, prc, starts, lens, vblk, tblk, sblk,
            cap2, block, nblk, k, ndim, metric_fn,
        )

    d_all, i_all = jax.lax.map(one_chunk, (q_c, qs_c, pr_c))
    d_all = d_all.reshape(n_chunks * chunk, k)[:n_q]
    i_all = i_all.reshape(n_chunks * chunk, k)[:n_q]
    return d_all, i_all.astype(jnp.int32)
