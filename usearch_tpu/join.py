"""Semantic join — one-to-one stable matching of two indexes.

Re-design of the reference's male-optimal stable-marriage join
(reference: include/usearch/index.hpp:4345-4543). The reference interleaves
per-thread ANN proposal searches with engagements under bit locks; the TPU
version batches ALL proposal searches into one device sweep per round (the
expensive part), then runs the Gale-Shapley engagement loop on host — the
loop is O(total proposals) of dict ops, the distances all come from the MXU.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def join(men, women, max_proposals: int = 0, exact: bool = False) -> Dict[int, int]:
    """Returns a mapping from `men` keys to `women` keys. The smaller index
    proposes (reference swaps sides the same way, index.hpp:4373)."""
    swapped = len(men) > len(women)
    if swapped:
        men, women = women, men

    n_men = len(men)
    n_women = len(women)
    if n_men == 0 or n_women == 0:
        return {}
    if max_proposals <= 0:
        # the reference defaults the proposal window to log2-ish sizes;
        # a generous fixed window keeps match rates high at batch cost ~0
        max_proposals = int(min(n_women, max(16, int(np.ceil(np.log2(n_women + 1))) * 4)))

    # slot-aligned (key, vector) pairs: with multi=True, `men.vectors`
    # expands duplicate keys once PER OCCURRENCE via get() and falls out of
    # step with `men.keys` — fetching by live slot keeps row i ↔ key i
    from .enums import ScalarKind

    live = men._live_slots()
    men_keys = np.asarray(men._slot_keys[live], dtype=np.uint64)
    women_keys_order: Dict[int, int] = {}

    vectors = men._fetch_slots(live, ScalarKind.F32)
    matches = women.search(vectors, max_proposals, exact=exact)
    proposal_keys = matches.keys  # [n_men, P]
    proposal_dists = matches.distances
    proposal_counts = matches.counts.astype(np.int64)

    # Gale-Shapley, male-optimal: women hold the best (closest) proposer.
    engaged_to: Dict[int, int] = {}  # woman_key -> man_idx
    engaged_dist: Dict[int, float] = {}
    next_proposal = np.zeros(n_men, dtype=np.int64)
    free = list(range(n_men))

    while free:
        man = free.pop()
        while next_proposal[man] < proposal_counts[man]:
            p = next_proposal[man]
            next_proposal[man] += 1
            woman = int(proposal_keys[man, p])
            dist = float(proposal_dists[man, p])
            current = engaged_to.get(woman)
            if current is None:
                engaged_to[woman] = man
                engaged_dist[woman] = dist
                break
            if dist < engaged_dist[woman]:
                engaged_to[woman] = man
                engaged_dist[woman] = dist
                free.append(current)
                break
            # rejected; try next proposal
        # man with exhausted proposals stays unmatched

    result: Dict[int, int] = {}
    for woman, man in engaged_to.items():
        man_key = int(men_keys[man])
        if swapped:
            result[woman] = man_key
        else:
            result[man_key] = woman
    return result
