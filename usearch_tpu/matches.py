"""Search-result containers mirroring the reference's Python surface
(reference: python/usearch/index.py:293-451)."""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

Key = np.uint64


@dataclass
class Match:
    """Single search result with key and distance."""

    key: int
    distance: float

    def to_tuple(self) -> tuple:
        return self.key, self.distance


@dataclass
class Matches:
    """Search results for a single query."""

    keys: np.ndarray
    distances: np.ndarray

    visited_members: int = 0
    computed_distances: int = 0

    def __len__(self) -> int:
        return len(self.keys)

    def __getitem__(self, index: int) -> Match:
        if isinstance(index, int) and index < len(self):
            return Match(key=self.keys[index], distance=self.distances[index])
        raise IndexError(f"`index` must be an integer under {len(self)}")

    def to_list(self) -> List[tuple]:
        return [(int(key), float(distance)) for key, distance in zip(self.keys, self.distances)]

    def __repr__(self) -> str:
        return f"usearch_tpu.Matches({len(self)})"


@dataclass
class BatchMatches(Sequence):
    """Search results for multiple queries. Unused positions hold sentinels;
    per-query validity is in ``counts``."""

    keys: np.ndarray
    distances: np.ndarray
    counts: np.ndarray

    visited_members: int = 0
    computed_distances: int = 0

    def __len__(self) -> int:
        return len(self.counts)

    def __getitem__(self, index: int) -> Matches:
        if isinstance(index, int) and index < len(self):
            return Matches(
                keys=self.keys[index, : self.counts[index]],
                distances=self.distances[index, : self.counts[index]],
                visited_members=self.visited_members // max(len(self), 1),
                computed_distances=self.computed_distances // max(len(self), 1),
            )
        raise IndexError(f"`index` must be an integer under {len(self)}")

    def to_list(self) -> List[List[tuple]]:
        list_of_matches = [self[row] for row in range(len(self))]
        return [match.to_tuple() for matches in list_of_matches for match in matches]

    def mean_recall(self, expected: np.ndarray, count: Optional[int] = None) -> float:
        """Share of queries whose `expected` entry appears among results."""
        return self.count_matches(expected, count=count) / len(expected)

    def count_matches(self, expected: np.ndarray, count: Optional[int] = None) -> int:
        assert len(expected) == len(self)
        if count is None:
            count = self.keys.shape[1]
        if count == 1:
            return int(np.sum(self.keys[:, 0] == expected))
        recall = 0
        for i in range(len(self)):
            recall += expected[i] in self.keys[i, :count]
        return int(recall)

    def __repr__(self) -> str:
        return f"usearch_tpu.BatchMatches({np.sum(self.counts)} across {len(self)} queries)"


class Clustering:
    """Result of `Index.cluster` (reference: python/usearch/index.py:400-451)."""

    def __init__(self, index, matches: BatchMatches, queries: Optional[np.ndarray] = None):
        if queries is None:
            queries = np.array(index.keys)
        self.index = index
        self.queries = queries
        self.matches = matches

    def __repr__(self) -> str:
        return f"usearch_tpu.Clustering(for {len(self.queries)} queries)"

    @property
    def centroids_popularity(self) -> Tuple[np.ndarray, np.ndarray]:
        return np.unique(self.matches.keys, return_counts=True)

    def members_of(self, centroid) -> np.ndarray:
        return self.queries[self.matches.keys.flatten() == centroid]

    def subcluster(self, centroid, **clustering_kwargs) -> "Clustering":
        sub_keys = self.members_of(centroid)
        return self.index.cluster(keys=sub_keys, **clustering_kwargs)

    def plot_centroids_popularity(self):  # pragma: no cover - plotting
        from matplotlib import pyplot as plt

        _, sizes = self.centroids_popularity
        plt.yscale("log")
        plt.plot(sorted(sizes), np.arange(len(sizes)))
        plt.show()

    @property
    def network(self):  # pragma: no cover - optional dependency
        import networkx as nx

        keys, sizes = self.centroids_popularity
        g = nx.Graph()
        for key, size in zip(keys, sizes):
            g.add_node(key, size=size)
        for i, i_key in enumerate(keys):
            for j_key in keys[:i]:
                d = self.index.pairwise_distance(i_key, j_key)
                g.add_edge(i_key, j_key, distance=d)
        return g
