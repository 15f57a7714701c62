"""1-D single-linkage clustering — the engine's central grouping primitive.

Semantics mirror reference utils/clustering.py:9-66: values are sorted and a
new cluster starts wherever the gap to the *previous sorted value* exceeds
``tolerance`` (chained tolerance, not distance-to-cluster-start). Cluster ids
increase with value. ``cluster_objects`` in the reference dedups values
through a set before clustering (clustering.py:30); on sorted arrays chained
gaps over duplicates are zero, so the vectorized form below is equivalent.
"""

from __future__ import annotations

from typing import List

import numpy as np


def cluster_ids(values: np.ndarray, tolerance: float) -> np.ndarray:
    """Cluster id per element, aligned with the input order.

    Ids are dense and ordered by cluster position (cluster 0 holds the
    smallest values). Equal values always share a cluster.
    """
    values = np.asarray(values, dtype=np.float64)
    n = values.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.int64)
    order = np.argsort(values, kind="stable")
    sv = values[order]
    ids_sorted = np.empty(n, dtype=np.int64)
    ids_sorted[0] = 0
    if n > 1:
        ids_sorted[1:] = np.cumsum(np.diff(sv) > tolerance)
    out = np.empty(n, dtype=np.int64)
    out[order] = ids_sorted
    return out


def cluster_groups(
    values: np.ndarray, tolerance: float, preserve_order: bool = False
) -> List[np.ndarray]:
    """Index arrays, one per cluster, ordered by cluster id.

    With ``preserve_order=False`` (reference default) elements within a
    cluster keep their original relative order (the reference's stable
    sort by cluster id, clustering.py:60-66). With ``preserve_order=True``
    clusters are emitted as *runs* in input order: consecutive elements
    sharing a cluster id stay grouped, matching clustering.py:57-58 where
    the groupby runs over the unsorted sequence.
    """
    ids = cluster_ids(values, tolerance)
    n = ids.shape[0]
    if n == 0:
        return []
    if preserve_order:
        breaks = np.flatnonzero(np.diff(ids) != 0) + 1
        return np.split(np.arange(n), breaks)
    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]
    breaks = np.flatnonzero(np.diff(sorted_ids) != 0) + 1
    return np.split(order, breaks)


def cluster_means(values: np.ndarray, tolerance: float) -> np.ndarray:
    """Per-element mean of its cluster (used by snap, geometry.py:150-159)."""
    values = np.asarray(values, dtype=np.float64)
    ids = cluster_ids(values, tolerance)
    if values.shape[0] == 0:
        return values.copy()
    sums = np.bincount(ids, weights=values)
    counts = np.bincount(ids)
    return (sums / counts)[ids]
