"""Test oracle: a faithful re-implementation of the reference's heapq
Dijkstra min-path (reference `min_path_processing/graph_search.py:5-105`,
`:108-225`, `:360-428`), used to verify the TPU DP bit-for-bit.

Written independently in a compact style; semantics (edge set, edge
weights, heap tie-breaking by neighbour priority and insertion order,
early exit, backtrack) follow the reference exactly.
"""

from __future__ import annotations

import heapq

import numpy as np


def _neighbours(j, i, w, h, g):
    """Neighbour (j2, i2) list for graph node (col j, row i) in the
    reference's construction order; w includes the 2 virtual columns."""
    right = (j + 1, i)
    down = (j, i + 1)
    diagups = [(j + 1, i - k) for k in range(1, g + 1) if i - k >= 0]
    diagdowns = [(j + 1, i + k) for k in range(1, g + 1) if i + k <= h - 1]
    if i == h - 1:  # last row
        if j == w - 1:
            return []
        return [right] + diagups
    if i == 0:  # first row
        if j == w - 1:
            return [down]
        if j == 0:
            return [right, down] + diagdowns
        return [right] + diagdowns
    # middle rows
    if j == w - 1:
        return [down]
    if j == 0:
        return [right, down] + diagups + diagdowns
    return [right] + diagups + diagdowns


def dijkstra_delineate(map_u8: np.ndarray, max_grad: int = 1) -> np.ndarray:
    """Delineate a single (W, H) uint8 probability map; returns rows (W,)."""
    prob = map_u8.astype(np.float64) / 255.0
    w0, h = prob.shape
    # Append all-ones virtual first/last columns.
    p = np.concatenate(
        [np.ones((1, h)), prob, np.ones((1, h))], axis=0
    )  # (w0+2, h)
    w = w0 + 2

    def idx(j, i):
        return j + i * w

    target = w * h - 1
    settled = [None] * (w * h)
    heap = [(0.0, 0, 0, 0, 0)]  # (dist, priority, counter, node, prev)
    counter = 1
    while heap:
        dist, _, _, v, prev = heapq.heappop(heap)
        if settled[v] is not None:
            continue
        settled[v] = (dist, prev)
        if v == target:
            break
        j, i = v % w, v // w
        for pos, (j2, i2) in enumerate(_neighbours(j, i, w, h, max_grad)):
            n = idx(j2, i2)
            if settled[n] is not None:
                continue
            edge = 2.0 - (p[j, i] + p[j2, i2])
            pri = 0 if (j2 == j and i2 == i + 1) else pos + 1
            heapq.heappush(heap, (dist + edge, pri, counter, n, v))
            counter += 1

    rows = np.zeros(w0, dtype=np.int64)
    node = target
    while True:
        j, i = node % w, node // w
        if (j, i) == (0, 0):
            break
        if 0 < j < w - 1:
            rows[j - 1] = i
        node = settled[node][1]
    return rows


def oracle_segment_maps(maps_u8: np.ndarray, max_grad: int = 1) -> np.ndarray:
    """(num_maps, W, H) uint8 -> (num_maps, W) delineations."""
    return np.stack([dijkstra_delineate(m, max_grad) for m in maps_u8])
