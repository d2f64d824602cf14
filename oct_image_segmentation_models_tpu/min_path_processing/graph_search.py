"""Graph-search (min-path) public API — reference
`min_path_processing/graph_search.py`, TPU-native.

API parity with one structural divergence: ``create_graph_structure``
returns a lightweight :class:`GraphStructure` descriptor instead of
materialising per-vertex adjacency lists (the reference builds a
``(W+2)*H``-entry Python list-of-lists, `graph_search.py:108-225`; the DP
kernel needs only the shape/max_grad/direction). ``segment_maps`` /
``delineate_boundary`` consume either representation's semantics
identically and run as a batched ``lax.scan`` DP on device
(:mod:`..ops.minpath`), reproducing the reference heap's output including
its tie-breaking (verified against a heapq oracle in tests).

``run_dijkstras`` and the vertical-graph variant (which permits upward
moves inside real columns, making the graph non-DAG) are provided as an
exact host implementation for completeness; no reference workflow calls
the vertical variant (it is dead code upstream).
"""

from __future__ import annotations

import heapq
import logging
from dataclasses import dataclass

import numpy as np

from ..ops import minpath as minpath_ops

log = logging.getLogger(__name__)


@dataclass(frozen=True)
class GraphStructure:
    """Descriptor of the gridded min-path graph.

    ``shape`` is the (width, height) of the *unpadded* probability map, as
    passed to reference ``create_graph_structure`` (`graph_search.py:108`);
    two all-ones virtual columns are implied.
    """

    shape: tuple
    max_grad: int = 1
    vertical: bool = False

    @property
    def graph_width(self):
        return self.shape[0] + 2

    @property
    def graph_height(self):
        return self.shape[1]


def create_graph_structure(shape, max_grad=1) -> GraphStructure:
    """Reference `graph_search.py:108-225`."""
    return GraphStructure(shape=tuple(shape[:2]), max_grad=max_grad)


def create_graph_structure_vertical(shape) -> GraphStructure:
    """Reference `graph_search.py:228-334` (adds up/down moves in real
    columns)."""
    return GraphStructure(shape=tuple(shape[:2]), max_grad=1, vertical=True)


def append_firstlast_cols(prob_map):
    """Append all-ones first/last columns — reference `graph_search.py:337-357`."""
    map_height = prob_map.shape[1]
    return np.concatenate(
        [np.ones((1, map_height)), prob_map, np.ones((1, map_height))], axis=0
    )


def _neighbours(j, i, w, h, g, vertical):
    """Neighbour list for graph node (col j, row i) in reference
    construction order (`graph_search.py:136-225` and `:239-332`)."""
    right = (j + 1, i)
    down = (j, i + 1)
    up = (j, i - 1)
    diagups = [(j + 1, i - k) for k in range(1, g + 1) if i - k >= 0]
    diagdowns = [(j + 1, i + k) for k in range(1, g + 1) if i + k <= h - 1]
    first_col, last_col = j == 0, j == w - 1
    first_row, last_row = i == 0, i == h - 1

    if not vertical:
        if last_row:
            return [] if last_col else [right] + diagups
        if first_row:
            if last_col:
                return [down]
            if first_col:
                return [right, down] + diagdowns
            return [right] + diagdowns
        if last_col:
            return [down]
        if first_col:
            return [right, down] + diagups + diagdowns
        return [right] + diagups + diagdowns

    # Vertical variant (`graph_search.py:262-332`).
    if last_row:
        return [] if last_col else [right, up] + diagups
    if first_row:
        if last_col:
            return [down]
        if first_col:
            return [right, down] + diagdowns
        return [right, down] + diagdowns
    if last_col:
        return [down]
    if first_col:
        return [right, down] + diagups + diagdowns
    return [right, up, down] + diagups + diagdowns


def run_dijkstras(prob_map, start_ind, graph_structure: GraphStructure):
    """Exact host Dijkstra with the reference's heap tie-breaking —
    reference `graph_search.py:5-105`. ``prob_map`` is the *padded*
    (width+2, height) float map in [0, 1]; returns per-vertex
    ``(distance, predecessor)`` tuples (0 for unreachable), indexed by
    ``col + row * graph_width``.
    """
    p = np.asarray(prob_map, dtype=np.float64)
    w, h = p.shape
    g = graph_structure.max_grad
    target = w * h - 1
    settled = [None] * (w * h)
    heap = [(0.0, 0, 0, int(start_ind), 0)]
    counter = 1
    while heap:
        dist, _, _, v, prev = heapq.heappop(heap)
        if settled[v] is not None:
            continue
        settled[v] = (dist, prev)
        if v == target:
            break
        j, i = v % w, v // w
        for pos, (j2, i2) in enumerate(
            _neighbours(j, i, w, h, g, graph_structure.vertical)
        ):
            n = j2 + i2 * w
            if settled[n] is not None:
                continue
            edge = 2.0 - (p[j, i] + p[j2, i2])
            pri = 0 if (j2 == j and i2 == i + 1) else pos + 1
            heapq.heappush(heap, (dist + edge, pri, counter, n, v))
            counter += 1
    return [0 if x is None else x for x in settled]


def _backtrack(shortest_paths, w, h):
    coords = []
    node = w * h - 1
    while True:
        j, i = node % w, node // w
        if (j, i) == (0, 0):
            break
        coords.append((j, i))
        node = shortest_paths[node][1]
    return coords


def _exact_u8(prob_map):
    """``(ok, u8)`` — ok when the [0, 1] float map is an EXACT uint8/255
    quantization (the value grid the reference workflow itself produces:
    ``prob_maps / 255`` at `graph_search.py:554`). On that grid the
    integer-cost device DP is bit-exact; off it, quantizing would erase
    real cost orderings, so callers fall back to the float64 host
    Dijkstra."""
    q = np.clip(np.rint(prob_map * 255.0), 0, 255)
    return np.array_equal(q / 255.0, prob_map), q.astype(np.uint8)


def delineate_boundary(prob_map, graph_structure: GraphStructure):
    """One row per column for a (W, H) probability map in [0, 1] —
    reference `graph_search.py:360-428`. TPU DP for standard graphs on
    the uint8/255 value grid; exact float64 host Dijkstra otherwise and
    for the vertical variant. Multi-visit columns take the reference's
    single-assignment semantics (`:426`); the averaging variant is
    :func:`delineate_boundary_vertical`."""
    prob_map = np.asarray(prob_map, dtype=np.float64)
    if not graph_structure.vertical:
        ok, maps_u8 = _exact_u8(prob_map)
        if ok:
            return np.asarray(
                minpath_ops.delineate(
                    maps_u8, max_grad=graph_structure.max_grad
                ),
                dtype=np.float64,
            )
    padded = append_firstlast_cols(prob_map)
    paths = run_dijkstras(padded, 0, graph_structure)
    w, h = padded.shape
    delin = np.zeros(w - 2)
    for j, i in _backtrack(paths, w, h):
        if j not in (0, w - 1):
            delin[j - 1] = i  # last write wins (reference `:426`)
    return delin


def delineate_boundary_vertical(prob_map, graph_structure: GraphStructure):
    """Reference `graph_search.py:431-476` (multi-visit columns
    averaged; vertical graphs can visit a column several times)."""
    prob_map = np.asarray(prob_map, dtype=np.float64)
    gs = GraphStructure(
        graph_structure.shape, graph_structure.max_grad, True
    )
    padded = append_firstlast_cols(prob_map)
    paths = run_dijkstras(padded, 0, gs)
    w, h = padded.shape
    delin = np.zeros(w - 2)
    counts = np.zeros(w - 2)
    for j, i in _backtrack(paths, w, h):
        if j not in (0, w - 1):
            delin[j - 1] += i
            counts[j - 1] += 1
    return delin / np.maximum(counts, 1)


def calc_errors(prediction, truth):
    """prediction - truth with NaN where truth is NaN or <= 0 —
    reference `graph_search.py:479-516`."""
    prediction = np.asarray(prediction, dtype=np.float64)
    truth = np.asarray(truth, dtype=np.float64)
    invalid = np.isnan(truth) | (truth <= 0)
    return np.where(invalid, np.nan, prediction - truth)


def segment_maps(
    prob_maps,
    truths,
    graph_structure: GraphStructure,
    float_map_backend: str = "device",
):
    """Delineate a stack of maps and compute per-column errors —
    reference `graph_search.py:519-572`.

    Args:
      prob_maps: uint8 ``(num_maps, W, H)`` (0..255).
      truths: ``(num_maps, W)`` true rows or None.
      float_map_backend: routing for NON-quantized float maps (uint8 and
        integer-valued-float maps always take the bit-exact integer
        device DP). ``"device"`` (default): the batched device float DP
        (cost-optimal "fast" tie semantics — the divergence budget in
        tests/test_minpath.py covers realistic maps, not adversarial
        dense lattices). ``"host"``: the per-map host Dijkstra, the
        reference's exact float64 heap semantics (~1000x slower) — the
        exactness escape hatch for callers that need reference heap
        tie order on arbitrary float maps.

    Returns ``(predictions uint16, errors float64, prob_maps/255)``.
    (The reference's ``errors[map_ind:,]`` slice bug, `:568-570`, is
    accidentally benign — the final array equals the per-map errors — so
    the clean semantics here are output-identical.)
    """
    if float_map_backend not in ("device", "host"):
        raise ValueError(
            f"unknown float_map_backend: {float_map_backend!r} "
            "(expected 'device' or 'host')"
        )
    prob_maps = np.asarray(prob_maps)
    num_maps, width = prob_maps.shape[0], prob_maps.shape[1]

    if not graph_structure.vertical and prob_maps.dtype == np.uint8:
        # documented fast path: uint8 maps delineate as one batched
        # device DP, bit-matching the reference heap
        predictions = np.asarray(
            minpath_ops.delineate(
                prob_maps, max_grad=graph_structure.max_grad
            )
        ).astype(np.uint16)
    elif not graph_structure.vertical:
        # FLOAT maps (the reference's `astype("float64")` at `:553` is a
        # discarded no-op, so raw float values delineate exactly there).
        # Integer-valued floats ARE the uint8/255 grid — the integer DP
        # is bit-exact to the reference's float64 heap on that grid;
        # anything else runs the batched device float DP ("fast" tie
        # semantics: cost-optimal, first-order heap preference —
        # divergence from the reference's heap occurs only on
        # equal-cost ties and is budgeted in tests/test_minpath.py).
        ok, maps_u8 = _exact_u8(prob_maps / 255.0)
        if ok:
            predictions = np.asarray(
                minpath_ops.delineate(
                    maps_u8, max_grad=graph_structure.max_grad
                )
            ).astype(np.uint16)
        elif float_map_backend == "host":
            # exactness escape hatch (ADVICE r4): reference float64 heap
            # semantics via the per-map host Dijkstra
            log.info(
                "segment_maps: non-quantized float maps (dtype=%s) with "
                "float_map_backend='host' — per-map host Dijkstra "
                "(reference-exact heap tie order, ~1000x the device DP)",
                prob_maps.dtype,
            )
            predictions = np.stack(
                [
                    delineate_boundary(
                        prob_maps[m] / 255.0, graph_structure
                    )
                    for m in range(num_maps)
                ]
            ).astype(np.uint16)
        else:
            log.info(
                "segment_maps: non-quantized float maps "
                "(dtype=%s) take the device float DP — cost-optimal "
                "'fast' tie semantics (the reference's float64 heap "
                "tie order is rounding-noise-dependent and not "
                "reproducible; see ops/minpath.delineate_float). "
                "float_map_backend='host' restores the reference's "
                "exact heap semantics",
                prob_maps.dtype,
            )
            predictions = np.asarray(
                minpath_ops.delineate_float(
                    prob_maps / 255.0, max_grad=graph_structure.max_grad
                )
            ).astype(np.uint16)
    else:
        # Vertical structures have no device path at all (upward moves
        # make the graph non-DAG); the host Dijkstra IS the only
        # reference-semantics implementation, so this is informational,
        # not actionable (reference uses single-assignment
        # delineate_boundary for these, `:557`, not the averaging
        # variant).
        log.info(
            "segment_maps: vertical graph structure — per-map host "
            "Dijkstra (no device fast path exists for non-DAG graphs)"
        )
        predictions = np.stack(
            [
                delineate_boundary(prob_maps[m] / 255.0, graph_structure)
                for m in range(num_maps)
            ]
        ).astype(np.uint16)

    errors = np.zeros((num_maps, width), dtype=np.float64)
    if truths is not None:
        for m in range(num_maps):
            errors[m] = calc_errors(predictions[m], truths[m])

    return predictions, errors, prob_maps / 255


def calculate_overall_errors(errors):
    """[mean_abs, mean, sd_abs, sd] per boundary (NaN-aware) —
    reference `graph_search.py:575-589`."""
    errors = np.asarray(errors, dtype=np.float64)
    abs_errors = np.abs(errors)
    return [
        np.nanmean(abs_errors, axis=1),
        np.nanmean(errors, axis=1),
        np.nanstd(abs_errors, axis=1),
        np.nanstd(errors, axis=1),
    ]
