"""On-TPU min-path boundary delineation (the reference's "graph search").

The reference (`min_path_processing/graph_search.py:5-105`) runs a pure
Python heapq Dijkstra per boundary map over a gridded graph:

- nodes are (column j, row i) of the transposed (W, H) probability map,
  plus two virtual all-ones columns appended left and right
  (`graph_search.py:337-357`);
- directed edges go right / diagonal-right with row step <= max_grad
  (`graph_search.py:108-225`), plus free vertical descent within the
  virtual columns;
- edge weight is ``2 - (p_u + p_v)`` (`graph_search.py:69-81`).

Because every path from the top-left to the bottom-right virtual corner
crosses each real column exactly once, the shortest path simply maximizes
``sum_j p[j, r_j]`` subject to ``|r_{j+1} - r_j| <= max_grad``: a textbook
column dynamic program. That maps perfectly onto TPU: a ``lax.scan`` across
columns with a (2*max_grad+1)-tap banded min over the row axis, vmapped
over (batch x boundary). No heap, no host round-trip.

Exactness: probability maps are uint8/255 (`graph_search.py:553-554`), so
all edge weights are integer multiples of 1/255. We run the whole DP in
*int32* on the raw uint8 values (weight ``510 - m_u - m_v``), which is an
exact monotone rescaling of the reference's float64 math — distances and
ties are reproduced exactly wherever the reference's own float64 sums are
exact (they are for the dominant 0/255 map values).

Tie-breaking parity: the reference heap breaks distance ties by a
neighbour-priority (straight-down in the virtual column first, then
right, then diagonal-up by growing step, then diagonal-down), then by
insertion order (`graph_search.py:85-92`). For this DAG that reduces to:

- predecessor choice: same row, then row+k (below), then row-k (above),
  k ascending — implemented via first-occurrence ``argmin`` over
  candidates stacked in that order;
- final column: the backtrack climbs the free virtual descent to the
  topmost tied exit row, which resolves to the *first* (topmost) argmin
  of the exit distances.

Verified against a faithful heapq oracle in
``tests/test_minpath.py`` (exact match on ridge-like and random maps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BIG = jnp.int32(2**30)


def _shift_up(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """y[i] = x[i+k] with +inf padding (candidate 'from below')."""
    return jnp.concatenate(
        [x[..., k:], jnp.full(x.shape[:-1] + (k,), _BIG, x.dtype)], axis=-1
    )


def _shift_down(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """y[i] = x[i-k] with +inf padding (candidate 'from above')."""
    return jnp.concatenate(
        [jnp.full(x.shape[:-1] + (k,), _BIG, x.dtype), x[..., :-k]], axis=-1
    )


@functools.partial(jax.jit, static_argnames=("max_grad",))
def delineate(maps_u8: jnp.ndarray, max_grad: int = 1) -> jnp.ndarray:
    """Delineate one row per column for each boundary probability map.

    Args:
      maps_u8: ``(..., W, H)`` uint8 probability maps in the reference's
        transposed (column, row) orientation (`graph_search.py:519-572`).
        Any number of leading batch/boundary dims.
      max_grad: maximum row step per column (`graph_search.py:108`).

    Returns:
      int32 rows ``(..., W)`` — the delineated boundary row per column,
      identical to reference ``delineate_boundary`` output.
    """
    if maps_u8.ndim < 2:
        raise ValueError("maps must have shape (..., W, H)")
    lead = maps_u8.shape[:-2]
    w, h = maps_u8.shape[-2], maps_u8.shape[-1]
    m = maps_u8.reshape((-1, w, h)).astype(jnp.int32)
    n = m.shape[0]

    # Candidate row offsets in reference tie-break preference order:
    # same row, +1..+max_grad (from below), -1..-max_grad (from above).
    offsets = [0] + list(range(1, max_grad + 1)) + [-k for k in range(1, max_grad + 1)]
    offsets_arr = jnp.asarray(np.array(offsets, dtype=np.int32))

    iota = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32), (n, h))
    batch_idx = jnp.arange(n, dtype=jnp.int32)

    def rank_of(*keys):
        """Settle-order rank within a column: position of each row in the
        lexicographic sort of ``keys`` (ties -> topmost row first)."""
        sorted_ops = jax.lax.sort(
            tuple(keys) + (iota,), dimension=-1, num_keys=len(keys) + 1
        )
        perm = sorted_ops[-1]
        return jnp.zeros((n, h), jnp.int32).at[batch_idx[:, None], perm].set(iota)

    # Entry edge from the all-ones virtual column: 255*(1 - p). Column-0
    # nodes settle in (distance, row) order (their best heap entries all
    # arrive via 'right' edges pushed in top-down virtual-column order).
    d0 = 255 - m[:, 0, :]  # (N, H)
    rank0 = rank_of(d0)
    pri0 = jnp.ones((n, h), jnp.int32)

    xs = jnp.moveaxis(m[:, 1:, :], 1, 0)  # (W-1, N, H), column-major scan

    # Heap-entry priorities per candidate. The reference assigns priority
    # = 1 + position in the *truncated* neighbour list
    # (`graph_search.py:85-92`, list built at `:108-225`), so:
    #   same row (right edge):            1
    #   from row+k (diagup_k edge):       1 + k
    #   from row-k (diagdown_k edge):     1 + min(max_grad, row-k) + k
    # (diagdown positions shift down when the predecessor sits within
    # max_grad of the top and some diagups are truncated).
    rows_1h = jnp.arange(h, dtype=jnp.int32)[None, :]
    pris = [jnp.full((1, h), 1, jnp.int32)]
    for k in range(1, max_grad + 1):
        pris.append(jnp.full((1, h), 1 + k, jnp.int32))
    for k in range(1, max_grad + 1):
        pred_row = rows_1h - k
        pris.append(1 + jnp.minimum(max_grad, pred_row) + k)
    stacked_pri = jnp.stack(pris, axis=0)  # (2g+1, 1, H)

    def shifts(x):
        out = [x]
        for k in range(1, max_grad + 1):
            out.append(_shift_up(x, k))
        for k in range(1, max_grad + 1):
            out.append(_shift_down(x, k))
        return jnp.stack(out, axis=0)  # (2g+1, N, H)

    def step(carry, m_cur):
        d, m_prev, rank_prev, pri_prev = carry
        q = d - m_prev  # (N, H); +510 - m_cur added after the min
        stacked = shifts(q)
        stacked_rank = shifts(rank_prev)  # insertion counter ~ pred settle rank
        best = jnp.min(stacked, axis=0)
        tied = stacked == best[None]
        d_new = best + 510 - m_cur

        # Heap-entry validity: a zero-weight edge (both endpoints 255,
        # `graph_search.py:79`) comes from a predecessor with *equal*
        # distance, whose entry only exists if that predecessor settles
        # before this node pops via its strict (positive-weight) entries.
        # The predecessor settles at heap key (d, its own entry priority);
        # this node's strict pop is at (d, best strict priority).
        zero_edge = (shifts(m_prev) == 255) & (m_cur == 255)[None]
        strict = tied & ~zero_edge
        pri_strict = jnp.where(strict, stacked_pri, _BIG)
        best_strict_pri = jnp.min(pri_strict, axis=0)
        # On equal priority the insertion-counter race usually favours the
        # zero-edge predecessor (its support chain was pushed earlier along
        # the plateau), so ties count as valid.
        zero_valid = (
            tied & zero_edge & (shifts(pri_prev) <= best_strict_pri[None])
        )
        valid = strict | zero_valid
        valid = jnp.where(jnp.any(valid, axis=0, keepdims=True), valid, tied)

        # Pop entry = lexicographic min over valid entries of
        # (entry priority, insertion counter).
        pri_m = jnp.where(valid, stacked_pri, _BIG)
        best_pri = jnp.min(pri_m, axis=0)
        rank_m = jnp.where(pri_m == best_pri[None], stacked_rank, _BIG)
        entry_ctr = jnp.min(rank_m, axis=0)
        choice = jnp.argmin(rank_m, axis=0).astype(jnp.uint8)

        rank_new = rank_of(d_new, best_pri, entry_ctr)
        return (d_new, m_cur, rank_new, best_pri), choice

    (d_final, m_last, rank_last, _), choices = jax.lax.scan(
        step, (d0, m[:, 0, :], rank0, pri0), xs
    )
    # choices: (W-1, N, H)

    # Exit edge back into the all-ones virtual column. The first virtual
    # node settled starts a free priority-0 descent that claims the
    # bottom-right corner, so the backtracked exit row is that of the
    # *earliest-settled* last-column node among those with minimal exit
    # distance — i.e. minimal settle rank among exit-distance ties.
    exit_dist = d_final + 255 - m_last  # (N, H)
    tied = exit_dist == jnp.min(exit_dist, axis=-1, keepdims=True)
    r_last = jnp.argmin(
        jnp.where(tied, rank_last, _BIG), axis=-1
    ).astype(jnp.int32)  # (N,)

    def back(r, choice_col):
        c = choice_col[batch_idx, r]  # (N,)
        r_prev = r + offsets_arr[c.astype(jnp.int32)]
        return r_prev, r

    r0, rows_rev = jax.lax.scan(back, r_last, choices, reverse=True)
    # rows_rev[j] is the row at column j+1; prepend column 0.
    rows = jnp.concatenate([r0[None, :], rows_rev], axis=0)  # (W, N)
    return jnp.moveaxis(rows, 0, 1).reshape(lead + (w,))


def delineate_image_maps(
    boundary_maps: jnp.ndarray, max_grad: int = 1
) -> jnp.ndarray:
    """Delineate from image-orientation maps ``(..., H, W)`` (as produced by
    :func:`ops.boundary.boundary_prob_maps`), returning rows ``(..., W)``.

    Equivalent to the reference's transpose-then-``segment_maps`` sequence
    (`prediction/prediction.py:134-141`).
    """
    return delineate(jnp.swapaxes(boundary_maps, -1, -2), max_grad=max_grad)


def calc_errors(predictions: jnp.ndarray, truths: jnp.ndarray) -> jnp.ndarray:
    """Per-column delineation error ``prediction - truth`` with NaN where
    the truth is NaN or <= 0 — reference `graph_search.py:479-516`."""
    predictions = predictions.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    truths_f = truths.astype(predictions.dtype)
    invalid = jnp.isnan(truths_f) | (truths_f <= 0)
    return jnp.where(invalid, jnp.nan, predictions - truths_f)
