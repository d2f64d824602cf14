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
insertion order (`graph_search.py:85-92`). For this DAG the emulation is:

- predecessor choice: lexicographic (distance, entry priority, insertion
  counter), where priorities follow the truncated neighbour-list
  positions and counters are ordered by per-column settle ranks
  propagated through the scan;
- zero-weight edges (255-255 plateaus) additionally race their
  predecessor's settle against the node's strict pop (entry validity);
- final column: the backtrack climbs the free virtual descent to the
  earliest-settled tied exit row.

Verified against a faithful heapq oracle in ``tests/test_minpath.py``:
bit-exact on realistic (single-ridge) boundary maps, plateaus, gaps and
flat tails; >97% of adversarial dense-random maps; the residual
divergences are equal-cost paths whose choice depends on cross-column
heap-counter races (the returned path is always cost-optimal).
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


def resolve_backend(backend: str, tie_parity: str = "exact") -> bool:
    """True when the Pallas kernel should run: "auto" picks Pallas on
    TPU for exact tie parity; "pallas"/"xla" force."""
    if backend == "auto":
        return tie_parity == "exact" and jax.default_backend() == "tpu"
    if backend == "pallas":
        return True
    if backend == "xla":
        return False
    raise ValueError(f"unknown backend: {backend}")


def delineate(
    maps_u8: jnp.ndarray,
    max_grad: int = 1,
    tie_parity: str = "exact",
    backend: str = "auto",
) -> jnp.ndarray:
    """Dispatch to the Pallas TPU kernel when available, else the XLA scan.

    See :func:`_delineate_xla` for the algorithm/params; ``backend`` is
    "auto" (Pallas on TPU, XLA elsewhere), "pallas", or "xla".
    """
    if resolve_backend(backend, tie_parity):
        from .minpath_pallas import delineate_pallas

        return delineate_pallas(maps_u8, max_grad=max_grad)
    return _delineate_xla(maps_u8, max_grad=max_grad, tie_parity=tie_parity)


@functools.partial(jax.jit, static_argnames=("max_grad", "tie_parity"))
def _delineate_xla(
    maps_u8: jnp.ndarray, max_grad: int = 1, tie_parity: str = "exact"
) -> jnp.ndarray:
    """Delineate one row per column for each boundary probability map.

    Args:
      maps_u8: ``(..., W, H)`` uint8 probability maps in the reference's
        transposed (column, row) orientation (`graph_search.py:519-572`).
        Any number of leading batch/boundary dims.
      max_grad: maximum row step per column (`graph_search.py:108`).
      tie_parity: how exactly to reproduce the reference heap's tie-breaks
        among equal-cost paths. Both modes always return a *cost-optimal*
        (Dijkstra-equivalent) delineation:
        - "exact": propagate exact per-column settle ranks (a bitonic rank
          network per column) — matches the heap bit-for-bit on realistic
          (single-ridge) boundary maps and >97% of adversarial random
          maps; the residual divergences are equal-cost global ties whose
          resolution depends on cross-column heap-counter races;
        - "fast": fixed-depth settle signatures (own/pred/grand-pred
          (distance, priority) pairs, top-row fallback) — same cost
          guarantee, slightly weaker tie parity, cheaper per column.

    Returns:
      int32 rows ``(..., W)`` — the delineated boundary row per column,
      identical to reference ``delineate_boundary`` output (modulo
      ``tie_parity``).
    """
    if tie_parity not in ("exact", "fast"):
        raise ValueError(f"unknown tie_parity: {tie_parity}")
    exact = tie_parity == "exact"
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

    # Settle-order ranks. The heap settles nodes in (distance, entry
    # priority, insertion counter) order; the counter is ordered by the
    # predecessor's settle time, so the per-column settle rank satisfies
    #   rank_j = dense_rank(D_j, pri_j, rank_{j-1}(pred)).
    # That recursion is propagated exactly through the scan. The dense rank
    # is computed with a hand-rolled bitonic network of elementwise
    # reshape/select ops (``lax.sort`` inside a scan is two orders of
    # magnitude slower on TPU). Keys are provably unique per column (a
    # predecessor's rank is unique; the same predecessor reaches two rows
    # only via different-priority edges), so stability is not needed.
    pad = 1
    while pad < h:
        pad *= 2
    iota_pad = jnp.broadcast_to(jnp.arange(pad, dtype=jnp.int32), (n, pad))

    # Per-stage ascending-direction masks, shaped for the (pairs, 2, j)
    # butterfly layout; static constants.
    stages = []
    flat = np.arange(pad)
    k_ = 2
    while k_ <= pad:
        j_ = k_ // 2
        while j_ >= 1:
            asc = ((flat & k_) == 0).reshape(pad // (2 * j_), 2, j_)[:, 0, :]
            stages.append((j_, jnp.asarray(asc[None, :, :])))
            j_ //= 2
        k_ *= 2

    def bitonic_rank(d_key, sub_key):
        """Dense rank of lexicographic (d_key, sub_key) per row, ties
        impossible by construction. (N, H) int32 -> (N, H) int32."""
        if pad != h:
            fill = jnp.full((n, pad - h), _BIG, jnp.int32)
            d_key = jnp.concatenate([d_key, fill], axis=-1)
            sub_key = jnp.concatenate([sub_key, fill], axis=-1)
        dk, sk, ik = d_key, sub_key, iota_pad
        for j_, asc in stages:
            shape = (n, pad // (2 * j_), 2, j_)
            dp, sp, ip = dk.reshape(shape), sk.reshape(shape), ik.reshape(shape)
            da, db = dp[:, :, 0, :], dp[:, :, 1, :]
            sa, sb = sp[:, :, 0, :], sp[:, :, 1, :]
            ia, ib = ip[:, :, 0, :], ip[:, :, 1, :]
            eq = da == db
            gt = (da > db) | (eq & (sa > sb))
            lt = (da < db) | (eq & (sa < sb))
            swap = jnp.where(asc, gt, lt)
            def cx(a, b):
                return (
                    jnp.where(swap, b, a),
                    jnp.where(swap, a, b),
                )
            da, db = cx(da, db)
            sa, sb = cx(sa, sb)
            ia, ib = cx(ia, ib)
            dk = jnp.stack([da, db], axis=2).reshape(n, pad)
            sk = jnp.stack([sa, sb], axis=2).reshape(n, pad)
            ik = jnp.stack([ia, ib], axis=2).reshape(n, pad)
        rank = jnp.zeros((n, pad), jnp.int32)
        rank = rank.at[jnp.arange(n, dtype=jnp.int32)[:, None], ik].set(iota_pad)
        return rank[:, :h]

    # Column 0: nodes settle in (distance, row) order — their best heap
    # entries all arrive via 'right' edges pushed in top-down
    # virtual-column order.
    d0 = 255 - m[:, 0, :]  # (N, H): entry edge from the all-ones column
    if exact:
        rank0 = bitonic_rank(
            d0, jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32), (n, h))
        )
    else:
        # Fast mode: the rank slot carries the grand-pred (distance,
        # priority) signature pair instead (packed small ints).
        rank0 = jnp.zeros((n, h), jnp.int32)
    pri0 = jnp.ones((n, h), jnp.int32)
    # Predecessor settle keys (virtual column: distance 0, priority 0).
    d_pred0 = jnp.zeros((n, h), jnp.int32)
    pri_pred0 = jnp.zeros((n, h), jnp.int32)

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
    # Candidate (predecessor) row index, for the fast-mode top-row fallback.
    cand_rows = jnp.stack(
        [jnp.broadcast_to(rows_1h + off, (1, h)) for off in offsets], axis=0
    )  # (2g+1, 1, H)

    def shifts(x):
        out = [x]
        for k in range(1, max_grad + 1):
            out.append(_shift_up(x, k))
        for k in range(1, max_grad + 1):
            out.append(_shift_down(x, k))
        return jnp.stack(out, axis=0)  # (2g+1, N, H)

    def refine(valid, key):
        masked = jnp.where(valid, key, _BIG)
        return valid & (masked == jnp.min(masked, axis=0, keepdims=True))

    def step(carry, m_cur):
        d, m_prev, pri_prev, rank_prev, d_pred, pri_pred = carry
        q = d - m_prev  # (N, H); +510 - m_cur added after the min
        stacked = shifts(q)
        best = jnp.min(stacked, axis=0)
        tied = stacked == best[None]
        d_new = best + 510 - m_cur

        sh_d = shifts(d)
        sh_pp = shifts(pri_prev)
        stacked_rank = shifts(rank_prev)

        # Heap-entry validity: a zero-weight edge (both endpoints 255,
        # `graph_search.py:79`) comes from a predecessor u with *equal*
        # distance, whose entry only exists if u settles before this node
        # pops via its best strict (positive-weight) entry from s. The race
        # compares u's settle key (d, pri_u) against the strict pop key
        # (d, pri_s, ctr_s): priorities first; on a priority tie the
        # insertion counters, i.e. the settle order of u's predecessor
        # vs s — compared by (distance, pop priority), deeper cross-column
        # ties defaulting to valid (the plateau support chain was pushed
        # earlier).
        zero_edge = (shifts(m_prev) == 255) & (m_cur == 255)[None]
        strict = tied & ~zero_edge
        pri_strict = jnp.where(strict, stacked_pri, _BIG)
        best_strict_pri = jnp.min(pri_strict, axis=0)
        strict_rank_m = jnp.where(
            pri_strict == best_strict_pri[None], stacked_rank, _BIG
        )
        s_choice = jnp.argmin(strict_rank_m, axis=0)

        def sgather(x):
            return jnp.take_along_axis(x, s_choice[None], axis=0)[0]

        d_s = sgather(sh_d)[None]
        pri_pop_s = sgather(sh_pp)[None]
        pu = sh_pp
        dpu = shifts(d_pred)
        ppu = shifts(pri_pred)
        ps = best_strict_pri[None]
        zero_valid = (
            tied
            & zero_edge
            & (
                (pu < ps)
                | (
                    (pu == ps)
                    & ((dpu < d_s) | ((dpu == d_s) & (ppu <= pri_pop_s)))
                )
            )
        )
        valid = strict | zero_valid
        valid = jnp.where(jnp.any(valid, axis=0, keepdims=True), valid, tied)

        # Pop entry = lexicographic min over valid entries of
        # (entry priority, insertion counter ~ pred settle order).
        best_pri = jnp.min(jnp.where(valid, stacked_pri, _BIG), axis=0)
        valid = refine(valid, jnp.broadcast_to(stacked_pri, valid.shape))
        if exact:
            rank_m = jnp.where(valid, stacked_rank, _BIG)
            entry_ctr = jnp.min(rank_m, axis=0)
            choice = jnp.argmin(rank_m, axis=0).astype(jnp.uint8)
        else:
            # Pred settle order approximated by the signature chain
            # (D, pri, grand-(D, pri) packed, row), top-row fallback.
            for key in (
                sh_d,
                sh_pp,
                dpu,
                ppu,
                stacked_rank,
                jnp.broadcast_to(cand_rows, valid.shape),
            ):
                valid = refine(valid, key)
            choice = jnp.argmax(valid, axis=0).astype(jnp.uint8)

        def cgather(x):
            return jnp.take_along_axis(x, choice[None].astype(jnp.int32), axis=0)[0]

        if exact:
            rank_new = bitonic_rank(d_new, best_pri * pad + entry_ctr)
        else:
            # Carry the grand-pred (D, pri) pair packed into the rank slot.
            rank_new = cgather(dpu) * 8 + jnp.minimum(cgather(ppu), 7)
        carry_new = (
            d_new,
            m_cur,
            best_pri,
            rank_new,
            cgather(sh_d),
            cgather(sh_pp),
        )
        return carry_new, choice

    (
        (d_final, m_last, pri_last, rank_last, d_pred_last, pri_pred_last),
        choices,
    ) = jax.lax.scan(step, (d0, m[:, 0, :], pri0, rank0, d_pred0, pri_pred0), xs)
    # choices: (W-1, N, H)

    # Exit edge back into the all-ones virtual column. The first virtual
    # node settled starts a free priority-0 descent that claims the
    # bottom-right corner, so the backtracked exit row is that of the
    # *earliest-settled* last-column node among those with minimal exit
    # distance — i.e. minimal settle rank among exit-distance ties.
    exit_dist = d_final + 255 - m_last  # (N, H)
    tied_e = exit_dist == jnp.min(exit_dist, axis=-1, keepdims=True)
    if exact:
        exit_keys = (rank_last,)
    else:
        exit_keys = (d_final, pri_last, d_pred_last, pri_pred_last, rank_last)
    for key in exit_keys:
        masked = jnp.where(tied_e, key, _BIG)
        tied_e = tied_e & (masked == jnp.min(masked, axis=-1, keepdims=True))
    r_last = jnp.argmax(tied_e, axis=-1).astype(jnp.int32)  # (N,)

    batch_idx = jnp.arange(n, dtype=jnp.int32)

    def back(r, choice_col):
        c = choice_col[batch_idx, r]  # (N,)
        r_prev = r + offsets_arr[c.astype(jnp.int32)]
        return r_prev, r

    r0, rows_rev = jax.lax.scan(back, r_last, choices, reverse=True)
    # rows_rev[j] is the row at column j+1; prepend column 0.
    rows = jnp.concatenate([r0[None, :], rows_rev], axis=0)  # (W, N)
    return jnp.moveaxis(rows, 0, 1).reshape(lead + (w,))


def delineate_image_maps(
    boundary_maps: jnp.ndarray,
    max_grad: int = 1,
    tie_parity: str = "exact",
    backend: str = "auto",
) -> jnp.ndarray:
    """Delineate from image-orientation maps ``(..., H, W)`` (as produced by
    :func:`ops.boundary.boundary_prob_maps`), returning rows ``(..., W)``.

    Equivalent to the reference's transpose-then-``segment_maps`` sequence
    (`prediction/prediction.py:134-141`).
    """
    return delineate(
        jnp.swapaxes(boundary_maps, -1, -2),
        max_grad=max_grad,
        tie_parity=tie_parity,
        backend=backend,
    )


def calc_errors(predictions: jnp.ndarray, truths: jnp.ndarray) -> jnp.ndarray:
    """Per-column delineation error ``prediction - truth`` with NaN where
    the truth is NaN or <= 0 — reference `graph_search.py:479-516`."""
    predictions = predictions.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    truths_f = truths.astype(predictions.dtype)
    invalid = jnp.isnan(truths_f) | (truths_f <= 0)
    return jnp.where(invalid, jnp.nan, predictions - truths_f)
