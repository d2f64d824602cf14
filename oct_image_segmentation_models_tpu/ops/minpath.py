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
  predecessor's settle against the node's strict pop (entry validity).
  The race compares the two predecessors' *global* settle keys, which
  expand recursively into the lexicographic sequence
  ``(w1, pi2, w2, pi3, ...)`` of winning-entry edge weights and entry
  priorities up the ancestor chain (both chains are rooted at the same
  tied distance, so absolute distances reduce to per-edge weights).
  Each node carries this chain as packed integers — ``(510 - w)`` (9
  bits) and the predecessor's entry priority (``bit_length(2g+1)``
  bits) per level, two levels per int32 — giving an exact race to
  ancestor depth 4 in two carried arrays (ties beyond that depth
  default to the plateau-support side);
- final column: the backtrack climbs the free virtual descent to the
  earliest-settled tied exit row.

Zero-edge winners additionally settle no earlier than their
predecessor (their entry is pushed mid-cohort), so their rank key takes
the max of the own and predecessor priority fields.

Verified against a faithful heapq oracle in ``tests/test_minpath.py``
and against the upstream package itself in
``tests/test_reference_oracle.py``: bit-exact on realistic
(single-ridge) boundary maps, flat tails, gaps, large jumps, and
sparse-random (p <= ~0.15) adversarial maps. Residual divergence
classes, ALL cost-optimal (path sums equal to the oracle's optimum —
asserted by the suite on every divergent column):

(a) wide multi-row 255 plateaus on ridge maps — equal-cost races
    decided by cascade pop events deeper than the carried state;
    measured at flagship scale (1024x512, every column on a 2-4-row
    plateau): 1.6% of columns, 0.018 px MAE — inside the 0.05 px
    budget (``test_flagship_scale_plateau_divergence_budget``);
(b) DENSE-random 0/255 lattices (p in ~[0.2, 0.45]) — equal-cost path
    families grow combinatorially and heap-order emulation at carried
    depth 4 no longer pins a unique member: measured divergence is
    map-dependent and NOT budgeted (r4 measurement, 128x64 maps:
    up to ~35% of columns and ~5.9 px MAE at p~0.3-0.4, max error
    51 px — always cost-optimal). This regime is out-of-distribution
    (a dense random lattice has no "boundary"); the 0.05 px budget
    claim applies to realistic model-output maps and the plateau
    worst case above, not to this one
    (``test_dense_random_envelope_cost_optimality`` records the
    envelope);
(c) float64 pseudo-ties — paths with exactly equal rational cost whose
    left-to-right float64 accumulations differ by an ulp, which the
    reference's heap resolves as a strict inequality (rounding noise
    that exact integer arithmetic cannot reproduce; see PLAN.md §4 for
    a measured instance).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Python int, NOT jnp.int32: a module-level device constant would
# initialize the JAX backend (i.e. open a TPU client) as a side effect of
# importing this module — which spawned host-side worker processes
# (evaluation num_workers) must never do on the single tunneled chip.
_BIG = 2**30


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
    TPU (both tie parities have kernel bodies); "pallas"/"xla" force."""
    del tie_parity
    if backend == "auto":
        return jax.default_backend() == "tpu"
    if backend == "pallas":
        return True
    if backend == "xla":
        return False
    raise ValueError(f"unknown backend: {backend}")


def validate_max_grad_packing(max_grad: int) -> int:
    """Shared XLA/Pallas guard; returns PB (priority-field bit width).

    Packed ancestor-chain levels are LB = 9 + PB bits, two per int32;
    beyond 2*LB = 31 the top level reaches the int32 sign bit and signed
    compares would silently mis-order tie races.
    """
    pb = (3 + 2 * max_grad).bit_length()
    if 2 * (9 + pb) > 31:
        raise ValueError(
            f"max_grad={max_grad} exceeds the ancestor-chain packing limit "
            "(priority field needs 2*(9+PB) <= 31 bits, i.e. max_grad <= 30)"
        )
    return pb


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

        return delineate_pallas(
            maps_u8, max_grad=max_grad, tie_parity=tie_parity
        )
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
          network per column) plus packed ancestor chains for the
          zero-edge settle races (module docstring) — matches the heap
          bit-for-bit on realistic (single-ridge) boundary maps incl.
          plateau and flat-tail tie chains and sparse-random maps;
          residual divergences are equal-cost ties resolved deeper
          than the carried state (see the module docstring's measured
          envelope: ~1.6% of columns on wide multi-row plateau ridges,
          unbudgeted on out-of-distribution dense-random lattices);
        - "fast": no settle ranks — pop choices refine over the packed
          ancestor chains only, with a top-row fallback. Same cost
          guarantee, weaker tie parity, cheaper per column.

    Returns:
      int32 rows ``(..., W)`` — the delineated boundary row per column,
      identical to reference ``delineate_boundary`` output (modulo
      ``tie_parity``).
    """
    if tie_parity not in ("exact", "fast"):
        raise ValueError(f"unknown tie_parity: {tie_parity}")
    validate_max_grad_packing(max_grad)
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
        rank0 = jnp.zeros((n, h), jnp.int32)
    pri0 = jnp.ones((n, h), jnp.int32)

    # Packed ancestor chains (module docstring): per level,
    # (510 - edge weight) in 9 bits and the node's entry priority + 1 in
    # PB bits; two levels per int32, c1 = levels 1-2, c2 = levels 3-4.
    # The +1 leaves 0 and the all-ones value free as strictly-smaller /
    # strictly-larger sentinels for the ancestor-merge resolution below.
    PB = (3 + 2 * max_grad).bit_length()
    LB = 9 + PB
    LMASK = (1 << LB) - 1
    P1M = ((1 << PB) - 1) << LB  # priority field of chain level 1
    P2M = (1 << PB) - 1  # priority field of chain level 2
    # Predecessor-row chains (levels 1-2): the settle race is not purely
    # lexicographic — when u's level-k ancestor IS the predecessor of
    # s's level-k ancestor (the chains merge), the ancestor settles
    # first regardless of the priority fields, so merged levels force
    # the priority comparison in u's favour.
    RB = max(9, (h - 1).bit_length())
    RMASK = (1 << RB) - 1
    # Column 0: entry edge weight 255 - m (virtual all-ones column), the
    # virtual predecessors' own entries are the free pri-0 descent with
    # weight 0 (level pack (510 << PB) | 1) down to the source at row 0
    # (all-zero pad, which correctly settles earliest).
    vlvl = (510 << PB) | 1
    rows_b = jnp.broadcast_to(jnp.arange(h, dtype=jnp.int32), (n, h))
    c1_0 = ((((255 + m[:, 0, :]) << PB) | 1) << LB) | jnp.where(
        rows_b >= 1, vlvl, 0
    )
    c2_0 = (jnp.where(rows_b >= 2, vlvl, 0) << LB) | jnp.where(
        rows_b >= 3, vlvl, 0
    )
    rw_0 = (rows_b << RB) | jnp.maximum(rows_b - 1, 0)

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
        d, m_prev, pri_prev, rank_prev, c1, c2, rw = carry
        q = d - m_prev  # (N, H); +510 - m_cur added after the min
        stacked = shifts(q)
        best = jnp.min(stacked, axis=0)
        tied = stacked == best[None]
        d_new = best + 510 - m_cur

        sh_d = shifts(d)
        sh_pp = shifts(pri_prev)
        sh_m = shifts(m_prev)
        sh_c1 = shifts(c1)
        sh_c2 = shifts(c2)
        sh_rw = shifts(rw)
        stacked_rank = shifts(rank_prev)

        # Heap-entry validity: a zero-weight edge (both endpoints 255,
        # `graph_search.py:79`) comes from a predecessor u with *equal*
        # distance, whose entry only exists if u settles before this node
        # pops via its best strict (positive-weight) entry from s. The
        # race compares u's settle key (d, pri_u, ctr_u) against the
        # strict pop key (d, pri_s, ctr_s): priorities first; on a
        # priority tie the counters, i.e. the settle order of u's
        # predecessor vs s's strict predecessor — u's side is its carried
        # chain, s's side is the strict edge's level prepended to the
        # strict predecessor's chain. Ties deeper than the carried depth
        # default to valid (the plateau support chain was pushed earlier).
        zero_edge = (sh_m == 255) & (m_cur == 255)[None]
        strict = tied & ~zero_edge
        pri_strict = jnp.where(strict, stacked_pri, _BIG)
        best_strict_pri = jnp.min(pri_strict, axis=0)
        strict_rank_m = jnp.where(
            pri_strict == best_strict_pri[None],
            stacked_rank if exact else sh_c1,
            _BIG,
        )
        s_choice = jnp.argmin(strict_rank_m, axis=0)

        def sgather(x):
            return jnp.take_along_axis(x, s_choice[None], axis=0)[0]

        s_pack = ((sgather(sh_m) + m_cur) << PB) | (sgather(sh_pp) + 1)
        s_gc1 = sgather(sh_c1)
        s_c1 = ((s_pack << LB) | (s_gc1 >> LB))[None]
        s_c2 = (((s_gc1 & LMASK) << LB) | (sgather(sh_c2) >> LB))[None]
        s_rw = sgather(sh_rw)[None]
        # Priority fields are event-valid only when both compared
        # entries already coexist in the heap, i.e. when neither side's
        # next chain link is a zero-weight cascade edge (w-field 510,
        # whose push order is the sequential cascade order, not key
        # order). Suppress (tie out) the priority comparison at levels
        # whose successor link cascades on either side; weight fields
        # (distance comparisons) are always valid. Level 4's successor
        # is unknown, so its priority field is always suppressed.
        def wfield(c, shift):
            return ((c >> shift) & 511) == 510

        supp1 = wfield(sh_c1, PB) | wfield(s_c1, PB)
        supp2 = wfield(sh_c2, LB + PB) | wfield(s_c2, LB + PB)
        supp3 = wfield(sh_c2, PB) | wfield(s_c2, PB)
        u_c1 = sh_c1 & ~jnp.where(supp1, P1M, 0) & ~jnp.where(supp2, P2M, 0)
        sv_c1 = (
            jnp.broadcast_to(s_c1, sh_c1.shape)
            & ~jnp.where(supp1, P1M, 0)
            & ~jnp.where(supp2, P2M, 0)
        )
        u_c2 = sh_c2 & ~jnp.where(supp3, P1M, 0) & ~P2M
        sv_c2 = (
            jnp.broadcast_to(s_c2, sh_c2.shape)
            & ~jnp.where(supp3, P1M, 0)
            & ~P2M
        )
        # Ancestor merges (exact, takes precedence): when u's level-k
        # ancestor IS the predecessor of s's level-k ancestor, the
        # ancestor settles first regardless of priorities — force the
        # priority field of merged levels to the sentinels so the packed
        # compare resolves u-first there.
        m1 = (sh_rw >> RB) == (s_rw >> RB)
        m2 = (sh_rw & RMASK) == (s_rw & RMASK)
        u_c1 = u_c1 & ~jnp.where(m1, P1M, 0) & ~jnp.where(m2, P2M, 0)
        sv_c1 = sv_c1 | jnp.where(m1, P1M, 0) | jnp.where(m2, P2M, 0)
        pu = sh_pp
        ps = best_strict_pri[None]
        zero_valid = (
            tied
            & zero_edge
            & (
                (pu < ps)
                | (
                    (pu == ps)
                    & ((u_c1 < sv_c1) | ((u_c1 == sv_c1) & (u_c2 <= sv_c2)))
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
            # Pred settle order approximated by the carried chains,
            # top-row fallback.
            for key in (
                sh_d,
                sh_pp,
                sh_c1,
                sh_c2,
                jnp.broadcast_to(cand_rows, valid.shape),
            ):
                valid = refine(valid, key)
            choice = jnp.argmax(valid, axis=0).astype(jnp.uint8)

        def cgather(x):
            return jnp.take_along_axis(x, choice[None].astype(jnp.int32), axis=0)[0]

        if exact:
            # A node whose winning entry is a zero-weight edge cannot
            # settle before its predecessor (the entry is pushed mid-
            # cohort when the pred settles) NOR before its own key
            # position — its effective key is the max of the two. Both
            # orderings share the counter field (the pred's settle
            # rank, already in entry_ctr), so the max reduces to the
            # max of the two priority fields.
            zero_chosen = cgather(zero_edge.astype(jnp.int32)) == 1
            pri_eff = jnp.where(
                zero_chosen,
                jnp.maximum(best_pri, cgather(sh_pp)),
                best_pri,
            )
            rank_new = bitonic_rank(d_new, pri_eff * pad + entry_ctr)
        else:
            rank_new = rank_prev  # unused in fast mode
        c_pack = ((cgather(sh_m) + m_cur) << PB) | (cgather(sh_pp) + 1)
        c_gc1 = cgather(sh_c1)
        pred_row = cgather(jnp.broadcast_to(cand_rows, valid.shape))
        carry_new = (
            d_new,
            m_cur,
            best_pri,
            rank_new,
            (c_pack << LB) | (c_gc1 >> LB),
            ((c_gc1 & LMASK) << LB) | (cgather(sh_c2) >> LB),
            (pred_row << RB) | (cgather(sh_rw) >> RB),
        )
        return carry_new, choice

    (
        (d_final, m_last, pri_last, rank_last, c1_last, c2_last, _rw_last),
        choices,
    ) = jax.lax.scan(
        step, (d0, m[:, 0, :], pri0, rank0, c1_0, c2_0, rw_0), xs
    )
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
        exit_keys = (d_final, pri_last, c1_last, c2_last)
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


@functools.partial(jax.jit, static_argnames=("max_grad",))
def delineate_float(maps: jnp.ndarray, max_grad: int = 1) -> jnp.ndarray:
    """Cost-optimal ("fast"-tie) DP for FLOAT probability maps.

    Args:
      maps: ``(..., W, H)`` float maps in [0, 1] (the reference's
        ``prob_map / 255`` scale, `graph_search.py:553-554`), transposed
        (column, row) orientation. Any leading batch dims.
      max_grad: maximum row step per column.

    Same column DP as :func:`_delineate_xla` with the reference's float
    edge weights, replacing the ~1000x-slower per-map host Dijkstra for
    non-quantized maps. The column-uniform ``+2`` of the reference's
    ``2 - p_u - p_v`` edge weight is dropped from the carried distance
    (every competing path at a column has crossed the same number of
    edges, so it cancels from every comparison): the accumulator holds
    only ``-(sum p)``, keeping float32 rounding at the scale of the
    path REWARD (typically O(10-100) on probability maps) instead of
    O(2W) ~ 2048, i.e. ulp ~1e-5 rather than ~2.4e-4 (float64 under
    ``jax_enable_x64``).

    Tie/precision semantics are "fast" only: candidates within float32
    resolution of each other resolve by the heap's first-order edge
    preference (same row, then from below, then from above) — a path
    whose true float64 cost is better by less than the accumulator's
    resolution can lose, and NO settle-order simulation is attempted
    (float64 heap order is unreproducible anyway: the reference's own
    tie resolution depends on float64 addition rounding noise, PLAN.md
    §4). Exact ties are measure-zero on real probability outputs; the
    flagship-scale budget test (``tests/test_minpath.py::
    test_flagship_scale_float_maps_budget``) bounds the divergence on
    realistic maps.

    Returns int32 rows ``(..., W)``.
    """
    if maps.ndim < 2:
        raise ValueError("maps must have shape (..., W, H)")
    lead = maps.shape[:-2]
    w, h = maps.shape[-2], maps.shape[-1]
    dtype = jnp.promote_types(maps.dtype, jnp.float32)
    p = maps.reshape((-1, w, h)).astype(dtype)
    n = p.shape[0]

    offsets = (
        [0]
        + list(range(1, max_grad + 1))
        + [-k for k in range(1, max_grad + 1)]
    )
    offsets_arr = jnp.asarray(np.array(offsets, dtype=np.int32))

    def shifts(x):
        out = [x]
        for k in range(1, max_grad + 1):
            out.append(_shift_up(x, k))
        for k in range(1, max_grad + 1):
            out.append(_shift_down(x, k))
        return jnp.stack(out, axis=0)  # (2g+1, N, H)

    # Carried distance = -(sum of p along the path): the reference's
    # per-edge +2 is column-uniform and cancels from every comparison
    # (see docstring), so it is dropped for float precision.
    d0 = -p[:, 0, :]  # entry edge from the all-ones virtual column
    xs = jnp.moveaxis(p[:, 1:, :], 1, 0)  # (W-1, N, H)

    def step(carry, p_cur):
        d, p_prev = carry
        stacked = shifts(d - p_prev)
        best = jnp.min(stacked, axis=0)
        # argmin returns the FIRST minimal index; the stack order IS the
        # preference order (same row < below < above), mirroring the
        # heap-priority order the fast integer mode uses.
        choice = jnp.argmin(stacked, axis=0).astype(jnp.uint8)
        return (best - p_cur, p_cur), choice

    (d_final, p_last), choices = jax.lax.scan(step, (d0, p[:, 0, :]), xs)

    exit_dist = d_final - p_last  # edge back into the virtual column
    r_last = jnp.argmin(exit_dist, axis=-1).astype(jnp.int32)  # first min

    batch_idx = jnp.arange(n, dtype=jnp.int32)

    def back(r, choice_col):
        c = choice_col[batch_idx, r]
        return r + offsets_arr[c.astype(jnp.int32)], r

    r0, rows_rev = jax.lax.scan(back, r_last, choices, reverse=True)
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
