"""Pallas TPU kernel for the exact min-path DP.

The XLA ``lax.scan`` implementation in :mod:`.minpath` is correct but
latency-bound on TPU: the per-column settle-rank computation (gathers +
rank network) breaks XLA's loop-body fusion into dozens of kernel
launches (~1 ms/column). This kernel runs the whole forward DP as ONE
Pallas program:

- the grid iterates over column chunks (blocks pipelined HBM->VMEM), the
  sequential column loop runs in-kernel over VMEM state;
- the settle-rank bitonic network is expressed with lane shifts + selects
  only (no reshapes, scatters, or sorts), which Mosaic compiles to
  straight VPU code;
- maps are packed along BOTH vector axes: 8 maps in the sublane dimension
  (Mosaic rejects larger sublane extents for these op patterns) and
  further map-groups side-by-side in the lane dimension as power-of-two
  segments. The bitonic butterflies never cross a segment (partners
  ``i ^ j`` stay inside a power-of-two aligned segment), the DP's banded
  shifts are masked at segment edges, and pad rows are walled off with
  BIG distances — so each segment solves its map independently while one
  op chain advances all of them, amortising the VPU dependency-chain
  latency that dominates this kernel.

Semantics are identical to ``minpath.delineate(..., tie_parity="exact")``;
see that module's docstring for the algorithm and the tie-breaking
derivation. Verified equal to the XLA path and to the heapq oracle in
``tests/test_minpath_pallas.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import minpath

_BIG = 2**30  # python int: pallas kernels cannot capture jnp constants
_SUBLANES = 8  # maps per sublane block (Mosaic ceiling for these patterns)
_MAX_LANES = 2048  # cap on packed lane extent per kernel invocation


def _shift_up(x, k):
    """y[i] = x[i+k] (from below), +inf fill at the global edge."""
    return jnp.concatenate(
        [x[..., k:], jnp.full(x.shape[:-1] + (k,), _BIG, x.dtype)], axis=-1
    )


def _shift_down(x, k):
    """y[i] = x[i-k] (from above), +inf fill at the global edge."""
    return jnp.concatenate(
        [jnp.full(x.shape[:-1] + (k,), _BIG, x.dtype), x[..., :-k]], axis=-1
    )


def _butterfly_stages(p):
    """Bitonic network stage list [(block, stride)] for power-of-two
    segment length ``p``."""
    stages = []
    k = 2
    while k <= p:
        j = k // 2
        while j >= 1:
            stages.append((k, j))
            j //= 2
        k *= 2
    return stages


def _build_kernel(w, h, max_grad, p, groups, exact=True):
    """Kernel over (sublanes=8, lanes=groups*p) packed state.

    ``exact=False`` builds the fast-tie-parity variant: the settle-rank
    bitonic network (45 forward + 45 replay stages, ~85% of the exact
    kernel's per-column vector ops) is dropped and pop choices refine
    over the packed ancestor chains only, bit-matching
    ``minpath._delineate_xla(..., tie_parity="fast")`` (same cost
    guarantee, weaker tie parity — see that docstring)."""
    lanes = groups * p
    stages = _butterfly_stages(p)
    # Single-key settle-rank packing: distances are bounded by
    # 255 + 510*(w-1) (entry edge + per-column weight <= 510) and rank
    # sub-keys by (2 + 2*max_grad) * p, so when d_max * F + sub fits in
    # int32 the bitonic compares ONE packed key instead of a
    # lexicographic pair — halves the per-stage op count.
    _F = 1
    while _F < (2 + 2 * max_grad) * p:
        _F *= 2
    _d_cap = (2**31 - _F) // _F
    pack_rank = (255 + 510 * (w - 1)) <= _d_cap - 1
    offsets = [0] + list(range(1, max_grad + 1)) + [
        -k for k in range(1, max_grad + 1)
    ]
    nb = _SUBLANES
    # Packed ancestor-chain constants for the zero-edge settle races —
    # see minpath.py (the XLA path) for the full derivation.
    PB = minpath.validate_max_grad_packing(max_grad)
    LB = 9 + PB
    LMASK = (1 << LB) - 1
    P1M = ((1 << PB) - 1) << LB
    P2M = (1 << PB) - 1
    RB = max(9, (h - 1).bit_length())
    RMASK = (1 << RB) - 1
    vlvl = (510 << PB) | 1

    def local_iota():
        # Row index within each p-aligned segment.
        lane = jax.lax.broadcasted_iota(jnp.int32, (nb, lanes), 1)
        return lane & (p - 1)

    def seg_shift_up(x, k, li):
        """Banded candidate from local row i+k; BIG outside the segment."""
        y = _shift_up(x, k)
        return jnp.where(li >= p - k, _BIG, y)

    def seg_shift_down(x, k, li):
        y = _shift_down(x, k)
        return jnp.where(li < k, _BIG, y)

    def shifts(x, li):
        out = [x]
        for k in range(1, max_grad + 1):
            out.append(seg_shift_up(x, k, li))
        for k in range(1, max_grad + 1):
            out.append(seg_shift_down(x, k, li))
        return jnp.stack(out, axis=0)  # (2g+1, NB, lanes)

    def stage_masks(li):
        """Per-stage (lower, dir) masks — pure functions of the row iota,
        computed ONCE before the column loop (each column's rank_of reuses
        them instead of rebuilding 2 iota-derived masks x 45 stages)."""
        out = []
        for k, j in stages:
            asc = (li & k) == 0
            lower = (li & j) == 0
            out.append((j, lower, lower == asc))
        return out

    def rank_of(d_key, sub_key, li, masks):
        """Per-segment dense settle rank of unique (d_key, sub_key).

        One butterfly pass sorts the keys while recording each stage's
        swap mask; replaying the recorded swaps in *reverse* order on the
        row iota yields the inverse permutation (= the rank) directly —
        each masked pairwise swap is an involution, so the reversed
        composition inverts the sort's gather map. Saves a full second
        comparison pass."""
        swaps = []
        if pack_rank:
            # packed single-key path (see _F/_d_cap above); pad rows'
            # _BIG distances / sub-keys are clamped, their relative
            # order is irrelevant (never selected).
            kk = jnp.minimum(d_key, _d_cap) * _F + jnp.minimum(
                sub_key, _F - 1
            )
            for j, lower, direc in masks:
                pd = jnp.where(lower, _shift_up(kk, j), _shift_down(kk, j))
                keep = (kk < pd) == direc
                kk = jnp.where(keep, kk, pd)
                swaps.append((j, lower, keep))
        else:
            dk, sk = d_key, sub_key
            for j, lower, direc in masks:
                pd = jnp.where(lower, _shift_up(dk, j), _shift_down(dk, j))
                ps = jnp.where(lower, _shift_up(sk, j), _shift_down(sk, j))
                own_lt = (dk < pd) | ((dk == pd) & (sk < ps))
                keep = own_lt == direc
                dk = jnp.where(keep, dk, pd)
                sk = jnp.where(keep, sk, ps)
                swaps.append((j, lower, keep))
        rank = li
        for j, lower, keep in reversed(swaps):
            partner = jnp.where(
                lower, _shift_up(rank, j), _shift_down(rank, j)
            )
            # 'keep' marks rows that kept their own value at this stage;
            # its partner row necessarily also kept/swapped symmetrically,
            # so the shifted mask equals the local mask.
            rank = jnp.where(keep, rank, partner)
        return rank

    def make_pri(li):
        # Heap-entry priority per candidate (see minpath.py), local rows.
        pri_list = [jnp.full((nb, lanes), 1, jnp.int32)]
        for k in range(1, max_grad + 1):
            pri_list.append(jnp.full((nb, lanes), 1 + k, jnp.int32))
        for k in range(1, max_grad + 1):
            pri_list.append(1 + jnp.minimum(max_grad, li - k) + k)
        return jnp.stack(pri_list, axis=0)  # (2g+1, NB, lanes)

    def kernel(*refs):
        """One body for both tie parities (`exact` resolves at trace
        time, so each compiled kernel contains only its own ops — the
        zero-edge race logic below is written once for both).

        Ref layout (matches _run_packed's out_shape/scratch lists):
        exact:  (m, choice, d_fin, rank_fin) + scratch (d, pri, rank,
                c1, c2, rw, mprev);
        fast:   (m, choice, d_fin, pri_fin, c1_fin, c2_fin) + scratch
                (d, pri, c1, c2, rw, mprev).

        Fast mode drops the settle-rank bitonic network (45 forward +
        45 replay stages, ~85% of the exact kernel's per-column vector
        ops); pop choices refine over (distance, entry priority,
        ancestor chains, topmost predecessor row), bit-matching
        ``minpath._delineate_xla(..., tie_parity="fast")`` (same cost
        guarantee, weaker tie parity — see that docstring)."""
        if exact:
            (
                m_ref,  # in: (CW, NB, lanes) int32 — packed columns
                choice_ref,  # out: (CW, NB, lanes) int32
                dfin_ref,  # out: (NB, lanes) final column distance
                rankfin_ref,  # out: (NB, lanes) final settle rank
                d_s,  # scratch: distances
                pri_s,  # scratch: pop priorities
                rank_s,  # scratch: settle ranks
                c1_s,  # scratch: packed ancestor chain, levels 1-2
                c2_s,  # scratch: packed ancestor chain, levels 3-4
                rw_s,  # scratch: packed predecessor-row chain
                mprev_s,  # scratch: previous column map values
            ) = refs
        else:
            (
                m_ref,
                choice_ref,
                dfin_ref,
                prifin_ref,  # out: final column pop priority
                c1fin_ref,  # out: final ancestor chain 1-2
                c2fin_ref,  # out: final ancestor chain 3-4
                d_s,
                pri_s,
                c1_s,
                c2_s,
                rw_s,
                mprev_s,
            ) = refs
        chunk = pl.program_id(0)
        cw = m_ref.shape[0]
        li = local_iota()
        stacked_pri = make_pri(li)
        masks = stage_masks(li) if exact else None
        is_pad = li >= h  # rows beyond the real map height: hard wall

        def column(ji, _):
            j = chunk * cw + ji
            m_cur = m_ref[ji]

            @pl.when(j == 0)
            def _init():
                d0 = jnp.where(is_pad, _BIG, 255 - m_cur)
                d_s[:] = d0
                pri_s[:] = jnp.ones((nb, lanes), jnp.int32)
                if exact:
                    rank_s[:] = rank_of(d0, li, li, masks)
                # Chains: entry edge 255 - m from the virtual all-ones
                # column, whose own entries are the pri-0 weight-0
                # descent down to the source (see minpath.py).
                c1_s[:] = ((((255 + m_cur) << PB) | 1) << LB) | jnp.where(
                    li >= 1, vlvl, 0
                )
                c2_s[:] = (jnp.where(li >= 2, vlvl, 0) << LB) | jnp.where(
                    li >= 3, vlvl, 0
                )
                rw_s[:] = (li << RB) | jnp.maximum(li - 1, 0)
                choice_ref[ji] = jnp.zeros((nb, lanes), jnp.int32)

            @pl.when(j > 0)
            def _step():
                d = d_s[:]
                m_prev = mprev_s[:]
                pri_prev = pri_s[:]
                c1 = c1_s[:]
                c2 = c2_s[:]
                rw = rw_s[:]

                q = d - m_prev
                stacked = shifts(q, li)
                best = jnp.min(stacked, axis=0)
                tied = stacked == best[None]
                d_new = jnp.where(is_pad, _BIG, best + 510 - m_cur)

                # (shift order matches each mode's historical trace:
                # Mosaic's scheduler is sensitive to emission order, and
                # reordering these independent ops measurably moved the
                # fast kernel's latency)
                if not exact:
                    sh_d = shifts(d, li)
                sh_pp = shifts(pri_prev, li)
                sh_m = shifts(m_prev, li)
                sh_c1 = shifts(c1, li)
                sh_c2 = shifts(c2, li)
                sh_rw = shifts(rw, li)
                if exact:
                    stacked_rank = shifts(rank_s[:], li)
                else:
                    cand_idx = jax.lax.broadcasted_iota(
                        jnp.int32, stacked.shape, 0
                    )

                # Heap-entry validity for zero-weight edges: see
                # minpath.py for the full derivation (ancestor chains,
                # cascade suppression, merge resolution).
                zero_edge = (sh_m == 255) & (m_cur == 255)[None]
                strict = tied & ~zero_edge
                pri_strict = jnp.where(strict, stacked_pri, _BIG)
                best_strict_pri = jnp.min(pri_strict, axis=0)
                # Strict-pop representative: exact orders preds by true
                # settle rank; fast approximates pred order by the
                # carried chain, first candidate (offsets order) among
                # chain ties = the XLA fast path's argmin.
                strict_key = stacked_rank if exact else sh_c1
                strict_rank_m = jnp.where(
                    pri_strict == best_strict_pri[None], strict_key, _BIG
                )
                s_min = jnp.min(strict_rank_m, axis=0)
                s_sel = strict_rank_m == s_min[None]
                if not exact:
                    s_ci = jnp.min(jnp.where(s_sel, cand_idx, _BIG), axis=0)
                    s_sel = s_sel & (cand_idx == s_ci[None])

                def sselect(stacked_x):
                    return jnp.min(jnp.where(s_sel, stacked_x, _BIG), axis=0)

                s_pack = ((sselect(sh_m) + m_cur) << PB) | (
                    sselect(sh_pp) + 1
                )
                s_gc1 = sselect(sh_c1)
                s_c1 = ((s_pack << LB) | (s_gc1 >> LB))[None]
                s_c2 = (((s_gc1 & LMASK) << LB) | (sselect(sh_c2) >> LB))[
                    None
                ]
                s_rw = sselect(sh_rw)[None]

                # Cascade suppression of priority fields + ancestor
                # merges (minpath.py).
                supp1 = (((sh_c1 >> PB) & 511) == 510) | (
                    ((s_c1 >> PB) & 511) == 510
                )
                supp2 = (((sh_c2 >> (LB + PB)) & 511) == 510) | (
                    ((s_c2 >> (LB + PB)) & 511) == 510
                )
                supp3 = (((sh_c2 >> PB) & 511) == 510) | (
                    ((s_c2 >> PB) & 511) == 510
                )
                u_c1 = (
                    sh_c1
                    & ~jnp.where(supp1, P1M, 0)
                    & ~jnp.where(supp2, P2M, 0)
                )
                sv_c1 = (
                    jnp.broadcast_to(s_c1, u_c1.shape)
                    & ~jnp.where(supp1, P1M, 0)
                    & ~jnp.where(supp2, P2M, 0)
                )
                u_c2 = sh_c2 & ~jnp.where(supp3, P1M, 0) & ~P2M
                sv_c2 = (
                    jnp.broadcast_to(s_c2, u_c2.shape)
                    & ~jnp.where(supp3, P1M, 0)
                    & ~P2M
                )
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
                            & (
                                (u_c1 < sv_c1)
                                | ((u_c1 == sv_c1) & (u_c2 <= sv_c2))
                            )
                        )
                    )
                )
                valid = strict | zero_valid
                # (logical blend, not jnp.where: Mosaic rejects selects on
                # boolean vectors)
                has_valid = jnp.any(valid, axis=0, keepdims=True)
                valid = (valid & has_valid) | (tied & ~has_valid)

                best_pri = jnp.min(
                    jnp.where(valid, stacked_pri, _BIG), axis=0
                )
                if exact:
                    pri_m = jnp.where(valid, stacked_pri, _BIG)
                    valid = valid & (pri_m == best_pri[None])
                    rank_m = jnp.where(valid, stacked_rank, _BIG)
                    entry_ctr = jnp.min(rank_m, axis=0)
                    chosen = rank_m == entry_ctr[None]
                    cand_idx = jax.lax.broadcasted_iota(
                        jnp.int32, stacked.shape, 0
                    )
                    rows_cand = jnp.stack(
                        [li + off for off in offsets], axis=0
                    )
                else:
                    rows_cand = jnp.stack(
                        [li + off for off in offsets], axis=0
                    )
                    # Refinement chain over broadcast keys; the last key
                    # (candidate row) is unique per candidate, so the
                    # surviving mask is singleton.
                    for key in (
                        jnp.broadcast_to(stacked_pri, valid.shape),
                        sh_d,
                        sh_pp,
                        sh_c1,
                        sh_c2,
                        rows_cand,
                    ):
                        kmasked = jnp.where(valid, key, _BIG)
                        kmin = jnp.min(kmasked, axis=0)
                        valid = valid & (kmasked == kmin[None])
                    chosen = valid

                def select(stacked_x):
                    return jnp.min(jnp.where(chosen, stacked_x, _BIG), axis=0)

                choice_ref[ji] = select(cand_idx)
                d_s[:] = d_new
                pri_s[:] = best_pri
                if exact:
                    # Zero-edge winners settle no earlier than their pred
                    # nor their own key position (see minpath.py): rank
                    # by the max of the two priority fields.
                    zero_chosen = select(zero_edge.astype(jnp.int32))
                    pri_eff = jnp.where(
                        zero_chosen == 1,
                        jnp.maximum(best_pri, select(sh_pp)),
                        best_pri,
                    )
                    rank_s[:] = rank_of(
                        d_new, pri_eff * p + entry_ctr, li, masks
                    )
                c_pack = ((select(sh_m) + m_cur) << PB) | (select(sh_pp) + 1)
                c_gc1 = select(sh_c1)
                c1_s[:] = (c_pack << LB) | (c_gc1 >> LB)
                c2_s[:] = ((c_gc1 & LMASK) << LB) | (select(sh_c2) >> LB)
                rw_s[:] = (select(rows_cand) << RB) | (select(sh_rw) >> RB)

            mprev_s[:] = m_cur

            @pl.when(j == w - 1)
            def _finish():
                dfin_ref[:] = d_s[:]
                if exact:
                    rankfin_ref[:] = rank_s[:]
                else:
                    prifin_ref[:] = pri_s[:]
                    c1fin_ref[:] = c1_s[:]
                    c2fin_ref[:] = c2_s[:]

            return 0

        jax.lax.fori_loop(0, cw, column, 0)

    return kernel, offsets


def _pack_plan(n: int, h: int):
    """Packing geometry: maps-per-sublane-block x lane groups."""
    p = 1
    while p < h:
        p *= 2
    nb = _SUBLANES
    n_blocks = -(-n // nb)
    groups = max(1, min(n_blocks, _MAX_LANES // p))
    n_super = -(-n_blocks // groups)
    return p, nb, groups, n_super, n_super * groups * nb


@functools.partial(
    jax.jit, static_argnames=("max_grad", "interpret", "tie_parity")
)
def delineate_pallas(
    maps_u8: jnp.ndarray,
    max_grad: int = 1,
    interpret: bool = False,
    tie_parity: str = "exact",
) -> jnp.ndarray:
    """Min-path delineation via the Pallas kernel.

    Same contract as ``minpath.delineate(maps, max_grad, tie_parity)``:
    ``(..., W, H) uint8 -> (..., W) int32``. ``tie_parity="fast"`` runs
    the chains-only kernel body (~4x fewer vector ops per column,
    bit-matching the XLA fast mode's weaker tie-break guarantee).
    """
    lead = maps_u8.shape[:-2]
    w, h = maps_u8.shape[-2], maps_u8.shape[-1]
    m = maps_u8.reshape((-1, w, h))
    n = m.shape[0]
    p, nb, groups, n_super, n_pad = _pack_plan(n, h)
    lanes = groups * p

    # Pack: (n_pad, W, H) -> (n_super, groups, nb, W, H)
    #   -> per super-block (W, nb, groups*P) with per-segment H->P pad
    # rows. Stays uint8 through the transpose (4x less relayout traffic);
    # the int32 widening happens in the final, sequential-write pass.
    if n_pad != n:
        m_padded = jnp.concatenate(
            [m, jnp.zeros((n_pad - n, w, h), m.dtype)], axis=0
        )
    else:
        m_padded = m
    m5 = m_padded.reshape(n_super, groups, nb, w, h)
    if p != h:
        m5 = jnp.pad(m5, ((0, 0), (0, 0), (0, 0), (0, 0), (0, p - h)))
    # (n_super, W, nb, groups, P) -> (n_super, W, nb, groups*P)
    m_packed = jnp.transpose(m5, (0, 3, 2, 1, 4)).reshape(
        n_super, w, nb, lanes
    )
    m_last = m[:, w - 1, :].astype(jnp.int32)
    return _run_packed(
        m_packed, m_last, lead, n, w, h, max_grad, interpret, tie_parity
    )


@functools.partial(
    jax.jit, static_argnames=("max_grad", "interpret", "tie_parity")
)
def delineate_pallas_s2d(
    maps_s2d_u8: jnp.ndarray,
    max_grad: int = 1,
    interpret: bool = False,
    tie_parity: str = "exact",
) -> jnp.ndarray:
    """:func:`delineate_pallas` taking maps in space-to-depth layout.

    ``maps_s2d_u8``: ``(B, M, Hb, Wb, 4)`` uint8 with channel layout
    ``(q_h, q_w)`` (from ``boundary_maps_from_s2d_labels(...,
    transposed="s2d")``), representing image-orientation ``(B, M, H, W)``
    maps with ``H = 2 Hb, W = 2 Wb``. Returns ``(B, M, W) int32`` rows.

    Rationale: the kernel's packed operand wants columns major and rows
    in the lane dimension; building that from an s2d-form map via the
    image or transposed orientation costs 3-4 relayout passes (~13 ms at
    the flagship shape). Here the s2d tensor goes to the packed layout
    in ONE 6-D uint8 transpose.
    """
    B, M, hb, wb, four = maps_s2d_u8.shape
    assert four == 4
    n = B * M
    w, h = 2 * wb, 2 * hb
    p, nb, groups, n_super, n_pad = _pack_plan(n, h)
    lanes = groups * p

    m6 = maps_s2d_u8.reshape(n, hb, wb, 2, 2)
    if n_pad != n:
        m6 = jnp.concatenate(
            [m6, jnp.zeros((n_pad - n, hb, wb, 2, 2), m6.dtype)], axis=0
        )
    # (ns, g, nb, i, j, qh, qw) -> (ns, j, qw, nb, g, i, qh)
    #   = (n_super, W(j,qw), nb, lanes(g, row=(i,qh)))
    m7 = m6.reshape(n_super, groups, nb, hb, wb, 2, 2)
    m7 = jnp.transpose(m7, (0, 4, 6, 2, 1, 3, 5))
    m_packed = m7.reshape(n_super, w, nb, groups * h)
    if p != h:
        # pad each group's row segment H -> P at the lane tail
        m_packed = jnp.pad(
            m_packed.reshape(n_super, w, nb, groups, h),
            ((0, 0), (0, 0), (0, 0), (0, 0), (0, p - h)),
        ).reshape(n_super, w, nb, lanes)

    # last real column (j = wb-1, qw = 1), rows (i, qh): (n, h)
    m_last = (
        maps_s2d_u8[:, :, :, wb - 1, :]
        .reshape(n, hb, 2, 2)[:, :, :, 1]
        .reshape(n, h)
        .astype(jnp.int32)
    )
    return _run_packed(
        m_packed, m_last, (B, M), n, w, h, max_grad, interpret, tie_parity
    )


def _run_packed(
    m_packed: jnp.ndarray,
    m_last: jnp.ndarray,
    lead: tuple,
    n: int,
    w: int,
    h: int,
    max_grad: int,
    interpret: bool,
    tie_parity: str = "exact",
) -> jnp.ndarray:
    """Run the kernel over packed uint8 columns + backtrack to rows."""
    if tie_parity not in ("exact", "fast"):
        raise ValueError(f"unknown tie_parity: {tie_parity}")
    exact = tie_parity == "exact"
    n_super, _, nb, lanes = m_packed.shape
    p = 1
    while p < h:
        p *= 2
    groups = lanes // p
    n_pad = n_super * groups * nb
    m_packed = m_packed.astype(jnp.int32)

    kernel, offsets = _build_kernel(w, h, max_grad, p, groups, exact=exact)
    cw = next(c for c in (32, 16, 8, 4, 2, 1) if w % c == 0)
    # Exact: (choices, d_final, rank_final) + 7 scratch. Fast: (choices,
    # d_final, pri_final, c1_final, c2_final) + 6 scratch (no ranks).
    n_fin = 2 if exact else 4
    n_scratch = 7 if exact else 6

    def run_super(m_cols):
        return pl.pallas_call(
            kernel,
            grid=(w // cw,),
            in_specs=[
                pl.BlockSpec(
                    (cw, nb, lanes), lambda j: (j, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=[
                pl.BlockSpec(
                    (cw, nb, lanes), lambda j: (j, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            + [
                pl.BlockSpec(
                    (nb, lanes), lambda j: (0, 0), memory_space=pltpu.VMEM
                )
                for _ in range(n_fin)
            ],
            out_shape=[
                jax.ShapeDtypeStruct((w, nb, lanes), jnp.int32),
            ]
            + [
                jax.ShapeDtypeStruct((nb, lanes), jnp.int32)
                for _ in range(n_fin)
            ],
            scratch_shapes=[
                pltpu.VMEM((nb, lanes), jnp.int32) for _ in range(n_scratch)
            ],
            interpret=interpret,
        )(m_cols)

    if n_super == 1:
        outs = run_super(m_packed[0])
        outs = tuple(x[None] for x in outs)
    else:
        outs = jax.lax.map(run_super, m_packed)
    choices_p, fins_p = outs[0], outs[1:]

    def unpack(x_packed, has_w):
        # (n_super, [W,] nb, groups*P) -> (n, [W,] H)
        if has_w:
            x = x_packed.reshape(n_super, w, nb, groups, p)
            x = jnp.transpose(x, (0, 3, 2, 1, 4))  # (ns, groups, nb, W, P)
            return x.reshape(n_pad, w, p)[:n, :, :h]
        x = x_packed.reshape(n_super, nb, groups, p)
        x = jnp.transpose(x, (0, 2, 1, 3))
        return x.reshape(n_pad, p)[:n, :h]

    choices = jnp.moveaxis(unpack(choices_p, True), 1, 0)  # (W, n, H)
    fins = [unpack(f, False) for f in fins_p]
    d_final = fins[0]

    # Exit row: earliest-settled last-column node among exit-distance
    # ties — exact ranks when carried, else the fast mode's
    # (distance, priority, chains) refinement with top-row fallback
    # (matching minpath._delineate_xla's exit keys).
    exit_dist = d_final + 255 - m_last
    tied = exit_dist == jnp.min(exit_dist, axis=-1, keepdims=True)
    if exact:
        rank_final = fins[1]
        r_last = jnp.argmin(
            jnp.where(tied, rank_final, _BIG), axis=-1
        ).astype(jnp.int32)
    else:
        for key in fins:  # (d_final, pri_final, c1_final, c2_final)
            masked = jnp.where(tied, key, _BIG)
            tied = tied & (masked == jnp.min(masked, axis=-1, keepdims=True))
        r_last = jnp.argmax(tied, axis=-1).astype(jnp.int32)

    # Backtrack (cheap XLA scan over the stored choices).
    offsets_arr = jnp.asarray(np.array(offsets, dtype=np.int32))
    batch_idx = jnp.arange(n, dtype=jnp.int32)

    def back(r, choice_col):
        c = choice_col[batch_idx, r]
        return r + offsets_arr[c], r

    r0, rows_rev = jax.lax.scan(back, r_last, choices[1:], reverse=True)
    rows = jnp.concatenate([r0[None, :], rows_rev], axis=0)
    return jnp.moveaxis(rows, 0, 1).reshape(lead + (w,))
