"""Pallas TPU kernel for the exact min-path DP.

The XLA ``lax.scan`` implementation in :mod:`.minpath` is correct but
latency-bound on TPU: the per-column settle-rank computation (gathers +
rank network) breaks XLA's loop-body fusion into dozens of kernel
launches (~1 ms/column). This kernel runs the whole forward DP as ONE
Pallas program: the grid iterates over map columns (Pallas pipelines the
column blocks HBM->VMEM automatically), all DP state lives in VMEM
scratch, and the settle-rank bitonic network is expressed with lane
shifts + selects only (no reshapes, no scatters), which Mosaic compiles
to straight VPU code.

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

_BIG = 2**30  # python int: pallas kernels cannot capture jnp constants


def _shift_up(x, k):
    """y[i] = x[i+k] (from below), +inf fill."""
    return jnp.concatenate(
        [x[..., k:], jnp.full(x.shape[:-1] + (k,), _BIG, x.dtype)], axis=-1
    )


def _shift_down(x, k):
    """y[i] = x[i-k] (from above), +inf fill."""
    return jnp.concatenate(
        [jnp.full(x.shape[:-1] + (k,), _BIG, x.dtype), x[..., :-k]], axis=-1
    )


def _butterfly_stages(h):
    """Bitonic network stage list [(block, stride)] for a power-of-two
    length ``h`` along the lane axis."""
    stages = []
    k = 2
    while k <= h:
        j = k // 2
        while j >= 1:
            stages.append((k, j))
            j //= 2
        k *= 2
    return stages


def _bitonic_pass(stages, arrays, less_than):
    """Run the butterfly network over ``arrays`` (tuple of (N, H) values),
    ordering by the caller-supplied lexicographic ``less_than(own, partner)``
    over the same tuple. Returns sorted arrays (ascending). Direction and
    pair-side masks are derived from iota in-kernel (Pallas kernels cannot
    capture array constants)."""
    n, hp = arrays[0].shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, hp), 1)
    for k, j in stages:
        asc = (lane & k) == 0
        lower = (lane & j) == 0  # element is the 'a' side of its pair
        partners = tuple(
            jnp.where(lower, _shift_up(x, j), _shift_down(x, j)) for x in arrays
        )
        own_lt = less_than(arrays, partners)
        keep = own_lt == (lower == asc)
        arrays = tuple(
            jnp.where(keep, x, p) for x, p in zip(arrays, partners)
        )
    return arrays


def _lt2(own, partner):
    """Lexicographic (d, sub) strict less-than."""
    d, s = own[0], own[1]
    pd, ps = partner[0], partner[1]
    return (d < pd) | ((d == pd) & (s < ps))


def _lt1(own, partner):
    return own[0] < partner[0]


def _settle_rank(stages, d_key, sub_key, iota_row):
    """Dense settle rank of unique lexicographic keys (d_key, sub_key).

    Two butterfly passes: sort (key -> permutation), then sort the
    permutation (-> inverse permutation = rank)."""
    _, _, perm = _bitonic_pass(
        stages, (d_key, sub_key, iota_row), lambda o, p: _lt2(o, p)
    )
    _, rank = _bitonic_pass(stages, (perm, iota_row), _lt1)
    return rank


def _build_kernel(n, w, h, max_grad, pad):
    stages = _butterfly_stages(pad)
    offsets = [0] + list(range(1, max_grad + 1)) + [
        -k for k in range(1, max_grad + 1)
    ]

    def make_pri():
        # Heap-entry priority per candidate (see minpath.py), from iota.
        # Materialised at full (C, N, H) shape: Mosaic mis-compiles the
        # implicit (C, 1, H) broadcast for multi-tile sublane extents.
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, h), 1)
        pri_list = [jnp.full((n, h), 1, jnp.int32)]
        for k in range(1, max_grad + 1):
            pri_list.append(jnp.full((n, h), 1 + k, jnp.int32))
        for k in range(1, max_grad + 1):
            pri_list.append(1 + jnp.minimum(max_grad, rows - k) + k)
        return jnp.stack(pri_list, axis=0)  # (C, N, H)

    def shifts(x):
        out = [x]
        for k in range(1, max_grad + 1):
            out.append(_shift_up(x, k))
        for k in range(1, max_grad + 1):
            out.append(_shift_down(x, k))
        return jnp.stack(out, axis=0)  # (C, N, H)

    def rank_of(d_key, sub_key):
        iota_row = jax.lax.broadcasted_iota(jnp.int32, (n, pad), 1)
        if pad != h:
            fill = jnp.full((n, pad - h), _BIG, jnp.int32)
            d_key = jnp.concatenate([d_key, fill], axis=-1)
            sub_key = jnp.concatenate([sub_key, fill], axis=-1)
        rank = _settle_rank(stages, d_key, sub_key, iota_row)
        return rank[:, :h]

    def kernel(
        m_ref,  # in: (CW, NB, H) int32 — a chunk of columns, one map block
        choice_ref,  # out: (CW, NB, H) int32
        dfin_ref,  # out: (NB, H) int32 (final column distance)
        rankfin_ref,  # out: (NB, H) int32 (final column settle rank)
        d_s,  # scratch (NB, H) int32: distances
        pri_s,  # scratch: pop priorities
        rank_s,  # scratch: settle ranks
        dpred_s,  # scratch: pred distances
        ppred_s,  # scratch: pred pop priorities
        mprev_s,  # scratch: previous column map values
    ):
        chunk = pl.program_id(1)
        cw = m_ref.shape[0]
        stacked_pri = make_pri()

        def column(ji, _):
            j = chunk * cw + ji
            m_cur = m_ref[ji]

            @pl.when(j == 0)
            def _init():
                d0 = 255 - m_cur
                d_s[:] = d0
                pri_s[:] = jnp.ones((n, h), jnp.int32)
                rank_s[:] = rank_of(
                    d0, jax.lax.broadcasted_iota(jnp.int32, (n, h), 1)
                )
                dpred_s[:] = jnp.zeros((n, h), jnp.int32)
                ppred_s[:] = jnp.zeros((n, h), jnp.int32)
                choice_ref[ji] = jnp.zeros((n, h), jnp.int32)

            @pl.when(j > 0)
            def _step():
                d = d_s[:]
                m_prev = mprev_s[:]
                pri_prev = pri_s[:]
                rank_prev = rank_s[:]
                d_pred = dpred_s[:]
                pri_pred = ppred_s[:]

                q = d - m_prev
                stacked = shifts(q)
                best = jnp.min(stacked, axis=0)
                tied = stacked == best[None]
                d_new = best + 510 - m_cur

                sh_d = shifts(d)
                sh_pp = shifts(pri_prev)
                stacked_rank = shifts(rank_prev)

                zero_edge = (shifts(m_prev) == 255) & (m_cur == 255)[None]
                strict = tied & ~zero_edge
                pri_strict = jnp.where(strict, stacked_pri, _BIG)
                best_strict_pri = jnp.min(pri_strict, axis=0)
                # Strict pop entry (s): min (pri, rank) among strict-tied.
                strict_rank_m = jnp.where(
                    pri_strict == best_strict_pri[None], stacked_rank, _BIG
                )
                s_min = jnp.min(strict_rank_m, axis=0)
                s_sel = strict_rank_m == s_min[None]
                d_sv = jnp.min(jnp.where(s_sel, sh_d, _BIG), axis=0)
                pri_pop_s = jnp.min(jnp.where(s_sel, sh_pp, _BIG), axis=0)

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
                            & (
                                (dpu < d_sv[None])
                                | ((dpu == d_sv[None]) & (ppu <= pri_pop_s[None]))
                            )
                        )
                    )
                )
                valid = strict | zero_valid
                # (logical blend, not jnp.where: Mosaic rejects selects on
                # boolean vectors)
                has_valid = jnp.any(valid, axis=0, keepdims=True)
                valid = (valid & has_valid) | (tied & ~has_valid)

                best_pri = jnp.min(jnp.where(valid, stacked_pri, _BIG), axis=0)
                pri_m = jnp.where(valid, stacked_pri, _BIG)
                valid = valid & (pri_m == best_pri[None])
                rank_m = jnp.where(valid, stacked_rank, _BIG)
                entry_ctr = jnp.min(rank_m, axis=0)
                chosen = rank_m == entry_ctr[None]

                def select(stacked_x):
                    return jnp.min(jnp.where(chosen, stacked_x, _BIG), axis=0)

                # Candidate index (in preference order) for the backtrack.
                cand_idx = jax.lax.broadcasted_iota(jnp.int32, stacked.shape, 0)
                choice = select(cand_idx)

                choice_ref[ji] = choice
                d_s[:] = d_new
                pri_s[:] = best_pri
                rank_s[:] = rank_of(d_new, best_pri * pad + entry_ctr)
                dpred_s[:] = select(sh_d)
                ppred_s[:] = select(sh_pp)

            mprev_s[:] = m_cur

            @pl.when(j == w - 1)
            def _finish():
                dfin_ref[:] = d_s[:]
                rankfin_ref[:] = rank_s[:]

            return 0

        jax.lax.fori_loop(0, cw, column, 0)

    return kernel, offsets


@functools.partial(jax.jit, static_argnames=("max_grad", "interpret"))
def delineate_pallas(
    maps_u8: jnp.ndarray, max_grad: int = 1, interpret: bool = False
) -> jnp.ndarray:
    """Exact min-path delineation via the Pallas kernel.

    Same contract as ``minpath.delineate(maps, max_grad, "exact")``:
    ``(..., W, H) uint8 -> (..., W) int32``.
    """
    lead = maps_u8.shape[:-2]
    w, h = maps_u8.shape[-2], maps_u8.shape[-1]
    m = maps_u8.reshape((-1, w, h)).astype(jnp.int32)
    n = m.shape[0]
    pad = 1
    while pad < h:
        pad *= 2

    # Mosaic rejects these op patterns with a sublane extent beyond one
    # native tile, so maps are processed in blocks of 8 via a second grid
    # dimension (the state scratch resets at each block's first column).
    nb = 8
    n_pad = ((n + nb - 1) // nb) * nb
    if n_pad != n:
        m = jnp.concatenate(
            [m, jnp.zeros((n_pad - n, w, h), jnp.int32)], axis=0
        )

    kernel, offsets = _build_kernel(nb, w, h, max_grad, pad)

    # Chunk columns so the sequential loop runs inside the kernel
    # (fori_loop over VMEM blocks) instead of paying per-grid-step launch
    # overhead for every column.
    cw = next(c for c in (128, 64, 32, 16, 8, 4, 2, 1) if w % c == 0)

    m_cols = jnp.moveaxis(m, 1, 0)  # (W, N_pad, H)

    choices, d_final, rank_final = pl.pallas_call(
        kernel,
        grid=(n_pad // nb, w // cw),
        in_specs=[
            pl.BlockSpec(
                (cw, nb, h), lambda b, j: (j, b, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=[
            pl.BlockSpec(
                (cw, nb, h), lambda b, j: (j, b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((nb, h), lambda b, j: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, h), lambda b, j: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((w, n_pad, h), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, h), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, h), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((nb, h), jnp.int32) for _ in range(6)],
        interpret=interpret,
    )(m_cols)
    choices = choices[:, :n]
    d_final = d_final[:n]
    rank_final = rank_final[:n]

    # Exit row: earliest-settled last-column node among exit-distance ties.
    m_last = m[:n, w - 1, :]
    exit_dist = d_final + 255 - m_last
    tied = exit_dist == jnp.min(exit_dist, axis=-1, keepdims=True)
    r_last = jnp.argmin(jnp.where(tied, rank_final, _BIG), axis=-1).astype(
        jnp.int32
    )

    # Backtrack (cheap XLA scan over the stored choices).
    offsets_arr = jnp.asarray(np.array(offsets, dtype=np.int32))
    batch_idx = jnp.arange(n, dtype=jnp.int32)

    def back(r, choice_col):
        c = choice_col[batch_idx, r]
        return r + offsets_arr[c], r

    r0, rows_rev = jax.lax.scan(back, r_last, choices[1:], reverse=True)
    rows = jnp.concatenate([r0[None, :], rows_rev], axis=0)
    return jnp.moveaxis(rows, 0, 1).reshape(lead + (w,))
