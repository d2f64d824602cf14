"""Pallas fused encoder-pair kernel for the s2d U-Net levels.

One s2d encoder level (reference `models/unet.py:32-38`: two 3x3
conv+BN+ReLU blocks then a 2x2 max-pool) in block space is

    x (B, nh, nw, 4Cin)  --conv U->S-->  y1 (B, nh+1, nw+1, 4C)
                         --conv S->U-->  y2 (B, nh, nw, 4C)   [skip out]
                         --phase max --> pooled (B, nh, nw, C) [next level]

(:mod:`.s2d_unet` for the block-space transform). Run as three XLA ops,
the shifted intermediate ``y1`` makes a full round trip through HBM —
540 MB written + read per top level at the flagship shape — and the pool
re-reads ``y2``. This kernel computes the whole pair in one
``pallas_call``: a grid over (batch, row-strips) keeps ``y1`` strips in
VMEM scratch, both transformed kernels stay VMEM-resident across strips,
and only the two real outputs (``y2`` skip + pooled) ever touch HBM.

Per strip (TR block rows): conv1 needs TR+2 input rows (its block window
is e in {-1, 0}), producing TR+1 shifted rows; conv2's window e in
{0, 1} consumes them back down to TR rows. The two-row halo comes from a
second, shifted BlockSpec view of the same input (strip s and strip
s+1), so Pallas pipelines all input blocks itself. Both convs run as
unrolled per-row MXU matmuls ``(nw+1, 4Cin) @ (4Cin, 4C)`` — the 2x2
block structure contributes 4 accumulating matmuls per output row. The
shifted-edge zeroing of :func:`.s2d_unet._mask_shifted` (original rows
-1/H and cols -1/W) is applied with precomputed column/row channel
masks, so conv2 sees exactly the activations the unfused path computes;
outputs are bit-identical to ``run_s2d(conv1) -> run_s2d(conv2) ->
phase_max_pool`` up to f32 accumulation order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_enc_pair", "enc_pair_supported"]


def _pick_tr(nh: int) -> int:
    for tr in (8, 4, 2):
        if nh % tr == 0:
            return tr
    return 0


def enc_pair_supported(nh: int, nw: int, cin4: int, c4: int) -> bool:
    """Whether the fused kernel handles this geometry.

    Mosaic requires the minor (channel) dim of blocked operands to be
    128-lane aligned; an unaligned channel count would make XLA
    materialize a lane-padded copy of the whole input (measured: the
    4-channel level-0 input becomes a 548 MB padded array). Levels with
    fewer than 128 input channels stay on the unfused XLA path.
    """
    return _pick_tr(nh) > 0 and cin4 % 128 == 0 and c4 % 128 == 0


def _build_kernel(tr: int, nh: int, nw: int, cin4: int, c4: int):
    """Kernel body for one (batch, strip) grid step."""
    c = c4 // 4
    n_strips = nh // tr

    def kernel(
        x_cur,  # (1, tr, nw+2, cin4) padded rows [s*tr, s*tr+tr)
        x_nxt,  # (1, tr, nw+2, cin4) padded rows [(s+1)*tr, ...)
        w1_ref,  # (2, 2, cin4, c4)
        b1_ref,  # (1, c4)
        w2_ref,  # (2, 2, c4, c4)
        b2_ref,  # (1, c4)
        colmask_ref,  # (nw+1, c4) shifted-column channel mask
        rowmask_ref,  # (2, c4) [top (q_h=0 zeroed), bottom (q_h=1 zeroed)]
        y2_ref,  # out block (1, tr, nw, c4)
        pool_ref,  # out block (1, tr, nw, c)
        y1_buf,  # scratch (tr+1, nw+1, c4)
    ):
        s = pl.program_id(1)

        def xrow(k):
            # padded input row s*tr + k, k in [0, tr+2)
            if k < tr:
                return x_cur[0, k]
            return x_nxt[0, k - tr]

        b1 = b1_ref[0]
        # conv1 (U -> S): shifted row r reads input rows r, r+1 of the
        # padded strip; + ReLU + shifted-edge masking.
        for r in range(tr + 1):
            acc = jnp.zeros((nw + 1, c4), jnp.float32) + b1
            for a in (0, 1):
                row = xrow(r + a)
                for bb in (0, 1):
                    acc += jnp.dot(
                        row[bb : bb + nw + 1],
                        w1_ref[a, bb],
                        preferred_element_type=jnp.float32,
                    )
            y1_buf[r] = jnp.maximum(acc, 0.0) * colmask_ref[:]

        # Shifted-row masking only touches the global first/last rows.
        @pl.when(s == 0)
        def _():
            y1_buf[0] = y1_buf[0] * rowmask_ref[0]

        @pl.when(s == n_strips - 1)
        def _():
            y1_buf[tr] = y1_buf[tr] * rowmask_ref[1]

        b2 = b2_ref[0]
        # conv2 (S -> U): output row r reads shifted rows r, r+1.
        for r in range(tr):
            acc = jnp.zeros((nw, c4), jnp.float32) + b2
            for a in (0, 1):
                row = y1_buf[r + a]
                for bb in (0, 1):
                    acc += jnp.dot(
                        row[bb : bb + nw],
                        w2_ref[a, bb],
                        preferred_element_type=jnp.float32,
                    )
            y2 = jnp.maximum(acc, 0.0)
            y2_ref[0, r] = y2
            # 2x2 max-pool = max over the 4 phase channel groups
            # (layout (q_h, q_w, c), see s2d_unet.phase_max_pool).
            pool_ref[0, r] = jnp.maximum(
                jnp.maximum(y2[:, 0:c], y2[:, c : 2 * c]),
                jnp.maximum(y2[:, 2 * c : 3 * c], y2[:, 3 * c : 4 * c]),
            )

    return kernel


def _masks(nw: int, c4: int):
    c = c4 // 4
    colmask = np.ones((nw + 1, c4), np.float32)
    # shifted col 0 phase q_w=0 is original col -1; col nw q_w=1 is col W
    for g in (0, 2):  # q_w = 0 groups
        colmask[0, g * c : (g + 1) * c] = 0.0
    for g in (1, 3):  # q_w = 1 groups
        colmask[nw, g * c : (g + 1) * c] = 0.0
    rowmask = np.ones((2, c4), np.float32)
    rowmask[0, 0 : 2 * c] = 0.0  # top: q_h = 0 is original row -1
    rowmask[1, 2 * c : 4 * c] = 0.0  # bottom: q_h = 1 is original row H
    return jnp.asarray(colmask), jnp.asarray(rowmask)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_enc_pair(x, w1, b1, w2, b2, interpret: bool = False):
    """Fused s2d encoder pair.

    Args:
      x: (B, nh, nw, 4Cin) unshifted s2d activations, float32.
      w1: (2, 2, 4Cin, 4C) U->S transformed kernel (e in {-1,0} both
        axes, i.e. ``transform_kernel(w, 0, 1)``).
      b1: (4C,) phase-tiled bias.
      w2: (2, 2, 4C, 4C) S->U transformed kernel (e in {0,1}).
      b2: (4C,) phase-tiled bias.

    Returns ``(y2, pooled)``: the (B, nh, nw, 4C) skip tensor and the
    (B, nh, nw, C) phase-max-pooled next-level input.
    """
    B, nh, nw, cin4 = x.shape
    c4 = w1.shape[-1]
    c = c4 // 4
    tr = _pick_tr(nh)
    if tr == 0:
        raise ValueError(f"unsupported block rows {nh} (need divisor in 8/4/2)")

    # Rows padded for the conv halo (1 + 1) and then up to a multiple of
    # tr so the shifted next-strip BlockSpec view stays in bounds.
    rt = -(-(nh + 2) // tr) * tr
    x_pad = jnp.pad(
        x.astype(jnp.float32),
        ((0, 0), (1, rt - nh - 1), (1, 1), (0, 0)),
    )
    n_row_blocks = rt // tr
    colmask, rowmask = _masks(nw, c4)

    kernel = _build_kernel(tr, nh, nw, cin4, c4)
    grid = (B, nh // tr)
    strip_spec = lambda off: pl.BlockSpec(  # noqa: E731
        (1, tr, nw + 2, cin4),
        lambda b, s, off=off: (b, jnp.minimum(s + off, n_row_blocks - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    y2, pooled = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, nh, nw, c4), jnp.float32),
            jax.ShapeDtypeStruct((B, nh, nw, c), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            strip_spec(0),
            strip_spec(1),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, tr, nw, c4), lambda b, s: (b, s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tr, nw, c), lambda b, s: (b, s, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((tr + 1, nw + 1, c4), jnp.float32),
        ],
        interpret=interpret,
    )(
        x_pad,
        x_pad,
        w1.astype(jnp.float32),
        b1.reshape(1, c4).astype(jnp.float32),
        w2.astype(jnp.float32),
        b2.reshape(1, c4).astype(jnp.float32),
        colmask,
        rowmask,
    )
    return y2, pooled
