"""Space-to-depth transformed U-Net inference path (TPU layout optimization).

Motivation: the reference U-Net's top levels run stride-1 convs on
512x1024 images with 1-64 channels (`models/unet.py:113-147` in the
reference). On TPU the channel axis maps to the 128-wide vector lane /
MXU dimension, so a 32-channel conv uses a quarter of the matrix unit;
measured per-layer rates on v5e are 1-25 TF/s for the full-resolution
layers vs 100-270 TF/s for the deep ones.

Transform: keep each of the top ``s2d_levels`` U-Net levels in a
space-to-depth(2) representation — ``(B, H/2, W/2, 4C)`` with channel
layout ``(q_h, q_w, c)`` where ``q`` are the 2x2 pixel phases. Every
stride-1 conv with taps in [-1, 1] per axis becomes a *dense 2x2 conv
in block space* by alternating the block alignment of the activations:

- "unshifted" alignment U: block ``i`` holds original rows
  ``{2i, 2i+1}`` (the natural s2d layout);
- "shifted" alignment S: block ``i`` holds rows ``{2i-1, 2i}``
  (H/2 + 1 blocks, covering the SAME-padding rows -1 and H).

A 3x3 conv maps U -> S and S -> U with a 2x2 block kernel (window of
two consecutive blocks per axis); a TF-SAME 2x2 conv maps U -> U; a 1x1
conv is a block-diagonal U -> U kernel. Each transformed kernel is 9/16
dense (1.78x FLOPs) for 3x3, but runs with 4x the lane utilization and
no extra memory passes. With ``conv_layers`` even (the reference
default is 2, `models/unet.py:68`), every encoder/decoder conv pair is
U -> S -> U, so max-pool reduces to a free max over phase channels and
the decoder's nearest-neighbour upsample to a free phase broadcast.

This is an inference-only weight transformation (like
:func:`..models.unet.fold_batchnorm_variables`): training always uses
the parity ``UNetModule``. Numerics match the parity module up to f32
summation order.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "build_s2d_apply",
    "maybe_build_s2d_apply",
    "s2d_eligible_levels",
]


def maybe_build_s2d_apply(
    module,
    variables: dict,
    model_config: dict,
    output: str = "probs",
    dtype=jnp.float32,
):
    """Build the transformed inference fn when the model qualifies.

    Single decision point for every inference surface (staged pipeline,
    fused pipeline, streaming): the model must be a ``UNetModule`` with
    batch stats (BN folding) and an eligible config. ``output`` and
    ``dtype`` are forwarded to :func:`build_s2d_apply`.

    Returns ``(apply_fn | None, spatial_divisor)`` — inputs whose H/W are
    not multiples of the divisor must use the parity module instead.
    """
    from ..models.unet import UNetModule

    if model_config is None or not isinstance(module, UNetModule):
        return None, 1
    if "batch_stats" not in variables:
        return None, 1
    levels = s2d_eligible_levels(
        model_config.get("start_neurons", 8),
        model_config.get("pool_layers", 4),
        model_config.get("conv_layers", 2),
        model_config.get("enc_kernel", (3, 3)),
        model_config.get("dec_kernel", (2, 2)),
    )
    if levels == 0:
        return None, 1
    apply_fn = build_s2d_apply(
        dict(variables),
        model_config,
        s2d_levels=levels,
        output=output,
        dtype=dtype,
    )
    return apply_fn, 2**levels


# ---------------------------------------------------------------------------
# Kernel transformation
# ---------------------------------------------------------------------------


def _tap_range(k: int) -> tuple[int, int]:
    """Input-row offsets of a stride-1 TF-SAME conv with kernel size k."""
    lo = -((k - 1) // 2)
    return lo, lo + k - 1


def _axis_spec(k: int, a_in: int, a_out: int):
    """Block-space geometry for one spatial axis.

    ``a_in``/``a_out``: 0 = unshifted (block i phase q -> row 2i+q),
    1 = shifted (row 2i+q-1). Returns (e_min, e_max) — the window of
    input blocks ``i+e`` feeding output block ``i``.
    """
    t_lo, t_hi = _tap_range(k)
    s = a_out - a_in
    # dh = 2e + q - d + s  with q, d in {0,1}; dh must lie in [t_lo, t_hi]
    e_min = -(-(t_lo - 1 - s) // 2)  # ceil((t_lo - 1 - s) / 2)
    e_max = (t_hi + 1 - s) // 2
    return e_min, e_max


def _transform_maps(kh: int, kw: int, a_in: int, a_out: int):
    """Static geometry of a kernel transform: gather indices + validity.

    Returns ``(KI, KJ, mask, e_h_range, e_w_range)`` with KI/KJ/mask of
    shape (Eh, Ew, 2, 2, 2, 2) — axes (e_h, e_w, q_h, q_w, d_h, d_w) —
    such that ``W2[e,(q,c),(d,n)] = w[KI, KJ][c, n] * mask``.
    """
    ehmin, ehmax = _axis_spec(kh, a_in, a_out)
    ewmin, ewmax = _axis_spec(kw, a_in, a_out)
    Eh, Ew = ehmax - ehmin + 1, ewmax - ewmin + 1
    lo_h, _ = _tap_range(kh)
    lo_w, _ = _tap_range(kw)
    s = a_out - a_in
    KI = np.zeros((Eh, Ew, 2, 2, 2, 2), np.int64)
    KJ = np.zeros((Eh, Ew, 2, 2, 2, 2), np.int64)
    mask = np.zeros((Eh, Ew, 2, 2, 2, 2), bool)
    for ei, e_h in enumerate(range(ehmin, ehmax + 1)):
        for ej, e_w in enumerate(range(ewmin, ewmax + 1)):
            for q_h in range(2):
                for q_w in range(2):
                    for d_h in range(2):
                        for d_w in range(2):
                            ki = 2 * e_h + q_h - d_h + s - lo_h
                            kj = 2 * e_w + q_w - d_w + s - lo_w
                            if 0 <= ki < kh and 0 <= kj < kw:
                                KI[ei, ej, q_h, q_w, d_h, d_w] = ki
                                KJ[ei, ej, q_h, q_w, d_h, d_w] = kj
                                mask[ei, ej, q_h, q_w, d_h, d_w] = True
    return KI, KJ, mask, (ehmin, ehmax), (ewmin, ewmax)


def transform_kernel(w: np.ndarray, a_in: int, a_out: int):
    """Transform a (kh, kw, C, N) stride-1 SAME conv kernel into block
    space: returns (W2, e_h_range, e_w_range) where W2 has shape
    (Eh, Ew, 4C, 4N), channel layout (q_h, q_w, c) / (d_h, d_w, n).
    """
    kh, kw, C, N = w.shape
    KI, KJ, mask, e_h, e_w = _transform_maps(kh, kw, a_in, a_out)
    # (Eh, Ew, qh, qw, dh, dw, C, N) -> (Eh, Ew, qh, qw, C, dh, dw, N)
    W2 = np.asarray(w)[KI, KJ] * mask[..., None, None]
    W2 = np.transpose(W2, (0, 1, 2, 3, 6, 4, 5, 7))
    Eh, Ew = KI.shape[:2]
    return W2.reshape(Eh, Ew, 4 * C, 4 * N), e_h, e_w


def transform_kernel_jnp(w: jnp.ndarray, maps) -> jnp.ndarray:
    """Differentiable (jnp) version of :func:`transform_kernel` from
    precomputed :func:`_transform_maps` — linear in ``w``, so gradients
    flow back to the parity kernel under autodiff."""
    KI, KJ, mask, _, _ = maps
    C, N = w.shape[2], w.shape[3]
    W2 = w[KI, KJ] * jnp.asarray(mask, w.dtype)[..., None, None]
    W2 = jnp.transpose(W2, (0, 1, 2, 3, 6, 4, 5, 7))
    Eh, Ew = KI.shape[:2]
    return W2.reshape(Eh, Ew, 4 * C, 4 * N)


def _block_pad(n_in: int, n_out: int, e_rng: tuple[int, int]):
    """lax.conv padding for one block axis: output block i reads input
    blocks i+e, e in e_rng; representation sizes n_in -> n_out."""
    e_min, e_max = e_rng
    pad_lo = max(0, -e_min)
    E = e_max - e_min + 1
    pad_hi = n_out - n_in - pad_lo + E - 1
    assert pad_hi >= 0, (n_in, n_out, e_rng)
    return (pad_lo, pad_hi)


# ---------------------------------------------------------------------------
# s2d-domain ops
# ---------------------------------------------------------------------------


def s2d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> unshifted (B, H/2, W/2, 4C), layout (q_h, q_w, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def d2s(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`s2d` (input must be unshifted)."""
    B, Hb, Wb, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, Hb, Wb, 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, 2 * Hb, 2 * Wb, C)


def phase_max_pool(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max-pool of an unshifted s2d tensor = max over the
    phase channels; returns a scalar-form (B, Hb, Wb, C) tensor."""
    B, Hb, Wb, C4 = x.shape
    C = C4 // 4
    return x.reshape(B, Hb, Wb, 4, C).max(axis=3)


def phase_tile(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample expressed in s2d form: scalar
    (B, Hb, Wb, C) -> unshifted (B, Hb, Wb, 4C) with all 4 phases equal."""
    B, Hb, Wb, C = x.shape
    return jnp.tile(x[:, :, :, None, :], (1, 1, 1, 4, 1)).reshape(
        B, Hb, Wb, 4 * C
    )


def phase_concat(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Channel-concat of two unshifted s2d tensors, interleaved per phase
    so the result is the s2d form of concat([A, B], axis=-1).

    NB: the interleave costs an extra memory pass on TPU (~1.5 ms at the
    flagship shape); the forward builder instead uses a *plain* concat
    and bakes the interleave into the next conv's kernel with
    :func:`_split_concat_perm`."""
    B, Hb, Wb, Ca4 = a.shape
    Cb4 = b.shape[-1]
    a = a.reshape(B, Hb, Wb, 4, Ca4 // 4)
    b = b.reshape(B, Hb, Wb, 4, Cb4 // 4)
    return jnp.concatenate([a, b], axis=-1).reshape(
        B, Hb, Wb, Ca4 + Cb4
    )


def _split_concat_perm(ca: int, cb: int) -> np.ndarray:
    """Input-channel gather map for a transformed kernel whose input is
    ``concat([A_s2d, B_s2d])`` (two phase-major blocks of 4*ca and 4*cb
    channels) instead of the phase-interleaved s2d form of
    ``concat([A, B])`` the transform assumes.

    Returns ``perm`` with ``W2_split[..., p, :] = W2[..., perm[p], :]``:
    position ``p`` of the split layout holds interleaved channel
    ``q * (ca + cb) + c`` for A's ``(q, c)`` and ``+ ca + c`` for B's.
    """
    c = ca + cb
    perm = np.empty(4 * c, np.int64)
    for q in range(4):
        perm[q * ca : (q + 1) * ca] = q * c + np.arange(ca)
        perm[4 * ca + q * cb : 4 * ca + (q + 1) * cb] = (
            q * c + ca + np.arange(cb)
        )
    return perm


def _mask_shifted(y: jnp.ndarray) -> jnp.ndarray:
    """Zero the rows/cols of a shifted tensor that correspond to original
    row -1 / row H (and same for columns) — i.e. re-establish the SAME
    padding zeros consumed by the next conv."""
    B, Nh, Nw, C4 = y.shape
    C = C4 // 4
    ih = jnp.arange(Nh)
    iw = jnp.arange(Nw)
    # phase 0 of block 0 is row -1; phase 1 of block Nh-1 is row H
    row_ok = jnp.stack([ih != 0, ih != Nh - 1], axis=-1)  # (Nh, 2)
    col_ok = jnp.stack([iw != 0, iw != Nw - 1], axis=-1)  # (Nw, 2)
    m = (
        row_ok[:, None, :, None, None]
        & col_ok[None, :, None, :, None]
    )  # (Nh, Nw, 2, 2, 1)
    y = y.reshape(B, Nh, Nw, 2, 2, C)
    y = jnp.where(m[None], y, jnp.zeros((), y.dtype))
    return y.reshape(B, Nh, Nw, C4)


def _conv_block_space(x, W2, bias4, e_h, e_w, n_out_h, n_out_w, dtype):
    """Run one transformed conv in block space + bias."""
    B, nh, nw, _ = x.shape
    pad = (_block_pad(nh, n_out_h, e_h), _block_pad(nw, n_out_w, e_w))
    y = jax.lax.conv_general_dilated(
        x.astype(dtype),
        W2.astype(dtype),
        (1, 1),
        pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias4.astype(dtype)


# ---------------------------------------------------------------------------
# Forward builder
# ---------------------------------------------------------------------------


def s2d_eligible_levels(
    start_neurons: int,
    pool_layers: int,
    conv_layers: int,
    enc_kernel: Sequence[int],
    dec_kernel: Sequence[int],
) -> int:
    """How many top levels the transform applies to.

    Requirements: an even number of encoder convs per level (so each
    level ends back in unshifted alignment before pooling) and all conv
    taps within [-1, 1] per axis (kernel dims <= 3). A level is worth
    transforming while its channel count is below the 128-lane width.
    """
    if conv_layers < 1 or conv_layers % 2 != 0:
        # conv_layers=0 has no post-concat conv to bake the decoder's
        # _split_concat_perm into — the transformed forward would feed
        # the split-phase concat straight to d2s()/the head and scramble
        # channels silently (r5 review finding). Parity path instead.
        return 0
    if max(tuple(enc_kernel) + tuple(dec_kernel)) > 3:
        return 0
    n = 0
    while n < pool_layers and start_neurons * (2**n) * 4 <= 256:
        n += 1
    return n


def build_s2d_apply(
    variables: dict,
    model_config: dict,
    *,
    dtype=jnp.float32,
    s2d_levels: Optional[int] = None,
    output: str = "probs",
    fuse_enc_pairs: bool | str = "auto",
    _fused_interpret: bool = False,
):  # noqa: D417 — params documented below
    """Build the transformed inference function.

    Args:
      variables: parity ``UNetModule`` variables; if ``batch_stats`` is
        present the BatchNorm affines are folded first
        (:func:`..models.unet.fold_batchnorm_variables`).
      model_config: the U-Net container config
        (num_classes/start_neurons/pool_layers/conv_layers/kernels).
      dtype: compute dtype for the conv stack (head stays float32).
      s2d_levels: top levels to transform; default auto
        (:func:`s2d_eligible_levels`). 0 falls back to plain block-space
        -free convs (still BN-folded).
      fuse_enc_pairs: run eligible s2d encoder levels' conv pair + pool
        as one Pallas kernel (:mod:`.s2d_pallas`), keeping the shifted
        intermediate in VMEM instead of round-tripping HBM. "auto" is
        currently OFF everywhere: measured on v5e at the flagship shape,
        the kernel beats the XLA pair in isolation (2.61 vs 2.90 ms for
        level 1) but the custom-call boundary costs ~2.4 ms in fusion/
        layout breaks inside the full forward (8.3 -> 10.7 ms for the
        enc L0+L1 prefix), a net loss — see PLAN.md. Pass True to force
        (e.g. to re-measure on other hardware).
      output: "probs" — (B, H, W, num_classes) float32 softmax
        probabilities, matching ``UNetModule.apply(..., training=False)``;
        "labels" — (B, H, W) uint8 argmax class labels, with softmax AND
        argmax computed per-phase in the s2d domain so the only
        depth-to-space pass is on 1-byte labels instead of float32
        probabilities (the f32 d2s + relayout around softmax/argmax cost
        ~5 ms/batch-8 at 512x1024 on v5e; this path removes them while
        producing bit-identical labels, since d2s is a pure permutation
        and softmax/argmax act per class group either way).

    Returns ``apply_fn(x)``: preprocessed (B, H, W, Cin) float images ->
    probs or labels per ``output``.
    """
    if output not in ("probs", "labels", "labels_s2d"):
        raise ValueError(f"unknown output mode: {output}")
    from ..models.unet import fold_batchnorm_variables

    if "batch_stats" in variables:
        variables = fold_batchnorm_variables(variables)
    params = variables["params"]

    num_classes = model_config["num_classes"]
    start_neurons = model_config.get("start_neurons", 8)
    pool_layers = model_config.get("pool_layers", 4)
    conv_layers = model_config.get("conv_layers", 2)
    enc_kernel = tuple(model_config.get("enc_kernel", (3, 3)))
    dec_kernel = tuple(model_config.get("dec_kernel", (2, 2)))

    if s2d_levels is None:
        s2d_levels = s2d_eligible_levels(
            start_neurons, pool_layers, conv_layers, enc_kernel, dec_kernel
        )
    if output == "labels_s2d" and s2d_levels == 0:
        raise ValueError("labels_s2d output requires s2d_levels > 0")

    # --- collect folded conv weights in module creation order ---------
    n_blocks = (
        pool_layers * conv_layers
        + conv_layers
        + pool_layers * (1 + conv_layers)
    )
    convs = []
    for i in range(n_blocks):
        c = params[f"ConvBlock_{i}"]["Conv_0"]
        convs.append((np.asarray(c["kernel"]), np.asarray(c["bias"])))
    head_k = np.asarray(params["Conv_0"]["kernel"])
    head_b = np.asarray(params["Conv_0"]["bias"])

    # --- pre-transform kernels for the s2d levels ----------------------
    # Each entry: ("s2d", W2, bias4, e_h, e_w, a_in, a_out) or
    # ("plain", w, b).
    def t(w, b, a_in, a_out, in_perm=None):
        W2, e_h, e_w = transform_kernel(w, a_in, a_out)
        if in_perm is not None:
            W2 = W2[:, :, in_perm, :]
        return (
            jnp.asarray(W2, dtype),
            jnp.asarray(np.tile(b, 4), dtype),
            e_h,
            e_w,
            a_in,
            a_out,
        )

    enc_plan = []  # per level: list of conv plans
    idx = 0
    for L in range(pool_layers):
        level = []
        for j in range(conv_layers):
            w, b = convs[idx]
            idx += 1
            if L < s2d_levels:
                a_in, a_out = (0, 1) if j % 2 == 0 else (1, 0)
                level.append(("s2d", *t(w, b, a_in, a_out)))
            else:
                level.append(("plain", jnp.asarray(w, dtype), jnp.asarray(b, dtype)))
        enc_plan.append(level)

    bot_plan = []
    for j in range(conv_layers):
        w, b = convs[idx]
        idx += 1
        bot_plan.append(("plain", jnp.asarray(w, dtype), jnp.asarray(b, dtype)))

    dec_plan = []  # iterated as L = pool_layers-1 .. 0
    for L in reversed(range(pool_layers)):
        level = []
        w, b = convs[idx]
        idx += 1
        if L < s2d_levels:
            # Dec conv (U -> U) consumes the phase-tiled upsample, whose 4
            # phases are all equal — so sum the kernel over the input
            # phase axis and feed the *scalar-form* x directly, skipping
            # the tile's full-res materialisation.
            W2, e_h, e_w = transform_kernel(w, 0, 0)
            cin = w.shape[2]
            W2 = W2.reshape(
                W2.shape[0], W2.shape[1], 4, cin, W2.shape[3]
            ).sum(axis=2)
            level.append(
                (
                    "s2d",
                    jnp.asarray(W2, dtype),
                    jnp.asarray(np.tile(b, 4), dtype),
                    e_h,
                    e_w,
                    0,
                    0,
                )
            )
        else:
            level.append(("plain", jnp.asarray(w, dtype), jnp.asarray(b, dtype)))
        for j in range(conv_layers):
            w, b = convs[idx]
            idx += 1
            if L < s2d_levels:
                a_in, a_out = (0, 1) if j % 2 == 0 else (1, 0)
                # The first conv consumes the *plain* concat of two
                # phase-major blocks (x, skip); bake the interleave into
                # the kernel instead of shuffling the activations.
                perm = None
                if j == 0:
                    feats = w.shape[3]
                    perm = _split_concat_perm(feats, w.shape[2] - feats)
                level.append(("s2d", *t(w, b, a_in, a_out, in_perm=perm)))
            else:
                level.append(("plain", jnp.asarray(w, dtype), jnp.asarray(b, dtype)))
        level_idx = L
        dec_plan.append((level_idx, level))

    if s2d_levels > 0:
        # head as a block-diagonal 1x1 U -> U kernel
        C, K = head_k.shape[2], head_k.shape[3]
        hk = np.zeros((1, 1, 4 * C, 4 * K), np.float64)
        for q in range(4):
            hk[0, 0, q * C : (q + 1) * C, q * K : (q + 1) * K] = head_k[0, 0]
        head_s2d = (jnp.asarray(hk, jnp.float32), jnp.asarray(np.tile(head_b, 4), jnp.float32))
    head_plain = (jnp.asarray(head_k, jnp.float32), jnp.asarray(head_b, jnp.float32))

    def run_plain(x, w, b):
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.maximum(y + b, 0)

    def run_s2d(x, W2, b4, e_h, e_w, a_in, a_out):
        B, nh, nw, _ = x.shape
        n_out_h = nh + (a_out - a_in)
        n_out_w = nw + (a_out - a_in)
        y = _conv_block_space(x, W2, b4, e_h, e_w, n_out_h, n_out_w, dtype)
        y = jnp.maximum(y, 0)
        if a_out == 1:
            y = _mask_shifted(y)
        return y

    def run_conv(x, plan):
        if plan[0] == "plain":
            return run_plain(x, plan[1], plan[2])
        return run_s2d(x, *plan[1:])

    if fuse_enc_pairs == "auto":
        # Measured net-negative in composition (docstring above).
        fuse_enc_pairs = False

    def _try_fused_enc(x, level):
        """Fused Pallas enc pair when eligible; returns (skip, pooled)
        or None to fall back to the unfused ops."""
        if not fuse_enc_pairs or len(level) != 2:
            return None
        if jnp.dtype(dtype) != jnp.float32:
            return None  # the kernel accumulates in f32 only
        if any(p[0] != "s2d" for p in level):
            return None
        # conv pair must be the standard U->S->U alignment walk
        if (level[0][5], level[0][6]) != (0, 1):
            return None
        if (level[1][5], level[1][6]) != (1, 0):
            return None
        from .s2d_pallas import enc_pair_supported, fused_enc_pair

        if not enc_pair_supported(
            x.shape[1], x.shape[2], x.shape[3], level[0][1].shape[-1]
        ):
            return None
        return fused_enc_pair(
            x,
            level[0][1],
            level[0][2],
            level[1][1],
            level[1][2],
            interpret=_fused_interpret,
        )

    def apply_fn(x):
        x = x.astype(dtype)
        skips = []
        for L in range(pool_layers):
            if L < s2d_levels:
                assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, (
                    "s2d inference path needs even spatial dims; pass "
                    "s2d_levels=0 for odd sizes"
                )
                x = s2d(x)
                fused = _try_fused_enc(x, enc_plan[L])
                if fused is not None:
                    skip, x = fused
                    skips.append(skip)
                    continue
                for plan in enc_plan[L]:
                    x = run_conv(x, plan)
                skips.append(x)  # s2d unshifted form
                x = phase_max_pool(x)  # scalar form, next level
            else:
                for plan in enc_plan[L]:
                    x = run_conv(x, plan)
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))

        for plan in bot_plan:
            x = run_conv(x, plan)
        # Dropout is identity at inference (parity: UNetModule line 98).

        x_form = "scalar"
        for level_idx, level in dec_plan:
            if level_idx < s2d_levels:
                if x_form == "s2d":
                    x = d2s(x)
                # upsample = phase tile, pre-summed into the dec kernel:
                # feed scalar-form x directly
                x = run_conv(x, level[0])
                # plain concat: interleave is baked into the next kernel
                x = jnp.concatenate([x, skips[level_idx]], axis=-1)
                for plan in level[1:]:
                    x = run_conv(x, plan)
                x_form = "s2d"
            else:
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = run_conv(x, level[0])
                x = jnp.concatenate([x, skips[level_idx]], axis=-1)
                for plan in level[1:]:
                    x = run_conv(x, plan)
                x_form = "scalar"

        x = x.astype(jnp.float32)
        if x_form == "s2d":
            w, b = head_s2d
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            # Per-phase class groups: (B, Hb, Wb, 4, K). softmax/argmax
            # commute with the d2s permutation, so computing them here is
            # bit-identical to computing them after d2s.
            B, nh, nw, C4 = y.shape
            k = C4 // 4
            yg = y.reshape(B, nh, nw, 4, k)
            if output in ("labels", "labels_s2d"):
                lab = jnp.argmax(
                    jax.nn.softmax(yg, axis=-1), axis=-1
                ).astype(jnp.uint8)
                # "labels_s2d" keeps the (B, Hb, Wb, 4) s2d layout so
                # downstream ops (boundary_maps_from_s2d_labels) stay in
                # the conv-native layout; "labels" depth-to-spaces.
                if output == "labels_s2d":
                    return lab
                return d2s(lab)[..., 0]
            y = jax.nn.softmax(yg, axis=-1).reshape(B, nh, nw, C4)
            return d2s(y)
        w, b = head_plain
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        probs = jax.nn.softmax(y, axis=-1)
        if output == "labels":
            return jnp.argmax(probs, axis=-1).astype(jnp.uint8)
        return probs

    return apply_fn
