"""Space-to-depth U-Net forward for TRAINING.

:mod:`.s2d_unet` transforms the conv stack for inference (BN folded,
weights baked). This module applies the same layout transform inside the
train step, differentiably:

- transformed kernels are built from the parity parameters with
  :func:`.s2d_unet.transform_kernel_jnp` (linear in ``w`` -> autodiff
  routes conv gradients back to the parity kernel exactly);
- BatchNorm runs UN-folded in train mode with batch statistics computed
  over *real* pixels only — at shifted block alignments the boundary
  rows (original rows -1 / H, i.e. the SAME-padding ghosts) are zeroed
  before the reductions and excluded from the divisor, then re-zeroed
  after normalization+ReLU so the next conv still reads padding zeros;
- dropout reuses flax's own key derivation via a shim module whose
  scope path matches ``UNetModule``'s ``Dropout_0``, so the mask is
  bit-identical to the parity module for the same rng.

The exposed :class:`S2DTrainForward` has ``UNetModule``'s ``.apply``
contract (same parameter / batch_stats tree, ``training`` flag,
``rngs={"dropout"}``, ``mutable=["batch_stats"]``), so
:mod:`..parallel.train_step` can use either interchangeably.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .s2d_unet import (
    _block_pad,
    _mask_shifted,
    _split_concat_perm,
    _transform_maps,
    d2s,
    phase_max_pool,
    s2d,
    s2d_eligible_levels,
)

_BN_MOMENTUM = 0.99
_BN_EPS = 1e-3


class _DropoutShim(nn.Module):
    """Root-level ``Dropout_0`` — same scope path as ``UNetModule``'s
    bottleneck dropout, hence the same flax rng fold and the same mask."""

    @nn.compact
    def __call__(self, x, training: bool):
        return nn.Dropout(0.5, deterministic=not training)(x)


def maybe_build_s2d_train(
    module, model_config: dict, image_height: int, image_width: int
):
    """``S2DTrainForward`` for the train/eval steps when the model and
    geometry qualify, else ``None`` (use the parity module).

    Single decision point for the training driver: the model must be a
    ``UNetModule`` with an s2d-eligible config, and the (fixed) training
    image dims must stay even through every transformed level.
    """
    from ..models.unet import UNetModule

    if model_config is None or not isinstance(module, UNetModule):
        return None
    levels = s2d_eligible_levels(
        model_config.get("start_neurons", 8),
        model_config.get("pool_layers", 4),
        model_config.get("conv_layers", 2),
        tuple(model_config.get("enc_kernel", (3, 3))),
        tuple(model_config.get("dec_kernel", (2, 2))),
    )
    if levels == 0:
        return None
    div = 2**levels
    if image_height % div or image_width % div:
        return None
    return S2DTrainForward(
        model_config, dtype=getattr(module, "dtype", jnp.float32)
    )


def _batchnorm(t, bn_params, bn_stats, training, *, phases, real_count=None):
    """flax-BatchNorm-equivalent normalization.

    ``phases``: 4 for phase-major s2d tensors (stats reduce over the
    phase axis too, matching per-original-channel statistics), 1 for
    scalar tensors. ``real_count``: number of real elements per channel
    when the tensor contains zeroed ghost rows (shifted alignment);
    defaults to the full element count.
    """
    shape = t.shape
    c = shape[-1] // phases
    tr = t.reshape(shape[:-1] + (phases, c))
    axes = tuple(range(tr.ndim - 1))
    n = real_count
    if n is None:
        n = int(np.prod([tr.shape[a] for a in axes]))
    if training:
        # stats accumulate in (at least) float32 regardless of compute
        # dtype (flax BatchNorm promotes too; bf16 sums over millions of
        # pixels lose the statistics otherwise)
        t32 = tr.astype(jnp.promote_types(tr.dtype, jnp.float32))
        mean = t32.sum(axes) / n
        mean2 = (t32 * t32).sum(axes) / n
        var = mean2 - mean * mean
        new_stats = {
            "mean": _BN_MOMENTUM * bn_stats["mean"]
            + (1 - _BN_MOMENTUM) * mean,
            "var": _BN_MOMENTUM * bn_stats["var"] + (1 - _BN_MOMENTUM) * var,
        }
    else:
        mean, var = bn_stats["mean"], bn_stats["var"]
        new_stats = bn_stats
    scale = (
        bn_params["scale"].astype(jnp.float32)
        * jax.lax.rsqrt(var.astype(jnp.float32) + _BN_EPS)
    ).astype(t.dtype)
    offset = (
        bn_params["bias"].astype(jnp.float32)
        - mean.astype(jnp.float32) * scale.astype(jnp.float32)
    ).astype(t.dtype)
    y = tr * scale + offset
    return y.reshape(shape), new_stats


class S2DTrainForward:
    """Module-like s2d training forward for the reference U-Net config.

    Build with the container config; ``apply`` mirrors
    ``UNetModule.apply`` (same variables tree). Only configs with even
    ``conv_layers`` and kernel dims <= 3 qualify (``s2d_levels`` > 0);
    for others use the parity module.
    """

    def __init__(
        self,
        model_config: dict,
        dtype=jnp.float32,
        s2d_levels: Optional[int] = None,
    ):
        self.num_classes = model_config["num_classes"]
        self.start_neurons = model_config.get("start_neurons", 8)
        self.pool_layers = model_config.get("pool_layers", 4)
        self.conv_layers = model_config.get("conv_layers", 2)
        self.enc_kernel = tuple(model_config.get("enc_kernel", (3, 3)))
        self.dec_kernel = tuple(model_config.get("dec_kernel", (2, 2)))
        self.dtype = jnp.dtype(dtype)
        if s2d_levels is None:
            s2d_levels = s2d_eligible_levels(
                self.start_neurons,
                self.pool_layers,
                self.conv_layers,
                self.enc_kernel,
                self.dec_kernel,
            )
        self.s2d_levels = s2d_levels
        self._dropout = _DropoutShim()

        ek, dk = self.enc_kernel, self.dec_kernel
        self._maps = {
            "A": _transform_maps(ek[0], ek[1], 0, 1),
            "B": _transform_maps(ek[0], ek[1], 1, 0),
            "C": _transform_maps(dk[0], dk[1], 0, 0),
        }

    # -- one conv+BN+ReLU block ------------------------------------------

    def _block(self, x, layer, stats, training, kind, in_perm=None,
               presum=False):
        """kind: None (plain conv) or "A"/"B"/"C" (block-space)."""
        from .s2d_unet import transform_kernel_jnp

        w = layer["Conv_0"]["kernel"].astype(self.dtype)
        b = layer["Conv_0"]["bias"].astype(self.dtype)
        if kind is None:
            y = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            y, new_stats = _batchnorm(
                y, layer["BatchNorm_0"], stats["BatchNorm_0"], training,
                phases=1,
            )
            return jnp.maximum(y, 0), {"BatchNorm_0": new_stats}

        maps = self._maps[kind]
        W2 = transform_kernel_jnp(w, maps)
        if in_perm is not None:
            W2 = W2[:, :, in_perm, :]
        if presum:
            # upsample phase-tile pre-summed into the kernel: consume the
            # scalar-form tensor directly (all 4 input phases are equal)
            cin = w.shape[2]
            W2 = W2.reshape(
                W2.shape[0], W2.shape[1], 4, cin, W2.shape[3]
            ).sum(axis=2)
        a_in, a_out = {"A": (0, 1), "B": (1, 0), "C": (0, 0)}[kind]
        nh, nw = x.shape[1], x.shape[2]
        # presum is only used with kind "C" (a_in == a_out == 0), so the
        # general formula already covers it — no geometry special case
        n_out_h, n_out_w = nh + (a_out - a_in), nw + (a_out - a_in)
        pad = (
            _block_pad(nh, n_out_h, maps[3]),
            _block_pad(nw, n_out_w, maps[4]),
        )
        y = jax.lax.conv_general_dilated(
            x, W2, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.tile(b, 4)

        if a_out == 1:
            # zero the ghost rows (original rows -1 / H) before the BN
            # reductions and keep them out of the divisor
            y = _mask_shifted(y)
            bsz, nh2, nw2, _ = y.shape
            real = bsz * 2 * (nh2 - 1) * 2 * (nw2 - 1)
            y, new_stats = _batchnorm(
                y, layer["BatchNorm_0"], stats["BatchNorm_0"], training,
                phases=4, real_count=real,
            )
            y = jnp.maximum(y, 0)
            y = _mask_shifted(y)
        else:
            y, new_stats = _batchnorm(
                y, layer["BatchNorm_0"], stats["BatchNorm_0"], training,
                phases=4,
            )
            y = jnp.maximum(y, 0)
        return y, {"BatchNorm_0": new_stats}

    # -- full forward -----------------------------------------------------

    def apply(self, variables, x, training: bool = False, rngs=None,
              mutable=None, stats_mode: bool = False):
        # stats_mode=True mirrors UNetModule: BatchNorm in
        # batch-statistics mode, Dropout off (deterministic precise-BN
        # collection, ops/bn_refresh.py).
        bn_training = training or stats_mode
        params = variables["params"]
        stats = variables["batch_stats"]
        new_stats = {}
        lv = self.s2d_levels
        x = x.astype(self.dtype)

        def run(x, i, kind, in_perm=None, presum=False):
            name = f"ConvBlock_{i}"
            y, ns = self._block(
                x, params[name], stats[name], bn_training, kind,
                in_perm=in_perm, presum=presum,
            )
            new_stats[name] = ns
            return y

        idx = 0
        skips = []
        for L in range(self.pool_layers):
            if L < lv:
                assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, (
                    "s2d training path needs even spatial dims"
                )
                x = s2d(x)
                for j in range(self.conv_layers):
                    x = run(x, idx, "A" if j % 2 == 0 else "B")
                    idx += 1
                skips.append(x)
                x = phase_max_pool(x)
            else:
                for j in range(self.conv_layers):
                    x = run(x, idx, None)
                    idx += 1
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))

        for j in range(self.conv_layers):
            x = run(x, idx, None)
            idx += 1
        x = self._dropout.apply(
            {}, x, training, rngs=rngs if training else None
        )

        x_form = "scalar"
        for L in reversed(range(self.pool_layers)):
            feats = self.start_neurons * (2**L)
            if L < lv:
                if x_form == "s2d":
                    x = d2s(x)
                x = run(x, idx, "C", presum=True)
                idx += 1
                x = jnp.concatenate([x, skips[L]], axis=-1)
                perm = _split_concat_perm(feats, feats)
                for j in range(self.conv_layers):
                    x = run(
                        x,
                        idx,
                        "A" if j % 2 == 0 else "B",
                        in_perm=perm if j == 0 else None,
                    )
                    idx += 1
                x_form = "s2d"
            else:
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = run(x, idx, None)
                idx += 1
                x = jnp.concatenate([x, skips[L]], axis=-1)
                for j in range(self.conv_layers):
                    x = run(x, idx, None)
                    idx += 1
                x_form = "scalar"

        x = x.astype(jnp.float32)
        hw = params["Conv_0"]["kernel"].astype(jnp.float32)
        hb = params["Conv_0"]["bias"].astype(jnp.float32)
        if x_form == "s2d":
            W2 = jnp.kron(jnp.eye(4, dtype=jnp.float32), hw[0, 0])[None, None]
            y = jax.lax.conv_general_dilated(
                x, W2, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + jnp.tile(hb, 4)
            y = d2s(y)
        else:
            y = jax.lax.conv_general_dilated(
                x, hw, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + hb
        out = jax.nn.softmax(y, axis=-1)

        if mutable:
            return out, {"batch_stats": new_stats}
        return out
