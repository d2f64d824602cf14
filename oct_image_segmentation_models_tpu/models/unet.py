"""U-Net in Flax, architecture-parity with reference `models/unet.py`.

Structure (reference `models/unet.py:106-153`):
- ``pool_layers`` encoder levels of ``conv_layers`` x (Conv ``enc_kernel``
  -> BatchNorm -> ReLU) followed by 2x2 max-pool; filters
  ``start_neurons * 2**level``;
- bottleneck convs at ``start_neurons * 2**pool_layers`` + Dropout(0.5);
- decoder levels of nearest-neighbour 2x upsample -> Conv ``dec_kernel``
  -> BN -> ReLU -> skip concat -> ``conv_layers`` conv blocks
  (note: upsample+conv, *not* transposed conv — `models/unet.py:41-44`);
- 1x1 Conv + softmax head.

Keras-default parity: glorot-uniform conv kernels, zero biases, BatchNorm
momentum 0.99 / eps 1e-3, max-pool VALID padding.

TPU-first details: a ``dtype`` knob runs every conv/BN in bfloat16 on the
MXU while keeping parameters and softmax in float32; spatial dims are
static per jit trace (XLA requirement) — the workflows re-jit per input
resolution instead of building one dynamic-shape graph as Keras does
(`models/unet.py:107`).
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .base_model import BaseModel

UNET_MODEL_NAME = "unet"

_conv_init = nn.initializers.glorot_uniform()


class ConvBlock(nn.Module):
    """Conv -> BatchNorm -> ReLU (reference `models/unet.py:20-29`).

    ``use_bn=False`` builds the BN-folded inference variant (the BN affine
    is pre-merged into the conv weights, see
    :func:`fold_batchnorm_variables`); parameter tree structure for the
    conv is unchanged so folded weights load directly."""

    features: int
    kernel: Sequence[int]
    dtype: jnp.dtype = jnp.float32
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, training: bool):
        x = nn.Conv(
            self.features,
            tuple(self.kernel),
            strides=(1, 1),
            padding="SAME",
            kernel_init=_conv_init,
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not training,
                momentum=0.99,
                epsilon=1e-3,
                dtype=self.dtype,
            )(x)
        return nn.relu(x)


class UNetModule(nn.Module):
    num_classes: int
    start_neurons: int = 8
    pool_layers: int = 4
    conv_layers: int = 2
    enc_kernel: Sequence[int] = (3, 3)
    dec_kernel: Sequence[int] = (2, 2)
    dtype: jnp.dtype = jnp.float32
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False, stats_mode: bool = False):
        # stats_mode=True: BatchNorm computes batch statistics (and emits
        # momentum-updated running stats) while Dropout stays OFF — the
        # deterministic-forward precise-BN collection mode
        # (ops/bn_refresh.py). `training` alone drives both, as in Keras.
        bn_training = training or stats_mode
        x = x.astype(self.dtype)
        block = functools.partial(
            ConvBlock, dtype=self.dtype, use_bn=self.use_bn
        )
        skips = []
        for level in range(self.pool_layers):
            feats = self.start_neurons * (2**level)
            for _ in range(self.conv_layers):
                x = block(feats, self.enc_kernel)(x, bn_training)
            skips.append(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        feats = self.start_neurons * (2**self.pool_layers)
        for _ in range(self.conv_layers):
            x = block(feats, self.enc_kernel)(x, bn_training)
        x = nn.Dropout(0.5, deterministic=not training)(x)

        for level in reversed(range(self.pool_layers)):
            feats = self.start_neurons * (2**level)
            # Nearest-neighbour 2x upsample (Keras UpSampling2D default).
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = block(feats, self.dec_kernel)(x, bn_training)
            x = jnp.concatenate([x, skips[level]], axis=-1)
            for _ in range(self.conv_layers):
                x = block(feats, self.enc_kernel)(x, bn_training)

        x = nn.Conv(
            self.num_classes,
            (1, 1),
            strides=(1, 1),
            kernel_init=_conv_init,
            dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return nn.softmax(x, axis=-1)


class UNet(BaseModel):
    """Container with the reference's hyper-parameter surface
    (`models/unet.py:62-104`)."""

    def __init__(
        self,
        *,
        input_channels: int,
        num_classes: int,
        image_height: int,
        image_width: int,
        start_neurons: int = 8,
        pool_layers: int = 4,
        conv_layers: int = 2,
        enc_kernel=(3, 3),
        dec_kernel=(2, 2),
        dtype: str = "float32",
    ) -> None:
        super().__init__(
            input_channels=input_channels,
            num_classes=num_classes,
            image_height=image_height,
            image_width=image_width,
        )
        self.start_neurons = start_neurons
        self.pool_layers = pool_layers
        self.conv_layers = conv_layers
        self.enc_kernel = tuple(enc_kernel)
        self.dec_kernel = tuple(dec_kernel)
        self.dtype = dtype

    def get_preprocess_input_fn(self) -> Callable:
        def preprocess_input_inner(x):
            return x / 255.0

        return preprocess_input_inner

    @property
    def spatial_divisor(self) -> int:
        # each encoder level halves H/W with a 2x2 max-pool
        return 2**self.pool_layers

    def get_config(self) -> dict:
        config = super().get_config()
        config.update(
            {
                "start_neurons": self.start_neurons,
                "pool_layers": self.pool_layers,
                "conv_layers": self.conv_layers,
                "enc_kernel": self.enc_kernel,
                "dec_kernel": self.dec_kernel,
            }
        )
        # Recorded only when non-default: a bfloat16-trained model must
        # round-trip its dtype, but a float32 config must stay
        # consumable by the reference's own ``UNet(**config)``
        # (`models/unet.py:62-74` — unknown keys raise there).
        if str(self.dtype) != "float32":
            config["dtype"] = self.dtype
        return config

    def build_model(self) -> UNetModule:
        return UNetModule(
            num_classes=self.num_classes,
            start_neurons=self.start_neurons,
            pool_layers=self.pool_layers,
            conv_layers=self.conv_layers,
            enc_kernel=self.enc_kernel,
            dec_kernel=self.dec_kernel,
            dtype=jnp.dtype(self.dtype),
        )


def fold_batchnorm_variables(variables: dict) -> dict:
    """Fold eval-mode BatchNorm affines into the preceding conv weights.

    For ``y = relu(BN(conv(x)))`` with running stats (mean, var) and affine
    (scale, bias): ``kernel' = kernel * scale/sqrt(var+eps)`` per output
    channel and ``bias' = (bias - mean) * scale/sqrt(var+eps) + bn_bias``.
    Returns a variables dict for ``UNetModule(use_bn=False)`` (same conv
    parameter paths, no BatchNorm/batch_stats entries). Inference-only.
    """
    import flax

    eps = 1e-3
    params = flax.core.unfreeze(variables["params"])
    stats = variables.get("batch_stats", {})
    folded = {}
    for name, layer in params.items():
        if not name.startswith("ConvBlock_"):
            folded[name] = layer
            continue
        conv = dict(layer["Conv_0"])
        bn = layer.get("BatchNorm_0")
        if bn is not None:
            mean = stats[name]["BatchNorm_0"]["mean"]
            var = stats[name]["BatchNorm_0"]["var"]
            factor = bn["scale"] / jnp.sqrt(var + eps)
            conv["kernel"] = conv["kernel"] * factor
            conv["bias"] = (conv["bias"] - mean) * factor + bn["bias"]
        folded[name] = {"Conv_0": conv}
    return {"params": folded}
