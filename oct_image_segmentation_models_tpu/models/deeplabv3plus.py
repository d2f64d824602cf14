"""DeepLabV3+ in Flax — architecture parity with reference
`models/deeplabv3plus.py`.

Head structure (reference `models/deeplabv3plus.py:33-131`):
- ResNet50 backbone (ImageNet-initialisable), tapped at
  ``conv4_block6_2_relu`` (stride 16) and ``conv2_block3_2_relu``
  (stride 4);
- Dilated Spatial Pyramid Pooling: image-level pooling branch + 1x1 and
  3x3 dilated convs (rates 6/12/18), concat, 1x1 projection (`:33-60`);
- decoder: bilinear x4 upsample, concat with a 48-filter 1x1 of the
  low-level tap, two 3x3 conv blocks, bilinear upsample to input size,
  1x1 softmax head (`:98-125`).

All conv blocks are Conv(use_bias=False, He-normal) -> BN -> ReLU
(`:12-31`). Inputs are fixed 3-channel (`:90`); preprocessing is the
caffe-style ResNet50 ``preprocess_input`` (RGB->BGR, mean subtraction).

ImageNet weights: pass ``pretrained_weights=/path/to/keras_resnet50.h5``
as a model hyper-parameter; weights are loaded by Keras layer name
(zero-egress environments must provide the file locally). Without it the
backbone is randomly initialised (documented divergence from the
reference, which downloads ImageNet weights at build time).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .base_model import BaseModel
from .resnet import ResNet50Backbone

DEEPLABV3PLUS_MODEL_NAME = "deeplabv3plus"

# Caffe-style ImageNet channel means (keras.applications.resnet50).
_IMAGENET_MEANS_BGR = (103.939, 116.779, 123.68)


class _ConvBlock(nn.Module):
    """Conv(no bias, He-normal) -> BN -> ReLU (reference `:12-31`)."""

    features: int = 256
    kernel: int = 3
    dilation: int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            use_bias=self.use_bias,
            kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not training,
            momentum=0.99,
            epsilon=1e-3,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)


def _resize_bilinear(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="bilinear")


class DSPP(nn.Module):
    """Dilated Spatial Pyramid Pooling (reference `:33-60`)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool):
        h, w = x.shape[1], x.shape[2]
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = _ConvBlock(kernel=1, use_bias=True, dtype=self.dtype)(
            pooled, training
        )
        out_pool = _resize_bilinear(pooled, h, w)
        out_1 = _ConvBlock(kernel=1, dtype=self.dtype)(x, training)
        out_6 = _ConvBlock(kernel=3, dilation=6, dtype=self.dtype)(x, training)
        out_12 = _ConvBlock(kernel=3, dilation=12, dtype=self.dtype)(x, training)
        out_18 = _ConvBlock(kernel=3, dilation=18, dtype=self.dtype)(x, training)
        x = jnp.concatenate([out_pool, out_1, out_6, out_12, out_18], axis=-1)
        return _ConvBlock(kernel=1, dtype=self.dtype)(x, training)


class DeeplabV3PlusModule(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        full_h, full_w = x.shape[1], x.shape[2]
        _, taps = ResNet50Backbone(dtype=self.dtype, name="resnet50")(x, training)

        y = DSPP(dtype=self.dtype)(taps["conv4_block6_2_relu"], training)
        input_a = _resize_bilinear(y, full_h // 4, full_w // 4)

        input_b = _ConvBlock(features=48, kernel=1, dtype=self.dtype)(
            taps["conv2_block3_2_relu"], training
        )

        y = jnp.concatenate([input_a, input_b], axis=-1)
        y = _ConvBlock(dtype=self.dtype)(y, training)
        y = _ConvBlock(dtype=self.dtype)(y, training)
        y = _resize_bilinear(y, full_h, full_w)
        y = nn.Conv(
            self.num_classes,
            (1, 1),
            padding="SAME",
            dtype=jnp.float32,
        )(y.astype(jnp.float32))
        return nn.softmax(y, axis=-1)


class DeeplabV3Plus(BaseModel):
    """Container — reference `models/deeplabv3plus.py:63-131`."""

    def __init__(
        self,
        *,
        input_channels: int,
        num_classes: int,
        image_height: int,
        image_width: int,
        pretrained_weights: Optional[str] = None,
        dtype: str = "float32",
    ) -> None:
        super().__init__(
            input_channels=input_channels,
            num_classes=num_classes,
            image_height=image_height,
            image_width=image_width,
        )
        self.pretrained_weights = pretrained_weights
        self.dtype = dtype

    def get_config(self) -> dict:
        return super().get_config()

    def get_preprocess_input_fn(self) -> Callable:
        def preprocess_input(x):
            # keras.applications.resnet50.preprocess_input: RGB->BGR and
            # per-channel ImageNet mean subtraction (caffe mode).
            x = jnp.asarray(x, jnp.float32)
            x = x[..., ::-1]
            means = jnp.asarray(_IMAGENET_MEANS_BGR, jnp.float32)
            return x - means

        return preprocess_input

    def build_model(self) -> DeeplabV3PlusModule:
        return DeeplabV3PlusModule(
            num_classes=self.num_classes, dtype=jnp.dtype(self.dtype)
        )

    def apply_pretrained_weights(self, variables: dict) -> dict:
        """Load the Keras-format ResNet50 ``.h5`` named by
        ``pretrained_weights`` into the backbone (conv kernels, BN
        scale/offset AND moving statistics), leaving the DSPP/decoder/head
        randomly initialised — the reference's ``weights="imagenet"``
        backbone construction (`models/deeplabv3plus.py:91-95`).
        """
        if not self.pretrained_weights:
            return variables

        from pathlib import Path

        import flax

        from ..common.model_io import load_keras_resnet50_weights

        h5_path = Path(self.pretrained_weights)
        if not h5_path.exists():
            raise FileNotFoundError(
                f"pretrained_weights file not found: {h5_path} (this "
                "zero-egress build loads Keras ResNet50 .h5 files locally "
                "instead of downloading ImageNet weights)"
            )
        variables = flax.core.unfreeze(variables)
        new_params, new_stats = load_keras_resnet50_weights(
            variables["params"]["resnet50"], h5_path
        )
        variables["params"]["resnet50"] = new_params
        stats_root = variables.setdefault("batch_stats", {}).setdefault(
            "resnet50", {}
        )
        for layer_name, stats in new_stats.items():
            stats_root.setdefault(layer_name, {}).update(stats)
        return variables
