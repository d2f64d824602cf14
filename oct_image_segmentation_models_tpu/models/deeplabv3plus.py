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

import functools
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
    """Conv(no bias, He-normal) -> BN -> ReLU (reference `:12-31`).

    ``use_bn=False`` builds the BN-folded inference variant: the BN
    affine + running stats are pre-merged into the conv weights by
    :func:`fold_deeplab_batchnorm_variables`, and the conv grows a bias
    slot to carry the folded shift."""

    features: int = 256
    kernel: int = 3
    dilation: int = 1
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, training: bool):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            kernel_dilation=(self.dilation, self.dilation),
            padding="SAME",
            use_bias=self.use_bias or not self.use_bn,
            kernel_init=nn.initializers.he_normal(),
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


def _resize_bilinear(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), method="bilinear")


class DSPP(nn.Module):
    """Dilated Spatial Pyramid Pooling (reference `:33-60`)."""

    dtype: jnp.dtype = jnp.float32
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, training: bool):
        h, w = x.shape[1], x.shape[2]
        block = functools.partial(
            _ConvBlock, dtype=self.dtype, use_bn=self.use_bn
        )
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = block(kernel=1, use_bias=True)(pooled, training)
        out_pool = _resize_bilinear(pooled, h, w)
        out_1 = block(kernel=1)(x, training)
        out_6 = block(kernel=3, dilation=6)(x, training)
        out_12 = block(kernel=3, dilation=12)(x, training)
        out_18 = block(kernel=3, dilation=18)(x, training)
        x = jnp.concatenate([out_pool, out_1, out_6, out_12, out_18], axis=-1)
        return block(kernel=1)(x, training)


class DeeplabV3PlusModule(nn.Module):
    num_classes: int
    dtype: jnp.dtype = jnp.float32
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, training: bool = False, stats_mode: bool = False):
        # stats_mode mirrors UNetModule's deterministic precise-BN
        # collection flag (ops/bn_refresh.py); with no Dropout anywhere
        # in this architecture it is equivalent to training=True.
        training = training or stats_mode
        full_h, full_w = x.shape[1], x.shape[2]
        block = functools.partial(
            _ConvBlock, dtype=self.dtype, use_bn=self.use_bn
        )
        _, taps = ResNet50Backbone(
            dtype=self.dtype, use_bn=self.use_bn, name="resnet50"
        )(x, training)

        y = DSPP(dtype=self.dtype, use_bn=self.use_bn)(
            taps["conv4_block6_2_relu"], training
        )
        input_a = _resize_bilinear(y, full_h // 4, full_w // 4)

        input_b = block(features=48, kernel=1)(
            taps["conv2_block3_2_relu"], training
        )

        y = jnp.concatenate([input_a, input_b], axis=-1)
        y = block()(y, training)
        y = block()(y, training)
        y = _resize_bilinear(y, full_h, full_w)
        y = nn.Conv(
            self.num_classes,
            (1, 1),
            padding="SAME",
            # Keras Conv2D default init (reference `:120-125`); Flax's
            # default is lecun_normal, which would silently diverge
            kernel_init=nn.initializers.glorot_uniform(),
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
        config = super().get_config()
        # Recorded only when non-default: the checkpoint round-trip must
        # rebuild bfloat16/pretrained containers faithfully, but a
        # default config must stay consumable by the reference's own
        # ``DeepLabv3Plus(**config)`` (unknown keys raise there).
        if str(self.dtype) != "float32":
            config["dtype"] = self.dtype
        if self.pretrained_weights is not None:
            config["pretrained_weights"] = self.pretrained_weights
        return config

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

    @property
    def spatial_divisor(self) -> int:
        # The decoder concatenates the DSPP output resized to exactly
        # (H//4, W//4) with the stride-4 backbone tap, whose SAME-padded
        # shape is ceil(H/4) — equal only when H and W divide by 4.
        return 4

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


# ---------------------------------------------------------------------------
# BN-folded inference variant
# ---------------------------------------------------------------------------

_RESNET_BN_EPS = 1.001e-5  # models/resnet.py _BN_EPS (Keras ResNet50)
_HEAD_BN_EPS = 1e-3  # _ConvBlock BatchNorm (reference `:24-27`)


def _fold_conv_bn(conv: dict, bn: dict, mean, var, eps: float) -> dict:
    """y = BN(conv(x)) == conv'(x) with ``kernel' = kernel * s/sqrt(v+eps)``
    per output channel and ``bias' = (bias - m) * s/sqrt(v+eps) + b``."""
    factor = bn["scale"] / jnp.sqrt(var + eps)
    out = dict(conv)
    out["kernel"] = conv["kernel"] * factor
    out["bias"] = (conv.get("bias", 0.0) - mean) * factor + bn["bias"]
    return out


def fold_deeplab_batchnorm_variables(variables: dict) -> dict:
    """Fold every eval-mode BatchNorm into its preceding conv.

    Handles both naming schemes in the DeepLabV3+ tree: Keras-named
    backbone pairs (``{p}_conv`` / ``{p}_bn``, eps 1.001e-5 — see
    :class:`.resnet.ResNet50Backbone`) and Flax ``_ConvBlock`` children
    (``Conv_0`` / ``BatchNorm_0``, eps 1e-3). Returns a variables dict
    for ``DeeplabV3PlusModule(use_bn=False)`` (convs keep their paths and
    gain a bias; no BatchNorm/batch_stats entries). Inference-only, like
    :func:`.unet.fold_batchnorm_variables`.
    """
    import flax

    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(dict(variables.get("batch_stats", {})))

    def walk(p: dict, s: dict) -> dict:
        out = {}
        for name, node in p.items():
            if name.endswith("_bn") or name == "BatchNorm_0":
                continue  # consumed by its conv below
            if not isinstance(node, dict):
                out[name] = node
            elif "kernel" in node:
                bn_name = name[: -len("_conv")] + "_bn" if name.endswith(
                    "_conv"
                ) else None
                if bn_name and bn_name in p:
                    out[name] = _fold_conv_bn(
                        node,
                        p[bn_name],
                        s[bn_name]["mean"],
                        s[bn_name]["var"],
                        _RESNET_BN_EPS,
                    )
                else:
                    out[name] = node  # head conv / already-folded leaf
            elif "Conv_0" in node and "BatchNorm_0" in node:
                out[name] = {
                    "Conv_0": _fold_conv_bn(
                        node["Conv_0"],
                        node["BatchNorm_0"],
                        s[name]["BatchNorm_0"]["mean"],
                        s[name]["BatchNorm_0"]["var"],
                        _HEAD_BN_EPS,
                    )
                }
            else:
                out[name] = walk(node, s.get(name, {}))
        return out

    return {"params": walk(params, stats)}


def maybe_build_folded_apply(
    module, variables: dict, dtype=jnp.float32
) -> tuple[Optional[Callable], Optional[dict]]:
    """BN-folded inference forward for a trained DeepLabV3+.

    The single decision point the inference surfaces (staged pipeline,
    fused pipeline, streaming) use for DeepLab, mirroring
    :func:`..ops.s2d_unet.maybe_build_s2d_apply` for the U-Net: requires
    a ``DeeplabV3PlusModule`` with ``batch_stats`` (i.e. a trained
    checkpoint). ``dtype`` sets the conv-stack compute dtype (the 1x1
    head + softmax stay float32); parameters remain float32 either way.

    Returns ``(apply_fn, folded_variables)`` with
    ``apply_fn(folded_variables, x) -> probs``, or ``(None, None)`` when
    ineligible. The folded weights are returned separately so callers
    jit with them as an *argument*: closing the ~108 MB float32 backbone
    into the jit graph as captured constants exceeds the remote
    compiler's request limit on tunneled TPU hosts (HTTP 413 — PLAN.md
    environment gotchas).
    """
    if not isinstance(module, DeeplabV3PlusModule):
        return None, None
    if "batch_stats" not in variables:
        return None, None
    folded = fold_deeplab_batchnorm_variables(variables)
    mod = DeeplabV3PlusModule(
        num_classes=module.num_classes, dtype=jnp.dtype(dtype), use_bn=False
    )

    def apply_fn(folded_variables, x):
        return mod.apply(folded_variables, x, training=False)

    return apply_fn, folded
