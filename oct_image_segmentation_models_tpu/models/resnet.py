"""Keras-compatible ResNet50 backbone in Flax.

Mirrors ``keras.applications.ResNet50`` (the backbone the reference's
DeepLabV3+ uses, reference `models/deeplabv3plus.py:91-95`): v1
bottleneck blocks with the stride on the first 1x1 conv, BN momentum 0.99
/ eps 1.001e-5, and **Keras layer names** for every conv/BN so ImageNet
weights exported from Keras HDF5 files can be loaded by name
(:mod:`..common.model_io.load_keras_resnet50_weights`).

``__call__`` returns a dict of the two activation taps the reference
DeepLab head consumes (`models/deeplabv3plus.py:93,106`):
``conv4_block6_2_relu`` (stride-16, 256ch) and ``conv2_block3_2_relu``
(stride-4, 64ch).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_BN_EPS = 1.001e-5

# (num_blocks, filters) per stage — Keras ResNet50 THROUGH conv4 only.
# The reference's functional model is pruned at conv4_block6_2_relu
# (`models/deeplabv3plus.py:91-95`), so conv5's ~15M params never exist
# in reference checkpoints; building them here would inflate every
# checkpoint/optimizer/folded-weights payload by ~60 MB of dead weight
# and break name-for-name import of real reference checkpoints.
_STAGES = ((3, 64), (4, 128), (6, 256))


class ResNet50Backbone(nn.Module):
    dtype: jnp.dtype = jnp.float32
    use_bn: bool = True

    def _bn(self, name, training):
        if not self.use_bn:
            # BN-folded inference variant: the affine + running stats are
            # pre-merged into the conv weights by
            # :func:`..models.deeplabv3plus.fold_deeplab_batchnorm_variables`.
            return lambda x: x
        return nn.BatchNorm(
            use_running_average=not training,
            momentum=0.99,
            epsilon=_BN_EPS,
            dtype=self.dtype,
            name=name,
        )

    def _conv(self, feats, kernel, name, strides=(1, 1)):
        return nn.Conv(
            feats,
            kernel,
            strides=strides,
            padding="SAME" if kernel != (1, 1) else "VALID",
            kernel_init=nn.initializers.glorot_uniform(),
            dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(self, x, training: bool = False):
        taps = {}
        x = x.astype(self.dtype)

        # Stem: ZeroPad(3) + 7x7/2 conv (valid), BN, ReLU, 3x3/2 max-pool.
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding="VALID",
            kernel_init=nn.initializers.glorot_uniform(),
            dtype=self.dtype,
            name="conv1_conv",
        )(x)
        x = self._bn("conv1_bn", training)(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        last_stage_idx = len(_STAGES) + 1
        for stage_idx, (num_blocks, filters) in enumerate(_STAGES, start=2):
            for block_idx in range(1, num_blocks + 1):
                stride = (
                    (2, 2)
                    if (block_idx == 1 and stage_idx > 2)
                    else (1, 1)
                )
                prefix = f"conv{stage_idx}_block{block_idx}"
                shortcut = x
                if block_idx == 1:
                    shortcut = self._conv(
                        4 * filters, (1, 1), f"{prefix}_0_conv", strides=stride
                    )(x)
                    shortcut = self._bn(f"{prefix}_0_bn", training)(shortcut)

                y = self._conv(filters, (1, 1), f"{prefix}_1_conv", strides=stride)(x)
                y = self._bn(f"{prefix}_1_bn", training)(y)
                y = nn.relu(y)
                y = self._conv(filters, (3, 3), f"{prefix}_2_conv")(y)
                y = self._bn(f"{prefix}_2_bn", training)(y)
                y = nn.relu(y)
                taps[f"{prefix}_2_relu"] = y
                if stage_idx == last_stage_idx and block_idx == num_blocks:
                    # The reference's functional model ends at the
                    # conv4_block6_2_relu tap (`models/deeplabv3plus.py:93`),
                    # so the block's 3_conv/3_bn/add tail is pruned out of
                    # the graph and ABSENT from real checkpoints — building
                    # it here would add dead params real reference h5 files
                    # can't populate (verified by
                    # tests/test_keras_parity.py against actual Keras).
                    return y, taps
                y = self._conv(4 * filters, (1, 1), f"{prefix}_3_conv")(y)
                y = self._bn(f"{prefix}_3_bn", training)(y)
                x = nn.relu(shortcut + y)
            taps[f"conv{stage_idx}_out"] = x

        return x, taps
