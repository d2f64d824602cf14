"""Model-container contract, mirroring reference `models/base_model.py:8-36`.

A *container* holds architecture hyper-parameters and knows how to build the
actual compute module (a Flax ``nn.Module``), expose its config dict, and
provide the input-preprocessing function. Workflows treat containers
identically to the reference: build once, jit the apply function per input
shape.
"""

from __future__ import annotations

import abc
from typing import Callable

import flax.linen as nn


class BaseModel(abc.ABC):
    def __init__(
        self,
        *,
        input_channels: int,
        num_classes: int,
        image_height: int,
        image_width: int,
    ):
        self.input_channels = input_channels
        self.num_classes = num_classes
        self.image_height = image_height
        self.image_width = image_width

    @abc.abstractmethod
    def build_model(self) -> nn.Module:
        """Return the Flax module implementing the architecture."""

    def get_config(self) -> dict:
        return {
            "input_channels": self.input_channels,
            "num_classes": self.num_classes,
            "image_height": self.image_height,
            "image_width": self.image_width,
        }

    @abc.abstractmethod
    def get_preprocess_input_fn(self) -> Callable:
        """Return the input preprocessing function (jnp-compatible)."""

    @property
    def spatial_divisor(self) -> int:
        """Input H/W must be multiples of this for the forward to trace.

        Geometry guards (VolumeSegmenter, export_inference_pipeline) check
        against this instead of guessing from architecture-specific
        attributes — a wrong guess silently disables the guard and the
        failure resurfaces as an opaque XLA concat shape error mid-trace.
        """
        return 1

    def apply_pretrained_weights(self, variables: dict) -> dict:
        """Hook: replace freshly-initialised variables with pretrained ones.

        Called by every surface that builds a model from scratch (e.g.
        ``train_model``'s non-resume path). The base implementation is a
        no-op; containers with a pretrained-initialisation story (DeepLabV3+
        and its ImageNet ResNet50 backbone, reference
        `models/deeplabv3plus.py:91-95`) override it.
        """
        return variables
