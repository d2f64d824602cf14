"""Fused s2d encoder-pair Pallas kernel (interpret mode on CPU) vs the
unfused block-space ops it replaces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from oct_image_segmentation_models_tpu.ops import s2d_unet as su
from oct_image_segmentation_models_tpu.ops.s2d_pallas import (
    enc_pair_supported,
    fused_enc_pair,
)


def _unfused_pair(x, w1, b1, w2, b2, nh, nw):
    y1 = su._conv_block_space(x, w1, b1, (-1, 0), (-1, 0), nh + 1, nw + 1,
                              jnp.float32)
    y1 = su._mask_shifted(jnp.maximum(y1, 0))
    y2 = su._conv_block_space(y1, w2, b2, (0, 1), (0, 1), nh, nw,
                              jnp.float32)
    y2 = jnp.maximum(y2, 0)
    return y2, su.phase_max_pool(y2)


@pytest.mark.parametrize("nh,nw,cgroups", [(8, 16, 8), (4, 8, 16)])
def test_fused_enc_pair_matches_unfused(nh, nw, cgroups):
    rng = np.random.default_rng(0)
    B, cin = 2, 2
    c = cgroups
    w0 = rng.normal(size=(3, 3, cin, c)).astype(np.float32)
    b0 = rng.normal(size=(c,)).astype(np.float32)
    wb = rng.normal(size=(3, 3, c, c)).astype(np.float32)
    bb = rng.normal(size=(c,)).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(B, nh, nw, 4 * cin)).astype(np.float32))

    W1, _, _ = su.transform_kernel(w0, 0, 1)
    W2, _, _ = su.transform_kernel(wb, 1, 0)
    b1 = jnp.asarray(np.tile(b0, 4))
    b2 = jnp.asarray(np.tile(bb, 4))
    W1, W2 = jnp.asarray(W1), jnp.asarray(W2)

    want_y2, want_pool = _unfused_pair(x, W1, b1, W2, b2, nh, nw)
    got_y2, got_pool = fused_enc_pair(x, W1, b1, W2, b2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_y2), np.asarray(want_y2), rtol=0, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_pool), np.asarray(want_pool), rtol=0, atol=1e-4
    )


def test_fused_path_through_builder_matches_unfused():
    """build_s2d_apply(fuse_enc_pairs=True) output equals the unfused
    forward (the fused kernel changes only f32 summation order)."""
    from oct_image_segmentation_models_tpu.models import get_model_class

    container = get_model_class("unet")(
        input_channels=1, num_classes=3, image_height=32, image_width=32,
        start_neurons=32, pool_layers=2,
    )
    module = container.build_model()
    variables = module.init(
        jax.random.PRNGKey(0), np.zeros((1, 32, 32, 1), np.float32),
        training=False,
    )
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 32, 32, 1)).astype(np.float32)
    )
    plain = su.build_s2d_apply(
        dict(variables), container.get_config(), fuse_enc_pairs=False
    )
    fused = su.build_s2d_apply(
        dict(variables), container.get_config(), fuse_enc_pairs=True,
        _fused_interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(fused(x)), np.asarray(plain(x)), rtol=0, atol=1e-5
    )


def test_enc_pair_supported_gating():
    # lane-aligned channel counts only, block rows divisible by 2
    assert enc_pair_supported(8, 16, 128, 256)
    assert not enc_pair_supported(8, 16, 4, 128)  # level-0 channel count
    assert not enc_pair_supported(8, 16, 128, 64)
    assert not enc_pair_supported(7, 16, 128, 128)
