"""Direct plotting unit tests (pixel-exact sizing; NaN-tolerant curves)."""

import numpy as np


def test_trainval_plot_with_nan_prefix(tmp_path):
    """Resumed runs carry NaN placeholders for pre-resume epochs
    (training_callbacks.SaveEpochInfo); the curve plot must render and
    its best-value title must use the NaN-aware reductions."""
    from oct_image_segmentation_models_tpu.common import plotting

    out = tmp_path / "curves.png"
    accs = [float("nan"), float("nan"), 0.7, 0.9]
    losses = [float("nan"), float("nan"), 0.5, 0.3]
    plotting.save_cur_trainval_plot(
        "dice_coef_macro",
        "dice_loss_macro",
        "unet",
        6,
        3,
        accs,
        [a - 0.05 for a in accs],
        losses,
        [l + 0.05 for l in losses],
        out,
    )
    assert out.exists() and out.stat().st_size > 0


def test_trainval_plot_all_nan_renders(tmp_path):
    """Epoch-1 divergence (all-NaN losses) must render a plot, not crash
    the training callback (nanargmin raises on all-NaN slices)."""
    from oct_image_segmentation_models_tpu.common import plotting

    out = tmp_path / "nan_curves.png"
    nans = [float("nan")] * 2
    plotting.save_cur_trainval_plot(
        "dice_coef_macro",
        "dice_loss_macro",
        "unet",
        4,
        1,
        nans,
        nans,
        nans,
        nans,
        out,
    )
    assert out.exists() and out.stat().st_size > 0


def test_setup_image_plot_pixel_exact(tmp_path):
    """Figure sizing matches the reference's 100-dpi pixel-exact
    construction (`plotting.py:169-185`): saved PNG equals the image
    dims exactly."""
    from PIL import Image

    from oct_image_segmentation_models_tpu.common import plotting

    import matplotlib.pyplot as plt

    img = np.zeros((48, 64), np.uint8)
    plotting.setup_image_plot(img, cmap="gray")
    out = tmp_path / "img.png"
    plt.savefig(out)
    plt.close()
    with Image.open(out) as im:
        assert im.size == (64, 48)
