"""Boundary-map conversion and area-mask reconstruction vs NumPy oracles
that follow the reference formulas literally."""

import numpy as np

from oct_image_segmentation_models_tpu.ops import boundary


def np_convert_maps(categorical_pred, bg_ilm=True, bg_csi=False):
    """Literal NumPy transcription of reference `common/utils.py:115-168`."""
    b, c, h, w = categorical_pred.shape
    out = np.zeros((b, c - 1, h, w), dtype="uint8")
    for s in range(b):
        for map_ind in range(1, c):
            if (map_ind == 1 and bg_ilm) or (map_ind == c - 1 and bg_csi):
                cur = categorical_pred[s, map_ind - 1].astype(np.float64)
                grad = -np.gradient(cur, axis=0)
            else:
                cur = categorical_pred[s, map_ind].astype(np.float64)
                grad = np.gradient(cur, axis=0)
            grad[grad < 0] = 0
            grad *= 2
            grad -= np.roll(grad, -1, axis=0)
            grad[grad < 0] = 0
            out[s, map_ind - 1] = (grad * 255).astype("uint8")
    return out


def np_create_area_mask(image_height, segs):
    """Literal NumPy transcription of reference
    `common/dataset_construction.py:654-708` (mask in (W, H) orientation)."""
    segs = np.array(segs, dtype=np.float64)
    n, width = segs.shape
    mask = np.zeros((width, image_height), dtype="uint8")
    segs = segs.copy()
    for col in range(width):
        for i in range(n):
            v = segs[i, col]
            if np.isnan(v) or v == 0:
                rep = None
                for j in range(i + 1, n):
                    vj = segs[j, col]
                    if not np.isnan(vj) and vj != 0:
                        rep = vj
                        break
                segs[i, col] = rep if rep is not None else image_height
        isegs = segs[:, col].astype(int)
        for i in range(n):
            lo = 0 if i == 0 else isegs[i - 1]
            mask[col, lo : isegs[i]] = i
        mask[col, isegs[-1] :] = n
    return mask


def _random_labels(rng, b, h, w, c):
    """Label maps with layered structure + some noise."""
    labels = np.zeros((b, h, w), dtype=np.int32)
    for s in range(b):
        prev = np.zeros(w)
        for cls in range(1, c):
            prev = prev + rng.integers(1, max(2, h // c), size=w)
            rows = np.arange(h)[:, None]
            labels[s][rows >= prev[None, :]] = cls
    return labels


def test_perform_argmax_matches_numpy():
    rng = np.random.default_rng(0)
    probs = rng.random((2, 8, 10, 4)).astype(np.float32)
    probs /= probs.sum(-1, keepdims=True)
    am, cat = boundary.perform_argmax(probs, bin=True)
    assert np.array_equal(np.asarray(am), np.argmax(probs, axis=3))
    onehot = np.eye(4, dtype=np.float32)[np.argmax(probs, axis=3)]
    assert np.array_equal(np.asarray(cat), np.transpose(onehot, (0, 3, 1, 2)))
    _, cat_probs = boundary.perform_argmax(probs, bin=False)
    assert np.allclose(np.asarray(cat_probs), np.transpose(probs, (0, 3, 1, 2)))


def test_boundary_maps_match_reference_formula():
    rng = np.random.default_rng(1)
    labels = _random_labels(rng, 3, 24, 16, 4)
    onehot = np.transpose(np.eye(4, dtype=np.float32)[labels], (0, 3, 1, 2))
    for bg_ilm, bg_csi in [(True, False), (False, False), (True, True)]:
        got = np.asarray(
            boundary.boundary_prob_maps(onehot, bg_ilm=bg_ilm, bg_csi=bg_csi)
        )
        want = np_convert_maps(onehot, bg_ilm=bg_ilm, bg_csi=bg_csi)
        assert np.array_equal(got, want), (bg_ilm, bg_csi)


def test_boundary_maps_noisy_predictions_exact():
    # Noisy (non-layered) argmax maps exercise the uint8 wraparound path.
    rng = np.random.default_rng(2)
    labels = rng.integers(0, 3, size=(2, 12, 9))
    onehot = np.transpose(np.eye(3, dtype=np.float32)[labels], (0, 3, 1, 2))
    got = np.asarray(boundary.boundary_prob_maps(onehot))
    want = np_convert_maps(onehot)
    assert np.array_equal(got, want)


def test_area_mask_matches_reference_semantics():
    rng = np.random.default_rng(3)
    h, w, n = 20, 12, 3
    segs = rng.integers(0, h, size=(n, w)).astype(np.float64)
    segs[0, 2] = np.nan
    segs[1, 5] = 0
    segs[:, 7] = 0  # whole column invalid -> all image_height
    got = np.asarray(boundary.create_area_mask(segs, h))  # (H, W)
    want = np_create_area_mask(h, segs).T  # transpose (W,H) -> (H,W)
    assert np.array_equal(got, want)


def test_area_mask_roundtrip_with_generate_boundary():
    # Clean layered labels -> boundaries -> area mask reproduces the labels.
    rng = np.random.default_rng(4)
    labels = _random_labels(rng, 2, 24, 16, 4)
    segs = []
    for s in range(2):
        per = [np.argmax(labels[s] == cls, axis=0) for cls in range(1, 4)]
        segs.append(np.stack(per))
    segs = np.stack(segs).astype(np.float64)  # (B, n, W)
    masks = np.asarray(boundary.create_area_mask(segs, 24))
    assert np.array_equal(masks, labels.astype(np.uint8))


def test_boundary_maps_from_labels_matches_prob_maps():
    """The integer fast path must equal boundary_prob_maps bit-for-bit
    for every (num_classes, bg_ilm, bg_csi) combination."""
    import jax
    import jax.numpy as jnp

    from oct_image_segmentation_models_tpu.ops import boundary as bops

    rng = np.random.default_rng(0)
    for num_classes in (3, 4, 6):
        labels = rng.integers(0, num_classes, (3, 17, 13))
        _, cat = bops.perform_argmax(
            jax.nn.one_hot(labels, num_classes), bin=True
        )
        for bg_ilm in (True, False):
            for bg_csi in (True, False):
                ref = bops.boundary_prob_maps(
                    cat, bg_ilm=bg_ilm, bg_csi=bg_csi
                )
                fast = bops.boundary_maps_from_labels(
                    jnp.asarray(labels),
                    num_classes,
                    bg_ilm=bg_ilm,
                    bg_csi=bg_csi,
                )
                assert np.array_equal(np.asarray(ref), np.asarray(fast))


def _to_s2d_labels(labels):
    b, h, w = labels.shape
    return (
        labels.reshape(b, h // 2, 2, w // 2, 2)
        .transpose(0, 1, 3, 2, 4)
        .reshape(b, h // 2, w // 2, 4)
    )


def test_boundary_maps_from_s2d_labels_matches_label_path():
    rng = np.random.default_rng(11)
    for b, h, w, c in [(2, 16, 12, 4), (1, 8, 8, 3), (2, 32, 16, 5)]:
        for labels in (
            _random_labels(rng, b, h, w, c),
            rng.integers(0, c, (b, h, w)),
        ):
            lab_s2d = _to_s2d_labels(np.asarray(labels))
            for bg_ilm, bg_csi in [(True, False), (False, False), (True, True)]:
                ref = np.asarray(
                    boundary.boundary_maps_from_labels(
                        labels, c, bg_ilm=bg_ilm, bg_csi=bg_csi
                    )
                )
                got = np.asarray(
                    boundary.boundary_maps_from_s2d_labels(
                        lab_s2d, c, bg_ilm=bg_ilm, bg_csi=bg_csi
                    )
                )
                assert np.array_equal(ref, got)
                got_t = np.asarray(
                    boundary.boundary_maps_from_s2d_labels(
                        lab_s2d, c, bg_ilm=bg_ilm, bg_csi=bg_csi,
                        transposed=True,
                    )
                )
                assert np.array_equal(np.swapaxes(ref, -1, -2), got_t)
                m_s2d = np.asarray(
                    boundary.boundary_maps_from_s2d_labels(
                        lab_s2d, c, bg_ilm=bg_ilm, bg_csi=bg_csi,
                        transposed="s2d",
                    )
                )
                # d2s of the s2d-form maps == image-orientation maps
                bm, mm, hb, wb, _ = m_s2d.shape
                d2s = (
                    m_s2d.reshape(bm, mm, hb, wb, 2, 2)
                    .transpose(0, 1, 2, 4, 3, 5)
                    .reshape(bm, mm, 2 * hb, 2 * wb)
                )
                assert np.array_equal(ref, d2s)
