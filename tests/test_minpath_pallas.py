"""Pallas min-path kernel (interpret mode on CPU) vs the XLA scan and the
heapq oracle."""

import numpy as np

from oct_image_segmentation_models_tpu.ops import minpath
from oct_image_segmentation_models_tpu.ops.minpath_pallas import delineate_pallas

from oracle_minpath import dijkstra_delineate


def _ridge_map(w, h, rows, value=255):
    m = np.zeros((w, h), dtype=np.uint8)
    m[np.arange(w), rows] = value
    return m


def test_pallas_matches_xla_and_oracle_small():
    rng = np.random.default_rng(0)
    for trial in range(4):
        w, h = 12, 16
        if trial % 2:
            m = (rng.random((w, h)) < 0.3).astype(np.uint8) * 255
        else:
            rows = np.clip(
                8 + np.cumsum(rng.integers(-2, 3, size=w)), 1, h - 2
            )
            m = _ridge_map(w, h, rows)
        got = np.asarray(delineate_pallas(m[None], interpret=True))[0]
        want_xla = np.asarray(minpath.delineate(m))
        want_oracle = dijkstra_delineate(m)
        assert np.array_equal(got, want_xla), f"trial {trial} vs xla"
        assert np.array_equal(got, want_oracle), f"trial {trial} vs oracle"


def test_pallas_batched_plateaus():
    rng = np.random.default_rng(1)
    maps = []
    for _ in range(4):
        w, h = 16, 16
        rows = []
        r = int(rng.integers(2, h - 2))
        while len(rows) < w:
            rows.extend([r] * int(rng.integers(1, 4)))
            r = int(np.clip(r + rng.integers(-3, 4), 1, h - 2))
        maps.append(_ridge_map(w, h, np.array(rows[:w])))
    maps = np.stack(maps).reshape(2, 2, 16, 16)
    got = np.asarray(delineate_pallas(maps, interpret=True))
    want = np.asarray(minpath.delineate(maps))
    assert np.array_equal(got, want)


def test_pallas_lane_packed_groups():
    # 20 maps of height 16 -> 3 sublane blocks packed into lane segments.
    rng = np.random.default_rng(2)
    w, h = 12, 16
    maps = (rng.random((20, w, h)) < 0.25).astype(np.uint8) * 255
    got = np.asarray(delineate_pallas(maps, interpret=True))
    want = np.asarray(minpath.delineate(maps))
    assert np.array_equal(got, want)


def test_pallas_nonpow2_height():
    rng = np.random.default_rng(3)
    w, h = 10, 11  # pad rows must stay walled off
    rows = np.clip(5 + np.cumsum(rng.integers(-1, 2, w)), 1, h - 2)
    m = _ridge_map(w, h, rows)
    got = np.asarray(delineate_pallas(m[None], interpret=True))[0]
    want = dijkstra_delineate(m)
    assert np.array_equal(got, want)


def test_pallas_max_grad_2():
    rng = np.random.default_rng(4)
    w, h = 14, 16
    rows = np.clip(8 + np.cumsum(rng.integers(-3, 4, w)), 1, h - 2)
    m = _ridge_map(w, h, rows)
    got = np.asarray(delineate_pallas(m[None], max_grad=2, interpret=True))[0]
    want = dijkstra_delineate(m, max_grad=2)
    assert np.array_equal(got, want)


def test_pallas_s2d_packing_matches_plain():
    from oct_image_segmentation_models_tpu.ops.minpath_pallas import (
        delineate_pallas_s2d,
    )

    rng = np.random.default_rng(7)
    for b, m_n, h, w, g in [(2, 3, 16, 12, 1), (1, 2, 32, 20, 2)]:
        maps = rng.integers(0, 256, (b, m_n, h, w), dtype=np.uint8)
        s2d = (
            maps.reshape(b, m_n, h // 2, 2, w // 2, 2)
            .transpose(0, 1, 2, 4, 3, 5)
            .reshape(b, m_n, h // 2, w // 2, 4)
        )
        ref = np.asarray(
            delineate_pallas(
                np.swapaxes(maps, -1, -2), max_grad=g, interpret=True
            )
        )
        got = np.asarray(delineate_pallas_s2d(s2d, max_grad=g, interpret=True))
        assert got.shape == (b, m_n, w)
        assert np.array_equal(ref, got)


def test_pallas_fast_matches_xla_fast_bitwise():
    """The fast-tie kernel body must bit-match the XLA scan's
    tie_parity="fast" mode on every map family (ridges, plateaus,
    flat tails, sparse/dense random, non-pow2 heights, max_grad=2)."""
    rng = np.random.default_rng(11)
    cases = []
    for trial in range(6):
        w, h = 20, 16
        rows = np.clip(8 + np.cumsum(rng.integers(-2, 3, size=w)), 1, h - 2)
        m = _ridge_map(w, h, rows)
        if trial % 3 == 1:  # plateau widening
            m |= np.roll(m, 1, axis=1)
        if trial % 3 == 2:  # flat tail tie chains
            m[-5:, :] = 0
        cases.append((m, 1))
    cases.append(((rng.random((24, 16)) < 0.3).astype(np.uint8) * 255, 1))
    cases.append((rng.integers(0, 256, (18, 16), dtype=np.uint8), 1))
    cases.append((rng.integers(0, 256, (10, 11), dtype=np.uint8), 1))
    rows2 = np.clip(8 + np.cumsum(rng.integers(-3, 4, 14)), 1, 14)
    cases.append((_ridge_map(14, 16, rows2), 2))
    for i, (m, g) in enumerate(cases):
        got = np.asarray(
            delineate_pallas(
                m[None], max_grad=g, interpret=True, tie_parity="fast"
            )
        )[0]
        want = np.asarray(
            minpath._delineate_xla(m, max_grad=g, tie_parity="fast")
        )
        assert np.array_equal(got, want), f"case {i}"


def test_pallas_fast_batched_lane_packed():
    # Packed lane groups + pad rows with the fast body.
    rng = np.random.default_rng(12)
    w, h = 12, 11
    maps = (rng.random((20, w, h)) < 0.25).astype(np.uint8) * 255
    got = np.asarray(
        delineate_pallas(maps, interpret=True, tie_parity="fast")
    )
    want = np.asarray(minpath._delineate_xla(maps, tie_parity="fast"))
    assert np.array_equal(got, want)


def test_pallas_fast_s2d_matches_plain():
    from oct_image_segmentation_models_tpu.ops.minpath_pallas import (
        delineate_pallas_s2d,
    )

    rng = np.random.default_rng(13)
    b, m_n, h, w = 2, 3, 16, 12
    maps = rng.integers(0, 256, (b, m_n, h, w), dtype=np.uint8)
    s2d = (
        maps.reshape(b, m_n, h // 2, 2, w // 2, 2)
        .transpose(0, 1, 2, 4, 3, 5)
        .reshape(b, m_n, h // 2, w // 2, 4)
    )
    ref = np.asarray(
        delineate_pallas(
            np.swapaxes(maps, -1, -2), interpret=True, tie_parity="fast"
        )
    )
    got = np.asarray(
        delineate_pallas_s2d(s2d, interpret=True, tie_parity="fast")
    )
    assert np.array_equal(ref, got)
