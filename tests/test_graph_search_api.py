"""Public min_path_processing API parity (reference `graph_search.py`)."""

import numpy as np

from oct_image_segmentation_models_tpu.min_path_processing import (
    generate_boundary,
    graph_search,
)

from oracle_minpath import dijkstra_delineate


def _ridge(w, h, rows):
    m = np.zeros((w, h), dtype=np.uint8)
    m[np.arange(w), rows] = 255
    return m


def test_generate_boundary_convention():
    labels = np.zeros((8, 5), dtype=np.uint8)  # (H, W)
    labels[3:6] = 1
    labels[6:] = 2
    b = generate_boundary(labels, axis=0)
    assert b.shape == (2, 5)
    assert (b[0] == 3).all() and (b[1] == 6).all()


def test_segment_maps_predictions_and_errors():
    rng = np.random.default_rng(0)
    w, h = 20, 16
    rows1 = np.clip(5 + np.cumsum(rng.integers(-1, 2, w)), 1, h - 2)
    rows2 = np.clip(10 + np.cumsum(rng.integers(-1, 2, w)), 1, h - 2)
    maps = np.stack([_ridge(w, h, rows1), _ridge(w, h, rows2)])
    truths = np.stack([rows1, rows2]).astype(np.float64)
    truths[0, 3] = np.nan
    truths[1, 5] = 0
    gs = graph_search.create_graph_structure((w, h))
    preds, errors, norm = graph_search.segment_maps(maps, truths, gs)
    assert preds.dtype == np.uint16
    assert np.array_equal(preds[0], rows1) and np.array_equal(preds[1], rows2)
    assert np.isnan(errors[0, 3]) and np.isnan(errors[1, 5])
    assert np.nanmax(np.abs(errors)) == 0.0
    assert norm.max() <= 1.0

    overall = graph_search.calculate_overall_errors(errors)
    assert len(overall) == 4
    assert np.allclose(overall[0], 0.0)


def test_segment_maps_matches_oracle():
    rng = np.random.default_rng(1)
    w, h = 16, 12
    maps = (rng.random((3, w, h)) < 0.2).astype(np.uint8) * 255
    gs = graph_search.create_graph_structure((w, h))
    preds, _, _ = graph_search.segment_maps(maps, None, gs)
    for i in range(3):
        assert np.array_equal(preds[i], dijkstra_delineate(maps[i]))


def test_delineate_boundary_float_maps():
    rng = np.random.default_rng(2)
    w, h = 14, 10
    rows = np.clip(4 + np.cumsum(rng.integers(-1, 2, w)), 1, h - 2)
    m = _ridge(w, h, rows)
    gs = graph_search.create_graph_structure((w, h))
    delin = graph_search.delineate_boundary(m / 255.0, gs)
    assert np.array_equal(delin.astype(int), rows)


def test_run_dijkstras_api():
    w, h = 6, 5
    m = np.zeros((w, h))
    m[np.arange(w), 2] = 1.0
    padded = graph_search.append_firstlast_cols(m)
    assert padded.shape == (w + 2, h)
    gs = graph_search.create_graph_structure((w, h))
    paths = graph_search.run_dijkstras(padded, 0, gs)
    assert len(paths) == (w + 2) * h
    assert paths[0] == (0.0, 0)  # start node


def test_vertical_variant_runs():
    w, h = 8, 6
    rng = np.random.default_rng(3)
    rows = np.clip(3 + np.cumsum(rng.integers(-1, 2, w)), 1, h - 2)
    m = _ridge(w, h, rows) / 255.0
    gs = graph_search.create_graph_structure_vertical((w, h))
    delin = graph_search.delineate_boundary_vertical(m, gs)
    assert delin.shape == (w,)
    # vertical variant can average multiple visits; ridge still dominates
    assert np.abs(delin - rows).max() <= 1.0


def test_calc_errors_api():
    err = graph_search.calc_errors(np.array([4, 5]), np.array([np.nan, 3.0]))
    assert np.isnan(err[0]) and err[1] == 2.0


def test_segment_maps_warns_on_host_fallback(caplog):
    import logging

    w, h = 10, 8
    rng = np.random.default_rng(4)
    rows = np.clip(4 + np.cumsum(rng.integers(-1, 2, w)), 1, h - 2)
    m = _ridge(w, h, rows).astype(np.float64)  # non-uint8 → host Dijkstra
    gs = graph_search.create_graph_structure((w, h))
    with caplog.at_level(logging.WARNING, logger=graph_search.log.name):
        preds, _, _ = graph_search.segment_maps(m[None], None, gs)
    assert np.array_equal(preds[0].astype(int), rows)
    msgs = [r.getMessage() for r in caplog.records]
    assert any("host Dijkstra" in s and "non-uint8" in s for s in msgs)

    # uint8 standard maps take the device DP silently
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger=graph_search.log.name):
        graph_search.segment_maps(m[None].astype(np.uint8), None, gs)
    assert not any("host Dijkstra" in r.getMessage() for r in caplog.records)
