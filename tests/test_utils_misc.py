"""Coverage for the small leaf utilities (the PARITY rows without suites):
ds_utils, Timer, visualization box drawing, and the mcg_munge relayout."""

import os

import numpy as np
import pytest


def test_ds_utils_roundtrip_and_filters():
    from tf_faster_rcnn_tpu.datasets.ds_utils import (
        filter_small_boxes, unique_boxes, validate_boxes, xywh_to_xyxy,
        xyxy_to_xywh)
    xyxy = np.array([[10, 20, 30, 50], [0, 0, 4, 4], [10, 20, 30, 50]],
                    np.float64)
    # unique_boxes collapses the duplicate row, keeps first occurrences
    keep = unique_boxes(xyxy)
    assert sorted(keep.tolist()) == [0, 1]
    # xywh <-> xyxy round-trips with the +1 width convention
    xywh = xyxy_to_xywh(xyxy)
    np.testing.assert_array_equal(xywh[0], [10, 20, 21, 31])
    np.testing.assert_array_equal(xywh_to_xyxy(xywh), xyxy)
    validate_boxes(xyxy, width=100, height=100)
    with pytest.raises(AssertionError):
        validate_boxes(np.array([[5, 5, 120, 10]]), width=100, height=100)
    # strict-> on height, >= on width (reference filter semantics)
    assert filter_small_boxes(xyxy, min_size=5).tolist() == [0, 2]


def test_timer_tic_toc_accumulates():
    from tf_faster_rcnn_tpu.utils.timer import Timer
    t = Timer()
    t.tic()
    d1 = t.toc(average=False)
    t.tic()
    avg = t.toc(average=True)
    assert t.calls == 2
    assert d1 >= 0.0 and avg >= 0.0
    assert abs(t.total_time - (t.average_time * t.calls)) < 1e-9


def test_visualization_draws_boxes():
    from tf_faster_rcnn_tpu.utils.visualization import draw_bounding_boxes
    img = np.zeros((64, 80, 3), np.uint8)
    gt = np.array([[10, 10, 40, 40, 5], [20, 15, 60, 50, 12]], np.float32)
    out = draw_bounding_boxes(img.copy(), gt, im_info=(64, 80, 1.0))
    assert out.shape == img.shape
    assert (np.asarray(out) != img).any()  # something was drawn


def test_mcg_munge_relayout(tmp_path, monkeypatch):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "mcg_munge", os.path.join(os.path.dirname(__file__), os.pardir,
                                  "tools", "mcg_munge.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    src = tmp_path / "flat"
    src.mkdir()
    (src / "COCO_val2014_000000193401.mat").write_bytes(b"x")
    (src / "notes.txt").write_bytes(b"skip me")
    monkeypatch.chdir(tmp_path)
    mod.munge(str(src))
    moved = (tmp_path / "MCG" / "mat" / "COCO_val2014_0" /
             "COCO_val2014_000000193" / "COCO_val2014_000000193401.mat")
    assert moved.is_file()
    assert (src / "notes.txt").is_file()  # non-.mat untouched
