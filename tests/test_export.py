"""Serving export (utils/serving.py): StableHLO artifacts round-trip and
reproduce the live detect program exactly. No reference counterpart — the
reference serves from a live TF session (lib/model/test.py)."""

import dataclasses
import json
import os

import jax
import numpy as np
import pytest

from tf_faster_rcnn_tpu.config import canvas_buckets, cfg
from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg
from tf_faster_rcnn_tpu.utils.serving import (MANIFEST, export_detect,
                                              load_detect)

BATCH = 2


@pytest.fixture
def tiny_test_cfg():
    cfg.TEST.SCALES = (64,)
    cfg.TEST.MAX_SIZE = 96
    cfg.TEST.RPN_PRE_NMS_TOP_N = 256
    cfg.TEST.RPN_POST_NMS_TOP_N = 16
    cfg.ANCHOR_SCALES = [2, 4]
    yield


def _tiny_model():
    spec = dataclasses.replace(
        spec_from_cfg("mobile", 6, "TEST"),
        anchor_scales=(2, 4), rpn_pre_nms_top_n=256, rpn_post_nms_top_n=16)
    model = FasterRCNN(spec)
    h, w = canvas_buckets(cfg.TEST)[0]
    img = np.zeros((1, h, w, 3), np.float32)
    info = np.array([[h, w, 1.0]], np.float32)
    params = model.init(jax.random.PRNGKey(0), img, info)
    return model, spec, params


def test_export_roundtrip_matches_live(tiny_test_cfg, tmp_path, rng):
    model, spec, params = _tiny_model()
    out = str(tmp_path / "exported")
    manifest = export_detect(model, spec, params, out, BATCH,
                             max_per_image=10)

    # two orientation buckets at these settings, all files on disk
    assert [tuple(e["canvas"]) for e in manifest["artifacts"]] == \
        list(canvas_buckets(cfg.TEST))
    for e in manifest["artifacts"]:
        assert os.path.getsize(os.path.join(out, e["file"])) > 0

    loaded_manifest, fns = load_detect(out)
    assert loaded_manifest["num_classes"] == 6
    assert loaded_manifest["batch"] == BATCH

    from tf_faster_rcnn_tpu.engine.test_engine import make_detect_fn
    live = make_detect_fn(model, spec, 10)
    for e in manifest["artifacts"]:
        h, w = e["canvas"]
        image = rng.randn(*e["image_shape"]).astype(
            manifest["transfer_dtype"]) * 30.0
        im_info = np.tile(np.array([[h - 8.0, w - 8.0, 1.25]], np.float32),
                          (BATCH, 1))
        orig_hw = im_info[:, :2] / im_info[:, 2:]
        got = fns[(h, w)](image, im_info, orig_hw)
        want = live(params, image, im_info, orig_hw)
        for g, v in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(v))


def test_export_artifact_is_self_contained(tiny_test_cfg, tmp_path, rng):
    """The artifact must run without the model code or params: reload in a
    state where cfg has been changed arbitrarily and compare against
    captured outputs."""
    model, spec, params = _tiny_model()
    out = str(tmp_path / "exported")
    manifest = export_detect(model, spec, params, out, BATCH,
                             max_per_image=10)
    e = manifest["artifacts"][0]
    image = rng.randn(*e["image_shape"]).astype(np.float32) * 30.0
    h, w = e["canvas"]
    im_info = np.tile(np.array([[h - 8.0, w - 8.0, 1.25]], np.float32),
                      (BATCH, 1))
    orig_hw = im_info[:, :2] / im_info[:, 2:]

    from tf_faster_rcnn_tpu.engine.test_engine import make_detect_fn
    want = [np.asarray(x) for x in
            make_detect_fn(model, spec, 10)(params, image, im_info, orig_hw)]

    # config drift after export must not affect the loaded artifact
    cfg.TEST.NMS = 0.99
    cfg.TPU.MAX_PER_IMAGE = 3
    _, fns = load_detect(out)
    got = fns[(h, w)](image, im_info, orig_hw)
    for g, v in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), v)


def test_serve_cli_runs_from_bundle_alone(tiny_test_cfg, tmp_path, rng):
    """tools/serve.py detects on real image files using only the bundle
    (manifest-driven prep, per-bucket batching, JSON output)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import cv2
    import serve

    model, spec, params = _tiny_model()
    out = str(tmp_path / "exported")
    export_detect(model, spec, params, out, BATCH, max_per_image=10)

    paths = []
    for i, hw in enumerate([(80, 120), (120, 80), (90, 110)]):  # mixed orient
        p = str(tmp_path / f"im{i}.jpg")
        cv2.imwrite(p, rng.randint(0, 255, (*hw, 3)).astype(np.uint8))
        paths.append(p)
    out_json = str(tmp_path / "dets.json")
    serve.main(["--bundle", out, "--thresh", "0.0", "--json", out_json]
               + paths)
    dets = json.loads(open(out_json).read())
    assert set(dets) == set(paths)
    for rows in dets.values():
        assert rows and all(len(r) == 6 for r in rows)


def test_load_rejects_foreign_dir(tmp_path):
    bad = tmp_path / "not_an_export"
    bad.mkdir()
    (bad / MANIFEST).write_text(json.dumps({"format": "something/else"}))
    with pytest.raises(ValueError, match="not a detect export"):
        load_detect(str(bad))
