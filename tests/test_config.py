"""Config-system parity: reference YAML files load identically, merge rules
match (SURVEY.md stage 1)."""

import glob
import os.path as osp

import numpy as np
import pytest

from tf_faster_rcnn_tpu.config import cfg, cfg_from_file, cfg_from_list

REF_CFGS = sorted(glob.glob("/root/reference/experiments/cfgs/*.yml"))
OWN_CFGS = sorted(glob.glob(
    osp.join(osp.dirname(__file__), "..", "experiments", "cfgs", "*.yml")))


def test_defaults_match_reference_key_inventory():
    # spot-check the semantically load-bearing defaults
    assert cfg.TRAIN.LEARNING_RATE == 0.001
    assert cfg.TRAIN.STEPSIZE == [30000]
    assert cfg.TRAIN.RPN_BATCHSIZE == 256
    assert cfg.TRAIN.RPN_PRE_NMS_TOP_N == 12000
    assert cfg.TRAIN.RPN_POST_NMS_TOP_N == 2000
    assert cfg.TEST.RPN_POST_NMS_TOP_N == 300
    assert cfg.TEST.NMS == 0.3
    assert cfg.TRAIN.BBOX_NORMALIZE_STDS == (0.1, 0.1, 0.2, 0.2)
    assert cfg.POOLING_SIZE == 7
    assert cfg.ANCHOR_SCALES == [8, 16, 32]
    assert cfg.RPN_CHANNELS == 512
    assert np.allclose(cfg.PIXEL_MEANS, [[[102.9801, 115.9465, 122.7717]]])


@pytest.mark.parametrize("path", REF_CFGS, ids=[osp.basename(p) for p in REF_CFGS])
def test_reference_yaml_files_load(path):
    cfg_from_file(path)
    # every reference yml overrides TRAIN; verify one known override applied
    if "vgg16" in path:
        assert cfg.TRAIN.BATCH_SIZE == 256
        assert cfg.TRAIN.DOUBLE_BIAS is True
    if "res101-lg" in path:
        assert cfg.TRAIN.MAX_SIZE == 1333
        assert cfg.ANCHOR_SCALES == [2, 4, 8, 16, 32]
        assert cfg.TEST.RPN_POST_NMS_TOP_N == 1000


@pytest.mark.parametrize("path", OWN_CFGS, ids=[osp.basename(p) for p in OWN_CFGS])
def test_own_yaml_files_load(path):
    cfg_from_file(path)


def test_cfg_from_list_dotted_overrides():
    cfg_from_list(["TRAIN.LEARNING_RATE", "0.01",
                   "ANCHOR_SCALES", "[4,8,16,32]",
                   "TRAIN.SNAPSHOT_PREFIX", "vgg16_faster_rcnn"])
    assert cfg.TRAIN.LEARNING_RATE == 0.01
    assert cfg.ANCHOR_SCALES == [4, 8, 16, 32]
    assert cfg.TRAIN.SNAPSHOT_PREFIX == "vgg16_faster_rcnn"


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        from tf_faster_rcnn_tpu.config import _merge_a_into_b
        _merge_a_into_b({"NOT_A_KEY": 1}, cfg)


def test_type_mismatch_rejected():
    from tf_faster_rcnn_tpu.config import _merge_a_into_b
    with pytest.raises(ValueError):
        _merge_a_into_b({"TRAIN": {"LEARNING_RATE": "fast"}}, cfg)


def test_ndarray_coercion():
    from tf_faster_rcnn_tpu.config import _merge_a_into_b
    _merge_a_into_b({"PIXEL_MEANS": [[[1, 2, 3]]]}, cfg)
    assert isinstance(cfg.PIXEL_MEANS, np.ndarray)
    assert cfg.PIXEL_MEANS.dtype == np.float64
