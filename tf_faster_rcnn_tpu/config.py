"""Config system.

Reproduces the key names, defaults, and YAML/CLI override semantics of the
reference config (see /root/reference/lib/model/config.py:19-290 for the key
inventory and :325-387 for the merge rules) so that the reference's
``experiments/cfgs/*.yml`` files and ``--set KEY.SUBKEY value`` overrides load
identically.

Design difference vs the reference: the reference mutates a global easydict
that the TF graph reads at build time.  Here the global ``cfg`` is still the
single source of truth for CLIs and YAML merging (same ergonomics), but the
jitted model programs never read it at trace time — model constructors
snapshot the relevant values into static module attributes, keeping the XLA
programs pure functions of (params, batch).
"""

from __future__ import annotations

import os
import os.path as osp
from ast import literal_eval

import numpy as np

__all__ = [
    "AttrDict", "cfg", "cfg_from_file", "cfg_from_list", "reset_cfg",
    "get_output_dir", "get_output_tb_dir", "canvas_hw", "canvas_buckets",
    "bucket_index", "mixed_canvas",
]


class AttrDict(dict):
    """dict with attribute access (stand-in for easydict, which is not vendored)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def __deepcopy__(self, memo):
        import copy
        out = AttrDict()
        for k, v in self.items():
            out[k] = copy.deepcopy(v, memo)
        return out


def _default_cfg() -> AttrDict:
    """Build the default config tree.

    Key-for-key parity with the reference defaults
    (/root/reference/lib/model/config.py:19-290).
    """
    C = AttrDict()

    # Training options
    C.TRAIN = AttrDict()
    C.TRAIN.LEARNING_RATE = 0.001
    C.TRAIN.MOMENTUM = 0.9
    C.TRAIN.WEIGHT_DECAY = 0.0001
    C.TRAIN.GAMMA = 0.1
    C.TRAIN.STEPSIZE = [30000]
    C.TRAIN.DISPLAY = 10
    C.TRAIN.DOUBLE_BIAS = True
    C.TRAIN.TRUNCATED = False
    C.TRAIN.BIAS_DECAY = False
    C.TRAIN.USE_GT = False
    C.TRAIN.ASPECT_GROUPING = False
    C.TRAIN.SNAPSHOT_KEPT = 3
    C.TRAIN.SUMMARY_INTERVAL = 180
    C.TRAIN.SCALES = (600,)
    C.TRAIN.MAX_SIZE = 1000
    C.TRAIN.IMS_PER_BATCH = 1
    C.TRAIN.BATCH_SIZE = 128
    C.TRAIN.FG_FRACTION = 0.25
    C.TRAIN.FG_THRESH = 0.5
    C.TRAIN.BG_THRESH_HI = 0.5
    C.TRAIN.BG_THRESH_LO = 0.1
    C.TRAIN.USE_FLIPPED = True
    C.TRAIN.BBOX_REG = True
    C.TRAIN.BBOX_THRESH = 0.5
    C.TRAIN.SNAPSHOT_ITERS = 5000
    C.TRAIN.SNAPSHOT_PREFIX = 'res101_faster_rcnn'
    C.TRAIN.BBOX_NORMALIZE_TARGETS = True
    C.TRAIN.BBOX_INSIDE_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
    C.TRAIN.BBOX_NORMALIZE_TARGETS_PRECOMPUTED = True
    C.TRAIN.BBOX_NORMALIZE_MEANS = (0.0, 0.0, 0.0, 0.0)
    C.TRAIN.BBOX_NORMALIZE_STDS = (0.1, 0.1, 0.2, 0.2)
    C.TRAIN.PROPOSAL_METHOD = 'gt'
    C.TRAIN.HAS_RPN = True
    C.TRAIN.RPN_POSITIVE_OVERLAP = 0.7
    C.TRAIN.RPN_NEGATIVE_OVERLAP = 0.3
    C.TRAIN.RPN_CLOBBER_POSITIVES = False
    C.TRAIN.RPN_FG_FRACTION = 0.5
    C.TRAIN.RPN_BATCHSIZE = 256
    C.TRAIN.RPN_NMS_THRESH = 0.7
    C.TRAIN.RPN_PRE_NMS_TOP_N = 12000
    C.TRAIN.RPN_POST_NMS_TOP_N = 2000
    C.TRAIN.RPN_BBOX_INSIDE_WEIGHTS = (1.0, 1.0, 1.0, 1.0)
    C.TRAIN.RPN_POSITIVE_WEIGHT = -1.0
    C.TRAIN.USE_ALL_GT = True

    # Testing options
    C.TEST = AttrDict()
    C.TEST.SCALES = (600,)
    C.TEST.MAX_SIZE = 1000
    C.TEST.NMS = 0.3
    C.TEST.SVM = False
    C.TEST.BBOX_REG = True
    C.TEST.HAS_RPN = False
    C.TEST.PROPOSAL_METHOD = 'gt'
    C.TEST.RPN_NMS_THRESH = 0.7
    C.TEST.RPN_PRE_NMS_TOP_N = 6000
    C.TEST.RPN_POST_NMS_TOP_N = 300
    C.TEST.MODE = 'nms'
    C.TEST.RPN_TOP_N = 5000

    # ResNet options
    C.RESNET = AttrDict()
    C.RESNET.MAX_POOL = False
    C.RESNET.FIXED_BLOCKS = 1

    # MobileNet options
    C.MOBILENET = AttrDict()
    C.MOBILENET.REGU_DEPTH = False
    C.MOBILENET.FIXED_LAYERS = 5
    C.MOBILENET.WEIGHT_DECAY = 0.00004
    C.MOBILENET.DEPTH_MULTIPLIER = 1.

    # MISC
    C.PIXEL_MEANS = np.array([[[102.9801, 115.9465, 122.7717]]])
    C.RNG_SEED = 3
    C.ROOT_DIR = osp.abspath(osp.join(osp.dirname(__file__), '..'))
    C.DATA_DIR = osp.abspath(osp.join(C.ROOT_DIR, 'data'))
    C.MATLAB = 'matlab'
    C.EXP_DIR = 'default'
    C.USE_GPU_NMS = True     # accepted for YAML compat; NMS runs on-device (TPU)
    C.USE_E2E_TF = True      # accepted for YAML compat; everything is in-graph here
    C.POOLING_MODE = 'crop'
    C.POOLING_SIZE = 7
    C.ANCHOR_SCALES = [8, 16, 32]
    C.ANCHOR_RATIOS = [0.5, 1, 2]
    C.RPN_CHANNELS = 512

    # --- TPU-native additions (no reference counterpart) ---
    C.TPU = AttrDict()
    # Padded input canvas (H, W). Images are resized per SCALES/MAX_SIZE and
    # zero-padded to this static shape so the program compiles once.
    # 0 means "derive from MAX_SIZE rounded up to a multiple of 32".
    C.TPU.CANVAS_SIZE = [0, 0]
    # Max ground-truth boxes per image after padding (mask-carried).
    C.TPU.MAX_GT = 100
    # Orientation bucketing: compile one program per (landscape, portrait)
    # canvas instead of a single square MAX_SIZE^2 canvas, batching images
    # by orientation. The reference pads each blob only to its own per-image
    # size (lib/utils/blob.py:17-30); two orientation buckets recover most
    # of that padding waste (up to ~40% of pixels on mixed-orientation sets)
    # at the cost of one extra compile. Ignored when TPU.CANVAS_SIZE pins an
    # explicit single canvas.
    C.TPU.BUCKETING = True
    # Host threads decoding/resizing eval batches ahead of the device
    # (engine/test_engine.py); cv2 releases the GIL so threads scale on a
    # many-core TPU-VM. The consumption window is threads + 2 batches.
    C.TPU.EVAL_PREFETCH_THREADS = 4
    # Cap on boxes entering RPN NMS (sorted by score). The reference E2E path
    # has no pre-NMS cap (lib/layer_utils/proposal_layer.py:72); a static cap
    # is required for fixed shapes. 0 = use RPN_PRE_NMS_TOP_N.
    C.TPU.RPN_NMS_CAP = 0
    # Images per device in a batch (data parallel).
    C.TPU.IMS_PER_DEVICE = 1
    # Hybrid parallelism: devices per model-parallel group. 1 = pure data
    # parallelism. > 1 builds a ('data','model') mesh (total devices =
    # data * MODEL_DEVICES) where each model group cooperates on the SAME
    # images: Megatron TP of the RoI head plus (SPATIAL_PARTITION) spatial
    # partitioning of the backbone canvas — the scaling path once DP's
    # per-device batch hits 1 image. See parallel/mesh.py.
    C.TPU.MODEL_DEVICES = 1
    # With MODEL_DEVICES > 1: also shard the image canvas's H dim over the
    # model axis so the conv backbone splits spatially (GSPMD inserts the
    # 3x3 halo exchanges). Single-process meshes only.
    C.TPU.SPATIAL_PARTITION = True
    # Compute dtype for conv/matmul ('bfloat16' or 'float32').
    C.TPU.COMPUTE_DTYPE = 'float32'
    # Max detections per image in the fixed-shape output (reference
    # max_per_image, lib/model/test.py:145).
    C.TPU.MAX_PER_IMAGE = 100
    # Use the Pallas NMS kernel when on TPU (fallback: pure-jnp block NMS).
    C.TPU.USE_PALLAS_NMS = True
    # Space-to-depth ResNet stem (exact transform; conv1 kernel becomes
    # [4,4,12,64] and imports via s2d_conv1_kernel). The batch builders ship
    # [B, H/2, W/2, 12] canvases transformed on the host image pool; the
    # on-device relayout costs more than the fast stem saves, host-side it
    # is a measured win (184 -> 190.6 img/s/chip detect on v5e). Off by
    # default for input-layout compatibility; bench.py enables it.
    C.TPU.SPACE_TO_DEPTH = False
    # Parameter/momentum dtype ('float32' or 'bfloat16'). bfloat16 halves
    # the state memory but loses update bits below ~1/256 of the parameter
    # magnitude (no loss scaling is applied); see ROADMAP's study before
    # using for long schedules.
    C.TPU.PARAM_DTYPE = 'float32'
    # Host-side minibatch prefetch depth (0 = synchronous, like the
    # reference; its USE_PREFETCH comment was never implemented).
    C.TPU.PREFETCH = 2
    # Directory for jax.profiler traces of the train step (empty = off).
    C.TPU.PROFILE_DIR = ''
    # Snapshot format: 'msgpack' (single flat file, default) or 'orbax'
    # (directory-per-snapshot, sharded/async-capable for very large runs).
    C.TPU.CHECKPOINT_BACKEND = 'msgpack'
    # Run a full validation-mAP eval (TEST-mode engine on --imdbval) every N
    # training images; 0 = off. No reference counterpart (it summarizes val
    # LOSSES only, train_val.py:198-210). Coordinator-only; skipped in
    # multi-host runs (evaluate snapshots offline there).
    C.TPU.EVAL_ITERS = 0
    # Orbax-only: return from snapshot() as soon as device arrays are copied
    # to host and commit to disk in the background (the step loop never
    # stalls on checkpoint IO). The train loop flushes in-flight saves
    # before exiting (utils/checkpoint.wait_for_async).
    C.TPU.ASYNC_CHECKPOINT = False
    # Multi-host runs take summaries every N iterations instead of the
    # wall-clock TRAIN.SUMMARY_INTERVAL (host clocks would desynchronize the
    # collective val-loss forward and deadlock).
    C.TPU.SUMMARY_ITERS = 500
    # Batched-recipe mapping. The reference schedules (ITERS/STEPSIZE tables
    # in experiments/scripts/train_faster_rcnn.sh:18-44) assume ONE image
    # per step. With a global batch B = IMS_PER_DEVICE x n_devices, the
    # linear-scaling rule (Goyal et al. 2017, arXiv:1706.02677) keeps the
    # recipe equivalent: LR x B with a linear warmup, iteration counts / B
    # (same total image budget and epochs, same LR-vs-epoch curve).
    # --iters and TRAIN.STEPSIZE therefore always stay in REFERENCE units
    # (images); the engine rescales them internally when this is on.
    C.TPU.AUTO_SCALE_SCHEDULE = True
    # Warmup length in reference units (images); /B batched steps. 0 = off.
    C.TPU.WARMUP_ITERS = 500
    # LR starts at WARMUP_FACTOR x scaled LR and ramps linearly to 1x.
    C.TPU.WARMUP_FACTOR = 1.0 / 3.0
    # On-device failure detection (absent in the reference — NaN blowups are
    # a README pointer there): skip the params/momentum update whenever the
    # loss or any gradient is non-finite; the train loop aborts after
    # NAN_GUARD_PATIENCE consecutive skipped steps (0 = never abort).
    C.TPU.NAN_GUARD = True
    C.TPU.NAN_GUARD_PATIENCE = 50

    return C


cfg = _default_cfg()


def reset_cfg():
    """Restore cfg to defaults in place (used by tests)."""
    fresh = _default_cfg()
    cfg.clear()
    cfg.update(fresh)


# Keys kept for YAML compatibility that no code path reads — the reference
# inherited them from py-faster-rcnn and never reads them either (verified
# by grep over /root/reference/lib + tools; e.g. TRAIN.BBOX_REG appears only
# in lib/model/config.py:46). Overriding one gets a loud warning instead of
# a silent no-op. tests/test_config_coverage.py enforces that every other
# key IS read somewhere.
VESTIGIAL_KEYS = {
    'TRAIN.BBOX_REG',            # box head + its loss are always built
    'TRAIN.BBOX_THRESH',         # roidb-era fg threshold for bbox targets
    'TRAIN.BBOX_NORMALIZE_TARGETS',  # only *_PRECOMPUTED is consulted
    'TRAIN.HAS_RPN',             # RPN is structural in the e2e model
    'TEST.HAS_RPN',              # idem (demo.py sets it; nothing reads it)
    'TEST.SVM',                  # R-CNN-era SVM head never existed here
    'TEST.PROPOSAL_METHOD',      # external-proposal eval era
}

# Keys the reference DOES honor as implementation-path switches, whose
# behavior is structural in the TPU build (there is only one path):
STRUCTURAL_KEYS = {
    'USE_E2E_TF': 'the whole pipeline is always in-graph (one XLA program)',
    'USE_GPU_NMS': 'device NMS is governed by TPU.USE_PALLAS_NMS',
}


def _warn_if_vestigial(dotted_key):
    if dotted_key in VESTIGIAL_KEYS:
        print(f'[config] WARNING: {dotted_key} is accepted for reference '
              f'YAML compatibility but no code path reads it '
              f'(the reference ignores it too)')
    elif dotted_key in STRUCTURAL_KEYS:
        print(f'[config] WARNING: {dotted_key} has no effect here: '
              f'{STRUCTURAL_KEYS[dotted_key]}')


def _merge_a_into_b(a, b, path=""):
    """Recursive type-checked merge of dict a into AttrDict b.

    Same semantics as the reference merge (config.py:325-355): unknown keys
    raise KeyError; type mismatches raise ValueError, except values merged
    into an ndarray are coerced to that ndarray's dtype.
    """
    if not isinstance(a, dict):
        return
    for k, v in a.items():
        if k not in b:
            raise KeyError('{} is not a valid config key'.format(k))
        old_type = type(b[k])
        if old_type is not type(v):
            if isinstance(b[k], np.ndarray):
                v = np.array(v, dtype=b[k].dtype)
            elif isinstance(b[k], tuple) and isinstance(v, list):
                # YAML has no tuple literal; the reference's own yml files use
                # lists for tuple-typed keys (e.g. res101-lg.yml SCALES)
                v = tuple(v)
            elif isinstance(b[k], float) and isinstance(v, int):
                v = float(v)
            elif isinstance(b[k], dict) and isinstance(v, dict):
                pass  # plain-dict vs AttrDict: recurse below
            else:
                raise ValueError(
                    'Type mismatch ({} vs. {}) for config key: {}{}'.format(
                        type(b[k]), type(v), path, k))
        if isinstance(v, dict) and isinstance(b[k], dict):
            try:
                _merge_a_into_b(v, b[k], path + k + ".")
            except Exception:
                print('Error under config key: {}{}'.format(path, k))
                raise
        else:
            _warn_if_vestigial(path + k)
            b[k] = v


def cfg_from_file(filename):
    """Load a YAML config file and merge it into the default options."""
    import yaml
    with open(filename, 'r') as f:
        yaml_cfg = yaml.safe_load(f)
    if yaml_cfg is not None:
        _merge_a_into_b(yaml_cfg, cfg)


def cfg_from_list(cfg_list):
    """Set config keys via a flat ['KEY.SUBKEY', 'value', ...] list."""
    assert len(cfg_list) % 2 == 0
    for k, v in zip(cfg_list[0::2], cfg_list[1::2]):
        key_list = k.split('.')
        d = cfg
        for subkey in key_list[:-1]:
            assert subkey in d, 'invalid config key {}'.format(k)
            d = d[subkey]
        subkey = key_list[-1]
        assert subkey in d, 'invalid config key {}'.format(k)
        try:
            value = literal_eval(v)
        except Exception:
            value = v
        assert type(value) == type(d[subkey]), (
            'type {} does not match original type {}'.format(
                type(value), type(d[subkey])))
        _warn_if_vestigial(k)
        d[subkey] = value


def get_output_dir(imdb, weights_filename):
    """Canonical experiment-artifact directory (created on demand)."""
    outdir = osp.abspath(osp.join(cfg.ROOT_DIR, 'output', cfg.EXP_DIR, imdb.name))
    if weights_filename is None:
        weights_filename = 'default'
    outdir = osp.join(outdir, weights_filename)
    os.makedirs(outdir, exist_ok=True)
    return outdir


def get_output_tb_dir(imdb, weights_filename):
    """Canonical metrics/summary directory (created on demand)."""
    outdir = osp.abspath(osp.join(cfg.ROOT_DIR, 'tensorboard', cfg.EXP_DIR, imdb.name))
    if weights_filename is None:
        weights_filename = 'default'
    outdir = osp.join(outdir, weights_filename)
    os.makedirs(outdir, exist_ok=True)
    return outdir


def canvas_hw(phase_cfg) -> tuple:
    """Static (H, W) input canvas for a train/test phase.

    Derived from MAX_SIZE rounded up to a multiple of 32 unless explicitly
    set via TPU.CANVAS_SIZE. A multiple of 32 keeps every backbone stage's
    spatial dims integral and the stride-16 feature map exactly H/16 x W/16.
    """
    h, w = cfg.TPU.CANVAS_SIZE
    if h and w:
        return int(h), int(w)
    m = int(np.ceil(phase_cfg.MAX_SIZE / 32.0) * 32)
    return m, m


def canvas_buckets(phase_cfg) -> tuple:
    """Static input canvases for a train/test phase, one per bucket.

    After shortest-side resize to a SCALES target capped by MAX_SIZE
    (data/blob.py::prep_im_for_blob, reference lib/utils/blob.py:33-47), an
    image's short side is <= max(SCALES) and its long side <= MAX_SIZE. So a
    landscape image (w >= h) always fits (ceil32(max(SCALES)),
    ceil32(MAX_SIZE)) and a portrait one the transpose — two buckets cover
    every input with far less padding than the square MAX_SIZE^2 fallback
    (e.g. VOC: 608x1024/1024x608 vs 1024x1024).

    Returns ((H, W), ...), landscape first. Collapses to a single canvas
    when TPU.CANVAS_SIZE pins one, TPU.BUCKETING is off, or the two buckets
    would coincide (SCALES >= MAX_SIZE).
    """
    h, w = cfg.TPU.CANVAS_SIZE
    if h and w:
        return ((int(h), int(w)),)
    if not cfg.TPU.BUCKETING:
        return (canvas_hw(phase_cfg),)
    s = int(np.ceil(max(phase_cfg.SCALES) / 32.0) * 32)
    m = int(np.ceil(phase_cfg.MAX_SIZE / 32.0) * 32)
    if s >= m:
        return ((m, m),)
    return ((s, m), (m, s))


def bucket_index(im_h, im_w, buckets) -> int:
    """Bucket for an image of extent (im_h, im_w) — original or resized;
    orientation is scale-invariant. Landscape (w >= h) -> bucket 0."""
    if len(buckets) == 1:
        return 0
    return 0 if im_w >= im_h else 1


def mixed_canvas(buckets) -> tuple:
    """Smallest canvas fitting every bucket — the fallback for a batch that
    mixes orientations (train-time only; eval groups by bucket)."""
    return (max(b[0] for b in buckets), max(b[1] for b in buckets))
