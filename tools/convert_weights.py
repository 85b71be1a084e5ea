#!/usr/bin/env python
"""Convert external checkpoints into this framework's params format.

The reference ships tools/convert_from_depre.py to migrate old-generation
snapshots via variable-name mapping (convert_names,
/root/reference/tools/convert_from_depre.py:105-173). The equivalent
migration here accepts, as --src:

* a real TF ``.ckpt`` TensorBundle prefix (the reference's snapshot format
  and its released models, fetch_faster_rcnn_models.sh) — read natively by
  utils/tf_bundle.py, no TensorFlow needed;
* a slim/TF variable dict (.npz or pickle of name->ndarray).

Either is mapped through the surgery rules in utils/slim_import.py and
written as a params msgpack that tools/{test_net,demo}.py consume directly.
See RUNBOOK.md for the end-to-end released-model recipe.
"""

import argparse

import _init_paths  # noqa: F401
import numpy as np

from tf_faster_rcnn_tpu.config import canvas_hw, cfg, cfg_from_file, cfg_from_list


def main():
    parser = argparse.ArgumentParser(
        description='Convert slim/TF var-dict weights to params msgpack')
    parser.add_argument('--net', required=True,
                        choices=('vgg16', 'res50', 'res101', 'res152',
                                 'mobile'))
    parser.add_argument('--src', required=True,
                        help='TF .ckpt prefix, or slim var dict (.npz/.pkl)')
    parser.add_argument('--dst', required=True, help='output .msgpack')
    parser.add_argument('--num-classes', type=int, default=21)
    parser.add_argument('--cfg', dest='cfg_file', default=None)
    parser.add_argument('--set', dest='set_cfgs', default=None,
                        nargs=argparse.REMAINDER)
    args = parser.parse_args()

    if args.cfg_file:
        cfg_from_file(args.cfg_file)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs)

    import jax
    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg
    from tf_faster_rcnn_tpu.utils.checkpoint import save_params
    from tf_faster_rcnn_tpu.utils.slim_import import load_pretrained_into

    spec = spec_from_cfg(args.net, args.num_classes, 'TEST')
    model = FasterRCNN(spec)
    ch, cw = canvas_hw(cfg.TEST)
    from tf_faster_rcnn_tpu.data.blob import batch_image_shape
    params = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.RNG_SEED),
        np.zeros(batch_image_shape(1, (ch, cw))[0], np.float32),
        np.array([[ch, cw, 1.0]], np.float32))
    params = load_pretrained_into(params, args.src, args.net)
    save_params(args.dst, params)
    print(f'Wrote {args.dst}')


if __name__ == '__main__':
    main()
