#!/usr/bin/env python
"""Test a Faster R-CNN network on an image database.

CLI parity with /root/reference/tools/test_net.py:23-122: --cfg --model
--imdb --comp --num_dets --tag --net --set. --model points at a params
msgpack (from training snapshots or save_params) or a slim var-dict
.npz/.pkl to convert on the fly.
"""

import argparse
import pprint
import sys

import _init_paths  # noqa: F401
import numpy as np

from tf_faster_rcnn_tpu.config import cfg, cfg_from_file, cfg_from_list
from tf_faster_rcnn_tpu.datasets.factory import get_imdb
from tf_faster_rcnn_tpu.engine.test_engine import test_net
from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg

NETS = ('vgg16', 'res50', 'res101', 'res152', 'mobile')


def parse_args():
    parser = argparse.ArgumentParser(description='Test a Faster R-CNN network')
    parser.add_argument('--cfg', dest='cfg_file', default=None)
    parser.add_argument('--model', dest='model', default=None,
                        help='model params to test (.msgpack params or slim '
                             'var dict .npz/.pkl)')
    parser.add_argument('--imdb', dest='imdb_name', default='voc_2007_test')
    parser.add_argument('--comp', dest='comp_mode', action='store_true',
                        help='competition mode')
    parser.add_argument('--num_dets', dest='max_per_image', default=100,
                        type=int, help='max number of detections per image')
    parser.add_argument('--tag', dest='tag', default='')
    parser.add_argument('--net', dest='net', default='res50', choices=NETS)
    parser.add_argument('--devices', dest='devices', default=1, type=int,
                        help='data-parallel devices for evaluation '
                             '(0 = all available)')
    parser.add_argument('--coordinator', dest='coordinator', default=None,
                        help='multi-host eval: coordinator host:port '
                             '(or env FRCNN_COORDINATOR)')
    parser.add_argument('--num-procs', dest='num_procs', default=None,
                        type=int, help='multi-host: total process count')
    parser.add_argument('--proc-id', dest='proc_id', default=None, type=int,
                        help='multi-host: this process id')
    parser.add_argument('--set', dest='set_cfgs', default=None,
                        nargs=argparse.REMAINDER)
    if len(sys.argv) == 1:
        parser.print_help()
        sys.exit(1)
    return parser.parse_args()


def load_model_params(model_path, model, spec, net, canvas):
    import jax
    from tf_faster_rcnn_tpu.data.blob import batch_image_shape
    dummy = np.zeros(batch_image_shape(1, canvas)[0], np.float32)
    info = np.array([[canvas[0], canvas[1], 1.0]], np.float32)
    params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), dummy, info))
    params = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), params)
    if model_path is None:
        print('No model given, testing with random initialization '
              '(reference behavior, test_net.py:116-118)')
        import jax.random as jr
        return jax.jit(model.init)(jr.PRNGKey(cfg.RNG_SEED), dummy, info)
    if model_path.endswith('.msgpack'):
        # handles both bare save_params exports and training snapshots
        from tf_faster_rcnn_tpu.utils.checkpoint import load_params
        return load_params(model_path, params)
    from tf_faster_rcnn_tpu.utils.slim_import import load_pretrained_into
    return load_pretrained_into(params, model_path, net)


def main():
    args = parse_args()
    from tf_faster_rcnn_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()
    print('Called with args:')
    print(args)

    if args.cfg_file is not None:
        cfg_from_file(args.cfg_file)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs)

    # multi-host bring-up must precede any other jax use; each process then
    # detects its stripe of the batch schedule on its LOCAL devices and the
    # coordinator merges/evaluates (engine/test_engine.py)
    from tf_faster_rcnn_tpu.parallel import dist
    dist.initialize(coordinator_address=args.coordinator,
                    num_processes=args.num_procs, process_id=args.proc_id)

    print('Using config:')
    pprint.pprint(cfg)

    imdb = get_imdb(args.imdb_name)
    imdb.competition_mode(args.comp_mode)

    from tf_faster_rcnn_tpu.config import canvas_buckets
    spec = spec_from_cfg(args.net, imdb.num_classes, 'TEST')
    model = FasterRCNN(spec)
    params = load_model_params(args.model, model, spec, args.net,
                               canvas_buckets(cfg.TEST)[0])

    mesh = None
    n_model = max(1, int(cfg.TPU.MODEL_DEVICES))
    if args.devices != 1 or n_model > 1:
        import jax
        from tf_faster_rcnn_tpu.parallel.mesh import make_hybrid_mesh
        if jax.process_count() > 1:
            # eval needs no cross-host collectives: shard each process's
            # stripe over its own local devices only
            local = jax.local_devices()
            n = min(args.devices or len(local), len(local))
            mesh = (make_hybrid_mesh(data=max(1, n // n_model),
                                     model=n_model, devices=local[:n])
                    if n > 1 else None)
        else:
            n = args.devices or len(jax.devices())
            mesh = (make_hybrid_mesh(data=max(1, n // n_model),
                                     model=n_model) if n > 1 else None)
        if mesh is not None:
            layout = (f'{n // n_model} data x {n_model} model'
                      if n_model > 1 else 'data-parallel')
            print(f'Evaluating {layout} over {n} devices')

    filename = (args.model or 'random').split('/')[-1] + args.tag
    test_net(model, spec, params, imdb, filename,
             max_per_image=args.max_per_image, mesh=mesh)


if __name__ == '__main__':
    main()
