#!/usr/bin/env python
"""Train a Faster R-CNN network on a region-of-interest database.

CLI parity with the reference tool (/root/reference/tools/trainval_net.py:
25-139): --cfg --weight --imdb --imdbval --iters --tag --net --set, with
'+'-joined imdb names for combined training sets. TPU addition: --devices
to train data-parallel over a mesh.
"""

import argparse
import pprint
import sys

import _init_paths  # noqa: F401
import numpy as np

from tf_faster_rcnn_tpu.config import (cfg, cfg_from_file, cfg_from_list,
                                       get_output_dir, get_output_tb_dir)
from tf_faster_rcnn_tpu.datasets.factory import get_imdb
from tf_faster_rcnn_tpu.engine.train_loop import get_training_roidb, train_net

NETS = ('vgg16', 'res50', 'res101', 'res152', 'mobile')


def parse_args():
    parser = argparse.ArgumentParser(
        description='Train a Faster R-CNN network')
    parser.add_argument('--cfg', dest='cfg_file', default=None,
                        help='optional config file')
    parser.add_argument('--weight', dest='weight', default=None,
                        help='initialize with pretrained model weights '
                             '(slim var dict .npz/.pkl)')
    parser.add_argument('--imdb', dest='imdb_name',
                        default='voc_2007_trainval',
                        help='dataset to train on')
    parser.add_argument('--imdbval', dest='imdbval_name',
                        default='voc_2007_test',
                        help='dataset to validate on')
    parser.add_argument('--iters', dest='max_iters', default=70000, type=int)
    parser.add_argument('--tag', dest='tag', default=None,
                        help='tag of the model')
    parser.add_argument('--net', dest='net', default='res50', choices=NETS)
    parser.add_argument('--devices', dest='devices', default=0, type=int,
                        help='data-parallel devices (0 = all available)')
    parser.add_argument('--coordinator', dest='coordinator', default=None,
                        help='multi-host: coordinator address host:port '
                             '(or env FRCNN_COORDINATOR)')
    parser.add_argument('--num-procs', dest='num_procs', default=None,
                        type=int, help='multi-host: total process count')
    parser.add_argument('--proc-id', dest='proc_id', default=None, type=int,
                        help='multi-host: this process id')
    parser.add_argument('--set', dest='set_cfgs', default=None,
                        nargs=argparse.REMAINDER,
                        help='set config keys')
    if len(sys.argv) == 1:
        parser.print_help()
        sys.exit(1)
    return parser.parse_args()


def combined_roidb(imdb_names):
    """Combine multiple roidbs (e.g. voc_2007_trainval+voc_2012_trainval)."""

    def get_roidb(imdb_name):
        imdb = get_imdb(imdb_name)
        print('Loaded dataset `{:s}`'.format(imdb.name))
        imdb.set_proposal_method(cfg.TRAIN.PROPOSAL_METHOD)
        print('Set proposal method: {:s}'.format(cfg.TRAIN.PROPOSAL_METHOD))
        roidb = get_training_roidb(imdb)
        return roidb

    roidbs = [get_roidb(s) for s in imdb_names.split('+')]
    roidb = roidbs[0]
    if len(roidbs) > 1:
        for r in roidbs[1:]:
            roidb.extend(r)
        from tf_faster_rcnn_tpu.datasets.imdb import imdb as imdb_cls
        tmp = get_imdb(imdb_names.split('+')[1])
        imdb = imdb_cls(imdb_names, tmp.classes)
    else:
        imdb = get_imdb(imdb_names)
    return imdb, roidb


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

    # multi-host bring-up must precede any other jax use
    from tf_faster_rcnn_tpu.parallel import dist
    dist.initialize(coordinator_address=args.coordinator,
                    num_processes=args.num_procs, process_id=args.proc_id)

    print('Using config:')
    pprint.pprint(cfg)
    np.random.seed(cfg.RNG_SEED)

    # train set
    imdb, roidb = combined_roidb(args.imdb_name)
    print('{:d} roidb entries'.format(len(roidb)))

    output_dir = get_output_dir(imdb, args.tag)
    print('Output will be saved to `{:s}`'.format(output_dir))
    tb_dir = get_output_tb_dir(imdb, args.tag)
    print('Metrics will be saved to `{:s}`'.format(tb_dir))

    # validation set (no flipping)
    orgflip = cfg.TRAIN.USE_FLIPPED
    cfg.TRAIN.USE_FLIPPED = False
    _, valroidb = combined_roidb(args.imdbval_name)
    print('{:d} validation roidb entries'.format(len(valroidb)))
    cfg.TRAIN.USE_FLIPPED = orgflip

    mesh = None
    if args.devices != 1 or dist.is_initialized():
        import jax
        from tf_faster_rcnn_tpu.parallel.mesh import make_mesh
        n = args.devices or len(jax.devices())
        if n > 1:
            mesh = make_mesh(n)
            print(f'Training data-parallel over {n} devices'
                  + (f' across {jax.process_count()} hosts'
                     if jax.process_count() > 1 else ''))

    train_net(args.net, imdb, roidb, valroidb, output_dir, tb_dir,
              pretrained_model=args.weight, max_iters=args.max_iters,
              mesh=mesh)


if __name__ == '__main__':
    main()
