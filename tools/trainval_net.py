#!/usr/bin/env python
"""Train (and snapshot) a Faster R-CNN detector on one or more imdbs.

Covers the reference tool's CLI surface (/root/reference/tools/
trainval_net.py:25-139): --cfg --weight --imdb --imdbval --iters --tag
--net --set, with '+'-joined imdb names training on the concatenated
roidbs. TPU additions: --devices (data-parallel mesh size, 0 = all
available) and the multi-host flags (--coordinator/--num-procs/--proc-id).
"""

import argparse
import pprint
import sys

import _init_paths  # noqa: F401
import numpy as np

NETS = ("vgg16", "res50", "res101", "res152", "mobile")


def build_parser():
    ap = argparse.ArgumentParser(description="Train a Faster R-CNN network")
    add = ap.add_argument
    add("--cfg", dest="cfg_file", default=None, help="optional config file")
    add("--weight", default=None,
        help="pretrained weights: TF .ckpt bundle or slim var dict .npz/.pkl")
    add("--imdb", dest="imdb_name", default="voc_2007_trainval",
        help="dataset(s) to train on, '+'-joined")
    add("--imdbval", dest="imdbval_name", default="voc_2007_test",
        help="dataset to validate on")
    add("--iters", dest="max_iters", default=70000, type=int,
        help="training length in images (reference iteration units)")
    add("--tag", default=None, help="experiment tag (output subdir)")
    add("--net", default="res50", choices=NETS)
    add("--devices", default=0, type=int,
        help="data-parallel devices (0 = all available)")
    add("--coordinator", default=None,
        help="multi-host coordinator host:port (or env FRCNN_COORDINATOR)")
    add("--num-procs", dest="num_procs", default=None, type=int,
        help="multi-host: total process count")
    add("--proc-id", dest="proc_id", default=None, type=int,
        help="multi-host: this process id")
    add("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER,
        help="dotted config overrides")
    return ap


def load_training_roidbs(joined_names):
    """Build the concatenated training roidb for '+'-joined imdb names.

    Returns (imdb, roidb): for a single name, the imdb itself; for a
    combination, a bare imdb shell carrying the joined name and the shared
    class list (the reference's combined-training behavior,
    trainval_net.py:63-85).
    """
    from tf_faster_rcnn_tpu.config import cfg
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    from tf_faster_rcnn_tpu.engine.train_loop import get_training_roidb

    names = joined_names.split("+")
    roidb, ds = [], None
    for name in names:
        ds = get_imdb(name)
        print("Loaded dataset `{:s}`".format(ds.name))
        ds.set_proposal_method(cfg.TRAIN.PROPOSAL_METHOD)
        print("Set proposal method: {:s}".format(cfg.TRAIN.PROPOSAL_METHOD))
        roidb.extend(get_training_roidb(ds))

    if len(names) == 1:
        return ds, roidb
    from tf_faster_rcnn_tpu.datasets.imdb import imdb as imdb_shell
    return imdb_shell(joined_names, ds.classes), roidb


def main(argv=None):
    if argv is None and len(sys.argv) == 1:
        build_parser().print_help()
        sys.exit(1)
    args = build_parser().parse_args(argv)

    from tf_faster_rcnn_tpu.utils.compilation_cache import \
        enable_compilation_cache
    enable_compilation_cache()
    print("Called with args:")
    print(args)

    from tf_faster_rcnn_tpu.config import (cfg, cfg_from_file, cfg_from_list,
                                           get_output_dir, get_output_tb_dir)
    if args.cfg_file is not None:
        cfg_from_file(args.cfg_file)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs)

    # multi-host bring-up must precede any other jax use
    from tf_faster_rcnn_tpu.parallel import dist
    dist.initialize(coordinator_address=args.coordinator,
                    num_processes=args.num_procs, process_id=args.proc_id)

    print("Using config:")
    pprint.pprint(cfg)
    np.random.seed(cfg.RNG_SEED)

    imdb, roidb = load_training_roidbs(args.imdb_name)
    print("{:d} roidb entries".format(len(roidb)))

    output_dir = get_output_dir(imdb, args.tag)
    print("Output will be saved to `{:s}`".format(output_dir))
    tb_dir = get_output_tb_dir(imdb, args.tag)
    print("Metrics will be saved to `{:s}`".format(tb_dir))

    # validation roidb is never flip-augmented
    saved_flip, cfg.TRAIN.USE_FLIPPED = cfg.TRAIN.USE_FLIPPED, False
    try:
        valimdb, valroidb = load_training_roidbs(args.imdbval_name)
    finally:
        cfg.TRAIN.USE_FLIPPED = saved_flip
    print("{:d} validation roidb entries".format(len(valroidb)))

    mesh = None
    n_model = max(1, int(cfg.TPU.MODEL_DEVICES))
    if args.devices != 1 or dist.is_initialized() or n_model > 1:
        import jax
        from tf_faster_rcnn_tpu.parallel.mesh import make_hybrid_mesh
        n = args.devices or len(jax.devices())
        if n_model > 1 and jax.process_count() > 1:
            # TP-sharded params are not fully addressable from one host, so
            # snapshots/eval would need gather-to-coordinator plumbing;
            # multi-host runs scale over the data axis instead
            raise SystemExit("TPU.MODEL_DEVICES > 1 is single-host only; "
                             "multi-host runs use the data axis")
        if n > 1:
            mesh = make_hybrid_mesh(data=max(1, n // n_model), model=n_model)
            hosts = (f" across {jax.process_count()} hosts"
                     if jax.process_count() > 1 else "")
            layout = (f"{n // n_model} data x {n_model} model"
                      if n_model > 1 else "data-parallel")
            print(f"Training {layout} over {n} devices{hosts}")

    from tf_faster_rcnn_tpu.engine.train_loop import train_net
    train_net(args.net, imdb, roidb, valroidb, output_dir, tb_dir,
              pretrained_model=args.weight, max_iters=args.max_iters,
              mesh=mesh, valimdb=valimdb)


if __name__ == "__main__":
    main()
