#!/usr/bin/env python
"""Demo: run Faster R-CNN detection on the bundled demo images.

CLI parity with /root/reference/tools/demo.py:113-155: loads a model (our
params msgpack or a converted reference checkpoint), runs im_detect per
image, per-class visualization at CONF_THRESH=0.8. Images default to this
repo's data/demo set, generated deterministically on first use (the
reference bundles photographs, demo.py:148-155; see
tools/make_demo_images.py) — so the demo works in any checkout. Output
figures are saved (headless) instead of shown.
"""

import argparse
import os
import os.path as osp

import _init_paths  # noqa: F401
import numpy as np

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402

from tf_faster_rcnn_tpu.config import canvas_hw, cfg, cfg_from_file  # noqa: E402
from tf_faster_rcnn_tpu.data.blob import read_image_bgr  # noqa: E402
from tf_faster_rcnn_tpu.datasets.pascal_voc import VOC_CLASSES  # noqa: E402
from tf_faster_rcnn_tpu.engine.test_engine import im_detect, make_detect_fn  # noqa: E402
from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg  # noqa: E402
from tf_faster_rcnn_tpu.utils.timer import Timer  # noqa: E402

CONF_THRESH = 0.8
REPO_ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
DEFAULT_DEMO_DIR = osp.join(REPO_ROOT, 'data', 'demo')


def vis_detections(ax, class_name, dets, thresh=0.5):
    inds = np.where(dets[:, -1] >= thresh)[0]
    if len(inds) == 0:
        return
    for i in inds:
        bbox = dets[i, :4]
        score = dets[i, -1]
        ax.add_patch(plt.Rectangle((bbox[0], bbox[1]),
                                   bbox[2] - bbox[0], bbox[3] - bbox[1],
                                   fill=False, edgecolor='red',
                                   linewidth=3.5))
        ax.text(bbox[0], bbox[1] - 2,
                '{:s} {:.3f}'.format(class_name, score),
                bbox=dict(facecolor='blue', alpha=0.5),
                fontsize=14, color='white')


def demo(detect_fn, params, image_path, out_dir):
    """Returns the machine-readable detections above CONF_THRESH:
    [(class_name, score, x1, y1, x2, y2), ...]."""
    im = read_image_bgr(image_path)
    timer = Timer()
    timer.tic()
    dets, _ = im_detect(detect_fn, params, im)
    timer.toc()
    print('Detection took {:.3f}s for {:d} object proposals'.format(
        timer.total_time, len(dets)))

    fig, ax = plt.subplots(figsize=(12, 12))
    ax.imshow(im[:, :, ::-1], aspect='equal')
    kept = []
    for row in dets:
        c, score = int(row[0]), row[1]
        if score < CONF_THRESH:
            continue
        kept.append((VOC_CLASSES[c], float(score), float(row[2]),
                     float(row[3]), float(row[4]), float(row[5])))
        vis_detections(ax, VOC_CLASSES[c],
                       np.array([[row[2], row[3], row[4], row[5], score]]),
                       CONF_THRESH)
    plt.axis('off')
    plt.tight_layout()
    out = osp.join(out_dir, 'det_' + osp.basename(image_path) + '.png')
    plt.savefig(out)
    plt.close(fig)
    print('Saved ' + out)
    return kept


def main():
    parser = argparse.ArgumentParser(description='Faster R-CNN demo')
    parser.add_argument('--net', dest='net', default='res101',
                        choices=('vgg16', 'res50', 'res101', 'res152',
                                 'mobile'))
    parser.add_argument('--model', dest='model', default=None,
                        help='params msgpack or slim var dict')
    parser.add_argument('--dataset', dest='dataset', default=None,
                        choices=('pascal_voc', 'pascal_voc_0712'),
                        help='reference-parity shorthand (demo.py:118-126): '
                             'resolves --model to the trained snapshot under '
                             'output/<net>/<imdb>/default/')
    parser.add_argument('--cfg', dest='cfg_file', default=None)
    parser.add_argument('--demo-dir', default=DEFAULT_DEMO_DIR)
    parser.add_argument('--out-dir', default='demo_out')
    parser.add_argument('--json', dest='json_out', default=None,
                        help='also write {image: [[cls, score, x1, y1, x2, '
                             'y2], ...]} for machine checks (day1_parity.sh)')
    args = parser.parse_args()

    from tf_faster_rcnn_tpu.utils.compilation_cache import enable_compilation_cache
    enable_compilation_cache()

    if args.cfg_file:
        cfg_from_file(args.cfg_file)

    if args.dataset and not args.model:
        # reference demo resolves (net, dataset) -> snapshot path
        # (/root/reference/tools/demo.py:38-41,118-126); same layout here
        imdb = {'pascal_voc': 'voc_2007_trainval',
                'pascal_voc_0712':
                    'voc_2007_trainval+voc_2012_trainval'}[args.dataset]
        iters = {'vgg16': 70000}.get(args.net, 110000)
        args.model = osp.join(
            'output', args.net, imdb, 'default',
            f'{args.net}_faster_rcnn_iter_{iters}.msgpack')

    spec = spec_from_cfg(args.net, 21, 'TEST')
    model = FasterRCNN(spec)
    from tools.test_net import load_model_params
    params = load_model_params(args.model, model, spec, args.net,
                               canvas_hw(cfg.TEST))
    detect_fn = make_detect_fn(model, spec)

    os.makedirs(args.out_dir, exist_ok=True)
    if not osp.isdir(args.demo_dir) or not any(
            f.endswith(('.jpg', '.png')) for f in os.listdir(args.demo_dir)):
        print(f'{args.demo_dir} is empty: generating the bundled synthetic '
              'demo scenes (tools/make_demo_images.py)')
        from tools.make_demo_images import generate
        generate(args.demo_dir)
    im_names = sorted(f for f in os.listdir(args.demo_dir)
                      if f.endswith(('.jpg', '.png')))
    all_dets = {}
    for im_name in im_names:
        print('~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~')
        print('Demo for {}'.format(im_name))
        all_dets[im_name] = demo(
            detect_fn, params, osp.join(args.demo_dir, im_name),
            args.out_dir)
    if args.json_out:
        import json
        with open(args.json_out, 'w') as f:
            json.dump(all_dets, f, indent=1)
        print('Wrote ' + args.json_out)


if __name__ == '__main__':
    main()
