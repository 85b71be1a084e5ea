"""One process of a multi-host evaluation run.

Launched by test_multihost.py: `python multihost_eval_worker.py <pid>
<nprocs> <coordinator_port> <out.json> <opts-json>`. Each process joins a
jax.distributed cluster, runs test_net on the shared mini-VOC fixture —
taking its stripe of the batch schedule on its own local devices — and the
coordinator merges the part files and evaluates. Not a pytest file.
"""

import json
import os
import sys


def main():
    pid, nprocs, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], sys.argv[4])
    opts = json.loads(sys.argv[5])
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    # NO persistent compile cache here: AOT-loaded XLA:CPU executables
    # embed gloo collective-context uids, and a cache hit on one process
    # vs a fresh compile on another desyncs the context numbering -> both
    # sides stall in "Gloo context initialization failed" (reproduced on
    # this host; dist.initialize also force-disables the cache under gloo)

    from tf_faster_rcnn_tpu.parallel import dist
    dist.initialize(coordinator_address=f"localhost:{port}",
                    num_processes=nprocs, process_id=pid)

    sys.path.insert(0, os.path.dirname(__file__))
    import numpy as np
    from test_pipeline import _tiny_cfg

    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    from tf_faster_rcnn_tpu.engine.test_engine import test_net
    from tf_faster_rcnn_tpu.models.network import FasterRCNN, spec_from_cfg

    _tiny_cfg(opts["root"])
    imdb = get_imdb("voc_2007_test")
    spec = spec_from_cfg("vgg16", imdb.num_classes, "TEST")
    model = FasterRCNN(spec)
    dummy = np.zeros((1, 96, 128, 3), np.float32)
    info = np.array([[96, 128, 1.0]], np.float32)
    params = model.init(jax.random.PRNGKey(0), dummy, info)

    map_ = test_net(model, spec, params, imdb, "mh", max_per_image=10,
                    batch_size=2, output_dir=opts["out_dir"])
    if dist.on_coordinator():
        with open(outfile, "w") as f:
            json.dump({"mAP": map_}, f)
    else:
        assert map_ is None  # workers only contribute parts
    print(f"eval worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
