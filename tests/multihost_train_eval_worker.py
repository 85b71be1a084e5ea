"""One process of a multi-host training run with in-training validation mAP.

Launched by test_multihost.py: `python multihost_train_eval_worker.py <pid>
<nprocs> <coordinator_port> <out.json> <opts-json>`. Each process joins a
jax.distributed cluster (4 virtual CPU devices each => one 8-device global
mesh), runs the REAL train_net loop in DP with TPU.EVAL_ITERS enabled, so
SolverWrapper._eval_map performs the striped multi-host evaluation
mid-training; the coordinator reports every recorded val_mAP from the
metrics JSONL. Not a pytest file (no test_ prefix).
"""

import json
import os
import sys


def run_train_with_eval(root, out_dir, tb_dir, max_iters, eval_iters):
    """Shared by the 2-process workers and the single-process reference:
    train vgg16 on the mini-VOC fixture over the full global mesh with
    in-training eval, return the recorded (step, val_mAP) rows (empty on
    non-coordinators, whose writer is None)."""
    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import _tiny_cfg

    from tf_faster_rcnn_tpu.config import cfg
    from tf_faster_rcnn_tpu.data.roidb import prepare_roidb
    from tf_faster_rcnn_tpu.datasets.factory import get_imdb
    from tf_faster_rcnn_tpu.engine.train_loop import train_net
    from tf_faster_rcnn_tpu.parallel.mesh import make_mesh

    _tiny_cfg(root)
    cfg.TPU.EVAL_ITERS = eval_iters
    cfg.TPU.PREFETCH = 0  # keep the spawned processes single-threaded

    imdb = get_imdb("voc_2007_trainval")
    imdb.set_proposal_method("gt")
    prepare_roidb(imdb)
    valimdb = get_imdb("voc_2007_test")
    valimdb.set_proposal_method("gt")
    prepare_roidb(valimdb)

    mesh = make_mesh()
    train_net("vgg16", imdb, list(imdb.roidb), list(valimdb.roidb),
              out_dir, tb_dir, max_iters=max_iters, mesh=mesh,
              valimdb=valimdb)

    import jax
    if jax.process_index() != 0:
        # tb_dir is SHARED across the co-located test processes — a
        # non-coordinator must not read the coordinator's metrics file and
        # report them as its own (it recorded nothing itself)
        return []
    metrics = os.path.join(tb_dir, "metrics.jsonl")
    if not os.path.exists(metrics):
        return []
    rows = [json.loads(line) for line in open(metrics)]
    return [(r["step"], r["val_mAP"]) for r in rows if "val_mAP" in r]


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
    assert len(jax.devices()) == 4 * nprocs

    vals = run_train_with_eval(opts["root"], opts["out_dir"], opts["tb_dir"],
                               int(opts["max_iters"]),
                               int(opts["eval_iters"]))
    if dist.on_coordinator():
        with open(outfile, "w") as f:
            json.dump({"val_map": vals}, f)
    else:
        assert vals == [], "only the coordinator records metrics"
    print(f"train-eval worker {pid} done", flush=True)


if __name__ == "__main__":
    main()
