"""Subprocess helper: write a real TensorFlow checkpoint from an .npz.

Run as ``python tf_ckpt_writer.py <src.npz> <ckpt_prefix>``. Creates TF1
graph-mode variables named exactly like the npz keys (slim-style scoped
names), saves them with tf.train.Saver (TensorBundle V2 — the reference's
snapshot format, lib/model/train_val.py:52-55), and dumps what TF's own
checkpoint reader sees to ``<ckpt_prefix>_tfdump.npz`` for cross-checks.

Kept in a subprocess so TensorFlow never loads into the pytest/JAX process.
"""

import os
import sys

os.environ["CUDA_VISIBLE_DEVICES"] = "-1"
os.environ["TF_CPP_MIN_LOG_LEVEL"] = "3"

import numpy as np


def main():
    src, prefix = sys.argv[1], sys.argv[2]
    import tensorflow.compat.v1 as tf
    tf.disable_eager_execution()
    arrays = dict(np.load(src, allow_pickle=False))
    g = tf.Graph()
    with g.as_default():
        tfvars = []
        for name, val in arrays.items():
            scope, _, leaf = name.rpartition("/")
            with tf.variable_scope(scope, reuse=tf.AUTO_REUSE):
                tfvars.append(tf.get_variable(leaf, initializer=val))
        saver = tf.train.Saver(var_list=tfvars)
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            saver.save(sess, prefix, write_meta_graph=False)
    reader = tf.train.load_checkpoint(prefix)
    dump = {k: reader.get_tensor(k)
            for k in reader.get_variable_to_shape_map()}
    np.savez(prefix + "_tfdump.npz", **dump)
    print(f"wrote {prefix} ({len(dump)} tensors)")


if __name__ == "__main__":
    main()
