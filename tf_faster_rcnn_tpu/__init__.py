"""tf_faster_rcnn_tpu — a TPU-native (JAX/XLA/Pallas/pjit) Faster R-CNN framework.

A ground-up rebuild of the capabilities of endernewton/tf-faster-rcnn
(reference at /root/reference) designed TPU-first:

* the full image-to-detections forward pass (backbone, RPN, anchor decode,
  top-k, NMS, RoI crop-and-resize, heads) compiles to a single fixed-shape
  XLA program — no host round-trips (the reference crosses device->host via
  tf.py_func at lib/nets/network.py:164,187 every training step);
* training target sampling (anchor_target / proposal_target) runs on-device
  with functional RNG and static shapes;
* data parallelism runs over a jax.sharding.Mesh with XLA collectives;
* hot non-matmul ops (NMS) have Pallas TPU kernels with jnp fallbacks and a
  C++ CPU oracle for golden tests.
"""

__version__ = "0.1.0"
