"""openset_rcnn_tpu: a TPU-native (JAX/XLA/Pallas) open-set detection framework.

A from-scratch rebuild of the capabilities of Yifei-Y/Openset-RCNN (RA-L 2023)
designed TPU-first: fixed shapes, batched tensor ops, one jitted train step,
pjit/mesh data parallelism, Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"
