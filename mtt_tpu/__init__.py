"""mtt_tpu — TPU-native multi-task dense-prediction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
prismformore/Multi-Task-Transformer (InvPT, ECCV'22 + TaskPrompter, ICLR'23):
joint semantic segmentation, human-parts parsing, saliency, surface normals,
edge detection, monocular depth and monocular 3D detection.

Design principles (TPU-first, not a port):
  * NHWC layouts everywhere; bf16 matmuls with fp32 accumulation on the MXU.
  * Every model is a pure function of (params, batch) under `jax.jit`;
    data parallelism is a `jax.sharding.Mesh` + NamedSharding, not DDP.
  * SyncBatchNorm falls out of GSPMD for free: batch statistics computed
    under jit over a sharded batch axis are global statistics.
  * Hot kernels (backbone attention, InvPT cross-task decoder attention)
    have Pallas implementations with XLA reference fallbacks.
"""

__version__ = "0.1.0"

# The fused up4 head kernel needs ~20.6 MB scoped VMEM inside the full
# model program (16 MB default). libtpu reads LIBTPU_INIT_ARGS at first
# backend init, which is lazy — importing mtt_tpu before the first jax
# computation (true for every entry point) is early enough.
from mtt_tpu.utils.cache import _ensure_scoped_vmem_limit as _esvl

_esvl()
del _esvl
