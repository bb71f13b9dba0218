"""pim_compression_tpu — a TPU-native block-parallel Snappy codec framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
UBC-ECE-Sasha/PIM-compression (a UPMEM processing-in-memory Snappy codec):
the same block-parallel modified-Snappy wire format, with the reference's
DPU×tasklet decomposition replaced by chips×grid-lanes SPMD over a
``jax.sharding.Mesh``, speculative fully-data-parallel decode/encode kernels,
and a C++ native host codec as the fast sequential path.
"""

from pim_compression_tpu.format import constants, oracle, varint  # noqa: F401

__version__ = "0.1.0"
