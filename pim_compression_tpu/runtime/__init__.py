"""Host-side runtime: blockize/pad, device dispatch, assembly, profiling."""

from pim_compression_tpu.runtime.api import compress, decompress  # noqa: F401
from pim_compression_tpu.runtime.profiling import PhaseTimer  # noqa: F401
