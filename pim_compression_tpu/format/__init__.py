"""Wire-format core: constants, varints, framing, and the oracle codec."""

from pim_compression_tpu.format import constants, oracle, varint  # noqa: F401
