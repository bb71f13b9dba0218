"""Data-parallel block encoder (implemented in the next milestone)."""
