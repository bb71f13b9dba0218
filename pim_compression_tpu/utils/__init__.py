"""Shared utilities: errors, config, profiling, metrics."""
