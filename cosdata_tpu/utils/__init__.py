"""Utilities: profiling/timing counters, jax profiler hooks."""
