"""Profiling helpers.

Replaces the reference's statprof context manager
(mlmc/tool/context_statprof.py:8-13) with jax.profiler traces plus a
wall-time section timer. Per-level cost accounting — the operationally
important "profiling" feeding the allocation formula C_l — lives in the
sampling pools (see SamplingPool times / storage n_ops).
"""
import contextlib
import time

import jax


@contextlib.contextmanager
def device_trace(log_dir="/tmp/jax-trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def section_timer(name="section", results=None):
    """Wall-time a code section; optionally append (name, seconds) to list."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        elapsed = time.perf_counter() - t0
        if results is not None:
            results.append((name, elapsed))
        else:
            print("[{}] {:.4f} s".format(name, elapsed))


@contextlib.contextmanager
def stat_profiler():
    """API-parity alias of the reference's statprof context
    (context_statprof.py:8-13): yields a section timer printing on exit."""
    with section_timer("stat_profiler"):
        yield
