"""Profiling / tracing hooks.

The reference only had wall-clock section timing (utils/timer.py). For TPU
we add optional jax.profiler trace capture (tensorboard-viewable) behind a
flag / env var, plus a context manager for named trace annotations.

  with maybe_trace(opts_or_dir):       # captures when dir given or
      train_loop()                     # FFRNET_TRACE_DIR is set

  with annotate("forward"):            # shows up on the TPU timeline
      ...
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str] = None) -> Iterator[None]:
    trace_dir = trace_dir or os.environ.get("FFRNET_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
