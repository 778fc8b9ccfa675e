"""Phase timing + profiler hooks (reference OUTPUT_TIME, PREP.h:88-93).

The reference stamps wall-clock at every phase boundary.  Here:

  * :func:`phase` — context manager that records (tag, seconds) into the
    module-level ``PHASES`` list and, when ``DDPCA_TIME`` is set (or
    :func:`enable` was called), prints ``tag: <seconds>`` on exit — the
    OUTPUT_TIME equivalent with durations instead of raw ctime stamps.
  * :func:`trace` — context manager around ``jax.profiler.trace`` writing a
    TensorBoard/XProf trace when ``DDPCA_PROFILE_DIR`` (or the argument) is
    set; a no-op otherwise, so production paths can stay annotated.

Both are zero-overhead enough to leave permanently in setup code; the jitted
hot loop is profiled from outside (one trace around ``contact_analysis``
captures every device kernel).
"""

from __future__ import annotations

import contextlib
import os
import time

PHASES: list[tuple[str, float]] = []
_enabled = [bool(os.environ.get("DDPCA_TIME"))]


def enable(on: bool = True) -> None:
    _enabled[0] = on


def reset() -> list[tuple[str, float]]:
    out = list(PHASES)
    PHASES.clear()
    return out


@contextlib.contextmanager
def phase(tag: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        PHASES.append((tag, dt))
        if _enabled[0]:
            print(f"{tag}: {dt:.3f} s", flush=True)


@contextlib.contextmanager
def trace(log_dir: str | None = None):
    """jax.profiler trace into ``log_dir`` / $DDPCA_PROFILE_DIR (no-op when
    neither is set)."""
    log_dir = log_dir or os.environ.get("DDPCA_PROFILE_DIR")
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
