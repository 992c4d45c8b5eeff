"""Phase timing and device profiling.

The reference's only observability is wall-clock prints and a status
enum (ref Docodo.NET/Index.cs:392-398, 431, 519). Here every build/query
phase reports into a process-wide registry, and a `jax.profiler` trace
can wrap any region for XLA-level analysis (`DOCODO_PROFILE_DIR=...`
enables it globally).
"""

from __future__ import annotations

import contextlib
import os
import threading
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple

_lock = threading.Lock()
_totals: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def phase(name: str) -> Iterator[None]:
    """Time a named phase; nest freely across threads."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _lock:
            _totals[name] += dt
            _counts[name] += 1


def record(name: str, seconds: float) -> None:
    """Record an externally-timed phase."""
    with _lock:
        _totals[name] += seconds
        _counts[name] += 1


def report() -> List[Tuple[str, float, int]]:
    """(name, total seconds, calls), slowest first."""
    with _lock:
        rows = [(k, _totals[k], _counts[k]) for k in _totals]
    return sorted(rows, key=lambda r: -r[1])


def reset() -> None:
    with _lock:
        _totals.clear()
        _counts.clear()


def format_report() -> str:
    return "\n".join(
        f"{name:30s} {total*1e3:10.1f} ms  x{calls}"
        for name, total, calls in report()
    )


@contextlib.contextmanager
def device_trace(label: str = "docodo") -> Iterator[None]:
    """Wrap a region in a jax.profiler trace when DOCODO_PROFILE_DIR is
    set (produces a TensorBoard/XProf trace of the XLA execution)."""
    out = os.environ.get("DOCODO_PROFILE_DIR")
    if not out:
        yield
        return
    import jax

    jax.profiler.start_trace(os.path.join(out, label))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named sub-region inside a device trace (TraceAnnotation)."""
    try:
        import jax

        with jax.profiler.TraceAnnotation(name):
            yield
    except Exception:
        yield
