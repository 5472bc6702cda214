"""Per-sweep timing and opt-in XLA profiler tracing (SURVEY §5 aux).

The reference leans on MPSKit's verbosity printouts for sweep telemetry;
here every driver iteration carries a wall-clock stage breakdown in its
history record, and setting ``HTN_PROFILE_DIR`` wraps a run in
``jax.profiler.trace`` so the XLA op-level timeline can be inspected with
TensorBoard / xprof.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional


class StageTimer:
    """Accumulate wall-clock per named stage within one iteration.

    Usage::

        t = StageTimer()
        with t("eigs"): ...
        with t("gauge"): ...
        history.append({..., "stage_ms": t.ms()})
    """

    def __init__(self):
        self._acc: Dict[str, float] = {}

    @contextlib.contextmanager
    def __call__(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[stage] = (self._acc.get(stage, 0.0)
                                + time.perf_counter() - t0)

    def ms(self) -> Dict[str, float]:
        return {k: round(v * 1e3, 2) for k, v in self._acc.items()}

    def reset(self):
        self._acc.clear()
        self._open = None

    def mark(self, stage: Optional[str]):
        """Boundary-style alternative to the context manager: close the
        currently open stage (if any) and open ``stage`` (None = just
        close).  Lets straight-line driver code time its phases without
        re-indenting loop bodies."""
        now = time.perf_counter()
        open_ = getattr(self, "_open", None)
        if open_ is not None:
            name, t0 = open_
            self._acc[name] = self._acc.get(name, 0.0) + now - t0
        self._open = (stage, now) if stage is not None else None


@contextlib.contextmanager
def maybe_profile(tag: str, logdir: Optional[str] = None):
    """Opt-in XLA profiler trace: active when ``logdir`` or the
    ``HTN_PROFILE_DIR`` environment variable is set; no-op otherwise."""
    logdir = logdir or os.environ.get("HTN_PROFILE_DIR", "")
    if not logdir:
        yield
        return
    import jax

    path = os.path.join(logdir, tag)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield


def profiled(tag: str):
    """Decorator form of :func:`maybe_profile` for driver entry points."""
    import functools

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(*a, **k):
            with maybe_profile(tag):
                return fn(*a, **k)
        return wrapped
    return deco


def fmt_stage_ms(stage_ms: Dict[str, float]) -> str:
    return " ".join(f"{k}={v:.1f}ms" for k, v in stage_ms.items())
