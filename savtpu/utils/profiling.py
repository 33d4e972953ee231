"""Profiling utilities.

The reference imports ``time`` and never uses it (Distributed_tools.py:7,
Dynamic_solver.py:6) — SURVEY.md §5 asks for real observability: a step
timer reporting timesteps/sec and element-updates/sec (the BASELINE
metrics), and a ``jax.profiler`` trace context for TPU timeline capture.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, Optional


@dataclass
class StepTimer:
    """Wall-clock section timer with derived throughput metrics."""

    n_elements: int = 0
    sections: Dict[str, float] = field(default_factory=dict)
    _starts: Dict[str, float] = field(default_factory=dict)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.sections[name] = (
                self.sections.get(name, 0.0) + time.perf_counter() - t0
            )

    def throughput(self, name: str, num_steps: int) -> Dict[str, float]:
        el = self.sections.get(name, 0.0)
        sps = num_steps / el if el > 0 else float("inf")
        out = {"seconds": el, "timesteps_per_sec": sps}
        if self.n_elements:
            out["element_updates_per_sec"] = sps * self.n_elements
        return out

    def report(self, path: Optional[str | Path] = None) -> Dict:
        data = dict(self.sections)
        if path is not None:
            Path(path).write_text(json.dumps(data, indent=2))
        return data


@contextlib.contextmanager
def profile_trace(logdir: str | Path = "/tmp/savtpu_profile"):
    """Capture a jax.profiler trace (TensorBoard-compatible) around the
    enclosed block; no-op if the profiler is unavailable."""
    import jax

    try:
        jax.profiler.start_trace(str(logdir))
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


class MetricsLog:
    """Append-only JSONL run log (SURVEY.md §5 structured observability —
    the reference has print() only). One line per event:
    {"ts": ..., "event": ..., **fields}. Every pipeline stage appends to
    <workdir>/metrics.jsonl."""

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, event: str, **fields) -> None:
        rec = {"ts": round(time.time(), 3), "event": event, **fields}
        with open(self.path, "a") as fh:
            fh.write(json.dumps(rec) + "\n")


def stage_log(cfg) -> "MetricsLog":
    """The pipeline's shared metrics log under cfg.workdir."""
    return MetricsLog(Path(cfg.workdir) / "metrics.jsonl")
