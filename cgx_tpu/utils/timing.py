"""Phase wall-clock ledger, the TPU equivalent of timing_t (ComTypes.h:80-91) and
recordTime (Start.cu:392-469): same bucket concept, surfaced as a dict + report."""

from __future__ import annotations

import contextlib
import time


class PhaseTimer:
    def __init__(self):
        self.buckets: dict = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.buckets[name] = self.buckets.get(name, 0.0) + (
                time.perf_counter() - t0)

    def report(self) -> str:
        total = sum(self.buckets.values())
        parts = [f"total: {total:.3f}s"]
        parts += [f"{k}: {v:.3f}s" for k, v in self.buckets.items()]
        return " , ".join(parts)

    def as_dict(self) -> dict:
        return dict(self.buckets)
