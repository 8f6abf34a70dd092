"""Phase timer for verbose CLI output (reference: src/general/timer.{cpp,h}).

Usage:
    t = Timer()
    ...build basis...
    t.lap("basis")        # prints "basis done in 0.42 s" and restarts
    with t.phase("TEI"):  # context-manager form
        ...
"""

import time
from contextlib import contextmanager

__all__ = ["Timer"]


class Timer:
    def __init__(self, verbose: bool = True):
        self.verbose = verbose
        self.t0 = time.perf_counter()
        self.start = self.t0

    def elapsed(self) -> float:
        """Seconds since the last lap (or construction)."""
        return time.perf_counter() - self.t0

    def total(self) -> float:
        """Seconds since construction."""
        return time.perf_counter() - self.start

    def lap(self, label: str) -> float:
        dt = self.elapsed()
        if self.verbose:
            print(f"{label} done in {dt:.2f} s")
        self.t0 = time.perf_counter()
        return dt

    @contextmanager
    def phase(self, label: str):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        if self.verbose:
            print(f"{label} done in {dt:.2f} s")
