"""tic/toc timer with running average.

Reference: ``common/timer.py:Timer:~1-40`` — three instances wrap the
total / device / data-read phases of each train iteration and feed the
per-iter speed log line.
"""

from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.average_time = 0.0
        self.warm_up = 0

    def tic(self):
        self.start_time = time.perf_counter()

    def toc(self, average: bool = True) -> float:
        self.diff = time.perf_counter() - self.start_time
        if self.warm_up < 10:  # ignore compile-dominated first iters
            self.warm_up += 1
            return self.diff
        self.total_time += self.diff
        self.calls += 1
        self.average_time = self.total_time / self.calls
        return self.average_time if average else self.diff

    def reset(self):
        self.__init__()
