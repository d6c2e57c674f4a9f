"""Bounded error tolerance for multi-dataset runs.

The reference tolerates up to ``APIErrorMax = 3`` failures per run before
aborting (CommCareAPIHandler.py:23-24, 44-56): one bad dataset doesn't
kill the pull loop, a systemic outage does. Same contract here, as a
reusable guard the ingest driver wraps around per-dataset work; within a
Spark job, task-level retry is already covered by
``spark.task.maxFailures``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


class ErrorBudgetExceeded(RuntimeError):
    def __init__(self, failures: list[tuple[str, Exception]]):
        self.failures = failures
        names = ", ".join(n for n, _ in failures)
        super().__init__(f"error budget exhausted after failures in: {names}")


class ErrorBudget:
    def __init__(self, max_failures: int = 3):
        self.max_failures = max_failures
        self.failures: list[tuple[str, Exception]] = []

    def run(self, name: str, fn: Callable[[], Any]) -> Any | None:
        """Run one unit; swallow its failure unless the budget is spent.

        Mirrors `_perform_method` (ref :44-56): the Nth failure re-raises
        as ErrorBudgetExceeded carrying every recorded failure.
        """
        try:
            return fn()
        except Exception as exc:  # noqa: BLE001 — budget is cross-cause
            self.failures.append((name, exc))
            if len(self.failures) >= self.max_failures:
                raise ErrorBudgetExceeded(self.failures) from exc
            return None
