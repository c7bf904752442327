"""Circuit breaker for the serving layer — the reference's resilience
component (circuit_breaker.rs:1-227) in the Python service layer, per
SURVEY §4 ("orthogonal to the query engine; implement in the service
layer if at all").

Same state machine and defaults as the reference: CLOSED → (N consecutive
failures within the window) → OPEN (fail fast) → after ``timeout_s`` →
HALF_OPEN (trial calls) → ``success_threshold`` successes re-close, any
failure re-opens. The breaker wraps query execution in the HTTP handler;
an open circuit returns 503 without touching Spark.
"""

from __future__ import annotations

import threading
import time

CLOSED, OPEN, HALF_OPEN = "closed", "open", "half_open"


class CircuitBreaker:
    """Thread-safe three-state circuit breaker (reference defaults:
    failure_threshold=5, success_threshold=3, timeout 60 s, failure-count
    window 300 s — circuit_breaker.rs:28-36)."""

    def __init__(
        self,
        failure_threshold: int = 5,
        success_threshold: int = 3,
        timeout_s: float = 60.0,
        window_s: float = 300.0,
        clock=time.monotonic,
    ) -> None:
        self.failure_threshold = failure_threshold
        self.success_threshold = success_threshold
        self.timeout_s = timeout_s
        self.window_s = window_s
        self._clock = clock
        self._lock = threading.Lock()
        self._state = CLOSED
        self._failures = 0
        self._successes = 0
        self._last_failure = clock()
        self._window_start = clock()

    @property
    def state(self) -> str:
        with self._lock:
            return self._peek_state()

    def _peek_state(self) -> str:
        # OPEN → HALF_OPEN transition is time-driven (lock held by caller)
        if (
            self._state == OPEN
            and self._clock() - self._last_failure >= self.timeout_s
        ):
            self._state = HALF_OPEN
            self._successes = 0
        return self._state

    def allow(self) -> bool:
        """May a request proceed? OPEN fails fast; HALF_OPEN lets trial
        requests through; CLOSED always allows."""
        with self._lock:
            return self._peek_state() != OPEN

    def record_success(self) -> None:
        with self._lock:
            st = self._peek_state()
            if st == HALF_OPEN:
                self._successes += 1
                if self._successes >= self.success_threshold:
                    self._state = CLOSED
                    self._failures = 0
                    self._successes = 0
            elif st == CLOSED:
                self._failures = 0

    def record_failure(self) -> None:
        with self._lock:
            now = self._clock()
            st = self._peek_state()
            # failure-count window: stale failures don't accumulate forever
            if now - self._window_start >= self.window_s:
                self._failures = 0
                self._window_start = now
            self._last_failure = now
            if st == HALF_OPEN:
                self._state = OPEN
                self._successes = 0
                return
            self._failures += 1
            if self._failures >= self.failure_threshold:
                self._state = OPEN

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "state": self._peek_state(),
                "failure_count": self._failures,
                "failure_threshold": self.failure_threshold,
                "success_threshold": self.success_threshold,
                "timeout_s": self.timeout_s,
            }
