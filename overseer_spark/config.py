"""Engine configuration with the reference's operational defaults
(overseer/config.clj:39-74; see BASELINE.md §A)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable


@dataclass
class HeartbeatConfig:
    enabled: bool = True
    sleep_time: float = 60.0  # seconds between heartbeat writes (config.clj:64-65)
    tolerance: int = 5  # missed beats before presumed dead (config.clj:67-68)


@dataclass
class Config:
    detector_sleep_time: float = 2.0  # ready-set poll period (config.clj:58-59)
    sleep_time: float = 10.0  # idle-queue backoff (config.clj:61-62)
    heartbeat: HeartbeatConfig = field(default_factory=HeartbeatConfig)
    monitor_shutdown: bool = True  # exit worker on monitor error (config.clj:70-71)
    rand_seed: int | None = None  # seeded job pick for deterministic tests
    # Pluggable external error reporting — the reference's Sentry hook
    # (errors.clj:84-104) generalized: called with a JSON-safe payload
    # {job_id, job_type, failure{reason, exception, message, data}} on every
    # non-suppressed job failure, and {reason: "monitor-error", ...} on fatal
    # monitor errors. Suppressed signals (abort_silent, fault) skip the sink;
    # sink exceptions are swallowed and logged, never fail the job path.
    error_sink: Callable[[dict[str, Any]], None] | None = None

    def liveness_threshold(self, now: float) -> int:
        """now − tolerance × period (overseer/heartbeat.clj:35-43)."""
        return int(now - self.heartbeat.tolerance * self.heartbeat.sleep_time)
