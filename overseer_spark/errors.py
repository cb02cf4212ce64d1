"""Tagged control-flow exceptions and failure structs.

Reference: abort/fault tagged ex-info (overseer/api.clj:99-118), failure-info
extraction defaulting to :failed (overseer/errors.clj:70-81), golden failure
shape {reason, exception, message, data} (overseer/errors.clj:75-78, test
overseer/test/overseer/executor_test.clj:34-39).
"""

from __future__ import annotations

import traceback
from typing import Any

from overseer_spark.core import STATUS_ABORTED, STATUS_FAILED, STATUS_UNSTARTED


class OverseerSignal(Exception):
    """Base for control-flow signals a handler may raise."""

    status: int = STATUS_FAILED
    suppress: bool = False

    def __init__(self, message: str = "", data: dict[str, Any] | None = None):
        super().__init__(message)
        self.message = message
        self.data = data or {}


class Abort(OverseerSignal):
    """Abort this job and cascade-abort all transitive dependents
    (reference ``api/abort`` overseer/api.clj:99-106)."""

    status = STATUS_ABORTED


class AbortSilent(Abort):
    """Abort without error reporting (reference ``abort-silent``
    overseer/api.clj:108-112)."""

    suppress = True


class Fault(OverseerSignal):
    """Transient failure: return the job to unstarted for a later retry
    (reference ``api/fault`` overseer/api.clj:114-118)."""

    status = STATUS_UNSTARTED
    suppress = True


def _json_safe(value: Any) -> Any:
    """Keep only JSON-serializable leaves (reference serializable filter
    overseer/errors.clj:20-34)."""
    if isinstance(value, (str, int, float, bool)) or value is None:
        return value
    if isinstance(value, dict):
        return {str(k): _json_safe(v) for k, v in value.items()}
    if isinstance(value, (list, tuple, set)):
        return [_json_safe(v) for v in value]
    return repr(value)


def failure_info(exc: BaseException) -> dict[str, Any]:
    """Map an exception to {status, failure-struct} — reference
    ``failure-info`` (overseer/errors.clj:70-81)."""
    if isinstance(exc, OverseerSignal):
        return {
            "status": exc.status,
            "suppress": exc.suppress,
            "failure": {
                "reason": "overseer-signal",
                "exception": type(exc).__name__,
                "message": exc.message,
                "data": _json_safe(exc.data),
            },
        }
    return {
        "status": STATUS_FAILED,
        "suppress": False,
        "failure": {
            "reason": "unhandled-exception",
            "exception": type(exc).__name__,
            "message": str(exc),
            "data": {"traceback": traceback.format_exc(limit=10)},
        },
    }


def try_thunk(exception_handler, thunk):
    """Run ``thunk``; on exception delegate to handler (reference
    ``try-thunk`` overseer/errors.clj:12-18)."""
    try:
        return thunk()
    except BaseException as exc:  # noqa: BLE001 — handler decides
        return exception_handler(exc)


def report_failure(sink, payload: dict[str, Any]) -> None:
    """Deliver a failure struct to the configured external sink — the
    reference's Sentry capture generalized to any callable
    (overseer/errors.clj:40-50,84-104). A sink error is logged and
    swallowed: reporting must never change the job outcome, exactly as
    the reference guards ``sentry-capture`` with its own try/catch."""
    if sink is None:
        return
    try:
        sink(payload)
    except Exception:  # noqa: BLE001 — reporting is best-effort
        import logging

        logging.getLogger("overseer_spark").exception("error sink failed")
