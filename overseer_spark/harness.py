"""Harness middleware: wrap any handler stage with a higher-order function.

Reference semantics (overseer/api.clj:120-183): a handler is either a plain
callable (≙ ``{"process": fn}``) or a dict of stages ``pre_process`` /
``process`` / ``post_process``. ``harness(handler, stage, wrapper)`` replaces
the stage with ``wrapper(existing_stage)``; a missing stage defaults to an
identity function of the correct arity, so wrappers compose uniformly.
"""

from __future__ import annotations

from typing import Any, Callable, Mapping

Handler = Callable[..., Any] | Mapping[str, Callable[..., Any]]

_IDENTITIES: dict[str, Callable[..., Any]] = {
    "pre_process": lambda job: job,
    "process": lambda job: job,
    "post_process": lambda job, result: result,
}


def as_stage_map(handler: Handler) -> dict[str, Callable[..., Any]]:
    if callable(handler):
        return {"process": handler}
    return dict(handler)


def harness(handler: Handler, stage: str, wrapper: Callable[[Callable], Callable]) -> dict:
    """Return a new handler map with ``stage`` wrapped. Missing stage ⇒
    wrapper receives the identity of correct arity (api.clj:152-166)."""
    if stage not in _IDENTITIES:
        raise ValueError(f"unknown handler stage: {stage!r}")
    stages = as_stage_map(handler)
    existing = stages.get(stage, _IDENTITIES[stage])
    stages[stage] = wrapper(existing)
    return stages
