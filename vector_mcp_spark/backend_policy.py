"""Fail-closed backend availability policy.

Mirrors ``vector_mcp/backend_policy.py``: requests name a backend, the
policy canonicalizes (strip + casefold) and either admits it or fails with
the reference's stable error codes — ``vector_backend_not_configured`` /
``vector_backend_unsupported`` — BEFORE any engine work happens.

This engine has one execution backend (Spark over Parquet collections), so
the reference's four backend names are accepted as aliases that all resolve
to it: a client migrating from the reference keeps its configured
``db_type`` and gets the same collections, queries, and error behavior.
Unknown names still fail closed — the allow-list is the contract, not a
suggestion.
"""

from __future__ import annotations

from typing import Final, TypedDict

from vector_mcp_spark.validation import EngineError

SPARK_BACKEND: Final = "spark"

# reference names (backend_policy.py AVAILABLE_BACKENDS) + this engine's own
AVAILABLE_BACKENDS: Final = frozenset(
    {"epistemic_graph", "mongodb", "postgres", "qdrant", SPARK_BACKEND}
)


class BackendStatus(TypedDict):
    backend: str
    available: bool
    reason: str
    advisory: str | None


def canonical_backend(value: str | None) -> str:
    return (value or "").strip().casefold()


def ensure_backend_available(value: str | None) -> str:
    """Canonical backend name, or a stable-code failure before any engine
    (or SDK, in the reference) is touched. All admitted names execute on
    Spark; the returned value is the canonical *requested* name so callers
    can log/route on it."""
    backend = canonical_backend(value)
    if not backend:
        raise EngineError("vector_backend_not_configured")
    if backend not in AVAILABLE_BACKENDS:
        raise EngineError("vector_backend_unsupported")
    return backend


def backend_status(value: str | None) -> BackendStatus:
    backend = canonical_backend(value)
    if not backend:
        return {
            "backend": "",
            "available": False,
            "reason": "vector backend is not configured",
            "advisory": None,
        }
    if backend not in AVAILABLE_BACKENDS:
        return {
            "backend": backend,
            "available": False,
            "reason": "unsupported vector backend",
            "advisory": None,
        }
    advisory = (
        None
        if backend == SPARK_BACKEND
        else f"'{backend}' executes on the Spark engine in this build"
    )
    return {
        "backend": backend,
        "available": True,
        "reason": "available",
        "advisory": advisory,
    }
