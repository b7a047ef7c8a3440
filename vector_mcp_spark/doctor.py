"""Static engine readiness check — no SparkSession, no JVM launch.

The reference ships a ``doctor`` that reports backend readiness from
configuration alone, without importing backend SDKs
(``vector_mcp/doctor.py:1-118``: config present → credential reference
resolvable → TLS profile valid, each a boolean in a JSON status dict).
The Spark engine's analogue checks the execution environment the same way:
everything here is import probes, env inspection and filesystem checks —
launching a JVM to find out the JVM is broken would defeat the purpose.

Run: ``python -m vector_mcp_spark.doctor [warehouse_root]`` → one JSON
line, exit 0 iff ``ok``.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
from pathlib import Path
from typing import Any


def _module_version(name: str) -> str | None:
    if importlib.util.find_spec(name) is None:
        return None
    try:
        import importlib.metadata as md

        return md.version(name)
    except Exception:  # noqa: BLE001 — version string is advisory
        return "unknown"


def doctor(warehouse_root: str | None = None) -> dict[str, Any]:
    """Readiness report: every check is a boolean; ``ok`` is their AND
    (warehouse/testdata checks only gate when requested/present).
    Never raises."""
    status: dict[str, Any] = {"backend": "spark"}

    pyspark_version = _module_version("pyspark")
    status["pyspark_available"] = pyspark_version is not None
    status["pyspark_version"] = pyspark_version

    java_home = os.environ.get("JAVA_HOME", "")
    java_bin = Path(java_home, "bin", "java") if java_home else None
    status["java_home_set"] = bool(java_home)
    status["java_executable"] = bool(java_bin and java_bin.exists())

    # the Arrow seam (pandas-UDF embedding/decode batches) needs both libs
    status["arrow_available"] = _module_version("pyarrow") is not None
    status["pandas_available"] = _module_version("pandas") is not None

    checks = [
        status["pyspark_available"],
        status["java_home_set"],
        status["java_executable"],
        status["arrow_available"],
        status["pandas_available"],
    ]

    if warehouse_root is not None:
        root = Path(warehouse_root)
        writable = False
        try:
            root.mkdir(parents=True, exist_ok=True)
            probe = root / ".doctor_probe"
            probe.write_text("")
            probe.unlink()
            writable = True
        except OSError:
            writable = False
        status["warehouse_writable"] = writable
        checks.append(writable)

    # remote embedding endpoint is OPTIONAL (hash embedder is the default);
    # when configured, the config shape must be complete — mirrors the
    # reference's credential-reference resolution check
    from vector_mcp_spark.functions.embedding_client import RemoteEmbeddingClient

    endpoint = os.environ.get("VECTOR_MCP_SPARK_EMBED_ENDPOINT", "")
    status["remote_embedding_configured"] = bool(endpoint)
    if endpoint:
        try:
            configured_ok = RemoteEmbeddingClient.from_env(dict(os.environ)) is not None
        except (ValueError, TypeError):  # malformed batch size etc.
            configured_ok = False
        status["remote_embedding_config_valid"] = configured_ok
        checks.append(configured_ok)

    # remote rerank endpoint follows the same optional-but-complete contract
    from vector_mcp_spark.functions.rerank_client import RemoteRerankClient

    rr_endpoint = os.environ.get("VECTOR_MCP_SPARK_RERANK_ENDPOINT", "")
    status["remote_rerank_configured"] = bool(rr_endpoint)
    if rr_endpoint:
        try:
            rr_ok = RemoteRerankClient.from_env(dict(os.environ)) is not None
        except (ValueError, TypeError):
            rr_ok = False
        status["remote_rerank_config_valid"] = rr_ok
        checks.append(rr_ok)

    # telemetry + authorization deployment seams (reference
    # README.md:329-339): report the configured shape; an embedded policy
    # that is configured but unreadable is a failed check (an authz layer
    # silently degrading to allow-all is the worst readiness lie)
    from vector_mcp_spark.telemetry import TelemetryConfig

    tcfg = TelemetryConfig.from_env()
    status["otel_enabled"] = tcfg.enabled
    status["otel_endpoint_configured"] = tcfg.endpoint is not None

    from vector_mcp_spark.authz import AUTHZ_MODES

    eunomia = (os.environ.get("EUNOMIA_TYPE") or "none").strip().lower()
    status["eunomia_type"] = eunomia
    if eunomia != "none":
        from vector_mcp_spark.authz import AuthorizationPolicy

        try:
            if eunomia == "remote":
                # remote needs an injected decider at serve time and nothing
                # in this deployment injects one, so construction WILL raise
                # — reporting ready here would be the readiness lie this
                # check exists to stop
                authz_ok = False
                status["eunomia_remote_requires_injected_decider"] = True
            else:
                authz_ok = AuthorizationPolicy.from_env(dict(os.environ)) is not None
        except ValueError:
            authz_ok = False
        status["eunomia_config_valid"] = authz_ok
        checks.append(authz_ok)

    status["ok"] = all(checks)
    return status


def main(argv: list[str] | None = None) -> int:
    args = sys.argv[1:] if argv is None else argv
    report = doctor(args[0] if args else None)
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
