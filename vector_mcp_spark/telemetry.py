"""OTel-shaped telemetry seam — the reference's observability layer.

The reference exports OpenTelemetry traces controlled by ``ENABLE_OTEL``
plus the OTLP endpoint/keys/protocol env vars
(``/root/reference/README.md:329-335``). This container has neither the
``opentelemetry`` SDK nor a collector, so the seam keeps the CONFIG surface
and the span lifecycle real while the export side is injectable:

* ``TelemetryConfig.from_env`` reads the reference's exact env contract
  (``ENABLE_OTEL`` defaults true, like the reference).
* ``Telemetry.span`` times one dispatch and records (name, attributes,
  duration, status) — errors re-raise after being recorded, and a failing
  exporter is swallowed (telemetry must never break serving).
* The default sink is a bounded in-memory buffer (readable by tests and
  ``doctor``); pass ``exporter=`` to ship spans anywhere. When the real SDK
  is installed, an OTLP exporter is one injectable callable away — no code
  here changes.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from collections.abc import Callable, Mapping
from contextlib import contextmanager
from dataclasses import dataclass

_FALSEY = {"false", "0", "no", "off"}


@dataclass(frozen=True)
class TelemetryConfig:
    """The reference's telemetry env contract (README.md:329-335)."""

    enabled: bool = True
    endpoint: str | None = None
    public_key: str | None = None
    secret_key: str | None = None
    protocol: str | None = None

    @classmethod
    def from_env(cls, env: Mapping[str, str] | None = None) -> "TelemetryConfig":
        import os

        env = os.environ if env is None else env
        raw = env.get("ENABLE_OTEL")
        enabled = True if raw is None else raw.strip().lower() not in _FALSEY
        return cls(
            enabled=enabled,
            endpoint=env.get("OTEL_EXPORTER_OTLP_ENDPOINT") or None,
            public_key=env.get("OTEL_EXPORTER_OTLP_PUBLIC_KEY") or None,
            secret_key=env.get("OTEL_EXPORTER_OTLP_SECRET_KEY") or None,
            protocol=env.get("OTEL_EXPORTER_OTLP_PROTOCOL") or None,
        )


class Telemetry:
    """Span recorder with an injectable exporter and a bounded buffer.

    Thread-safe: transports dispatch tools/call on worker threads, so span
    buffer mutation is locked. Disabled telemetry records nothing and costs
    two branch checks per dispatch."""

    def __init__(
        self,
        config: TelemetryConfig | None = None,
        exporter: Callable[[dict], None] | None = None,
        max_buffer: int = 512,
    ):
        self.config = config or TelemetryConfig.from_env()
        self._exporter = exporter
        self._spans: deque[dict] = deque(maxlen=max_buffer)
        self._lock = threading.Lock()

    @contextmanager
    def span(self, name: str, **attributes):
        """Record one timed span. The body's exception re-raises after the
        span is recorded with ``status='error'``; a raising exporter never
        propagates (observability must not take the service down)."""
        if not self.config.enabled:
            yield None
            return
        rec = {"name": name, "attributes": dict(attributes)}
        t0 = time.perf_counter()
        try:
            yield rec
            rec["status"] = rec.get("status", "ok")
        except BaseException as exc:
            rec["status"] = "error"
            rec["error"] = f"{type(exc).__name__}: {exc}"[:200]
            raise
        finally:
            rec["duration_ms"] = round((time.perf_counter() - t0) * 1000.0, 3)
            with self._lock:
                self._spans.append(rec)
            if self._exporter is not None:
                try:
                    self._exporter(rec)
                except Exception:
                    pass

    def spans(self) -> list[dict]:
        with self._lock:
            return list(self._spans)

    def describe(self) -> dict:
        """Static readiness snapshot for ``doctor``: config shape only, no
        network probe (doctor's no-side-effects contract)."""
        return {
            "enabled": self.config.enabled,
            "endpoint_configured": self.config.endpoint is not None,
            "buffered_spans": len(self._spans),
            "exporter": "injected" if self._exporter is not None else "buffer",
        }
