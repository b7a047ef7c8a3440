"""Remote batch-embedding client — the real-model seam behind
``embed_documents(model=...)``.

Mirrors the reference's embedding-model contract
(``vector_mcp/vectordb/base.py:34-75``): one batched request per chunk of
missing-vector docs, strict response validation (count match →
``embedding_batch_invalid``; non-finite / inconsistent dimension →
``embedding_invalid``). The wire shape is the de-facto-standard OpenAI
``POST /v1/embeddings`` JSON (``{"model": ..., "input": [texts]}`` →
``{"data": [{"embedding": [...]}, ...]}``).

Config-gated by design: nothing constructs this client implicitly. Oracle
runs and tests always use the deterministic hash embedder; this class exists
so a production deployment can drop a real endpoint into the same
``model=`` callable seam without touching any operator. The ``transport``
parameter injects the HTTP layer (tests use a fake; default is stdlib
urllib), keeping the retry/batching/validation logic testable offline.

Executor-side usage note: pass ``RemoteEmbeddingClient(...)`` as
``embed_documents(df, model=client)`` — it pickles into the mapInPandas
closure, so each executor opens its own connections; ``batch_size`` bounds
request payloads and Arrow batch size bounds rows in flight.
"""

from __future__ import annotations

import json
import math
import os
import time
from collections.abc import Callable, Sequence

from vector_mcp_spark.validation import EngineError

Transport = Callable[[str, dict, dict, float], dict]


def _urllib_transport(url: str, payload: dict, headers: dict, timeout_s: float) -> dict:
    import urllib.request

    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode("utf-8"),
        headers={"Content-Type": "application/json", **headers},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout_s) as resp:  # noqa: S310
        return json.loads(resp.read().decode("utf-8"))


class RemoteEmbeddingClient:
    """Callable ``texts -> vectors`` for ``embed_documents(model=...)``."""

    def __init__(
        self,
        endpoint: str,
        model: str,
        api_key: str | None = None,
        batch_size: int = 256,
        max_retries: int = 3,
        backoff_s: float = 0.5,
        timeout_s: float = 30.0,
        transport: Transport | None = None,
    ):
        if not endpoint or batch_size < 1 or max_retries < 0:
            raise EngineError("embedding_config_invalid")
        self.endpoint = endpoint
        self.model = model
        self.api_key = api_key
        self.batch_size = batch_size
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.timeout_s = timeout_s
        self.transport = transport or _urllib_transport

    @classmethod
    def from_env(cls, env: dict | None = None) -> "RemoteEmbeddingClient | None":
        """The config gate: returns None (→ callers keep the deterministic
        hash embedder) unless an endpoint is explicitly configured."""
        env = env if env is not None else dict(os.environ)
        endpoint = env.get("VECTOR_MCP_SPARK_EMBED_ENDPOINT")
        if not endpoint:
            return None
        return cls(
            endpoint=endpoint,
            model=env.get("VECTOR_MCP_SPARK_EMBED_MODEL", "text-embedding-3-small"),
            api_key=env.get("VECTOR_MCP_SPARK_EMBED_API_KEY"),
            batch_size=int(env.get("VECTOR_MCP_SPARK_EMBED_BATCH_SIZE", "256")),
        )

    def _request(self, batch: list[str]) -> list[list[float]]:
        headers = {"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}
        payload = {"model": self.model, "input": batch}
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                resp = self.transport(self.endpoint, payload, headers, self.timeout_s)
                data = resp["data"]
                return [[float(v) for v in row["embedding"]] for row in data]
            except Exception as e:  # noqa: BLE001 — retry any transport fault
                last_err = e
                if attempt < self.max_retries:
                    time.sleep(self.backoff_s * (2**attempt))
        raise EngineError("embedding_endpoint_unavailable") from last_err

    def __call__(self, texts: Sequence[str]) -> list[list[float]]:
        out: list[list[float]] = []
        for start in range(0, len(texts), self.batch_size):
            batch = list(texts[start : start + self.batch_size])
            vecs = self._request(batch)
            if len(vecs) != len(batch):
                raise EngineError("embedding_batch_invalid")  # base.py:63-64
            out.extend(vecs)
        dims = {len(v) for v in out}
        if out and (
            dims == {0}
            or len(dims) != 1
            or any(not math.isfinite(x) for v in out for x in v)
        ):
            raise EngineError("embedding_invalid")  # base.py:66-75
        return out
