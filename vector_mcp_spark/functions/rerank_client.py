"""Remote cross-encoder rerank client — the second-stage scoring seam.

Modern retrieval stacks follow bi-encoder shortlist → cross-encoder rerank;
the reference stops at RRF fusion (``vector_api.py:518-566``), so this is a
forward-parity extension shaped exactly like
``functions/embedding_client.py``: config-gated, transport-injected,
offline-testable, stable error codes. The wire shape is the de-facto
rerank API (Cohere/Jina style): ``POST {"model", "query", "documents":
[texts], "top_n"}`` → ``{"results": [{"index": i, "relevance_score": s}]}``.

The client scores DRIVER-SIDE over an already-bounded shortlist (the same
≤1000-row contract as the reference's fusion loop and the MMR operator) —
never over a corpus. The distributed/deterministic twin used by oracle
runs is ``functions/rerank.py`` ``rerank_score_col``.
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


class RemoteRerankClient:
    """Callable ``(query, texts) -> scores`` aligned with the input order."""

    def __init__(
        self,
        endpoint: str,
        model: str,
        api_key: str | None = None,
        batch_size: int = 64,
        max_retries: int = 3,
        backoff_s: float = 0.5,
        timeout_s: float = 30.0,
        transport: Transport | None = None,
    ):
        if not endpoint or batch_size < 1 or max_retries < 0:
            raise EngineError("rerank_config_invalid")
        self.endpoint = endpoint
        self.model = model
        self.api_key = api_key
        self.batch_size = batch_size
        self.max_retries = max_retries
        self.backoff_s = backoff_s
        self.timeout_s = timeout_s
        self.transport = transport or _urllib_transport

    @classmethod
    def from_env(cls, env: dict | None = None) -> "RemoteRerankClient | None":
        env = env if env is not None else dict(os.environ)
        endpoint = env.get("VECTOR_MCP_SPARK_RERANK_ENDPOINT")
        if not endpoint:
            return None
        return cls(
            endpoint=endpoint,
            model=env.get("VECTOR_MCP_SPARK_RERANK_MODEL", "rerank-v3"),
            api_key=env.get("VECTOR_MCP_SPARK_RERANK_API_KEY"),
            batch_size=int(env.get("VECTOR_MCP_SPARK_RERANK_BATCH_SIZE", "64")),
        )

    def _request(self, query: str, batch: list[str]) -> list[float]:
        headers = {"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}
        payload = {
            "model": self.model,
            "query": query,
            "documents": batch,
            "top_n": len(batch),
        }
        last_err: Exception | None = None
        for attempt in range(self.max_retries + 1):
            try:
                resp = self.transport(self.endpoint, payload, headers, self.timeout_s)
                scores = [None] * len(batch)
                for row in resp["results"]:
                    idx = int(row["index"])
                    if not 0 <= idx < len(batch):
                        raise EngineError("rerank_batch_invalid")
                    scores[idx] = float(row["relevance_score"])
                if any(s is None for s in scores):
                    raise EngineError("rerank_batch_invalid")
                return scores  # type: ignore[return-value]
            except EngineError:
                raise  # validation failures are not transport faults
            except Exception as e:  # noqa: BLE001 — retry any transport fault
                last_err = e
                if attempt < self.max_retries:
                    time.sleep(self.backoff_s * (2**attempt))
        raise EngineError("rerank_endpoint_unavailable") from last_err

    def __call__(self, query: str, texts: Sequence[str]) -> list[float]:
        out: list[float] = []
        for start in range(0, len(texts), self.batch_size):
            out.extend(self._request(query, list(texts[start : start + self.batch_size])))
        if any(not math.isfinite(s) for s in out):
            raise EngineError("rerank_invalid")
        return out
