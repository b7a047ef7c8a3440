"""Eunomia-shaped authorization seam (``EUNOMIA_TYPE`` none|embedded|remote).

The reference gates MCP calls through Eunomia policies
(``/root/reference/README.md:336-339``): ``none`` (default) allows
everything, ``embedded`` evaluates a local policy file
(``EUNOMIA_POLICY_FILE``, default ``mcp_policies.json``), ``remote``
delegates to a Eunomia server (``EUNOMIA_REMOTE_URL``). This module keeps
that env contract and the decision point real; the remote mode is an
injectable-transport seam (the same pattern as the remote embed/rerank
clients) because no Eunomia server exists in this container.

Embedded policy file shape (a deliberately small, auditable subset):

    {"default": "allow" | "deny",
     "rules": [{"effect": "deny" | "allow",
                "tools": ["vector_search", ...] | absent (any),
                "actions": ["delete_collection", ...] | absent (any),
                "principals": ["agent-a", ...] | absent (any)}]}

First matching rule wins; no match falls to ``default``. Misconfiguration
fails LOUDLY at startup — a configured-but-unreadable policy silently
allowing everything is the worst failure mode an authorization layer has.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Mapping
from pathlib import Path

DEFAULT_POLICY_FILE = "mcp_policies.json"
AUTHZ_MODES = ("none", "embedded", "remote")

RemoteDecider = Callable[[str, str, "str | None"], bool]


class AuthorizationPolicy:
    """One ``check(tool, action, principal)`` decision point for dispatch."""

    def __init__(
        self,
        mode: str = "none",
        rules: list[dict] | None = None,
        default: str = "allow",
        remote: RemoteDecider | None = None,
    ):
        if mode not in AUTHZ_MODES:
            raise ValueError(f"invalid EUNOMIA_TYPE: {mode!r} (expected one of {AUTHZ_MODES})")
        if default not in ("allow", "deny"):
            raise ValueError(f"invalid policy default: {default!r}")
        if mode == "remote" and remote is None:
            # same loud-startup contract as the embedded file: a remote
            # authorizer that silently never gets consulted is allow-all
            raise ValueError(
                "EUNOMIA_TYPE=remote needs a remote decider transport "
                "(no Eunomia server in this environment; inject one)"
            )
        self.mode = mode
        self.rules = list(rules or [])
        self.default = default
        self._remote = remote

    @classmethod
    def from_env(
        cls,
        env: Mapping[str, str] | None = None,
        remote: RemoteDecider | None = None,
    ) -> "AuthorizationPolicy":
        import os

        env = os.environ if env is None else env
        mode = (env.get("EUNOMIA_TYPE") or "none").strip().lower()
        if mode == "embedded":
            path = Path(env.get("EUNOMIA_POLICY_FILE") or DEFAULT_POLICY_FILE)
            try:
                doc = json.loads(path.read_text())
            except (OSError, ValueError) as exc:
                raise ValueError(
                    f"EUNOMIA_TYPE=embedded but policy file {path} is unreadable: {exc}"
                ) from exc
            rules = doc.get("rules", [])
            if not isinstance(rules, list):
                raise ValueError(f"policy {path}: 'rules' must be a list")
            for r in rules:
                if r.get("effect") not in ("allow", "deny"):
                    raise ValueError(f"policy {path}: rule missing effect allow|deny: {r}")
                for dim in ("tools", "actions", "principals"):
                    wanted = r.get(dim)
                    # a bare string would make `value in wanted` a SUBSTRING
                    # test ("search" in "semantic_search" -> True) — the
                    # silent-misconfiguration mode this loud load exists to
                    # stop; require a list of strings or absence
                    if wanted is not None and (
                        not isinstance(wanted, list)
                        or not all(isinstance(x, str) for x in wanted)
                    ):
                        raise ValueError(
                            f"policy {path}: rule {dim} must be a LIST of "
                            f"strings, got {wanted!r}"
                        )
            return cls(mode="embedded", rules=rules, default=doc.get("default", "allow"))
        return cls(mode=mode, remote=remote)

    @staticmethod
    def _matches(rule: dict, tool: str, action: str, principal: str | None) -> bool:
        def hit(key: str, value: str | None) -> bool:
            wanted = rule.get(key)
            if wanted is None:
                return True  # absent dimension matches anything
            return value is not None and value in wanted

        return hit("tools", tool) and hit("actions", action) and hit("principals", principal)

    def check(self, tool: str, action: str, principal: str | None = None) -> bool:
        """True = allowed. Remote mode fails CLOSED on transport errors —
        an unreachable authorizer must deny, not shrug (the same rule the
        entitlement resolver applies to actions)."""
        if self.mode == "none":
            return True
        if self.mode == "remote":
            try:
                return bool(self._remote(tool, action, principal))
            except Exception:
                return False
        for rule in self.rules:
            if self._matches(rule, tool, action, principal):
                return rule["effect"] == "allow"
        return self.default == "allow"

    def describe(self) -> dict:
        """Static readiness snapshot for ``doctor``."""
        return {"mode": self.mode, "rules": len(self.rules), "default": self.default}
