"""Secrets execution + refresh.

The reference attaches a secrets-fetch subprocess spec to a node
(``/root/reference/vaero/stream.py:101-109``) and the Go engine runs it
at job start — writing the ``secrets`` list as JSON to the command's
stdin and parsing ``{"arg": value}`` JSON from its stdout
(``execute/sourceNode.go:124-176``), merging the result into the node's
args (``applySecrets``, ``sourceNode.go:180-184``). The source's poll
loop re-runs the command when ``cache_time_seconds`` elapses and
hot-swaps the config (``execute/execute.go:84-96``). The stock fetcher
(``scripts/aws_secrets.py``) reads a ``[{secret_name: arg_name}, ...]``
list and prints the resolved map.

Same protocol here: :class:`SecretResolver` is created per node that
carries a ``secret`` spec, fetched once at plan-resolve time and
refreshed by callers (the streaming engine per epoch, pull sources per
poll) via :meth:`refresh_if_stale` — args dicts are updated IN PLACE so
sources that read their config per poll see fresh credentials.
"""

from __future__ import annotations

import json
import subprocess
import time
from dataclasses import dataclass, field


class SecretsError(RuntimeError):
    pass


@dataclass
class SecretResolver:
    """Executes one node's secrets spec and keeps its target args fresh."""

    command: str
    secrets: list  # [{secret_name: arg_name}, ...] — stdin contract
    cache_time_seconds: float = 3600.0
    timeout: float = 10.0
    target_args: dict = field(default_factory=dict)
    _last_refresh: float = field(default=0.0, repr=False)

    @classmethod
    def from_spec(cls, spec: dict, target_args: dict) -> "SecretResolver":
        return cls(
            command=spec["command"],
            secrets=spec["secrets"],
            cache_time_seconds=float(spec.get("cache_time_seconds", 3600)),
            timeout=float(spec.get("timeout", 10)),
            target_args=target_args,
        )

    def fetch(self) -> dict:
        """Run the command once: secrets list on stdin, JSON map on
        stdout (the ``aws_secrets.py`` contract). The command may carry
        arguments ('python3 fetch.py' — shlex-split, no shell); a
        missing executable raises SecretsError like every other failure
        mode, not a bare OSError."""
        import shlex

        argv = shlex.split(self.command)
        try:
            proc = subprocess.run(
                argv,
                input=json.dumps(self.secrets).encode(),
                capture_output=True,
                timeout=self.timeout,
                check=True,
            )
        except subprocess.CalledProcessError as e:
            raise SecretsError(
                f"secrets command {self.command!r} failed: {e.stderr.decode()[:500]}"
            ) from e
        except subprocess.TimeoutExpired as e:
            raise SecretsError(f"secrets command {self.command!r} timed out") from e
        except OSError as e:
            raise SecretsError(f"secrets command {self.command!r}: {e}") from e
        try:
            out = json.loads(proc.stdout.decode())
        except json.JSONDecodeError as e:
            raise SecretsError(
                f"secrets command {self.command!r} printed non-JSON output"
            ) from e
        if not isinstance(out, dict):
            raise SecretsError("secrets command must print a JSON object")
        return out

    def apply(self) -> dict:
        """Fetch and merge into the node args IN PLACE (applySecrets
        semantics: plain key → value assignment)."""
        resolved = self.fetch()
        self.target_args.update(resolved)
        self._last_refresh = time.time()
        return resolved

    def refresh_if_stale(self) -> bool:
        """Re-run the command when the cache window elapsed (the
        ``execute.go:84-96`` refresh loop). Returns True if refreshed."""
        if time.time() - self._last_refresh <= self.cache_time_seconds:
            return False
        self.apply()
        return True


def resolve_plan_secrets(plan) -> list[SecretResolver]:
    """Walk the plan; for every node carrying a ``secret`` spec, execute
    it now and merge the values into that node's args. Returns the live
    resolvers so the engine can refresh them per epoch."""
    resolvers: list[SecretResolver] = []

    def walk(node) -> None:
        spec = node.args.get("secret")
        if spec:
            r = SecretResolver.from_spec(spec, node.args)
            r.apply()
            resolvers.append(r)
            # stash the live resolver on the node so pull sources can
            # refresh per POLL, not just per epoch (execute.go:84-96)
            node.args["_secret_resolver"] = r
        for ch in node.children:
            walk(ch)

    walk(plan.root)
    return resolvers
