"""Fluent pipeline DSL — same user surface as the reference's
``from vaero.stream import Vaero`` (``/root/reference/vaero/stream.py``),
rebuilt to emit our :class:`~vaero_spark.plans.Plan` IR.

Reference surface (stream.py lines cited per method): source, add (:47),
delete (:52), filter_regexp (:57), mask (:62), parse_regexp (:67),
rename (:72), select (:77), option (:83), option_file (:90),
secret (:101), sink. Branching works exactly like the reference: calling
two methods on the same handle gives the node two children
(``stream.py:111-124``); serialization nests branch chains as
sub-arrays (``stream.py:141-162``).

Extensions beyond the reference (north-star ops): ``sample``,
``window``, ``session_window``, ``dedup``, ``route`` — these have no
per-event analog in the reference engine and compile directly to Spark
windows/state.
"""

from __future__ import annotations

import tomllib
from typing import Any

from vaero_spark.plans.plan import OpNode, Plan


class Vaero:
    """Pipeline builder handle. Each transform returns a *new* handle
    pointing at the appended node; re-using an old handle forks a branch."""

    def __init__(self, interval: float = 10.0, _node: OpNode | None = None, _root: OpNode | None = None):
        self.interval = interval
        self._node = _node
        self._root = _root

    # ---- internal ----
    def _append(self, type_: str, op: str, args: dict[str, Any]) -> "Vaero":
        node = OpNode(type_, op, args)
        if self._node is None:
            root = node
        else:
            self._node.children.append(node)
            root = self._root
        return Vaero(self.interval, _node=node, _root=root or node)

    # ---- sources ----
    def source(self, op: str, **args: Any) -> "Vaero":
        args.setdefault("interval", self.interval)
        return self._append("source", op, args)

    # ---- reference transforms ----
    def add(self, path: str, value: Any) -> "Vaero":
        return self._append("tn", "add", {"path": path, "value": value})

    def delete(self, path: str) -> "Vaero":
        return self._append("tn", "delete", {"path": path})

    def rename(self, path: str, new_path: str) -> "Vaero":
        return self._append("tn", "rename", {"path": path, "new_path": new_path})

    def filter_regexp(self, path: str, regexp: str) -> "Vaero":
        return self._append("tn", "filter_regexp", {"path": path, "regexp": regexp})

    def mask(self, path: str, regexp: str, replace_expr: str) -> "Vaero":
        return self._append(
            "tn", "mask", {"path": path, "regexp": regexp, "replace_expr": replace_expr}
        )

    def parse_regexp(self, path: str, regexp: str) -> "Vaero":
        return self._append("tn", "parse_regexp", {"path": path, "regexp": regexp})

    def select(self, path: str) -> "Vaero":
        return self._append("tn", "select", {"path": path})

    # ---- north-star extensions ----
    def sample(self, rate_16ths: int, key: str = "text") -> "Vaero":
        """Deterministic hash sample keeping ``rate_16ths/16`` of rows
        (md5 last-hex-digit bucketing — portable across engines)."""
        return self._append("tn", "sample", {"rate_16ths": rate_16ths, "key": key})

    def window(self, duration: str, slide: str | None = None, key: str = "conv_id") -> "Vaero":
        return self._append("tn", "window", {"duration": duration, "slide": slide, "key": key})

    def session_window(self, gap: str, key: str = "conv_id") -> "Vaero":
        return self._append("tn", "session_window", {"gap": gap, "key": key})

    def dedup(self, keys: list[str] | None = None) -> "Vaero":
        return self._append("tn", "dedup", {"keys": keys or ["conv_id", "turn_idx"]})

    def watermark(self, column: str, delay: str) -> "Vaero":
        return self._append("tn", "watermark", {"column": column, "delay": delay})

    def annotate_quality(self, path: str = "text") -> "Vaero":
        """Training-data annotation stage: integer-exact quality columns
        (n_tokens, stop/punct ratios, quality_bp) over ``path`` —
        vectorized column expressions, tokenized once."""
        return self._append("tn", "annotate_quality", {"path": path})

    def annotate_lang(self, path: str = "text") -> "Vaero":
        """Language-ID annotation stage (stopword-profile argmax + CJK)."""
        return self._append("tn", "annotate_lang", {"path": path})

    # ---- config modifiers (mutate current node, like stream.py:83-109) ----
    def option(self, name: str, value: Any) -> "Vaero":
        if self._node is None:
            raise ValueError("option() before any node")
        self._node.args[name] = value
        return self

    def option_file(self, toml_path: str) -> "Vaero":
        if self._node is None:
            raise ValueError("option_file() before any node")
        with open(toml_path, "rb") as f:
            data = tomllib.load(f)
        self._node.args.update(data)
        return self

    def secret(self, command: str, secrets: list[str], cache_time_seconds: float = 3600, timeout: float = 10) -> "Vaero":
        if self._node is None:
            raise ValueError("secret() before any node")
        self._node.args["secret"] = {
            "command": command,
            "secrets": secrets,
            "cache_time_seconds": cache_time_seconds,
            "timeout": timeout,
        }
        return self

    # ---- sinks ----
    def sink(self, op: str, **args: Any) -> "Vaero":
        """Sink node; defaults mirror the reference's ``stream.py:36-38``
        (timestamp_key adapted to the transcripts schema's ``ts``)."""
        args.setdefault("batch_max_time", 300.0)
        args.setdefault("batch_max_bytes", 1_000_000)
        args.setdefault("filename_prefix", "%Y/%m/%d")
        args.setdefault("filename_format", "%s.log")
        args.setdefault("timestamp_key", "ts")
        return self._append("sink", op, args)

    def stdout(self) -> "Vaero":
        return self.sink("stdout")

    # ---- finalize ----
    def plan(self) -> Plan:
        if self._root is None:
            raise ValueError("empty pipeline")
        return Plan(self._root)

    def start(self) -> str:
        """Reference parity: ``Vaero.start()`` prints the serialized task
        graph (``stream.py:127-132``). We return it too."""
        text = self.plan().to_json()
        print(text)
        return text
