"""Streaming pipeline runner.

The reference runs each pipeline as three goroutines joined by channels
(``/root/reference/execute/execute.go:35-47``). Ours is one
``StreamingQuery`` per pipeline: file/Iceberg stream source → the
compiled transform chain → a single ``foreachBatch`` that fans out to
every sink with the micro-batch persisted once (so the shared transform
prefix is computed once per epoch, the analog of the reference's
single transformNode feeding multiple sink capsules,
``transformNode.go:58-62`` — but exactly-once).

Checkpoint dir = job identity (reference: SQLite jobs table,
``cmd/util.go:144-177``). Restart with the same checkpoint resumes from
committed offsets; sinks dedup epoch re-delivery via commit markers.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from vaero_spark.compiler import apply_tn
from vaero_spark.plans.plan import OpNode, Plan
from vaero_spark.sources.transcripts import transcripts_stream


@dataclass
class StreamingPipeline:
    """A started pipeline: the query handle + its sinks (+ any push
    servers / pollers owned by the source)."""

    query: object  # StreamingQuery
    sinks: dict[str, object]
    servers: list = None  # push servers / pollers to stop with the query

    def process_all(self) -> None:
        self.query.processAllAvailable()

    def stop(self) -> None:
        self.query.stop()
        for s in self.servers or []:
            s.stop()


def _resolve_stream_source(spark: SparkSession, node: OpNode) -> DataFrame:
    if node.op == "transcripts":
        return transcripts_stream(
            spark, node.args["path"], node.args.get("max_files_per_trigger")
        )
    if node.op == "rate":
        return (
            spark.readStream.format("rate")
            .option("rowsPerSecond", str(node.args.get("rows_per_second", 1000)))
            .load()
        )
    if node.op == "http_server":
        # push source (ref source_http_server.go:30-96): start the
        # server now; its spool feeds an exactly-once file stream. The
        # live handle is stashed on the node so run_streaming_plan can
        # stop it with the query.
        from vaero_spark.sources.http_server import HttpPushSource

        src = HttpPushSource(
            port=int(node.args.get("port", 0)),
            endpoint=node.args.get("endpoint", "/"),
            spool_dir=node.args["spool_dir"],
        ).start()
        node.args["_server"] = src
        node.args["port"] = src.port  # resolved port for port=0
        return src.stream(spark, node.args["schema"])
    if node.op in ("paginated_api", "okta", "google_workspace"):
        # pull source (ref vaero_cdk + source_okta.py): a driver-side
        # poller with persistent cursor / rate limit / backoff / late
        # gate, spooling into an exactly-once file stream. okta and
        # google_workspace get a CONCRETE fetch_page preset (HTTP GET,
        # header auth via the secrets-resolved args, link/body-token
        # pagination — sources/connectors.py) unless the plan supplies
        # its own callable; `paginated_api` requires one.
        from vaero_spark.sources.connectors import (
            PRESET_EVENT_TIME_KEY,
            PRESET_FETCH_PAGE,
        )
        from vaero_spark.sources.paginated_api import (
            PaginatedApiSource,
            SteadyRateLimiter,
        )

        if node.op == "google_workspace" and node.args.get("apps"):
            # reference multi-app round-robin: one cursor per app, one
            # shared spool/stream (connectors.GoogleWorkspaceMultiAppSource)
            from vaero_spark.sources.connectors import (
                build_google_workspace_multi_source,
            )

            src = build_google_workspace_multi_source(
                node.args,
                event_time_key=node.args.get(
                    "event_time_key", PRESET_EVENT_TIME_KEY["google_workspace"]
                ),
                max_events_per_poll=node.args.get("max_events_per_poll"),
                rate=SteadyRateLimiter(float(node.args.get("rate_increment", 0.0))),
                secret_resolver=node.args.get("_secret_resolver"),
            )
            src.start_polling(float(node.args.get("interval", 10.0)))
            node.args["_server"] = src
            return src.stream(spark, node.args["schema"])
        fetch = node.args.get("fetch_page")
        if fetch is None:
            if node.op not in PRESET_FETCH_PAGE:
                raise ValueError("paginated_api source requires fetch_page=")
            fetch = PRESET_FETCH_PAGE[node.op](node.args)
        src = PaginatedApiSource(
            fetch_page=fetch,
            spool_dir=node.args["spool_dir"],
            cursor_path=node.args["cursor_path"],
            event_time_key=node.args.get(
                "event_time_key", PRESET_EVENT_TIME_KEY.get(node.op, "ts")
            ),
            max_events_per_poll=node.args.get("max_events_per_poll"),
            rate=SteadyRateLimiter(float(node.args.get("rate_increment", 0.0))),
            secret_resolver=node.args.get("_secret_resolver"),
        )
        src.start_polling(float(node.args.get("interval", 10.0)))
        node.args["_server"] = src
        return src.stream(spark, node.args["schema"])
    if node.op in ("s3", "object_store"):
        # pull source (ref source_s3.go:25-85: list prefix → GET → split
        # on newline): a driver-side poller over a ListingObjectStore
        # client, spooling object versions into an exactly-once file
        # stream. The sandbox store is LocalDirObjectStore; a real S3
        # deployment swaps the client (args["store"]) — the listing /
        # change-detection / spool logic is identical.
        from vaero_spark.sources.object_store import (
            LocalDirObjectStore,
            ObjectLineSource,
        )

        store = node.args.get("store")
        if store is None:
            store = LocalDirObjectStore(node.args["bucket_dir"])
        src = ObjectLineSource(
            store=store,
            prefix=node.args.get("prefix", ""),
            spool_dir=node.args["spool_dir"],
            seen_path=node.args["seen_path"],
        )
        src.start_polling(float(node.args.get("interval", 10.0)))
        node.args["_server"] = src
        return src.stream(spark, node.args["schema"])
    raise ValueError(f"unknown stream source {node.op!r}")


def compile_stream(
    spark: SparkSession, plan: Plan
) -> tuple[DataFrame, list[tuple[str, OpNode, DataFrame]]]:
    """Compile the plan against a streaming source. Returns (source_df,
    [(sink_name, sink_node, sink_df), ...])."""
    root = plan.root
    src = _resolve_stream_source(spark, root)
    taps: list[tuple[str, OpNode, DataFrame]] = []
    ctr = [0]

    def walk(node: OpNode, df: DataFrame) -> None:
        while True:
            if node.type == "tn":
                df = apply_tn(df, node.op, node.args)
            elif node.type == "sink":
                name = node.args.get("name") or f"{node.op}#{ctr[0]}"
                ctr[0] += 1
                taps.append((name, node, df))
            if not node.children:
                return
            if len(node.children) == 1:
                node = node.children[0]
                continue
            for child in node.children:
                walk(child, df)
            return

    for child in root.children:
        walk(child, src)
    return src, taps


def derive_trigger_seconds(plan: Plan) -> float | None:
    """Trigger policy from the DSL args: the source's poll ``interval``
    (``/root/reference/execute/execute.go:99-110``) CLAMPED by the
    smallest sink ``batch_max_time`` (the reference's time-cap flush
    fires ``batch_max_time`` after buffer creation,
    ``sinkNode.go:242-254`` — our epoch IS the flush unit, so the query
    must trigger at least that often). None when the plan carries no
    timing args (ASAP triggers — the default in tests).
    """
    bounds = []
    interval = plan.root.args.get("interval")
    if interval:
        bounds.append(float(interval))

    def walk(node: OpNode) -> None:
        if node.type == "sink" and node.args.get("batch_max_time"):
            bounds.append(float(node.args["batch_max_time"]))
        for ch in node.children:
            walk(ch)

    walk(plan.root)
    return min(bounds) if bounds else None


def _sink_chains(plan: Plan) -> list[tuple[str, OpNode, list[OpNode]]]:
    """[(sink_name, sink_node, tn-nodes from source to sink), ...] —
    a post-sink continuation keeps extending the same chain
    (``transformNode.go:58-62``), a >1-child node forks it."""
    chains: list[tuple[str, OpNode, list[OpNode]]] = []
    ctr = [0]

    def walk(node: OpNode, acc: list[OpNode]) -> None:
        while True:
            if node.type == "tn":
                acc = acc + [node]
            elif node.type == "sink":
                name = node.args.get("name") or f"{node.op}#{ctr[0]}"
                ctr[0] += 1
                if any(name == n for n, _, _ in chains):
                    raise ValueError(
                        f"duplicate sink name {name!r}: two branches would "
                        "silently collapse into one output — give each sink "
                        "a distinct name="
                    )
                chains.append((name, node, acc))
            if not node.children:
                return
            if len(node.children) == 1:
                node = node.children[0]
                continue
            for child in node.children:
                walk(child, acc)
            return

    for child in plan.root.children:
        walk(child, [])
    return chains


def _apply_chain(ops: list[OpNode]):
    def fn(df: DataFrame) -> DataFrame:
        for node in ops:
            df = apply_tn(df, node.op, node.args)
        return df

    return fn


def run_streaming_plan(
    spark: SparkSession,
    plan: Plan,
    checkpoint_dir: str,
    sink_factory: Callable[[str, OpNode], object],
    trigger_seconds: float | str | None = None,
    query_name: str = "vaero_pipeline",
) -> StreamingPipeline:
    """Start the pipeline as ONE streaming query with multi-sink fan-out.

    ``trigger_seconds="auto"`` derives the trigger from the plan's DSL
    timing args (source interval clamped by sink batch_max_time) via
    :func:`derive_trigger_seconds`; None keeps ASAP triggers.

    Single sink: the whole chain stays stream-side (cross-epoch state —
    watermarks, dedup, windows — works). Multiple sinks: one
    foreachBatch fan-out via :func:`run_streaming_fanout` — the longest
    common tn prefix is applied ONCE per epoch and persisted, each
    branch's suffix derives from it (the reference's single
    transformNode feeding every sink, ``transformNode.go:36-62``, with
    exactly-once). Branch suffixes run batch-mode per epoch, so they
    must be stateless transforms (the reference's branches are exactly
    that); put stateful ops before the fork or use a single-sink plan.
    """
    if trigger_seconds == "auto":
        trigger_seconds = derive_trigger_seconds(plan)
    # Plan-compatibility gate BEFORE any resolution mutates args:
    # Spark's checkpoint protects offsets/state, not transform
    # semantics — resuming a checkpoint with a changed op chain would
    # silently alter outputs mid-stream (SURVEY §3 lifecycle contract).
    from vaero_spark.plans.plan import plan_fingerprint

    _validate_checkpoint_plan(checkpoint_dir, plan_fingerprint(plan), plan)
    # Execute secrets specs now and keep resolvers for per-epoch refresh
    # (reference: getSecrets at job start + the execute.go:84-96 loop).
    from vaero_spark.secrets import resolve_plan_secrets

    resolvers = resolve_plan_secrets(plan)
    chains = _sink_chains(plan)
    if not chains:
        raise ValueError("plan has no sinks")
    src = _resolve_stream_source(spark, plan.root)
    sinks = {name: sink_factory(name, node) for name, node, _ in chains}
    servers = [plan.root.args["_server"]] if plan.root.args.get("_server") else []

    def _with_refresh(inner):
        if not resolvers:
            return inner

        def fb(df, epoch_id):
            for r in resolvers:
                r.refresh_if_stale()
            inner(df, epoch_id)

        return fb

    # Single-sink fast path: hand the DataFrame straight to foreachBatch.
    if len(chains) == 1:
        name, node, ops = chains[0]
        df = _apply_chain(ops)(src)
        writer = (
            df.writeStream.queryName(query_name)
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(_with_refresh(sinks[name].foreach_batch()))
        )
        if trigger_seconds:
            writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
        return StreamingPipeline(writer.start(), sinks, servers=servers)

    # Multi-sink: factor the longest common tn prefix (by node identity)
    # into the persisted common_fn; each branch applies only its suffix.
    prefix_len = 0
    shortest = min(len(ops) for _, _, ops in chains)
    while prefix_len < shortest and all(
        ops[prefix_len] is chains[0][2][prefix_len] for _, _, ops in chains
    ):
        prefix_len += 1
    common = chains[0][2][:prefix_len]
    branch_fns = {
        name: _apply_chain(ops[prefix_len:]) for name, _, ops in chains
    }
    pipe = run_streaming_fanout(
        spark,
        src,
        branch_fns,
        sink_factory=lambda name: sinks[name],
        checkpoint_dir=checkpoint_dir,
        trigger_seconds=trigger_seconds,
        query_name=query_name,
        common_fn=_with_refresh_common(resolvers, _apply_chain(common)),
    )
    pipe.servers = servers
    return pipe


def _with_refresh_common(resolvers, common_fn):
    if not resolvers:
        return common_fn

    def fn(df: DataFrame) -> DataFrame:
        for r in resolvers:
            r.refresh_if_stale()
        return common_fn(df)

    return fn


def run_streaming_fanout(
    spark: SparkSession,
    source_stream: DataFrame,
    branch_fns: dict[str, Callable[[DataFrame], DataFrame]],
    sink_factory: Callable[[str], object],
    checkpoint_dir: str,
    trigger_seconds: float | None = None,
    query_name: str = "vaero_fanout",
    common_fn: Callable[[DataFrame], DataFrame] | None = None,
) -> StreamingPipeline:
    """Multi-sink fan-out inside one query: per epoch, persist the batch
    once, apply each branch's (batch-mode) transform chain, write to its
    sink idempotently keyed by (epoch, sink). This is the Spark shape of
    the reference's branch construct (``transformNode.go:36-62``) with
    exactly-once instead of fire-and-forget.

    ``common_fn`` is the shared transform prefix (the reference's single
    transformNode feeding every sink, ``transformNode.go:58-62``): it is
    applied ONCE per epoch and its *output* is persisted, so N branches
    never recompute the expensive chain — with regex-heavy transforms
    this halves (or better) per-epoch CPU vs putting the prefix inside
    each branch.

    Branch writes run CONCURRENTLY (one thread per sink submitting its
    Spark job): the branches are independent jobs over the same
    persisted batch, and serial submission left the cluster idle during
    each write's scheduling/commit tail — the reference gets the same
    overlap from its per-sink flush goroutines (``sinkNode.go:133-173``).
    Exactly-once is unaffected: each sink's epoch commit is independent
    and idempotent, and a failed branch fails the whole batch (so the
    epoch is redelivered and the already-committed sinks dedup it)."""
    sinks = {name: sink_factory(name) for name in branch_fns}

    def fan_out(batch_df: DataFrame, epoch_id: int) -> None:
        from concurrent.futures import ThreadPoolExecutor

        shared = common_fn(batch_df) if common_fn else batch_df
        # concurrent branches do NOT double-compute the persisted batch:
        # the block manager's per-partition cache locks make the second
        # job's tasks wait for in-flight computation instead of redoing it
        shared.persist()

        def run_branch(item):
            name, fn = item
            out = fn(shared)
            if hasattr(sinks[name], "write"):
                sinks[name].write(out, epoch_id)
            else:
                sinks[name].foreach_batch()(out, epoch_id)

        try:
            with ThreadPoolExecutor(max_workers=len(branch_fns)) as pool:
                # list() re-raises the first branch exception
                list(pool.map(run_branch, branch_fns.items()))
        finally:
            shared.unpersist()

    writer = (
        source_stream.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(fan_out)
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return StreamingPipeline(writer.start(), sinks)


def _validate_checkpoint_plan(checkpoint_dir: str, fp: str, plan: Plan) -> None:
    """First start: record {fingerprint, plan} beside the checkpoint.
    Resume: refuse a semantically different plan (the control-plane
    analog of the reference's task_graph column — its SQLite row IS the
    job identity, ``cmd/util.go:144-177``)."""
    import json as _json

    meta_path = os.path.join(checkpoint_dir, "_vaero_plan.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            stored = _json.load(f)
        if stored["fingerprint"] != fp:
            raise ValueError(
                f"checkpoint {checkpoint_dir!r} belongs to a different pipeline "
                f"(stored plan fingerprint {stored['fingerprint']}, this plan "
                f"{fp}): resuming would silently change semantics mid-stream. "
                "Use a fresh checkpoint dir for the new plan, or rerun the "
                "original plan."
            )
        return
    os.makedirs(checkpoint_dir, exist_ok=True)
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump({"fingerprint": fp, "plan": plan.serialize()}, f, default=str)
    os.replace(tmp, meta_path)


def checkpoint_root(base: str, job_name: str) -> str:
    path = os.path.join(base, "checkpoints", job_name)
    os.makedirs(path, exist_ok=True)
    return path
