"""DSL sink args → sink behavior (reference ``stream.py:36-38`` args
wired through ``default_sink_factory``): strftime translation, byte-cap
file splitting (``sinkNode.go:105-125``), last-event-ts filename
assignment (``sinkNode.go:190-225``), trigger clamping by
``batch_max_time`` (``sinkNode.go:242-254``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vaero_spark.dsl import Vaero
from vaero_spark.functions.timefmt import strftime_to_java, ts_strftime_column
from vaero_spark.sinks.writers import default_sink_factory
from vaero_spark.streaming.engine import derive_trigger_seconds, run_streaming_plan
from vaero_spark.testing.fixtures import write_transcripts_parquet


def test_strftime_translation():
    assert strftime_to_java("%Y/%m/%d") == "yyyy/MM/dd"
    assert strftime_to_java("%Y-%m-%dT%H:%M:%S") == "yyyy-MM-dd'T'HH:mm:ss"
    assert strftime_to_java("log-%H.txt") == "'log-'HH'.txt'"
    with pytest.raises(ValueError):
        strftime_to_java("%Q")  # unknown directive fails loudly
    with pytest.raises(ValueError):
        strftime_to_java("%s")  # epoch seconds needs ts_strftime_column


def test_epoch_seconds_filename_column(spark):
    from datetime import datetime, timezone

    df = spark.createDataFrame([(datetime(2024, 3, 1, 12, 0, 0),)], "ts timestamp")
    row = df.select(ts_strftime_column(F.col("ts"), "%s.log").alias("f")).first()
    want = int(datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc).timestamp())
    assert row.f == f"{want}.log"
    row2 = df.select(ts_strftime_column(F.col("ts"), "%Y/%m/part-%s").alias("f")).first()
    assert row2.f == f"2024/03/part-{want}"


def test_trigger_derivation():
    v = (
        Vaero(interval=600)
        .source("transcripts", path="/x")
        .add("k", 1)
        .sink("s3", name="out", batch_max_time=0.5)
    )
    # batch_max_time clamps the (larger) source poll interval
    assert derive_trigger_seconds(v.plan()) == 0.5
    v2 = Vaero(interval=2).source("transcripts", path="/x").sink("s3", name="o")
    assert derive_trigger_seconds(v2.plan()) == 2.0


def test_dsl_sink_args_change_flush_and_naming(spark, tmp_path):
    """A DSL pipeline with non-default caps observably changes output:
    %Y/%m prefixes, byte-capped file_seq groups, window_file = strftime
    of each group's last event ts."""
    src = tmp_path / "src"
    write_transcripts_parquet(str(src), n_files=2, n_turns=600, n_convs=12, seed=23)

    cap = 4000
    v = Vaero().source("transcripts", path=str(src), max_files_per_trigger=2)
    v = v.sink(
        "s3",
        name="out",
        batch_max_bytes=cap,
        filename_prefix="%Y/%m",
        filename_format="%s.log",
    )
    pipe = run_streaming_plan(
        spark,
        v.plan(),
        checkpoint_dir=str(tmp_path / "ckpt"),
        sink_factory=default_sink_factory(str(tmp_path / "sinks")),
    )
    pipe.process_all()
    pipe.stop()

    out = pipe.sinks["out"].read_committed(spark)
    rows = out.collect()
    assert rows
    # prefix honors the strftime arg (month granularity, '/'-separated)
    assert all(len(r.prefix) == 7 and r.prefix[4] == "/" for r in rows)
    # the byte cap split at least one prefix into multiple files
    n_groups = out.select("prefix", "file_seq").distinct().count()
    n_prefixes = out.select("prefix").distinct().count()
    assert n_groups > n_prefixes

    # per-(prefix, file_seq) group: JSON bytes within cap, and
    # window_file = epoch-seconds of the group's max ts + ".log"
    data_cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ev_bytes = F.octet_length(
        F.to_json(F.struct(*[F.col(c) for c in data_cols]), {"ignoreNullFields": "false"})
    ) + F.lit(1)
    g = (
        out.groupBy("prefix", "file_seq")
        .agg(
            F.sum(ev_bytes).alias("nbytes"),
            F.max(ev_bytes).alias("max_ev"),
            F.max("ts").alias("last_ts"),
            F.collect_set("window_file").alias("names"),
        )
        .collect()
    )
    from datetime import timezone

    for r in g:
        # block packing: a file holds at most cap bytes plus the one
        # event that straddles its lower boundary (documented divergence
        # from the reference's greedy reset — same bound)
        assert r.nbytes < cap + r.max_ev, (r.prefix, r.file_seq, r.nbytes)
        assert len(r.names) == 1  # one filename per flushed buffer
        epoch_s = int(r.last_ts.replace(tzinfo=timezone.utc).timestamp())
        assert r.names[0] == f"{epoch_s}.log"
