"""Sink registry + stub-sink parity (reference: integrations/sinks/*)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from vaero_spark.dsl import Vaero
from vaero_spark.sinks.writers import (
    ExactlyOnceParquetSink,
    HttpStubSink,
    MemorySink,
    StdoutSink,
    default_sink_factory,
)
from vaero_spark.sources.transcripts import load_transcripts
from vaero_spark.streaming.engine import run_streaming_plan

SF = "/root/testdata/sf0.001"


def test_default_sink_factory_mapping(tmp_path):
    f = default_sink_factory(str(tmp_path))

    class N:  # minimal OpNode stand-in
        def __init__(self, op):
            self.op = op

    assert isinstance(f("out", N("s3")), ExactlyOnceParquetSink)
    assert isinstance(f("out", N("datadog")), HttpStubSink)
    assert isinstance(f("out", N("memory")), MemorySink)
    assert isinstance(f("out", N("stdout")), StdoutSink)


def test_dsl_pipeline_to_stub_sink(spark, tmp_path):
    """Full DSL → streaming plan → datadog-style stub sink: rows that
    pass the route filter must be delivered per epoch (reference:
    route_pipe.py fan-out to a stub sink)."""
    inp = str(tmp_path / "in")
    load_transcripts(spark, SF).repartition(2).write.parquet(inp)

    v = Vaero().source("transcripts", path=inp, max_files_per_trigger=1)
    v.filter_regexp("role", "^user$").sink("datadog", name="dd")
    plan = v.plan()

    sinks = {}

    def factory(name, node):
        sinks[name] = default_sink_factory(str(tmp_path))(name, node)
        return sinks[name]

    pipe = run_streaming_plan(
        spark, plan, str(tmp_path / "ckpt"), sink_factory=factory
    )
    pipe.process_all()
    pipe.stop()

    dd = sinks["dd"]
    assert isinstance(dd, HttpStubSink)
    expected = (
        load_transcripts(spark, SF).filter(F.col("role") == "user").count()
    )
    assert sum(e["rows"] for e in dd.epochs) == expected
    assert len(dd.epochs) == 2  # one epoch per input file


def test_stub_sink_never_counts(spark, transcripts_df):
    """HttpStubSink must run ONE delivery job per epoch with the row
    count observed on it — a separate count() would re-run the branch's
    whole transform chain a second time per epoch."""
    sink = HttpStubSink("datadog")
    df = transcripts_df.limit(7)
    _DF = type(df)
    saved = {m: getattr(_DF, m) for m in ("count", "collect", "toPandas")}

    def banned(name):
        def _f(self, *a, **k):
            raise AssertionError(f"stub sink called .{name}()")

        return _f

    for m in saved:
        setattr(_DF, m, banned(m))
    try:
        rec = sink.write(df, epoch_id=0)
    finally:
        for m, fn in saved.items():
            setattr(_DF, m, fn)
    assert rec["rows"] == 7
    assert sink.epochs == [{"service": "datadog", "epoch": 0, "rows": 7}]


def test_iceberg_sink_guard(spark, transcripts_df):
    """Without the Iceberg runtime the sink must fail loudly, not write."""
    import pytest as _pytest

    from vaero_spark.sinks.writers import IcebergSink, iceberg_available

    if iceberg_available(spark):
        _pytest.skip("Iceberg runtime present; guard not applicable")
    with _pytest.raises(RuntimeError, match="Iceberg runtime"):
        IcebergSink("local.db.t").write(transcripts_df, 0)
