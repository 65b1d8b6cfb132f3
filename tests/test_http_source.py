"""HTTP push source (reference ``source_http_server.go:30-96`` +
jsonarray breaker ``source_python.go:71-103``): breaker parity, live
POST → spool → exactly-once stream, DSL wiring, ingest enrichment."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from vaero_spark.dsl import Vaero
from vaero_spark.sinks.writers import MemorySink
from vaero_spark.sources.http_server import HttpPushSource, break_json_array
from vaero_spark.streaming.engine import run_streaming_plan


def _post(port: int, endpoint: str, body: str) -> int:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{endpoint}", data=body.encode(), method="POST"
    )
    with urllib.request.urlopen(req) as resp:
        return resp.status


def test_jsonarray_breaker_parity():
    """Same splits as the reference's EventBreakJSONArray."""
    body = ' [ {"a": 1, "b": {"c": [1,2]}}, {"a": 2},{"a":3} ] '
    events = break_json_array(body)
    assert len(events) == 3
    assert json.loads(events[0]) == {"a": 1, "b": {"c": [1, 2]}}
    assert json.loads(events[2]) == {"a": 3}
    # single event, no trailing comma
    assert len(break_json_array('[{"x": "y"}]')) == 1
    # empty array → no events
    assert break_json_array("[]") == []
    # braces and commas inside STRING values must not affect the split
    # (documented improvement over the reference's brace-only counter)
    tricky = '[{"msg": "}, not a boundary {", "n": 1}, {"msg": "a\\"b,{", "n": 2}]'
    events = break_json_array(tricky)
    assert len(events) == 2
    assert json.loads(events[0])["n"] == 1
    assert json.loads(events[1])["msg"] == 'a"b,{'


def test_push_source_end_to_end(spark, tmp_path):
    """POST a JSON array; rows arrive through the spool stream enriched
    with ingest timestamp + remoteaddr (ref :76-88)."""
    src = HttpPushSource(
        port=0,
        endpoint="/logs",
        spool_dir=str(tmp_path / "spool"),
        clock=lambda: "2024-03-02T00:00:00Z",
    ).start()
    try:
        body = json.dumps(
            [
                {"hostname": "h1", "msg": "error at k=7", "severity": 3},
                {"hostname": "h2", "msg": "ok", "severity": 0},
            ]
        )
        assert _post(src.port, "/logs", body) == 200
        with pytest.raises(urllib.error.HTTPError):
            _post(src.port, "/nope", body)  # wrong endpoint → 404
        assert src.n_requests == 1 and src.n_events == 2

        stream = src.stream(spark, "hostname string, msg string, severity int")
        sink = MemorySink()
        q = (
            stream.writeStream.option(
                "checkpointLocation", str(tmp_path / "ckpt")
            )
            .foreachBatch(sink.foreach_batch())
            .start()
        )
        q.processAllAvailable()
        q.stop()
    finally:
        src.stop()

    rows = {r.hostname: r for r in sink.rows()}
    assert set(rows) == {"h1", "h2"}
    assert rows["h1"].msg == "error at k=7" and rows["h1"].severity == 3
    assert rows["h1"].timestamp == "2024-03-02T00:00:00Z"
    assert rows["h1"].remoteaddr.startswith("127.0.0.1:")


def test_http_source_via_dsl(spark, tmp_path):
    """DSL wiring: v.source('http_server', port=..., endpoint=...) →
    transforms → sink; the pipeline owns the server lifecycle."""
    v = Vaero().source(
        "http_server",
        port=0,
        endpoint="/ingest",
        spool_dir=str(tmp_path / "spool"),
        schema="hostname string, msg string",
    )
    v = v.filter_regexp("msg", "error").add("route", "errors")
    plan = v.sink("memory", name="out").plan()

    sink = MemorySink()
    pipe = run_streaming_plan(
        spark,
        plan,
        checkpoint_dir=str(tmp_path / "ckpt"),
        sink_factory=lambda name, node: sink,
    )
    try:
        port = plan.root.args["port"]  # resolved by the source
        _post(port, "/ingest", json.dumps([{"hostname": "h1", "msg": "an error"},
                                           {"hostname": "h2", "msg": "fine"}]))
        pipe.process_all()
    finally:
        pipe.stop()  # also shuts the server down
    got = sink.rows()
    assert [r.hostname for r in got] == ["h1"]
    assert got[0].route == "errors"
    assert plan.root.args["_server"]._server is None  # server stopped


def test_malformed_event_falls_back_to_raw(spark, tmp_path):
    src = HttpPushSource(port=0, endpoint="/", spool_dir=str(tmp_path / "spool")).start()
    try:
        _post(src.port, "/", "[not-json-at-all]")
        spooled = list((tmp_path / "spool").glob("*.jsonl"))
        assert spooled
        rec = json.loads(spooled[0].read_text().splitlines()[0])
        assert rec["raw"] == "not-json-at-all"
        assert "timestamp" in rec and "remoteaddr" in rec
    finally:
        src.stop()
