"""Plan/DSL serialization — shape parity with the reference's task-graph
JSON (`vaero/stream.py:141-162`: depth-first array, branches as nested
sub-arrays)."""

from __future__ import annotations

import json

from vaero_spark.dsl import Vaero
from vaero_spark.plans.plan import plan_from_json


def test_linear_plan_serializes_flat():
    v = (
        Vaero(interval=5)
        .source("random")
        .rename("hostname", "host")
        .add("newfield", 42)
        .stdout()
    )
    arr = json.loads(v.plan().to_json())
    assert [n["op"] for n in arr] == ["random", "rename", "add", "stdout"]
    assert arr[0]["args"]["interval"] == 5
    assert arr[1] == {"type": "tn", "op": "rename", "args": {"path": "hostname", "new_path": "host"}}
    assert arr[2]["args"]["value"] == 42


def test_branch_plan_nests_subarrays():
    # route_pipe.py shape: source → [branch1: add → sink] [branch2: sink]
    v = Vaero().source("random")
    v.add("route", "a").stdout()
    v.stdout()
    arr = json.loads(v.plan().to_json())
    assert arr[0]["op"] == "random"
    assert isinstance(arr[1], list) and isinstance(arr[2], list)
    assert [n["op"] for n in arr[1]] == ["add", "stdout"]
    assert [n["op"] for n in arr[2]] == ["stdout"]


def test_plan_roundtrip():
    v = Vaero().source("random").filter_regexp("severity", "info")
    v.add("x", 1).stdout()
    v.mask("msg", "a+", "_").stdout()
    text = v.plan().to_json()
    again = plan_from_json(text).to_json()
    assert json.loads(text) == json.loads(again)


def test_option_mutates_current_node():
    v = Vaero().source("http_server").option("port", 8080).option("endpoint", "/collect")
    arr = json.loads(v.plan().to_json())
    assert arr[0]["args"]["port"] == 8080
    assert arr[0]["args"]["endpoint"] == "/collect"


def test_sink_defaults_match_reference():
    # stream.py:36-37 defaults: 1 MB, 300 s, %Y/%m/%d prefix
    v = Vaero().source("random").sink("s3", bucket="b")
    arr = json.loads(v.plan().to_json())
    sink = arr[-1]["args"]
    assert sink["batch_max_bytes"] == 1_000_000
    assert sink["batch_max_time"] == 300.0
    assert sink["filename_prefix"] == "%Y/%m/%d"


def test_option_file_merges_toml(tmp_path):
    """option_file merges flat TOML key=value into the current node's
    args (reference: stream.py:90-95, pipelines/config/okta.toml)."""
    from vaero_spark.dsl import Vaero

    toml = tmp_path / "cfg.toml"
    toml.write_text('domain = "example.okta.com"\ninterval = 30\n')
    v = Vaero().source("random").option_file(str(toml))
    assert v._node.args["domain"] == "example.okta.com"
    assert v._node.args["interval"] == 30


def test_secret_attaches_spec():
    """secret() attaches a fetch-subprocess spec to the node (reference:
    stream.py:101-109); execution is driver-side, outside dataflow."""
    from vaero_spark.dsl import Vaero

    v = Vaero().source("random").secret(
        "python -m scripts.aws_secrets", ["api_token"], cache_time_seconds=600
    )
    s = v._node.args["secret"]
    assert s["secrets"] == ["api_token"]
    assert s["cache_time_seconds"] == 600
