"""Secrets execution + refresh (reference ``sourceNode.go:124-184``
protocol: secrets list on stdin, JSON map on stdout, merged into node
args; ``execute.go:84-96`` refresh loop)."""

from __future__ import annotations

import os
import stat
import textwrap
import time

import pytest

from vaero_spark.dsl import Vaero
from vaero_spark.secrets import SecretResolver, SecretsError, resolve_plan_secrets

# A stub fetcher honoring the aws_secrets.py contract: reads
# [{secret_name: arg_name}, ...] from stdin, prints {arg_name: value}.
# It bumps a counter file so tests can observe refreshes.
_FETCHER = textwrap.dedent(
    """\
    #!/usr/bin/env python3
    import json, sys, os
    pairs = json.loads(sys.stdin.read())
    counter = os.environ.get("VAERO_SECRET_COUNTER")
    n = 0
    if counter:
        n = int(open(counter).read()) if os.path.exists(counter) else 0
        n += 1
        open(counter, "w").write(str(n))
    out = {}
    for pair in pairs:
        for secret_name, arg_name in pair.items():
            out[arg_name] = f"{secret_name}-v{n}"
    print(json.dumps(out))
    """
)


@pytest.fixture()
def fetcher(tmp_path, monkeypatch):
    script = tmp_path / "fetch_secrets.py"
    script.write_text(_FETCHER)
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    counter = tmp_path / "counter"
    monkeypatch.setenv("VAERO_SECRET_COUNTER", str(counter))
    return str(script), str(counter)


def test_secret_resolution_into_args(fetcher):
    script, _ = fetcher
    args = {"host": "example.com"}
    r = SecretResolver(
        command=script, secrets=[{"okta_api": "token"}], target_args=args
    )
    r.apply()
    assert args["token"] == "okta_api-v1"
    assert args["host"] == "example.com"  # untouched


def test_secret_refresh_after_cache_expiry(fetcher):
    script, counter = fetcher
    args = {}
    r = SecretResolver(
        command=script,
        secrets=[{"s": "token"}],
        cache_time_seconds=0.3,
        target_args=args,
    )
    r.apply()
    assert args["token"] == "s-v1"
    assert not r.refresh_if_stale()  # within cache window
    time.sleep(0.35)
    assert r.refresh_if_stale()
    assert args["token"] == "s-v2"  # hot-swapped value
    assert int(open(counter).read()) == 2


def test_plan_level_resolution_via_dsl(fetcher):
    script, _ = fetcher
    v = Vaero().source("transcripts", path="/x").secret(
        script, [{"aws_key": "api_token"}], cache_time_seconds=60
    )
    plan = v.add("k", 1).sink("stdout", name="out").plan()
    resolvers = resolve_plan_secrets(plan)
    assert len(resolvers) == 1
    assert plan.root.args["api_token"] == "aws_key-v1"


def test_secret_command_failure_is_loud(tmp_path):
    bad = tmp_path / "bad.py"
    bad.write_text("#!/usr/bin/env python3\nimport sys; sys.exit(3)\n")
    bad.chmod(bad.stat().st_mode | stat.S_IEXEC)
    r = SecretResolver(command=str(bad), secrets=[], target_args={})
    with pytest.raises(SecretsError):
        r.apply()


def test_non_json_output_is_loud(tmp_path):
    bad = tmp_path / "noise.py"
    bad.write_text("#!/usr/bin/env python3\nprint('not json')\n")
    bad.chmod(bad.stat().st_mode | stat.S_IEXEC)
    r = SecretResolver(command=str(bad), secrets=[], target_args={})
    with pytest.raises(SecretsError):
        r.apply()
