#!/usr/bin/env python
"""A/B the cost of per-key idle-timeout arming in the custom-state ops.

Round 3 added ``_arm_idle_timeout`` (idle-state eviction) to
``routing_counters`` / ``stateful_dedup`` / ``byte_cap_flush``; the
round-3 driver artifact then showed stream_counters +40% vs round 2 —
plausibly a host-churn window, but the arming was the only new code on
that path. This tool answers it with an ABBA order-balanced A/B: the
SAME gate query, fresh JVM per trial, with arming on (production
default) vs off (``VAERO_DISABLE_IDLE_EVICTION=1`` — the knob exists
only for this measurement).

NEGATIVE CONTROL: ``stream_open_sessions``. Its ``_session_tracker``
arms its timeout UNCONDITIONALLY — the timeout IS the session-close
semantics (the time-cap flush), not idle eviction, so the knob cannot
touch that code path and both variants run byte-identical plans. Any
armed-vs-noarm difference it reports is BY CONSTRUCTION the host's
noise floor at measurement time. (Round 4 listed its +8.6% as
"arming overhead" — a misreading: the knob never touched it, exactly
like ``stream_dedup``'s equally impossible −10.1% "speedup" the same
run. The knob-affected query with per-key state of the same shape,
``stream_counters``, read +0.8%.)

    python tools/ab_eviction.py                 # full matrix → BENCH/eviction_ab_r5.json
    python tools/ab_eviction.py --trial stream_counters armed   # one subprocess trial

All I/O on tmpfs (TMPDIR=/dev/shm) per the bench protocol.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

QUERIES = ("stream_counters", "stream_dedup")  # knob-affected paths
CONTROL = "stream_open_sessions"  # knob-untouched (module docstring)
VARIANTS = ("armed", "noarm")
TRIALS = 3


def run_trial(query: str, variant: str, sf_dir: str, cores: int) -> None:
    assert variant in VARIANTS
    # the env var is read at import time in the Python workers; it is
    # already set by the parent for noarm subprocesses
    import __spark_entry__ as entry
    from vaero_spark.session import get_spark

    spark = get_spark(
        f"ab_eviction_{query}_{variant}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra_conf={"spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        )},
    )
    fn = entry.queries()[query]
    # warm-up: a cheap batch pass compiles codegen paths outside the
    # timed window (matches bench.py's protocol)
    entry.queries()["t_rename_delete"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    elapsed = time.perf_counter() - t0
    print(json.dumps({"query": query, "variant": variant, "sec": round(elapsed, 3)}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trial", nargs=2, metavar=("QUERY", "VARIANT"))
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--trials", type=int, default=TRIALS)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    if args.trial:
        run_trial(args.trial[0], args.trial[1], sf_dir, args.cores)
        return

    def one_trial(query: str, variant: str) -> float | None:
        subprocess.run("sync", shell=True)
        env = dict(os.environ, TMPDIR="/dev/shm")
        if variant == "noarm":
            env["VAERO_DISABLE_IDLE_EVICTION"] = "1"
        else:
            env.pop("VAERO_DISABLE_IDLE_EVICTION", None)
        proc = subprocess.run(
            [sys.executable, __file__, "--trial", query, variant,
             "--cores", str(args.cores)],
            capture_output=True, text=True, timeout=1200, env=env,
        )
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else ""
        try:
            return json.loads(line)["sec"]
        except (json.JSONDecodeError, IndexError):
            print(f"trial failed: {proc.stderr[-1000:]}", file=sys.stderr)
            return None

    # ABBA order balancing: a plain grouped A-then-B design aliases any
    # monotone host drift onto the variant effect — measured on this
    # host: stream_counters read +18.2% with armed first and −5.8% with
    # noarm first the same hour. Two passes in opposite variant order
    # cancel linear drift; per-pass medians stay in the artifact so
    # window shifts are visible.
    results: dict[str, dict] = {}
    for query in QUERIES + (CONTROL,):
        per_variant: dict[str, list] = {v: [] for v in VARIANTS}
        per_pass: dict[str, dict] = {v: {} for v in VARIANTS}
        for pass_no, order in enumerate((VARIANTS, tuple(reversed(VARIANTS)))):
            for variant in order:
                secs = [one_trial(query, variant) for _ in range(args.trials)]
                secs = [s for s in secs if s is not None]
                per_variant[variant] += secs
                per_pass[variant][f"pass{pass_no}"] = secs
        results[query] = {
            v: {
                "trials_sec": per_variant[v],
                "by_pass": per_pass[v],
                "median_sec": round(statistics.median(per_variant[v]), 3)
                if per_variant[v] else None,
            }
            for v in VARIANTS
        }
        a, b = (results[query][v]["median_sec"] for v in VARIANTS)
        delta = round((a - b) / b * 100, 1) if a and b else None
        key = (
            "noise_floor_pct" if query == CONTROL else "arming_overhead_pct"
        )
        results[query][key] = delta
        if query == CONTROL:
            results[query]["control"] = (
                "knob-untouched path: both variants run identical plans "
                "(the session-close timeout is semantic, armed "
                "unconditionally) — this delta IS the noise floor"
            )
        print(f"{query}: armed {a}s vs noarm {b}s ({delta}%)", file=sys.stderr)

    out = {
        "protocol": f"ABBA order-balanced: 2 passes x {args.trials} fresh-JVM "
                    f"trials per (query, variant), opposite variant order per "
                    f"pass, local[{args.cores}], tmpfs TMPDIR, pooled median; "
                    f"{CONTROL} is the negative control (knob cannot touch "
                    f"its plan — its delta reads the noise floor)",
        "sf_dir": sf_dir,
        "results": results,
    }
    path = REPO / "BENCH" / "eviction_ab_r5.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
