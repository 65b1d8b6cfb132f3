"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline smoke check at sf0.001.
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent SQL per query key.

The canonical ``transcripts`` table (BASELINE.json input_hint) is
derived deterministically from the driver's ``events`` parquet by
``vaero_spark.sources.transcripts`` — the Spark derivation and the
``TRANSCRIPTS_ORACLE_CTE`` DuckDB CTE are the same pure function, so
every transcript-operator oracle rebuilds the identical input.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from vaero_spark.dsl import Vaero
from vaero_spark.compiler import compile_batch
from vaero_spark.operators import transforms as TR
from vaero_spark.operators.joins import asof_join_last_user, user_tool_join
from vaero_spark.operators.skew import salted_agg
from vaero_spark.operators.windows import session_windows, windowed_counts
from vaero_spark.sources.transcripts import (
    TRANSCRIPTS_ORACLE_CTE,
    TRANSCRIPTS_WITH_DUPES_ORACLE_CTE,
    load_table,
    load_transcripts,
    load_transcripts_with_dupes,
)

_T = f"WITH {TRANSCRIPTS_ORACLE_CTE}"
_TD = f"WITH {TRANSCRIPTS_WITH_DUPES_ORACLE_CTE}"

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full tap→transform→window pipeline on sf0.001 — mask
    PII, drop system turns, session-windowed per-conversation rollup."""
    sf_dir = "/root/testdata/sf0.001"
    t = load_transcripts(spark, sf_dir)
    t = TR.mask(t, "text", EMAIL_RE, "<EMAIL>")
    t = TR.filter_regexp(t, "role", "^(user|assistant|tool)$")
    return session_windows(t, "30 minutes")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _dsl_pipeline(spark: SparkSession, sf_dir: str, build) -> DataFrame:
    """Build a single-sink pipeline through the DSL + compiler."""
    p = build(Vaero().source("transcripts", sf_dir=sf_dir))
    compiled = compile_batch(spark, p.sink("stdout", name="out").plan())
    return compiled.sinks["out"]


def q_t_add(spark, sf_dir):
    """Reference `add` (transform/add.go) via DSL→compiler."""
    return _dsl_pipeline(spark, sf_dir, lambda v: v.add("replay", True).add("pipeline", "p1"))


def q_t_rename_delete(spark, sf_dir):
    """Reference `rename` + `delete` (transform/rename.go, delete.go)."""
    return _dsl_pipeline(spark, sf_dir, lambda v: v.rename("text", "payload").delete("tool"))


def q_t_filter(spark, sf_dir):
    """Reference `filter_regexp` (transform/filter_regexp.go): unanchored match."""
    return _dsl_pipeline(spark, sf_dir, lambda v: v.filter_regexp("text", "error"))


def q_t_mask(spark, sf_dir):
    """Reference `mask` (transform/mask.go): replace-all with group expansion."""
    return _dsl_pipeline(
        spark, sf_dir, lambda v: v.mask("text", "user([0-9]+)@[A-Za-z0-9.-]+", "u$1@<MASKED>")
    )


def q_t_parse(spark, sf_dir):
    """Reference `parse_regexp` (transform/parse_regexp.go): named groups
    → new fields; no-match null-fills (documented divergence)."""
    return _dsl_pipeline(
        spark,
        sf_dir,
        lambda v: v.parse_regexp("text", "k=(?<kval>[0-9]+)").parse_regexp(
            "text", "contact (?<euser>user[0-9]+)@"
        ),
    )


def q_t_select(spark, sf_dir):
    """Reference `select` (transform/select.go): event becomes bare payload."""
    return _dsl_pipeline(spark, sf_dir, lambda v: v.select("text"))


def q_t_sample(spark, sf_dir):
    """North-star `sample`: deterministic md5-bucket sample (8/16)."""
    return _dsl_pipeline(spark, sf_dir, lambda v: v.sample(8, key="text"))


def q_route(spark, sf_dir):
    """Route-by-condition: branch fan-out (transformNode.go:36-57) —
    errors to one sink, the rest to another; tagged union of both sinks."""
    v = Vaero().source("transcripts", sf_dir=sf_dir)
    v.filter_regexp("text", "error").add("route", "errors").sink("stdout", name="errors")
    v.filter_regexp("text", "^((?!error).)*$").add("route", "rest").sink("stdout", name="rest")
    compiled = compile_batch(spark, v.plan())
    return compiled.sinks["errors"].unionByName(compiled.sinks["rest"])


def q_w_tumbling(spark, sf_dir):
    """Tumbling 1h window per conv (generalizes sinkNode.go time-cap flush)."""
    return windowed_counts(load_transcripts(spark, sf_dir), "1 hour")


def q_w_sliding(spark, sf_dir):
    """Sliding 2h/1h window per conv."""
    return windowed_counts(load_transcripts(spark, sf_dir), "2 hours", "1 hour")


def q_w_session(spark, sf_dir):
    """Session windows, 30 min gap (F.session_window)."""
    return session_windows(load_transcripts(spark, sf_dir), "30 minutes")


def q_dedup_exact(spark, sf_dir):
    """dropDuplicates on (conv_id, turn_idx) over the duped fixture."""
    return load_transcripts_with_dupes(spark, sf_dir).dropDuplicates(["conv_id", "turn_idx"])


def q_j_user_tool(spark, sf_dir):
    """Time-range join: user turns ⋈ tool turns within 5 min, same conv."""
    return user_tool_join(load_transcripts(spark, sf_dir), "4 hours")


def q_j_asof(spark, sf_dir):
    """As-of join: latest user turn at/before each tool turn (window-pass
    composition — no native as-of in Spark)."""
    return asof_join_last_user(load_transcripts(spark, sf_dir))


def q_agg_salted(spark, sf_dir):
    """Two-phase salted aggregation per conv_id (hot-key safe); equals a
    direct GROUP BY."""
    return salted_agg(load_transcripts(spark, sf_dir), "conv_id", n_salts=8)


def q_pricing(spark, sf_dir):
    """TPC-H Q1-style pricing summary (gap-analysis aggregation op).
    Money in integer cents for cross-engine bit-stability."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(cents.cast("bigint")).alias("revenue_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_nation_revenue(spark, sf_dir):
    """Join orders⋈customer⋈nation with broadcast dims; revenue per nation."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(cents).alias("revenue_cents"), F.count(F.lit(1)).alias("n_orders"))
    )


def q_top_customers(spark, sf_dir):
    """Top-10 customers by spend (sort + limit with deterministic tiebreak)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    per_cust = orders.groupBy("o_custkey").agg(F.sum(cents).alias("spend_cents"))
    w = Window.orderBy(F.col("spend_cents").desc(), F.col("o_custkey"))
    return (
        per_cust.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("o_custkey", "spend_cents", "rk")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "t_add": q_t_add,
        "t_rename_delete": q_t_rename_delete,
        "t_filter_regexp": q_t_filter,
        "t_mask": q_t_mask,
        "t_parse_regexp": q_t_parse,
        "t_select": q_t_select,
        "t_sample": q_t_sample,
        "route_branch": q_route,
        "w_tumbling": q_w_tumbling,
        "w_sliding": q_w_sliding,
        "w_session": q_w_session,
        "dedup_exact": q_dedup_exact,
        "j_user_tool": q_j_user_tool,
        "j_asof": q_j_asof,
        "agg_salted": q_agg_salted,
        "q_pricing": q_pricing,
        "q_nation_revenue": q_nation_revenue,
        "q_top_customers": q_top_customers,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect)
# ---------------------------------------------------------------------------

_WIN_AGGS = """
  COUNT(*) AS n_turns,
  SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS n_user,
  SUM(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS n_tool,
  MIN(turn_idx) AS first_turn,
  MAX(turn_idx) AS last_turn,
  MIN(ts) AS min_ts,
  MAX(ts) AS max_ts
"""


def oracle_sql() -> dict[str, str]:
    return {
        "t_add": f"{_T} SELECT *, TRUE AS replay, 'p1' AS pipeline FROM transcripts",
        "t_rename_delete": f"""{_T}
            SELECT conv_id, turn_idx, role, text AS payload, ts FROM transcripts""",
        "t_filter_regexp": f"{_T} SELECT * FROM transcripts WHERE regexp_matches(text, 'error')",
        "t_mask": f"""{_T}
            SELECT conv_id, turn_idx, role,
                   regexp_replace(text, 'user([0-9]+)@[A-Za-z0-9.-]+', 'u\\1@<MASKED>', 'g') AS text,
                   tool, ts
            FROM transcripts""",
        "t_parse_regexp": f"""{_T}
            SELECT conv_id, turn_idx, role, text, tool, ts,
                   CASE WHEN regexp_matches(text, 'k=([0-9]+)')
                        THEN regexp_extract(text, 'k=([0-9]+)', 1) END AS kval,
                   CASE WHEN regexp_matches(text, 'contact (user[0-9]+)@')
                        THEN regexp_extract(text, 'contact (user[0-9]+)@', 1) END AS euser
            FROM transcripts""",
        "t_select": f"{_T} SELECT text AS value FROM transcripts",
        "t_sample": f"""{_T}
            SELECT * FROM transcripts
            WHERE substr(md5(text), 32, 1) IN ('0','1','2','3','4','5','6','7')""",
        "route_branch": f"""{_T}
            SELECT *, 'errors' AS route FROM transcripts WHERE regexp_matches(text, 'error')
            UNION ALL
            SELECT *, 'rest' AS route FROM transcripts WHERE NOT regexp_matches(text, 'error')""",
        "w_tumbling": f"""{_T}
            SELECT conv_id,
                   time_bucket(INTERVAL '1 hour', ts) AS win_start,
                   time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS win_end,
                   {_WIN_AGGS}
            FROM transcripts GROUP BY 1, 2, 3""",
        "w_sliding": f"""{_T}
            SELECT conv_id,
                   time_bucket(INTERVAL '1 hour', ts) - k * INTERVAL '1 hour' AS win_start,
                   time_bucket(INTERVAL '1 hour', ts) - k * INTERVAL '1 hour' + INTERVAL '2 hours' AS win_end,
                   {_WIN_AGGS}
            FROM transcripts CROSS JOIN (SELECT unnest([0, 1]) AS k)
            GROUP BY 1, 2, 3""",
        "w_session": f"""{_T},
            flagged AS (
              SELECT *, CASE WHEN ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                             OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
              FROM transcripts
              WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
            ),
            sessioned AS (
              SELECT *, SUM(new_sess) OVER (PARTITION BY conv_id ORDER BY ts, turn_idx
                                            ROWS UNBOUNDED PRECEDING) AS sess_id
              FROM flagged
            )
            SELECT conv_id, MIN(ts) AS win_start,
                   MAX(ts) + INTERVAL '30 minutes' AS win_end,
                   {_WIN_AGGS}
            FROM sessioned GROUP BY conv_id, sess_id""",
        "dedup_exact": f"{_TD} SELECT DISTINCT * FROM transcripts_dup",
        "j_user_tool": f"""{_T}
            SELECT u.conv_id, u.turn_idx AS user_turn, u.ts AS user_ts,
                   t.turn_idx AS tool_turn, t.tool AS tool_name, t.ts AS tool_ts
            FROM transcripts u JOIN transcripts t
              ON u.conv_id = t.conv_id AND u.role = 'user' AND t.role = 'tool'
             AND t.ts > u.ts AND t.ts <= u.ts + INTERVAL '4 hours'""",
        "j_asof": f"""{_T},
            marked AS (
              SELECT *,
                LAST_VALUE(CASE WHEN role = 'user' THEN turn_idx END IGNORE NULLS)
                  OVER (PARTITION BY conv_id ORDER BY ts, turn_idx ROWS UNBOUNDED PRECEDING) AS last_user_turn,
                LAST_VALUE(CASE WHEN role = 'user' THEN ts END IGNORE NULLS)
                  OVER (PARTITION BY conv_id ORDER BY ts, turn_idx ROWS UNBOUNDED PRECEDING) AS last_user_ts
              FROM transcripts
            )
            SELECT conv_id, turn_idx AS tool_turn, tool AS tool_name, ts AS tool_ts,
                   last_user_turn, last_user_ts
            FROM marked WHERE role = 'tool'""",
        "agg_salted": f"""{_T}
            SELECT conv_id, COUNT(*) AS n_turns,
                   SUM(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS n_user,
                   MAX(turn_idx) AS last_turn, MIN(ts) AS min_ts, MAX(ts) AS max_ts
            FROM transcripts GROUP BY conv_id""",
        "q_pricing": """
            SELECT l_returnflag, l_linestatus,
                   SUM(CAST(l_quantity AS BIGINT)) AS sum_qty,
                   SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS revenue_cents,
                   COUNT(*) AS count_order
            FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus""",
        "q_nation_revenue": """
            SELECT n_name,
                   SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS revenue_cents,
                   COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
                        JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name""",
        "q_top_customers": """
            WITH per_cust AS (
              SELECT o_custkey,
                     SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS spend_cents
              FROM orders GROUP BY o_custkey
            )
            SELECT o_custkey, spend_cents,
                   CAST(ROW_NUMBER() OVER (ORDER BY spend_cents DESC, o_custkey) AS INTEGER) AS rk
            FROM per_cust QUALIFY rk <= 10""",
    }
