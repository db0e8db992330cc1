"""Sessionization + as-of join (operators/sessions.py).

Semantics under test: a session breaks when the microsecond gap STRICTLY
exceeds the timeout (gap == timeout stays in-session); session_idx is
1-based per user. asof_join attaches the most recent right row with
right.ts <= left.ts per key (tie at equal ts INCLUDES the right row),
NULL when nothing precedes. Both plans shuffle exactly once, on the key.
"""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from genome_deduplication_spark.operators.sessions import asof_join, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(event_id=i, user_id=u, ts=T0 + dt.timedelta(microseconds=us))
            for i, (u, us) in enumerate(rows)
        ]
    )


def test_sessionize_strict_gap_boundary(spark):
    gap_s = 10
    rows = [
        (1, 0),
        (1, 10_000_000),  # gap == timeout exactly -> SAME session
        (1, 20_000_001),  # gap timeout+1us -> new session
        (1, 20_000_002),
        (2, 5),  # other user: own numbering
    ]
    out = {
        r["event_id"]: (r["user_id"], r["session_idx"])
        for r in sessionize(_ev(spark, rows), gap_seconds=gap_s).collect()
    }
    assert out[0] == (1, 1) and out[1] == (1, 1)
    assert out[2] == (1, 2) and out[3] == (1, 2)
    assert out[4] == (2, 1)


def test_asof_join_backward_inclusive_with_nulls(spark):
    left = _ev(spark, [(1, 100), (1, 50), (1, 5), (2, 40)])
    right = spark.createDataFrame(
        [
            Row(user_id=1, ts=T0 + dt.timedelta(microseconds=us), tag=f"r{us}")
            for us in (10, 50, 80)
        ]
    )
    out = {
        r["event_id"]: r["asof_tag"]
        for r in asof_join(
            left, right, by="user_id", value_cols=("tag",)
        ).collect()
    }
    assert out[0] == "r80"  # most recent <= 100
    assert out[1] == "r50"  # tie at 50: inclusive
    assert out[2] is None  # nothing at or before 5
    assert out[3] is None  # user 2 has no right rows at all


def test_session_and_asof_plans_shuffle_once_on_key(spark):
    ev = _ev(spark, [(u, i * 1000) for u in (1, 2, 3) for i in range(5)])
    right = ev.select("user_id", "ts", F.lit("x").alias("tag"))
    for df in (
        sessionize(ev, gap_seconds=1),
        asof_join(ev, right, by="user_id", value_cols=("tag",)),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        ex = [
            ln
            for ln in plan.splitlines()
            if "Exchange hashpartitioning" in ln
        ]
        assert len(ex) == 1 and "user_id" in ex[0], plan
