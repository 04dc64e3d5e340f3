"""Set-based event-log analytics: gap sessionization and cohort retention.

The CQL surface covers these *stream-wise* (``#window.session`` aggregates a
user's whole session history; patterns sequence events) — these are the
*relational* formulations a warehouse runs over the same event log at rest:
one row per session / per (cohort, offset) cell, computed with window
functions + hash aggregation so the whole plan stays in whole-stage codegen.

Reference scope anchor: the reference's event-stream examples
(experimental/src/main/scala/com/github/haoch/experimental/CEPPipeline.scala)
feed exactly this shape of user/ts/value event log; sessionization and
retention are the two standard batch companions to its CEP queries.

Determinism contract (repo-wide): every float aggregate is rounded per-row
to 6 decimals and summed through DECIMAL(25,6), so results are independent
of partition count and accumulation order and a DuckDB oracle replays them
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap_ms: int = 30 * 60 * 1000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """One row per (user, session) under a ``gap_ms`` inactivity split:
    session ids are 1-based per user in time order, with start/end epoch-ms,
    event count, and the deterministic-decimal value total.

    Scale shape: ONE exchange on the user key — the lag/running-sum window
    sorts partition-locally, and the closing groupBy clusters on
    (user, session), which hash(user) already satisfies, so Catalyst plans
    it without a second shuffle (verified via .explain: single Exchange).
    Skew bound: a user's whole history must sort on one task — the same
    bound every sessionizer has; a per-user day-split pre-key is the
    standard mitigation when one user exceeds a task.
    """
    # parquet event times arrive as TIMESTAMP_NTZ; unix_millis needs an
    # instant — the cast reads the wall-clock fields in the session zone
    # (UTC in every repo entry point), same contract as operators/asof.py
    ms = F.unix_millis(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    new_sess = (
        F.lag(ms).over(w).isNull()
        | ((ms - F.lag(ms).over(w)) > F.lit(int(gap_ms)))
    ).cast("int")
    sess = (
        df.select(F.col(user_col), F.col(ts_col), F.col(id_col), F.col(value_col))
        .withColumn("__new", new_sess)
        .withColumn("session_id", F.sum("__new").over(run))
    )
    return sess.groupBy(user_col, "session_id").agg(
        F.min(ms).alias("start_ms"),
        F.max(ms).alias("end_ms"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col(value_col), 6).cast("decimal(25,6)"))
        .cast("double")
        .alias("total_value"),
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic cohort-retention matrix: users are cohorted by their first
    active day; each output row is (cohort_day, day_offset, n_users) — how
    many of that cohort were active ``day_offset`` days after joining.

    Scale shape: the event log collapses to distinct (user, day) FIRST
    (hash aggregate — the only stage that sees event-scale data), then a
    per-user min-day window and the (cohort, offset) count-distinct run on
    |users x active-days| rows. Three exchanges total, each on a strictly
    smaller dataset; nothing returns to the driver.
    """
    days = (
        df.select(F.col(user_col).alias("u"), F.to_date(F.col(ts_col)).alias("d"))
        .distinct()
    )
    cohort = F.min("d").over(Window.partitionBy("u"))
    return (
        days.withColumn("__c", cohort)
        .groupBy(
            F.date_format("__c", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("d"), F.col("__c")).alias("day_offset"),
        )
        .agg(F.count_distinct(F.col("u")).alias("n_users"))
    )
