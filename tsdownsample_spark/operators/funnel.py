"""User-behavior analytics over event streams: sequential funnels and
retention cohorts.

The reference engine has no notion of users or sessions (it downsamples
one series at a time); these are the two queries every event table gets
asked next to the series diagnostics — "how many users make it through
step 1 -> 2 -> 3, in order?" and "of the users who arrived in week W, how
many are still active k days later?".  Both are decomposable-aggregate
plans, no Python, no windows over raw points.

Spark-first shapes (100 TB):

* ``funnel`` — one filtered scan (only the step event types survive the
  pushed predicate), then per step ONE min-aggregate over users joined to
  the previous step's survivors.  Every join is user-keyed equi-join on
  progressively SHRINKING sides (step k+1's input is step k's survivors),
  so AQE broadcasts the tail of the cascade; shuffle is bounded by
  distinct users in step 1, never event volume.  Strict ordering: step
  k+1's event must be strictly later than the user's step-k time (the
  classic ordered-funnel semantics).
* ``retention_cohorts`` — two groupBys: first-seen day per user (the
  cohort), then distinct (cohort, day-offset, user) collapsed to counts.
  Both are map-side-combinable; shuffle cardinality = users, then
  users x active-days.  Retention divides by the cohort's own day-0 size
  via one tiny self-join on cohort (AQE-broadcast).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["funnel", "retention_cohorts", "transition_matrix"]


def funnel(
    df: DataFrame,
    steps: Sequence[str],
    x_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel: users counted at step k+1 only if they
    performed ``steps[k+1]`` STRICTLY AFTER their first qualifying
    ``steps[k]`` event (first-touch semantics at every step).

    Output: one row per step —
    ``(step_idx, step, n_users, frac_first)`` with ``frac_first`` the
    conversion against step 1 (1.0 for the first step; NULL if step 1 is
    empty).
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError(f"need >= 2 steps, got {steps}")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {steps}")
    ev = df.where(F.col(type_col).isin(steps)).select(
        user_col, type_col, x_col
    )
    survivors = (
        ev.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(x_col).alias("_t"))
    )
    stage_counts = [
        survivors.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(1).alias("step_idx"), F.lit(steps[0]).alias("step"), "n_users"
        )
    ]
    for i, step in enumerate(steps[1:], start=2):
        nxt = ev.where(F.col(type_col) == step).withColumnRenamed(x_col, "_x")
        survivors = (
            nxt.join(survivors, on=user_col, how="inner")
            .where(F.col("_x") > F.col("_t"))
            .groupBy(user_col)
            .agg(F.min("_x").alias("_t"))
        )
        stage_counts.append(
            survivors.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(i).alias("step_idx"), F.lit(step).alias("step"), "n_users"
            )
        )
    out = reduce(DataFrame.unionByName, stage_counts)
    first = out.where(F.col("step_idx") == 1).select(
        F.col("n_users").alias("_n1")
    )
    return (
        out.crossJoin(F.broadcast(first))
        .withColumn(
            "frac_first",
            F.when(F.col("_n1") > 0, F.col("n_users") / F.col("_n1")),
        )
        .select("step_idx", "step", "n_users", "frac_first")
    )


def retention_cohorts(
    df: DataFrame,
    x_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Daily retention triangle: users grouped by first-seen day (cohort),
    counted once per (cohort, day-offset) they were active on.

    Output: ``(cohort_day, offset_days, n_users, retention)`` where
    ``retention`` is against the cohort's own day-0 count (exactly 1.0 at
    offset 0 — every user is active the day they first appear).
    """
    day = F.to_date(F.col(x_col))
    firsts = (
        df.select(user_col, day.alias("_d"))
        .groupBy(user_col)
        .agg(F.min("_d").alias("cohort_day"))
    )
    active = (
        df.select(user_col, day.alias("_d"))
        .join(firsts, on=user_col, how="inner")
        .select(
            user_col,
            "cohort_day",
            F.datediff(F.col("_d"), F.col("cohort_day")).alias("offset_days"),
        )
        .distinct()
    )
    counts = active.groupBy("cohort_day", "offset_days").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    day0 = counts.where(F.col("offset_days") == 0).select(
        "cohort_day", F.col("n_users").alias("_n0")
    )
    return (
        counts.join(day0, on="cohort_day", how="inner")
        .withColumn("retention", F.col("n_users") / F.col("_n0"))
        .select("cohort_day", "offset_days", "n_users", "retention")
    )


def transition_matrix(
    df: DataFrame,
    x_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    for every ordered (from, to) pair of consecutive events of the SAME
    user, the count and the row-normalized probability
    ``P(to | from) = c(from, to) / c(from, ·)`` — the "what do users do
    next?" map that sits under path analysis, funnel discovery, and
    next-event prediction baselines.

    100 TB shape: one ROWS lead window per user (the sessionize shuffle,
    keyed on the user), then a map-side-combinable (from, to) count
    groupBy — shuffle ∝ users for the window, then ∝ |types|² for the
    matrix.  Row totals come from a window over the <= |types|² matrix
    rows, not a second scan.  Zero Python.

    Output: ``(from_type, to_type, n, p)`` — pairs with n = 0 are absent
    (sparse matrix).
    """
    order = [F.col(x_col)] + [F.col(c) for c in tiebreak]
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        df.select(user_col, x_col, *tiebreak, F.col(type_col).alias("from_type"))
        .withColumn("to_type", F.lead("from_type").over(w))
        .where(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    row = Window.partitionBy("from_type")
    return counts.withColumn(
        "p", F.col("n") / F.sum("n").over(row)
    ).select("from_type", "to_type", "n", "p")
