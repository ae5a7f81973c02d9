"""Continuous-aggregate retention tiers: raw -> 1m -> 1h -> 1d.

Spark-first design: every tier is a plain ``groupBy(keys, date_trunc(unit,
ts))`` over **decomposable** aggregates (count/sum/min/max + first/last
carried with their timestamps), so:

* map-side partial aggregation applies (one shuffle per tier, combiner-
  reduced);
* coarser tiers cascade from finer ones (1h reads 1m, 1d reads 1h) — each
  cascade processes ~1/60th the rows of the previous, so the whole pipeline
  is ~1.02x the cost of the 1m tier;
* `avg` and friends are derived columns (`agg_sum/agg_cnt`), never stored.

The reference has no rollup operator (it is a downsampling kernel library);
this layer is mandated by BASELINE.json north_rule ("continuous-aggregate
retention tiers raw -> 1m -> 1h -> 1d").  Downsampling composes with it:
``downsample_series`` over a tier table treats (bucket_ts, agg) as the
series.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIER_UNITS = {"1m": "minute", "1h": "hour", "1d": "day"}
# cascade order and which tier feeds which
CASCADE = [("raw", "1m"), ("1m", "1h"), ("1h", "1d")]

AGG_COLS = [
    "agg_cnt",
    "agg_sum",
    "agg_min",
    "agg_max",
    "first_ts",
    "first_val",
    "last_ts",
    "last_val",
]


def rollup_raw(
    df: DataFrame,
    tier: str = "1m",
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("series_key",),
    uid_col: str | None = None,
) -> DataFrame:
    """Aggregate raw points into a tier table.

    ``uid_col`` (a unique row id) deterministically tie-breaks first/last
    when timestamps collide; without it ties are broken arbitrarily.
    """
    unit = TIER_UNITS[tier]
    order = (
        F.struct(F.col(x_col), F.col(uid_col)) if uid_col else F.col(x_col)
    )
    bucket = F.date_trunc(unit, F.col(x_col)).alias("bucket_ts")
    return df.groupBy(*by, bucket).agg(
        F.count(y_col).alias("agg_cnt"),
        F.sum(y_col).alias("agg_sum"),
        F.min(y_col).alias("agg_min"),
        F.max(y_col).alias("agg_max"),
        F.min(x_col).alias("first_ts"),
        F.min_by(y_col, order).alias("first_val"),
        F.max(x_col).alias("last_ts"),
        F.max_by(y_col, order).alias("last_val"),
    )


def rollup_cascade(tier_df: DataFrame, tier: str, by: Sequence[str]) -> DataFrame:
    """Fold a finer tier into a coarser one without touching raw data.

    All aggregates are decomposable: sums add, counts add, min/max fold,
    first/last resolve by their carried timestamps (unique across finer
    buckets, so no tie-break is needed at this level).
    """
    unit = TIER_UNITS[tier]
    bucket = F.date_trunc(unit, F.col("bucket_ts")).alias("bucket_ts")
    return tier_df.groupBy(*by, bucket).agg(
        F.sum("agg_cnt").alias("agg_cnt"),
        F.sum("agg_sum").alias("agg_sum"),
        F.min("agg_min").alias("agg_min"),
        F.max("agg_max").alias("agg_max"),
        F.min("first_ts").alias("first_ts"),
        F.min_by("first_val", "first_ts").alias("first_val"),
        F.max("last_ts").alias("last_ts"),
        F.max_by("last_val", "last_ts").alias("last_val"),
    )


def retention_tiers(
    df: DataFrame,
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("series_key",),
    uid_col: str | None = None,
) -> dict[str, DataFrame]:
    """Full cascade: returns {"1m": df, "1h": df, "1d": df}."""
    tiers: dict[str, DataFrame] = {}
    tiers["1m"] = rollup_raw(df, "1m", x_col=x_col, y_col=y_col, by=by, uid_col=uid_col)
    tiers["1h"] = rollup_cascade(tiers["1m"], "1h", by=by)
    tiers["1d"] = rollup_cascade(tiers["1h"], "1d", by=by)
    return tiers


def quantile_tier(
    df: DataFrame,
    tier: str = "1h",
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("series_key",),
    ps: Sequence[float] = (0.5, 0.95, 0.99),
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Percentile rollup tier: per (keys, bucket) p-quantiles + count —
    the latency-dashboard companion to the min/max/sum tiers.

    ``exact=True`` uses Spark's exact ``percentile`` (linear interpolation,
    bit-identical to DuckDB's ``quantile_cont`` — the oracle for
    ``q_quantiles``).  Exact percentile buffers each group's values on the
    reducer, so it is only safe when a single (keys, bucket) group fits in
    executor memory — true for tier buckets by construction (a 1m/1h bucket
    of one series), NOT for whole-series groups.  For unbounded groups or
    maximum scale use ``exact=False``: ``approx_percentile`` is a mergeable
    sketch (map-side combined, bounded memory, rank error ~1/accuracy) and
    the only sane shape at 100 TB; it is deliberately NOT oracle-backed
    (approx results are engine-specific).

    Output: ``by + bucket_ts + agg_cnt + p_{percent}`` per p in ``ps``.
    """
    unit = TIER_UNITS[tier]
    bucket = F.date_trunc(unit, F.col(x_col)).alias("bucket_ts")
    if exact:
        aggs = [
            F.percentile(y_col, F.lit(p)).alias(quantile_col_name(p)) for p in ps
        ]
        return df.groupBy(*by, bucket).agg(
            F.count(y_col).cast("long").alias("agg_cnt"), *aggs
        )
    # ONE sketch computing every requested quantile (array form): k
    # percentiles cost one GK summary per group, not k
    arr = F.approx_percentile(
        y_col, F.array(*[F.lit(float(p)) for p in ps]), F.lit(accuracy)
    )
    out = df.groupBy(*by, bucket).agg(
        F.count(y_col).cast("long").alias("agg_cnt"), arr.alias("_ps")
    )
    return out.select(
        *by, "bucket_ts", "agg_cnt",
        *[F.col("_ps")[i].alias(quantile_col_name(p)) for i, p in enumerate(ps)],
    )


def quantile_col_name(p: float) -> str:
    """Column name for quantile ``p`` (0.95 -> 'p_95'), shared by the batch
    and streaming percentile tiers so both land in one table schema."""
    s = f"{p * 100:g}".replace(".", "_")
    return f"p_{s}"


def with_derived(df: DataFrame) -> DataFrame:
    """Attach derived metrics (avg) to a tier table."""
    return df.withColumn("agg_avg", F.col("agg_sum") / F.col("agg_cnt"))


def merge_tier_partials(df: DataFrame, by: Sequence[str]) -> DataFrame:
    """Fold multiple PARTIAL rows of the same (keys, bucket_ts) into one —
    the read-side merge of a delta-append continuous aggregate.  Identical
    decomposable fold as rollup_cascade, grouping on the exact bucket."""
    return df.groupBy(*by, "bucket_ts").agg(
        F.sum("agg_cnt").alias("agg_cnt"),
        F.sum("agg_sum").alias("agg_sum"),
        F.min("agg_min").alias("agg_min"),
        F.max("agg_max").alias("agg_max"),
        F.min("first_ts").alias("first_ts"),
        F.min_by("first_val", "first_ts").alias("first_val"),
        F.max("last_ts").alias("last_ts"),
        F.max_by("last_val", "last_ts").alias("last_val"),
    )


def continuous_rollup(
    spark,
    raw_table,
    tier_table,
    tier: str = "1m",
    x_col: str = "ts",
    y_col: str = "value",
    by: Sequence[str] = ("series_key",),
    uid_col: str | None = None,
) -> str | None:
    """One incremental maintenance step of a continuous aggregate.

    Reads ONLY the raw files appended since the last processed raw snapshot
    (recorded in the tier table's own commit summaries — resume state rides
    the same atomic snapshot mechanism as the data), aggregates the delta,
    and APPENDS the partial rows.  Readers fold duplicates per bucket with
    ``merge_tier_partials`` (all aggregates are decomposable, so append +
    read-side merge == full recompute — tested); a periodic compaction can
    rewrite partials without changing results.  On Iceberg this append is
    the same `writeTo(...).append()`; the delta-segment pattern is how
    continuous aggregates stay O(new data), not O(history), per refresh.

    Returns the new tier snapshot id, or None when there is nothing new
    (idempotent: re-running without new raw data commits nothing).
    """
    # resume marker: the LATEST tier commit that carries one — commits
    # without it (e.g. a compaction rewrite) must not reset the cursor
    done = None
    for snap in reversed(tier_table.history()):
        if snap["summary"].get("raw_snapshot"):
            done = snap["summary"]["raw_snapshot"]
            break
    # ONE consistent read of the raw chain; the cursor recorded below MUST
    # be the chain tail actually consumed — a separate current_snapshot_id()
    # call could see an older (or newer) commit than the walked chain and
    # double-count the difference on the next refresh
    chain = raw_table.history()
    cur = chain[-1]["snapshot_id"] if chain else None
    if cur is None or cur == done:
        return None
    # everything strictly AFTER `done` in the raw parent chain (positional —
    # snapshot ids are not reliably ordered when commits share a timestamp)
    start = 0
    if done is not None:
        for i, snap in enumerate(chain):
            if snap["snapshot_id"] == done:
                start = i + 1
                break
        else:
            # the cursor snapshot was expired (e.g. compaction + expire):
            # silently restarting at 0 would re-aggregate history into the
            # tier — refuse and make the operator decision explicit
            raise RuntimeError(
                f"resume cursor {done!r} no longer exists in {raw_table.root}; "
                "rebuild the tier from scratch or repoint the cursor"
            )
    new_files: list[str] = []
    if done is None:
        # fresh consumer: the live baseline is the CURRENT snapshot's full
        # file list.  Walking append commits only would silently skip rows
        # whose surviving home is a replace commit (compact/rewrite +
        # expire leaves a replace-rooted chain whose added_files never
        # carried them as an append).
        new_files = list(chain[-1]["files"])
    else:
        for snap in chain[start:]:
            # replace commits (compaction) rewrite EXISTING rows into new
            # files; consuming their added_files would double-count
            if snap.get("operation", "append") == "append":
                new_files.extend(snap["added_files"])
    if not new_files:
        return None
    delta = rollup_raw(
        spark.read.parquet(*new_files),
        tier,
        x_col=x_col,
        y_col=y_col,
        by=by,
        uid_col=uid_col,
    )
    return tier_table.append(delta, summary={"raw_snapshot": cur})
