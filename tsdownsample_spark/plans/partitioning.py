"""Partitioning & skew handling for the 100 TB layout.

The token table is keyed by (source, doc_id); `source` is low-cardinality
and skewed (FIXTURES.md F1: one source holds ~half the docs).  Strategy:

* **salting** — `salted(df, "source", buckets)` appends a deterministic
  salt derived from doc_id (xxhash64 % buckets), turning one hot key into
  `buckets` evenly sized keys for joins/groupBys keyed on source;
* **range layout** — `repartition_by_series(df)` range-partitions by
  (source, doc_id) so per-series operators see co-located, evenly sized
  partitions and downstream writes cluster by key (Iceberg sort-order
  analogue);
* **AQE** — enabled in plans.session: runtime skew-join splitting and
  partition coalescing mop up residual imbalance.

`skew_report` quantifies imbalance so jobs can choose bucket counts from
data, not folklore.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted(
    df: DataFrame,
    salt_from: str = "doc_id",
    buckets: int = 16,
    salt_col: str = "salt",
) -> DataFrame:
    """Deterministic salt column in [0, buckets) derived from a stable key."""
    return df.withColumn(
        salt_col, (F.xxhash64(F.col(salt_from)) % buckets + buckets) % buckets
    )


def repartition_by_series(
    df: DataFrame,
    by: Sequence[str] = ("source", "doc_id"),
    num_partitions: int | None = None,
) -> DataFrame:
    cols = [F.col(c) for c in by]
    if num_partitions:
        return df.repartitionByRange(num_partitions, *cols)
    return df.repartitionByRange(*cols)


def skew_report(df: DataFrame, key: str = "source") -> list[dict]:
    """Per-key row share + the max/mean imbalance factor."""
    counts = df.groupBy(key).count().collect()
    total = sum(r["count"] for r in counts) or 1
    rows = [
        {key: r[key], "rows": r["count"], "share": round(r["count"] / total, 4)}
        for r in sorted(counts, key=lambda r: -r["count"])
    ]
    if rows:
        mean = total / len(rows)
        rows.append(
            {key: "__imbalance_factor__", "rows": 0, "share": round(rows[0]["rows"] / mean, 3)}
        )
    return rows
