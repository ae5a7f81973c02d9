"""Headline queries over the driver's testdata tables + matching ANSI-SQL
oracles (DuckDB).  Every Spark query runs through the ENGINE (pandas-UDF
kernels / native aggregations); every oracle re-derives the same result in
pure SQL so the two sides are independent implementations.

Series framing for the downsample queries: one series per ``event_type``
from the ``events`` table, points ordered by ``(ts, event_id)``, y = value —
the "no x" (index) mode of the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tsdownsample_spark.operators.downsample import downsample_tokens
from tsdownsample_spark.plans.shipping import ship_package

N_OUT = 100


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ship_package(spark)  # make the engine importable on Python workers
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def event_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per event_type: values array ordered by (ts, event_id).

    ``sort_array`` over structs keeps the sort JVM-side; the array order is
    (ts, event_id) because those are the struct's leading fields.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))).alias("pts"))
        .withColumn("vals", F.expr("transform(pts, p -> p.value)"))
        .drop("pts")
    )


def _downsample_query(algo: str, n_out: int = N_OUT):
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        ser = event_series(spark, sf_dir)
        out = downsample_tokens(ser, n_out, algo=algo, tokens_col="vals")
        return (
            out.select("event_type", "vals", F.posexplode("sel_idx").alias("pos", "sel_idx"))
            .withColumn("sel_value", F.expr("element_at(vals, CAST(sel_idx AS INT) + 1)"))
            .select(
                "event_type",
                F.col("pos").cast("long").alias("pos"),
                F.col("sel_idx").alias("sel_idx"),
                "sel_value",
            )
        )

    return q


# ---------------------------------------------------------------- oracles

_ORD = """
ord AS (
    SELECT event_type, value,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS n
    FROM events
),
types AS (SELECT DISTINCT event_type, n FROM ord)
"""


def _oracle_everynth(n_out: int = N_OUT) -> str:
    # step = max(1, n/n_out); idx_k = floor(k*step) for k*step < n - 0.1
    # (reference tsdownsample/downsamplers.py:157-158)
    return f"""
WITH {_ORD},
ks AS (
    SELECT event_type, n,
           UNNEST(range(CAST(CEIL((n - 0.1) / GREATEST(1.0, n / {n_out}.0)) AS BIGINT))) AS k
    FROM types
),
idx AS (
    SELECT event_type, k AS pos,
           CAST(FLOOR(k * GREATEST(1.0, n / {n_out}.0)) AS BIGINT) AS sel_idx
    FROM ks
)
SELECT i.event_type, i.pos, i.sel_idx, o.value AS sel_value
FROM idx i JOIN ord o ON o.event_type = i.event_type AND o.rn = i.sel_idx
"""


def _oracle_minmax(n_out: int = N_OUT) -> str:
    # Equal-count bins: bin i of m = n_out/2 spans
    # [i=0 ? 0 : floor(bs*i)+1, floor(bs*(i+1))+1), bs = (n-1)/m
    # (reference downsample_rs/src/minmax.rs:110-119); per bin emit argmin &
    # argmax (first occurrence) in index order.  Series with n <= n_out are
    # returned whole (identity rule).
    m = n_out // 2
    return f"""
WITH {_ORD},
bins AS (
    SELECT event_type, n, UNNEST(range({m})) AS i FROM types WHERE n > {n_out}
),
edges AS (
    SELECT event_type, i,
           CASE WHEN i = 0 THEN 0
                ELSE CAST(FLOOR((n - 1) / {m}.0 * i) AS BIGINT) + 1 END AS lo,
           CAST(FLOOR((n - 1) / {m}.0 * (i + 1)) AS BIGINT) + 1 AS hi
    FROM bins
),
binned AS (
    SELECT o.event_type, e.i, o.rn, o.value
    FROM ord o JOIN edges e
      ON o.event_type = e.event_type AND o.rn >= e.lo AND o.rn < e.hi
),
mins AS (
    SELECT event_type, i, rn, value,
           ROW_NUMBER() OVER (PARTITION BY event_type, i ORDER BY value ASC, rn ASC) AS r
    FROM binned
),
maxs AS (
    SELECT event_type, i, rn, value,
           ROW_NUMBER() OVER (PARTITION BY event_type, i ORDER BY value DESC, rn ASC) AS r
    FROM binned
),
pair AS (
    SELECT * FROM mins WHERE r = 1
    UNION ALL
    SELECT * FROM maxs WHERE r = 1
),
numbered AS (
    SELECT event_type, i, rn, value,
           ROW_NUMBER() OVER (PARTITION BY event_type, i ORDER BY rn) - 1 AS o
    FROM pair
),
big AS (
    SELECT event_type, 2 * i + o AS pos, rn AS sel_idx, value AS sel_value
    FROM numbered
),
small AS (
    SELECT o.event_type, o.rn AS pos, o.rn AS sel_idx, o.value AS sel_value
    FROM ord o WHERE o.n <= {n_out}
)
SELECT * FROM big UNION ALL SELECT * FROM small
"""


def _oracle_m4(n_out: int = N_OUT) -> str:
    # m4.rs:114-139: m = n_out/4 bins; per bin (first, argmin, argmax, last)
    # with the middle pair in index order; duplicates kept.
    m = n_out // 4
    return f"""
WITH {_ORD},
bins AS (
    SELECT event_type, n, UNNEST(range({m})) AS i FROM types WHERE n > {n_out}
),
edges AS (
    SELECT event_type, i,
           CASE WHEN i = 0 THEN 0
                ELSE CAST(FLOOR((n - 1) / {m}.0 * i) AS BIGINT) + 1 END AS lo,
           CAST(FLOOR((n - 1) / {m}.0 * (i + 1)) AS BIGINT) + 1 AS hi
    FROM bins
),
binned AS (
    SELECT o.event_type, e.i, e.lo, e.hi, o.rn, o.value
    FROM ord o JOIN edges e
      ON o.event_type = e.event_type AND o.rn >= e.lo AND o.rn < e.hi
),
mins AS (
    SELECT event_type, i, rn, value,
           ROW_NUMBER() OVER (PARTITION BY event_type, i ORDER BY value ASC, rn ASC) AS r
    FROM binned
),
maxs AS (
    SELECT event_type, i, rn, value,
           ROW_NUMBER() OVER (PARTITION BY event_type, i ORDER BY value DESC, rn ASC) AS r
    FROM binned
),
firsts AS (
    SELECT event_type, i, rn, value FROM binned WHERE rn = lo
),
lasts AS (
    SELECT event_type, i, rn, value FROM binned WHERE rn = hi - 1
),
quad AS (
    SELECT event_type, i, rn, value FROM firsts
    UNION ALL SELECT event_type, i, rn, value FROM mins WHERE r = 1
    UNION ALL SELECT event_type, i, rn, value FROM maxs WHERE r = 1
    UNION ALL SELECT event_type, i, rn, value FROM lasts
),
numbered AS (
    SELECT event_type, i, rn, value,
           ROW_NUMBER() OVER (PARTITION BY event_type, i ORDER BY rn) - 1 AS o
    FROM quad
),
big AS (
    SELECT event_type, 4 * i + o AS pos, rn AS sel_idx, value AS sel_value
    FROM numbered
),
small AS (
    SELECT o.event_type, o.rn AS pos, o.rn AS sel_idx, o.value AS sel_value
    FROM ord o WHERE o.n <= {n_out}
)
SELECT * FROM big UNION ALL SELECT * FROM small
"""


def queries() -> dict:
    return {
        "q_everynth": _downsample_query("everynth"),
        "q_minmax": _downsample_query("minmax"),
        "q_m4": _downsample_query("m4"),
        # sequential selectors — no closed-form SQL; rows-only driver check
        "q_lttb": _downsample_query("lttb", n_out=101),
        "q_minmaxlttb": _downsample_query("minmaxlttb"),
    }


def oracle_sql() -> dict:
    return {
        "q_everynth": _oracle_everynth(),
        "q_minmax": _oracle_minmax(),
        "q_m4": _oracle_m4(),
    }
