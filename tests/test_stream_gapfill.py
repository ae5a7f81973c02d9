"""Stateful streaming LOCF: the fill state must survive micro-batch
boundaries — a value observed only in batch 1 fills nulls in batch 2."""

import os

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tsdownsample_spark.streaming.stream_gapfill import stream_locf


@pytest.mark.slow
def test_stream_locf_matches_batch(spark, tmp_path, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_type",
            F.col("ts").cast("timestamp").alias("ts"),
            # deterministic nulls to fill
            F.expr("IF(event_id % 11 = 0, CAST(NULL AS DOUBLE), value)").alias("value"),
            "event_id",
        )
        .dropDuplicates(["event_type", "ts"])
    )
    # split by TIME so batch 2's nulls depend on batch-1 state
    cut = ev.selectExpr("percentile_approx(CAST(ts AS DOUBLE), 0.5) p").collect()[0]["p"]
    b1 = ev.filter(F.col("ts").cast("double") <= cut)
    b2 = ev.filter(F.col("ts").cast("double") > cut)
    flat = str(tmp_path / "in")
    os.makedirs(flat)
    b1.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "b1"))
    b2.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "b2"))
    import shutil

    import time as _time

    i = 0
    now = _time.time()
    for j, sub in enumerate(("b1", "b2")):
        for f in sorted(os.listdir(tmp_path / sub)):
            if f.endswith(".parquet"):
                dst = f"{flat}/{i:04d}.parquet"
                shutil.copy(str(tmp_path / sub / f), dst)
                # the file stream source orders by modification time — pin it
                # so batch 1 strictly precedes batch 2
                os.utime(dst, (now - 120 + 60 * j, now - 120 + 60 * j))
                i += 1

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(flat)
    )
    out = stream_locf(stream, x_col="ts", y_col="value", by=["event_type"])
    q = (
        out.writeStream.format("memory")
        .queryName("locf")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    import math

    def _norm(v):
        # pandas float columns carry leading unfilled values as NaN; the
        # batch window mirror yields NULL — same meaning
        return None if isinstance(v, float) and math.isnan(v) else v

    got = sorted(
        tuple(_norm(v) for v in r)
        for r in spark.table("locf")
        .select("event_type", "ts_us", "value", "was_null")
        .collect()
    )
    # batch mirror: global LOCF per series in event-time order
    w = Window.partitionBy("event_type").orderBy("ts_us")
    exp_df = (
        ev.select(
            "event_type",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            "value",
        )
        .withColumn("was_null", F.col("value").isNull())
        .withColumn(
            "value", F.last("value", ignorenulls=True).over(w)
        )
    )
    exp = sorted(
        tuple(r) for r in exp_df.select("event_type", "ts_us", "value", "was_null").collect()
    )
    assert got == exp


@pytest.mark.slow
def test_stream_locf_nan_is_a_value_not_a_gap(spark, tmp_path):
    """NULL-vs-NaN discipline across batches: a NaN payload is an
    observation (never was_null, carried forward into later NULLs — even
    across the micro-batch boundary via state), while unfillable leading
    NULLs stay NULL."""
    import math
    import os
    import time as _time

    rows = "SELECT * FROM VALUES {} AS t(event_type, us, value)"
    b1 = spark.sql(rows.format(
        "('a', 1, CAST(NULL AS DOUBLE)), ('a', 2, 5.0D), "
        "('a', 3, CAST('NaN' AS DOUBLE)), ('a', 4, CAST(NULL AS DOUBLE))"
    ))
    b2 = spark.sql(rows.format(
        "('a', 5, CAST(NULL AS DOUBLE)), ('a', 6, 7.0D), "
        "('a', 7, CAST(NULL AS DOUBLE))"
    ))
    src = [b.select("event_type", F.timestamp_micros("us").alias("ts"), "value")
           for b in (b1, b2)]
    flat = str(tmp_path / "in")
    os.makedirs(flat)
    now = _time.time()
    for j, b in enumerate(src):
        sub = tmp_path / f"b{j}"
        b.coalesce(1).write.mode("overwrite").parquet(str(sub))
        import shutil

        for f in sorted(os.listdir(sub)):
            if f.endswith(".parquet"):
                dst = f"{flat}/{j:04d}.parquet"
                shutil.copy(str(sub / f), dst)
                os.utime(dst, (now - 120 + 60 * j,) * 2)

    stream = (
        spark.readStream.schema(src[0].schema)
        .option("maxFilesPerTrigger", 1).parquet(flat)
    )
    out = stream_locf(stream, x_col="ts", y_col="value", by=["event_type"])
    q = (
        out.writeStream.format("memory").queryName("locf_nan")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["ts_us"]: (
            "NaN" if r["value"] is not None and math.isnan(r["value"]) else r["value"],
            r["was_null"],
        )
        for r in spark.table("locf_nan").collect()
    }
    assert got == {
        1: (None, True),     # leading NULL, no state -> stays NULL
        2: (5.0, False),
        3: ("NaN", False),   # NaN payload is an observation, NOT a gap
        4: ("NaN", True),    # NULL filled with the carried NaN observation
        5: ("NaN", True),    # ...across the micro-batch boundary via state
        6: (7.0, False),
        7: (7.0, True),
    }
