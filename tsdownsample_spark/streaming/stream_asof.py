"""Streaming as-of enrichment: attach the most recent tier/reference row
(at-or-before each event's timestamp) to a live stream.

Shape: ``foreachBatch`` + the batch :func:`~tsdownsample_spark.operators.
asof.asof_join` against a STATIC right side (a rollup tier, a reference
table).  Because the as-of match of a left row depends only on that row
and the right side — never on other left rows — the operator is
batch-splitting invariant: enriching micro-batches one at a time yields
EXACTLY the rows a single batch join over all events would (asserted in
tests/test_stream_rollup.py).  That invariance is what makes foreachBatch
the right tool here, where windows/stateful ops would be overkill: no
state, no watermark, each micro-batch is complete in itself.

The right side re-reads per micro-batch only if you pass an eager
DataFrame; pass a cached one (or a snapshot-table read) for a hot path.
For a SLOWLY CHANGING right side, re-resolve it inside your own
foreachBatch wrapper — this helper deliberately takes the DataFrame, not
a loader, to keep the correctness contract visible.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from tsdownsample_spark.operators.asof import asof_join

__all__ = ["asof_enrich_foreach_batch"]


def asof_enrich_foreach_batch(
    right: DataFrame,
    sink: Callable[[DataFrame, int], None],
    **asof_kw,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function enriching each micro-batch.

    ``sink(enriched_df, batch_id)`` receives the as-of-joined batch —
    write it to a table, a topic, a snapshot append.  ``asof_kw`` are
    passed to :func:`asof_join` (on/by/value_cols/direction/tolerance...).

    Usage::

        q = (events.writeStream
             .foreachBatch(asof_enrich_foreach_batch(tier_df, writer,
                 on="ts", by=["event_type"], value_cols=["tier_min"]))
             .start())
    """

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        sink(asof_join(batch_df, right, **asof_kw), batch_id)

    return fn
