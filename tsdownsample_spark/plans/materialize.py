"""Within-invocation materialization of branch-shared bases.

Catalyst does not de-duplicate common subtrees: a DataFrame consumed by
several union branches or by both sides of a join re-runs its whole
lineage per consumer (r6 plan audit: q_minmaxlttb_x_long re-ran its scan
+ rank window 6x; q_jaccard_pairs re-derived its minhash signatures on
both sides of the LSH self-join and its candidate pairs four times).
``materialize_shared`` runs the shared base ONCE per invocation and lets
every consumer read the materialized blocks.

Mechanics and constraints:

* ``persist()`` + eager ``count()`` rather than ``localCheckpoint``:
  under AQE the checkpoint's LogicalRDD reports UnknownPartitioning,
  which re-introduces an exchange on bucketed sources;
  ``InMemoryTableScan`` preserves the cached plan's
  outputPartitioning/ordering, so bucketed zero-Exchange plans survive
  (pinned: tests/test_plans.py::test_long_selector_shuffle_free_on_bucketed_source).
  The eager count populates the cache in ONE job so concurrent
  downstream stages never race to compute it.
* This is per-invocation work: every call recomputes from its input —
  nothing persists across bench/oracle runs, and results are
  bit-identical (materialization only, no arithmetic change).  Blocks
  are freed by the ContextCleaner once the DataFrame is unreachable.
* Batch-only: calling it on a streaming DataFrame is an error by
  construction (persist is unsupported there) — keep it out of
  foreachBatch-external streaming lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["materialize_shared"]


def materialize_shared(df: DataFrame) -> DataFrame:
    df = df.persist()
    df.count()
    return df
