"""Sequence packing for LLM training pipelines.

The reference library (predict-idlab/tsdownsample) downsamples series; a
training-data engine over the same token tables also has to *assemble*
those tokens into fixed-length training rows.  Two industry-standard
strategies, both over the BASELINE input_hint shape
``(doc_id, tokens array<int32>, n_tok int, source string)``:

``pack_concat``
    Concat-and-chunk (the GPT-style pretraining default): per group the
    documents are laid end-to-end in a deterministic order and the token
    stream is cut into fixed ``window``-token rows, documents spanning cut
    points.  Pure prefix-sum over ONE shuffle (the group window) — no UDF,
    whole-stage codegen, scales to 10^12 docs because per-group state is a
    running sum.

``pack_greedy``
    Greedy first-fit-in-order without splitting (SFT-style packing): walk
    the group in order, close the current pack when the next document no
    longer fits.  Inherently a sequential recurrence per group (pack fill
    resets data-dependently), so it runs as an Arrow-batched
    ``applyInPandas`` with a tight per-group loop — the same shape real
    pipelines use (pack per shard, shards in parallel).  An oversize
    document (n_tok > window) opens its own pack and the next document
    always starts a new one.

At 100 TB the ``by`` column is the shard key: groups are independent, the
single shuffle hash-partitions on it, and skewed shards are handled by
AQE (both operators declare no ordering between groups).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ordered_window(by: str, order: str):
    return Window.partitionBy(by).orderBy(order)


def pack_concat(
    toks: DataFrame,
    window: int,
    by: str = "source",
    order: str = "doc_id",
) -> DataFrame:
    """Concat-and-chunk placement: where each document lands in the packed
    token stream of its group.

    Returns one row per document::

        (doc_id, <by>, n_tok, tok_off, first_win, last_win, n_windows)

    ``tok_off`` is the number of tokens before the document in its group's
    stream; ``first_win``/``last_win`` are the fixed-size window indices
    its first/last token fall into; ``n_windows`` is how many training
    rows the document touches.  Documents with NULL or zero ``n_tok``
    are dropped (nothing to place).

    Plan shape: one Exchange(hashpartitioning(by)) + one running-sum
    window — entirely JVM-side, no Python.
    """
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    w = _ordered_window(by, order)
    off = F.coalesce(
        F.sum("n_tok").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    return (
        toks.where(F.col("n_tok").isNotNull() & (F.col("n_tok") > 0))
        .select(order, by, F.col("n_tok").cast("long").alias("n_tok"))
        .withColumn("tok_off", off.cast("long"))
        .withColumn("first_win", F.floor(F.col("tok_off") / window).cast("long"))
        .withColumn(
            "last_win",
            F.floor((F.col("tok_off") + F.col("n_tok") - 1) / window).cast("long"),
        )
        .withColumn("n_windows", (F.col("last_win") - F.col("first_win") + 1))
    )


def pack_concat_stats(
    toks: DataFrame,
    window: int,
    by: str = "source",
) -> DataFrame:
    """Per-group packing economics of concat-and-chunk: total tokens, how
    many fixed windows they cut into, and the padding waste of the final
    partial window.  Closed-form aggregate — no window function at all."""
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    agg = (
        toks.where(F.col("n_tok").isNotNull() & (F.col("n_tok") > 0))
        .groupBy(by)
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("total_tok"),
        )
    )
    n_win = F.ceil(F.col("total_tok") / window).cast("long")
    return agg.select(
        by,
        "n_docs",
        "total_tok",
        n_win.alias("n_windows"),
        F.round((n_win * window - F.col("total_tok")) / (n_win * window), 6).alias(
            "waste_ratio"
        ),
    )


def pack_greedy(
    toks: DataFrame,
    window: int,
    by: str = "source",
    order: str = "doc_id",
) -> DataFrame:
    """Greedy first-fit-in-order packing without document splitting.

    Per group (``by``), documents are visited in ``order``; a document is
    appended to the current pack if it fits in the remaining ``window``
    budget, else it opens the next pack.  Result: one row per document
    ``(<order>, <by>, n_tok, pack_id, pack_off)`` — the id and group
    columns keep the caller's names AND types (string doc ids are common
    in corpora), like ``pack_concat``; ``pack_off`` is the token offset
    inside its pack.

    The recurrence (fill resets when a doc doesn't fit) is not
    prefix-sum expressible, so each group runs a per-group loop inside
    ``applyInPandas`` — Arrow-batched, one task per shard; shards remain
    embarrassingly parallel.  Rule for oversize docs (n_tok > window):
    they open their own pack, and since their fill already exceeds the
    budget the following document always starts a new pack.
    """
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")

    src = toks.where(F.col("n_tok").isNotNull() & (F.col("n_tok") > 0)).select(
        F.col(order), F.col(by), F.col("n_tok").cast("long").alias("n_tok")
    )
    # Output schema derives from the INPUT's order/by field types — never
    # coerced — so string ids and non-string group keys round-trip intact.
    out_schema = T.StructType(
        [src.schema[order], src.schema[by]]
        + [
            T.StructField("n_tok", T.LongType()),
            T.StructField("pack_id", T.LongType()),
            T.StructField("pack_off", T.LongType()),
        ]
    )

    def _pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        n = pdf["n_tok"].to_numpy()
        pack_id = [0] * len(n)
        pack_off = [0] * len(n)
        cur, fill = 0, 0
        for i, nt in enumerate(n):
            if fill > 0 and fill + nt > window:
                cur += 1
                fill = 0
            pack_id[i] = cur
            pack_off[i] = fill
            fill += int(nt)
        return pd.DataFrame(
            {
                order: pdf[order],
                by: pdf[by],
                "n_tok": pdf["n_tok"].astype("int64"),
                "pack_id": pack_id,
                "pack_off": pack_off,
            }
        )

    return src.groupBy(by).applyInPandas(_pack, schema=out_schema)


def pack_greedy_stats(
    toks: DataFrame,
    window: int,
    by: str = "source",
    order: str = "doc_id",
) -> DataFrame:
    """Per-pack fill statistics of the greedy packing: docs per pack,
    tokens per pack, and fill ratio vs the window budget (can exceed 1.0
    only for the single-oversize-doc packs, by construction)."""
    packed = pack_greedy(toks, window, by=by, order=order)
    return packed.groupBy(by, "pack_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("pack_tok"),
        F.round(F.sum("n_tok") / window, 6).alias("fill_ratio"),
    )
