"""Document curation: the composite gate a training-data pipeline runs
over every ingested document — exact-dup, language, length, and quality
filters in ONE declarative pass, with a per-document verdict and the
first-failing reason (so drop statistics are attributable, not a single
opaque boolean).

Composition, not new primitives: quality/language columns come from the
oracle-verified expression operators (operators/text.py) and the dup
verdict from dedup_exact's window rule (operators/dedup.py) — this module
only sequences the gates.  Physical shape: text_features and lang_id are
pure JVM expressions appended to the scan, the dup flag is one window
over md5(text); the whole curation is a single scan + a single shuffle,
no joins, no UDFs — at 100 TB the cost is the dedup window's exchange,
which bucketing the table by content hash removes entirely.

Gate priority (first failing wins): no_text > duplicate > language >
too_short > low_quality; survivors read 'ok'.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tsdownsample_spark.operators.text import lang_id, text_features

__all__ = ["curate_documents"]


def curate_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.45,
    langs: Sequence[str] = ("en",),
    min_words: int = 8,
) -> DataFrame:
    """(id, keep, reason) for every input document.

    ``reason`` is the FIRST failing gate in priority order ('no_text',
    'duplicate', 'language', 'too_short', 'low_quality') or 'ok'; ``keep`` is
    ``reason = 'ok'``.  Thresholds compare the same rounded feature values
    the q_text_features/q_lang_id oracles pin, so the verdict is
    engine-independent.
    """
    if isinstance(langs, str):
        # a bare "en" would explode into ('e', 'n') and silently drop the
        # whole corpus as 'language'
        raise ValueError("langs must be a sequence of codes, e.g. ('en',)")
    if min_words < 0 or not langs:
        raise ValueError("min_words must be >= 0 and langs non-empty")
    scored = lang_id(text_features(df, text_col=text_col), text_col=text_col)
    w = Window.partitionBy(F.md5(F.col(text_col)))
    scored = scored.withColumn(
        "_uniq", F.col(id_col) == F.min(id_col).over(w)
    )
    # no_text precedes the dup gate: md5(NULL) groups every NULL-text doc
    # into one window partition, which would misattribute them as
    # 'duplicate' (and the NULL _uniq would otherwise fall through the
    # when-chain unpredictably)
    reason = (
        F.when(F.col(text_col).isNull(), F.lit("no_text"))
        .when(~F.col("_uniq"), F.lit("duplicate"))
        .when(~F.col("lang_pred").isin(*list(langs)), F.lit("language"))
        .when(F.col("n_words") < min_words, F.lit("too_short"))
        .when(F.col("quality_score") < min_quality, F.lit("low_quality"))
        .otherwise(F.lit("ok"))
    )
    return scored.select(
        F.col(id_col),
        (reason == "ok").alias("keep"),
        reason.alias("reason"),
    )
