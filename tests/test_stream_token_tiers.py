"""Streaming ingest of token sequences into retention tiers
(streaming/stream_token_tiers.py): incremental ingest == batch cascade,
restart resumes from the checkpoint, sink is idempotent on re-delivery."""

import os

import numpy as np
import pytest

from tsdownsample_spark.operators.token_retention import token_tier_cascade
from tsdownsample_spark.sources.tableio import SnapshotTable
from tsdownsample_spark.streaming.stream_token_tiers import (
    _BatchLedger,
    stream_token_tiers,
)

TIERS = (64, 16)


def _write_wave(spark, src_dir, start, count, seed):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(start, start + count):
        ln = int(rng.integers(2, 900))
        rows.append(
            (
                f"s{i:05d}",
                rng.integers(0, 50_257, ln).astype(np.int32).tolist(),
                ln,
                "web" if i % 3 else "code",
            )
        )
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    df.coalesce(1).write.mode("append").parquet(src_dir)
    return df


def _tier_rows(spark, out_root, n):
    t = SnapshotTable(os.path.join(out_root, f"tier_{n}"))
    return {
        r["doc_id"]: (list(r["sel_idx"]), list(r["tokens"]))
        for r in t.read(spark).collect()
    }


def _expected(spark, batch_df, n):
    out = token_tier_cascade(batch_df, list(TIERS), algo="minmax")
    return {
        r["doc_id"]: (list(r["sel_idx"]), list(r["tokens"]))
        for r in out[n].collect()
    }


def test_stream_ingest_matches_batch_and_resumes(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "tiers")
    w1 = _write_wave(spark, src, 0, 40, seed=3)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_token_tiers(stream, out, tiers=TIERS)
    q.awaitTermination(120)
    for n in TIERS:
        assert _tier_rows(spark, out, n) == _expected(spark, w1, n)

    # wave 2: a restarted query processes ONLY the new files
    w2 = _write_wave(spark, src, 40, 25, seed=4)
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_token_tiers(stream, out, tiers=TIERS)
    q.awaitTermination(120)
    both = {**_expected(spark, w1, 16), **_expected(spark, w2, 16)}
    got = _tier_rows(spark, out, 16)
    assert got == both and len(got) == 65
    # one (batch, tier) unit per wave x tier — wave 1 was not reprocessed
    ledger = _BatchLedger(out)
    assert [(r["batch_id"], r["tier"]) for r in ledger.history()] == [
        (0, 64), (0, 16), (1, 64), (1, 16),
    ]


def test_batch_ledger_idempotence(tmp_path):
    led = _BatchLedger(str(tmp_path))
    assert not led.seen(0, 64)
    led.commit(0, 64, {"snapshot": "abc"})
    assert led.seen(0, 64) and not led.seen(0, 16) and not led.seen(1, 64)
    # re-commit of the same unit is a plain overwrite, not an error
    led.commit(0, 64, {"snapshot": "abc"})
    assert len(led.history()) == 1
    # history is numeric-ordered even past batch 10 (lexicographic would
    # shuffle 10 before 2)
    for b in (10, 2):
        led.commit(b, 64, {"snapshot": "x"})
    assert [r["batch_id"] for r in led.history()] == [0, 2, 10]


def test_sink_crash_between_tiers_does_not_double_append(spark, tmp_path):
    """Redelivery after a crash mid-way through the tier loop appends ONLY
    the missing tier: simulate by pre-committing tier 64 of batch 0 and
    running the stream — tier 64 must stay empty (its append was 'already
    done'), tier 16 must be written once."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "tiers")
    w = _write_wave(spark, src, 0, 10, seed=9)
    _BatchLedger(out).commit(0, 64, {"snapshot": "pre-crash"})

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_token_tiers(stream, out, tiers=TIERS)
    q.awaitTermination(120)
    assert _tier_rows(spark, out, 16) == _expected(spark, w, 16)
    t64 = SnapshotTable(os.path.join(out, "tier_64"))
    assert t64.current_snapshot_id() is None  # no duplicate append


def test_append_exactly_once_repairs_lost_marker(spark, tmp_path):
    """Crash between table.append and ledger.commit: the table's batch_id
    summary is the durable marker — redelivery repairs the ledger entry
    instead of double-appending."""
    from tsdownsample_spark.streaming.stream_token_tiers import (
        append_exactly_once,
    )

    table = SnapshotTable(str(tmp_path / "t"))
    ledger = _BatchLedger(str(tmp_path / "led"))
    df = spark.range(5).toDF("v")
    sid = append_exactly_once(table, ledger, 0, 7, df)
    assert sid is not None and ledger.seen(0, 7)
    # simulate the crash window: marker lost, append survived
    import os

    os.remove(os.path.join(str(tmp_path / "led"), "_batches", "0_7.json"))
    assert not ledger.seen(0, 7)
    assert append_exactly_once(table, ledger, 0, 7, df) is None  # repaired
    assert ledger.seen(0, 7)
    assert len(table.history()) == 1  # no double append
    assert table.read(spark).count() == 5
    # a genuinely new unit still appends
    assert append_exactly_once(table, ledger, 1, 7, df) is not None
    assert table.read(spark).count() == 10


def test_claim_stream_refuses_checkpoint_rebind(tmp_path):
    from tsdownsample_spark.streaming.stream_token_tiers import claim_stream

    out = str(tmp_path / "out")
    claim_stream(out, str(tmp_path / "ck1"))
    claim_stream(out, str(tmp_path / "ck1"))  # same lineage: fine
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bound to streaming checkpoint"):
        claim_stream(out, str(tmp_path / "ck2"))
