"""The north-rule launch surface: the retention pipeline must run via
``spark-submit --py-files <package-zip>`` as a real subprocess (fresh JVM,
fresh Python, package imported ONLY from the shipped zip), emit its JSON
metrics line, and resume idempotently."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    for root in ("/opt/spark", os.environ.get("SPARK_HOME", "")):
        p = os.path.join(root, "bin", "spark-submit")
        if root and os.path.exists(p):
            return p
    return None


@pytest.mark.slow
def test_spark_submit_token_retention_pipeline(tmp_path):
    """The north-rule launch shape end-to-end: token table in, tier ladder
    out, via a real spark-submit --py-files subprocess; reference invariant
    sampled in-run; second run resumes (skips every bucket)."""
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on PATH/SPARK_HOME")
    sys.path.insert(0, REPO)
    from tsdownsample_spark.plans.shipping import package_zip_path
    from tsdownsample_spark.queries import token_table_path

    out_dir = str(tmp_path / "token_tiers")
    cmd = [
        submit,
        "--master", "local[4]",
        "--py-files", package_zip_path(),
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        os.path.join(REPO, "scripts", "run_token_retention.py"),
        "--input", token_table_path(),
        "--output", out_dir,
        "--tiers", "64,16",
        "--buckets", "4",
        "--cores", "4",
        "--verify-sample", "8",
    ]
    env = dict(os.environ, PYTHONPATH="")
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=480, env=env)
    assert r1.returncode == 0, r1.stderr[-3000:]
    m1 = json.loads([ln for ln in r1.stdout.splitlines() if ln.startswith("{")][-1])
    assert m1["plan"] == [{"n_out": 64, "from": "raw"}, {"n_out": 16, "from": 64}]
    assert all(t["processed"] == 4 and t["rows"] > 0 for t in m1["tiers"].values())
    assert m1["invariant"]["ok"] is True and m1["invariant"]["checks"] == 16
    assert m1["tokens_per_sec"] > 0
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=480, env=env)
    assert r2.returncode == 0, r2.stderr[-3000:]
    m2 = json.loads([ln for ln in r2.stdout.splitlines() if ln.startswith("{")][-1])
    assert all(t["processed"] == 0 and t["skipped"] == 4 for t in m2["tiers"].values())
    assert {k: (v["rows"], v["points"]) for k, v in m2["tiers"].items()} == {
        k: (v["rows"], v["points"]) for k, v in m1["tiers"].items()
    }


@pytest.mark.slow
def test_spark_submit_retention_pipeline(tmp_path, sf_dir):
    submit = _spark_submit()
    if submit is None:
        pytest.skip("no spark-submit on PATH/SPARK_HOME")
    sys.path.insert(0, REPO)
    from tsdownsample_spark.plans.shipping import package_zip_path

    zip_path = package_zip_path()
    out_dir = str(tmp_path / "retention")
    env = dict(os.environ, PYTHONPATH="")  # the zip must be self-sufficient
    cmd = [
        submit,
        "--master", "local[4]",
        "--py-files", zip_path,
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.shuffle.partitions=8",
        os.path.join(REPO, "scripts", "run_retention.py"),
        "--input", f"{sf_dir}/events.parquet",
        "--output", out_dir,
        "--by", "event_type",
        "--cores", "4",
    ]
    r1 = subprocess.run(cmd, capture_output=True, text=True, timeout=480)
    assert r1.returncode == 0, r1.stderr[-3000:]
    line = [ln for ln in r1.stdout.splitlines() if ln.startswith("{")][-1]
    m1 = json.loads(line)
    assert m1["tiers"]["1m"]["rows"] > 0 and m1["tiers"]["1d"]["rows"] > 0
    assert all(t["processed"] > 0 and t["skipped"] == 0 for t in m1["tiers"].values())
    assert m1["rows_per_sec"] > 0
    # resume: a second run over the same input skips every partition but
    # reports the same cumulative lineage rows
    r2 = subprocess.run(cmd, capture_output=True, text=True, timeout=480)
    assert r2.returncode == 0, r2.stderr[-3000:]
    m2 = json.loads([ln for ln in r2.stdout.splitlines() if ln.startswith("{")][-1])
    assert all(t["processed"] == 0 and t["skipped"] > 0 for t in m2["tiers"].values())
    assert {k: v["rows"] for k, v in m2["tiers"].items()} == {
        k: v["rows"] for k, v in m1["tiers"].items()
    }


@pytest.mark.slow
def test_token_pipeline_packed_storage(tmp_path):
    """--pack stores tier tokens bit-packed (binary column), the cascade
    decompresses parents transparently, and the sampled reference invariant
    verifies through the round trip.  Plain-python driver invocation — the
    spark-submit launch surface is covered by the tests above."""
    import glob

    import pyarrow.parquet as pq

    sys.path.insert(0, REPO)
    from tsdownsample_spark.queries import token_table_path

    out_dir = str(tmp_path / "packed")
    cmd = [
        sys.executable,
        os.path.join(REPO, "scripts", "run_token_retention.py"),
        "--input", token_table_path(),
        "--output", out_dir,
        "--tiers", "64,16",
        "--buckets", "2",
        "--cores", "4",
        "--pack",
        "--verify-sample", "6",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=480)
    assert r.returncode == 0, r.stderr[-3000:]
    m = json.loads([ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])
    assert m["invariant"]["ok"] is True
    # on-disk tier schema holds the packed binary, not raw arrays
    files = glob.glob(os.path.join(out_dir, "tier_16", "data", "*", "*.parquet"))
    assert files
    names = pq.ParquetFile(files[0]).schema_arrow.names
    assert "tokens_packed" in names and "tokens" not in names
