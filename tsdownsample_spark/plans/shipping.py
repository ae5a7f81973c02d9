"""Ship the engine package to Spark's Python workers.

On a real cluster the engine rides along via ``spark-submit --py-files
tsdownsample_spark.zip``.  When the engine is handed an already-running
SparkSession (the driver harness does this), ``ship_package`` reproduces the
same effect at runtime: zip the package once and ``addPyFile`` it, so worker
processes — which do not inherit the driver's ``sys.path`` — can unpickle
pandas-UDF closures that reference our modules.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def package_zip_path() -> str:
    """Create a zip of the tsdownsample_spark package, keyed by a content
    fingerprint so edits to the source invalidate previously built zips."""
    import hashlib

    import tsdownsample_spark

    pkg_dir = os.path.dirname(os.path.abspath(tsdownsample_spark.__file__))
    h = hashlib.sha256()
    for root, _dirs, files in sorted(os.walk(pkg_dir)):
        for f in sorted(files):
            if f.endswith(".py"):
                full = os.path.join(root, f)
                st = os.stat(full)
                h.update(f"{full}:{st.st_mtime_ns}:{st.st_size}".encode())
    out = os.path.join(
        tempfile.gettempdir(), f"tsdownsample_spark_pyfiles_{h.hexdigest()[:16]}.zip"
    )
    if not os.path.exists(out):
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "tsdownsample_spark", os.path.relpath(full, pkg_dir)
                    )
                    z.write(full, rel)
        os.replace(tmp, out)
    return out


def ship_package(spark: SparkSession) -> None:
    """Idempotently attach the package zip to the session's Python workers."""
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        return
    sc.addPyFile(package_zip_path())
    _SHIPPED.add(key)
