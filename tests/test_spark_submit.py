"""North-rule deployment check: the engine runs via spark-submit
--py-files (package shipped as a zip, no install), producing the same
rows as the in-process flagship plan."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_pyfiles(tmp_path, spark):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        import pyspark

        spark_submit = os.path.join(
            os.path.dirname(pyspark.__file__), "bin", "spark-submit"
        )
    assert os.path.exists(spark_submit)

    # package the engine exactly as a cluster deploy would
    zip_path = str(tmp_path / "ccspark.zip")
    pkg_root = os.path.join(REPO, "commoncrawl_fetcher_lite_spark")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_root):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    zf.write(full, os.path.relpath(full, REPO))

    out_dir = str(tmp_path / "out")
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--py-files", zip_path,
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            os.path.join(REPO, "submit_job.py"),
            "--query", "frontier_smoke",
            "--sf-dir", "/root/testdata/sf0.001",
            "--out", out_dir,
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # NOT the repo: the package must come from the zip
        env={**os.environ, "PYTHONPATH": ""},
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    # the submitted job's output equals the in-process flagship plan
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    got = {
        tuple(r)
        for r in spark.read.parquet(out_dir)
        .select("url", "host", "host_rank")
        .collect()
    }
    want = {
        tuple(r)
        for r in entrymod.entry(spark).select("url", "host", "host_rank").collect()
    }
    assert got == want and got
