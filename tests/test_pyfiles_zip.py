"""The `spark-submit --py-files slimsearch_spark.zip` deployment mode:
the package must work when zipimported (north rule: "ships via
spark-submit --py-files"). Regression for ensure_workers, which used to
call shutil.make_archive(root_dir=<the zip file>) → NotADirectoryError
the first time any Arrow-UDF path (compaction, WAND, custom analysis)
ran under --py-files."""

import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import sys
# only the zip provides the package — mimic a --py-files driver
sys.path.insert(0, sys.argv[1])
import slimsearch_spark
assert ".zip" in slimsearch_spark.__file__, slimsearch_spark.__file__

from pyspark.sql import SparkSession
from slimsearch_spark import IndexConfig
from slimsearch_spark.engine import SparkSearchIndex

spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
docs = spark.createDataFrame(
    [(i, f"spark merge shuffle doc{i}") for i in range(30)],
    "doc_id long, text string")
idx = SparkSearchIndex.build(
    docs, IndexConfig(fields=["text"], id_field="doc_id"),
    order_cols=["doc_id"])
# the WAND path exercises ensure_workers + applyInPandas encode +
# mapInPandas kernels — the closures must unpickle from the zip
top = idx.search_topk_wand("spark merge", 3, adaptive_min_docs=0).collect()
assert len(top) == 3, top
exact = idx.search_df("spark merge", top_k=3).collect()
assert [(r["doc_id"], round(r["score"], 9)) for r in top] == \
       [(r["doc_id"], round(r["score"], 9)) for r in exact]
print("ZIPIMPORT_OK")
"""


def test_package_runs_zipimported():
    tmp = tempfile.mkdtemp(prefix="slimsearch_zip_test_")
    try:
        zip_path = shutil.make_archive(
            os.path.join(tmp, "slimsearch_spark"), "zip",
            root_dir=REPO, base_dir="slimsearch_spark")
        driver = os.path.join(tmp, "driver.py")
        with open(driver, "w") as f:
            f.write(DRIVER)
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)
        out = subprocess.run(
            [sys.executable, driver, zip_path],
            capture_output=True, text=True, timeout=600,
            cwd=tmp, env=env)
        assert "ZIPIMPORT_OK" in out.stdout, \
            f"stdout={out.stdout[-2000:]}\nstderr={out.stderr[-4000:]}"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
