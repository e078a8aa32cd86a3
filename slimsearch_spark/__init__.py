"""slimsearch_spark — a PySpark-native distributed full-text index build +
BM25 query engine with the query surface of Mister-Hope/slimsearch.

Not a port: the reference is a single-process radix-tree engine; this is a
DataFrame-first pipeline (postings tables, broadcast term-expansion joins,
Catalyst-optimized BM25 column math, distributed top-k).
"""

from .config import (AND, AND_NOT, OR, WILDCARD, AutoSuggestOptions,
                     IndexConfig, IndexLayout, SearchOptions)


def ensure_workers(spark) -> None:
    """Ship this package to executor Python workers (the in-process
    equivalent of ``spark-submit --py-files``), so Arrow/pandas UDF closures
    that reference module functions can unpickle anywhere — regardless of
    the driver process's cwd or sys.path hacks. Idempotent per session."""
    sc = spark.sparkContext
    if getattr(sc, "_slimsearch_shipped", False):
        return
    import os
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    if not os.path.isdir(parent):
        # zipimported (spark-submit --py-files slimsearch_spark.zip, or a
        # zip on PYTHONPATH): `parent` IS the archive — ship it verbatim;
        # make_archive(root_dir=<zipfile>) would raise NotADirectoryError.
        # With --py-files the executors already have it and re-adding the
        # identical file is a no-op warning, so failures are ignorable.
        try:
            sc.addPyFile(parent)
        except Exception:
            pass
    else:
        tmp = tempfile.mkdtemp(prefix="slimsearch_pyfiles_")
        zip_path = shutil.make_archive(
            os.path.join(tmp, "slimsearch_spark"), "zip",
            root_dir=parent, base_dir="slimsearch_spark")
        sc.addPyFile(zip_path)
    sc._slimsearch_shipped = True


__all__ = [
    "AND", "AND_NOT", "OR", "WILDCARD",
    "AutoSuggestOptions", "IndexConfig", "IndexLayout", "SearchOptions",
    "ensure_workers",
]
__version__ = "0.1.0"
