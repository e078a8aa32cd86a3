"""Local mini-driver: run every queries() entry against its oracle_sql()
via DuckDB and report row-count / schema / sorted-value mismatches —
a pre-flight for the real correctness gate."""

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import SparkSession

import __spark_entry__ as E

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.6f}" if v == v else "nan"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    return str(v)


def table_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = E.queries()
    sqls = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error {ex}")
            failures.append(name)
            continue
        if name not in sqls:
            print(f"OK?  {name}: rows={len(srows)} (no oracle — rows-only)")
            continue
        try:
            cur = con.execute(sqls[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {ex}")
            failures.append(name)
            continue
        sh, dh = table_hash(srows, scols), table_hash(drows, dcols)
        status = "OK  " if (len(srows) == len(drows)
                            and sorted(scols) == sorted(dcols)
                            and sh == dh) else "FAIL"
        print(f"{status} {name}: spark {len(srows)}r/{sh} duck "
              f"{len(drows)}r/{dh} cols={scols}/{dcols} "
              f"({time.time() - t0:.1f}s)")
        if status == "FAIL":
            failures.append(name)
            sset = {"|".join(norm_cell(r[i]) for i in
                             sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows}
            dset = {"|".join(norm_cell(r[i]) for i in
                             sorted(range(len(dcols)), key=lambda i: dcols[i]))
                    for r in drows}
            print("  only-spark:", sorted(sset - dset)[:3])
            print("  only-duck: ", sorted(dset - sset)[:3])
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
