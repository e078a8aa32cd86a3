"""Block-max impact-bound pruning evidence at 1M docs (round 4, round-3
VERDICT #1 done-criterion).

Corpus shape: the flat-tf / uniform-length case where the round-3 tf-only
bound was provably vacuous — every doc carries the probe term once at the
same field length, except a small block-localized set carrying it twice.
With the stored float impact bound, a tf=1 block's upper bound EQUALS its
true score, so θ0 (seeded from the tf=2 docs) strictly exceeds it and the
whole tf=1 tail must be skipped physically. The round-3 bound (max_tf with
fl→0) computed 2.117·idf for those same blocks vs θ0=1.875·idf — no skip.

Note for the dense synth_corpus probes (query_scale_probe.py): there every
512-doc block contains a near-max-tf doc, so per-block maxima saturate and
NO per-block bound (however tight) can separate blocks — the WAND wins on
that corpus come from the compacted access path. This probe isolates the
bound-tightness effect the unit test proves at small scale
(test_wand_impact_bound_prunes_flat_tf_corpus).

Usage: python scripts/impact_prune_probe.py [n_files]
Prints one JSON line; appended by hand to BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    spark = (SparkSession.builder.master(f"local[{cores}]")
             .config("spark.sql.shuffle.partitions", str(cores))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "16g")  # <32g: compressed OOPs
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from slimsearch_spark.config import IndexConfig
    from slimsearch_spark.engine import SparkSearchIndex
    from slimsearch_spark.sources.corpus import synth_corpus

    # flat-tf overlay: every doc gets ' qq' once; a doc-id-CONTIGUOUS
    # subset (doc ids sort by (repo, path), so one repo's one module
    # folder is a contiguous run → block-localized) gets it twice. Field
    # lengths stay near-uniform (one extra unique token either way).
    docs = synth_corpus(spark, n_files, tokens_per_file=30)
    # residues must be compatible: path mod49 ⇒ i ≡ 49 (mod 50) ⇒ i ≡ 9
    # (mod 10), so the repo residue must also be ≡ 9 (mod 10) — org9.
    # Each org9/projN repo's mod49 folder is one contiguous doc-id run
    # (ids sort by (repo, path)) → the heavy docs are block-localized.
    heavy = (F.col("repo").startswith("org9/")
             & F.col("path").startswith("src/mod49/"))
    docs = docs.withColumn(
        "content",
        F.when(heavy, F.concat("content", F.lit(" qq qq")))
        .otherwise(F.concat("content", F.lit(" qq"))))
    docs = docs.repartition(cores * 2).cache()
    n_heavy_actual = docs.where(F.col("content").endswith("qq qq")).count()

    cfg = IndexConfig(fields=["content"], id_field="path",
                      store_fields=["repo"])
    t0 = time.time()
    idx = SparkSearchIndex.build(docs, cfg, order_cols=["repo", "path"])
    build_sec = round(time.time() - t0, 3)
    t0 = time.time()
    idx.posting_lists().count()
    compact_sec = round(time.time() - t0, 3)

    metrics: dict = {}
    t0 = time.time()
    got = idx.search_topk_wand("qq", 10, metrics=metrics).collect()
    wand_sec = round(time.time() - t0, 3)
    t0 = time.time()
    want = (idx.search_df("qq", top_k=10)
            .select("doc_id", "score").collect())
    exact_sec = round(time.time() - t0, 3)
    match = [(r["doc_id"], round(r["score"], 9)) for r in got] == \
        [(r["doc_id"], round(r["score"], 9)) for r in want]

    total = metrics["blocks_total"].value
    decoded = metrics["blocks_decoded"].value
    print(json.dumps({
        "n_files": n_files, "n_heavy": n_heavy_actual, "cores": cores,
        "build_sec": build_sec, "compact_sec": compact_sec,
        "wand_sec": wand_sec, "exact_sec": exact_sec,
        "topk_matches_exact": match,
        "blocks_total": total, "blocks_decoded": decoded,
        "blocks_theta0_decoded": metrics["blocks_theta0_decoded"].value,
        "decoded_fraction": round(decoded / max(total, 1), 4),
    }))


if __name__ == "__main__":
    main()
