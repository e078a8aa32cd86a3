"""Deduplication operators for large-scale training-data pipelines.

All pure DataFrame ops (no Python in the hot path):

* exact_dedup        — hash-groupBy on content
* minhash_signatures — K portable MinHashes (min of md5(term#k) hex strings)
* lsh_candidate_pairs — banded MinHash-LSH bucket join
* near_dup_pairs     — LSH candidates + exact Jaccard verify
* simhash            — 16-bit SimHash from md5 nibbles, tf-weighted

MinHash uses lexicographic min over md5 hex digests so the same signature is
computable in any engine (portability beats raw speed for the oracle path;
xxhash64 variants are a drop-in swap at scale).

At 100 TB: everything keys on (band, signature) or content-hash — uniform
hash keys, no skew; joins are shuffle-hash on high-cardinality keys, and the
pair-verify join only touches LSH-colliding docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.tokenize import terms_col


def doc_terms(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term) distinct token sets."""
    return (docs.select(id_col, F.explode(
        F.array_distinct(terms_col(F.col(text_col)))).alias("term"))
        .withColumnRenamed(id_col, "doc_id"))


def doc_shingles(docs: DataFrame, n: int = 3, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term) distinct n-gram token shingles — the unit set for
    MinHash/Jaccard. Shingles discriminate near-duplicates where raw token
    sets saturate (small vocabularies).

    Uses the JVM NGram transformer: a hand-rolled
    ``transform(sequence(...), concat_ws(element_at(toks, i+j)...))`` looks
    equivalent but re-evaluates the tokenizer split per element access —
    quadratic in document length."""
    from pyspark.ml.feature import NGram
    toks_df = docs.select(F.col(id_col).alias("doc_id"),
                          terms_col(F.col(text_col)).alias("__toks"))
    ng = NGram(n=n, inputCol="__toks", outputCol="__sh")
    return (ng.transform(toks_df)
            .select("doc_id",
                    F.explode(F.array_distinct("__sh")).alias("term")))


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """→ (text_md5, keep_doc_id, n_dups): one winner (min id) per distinct
    content; hash-groupBy, one shuffle on the content hash (uniform)."""
    return (docs
            .select(F.md5(F.col(text_col)).alias("text_md5"),
                    F.col(id_col).alias("doc_id"))
            .groupBy("text_md5")
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count("*").alias("n_dups")))


def minhash_signatures(term_sets: DataFrame, k: int = 8) -> DataFrame:
    """→ (doc_id, sig_0..sig_{k-1}): portable MinHash over distinct terms."""
    aggs = [F.min(F.md5(F.concat(F.col("term"), F.lit(f"#{j}"))))
            .alias(f"sig_{j}") for j in range(k)]
    return term_sets.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(sigs: DataFrame, k: int = 8, rows_per_band: int = 2) -> DataFrame:
    """→ distinct (a, b) candidate pairs (a < b) sharing ≥1 LSH band.

    Self-join on (band_id, band_sig): docs only meet if a whole band of
    MinHashes agrees — the candidate set is tiny relative to n²."""
    n_bands = k // rows_per_band
    bands = []
    for b in range(n_bands):
        cols = [f"sig_{b * rows_per_band + r}" for r in range(rows_per_band)]
        bands.append(sigs.select(
            "doc_id", F.lit(b).alias("band_id"),
            F.concat_ws("|", *cols).alias("band_sig")))
    u = bands[0]
    for x in bands[1:]:
        u = u.unionByName(x)
    left = u.alias("l")
    right = u.alias("r")
    return (left.join(right, (F.col("l.band_id") == F.col("r.band_id"))
                      & (F.col("l.band_sig") == F.col("r.band_sig"))
                      & (F.col("l.doc_id") < F.col("r.doc_id")))
            .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
            .distinct())


def near_dup_pairs(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", k: int = 8,
                   rows_per_band: int = 2,
                   threshold: float = 0.5,
                   shingle_n: int = 3) -> DataFrame:
    """MinHash-LSH near-duplicate detection with exact Jaccard verification.

    → (a, b, jaccard) for candidate pairs with Jaccard(n-gram shingle sets)
    ≥ threshold. The expensive exact verify runs only on LSH collisions."""
    # small-file inputs arrive as one partition — spread the (expensive)
    # shingle transform across cores before anything else
    par = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < par:
        docs = docs.repartition(par)
    terms = doc_shingles(docs, shingle_n, text_col, id_col).cache()
    terms.count()  # materialize once; sizes/sigs/verify all re-scan it
    sizes = terms.groupBy("doc_id").agg(F.count("*").alias("sz"))
    cands = (lsh_candidate_pairs(minhash_signatures(terms, k), k,
                                 rows_per_band).cache())
    cands.count()  # cands feeds both the verify join and the final select
    # exact-verify only LSH-colliding docs: prune term sets to candidate
    # docs first (left_semi), then intersect on the composite (doc, term)
    # key — an equi-join, never an |A|×|B| blowup per pair
    cand_docs = (cands.select(F.col("a").alias("doc_id"))
                 .unionByName(cands.select(F.col("b").alias("doc_id")))
                 .distinct())
    cterms = terms.join(cand_docs, "doc_id", "left_semi")
    inter = (cands
             .join(cterms.select(F.col("doc_id").alias("a"), "term"), "a")
             .join(cterms.select(F.col("doc_id").alias("b"), "term"),
                   ["b", "term"])
             .groupBy("a", "b").agg(F.count("*").alias("inter")))
    out = (cands
           .join(inter, ["a", "b"], "left")
           .fillna(0, ["inter"])
           .join(sizes.select(F.col("doc_id").alias("a"),
                              F.col("sz").alias("sz_a")), "a")
           .join(sizes.select(F.col("doc_id").alias("b"),
                              F.col("sz").alias("sz_b")), "b")
           .withColumn("jaccard",
                       F.col("inter") /
                       (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
           .where(F.col("jaccard") >= threshold)
           .select("a", "b", F.round("jaccard", 6).alias("jaccard")))
    return out


def simhash16(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """16-bit SimHash: bit i of a term = high bit of hex nibble i of its md5;
    per doc, bit i of the fingerprint = sign of Σ tf·(±1). → (doc_id, simhash).
    Portable across engines (md5-derived), tf-weighted like the classic
    Charikar construction."""
    tf = (docs.select(F.col(id_col).alias("doc_id"),
                      F.explode(terms_col(F.col(text_col))).alias("term"))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    tf = tf.withColumn("h", F.md5("term"))
    bit_sums = [
        F.sum(F.when(F.substring("h", i + 1, 1)
                     .isin(*"89abcdef"), F.col("tf"))
              .otherwise(-F.col("tf"))).alias(f"s_{i}")
        for i in range(16)]
    agg = tf.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for i in range(16):
        bit = F.when(F.col(f"s_{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = bit if sim is None else (sim + bit)
    return agg.select("doc_id", sim.cast("int").alias("simhash"))
