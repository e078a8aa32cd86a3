"""Unit tests for dedup / text-stats / similarity operators on hand-built
fixtures with known answers."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from slimsearch_spark.operators import dedup as dd
from slimsearch_spark.operators import similarity as sim
from slimsearch_spark.operators import textstats as ts


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),   # near dup
        (3, "completely different content about spark engines"),
        (4, "short"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(docs):
    out = {r["keep_doc_id"]: r["n_dups"]
           for r in dd.exact_dedup(docs).collect()}
    assert out[0] == 2          # docs 0,1 collapse, winner = min id
    assert out[2] == 1 and out[3] == 1 and out[4] == 1
    assert 1 not in out


def test_near_dup_shingles(docs):
    # default: exact dups pre-grouped — doc 1 (byte-identical to 0) is
    # represented by doc 0 and the (0,1) pair is exact_dedup's business
    pairs = {(r["a"], r["b"]): r["jaccard"]
             for r in dd.near_dup_pairs(docs, threshold=0.3).collect()}
    assert (0, 1) not in pairs
    assert (0, 2) in pairs and 0.3 <= pairs[(0, 2)] < 1.0
    assert not any(3 in p or 4 in p for p in pairs)
    # opting out restores all-pairs semantics, identical texts included
    raw = {(r["a"], r["b"]): r["jaccard"]
           for r in dd.near_dup_pairs(docs, threshold=0.3,
                                      dedup_exact_first=False).collect()}
    assert raw[(0, 1)] == 1.0
    assert raw[(0, 2)] == pairs[(0, 2)]


def test_ngram_jaccard_matches_minhash_verify(docs):
    # the verify stage is shared with near_dup_pairs, so on a corpus where
    # LSH recalls every rare-shingle pair the two operators agree exactly
    nj = {(r["a"], r["b"]): r["jaccard"]
          for r in dd.ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    mh = {(r["a"], r["b"]): r["jaccard"]
          for r in dd.near_dup_pairs(docs, threshold=0.3).collect()}
    assert nj == mh
    assert (0, 2) in nj and 0.3 <= nj[(0, 2)] < 1.0
    # exact dup (0,1) is pre-collapsed, unrelated docs don't pair
    assert (0, 1) not in nj
    assert not any(3 in p or 4 in p for p in nj)


def test_ngram_jaccard_df_cap_drops_boilerplate_shingles(docs):
    # max_shingle_df=1 means every SHARED shingle is over the cap → no
    # candidate pairs at all, even though (0,2) are near-duplicates
    out = dd.ngram_jaccard_pairs(docs, threshold=0.1,
                                 max_shingle_df=1).collect()
    assert out == []


def test_lsh_bucket_cap(spark):
    """A mass-duplicated template bucket is truncated to its first
    max_bucket members by doc_id — pair fan-out is bounded at m·(m-1)/2
    with m = cap instead of the full bucket size."""
    rows = [(i, "aaa bbb ccc ddd eee fff" if i % 2 == 0
             else "ggg hhh iii jjj kkk lll")
            for i in range(40)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = dd.minhash_signatures(dd.doc_shingles(d, n=3))
    capped = dd.lsh_candidate_pairs(sigs, max_bucket=5).collect()
    uncapped = dd.lsh_candidate_pairs(sigs, max_bucket=0).collect()
    # two variants → two buckets of 20 each: 2 * C(20,2) = 380 uncapped,
    # 2 * C(5,2) = 20 capped (first five ids of each variant)
    assert len(uncapped) == 380
    assert len(capped) == 20
    assert max(max(r["a"], r["b"]) for r in capped) <= 9


def test_simhash64_properties(docs):
    sh = {r["doc_id"]: (r["sim_hi"], r["sim_lo"])
          for r in dd.simhash64(docs).collect()}
    assert sh[0] == sh[1]                 # identical docs → identical hash
    ham = lambda x, y: (bin(x[0] ^ y[0]).count("1")
                        + bin(x[1] ^ y[1]).count("1"))
    assert ham(sh[0], sh[2]) < ham(sh[0], sh[3])
    assert all(0 <= hi < 2 ** 32 and 0 <= lo < 2 ** 32
               for hi, lo in sh.values())


def test_simhash_near_dup_pairs(docs):
    """Band rotation finds every pair within the Hamming budget: identical
    docs (distance 0) always; the hand-built near-dup iff within budget."""
    got = {(r["a"], r["b"]): r["hamming"]
           for r in dd.simhash_near_dup(docs, max_hamming=3).collect()}
    assert got[(0, 1)] == 0
    sh = {r["doc_id"]: (r["sim_hi"], r["sim_lo"])
          for r in dd.simhash64(docs).collect()}
    d02 = (bin(sh[0][0] ^ sh[2][0]).count("1")
           + bin(sh[0][1] ^ sh[2][1]).count("1"))
    assert ((0, 2) in got) == (d02 <= 3)
    wide = {(r["a"], r["b"]): r["hamming"]
            for r in dd.simhash_near_dup(docs, max_hamming=d02).collect()}
    assert wide[(0, 2)] == d02            # pigeonhole guarantee at budget


def test_simhash_properties(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dd.simhash16(docs).collect()}
    assert sh[0] == sh[1]                 # identical docs → identical hash
    ham_near = bin(sh[0] ^ sh[2]).count("1")
    ham_far = bin(sh[0] ^ sh[3]).count("1")
    assert ham_near < ham_far             # near dup closer than unrelated
    assert all(0 <= v < 2 ** 16 for v in sh.values())


def test_winnow_separator_invariance(spark):
    # the fingerprint is over the NORMALIZED token stream: separator and
    # punctuation differences must not change it
    rows = [(0, "The quick,brown fox—jumps over"),
            (1, "the QUICK brown\nfox jumps    over"),
            (2, "the quick brown fox jumps under")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["winnow_fp"], r["n_selected"])
           for r in ts.winnow_fingerprints(df).collect()}
    assert out[0] == out[1]
    assert out[0] != out[2]
    assert out[0][1] > 0


def test_winnow_guarantee_shared_substring(spark):
    # winnowing guarantee: a common normalized substring of length
    # >= k + window - 1 (here 8 + 4 - 1 = 11 chars) forces a shared
    # selected hash; disjoint docs share none
    common = "alpha beta gamma delta"            # 22 chars normalized
    rows = [(0, "xxaa yyibb " + common),
            (1, common + " zzqq wwrr"),
            (2, "totally unrelated words here nothing shared")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sets = {}
    for r in ts.winnow_fingerprint_sets(df).collect():
        sets.setdefault(r["doc_id"], set()).add(r["minh"])
    assert sets[0] & sets[1]
    assert not (sets[0] & sets[2])
    assert not (sets[1] & sets[2])


def test_winnow_short_doc(spark):
    # shorter than one k-gram: md5('') digest, zero selected hashes
    df = spark.createDataFrame([(0, "ab"), (1, "")],
                               "doc_id long, text string")
    out = {r["doc_id"]: (r["winnow_fp"], r["n_selected"])
           for r in ts.winnow_fingerprints(df).collect()}
    empty_md5 = "d41d8cd98f00b204e9800998ecf8427e"
    assert out[0] == (empty_md5, 0)
    assert out[1] == (empty_md5, 0)


def test_lang_id(docs):
    out = {r["doc_id"]: r for r in ts.lang_id(docs).collect()}
    assert out[0]["predicted_lang"] == "en"   # two 'the' in 9 tokens
    assert out[4]["predicted_lang"] == "unknown"


def test_text_quality(docs):
    out = {r["doc_id"]: r for r in ts.text_quality(docs).collect()}
    assert out[0]["n_tokens"] == 9
    assert out[0]["n_unique"] == 8            # 'the' twice
    assert out[4]["is_quality"] is False      # too short
    assert out[0]["ttr"] == pytest.approx(8 / 9, abs=1e-6)


def test_token_counts(spark):
    d = spark.createDataFrame([(0, "foo12 bar_baz!  x")],
                              "doc_id long, text string")
    r = ts.token_counts(d).collect()[0]
    assert r["ws_tokens"] == 3
    # foo|12|bar|_|baz|!|x
    assert r["bpe_ish_tokens"] == 7


def test_fingerprint_separator_invariant(spark):
    d = spark.createDataFrame(
        [(0, "hello, world"), (1, "hello world"), (2, "hello  WORLD.")],
        "doc_id long, text string")
    fps = [r["fp"] for r in ts.fingerprint(d).orderBy("doc_id").collect()]
    assert fps[0] == fps[1] == fps[2]


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(8)
    rows = [(0, base.tolist())]
    rows.append((1, (base + 0.01 * rng.randn(8)).tolist()))   # very close
    rows.append((2, (base + 0.5 * rng.randn(8)).tolist()))    # medium
    for i in range(3, 30):
        rows.append((i, rng.randn(8).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk(vectors):
    q = vectors.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    top = sim.brute_force_topk(vectors, q, k=3, exclude_id=0).collect()
    assert top[0]["vec_id"] == 1
    assert top[0]["cosine"] > 0.99
    assert top[0]["cosine"] >= top[1]["cosine"] >= top[2]["cosine"]


def test_lsh_multiprobe_recall(vectors):
    """Multi-probe (Hamming ≤ h buckets) finds at least everything the
    single bucket finds, with exact cosines, approaching brute force as h
    grows."""
    q = vectors.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    exact = {r["vec_id"]: r["cosine"] for r in
             sim.brute_force_topk(vectors, q, k=29, exclude_id=0).collect()}
    single = {r["vec_id"] for r in
              sim.lsh_topk(vectors, q, k=29, n_planes=4,
                           exclude_id=0).collect()}
    probed = {r["vec_id"] for r in
              sim.lsh_topk(vectors, q, k=29, n_planes=4, exclude_id=0,
                           hamming=1).collect()}
    wide = {r["vec_id"] for r in
            sim.lsh_topk(vectors, q, k=29, n_planes=4, exclude_id=0,
                         hamming=4).collect()}
    assert single <= probed <= wide
    assert wide == set(exact)  # hamming = n_planes probes every bucket
    for r in sim.lsh_topk(vectors, q, k=5, n_planes=4, exclude_id=0,
                          hamming=1).collect():
        assert exact[r["vec_id"]] == pytest.approx(r["cosine"], abs=1e-6)


def test_embedding_near_dup(vectors):
    """Banded sign-LSH near-dup: every reported pair's cosine is exact and
    ≥ threshold; the near-identical pair (0,1) is always found (all sign
    bits agree); nothing is all-pairs-scanned (candidates only)."""
    out = {(r["a"], r["b"]): r["cosine"] for r in
           sim.embedding_near_dup(vectors, threshold=0.9,
                                  n_planes=16, n_bands=4).collect()}
    assert (0, 1) in out and out[(0, 1)] > 0.99
    q = {r["vec_id"]: r["embedding"] for r in vectors.collect()}
    import numpy as np
    for (a, b), c in out.items():
        va, vb = np.array(q[a]), np.array(q[b])
        true = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
        assert c == pytest.approx(round(true, 6), abs=1e-6)
        assert c >= 0.9


def test_ivf_topk(vectors):
    """IVF with n_probe = n_centroids probes every cell and must equal
    brute force; fewer probes give a subset with exact cosines, and the
    near-identical vector shares the query's cell so it is always found."""
    q = vectors.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    seeds = sim.seed_centroids(vectors, 4)
    exact = {(r["vec_id"], r["cosine"]) for r in
             sim.brute_force_topk(vectors, q, k=29, exclude_id=0).collect()}
    full = {(r["vec_id"], r["cosine"]) for r in
            sim.ivf_topk(vectors, q, k=29, centroids=seeds, n_probe=4,
                         exclude_id=0).collect()}
    assert full == exact
    one = {(r["vec_id"], r["cosine"]) for r in
           sim.ivf_topk(vectors, q, k=29, centroids=seeds, n_probe=1,
                        exclude_id=0).collect()}
    assert one and one <= exact
    # vec 1 ≈ the query but is itself seed centroid 1, so probing the two
    # nearest cells (query's own cell 0 + its twin's cell 1) finds it
    two = {r["vec_id"] for r in
           sim.ivf_topk(vectors, q, k=29, centroids=seeds, n_probe=2,
                        exclude_id=0).collect()}
    assert 1 in two
    # k-means centroids are deterministic and also recall-complete at
    # full probe width
    km = sim.ivf_centroids(vectors, 4)
    assert km == sim.ivf_centroids(vectors, 4)
    full_km = {(r["vec_id"], r["cosine"]) for r in
               sim.ivf_topk(vectors, q, k=29, centroids=km, n_probe=4,
                            exclude_id=0).collect()}
    assert full_km == exact


def test_lsh_topk_subset_of_bucket(vectors):
    q = vectors.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    exact = {r["vec_id"]: r["cosine"] for r in
             sim.brute_force_topk(vectors, q, k=29, exclude_id=0).collect()}
    lsh = sim.lsh_topk(vectors, q, k=5, n_planes=4, exclude_id=0).collect()
    # LSH results are true cosines (re-ranked exactly) from the bucket
    for r in lsh:
        assert exact[r["vec_id"]] == pytest.approx(r["cosine"], abs=1e-6)
    # the near-identical vector shares every hyperplane side → always found
    assert lsh[0]["vec_id"] == 1


def test_lang_id_ngram_classifies_real_snippets(spark):
    """Trigram-profile language ID picks the right language on natural
    snippets of each profile language (the oracle gate proves cross-engine
    equality; this proves the heuristic is meaningful)."""
    from slimsearch_spark.operators.textstats import lang_id_ngram
    docs = spark.createDataFrame([
        (0, "the quick brown fox jumping over the lazy dog and the cat"),
        (1, "der schnelle braune fuchs und die katze sind schon da"),
        (2, "le renard brun rapide et les chats de la maison que nous"),
    ], "doc_id long, text string")
    got = {r["doc_id"]: r["predicted_lang"]
           for r in lang_id_ngram(docs).collect()}
    assert got == {0: "en", 1: "de", 2: "fr"}


def test_cluster_pairs_chain_and_singleton_component(spark):
    # transitive closure: a 6-vertex chain collapses to one cluster even
    # though only adjacent pairs were detected; the isolated pair stays
    # its own component
    pairs = spark.createDataFrame([(i, i + 1) for i in range(5)]
                                  + [(10, 11)], "a long, b long")
    want = {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0, 10: 10, 11: 10}
    for thresh in (100_000, 0):   # driver fast path + distributed path
        out = {r["doc_id"]: r["cluster_id"]
               for r in dd.cluster_pairs(
                   pairs, collect_threshold=thresh).collect()}
        assert out == want


def test_cluster_pairs_empty(spark):
    empty = spark.createDataFrame([], "a long, b long")
    assert dd.cluster_pairs(empty).count() == 0


def test_cluster_pairs_fuzz_vs_union_find(spark):
    import os
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=int(os.environ.get("SLIMSEARCH_FUZZ_EXAMPLES",
                                              "5")),
              deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                    min_size=1, max_size=40))
    def run(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {v: find(v) for v in parent}

        pairs = spark.createDataFrame(edges, "a long, b long")
        # both paths: driver union-find fast path AND the distributed
        # iterative propagation (collect_threshold=0 forces it)
        got = {r["doc_id"]: r["cluster_id"]
               for r in dd.cluster_pairs(pairs).collect()}
        assert got == expected
        got_dist = {r["doc_id"]: r["cluster_id"]
                    for r in dd.cluster_pairs(
                        pairs, collect_threshold=0).collect()}
        assert got_dist == expected

    run()


def test_dedup_clusters_and_drop(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "alpha beta gamma delta epsilon zeta eta theta"),   # exact dup
        (2, "alpha beta gamma delta epsilon zeta eta iota"),    # near dup
        (3, "completely different text about spark shuffle joins here"),
        (4, "completely different text about spark shuffle joins here"),
        (5, "unrelated lone document with its own words entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cl = {r["doc_id"]: r["cluster_id"]
          for r in dd.dedup_clusters(docs, threshold=0.3).collect()}
    # every doc labeled; exact + near edges fuse 0,1,2; singleton keeps id
    assert cl == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}
    kept = sorted(r["doc_id"]
                  for r in dd.drop_near_duplicates(
                      docs, threshold=0.3).collect())
    assert kept == [0, 3, 5]


def test_dedup_clusters_with_caller_pairs(spark):
    # a precomputed pair set (e.g. simhash_near_dup output) plugs in; the
    # exact-dup relation still contributes its own edges
    rows = [(0, "aa bb cc"), (1, "aa bb cc"), (2, "totally else")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    cl = {r["doc_id"]: r["cluster_id"]
          for r in dd.dedup_clusters(docs, pairs=pairs).collect()}
    assert cl == {0: 0, 1: 0, 2: 0}


def test_near_dup_pairs_against(spark):
    # ingest-time check: cross-side pairs only, jaccard identical to the
    # symmetric operator's on the same doc pair
    corpus = spark.createDataFrame([
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "one two three four five six seven eight nine ten"),
    ], "doc_id long, text string")
    batch = spark.createDataFrame([
        (10, "alpha beta gamma delta epsilon zeta eta iota"),   # near 0
        (11, "eleven twelve thirteen fourteen fifteen sixteen"),
        (12, "eleven twelve thirteen fourteen fifteen sixteen"),  # intra-
        # batch exact dup of 11: must NOT appear (cross-side only)
    ], "doc_id long, text string")
    out = dd.near_dup_pairs_against(batch, corpus, threshold=0.3).collect()
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in out}
    assert set(pairs) == {(10, 0)}
    sym = dd.near_dup_pairs(
        spark.createDataFrame([
            (0, "alpha beta gamma delta epsilon zeta eta theta"),
            (10, "alpha beta gamma delta epsilon zeta eta iota"),
        ], "doc_id long, text string"), threshold=0.3).collect()
    assert len(sym) == 1 and sym[0]["jaccard"] == pairs[(10, 0)]


def test_near_dup_pairs_against_shared_id_dropped(spark):
    # a row present on both sides under the same id must not self-pair
    txt = "alpha beta gamma delta epsilon zeta eta theta"
    one = spark.createDataFrame([(5, txt)], "doc_id long, text string")
    out = dd.near_dup_pairs_against(one, one, threshold=0.3).collect()
    assert out == []


def test_ngram_jaccard_counts_capped_shingles_in_intersection(spark):
    """Candidates come from RARE shingles only, but the reported jaccard
    must count CAPPED (df > max_shingle_df) shingles in the intersection
    — the session-10 split-verify form computes them via a separate
    capped-only join."""
    boiler = "b1 b2 b3 b4 b5"            # its trigrams have df=4 > cap=2
    rows = [(1, boiler + " r1 r2 r3"),   # shares 3 rare trigrams with 2
            (2, boiler + " r1 r2 r3 x9"),
            (3, boiler + " s1 s2 s3"),   # shares ONLY capped trigrams
            (4, boiler + " t1 t2 t3")]   # with every other doc
    d = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r["a"], r["b"]): r["jaccard"]
           for r in dd.ngram_jaccard_pairs(d, threshold=0.5,
                                           max_shingle_df=2).collect()}
    # doc1: 6 trigrams, doc2: 7; shared = 3 boiler (capped) + 3 rare = 6
    assert out == {(1, 2): pytest.approx(6 / 7, abs=1e-6)}


def test_train_centroids_distributed_matches_numpy_lloyd(vectors):
    """Full-corpus distributed Lloyd == a numpy Lloyd reference on the
    same data/init (empty cells keep their centroid in both), and the
    result is deterministic across invocations up to float summation
    order (F.sum over doubles merges partials in shuffle-fetch order)."""
    import numpy as np
    X = np.asarray(
        [list(r["embedding"]) for r in
         vectors.orderBy("vec_id").collect()], dtype=float)
    k, iters = 4, 3
    C = X[:k].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for c in range(k):
            m = X[a == c]
            if len(m):
                C[c] = m.mean(0)
    got = sim.train_centroids_distributed(vectors, k, iters=iters)
    assert np.allclose(np.asarray(got), C, atol=1e-9)
    again = sim.train_centroids_distributed(vectors, k, iters=iters)
    assert np.allclose(np.asarray(got), np.asarray(again),
                       rtol=1e-12, atol=1e-12)
    # trained centroids remain recall-complete at full probe width
    q = vectors.where(F.col("vec_id") == 0).collect()[0]["embedding"]
    exact = {(r["vec_id"], r["cosine"]) for r in
             sim.brute_force_topk(vectors, q, k=29, exclude_id=0).collect()}
    full = {(r["vec_id"], r["cosine"]) for r in
            sim.ivf_topk(vectors, q, k=29, centroids=got, n_probe=4,
                         exclude_id=0).collect()}
    assert full == exact
