"""SparkSearchIndex — the distributed engine.

State is columnar DataFrames (SURVEY.md §1.2):

    postings(term, field_id, doc_id, tf)      — the inverted index
    doc_stats(doc_id, field_id, field_len)    — per-doc unique-raw-token counts
    docs(doc_id, <ext id>, <stored fields>)   — id map + row store
    terms(term, field_id, df)                 — query-expansion dictionary

plus tiny driver-held corpus stats (doc_count, avg_field_length) and a
tombstone list (discard/replace are tombstone + compaction, reference
src/remove.ts / src/vacuum.ts re-expressed as batch jobs).

Query execution: driver tokenizes the query and plans the expansion
(exact / prefix range-scan / fuzzy edit-distance over the term dictionary),
then one broadcast-join + BM25 + aggregation plan scores every branch
(plans/scoring.py). Results come back as a DataFrame; ``search()`` collects
the parity-shaped dicts, ``search_df()`` exposes the distributed plan for
top-k at scale.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .config import (AND, DEFAULT_BM25, DEFAULT_MAX_FUZZY, DEFAULT_WEIGHTS,
                     OR, WILDCARD, IndexConfig)
from .functions.tokenize import tokenize_py
from .operators.build import (assign_doc_ids, build_doc_stats, build_postings,
                              build_term_dict, corpus_stats, tokenize_fields)
from .oracle import js_round
from .plans.scoring import (combine_results, combine_scored, empty_result,
                            score_expansion)


def _default_process_term(term: str) -> str:
    return term.lower()


class SparkSearchIndex:
    def __init__(self, spark: SparkSession, config: IndexConfig,
                 postings: DataFrame, doc_stats: DataFrame, docs: DataFrame,
                 doc_count: int, avg_field_length: Dict[int, float],
                 next_id: int, cache: bool = True):
        from . import ensure_workers
        ensure_workers(spark)
        self.spark = spark
        self.config = config
        self.field_ids = {f: i for i, f in enumerate(config.fields)}
        self.postings = postings
        self.doc_stats = doc_stats
        self.docs = docs
        self.doc_count = doc_count
        self.avg_field_length = avg_field_length
        self.next_id = next_id
        self.tombstones: List[int] = []
        self.dirt_count = 0
        self._search_options: dict = {}
        if config.search_options is not None:
            from .config import search_options_dict
            self._search_options = search_options_dict(config.search_options)
        self._auto_suggest_options: dict = {}
        if cache:
            self.postings = postings.cache()
            self.doc_stats = doc_stats.cache()
            self.docs = docs.cache()

    # ------------------------------------------------------------------ build
    @classmethod
    def build(cls, docs_df: DataFrame, config: IndexConfig,
              order_cols: Optional[Sequence[str]] = None,
              cache: bool = True) -> "SparkSearchIndex":
        """One-pass batch build (the Spark-native addAll, SURVEY.md §3.1)."""
        spark = docs_df.sparkSession
        if "doc_id" not in docs_df.columns:
            if order_cols is None:
                order_cols = [config.id_field]
            docs_df = assign_doc_ids(docs_df, order_cols)
        tokenized = tokenize_fields(docs_df, config)
        postings = build_postings(tokenized)
        doc_stats = build_doc_stats(tokenized)
        avg_len, _ = corpus_stats(doc_stats)
        keep = ["doc_id", config.id_field] + [f for f in config.store_fields
                                              if f in docs_df.columns]
        docs = docs_df.select(*dict.fromkeys(keep))
        doc_count = docs.count()
        return cls(spark, config, postings, doc_stats, docs,
                   doc_count, avg_len, next_id=doc_count, cache=cache)

    # ---------------------------------------------------------------- helpers
    def live_postings(self) -> DataFrame:
        if not self.tombstones:
            return self.postings
        tomb = self.spark.createDataFrame(
            [(int(d),) for d in self.tombstones], "doc_id long")
        return self.postings.join(F.broadcast(tomb), "doc_id", "left_anti")

    def live_docs(self) -> DataFrame:
        if not self.tombstones:
            return self.docs
        tomb = self.spark.createDataFrame(
            [(int(d),) for d in self.tombstones], "doc_id long")
        return self.docs.join(F.broadcast(tomb), "doc_id", "left_anti")

    def term_dictionary(self, field_ids: Sequence[int]) -> DataFrame:
        """Distinct (term, field_id) over live postings — the prefix/fuzzy
        expansion dictionary. Cached across queries (it is tiny relative to
        postings and every expansion query needs it); invalidated on any
        postings mutation."""
        if getattr(self, "_term_dict", None) is None:
            self._term_dict = (self.live_postings()
                               .select("term", "field_id").distinct().cache())
        return (self._term_dict
                .where(F.col("field_id").isin(list(field_ids)))
                .select("term").distinct())

    # -------------------------------------------------------------- expansion
    def _expand_spec(self, spec: dict, opts: dict,
                     field_ids: Sequence[int]) -> List[tuple]:
        """Build the (branch, query_term, derived_term, rank, weight,
        term_boost) expansion rows for one query spec — the Spark-native
        executeQuerySpec term expansion (src/results.ts:170-286).

        Exact match needs no dictionary lookup (the postings join is the
        lookup). Prefix = startswith range predicate on the sorted term
        dictionary; fuzzy = threshold Levenshtein with a length-window
        pre-filter. Matched dictionary slices are tiny and collected to the
        driver to form the broadcast expansion table.
        """
        term = spec["term"]
        branch = spec["branch"]
        tb = float(spec["termBoost"])
        weights = {**DEFAULT_WEIGHTS, **(opts.get("weights") or {})}
        rows = [(branch, term, term, 0, 1.0, tb)]

        need_prefix = bool(spec["prefix"])
        max_dist = 0
        if spec["fuzzy"]:
            fuzzy = 0.2 if spec["fuzzy"] is True else float(spec["fuzzy"])
            max_dist = int(fuzzy) if fuzzy >= 1 else min(
                opts.get("maxFuzzy", DEFAULT_MAX_FUZZY),
                js_round(len(term) * fuzzy))
        if not need_prefix and not max_dist:
            return rows

        dictionary = self.term_dictionary(field_ids)
        conds = []
        if need_prefix:
            conds.append(F.col("term").startswith(term))
        if max_dist:
            conds.append(
                (F.length("term") >= len(term) - max_dist)
                & (F.length("term") <= len(term) + max_dist)
                & (F.levenshtein(F.col("term"), F.lit(term), max_dist) >= 0))
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        cand = dictionary.where(cond)
        if max_dist:
            cand = cand.withColumn(
                "__lev", F.levenshtein(F.col("term"), F.lit(term), max_dist))
        else:
            cand = cand.withColumn("__lev", F.lit(-1))
        matched = cand.collect()

        prefix_terms = sorted(r["term"] for r in matched
                              if need_prefix and r["term"].startswith(term))
        fuzzy_dist = {r["term"]: r["__lev"] for r in matched
                      if max_dist and r["__lev"] >= 0}

        rank = 1
        for t in prefix_terms:
            distance = len(t) - len(term)
            if not distance:
                continue
            fuzzy_dist.pop(t, None)  # prefix wins (src/results.ts:230-234)
            w = weights["prefix"] * len(t) / (len(t) + 0.3 * distance)
            rows.append((branch, term, t, rank, float(w), tb))
            rank += 1
        for t in sorted(fuzzy_dist):
            distance = fuzzy_dist[t]
            if not distance:
                continue
            w = weights["fuzzy"] * len(t) / (len(t) + distance)
            rows.append((branch, term, t, rank, float(w), tb))
            rank += 1
        return rows

    def _pruned_postings(self, postings: DataFrame,
                         derived_terms: Sequence[str]) -> DataFrame:
        """Partition pruning for term lookups on a saved index: postings are
        written ``partitionBy(bucket = pmod(xxhash64(term), n))``; filtering
        on the literal bucket set of the query's derived terms turns the
        scan into `PartitionFilters: [bucket IN (...)]` — at 100 TB a
        lookup touches n_buckets-th of the index instead of all of it."""
        n = getattr(self, "_n_term_buckets", None)
        if "bucket" not in postings.columns or not n or not derived_terms:
            return postings
        terms_df = self.spark.createDataFrame(
            [(t,) for t in sorted(set(derived_terms))], "term string")
        buckets = [r["b"] for r in terms_df.select(
            F.pmod(F.xxhash64("term"), F.lit(n)).cast("int").alias("b"))
            .distinct().collect()]
        return postings.where(F.col("bucket").isin(buckets))

    def _plan_string_query(self, query: str, opts: dict,
                           field_ids: Sequence[int],
                           branch_seed: int = 0) -> tuple:
        """Driver-side query planning for a string query: tokenize →
        processTerm → per-term QuerySpec → expansion rows (the Spark-native
        executeQuery string path, src/results.ts:288-325)."""
        process_term = opts.get("processTerm") or _default_process_term
        tokenize = opts.get("tokenize") or tokenize_py
        terms: List[str] = []
        for token in tokenize(query):
            pt = process_term(token)
            if isinstance(pt, list):
                terms.extend(t for t in pt if t)
            elif pt:
                terms.append(pt)
        if not terms:
            return [], []

        specs = []
        for i, term in enumerate(terms):
            fuzzy = opts.get("fuzzy", False)
            prefix = opts.get("prefix", False)
            boost_term = opts.get("boostTerm")
            specs.append({
                "term": term, "branch": branch_seed + i,
                "fuzzy": fuzzy(term, i, terms) if callable(fuzzy) else (fuzzy or False),
                "prefix": prefix(term, i, terms) if callable(prefix) else prefix is True,
                "termBoost": boost_term(term, i, terms) if callable(boost_term) else 1,
            })

        expansion_rows: List[tuple] = []
        for spec in specs:
            expansion_rows.extend(self._expand_spec(spec, opts, field_ids))
        return specs, expansion_rows

    # ----------------------------------------------------------------- query
    def _doc_boost_df(self, boost_document: Callable,
                      derived_terms: Sequence[str]) -> DataFrame:
        """Materialize boostDocument over (live doc × derived term) — the
        callable runs driver-side over the (small) doc map for parity; at
        scale a Column-expression boost is the supported fast path."""
        docs = self.live_docs().collect()
        rows = []
        for r in docs:
            d = r.asDict()
            stored = {k: v for k, v in d.items()
                      if k not in ("doc_id",) and k != self.config.id_field
                      and v is not None}
            for t in derived_terms:
                b = boost_document(d[self.config.id_field], t, stored or {})
                if b:
                    rows.append((int(d["doc_id"]), t, float(b)))
        schema = T.StructType([
            T.StructField("doc_id", T.LongType()),
            T.StructField("derived_term", T.StringType()),
            T.StructField("doc_boost", T.DoubleType())])
        return self.spark.createDataFrame(rows, schema)

    def _execute_query(self, query, options: dict, branch_seed: int = 0) -> DataFrame:
        opts = {**self._search_options, **options}
        if query is WILDCARD:
            docs = self.live_docs()
            bd = opts.get("boostDocument")
            if bd is None:
                return docs.select(
                    "doc_id", F.lit(1.0).alias("score"),
                    F.expr("cast(array() as array<string>)").alias("qterms"),
                    F.expr("cast(array() as array<struct<branch:int,rank:int,"
                           "term:string,field_id:int>>)").alias("match"))
            rows = []
            for r in docs.collect():
                d = r.asDict()
                stored = {k: v for k, v in d.items()
                          if k not in ("doc_id", self.config.id_field)
                          and v is not None}
                rows.append((int(d["doc_id"]),
                             float(bd(d[self.config.id_field], "", stored or {}))))
            sdf = self.spark.createDataFrame(rows, "doc_id long, score double")
            return sdf.select(
                "doc_id", "score",
                F.expr("cast(array() as array<string>)").alias("qterms"),
                F.expr("cast(array() as array<struct<branch:int,rank:int,"
                       "term:string,field_id:int>>)").alias("match"))

        if isinstance(query, Mapping):
            sub_opts = {**options, **{k: v for k, v in query.items()
                                      if k != "queries"}}
            branches = [self._execute_query(q, sub_opts, branch_seed + 100 * (i + 1))
                        for i, q in enumerate(query["queries"])]
            return combine_results(self.spark, branches,
                                   sub_opts.get("combineWith", OR))

        # string query
        fields = opts.get("fields") or list(self.config.fields)
        field_ids = [self.field_ids[f] for f in fields]
        boost = opts.get("boost") or {}
        field_boost_by_id = {self.field_ids[f]: (boost.get(f) or 1.0)
                             for f in fields}
        bm25 = {**DEFAULT_BM25, **(opts.get("bm25") or {})}

        specs, expansion_rows = self._plan_string_query(
            query, opts, field_ids, branch_seed)
        if not specs:
            return empty_result(self.spark)

        doc_boost_df = None
        bd = opts.get("boostDocument")
        if bd is not None:
            derived = sorted({r[2] for r in expansion_rows})
            doc_boost_df = self._doc_boost_df(bd, derived)

        postings = self._pruned_postings(
            self.live_postings(), [r[2] for r in expansion_rows])
        scored = score_expansion(
            self.spark, postings, self.doc_stats, expansion_rows,
            field_ids, field_boost_by_id, self.avg_field_length,
            self.doc_count, bm25, doc_boost_df)

        # one-plan combinator over the branch column (no per-branch
        # filter+union: the postings join subtree stays single)
        return combine_scored(scored, [s["branch"] for s in specs],
                              opts.get("combineWith", OR))

    def search_df(self, query, **options) -> DataFrame:
        """Distributed search plan → DataFrame(doc_id, <ext id>, score,
        qterms, match, <stored...>), quality-multiplied, sorted desc
        (top-k via ``top_k`` option → TakeOrderedAndProject)."""
        raw = self._execute_query(query, options)
        quality = F.when(F.size("qterms") > 0, F.size("qterms")).otherwise(1)
        out = (raw
               .withColumn("score", F.col("score") * quality)
               .join(self.docs, "doc_id", "inner"))
        flt = options.get("filter")
        if flt is not None and not callable(flt):
            out = out.where(flt)  # Column expression / SQL string fast path
        if query is WILDCARD and options.get("boostDocument") is None:
            # all scores are 1 — skip the score sort; insertion (doc_id)
            # order matches the reference (src/search.ts:202-204)
            out = out.orderBy(F.asc("doc_id"))
        else:
            out = out.orderBy(F.desc("score"), F.asc("doc_id"))
        k = options.get("top_k")
        if k:
            out = out.limit(int(k))
        return out

    def posting_lists(self, layout=None) -> DataFrame:
        """Compacted (delta+varint, block-max) posting lists — built lazily
        from the live postings and cached. The WAND query path's storage."""
        from .config import IndexLayout
        layout = layout or IndexLayout()
        cached_layout = getattr(self, "_posting_lists_layout", None)
        if (getattr(self, "_posting_lists", None) is None
                or (cached_layout is not None
                    and cached_layout.block_doc_range
                    != layout.block_doc_range)):
            from .operators.compact import compact_posting_lists
            self._posting_lists = compact_posting_lists(
                self.live_postings(), layout,
                max_doc_id=self.next_id - 1,
                doc_stats=self.doc_stats).cache()
            self._posting_lists_layout = layout
        return self._posting_lists

    def search_topk_wand(self, query: str, k: int,
                         posting_lists: Optional[DataFrame] = None,
                         layout=None, metrics: Optional[dict] = None,
                         **options) -> DataFrame:
        """Top-k search over the compacted index with distributed block-max
        WAND pruning (plans/wand.py) — scores identical to ``search_df`` with
        the same options; only provably sub-threshold docs are skipped.

        OR-combination over a flat string query (the reference's default
        search surface); requires a compacted, tombstone-free index."""
        from .plans.wand import wand_topk
        if self.tombstones:
            raise ValueError("WAND path requires a vacuumed index "
                             "(run vacuum() first)")
        opts = {**self._search_options, **options}
        fields = opts.get("fields") or list(self.config.fields)
        field_ids = [self.field_ids[f] for f in fields]
        boost = opts.get("boost") or {}
        _, expansion_rows = self._plan_string_query(query, opts, field_ids)
        if posting_lists is None:
            lists = self.posting_lists(layout)
            # the grid span the cached lists were actually built with
            layout = getattr(self, "_posting_lists_layout", layout)
        else:
            lists = posting_lists
        return wand_topk(
            lists, expansion_rows, k, self.doc_count, self.avg_field_length,
            field_id=field_ids[0],
            field_boost=float(boost.get(fields[0], 1.0)),
            bm25={**DEFAULT_BM25, **(opts.get("bm25") or {})},
            layout=layout, max_doc_id=self.next_id - 1, metrics=metrics)

    def search(self, query, **options) -> List[dict]:
        """Parity-shaped results (reference search(), src/search.ts:169-209)."""
        df = self.search_df(query, **{k: v for k, v in options.items()
                                      if k != "filter" or not callable(v)})
        results = []
        for r in df.collect():
            d = r.asDict()
            match: Dict[str, List[str]] = {}
            for m in sorted(d["match"] or [],
                            key=lambda s: (s["branch"], s["rank"], s["field_id"])):
                match.setdefault(m["term"], []).append(
                    self.config.fields[m["field_id"]])
            stored = {k: v for k, v in d.items()
                      if k not in ("doc_id", "score", "qterms", "match",
                                   self.config.id_field) and v is not None}
            result = {"id": d[self.config.id_field], "score": d["score"],
                      "terms": list(match.keys()), "queryTerms": d["qterms"],
                      "match": match, **stored}
            flt = options.get("filter")
            if flt is None or not callable(flt) or flt(result):
                results.append(result)
        return results

    def auto_suggest_df(self, query: str, **options) -> DataFrame:
        """Distributed autoSuggest plan: search (AND, prefix on last term)
        → phrase = matched doc terms in (branch, rank, field) order →
        groupBy(phrase).agg(mean score) → sort desc. One extra aggregation
        over the search output (reference src/autoSuggest.ts:68-98), fully
        executor-side — the scale path; ``auto_suggest`` keeps the
        parity-shaped driver API."""
        opts = {"combineWith": AND,
                "prefix": lambda term, i, terms: i == len(terms) - 1,
                **self._auto_suggest_options, **options}
        hits = self.search_df(query, **opts)
        # match is array_sort'ed by (branch, rank, field_id); first-occurrence
        # dedup of derived terms reproduces the reference's insertion order
        phrase = F.array_join(
            F.array_distinct(F.transform(F.col("match"), lambda m: m["term"])),
            " ")
        return (hits
                .select(phrase.alias("suggestion"), "score")
                .groupBy("suggestion")
                .agg((F.sum("score") / F.count("*")).alias("score"))
                .orderBy(F.desc("score"), F.asc("suggestion")))

    def auto_suggest(self, query: str, **options) -> List[dict]:
        """autoSuggest (reference src/autoSuggest.ts:68-98)."""
        opts = {"combineWith": AND,
                "prefix": lambda term, i, terms: i == len(terms) - 1,
                **self._auto_suggest_options, **options}
        suggestions: Dict[str, dict] = {}
        for result in self.search(query, **opts):
            phrase = " ".join(result["terms"])
            s = suggestions.get(phrase)
            if s is None:
                suggestions[phrase] = {"score": result["score"],
                                       "terms": result["terms"], "count": 1}
            else:
                s["score"] += result["score"]
                s["count"] += 1
        out = [{"suggestion": p, "terms": s["terms"],
                "score": s["score"] / s["count"]}
               for p, s in suggestions.items()]
        out.sort(key=lambda r: -r["score"])
        return out

    # ------------------------------------------------------------ maintenance
    def has(self, ext_id) -> bool:
        return (self.live_docs()
                .where(F.col(self.config.id_field) == ext_id).count()) > 0

    def get_stored_fields(self, ext_id) -> Optional[dict]:
        """Point lookup of the stored-field projection by external id
        (reference getStoredFields, src/info.ts:31-41)."""
        rows = (self.live_docs()
                .where(F.col(self.config.id_field) == ext_id).collect())
        if not rows:
            return None
        d = rows[0].asDict()
        return {k: v for k, v in d.items()
                if k not in ("doc_id", self.config.id_field) and v is not None}

    def remove(self, doc: Mapping[str, Any]) -> None:
        """Eager full delete of one document (reference remove,
        src/remove.ts:139-185)."""
        self.remove_all([doc])

    def _remove_docs(self, docs: Sequence[Mapping]) -> None:
        """Batched eager delete: drops the docs' postings immediately and
        reverses the running field-length average — one Spark plan per
        stage, not per document. The passed documents must be the unchanged
        originals; changed docs log a version_conflict warning (the
        reference's src/warning.ts semantics). Postings are removed by
        doc_id either way (our postings carry doc_id, so the subtraction
        cannot corrupt sibling docs like the reference's tf-decrement can).
        """
        ext_ids = [d[self.config.id_field] for d in docs]
        rows = (self.docs.where(F.col(self.config.id_field).isin(ext_ids))
                .select("doc_id", self.config.id_field).collect())
        found = {r[self.config.id_field]: int(r["doc_id"]) for r in rows}
        missing = [e for e in ext_ids
                   if e not in found or found[e] in self.tombstones]
        if missing:
            raise ValueError(
                f"cannot remove document with ID {missing[0]}: "
                "not in the index")
        doc_ids = sorted(found.values())
        victims = self.spark.createDataFrame([(d,) for d in doc_ids],
                                             "doc_id long")

        # version-conflict check: re-derive the docs' postings and compare
        passed = self.spark.createDataFrame([dict(d) for d in docs]) \
            .withColumn(
                "doc_id",
                F.element_at(
                    F.create_map(*[F.lit(x) for e, i in found.items()
                                   for x in (e, i)]),
                    F.col(self.config.id_field)).cast("long"))
        derived = build_postings(tokenize_fields(passed, self.config))
        stored = self.postings.join(F.broadcast(victims), "doc_id",
                                    "left_semi")
        cols = ["term", "field_id", "doc_id", "tf"]
        changed = (derived.select(*cols)
                   .exceptAll(stored.select(*cols)).limit(1).count())
        if changed:
            import warnings
            warnings.warn("slimsearch_spark: some documents have changed "
                          "before removal (version_conflict)")

        sums = (self.doc_stats.join(F.broadcast(victims), "doc_id",
                                    "left_semi")
                .groupBy("field_id")
                .agg(F.sum("field_len").alias("s"), F.count("*").alias("c"))
                .collect())
        n = self.doc_count
        for r in sums:
            fid, s, c = r["field_id"], r["s"], r["c"]
            if n - c <= 0:
                self.avg_field_length[fid] = 0.0
            else:
                self.avg_field_length[fid] = \
                    (self.avg_field_length.get(fid, 0.0) * n - s) / (n - c)
        self.postings = self.postings.join(
            F.broadcast(victims), "doc_id", "left_anti").cache()
        self.doc_stats = self.doc_stats.join(
            F.broadcast(victims), "doc_id", "left_anti").cache()
        self.docs = self.docs.join(
            F.broadcast(victims), "doc_id", "left_anti").cache()
        self.doc_count -= len(doc_ids)
        self._invalidate_posting_lists()

    def remove_all(self, docs: Optional[Sequence[Mapping]] = None) -> None:
        """Remove the given docs eagerly (one batched plan), or reset all
        state when called with no args (reference removeAll,
        src/remove.ts:199-217)."""
        if docs is not None:
            if docs:
                self._remove_docs(docs)
            return
        self.tombstones = []
        self.postings = self.postings.limit(0).cache()
        self.doc_stats = self.doc_stats.limit(0).cache()
        self.docs = self.docs.limit(0).cache()
        self.doc_count = 0
        self.next_id = 0
        self.dirt_count = 0
        self.avg_field_length = {}
        self._invalidate_posting_lists()

    def discard(self, ext_id) -> None:
        """Tombstone delete (reference src/remove.ts:63-88): doc disappears
        from searches immediately; postings stay until vacuum."""
        row = (self.docs.where(F.col(self.config.id_field) == ext_id)
               .select("doc_id").collect())
        if not row or int(row[0]["doc_id"]) in self.tombstones:
            raise ValueError(
                f"cannot discard document with ID {ext_id}: not in the index")
        doc_id = int(row[0]["doc_id"])
        flens = {r["field_id"]: r["field_len"] for r in
                 self.doc_stats.where(F.col("doc_id") == doc_id).collect()}
        for fid, flen in flens.items():
            count = self.doc_count
            if count == 1:
                self.avg_field_length[fid] = 0.0
            else:
                total = self.avg_field_length.get(fid, 0.0) * count - flen
                self.avg_field_length[fid] = total / (count - 1)
        self.tombstones.append(doc_id)
        self.doc_count -= 1
        self.dirt_count += 1

    def discard_all(self, ext_ids: Sequence) -> None:
        for e in ext_ids:
            self.discard(e)

    def discard_many(self, ext_ids: Sequence) -> None:
        """Batch tombstone (reference discardAll, src/remove.ts:105-120) with
        one lookup job instead of per-id round-trips. The batched
        average-inverse equals the sequential one exactly (removing a set
        from a running mean is order-independent when every doc has the
        field)."""
        ids = list(ext_ids)
        rows = (self.docs.where(F.col(self.config.id_field).isin(ids))
                .select("doc_id").collect())
        doc_ids = {int(r["doc_id"]) for r in rows} - set(self.tombstones)
        if len(doc_ids) != len(ids):
            raise ValueError("cannot discard: some IDs not in the index")
        tomb = self.spark.createDataFrame([(d,) for d in doc_ids],
                                          "doc_id long")
        sums = (self.doc_stats.join(F.broadcast(tomb), "doc_id", "left_semi")
                .groupBy("field_id")
                .agg(F.sum("field_len").alias("s"), F.count("*").alias("c"))
                .collect())
        n = self.doc_count
        for r in sums:
            fid, s, c = r["field_id"], r["s"], r["c"]
            old = self.avg_field_length.get(fid, 0.0)
            if n - c <= 0:
                self.avg_field_length[fid] = 0.0
            else:
                self.avg_field_length[fid] = (old * n - s) / (n - c)
        self.tombstones.extend(sorted(doc_ids))
        self.doc_count -= len(doc_ids)
        self.dirt_count += len(doc_ids)

    def vacuum(self) -> None:
        """Compaction rewrite (reference src/vacuum.ts:23-108): drop postings
        and stats of tombstoned docs, reset dirt."""
        if not self.tombstones:
            self.dirt_count = 0
            return
        tomb = self.spark.createDataFrame(
            [(int(d),) for d in self.tombstones], "doc_id long")
        self.postings = (self.postings
                         .join(F.broadcast(tomb), "doc_id", "left_anti").cache())
        self.doc_stats = (self.doc_stats
                          .join(F.broadcast(tomb), "doc_id", "left_anti").cache())
        self.docs = (self.docs
                     .join(F.broadcast(tomb), "doc_id", "left_anti").cache())
        self.postings.count()
        self.tombstones = []
        self.dirt_count = 0
        self._invalidate_posting_lists()

    def _invalidate_posting_lists(self) -> None:
        """Drop the cached compacted lists + term dictionary after any
        postings mutation — both re-derive lazily on next use."""
        for attr in ("_posting_lists", "_term_dict"):
            df = getattr(self, attr, None)
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass
        self._posting_lists = None
        self._posting_lists_layout = None
        self._term_dict = None

    def add_all(self, new_docs: DataFrame,
                order_cols: Optional[Sequence[str]] = None) -> None:
        """Incremental append: new doc_ids continue from next_id; running
        average updated with the reference formula (src/add.ts:7-23)."""
        if order_cols is None:
            order_cols = [self.config.id_field]
        dup = (new_docs.join(
            self.live_docs().select(self.config.id_field),
            self.config.id_field, "left_semi").limit(1).collect())
        if dup:
            raise ValueError(f"duplicate ID {dup[0][self.config.id_field]}")
        if "doc_id" in new_docs.columns:
            # caller-provided internal ids (same trust as build); they must
            # not collide with existing ones
            assigned = new_docs
            clash = (assigned.select("doc_id")
                     .join(self.docs.select("doc_id"), "doc_id", "left_semi")
                     .limit(1).collect())
            if clash:
                raise ValueError(
                    f"duplicate doc_id {clash[0]['doc_id']} in add_all")
        else:
            assigned = assign_doc_ids(new_docs, order_cols)
            assigned = assigned.withColumn(
                "doc_id", F.col("doc_id") + F.lit(self.next_id))
        tokenized = tokenize_fields(assigned, self.config)
        new_postings = build_postings(tokenized)
        new_stats = build_doc_stats(tokenized)
        n_new = assigned.count()
        # running averages, batched: new_avg = (avg*old_n + sum_new)/(old_n+new_n)
        sums = {r["field_id"]: (r["s"], r["c"]) for r in
                new_stats.groupBy("field_id")
                .agg(F.sum("field_len").alias("s"), F.count("*").alias("c"))
                .collect()}
        for fid, (s, c) in sums.items():
            old = self.avg_field_length.get(fid, 0.0)
            self.avg_field_length[fid] = (old * self.doc_count + s) / (self.doc_count + c)
        keep = ["doc_id", self.config.id_field] + \
            [f for f in self.config.store_fields if f in assigned.columns]
        if "bucket" in self.postings.columns and \
                getattr(self, "_n_term_buckets", None):
            new_postings = new_postings.withColumn(
                "bucket", F.pmod(F.xxhash64("term"),
                                 F.lit(self._n_term_buckets)).cast("int"))
        self.postings = self.postings.unionByName(new_postings).cache()
        self.doc_stats = self.doc_stats.unionByName(new_stats).cache()
        self.docs = self.docs.unionByName(
            assigned.select(*dict.fromkeys(keep)), allowMissingColumns=True).cache()
        self.doc_count += n_new
        if "doc_id" in new_docs.columns:
            hi = assigned.agg(F.max("doc_id")).collect()[0][0]
            self.next_id = max(self.next_id, int(hi) + 1)
        else:
            self.next_id += n_new
        self._invalidate_posting_lists()

    def replace(self, doc: Mapping[str, Any]) -> None:
        self.discard(doc[self.config.id_field])
        row = self.spark.createDataFrame([doc])
        self.add_all(row)
