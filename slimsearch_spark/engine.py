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
from typing import (Any, Callable, Dict, List, Mapping, Optional, Sequence,
                    Tuple)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .config import (AND, AND_NOT, DEFAULT_AUTO_VACUUM, DEFAULT_BM25,
                     DEFAULT_DOC_BOOST_COLLECT_THRESHOLD,
                     DEFAULT_EXPANSION_COLLECT_THRESHOLD,
                     DEFAULT_EXPANSION_DF_MIN_DOCS, DEFAULT_MAX_FUZZY,
                     DEFAULT_WAND_FANOUT_EXACT_THRESHOLD, DEFAULT_WEIGHTS,
                     OR, WILDCARD, IndexConfig)
from .functions.tokenize import tokenize_py
from .operators.build import (assign_doc_ids, build_doc_stats, build_postings,
                              build_term_dict, corpus_stats,
                              corpus_stats_filling, tokenize_fields)
from .oracle import js_round
from .util import bounded_collect
from .plans.scoring import (EXPANSION_SCHEMA, combine_results,
                            empty_result, score_and_combine)


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
        # live docs-WITH-field count per field_id — the denominator of the
        # engine's batch-mean average semantics; lazily computed when the
        # first maintenance op needs it (build/merge seed it for free)
        self._field_doc_count: Optional[Dict[int, int]] = None
        self.next_id = next_id
        # tombstones: a driver list for point discards (cheap, broadcast)
        # plus an optional DataFrame for mass discards (discard_where) —
        # the persisted-table scale form; millions of tombstones never
        # materialize on the driver
        self.tombstones: List[int] = []
        self._tombstone_df: Optional[DataFrame] = None
        # every DataFrame discard_where cached, so vacuum()/remove_all can
        # unpersist them (round-2 ADVICE: executor-storage leak)
        self._tombstone_caches: List[DataFrame] = []
        self.dirt_count = 0
        self._search_options: dict = {}
        if config.search_options is not None:
            from .config import search_options_dict
            self._search_options = search_options_dict(config.search_options)
        # index-level autoSuggest defaults (reference SearchIndex.ts:161-163)
        self._auto_suggest_options: dict = {}
        if config.auto_suggest_options is not None:
            aso = config.auto_suggest_options
            if isinstance(aso, Mapping):
                self._auto_suggest_options = dict(aso)
            else:
                from .config import search_options_dict
                self._auto_suggest_options = search_options_dict(aso)
        if cache:
            self.postings = postings.cache()
            self.doc_stats = doc_stats.cache()
            self.docs = docs.cache()

    # ------------------------------------------------------------------ build
    @classmethod
    def build(cls, docs_df: DataFrame, config: IndexConfig,
              order_cols: Optional[Sequence[str]] = None,
              cache: bool = True) -> "SparkSearchIndex":
        """One-pass batch build (the Spark-native addAll, SURVEY.md §3.1).

        With ``cache=True`` (default) the build is EAGER and truly
        one-pass: the tokenized corpus is persisted (memory-and-disk,
        spill-safe), postings and doc_stats materialize their caches from
        it, and the intermediate is dropped before returning. The lazy
        alternative tokenized the corpus three times — once for the
        corpus-stats aggregation and once per table cache fill — which
        dominated measured build time (~2x the tokenise work for free).
        ``cache=False`` keeps everything lazy for callers that manage
        their own materialization."""
        spark = docs_df.sparkSession
        if "doc_id" not in docs_df.columns:
            if order_cols is None:
                order_cols = [config.id_field]
            docs_df = assign_doc_ids(docs_df, order_cols)
        tokenized = tokenize_fields(docs_df, config)
        if cache:
            from pyspark import StorageLevel
            tokenized = tokenized.persist(StorageLevel.MEMORY_AND_DISK)
        postings = build_postings(tokenized)
        doc_stats = build_doc_stats(tokenized)
        keep = ["doc_id", config.id_field] + [f for f in config.store_fields
                                              if f in docs_df.columns]
        docs = docs_df.select(*dict.fromkeys(keep))
        if cache:
            postings = postings.cache()
            doc_stats = doc_stats.cache()
            # ONE action fills both caches from the persisted tokenized
            # corpus and collects the stats (round 6 — was a separate
            # postings.count() fill job first)
            avg_len, fcounts = corpus_stats_filling(postings, doc_stats)
            tokenized.unpersist()
        else:
            avg_len, fcounts = corpus_stats(doc_stats)
        doc_count = docs.count()
        idx = cls(spark, config, postings, doc_stats, docs,
                  doc_count, avg_len, next_id=doc_count, cache=cache)
        idx._field_doc_count = dict(fcounts)  # free seed for _field_counts
        return idx

    @classmethod
    def merge(cls, indexes: Sequence["SparkSearchIndex"],
              cache: bool = True,
              check_duplicate_ids: bool = True) -> "SparkSearchIndex":
        """Merge independently-built shard indexes into ONE servable index
        — the production pattern for 10^12-file builds: many bounded build
        jobs (one per corpus shard, each with its own dense doc-id space),
        then a merge job. The north-star merge ("per-partition inverted
        indexes ... merged via a salted shuffle on term-hash") happens
        when the merged index compacts: ``posting_lists()`` runs
        ``compact_posting_lists`` over the unioned postings, which IS the
        term-hash shuffle with the skew-salted hot-term path
        (operators/compact.py). The merge itself is plan surgery only —
        each shard's live view rides in with its doc ids shifted by the
        cumulative ``next_id`` offset, so shard-dense ids stay globally
        dense and the WAND doc-grid stays gap-free.

        Requirements: identical ``fields`` (order included — field_id
        spaces must align), ``id_field``, and row-store columns across
        shards; the analysis config (tokenizer / process_term / ...)
        must also match, which cannot be verified for callables — the
        caller owns that invariant (same contract as loading a saved
        index built elsewhere). Shard tombstones are compacted away (the
        merged index starts clean, like ``save_index``). External-id
        uniqueness across shards is checked with one narrow aggregation
        (``check_duplicate_ids=False`` skips it when the sharding key
        already guarantees disjointness).

        BM25 scores from the merged index are identical to a single
        full-corpus build: doc_count, avg field lengths, and df all
        recompute over the union."""
        if not indexes:
            raise ValueError("merge: need at least one index")
        base = indexes[0]
        cfg = base.config
        base_cols = set(base.docs.columns)
        for ix in indexes[1:]:
            if list(ix.config.fields) != list(cfg.fields):
                raise ValueError(
                    "merge: shard field lists differ "
                    f"({list(ix.config.fields)} vs {list(cfg.fields)}) — "
                    "field_id spaces would misalign")
            if ix.config.id_field != cfg.id_field:
                raise ValueError(
                    f"merge: shard id_field differs ({ix.config.id_field} "
                    f"vs {cfg.id_field})")
            if set(ix.docs.columns) != base_cols:
                raise ValueError(
                    "merge: shard row-store columns differ "
                    f"({sorted(set(ix.docs.columns))} vs "
                    f"{sorted(base_cols)}) — align store_fields")
        posts, stats, rows = [], [], []
        offset = 0
        # denormalized field_len (build_postings) unions only if EVERY
        # shard carries it; a saved-layout shard without it degrades the
        # merged index to the doc_stats-join scoring path
        have_fl = all("field_len" in ix.postings.columns for ix in indexes)
        for ix in indexes:
            tomb = ix._all_tombstones()
            p, s, d = ix.postings, ix.doc_stats, ix.docs
            if not have_fl and "field_len" in p.columns:
                p = p.drop("field_len")
            if tomb is not None:
                p = p.join(tomb, "doc_id", "left_anti")
                s = s.join(tomb, "doc_id", "left_anti")
                d = d.join(tomb, "doc_id", "left_anti")
            shifted = (F.col("doc_id") + F.lit(int(offset))).cast("long")
            posts.append(p.withColumn("doc_id", shifted))
            stats.append(s.withColumn("doc_id", shifted))
            rows.append(d.select(*base.docs.columns)
                        .withColumn("doc_id", shifted))
            offset += int(ix.next_id)
        postings_u, stats_u, docs_u = posts[0], stats[0], rows[0]
        for p, s, d in zip(posts[1:], stats[1:], rows[1:]):
            postings_u = postings_u.unionByName(p)
            stats_u = stats_u.unionByName(s)
            docs_u = docs_u.unionByName(d)
        if check_duplicate_ids and len(indexes) > 1:
            dup = (docs_u.groupBy(cfg.id_field).count()
                   .where(F.col("count") > 1)
                   .select(cfg.id_field).limit(1).collect())
            if dup:
                raise ValueError(
                    f"merge: duplicate {cfg.id_field}="
                    f"{dup[0][cfg.id_field]!r} across shards — every "
                    "document id must be unique in the merged index")
        avg_len, fcounts = corpus_stats(stats_u)
        doc_count = docs_u.count()
        idx = cls(base.spark, cfg, postings_u, stats_u, docs_u,
                  doc_count, avg_len, next_id=offset, cache=cache)
        idx._field_doc_count = dict(fcounts)
        return idx

    # ---------------------------------------------------------------- helpers
    def has_tombstones(self) -> bool:
        return bool(self.tombstones) or self._tombstone_df is not None

    def _field_counts(self) -> Dict[int, int]:
        """Live docs-with-field count per field_id — the denominator of
        the engine's average-field-length semantics: the order-free batch
        mean over docs that HAVE the field (SURVEY P3; the reference's
        running average divides by the all-docs count, add.ts:98, which
        is order-dependent for sparse fields and not reproducible batch
        -wise). Incremental add/discard/remove updates used doc_count
        here before round 4 session 6 — correct for dense fields (the
        counts coincide) but a semantic hybrid for sparse ones; found by
        the maintenance fuzz (tests/test_fuzz_parity.py). Lazily computed
        from live doc_stats (one narrow aggregation), then maintained
        incrementally by the maintenance ops."""
        if self._field_doc_count is None:
            stats = self.doc_stats
            tomb = self._all_tombstones()
            if tomb is not None:
                stats = stats.join(tomb, "doc_id", "left_anti")
            self._field_doc_count = {
                r["field_id"]: int(r["c"]) for r in
                stats.groupBy("field_id")
                .agg(F.count("*").alias("c")).collect()}
        return self._field_doc_count

    def _remove_field_stats(self, sums) -> None:
        """Batch inverse of the per-field mean for removed docs: rows are
        (field_id, s=Σfield_len, c=doc count) of the victims. MUST run
        BEFORE the victims land in tombstones / leave doc_stats (the lazy
        `_field_counts` reads the current live view)."""
        counts = dict(self._field_counts())
        for r in sums:
            fid, s, c = r["field_id"], r["s"], r["c"]
            cf = counts.get(fid, 0)
            old = self.avg_field_length.get(fid, 0.0)
            if cf - c <= 0:
                self.avg_field_length[fid] = 0.0
                counts[fid] = 0
            else:
                self.avg_field_length[fid] = (old * cf - s) / (cf - c)
                counts[fid] = cf - c
        self._field_doc_count = counts

    def _add_field_stats(self, sums: Dict[int, Tuple[int, int]]) -> None:
        """Batch update of the per-field mean for added docs:
        {field_id: (Σfield_len, doc count)} of the new batch. MUST run
        BEFORE the batch lands in doc_stats."""
        counts = dict(self._field_counts())
        for fid, (s, c) in sums.items():
            cf = counts.get(fid, 0)
            old = self.avg_field_length.get(fid, 0.0)
            self.avg_field_length[fid] = (old * cf + s) / (cf + c)
            counts[fid] = cf + c
        self._field_doc_count = counts

    def _all_tombstones(self) -> Optional[DataFrame]:
        """All tombstoned doc_ids as a DataFrame: the driver list (point
        discards) unioned with the mass-discard table. Broadcast only when
        the table part is absent — a discard_where tombstone set can be
        corpus-sized and AQE must pick the join."""
        parts = []
        if self.tombstones:
            parts.append(self.spark.createDataFrame(
                [(int(d),) for d in self.tombstones], "doc_id long"))
        if self._tombstone_df is not None:
            parts.append(self._tombstone_df.select("doc_id"))
        if not parts:
            return None
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return F.broadcast(df) if self._tombstone_df is None else df

    def live_postings(self) -> DataFrame:
        tomb = self._all_tombstones()
        if tomb is None:
            return self.postings
        return self.postings.join(tomb, "doc_id", "left_anti")

    def live_docs(self) -> DataFrame:
        tomb = self._all_tombstones()
        if tomb is None:
            return self.docs
        return self.docs.join(tomb, "doc_id", "left_anti")

    def _log(self, level: str, message: str) -> None:
        """Route engine diagnostics through the configured logger
        (reference logger option, src/defaults.ts:22, src/warning.ts)."""
        if self.config.logger is not None:
            self.config.logger(level, message)
        else:
            import warnings
            warnings.warn(message)

    def term_dictionary(self, field_ids: Sequence[int]) -> DataFrame:
        """(term, field_id, df) over live postings — the prefix/fuzzy
        expansion dictionary, carrying per-(term, field) document
        frequency (round 6: the df column costs nothing extra — the
        distinct the dictionary always paid IS a groupBy — and feeds
        scoring's df table below, replacing a per-query aggregation over
        the postings with a filter over this vocabulary-sized cache).
        Cached across queries (it is tiny relative to postings and every
        expansion query needs it); invalidated on any postings mutation."""
        if getattr(self, "_term_dict", None) is None:
            self._term_dict = (self.live_postings()
                               .groupBy("term", "field_id")
                               .agg(F.count("*").cast("int").alias("df"))
                               .cache())
        sliced = self._term_dict.where(
            F.col("field_id").isin(list(field_ids)))
        if len(set(field_ids)) == 1:
            # (term, field_id) is the dictionary's grouping key, so a
            # single-field slice is already term-distinct — skip the
            # distinct's exchange (round 6; it showed up as two extra
            # stages in every expansion probe on one-field indexes)
            return sliced.select("term")
        return sliced.select("term").distinct()

    def _df_table(self, derived_terms: Sequence[str],
                  field_ids: Sequence[int]) -> Optional[DataFrame]:
        """Per-(term, field) LIVE document frequencies for a query's
        derived terms, served from the cached term dictionary — the
        inverted index's dictionary doing its classic job. None when
        tombstones exist: the cached df could predate a discard, and the
        lazy-delete recount (an aggregation over the tombstone-filtered
        postings) is the correct source there."""
        if self.has_tombstones():
            return None
        if getattr(self, "_term_dict", None) is None:
            self.term_dictionary(field_ids)
        if "df" not in self._term_dict.columns:
            # a dictionary restored from a saved layout predating the df
            # column (or installed by a loader) — scoring falls back to
            # the per-query live aggregation
            return None
        return (self._term_dict
                .where(F.col("term").isin(sorted(set(derived_terms)))
                       & F.col("field_id").isin(list(field_ids)))
                .select("term", "field_id",
                        F.col("df").cast("double").alias("df")))

    # -------------------------------------------------------------- expansion
    def _expand_spec(self, spec: dict, opts: dict,
                     field_ids: Sequence[int]) -> tuple:
        """Build the (branch, query_term, derived_term, rank, weight,
        term_boost) expansion for one query spec — the Spark-native
        executeQuerySpec term expansion (src/results.ts:170-286).

        Returns ``(rows, df)``: driver rows for the exact term plus, when the
        matched dictionary slice is small (≤ ``expansionCollectThreshold``,
        default 10k), the prefix/fuzzy expansion as driver rows too
        (broadcast path). When a short prefix over a huge vocabulary matches
        more terms than the threshold, the expansion stays a DataFrame —
        weight is pure column arithmetic on ``length(term)`` and the
        Levenshtein distance, rank a window over (class, term) — and is
        joined, never collected: the driver holds at most threshold+1 rows
        regardless of vocabulary size.
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
            return rows, None

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

        if "expansionCollectThreshold" in opts:
            threshold = int(opts["expansionCollectThreshold"])
        elif self.doc_count >= DEFAULT_EXPANSION_DF_MIN_DOCS:
            # large corpus: default to the no-collect DataFrame path even
            # for narrow expansions — the broadcast path's per-term isin
            # scan + driver planning loses to the single join once the
            # postings side dominates (measured 3.5x at 1M docs; see
            # DEFAULT_EXPANSION_DF_MIN_DOCS)
            threshold = 0
        else:
            threshold = DEFAULT_EXPANSION_COLLECT_THRESHOLD
        matched = None
        if threshold > 0:
            # one size-capped probe job: the driver never receives more
            # than threshold+1 rows, however many terms match
            matched = bounded_collect(cand, threshold + 1)
            if len(matched) > threshold:
                matched = None
        if matched is None:
            return rows, self._expansion_df(cand, spec, weights,
                                            need_prefix, max_dist)

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
        return rows, None

    def _expansion_df(self, cand: DataFrame, spec: dict,
                      weights: Mapping[str, float], need_prefix: bool,
                      max_dist: int) -> DataFrame:
        """Distributed expansion: the matched dictionary slice as a
        DataFrame in EXPANSION_SCHEMA shape — same weights, ordering, and
        prefix-over-fuzzy dedupe as the driver path (validated equal in
        tests/test_expansion.py), no collect.

        rank is an ORDER SURROGATE here, not a dense row number: every
        downstream consumer sorts match structs by (branch, rank, term,
        field_id), and the driver path's true rank — row_number over
        (class, term) — induces exactly the (class, term) lexicographic
        order. Emitting the class itself preserves that ordering (match
        arrays, autosuggest phrases, parity output) while avoiding a
        row_number window with no partitionBy, which funnels the whole
        matched slice — the one place designed for huge vocabularies —
        through a single task (round-2 VERDICT "what's wrong" #2). Scores
        never depend on rank."""
        term = spec["term"]
        qlen = len(term)
        is_prefix = (F.col("term").startswith(term) if need_prefix
                     else F.lit(False))
        out = (cand
               .where(F.col("term") != term)  # exact is a driver row
               .withColumn("__cls", F.when(is_prefix, F.lit(1))
                           .otherwise(F.lit(2))))
        if max_dist:
            # non-prefix candidates must be real fuzzy hits (distance > 0)
            out = out.where((F.col("__cls") == 1) | (F.col("__lev") > 0))
        tl = F.length("term").cast("double")
        w_prefix = float(weights["prefix"]) * tl / (tl + 0.3 * (tl - qlen))
        w_fuzzy = (float(weights["fuzzy"]) * tl
                   / (tl + F.col("__lev").cast("double")))
        return out.select(
            F.lit(spec["branch"]).cast("int").alias("branch"),
            F.lit(term).alias("query_term"),
            F.col("term").alias("derived_term"),
            F.col("__cls").cast("int").alias("rank"),
            F.when(F.col("__cls") == 1, w_prefix).otherwise(w_fuzzy)
            .cast("double").alias("weight"),
            F.lit(float(spec["termBoost"])).alias("term_boost"))

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
        # index-time callables are the query-side defaults (the reference
        # reuses _options.tokenize/processTerm at search, src/results.ts);
        # at query time they are called without the field argument
        from .functions.tokenize import accepts_field_arg
        process_term = (opts.get("processTerm") or self.config.process_term
                        or _default_process_term)
        tokenize = (opts.get("tokenize") or self.config.tokenize
                    or tokenize_py)
        if tokenize is not tokenize_py and accepts_field_arg(tokenize):
            base_tok = tokenize
            tokenize = lambda text: base_tok(text, None)  # noqa: E731
        if process_term is not _default_process_term and \
                accepts_field_arg(process_term):
            base_proc = process_term
            process_term = lambda t: base_proc(t, None)  # noqa: E731
        terms: List[str] = []
        for token in tokenize(query):
            pt = process_term(token)
            if isinstance(pt, list):
                terms.extend(t for t in pt if t)
            elif pt:
                terms.append(pt)
        if not terms:
            return [], [], []

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
        expansion_dfs: List[DataFrame] = []
        for spec in specs:
            rows, df = self._expand_spec(spec, opts, field_ids)
            expansion_rows.extend(rows)
            if df is not None:
                expansion_dfs.append(df)
        return specs, expansion_rows, expansion_dfs

    # ----------------------------------------------------------------- query
    def _guard_callable_boost(self, opts: dict) -> None:
        """A Python-callable boostDocument runs driver-side over the live
        doc map (the reference's per-result callback has no distributed
        form). Above the threshold that silent ``live_docs().collect()``
        would be a driver OOM at scale — raise with the Column fast path
        spelled out instead (round-2 VERDICT "what's wrong" #1), mirroring
        search_topk_wand's contract errors."""
        limit = int(opts.get("boostDocumentCollectThreshold",
                             DEFAULT_DOC_BOOST_COLLECT_THRESHOLD))
        if self.doc_count > limit:
            raise ValueError(
                f"callable boostDocument evaluates driver-side over all "
                f"{self.doc_count} live docs "
                f"(> boostDocumentCollectThreshold={limit}); pass a Column "
                "expression / SQL string instead (evaluated executor-side, "
                "see _doc_boost_col_df), or raise the threshold explicitly")

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
                      if k not in ("doc_id", "doc_bucket")
                      and k != self.config.id_field
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

    def _doc_boost_col_df(self, boost) -> DataFrame:
        """Column-expression boostDocument fast path: evaluated once per
        live doc over the stored-field row store, entirely executor-side —
        no ``live_docs().collect()``. A Column boost is term-independent
        (only the callable form sees the derived term); falsy (NULL / 0)
        drops the doc, matching the reference's falsy ⇒ skip semantics
        (src/results.ts:123-126)."""
        if isinstance(boost, str):
            boost = F.expr(boost)
        return (self.live_docs()
                .select("doc_id", boost.cast("double").alias("doc_boost"))
                .where(F.col("doc_boost").isNotNull()
                       & (F.col("doc_boost") != 0.0)))

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
            if not callable(bd):
                # Column fast path: score = boost, falsy docs dropped
                boost = F.expr(bd) if isinstance(bd, str) else bd
                return (docs
                        .select("doc_id",
                                boost.cast("double").alias("score"))
                        .where(F.col("score").isNotNull()
                               & (F.col("score") != 0.0))
                        .select(
                            "doc_id", "score",
                            F.expr("cast(array() as array<string>)")
                            .alias("qterms"),
                            F.expr("cast(array() as array<struct<branch:int,"
                                   "rank:int,term:string,field_id:int>>)")
                            .alias("match")))
            self._guard_callable_boost(opts)
            rows = []
            for r in docs.collect():
                d = r.asDict()
                stored = {k: v for k, v in d.items()
                          if k not in ("doc_id", "doc_bucket",
                                       self.config.id_field)
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

        specs, expansion_rows, expansion_dfs = self._plan_string_query(
            query, opts, field_ids, branch_seed)
        if not specs:
            return empty_result(self.spark)

        expansion = expansion_rows
        if expansion_dfs:
            # wide expansion: union the driver rows with the DataFrame
            # slices and join (no broadcast of an unbounded term set)
            from .plans.scoring import EXPANSION_SCHEMA
            expansion = self.spark.createDataFrame(
                expansion_rows, EXPANSION_SCHEMA)
            for df in expansion_dfs:
                expansion = expansion.unionByName(df)

        doc_boost_df = None
        bd = opts.get("boostDocument")
        if bd is not None and callable(bd):
            if expansion_dfs:
                # the callable needs the full derived-term list, i.e. the
                # very driver materialization expansionCollectThreshold
                # exists to prevent — raise instead of collecting it
                # silently (round-2 ADVICE, engine callable-boost + wide
                # expansion)
                raise ValueError(
                    "callable boostDocument with a wide term expansion "
                    "(> expansionCollectThreshold matched terms) would "
                    "materialize the expansion and the doc map on the "
                    "driver; pass a Column-expression boostDocument, or "
                    "raise expansionCollectThreshold explicitly")
            self._guard_callable_boost(opts)
            derived = sorted({r[2] for r in expansion_rows})
            doc_boost_df = self._doc_boost_df(bd, derived)
        elif bd is not None:
            # Column-expression fast path: term-independent boost evaluated
            # over the stored fields, falsy ⇒ skip doc (src/results.ts:123-126)
            doc_boost_df = self._doc_boost_col_df(bd)

        if expansion_dfs:
            postings = self.live_postings()
        else:
            postings = self._pruned_postings(
                self.live_postings(), [r[2] for r in expansion_rows])
        # one-plan score + combinator fused into a single aggregation
        # (round 6 — plans/scoring.score_and_combine): the postings join
        # subtree stays single AND the per-branch/per-doc double
        # aggregation collapses to one groupBy(doc_id)
        df_table = None
        if not expansion_dfs:
            df_table = self._df_table([r[2] for r in expansion_rows],
                                      field_ids)
        return score_and_combine(
            self.spark, postings, self.doc_stats, expansion,
            field_ids, field_boost_by_id, self.avg_field_length,
            self.doc_count, bm25, opts.get("combineWith", OR),
            [s["branch"] for s in specs], doc_boost_df, df_table)

    def _search_hits_df(self, query, options: dict,
                        with_docs: bool = True) -> DataFrame:
        """Unsorted quality-multiplied hits — the shared subplan of
        ``search_df`` and ``auto_suggest_df``. ``with_docs=False`` skips
        the stored-fields row-store join for consumers that only read
        (score, qterms, match) — autosuggest's phrase aggregation —
        saving that join's exchange/broadcast stage (round 6)."""
        raw = self._execute_query(query, options)
        quality = F.when(F.size("qterms") > 0, F.size("qterms")).otherwise(1)
        out = raw.withColumn("score", F.col("score") * quality)
        if with_docs:
            out = out.join(self.docs.drop("doc_bucket"), "doc_id", "inner")
            flt = options.get("filter")
            if flt is not None and not callable(flt):
                # Column expression / SQL string fast path
                out = out.where(flt)
        return out

    def search_df(self, query, **options) -> DataFrame:
        """Distributed search plan → DataFrame(doc_id, <ext id>, score,
        qterms, match, <stored...>), quality-multiplied, sorted desc
        (top-k via ``top_k`` option → TakeOrderedAndProject).

        ``with_stored=False`` skips the stored-fields row-store join
        (output columns: doc_id, score, qterms, match) for consumers
        that drop the stored columns anyway — scores and row set are
        identical (the join only ATTACHES columns: every scored doc_id
        is in the row store by construction), it just stops shipping
        the row store through the plan (guide §1.2 / §2.3 — don't
        compute what you throw away). Ignored when a ``filter`` option
        needs the stored fields."""
        with_stored = options.pop("with_stored", True)
        out = self._search_hits_df(
            query, options,
            with_docs=with_stored or options.get("filter") is not None)
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

    def search_many_df(self, queries: Sequence[str],
                       top_k: Optional[int] = None,
                       **options) -> DataFrame:
        """Score MANY flat string queries in ONE Spark job →
        DataFrame(query_id, doc_id, score), per-query top-k when asked.

        A distributed engine pays job-scheduling overhead per action; a
        query stream served query-by-query spends nearly all its wall
        clock there. This batches: all queries' expansion rows ship as
        one broadcast table tagged with query_id, the postings ⋈
        expansion ⋈ doc_stats join runs once, and one aggregation keyed
        (query_id, doc_id) folds scoring + combinator + quality for every
        query (plans/batch.py) — scores are identical to running
        ``search_df`` per query. ``query_id`` is the position in
        ``queries``; a query with no matches (or no terms) simply has no
        rows. Options apply to the whole batch (one combinator, one
        prefix/fuzzy setting — mixed batches can be unioned by the
        caller); ``filter``/``boostDocument``/WILDCARD stay on
        ``search_df``."""
        opts = {**self._search_options, **options}
        cw = str(opts.get("combineWith", OR)).lower()
        if cw not in (OR, AND, AND_NOT):
            raise ValueError(f"Invalid combination operator: {cw}")
        for unsupported in ("filter", "boostDocument"):
            if opts.get(unsupported) is not None:
                raise ValueError(
                    f"search_many_df does not support {unsupported}; "
                    "use search_df per query")
        from .plans.batch import BATCH_EXPANSION_SCHEMA, score_many
        fields = opts.get("fields") or list(self.config.fields)
        field_ids = [self.field_ids[f] for f in fields]
        boost = opts.get("boost") or {}
        field_boost_by_id = {self.field_ids[f]: (boost.get(f) or 1.0)
                             for f in fields}
        bm25 = {**DEFAULT_BM25, **(opts.get("bm25") or {})}
        rows: List[tuple] = []
        wide: List[DataFrame] = []
        branch_counts: Dict[int, int] = {}
        for qi, q in enumerate(queries):
            specs, erows, edfs = self._plan_string_query(q, opts, field_ids)
            branch_counts[qi] = len(specs)
            rows.extend((qi,) + tuple(r) for r in erows)
            for d in edfs:
                wide.append(d.select(F.lit(qi).cast("int").alias("query_id"),
                                     *EXPANSION_SCHEMA.fieldNames()))
        exp = self.spark.createDataFrame(rows, BATCH_EXPANSION_SCHEMA)
        derived = None
        dft = None
        if wide:
            for d in wide:
                exp = exp.unionByName(d)
            postings = self.live_postings()
        else:
            exp = F.broadcast(exp)
            derived = [r[3] for r in rows]
            dft = self._df_table(derived, field_ids)
            postings = self._pruned_postings(self.live_postings(), derived)
        return score_many(
            self.spark, postings, self.doc_stats, exp, field_ids,
            field_boost_by_id, self.avg_field_length, self.doc_count,
            bm25, cw, branch_counts, k=top_k, derived_terms=derived,
            df_table=dft)

    def search_topk_wand_many(self, queries: Sequence[str], k: int,
                              max_concurrency: int = 4,
                              **options) -> DataFrame:
        """Concurrent pruned top-k for a query batch →
        DataFrame(query_id, doc_id, score).

        `search_many_df` amortizes by fusing N queries into one exact
        plan; this keeps each query on the block-max WAND path (decode
        skip, θ-pruning) and instead overlaps the JOBS: submissions run
        from a thread pool inside the one SparkSession, so one query's
        scheduling/driver gaps are filled by another's stages — standard
        Spark concurrent-job serving. Results are exactly per-query
        ``search_topk_wand`` (each top-k is tiny and collected in its
        own thread, then reassembled). Shared lazy state (compacted
        lists, term dictionary) is materialized once BEFORE the pool —
        the lazy builders are not thread-safe, the serving path is."""
        # materialize at the layout the per-query calls will request:
        # pre-building the DEFAULT layout while threads ask for another
        # would make every thread race the (non-thread-safe) recompaction
        self.posting_lists(options.get("layout"))
        opts = {**self._search_options, **options}
        if opts.get("prefix") or opts.get("fuzzy"):
            fields = opts.get("fields") or list(self.config.fields)
            self.term_dictionary([self.field_ids[f] for f in fields]).count()
        from concurrent.futures import ThreadPoolExecutor

        def one(qi_q):
            qi, q = qi_q
            rows = self.search_topk_wand(q, k, **options).collect()
            return [(qi, int(r["doc_id"]), float(r["score"]))
                    for r in rows]

        with ThreadPoolExecutor(max(1, int(max_concurrency))) as ex:
            parts = list(ex.map(one, enumerate(queries)))
        return self.spark.createDataFrame(
            [r for part in parts for r in part],
            "query_id int, doc_id long, score double")

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
            # a layout change recompacts from scratch — drop any appended
            # segments too, or a later _append_segment would resurrect a
            # stale segment list built under the old grid
            for seg in getattr(self, "_segments", None) or []:
                try:
                    seg.unpersist()
                except Exception:
                    pass
            self._segments = None
            # encode-time BM25 params + the engine's own avg_field_length
            # go into the per-block float impact bounds; queries at the
            # default params get classic block-max θ-pruning, others fall
            # back to the parameter-free (max_tf, min_fl) bound
            self._posting_lists = compact_posting_lists(
                self.live_postings(), layout,
                max_doc_id=self.next_id - 1,
                doc_stats=self.doc_stats,
                bm25=dict(DEFAULT_BM25),
                avg_field_length=dict(self.avg_field_length)).cache()
            self._posting_lists_layout = layout
            self._segment_count = 1
            # every doc encoded so far has doc_id < next_id: postings rows
            # at or above this floor belong to later-appended segments —
            # the predicate the tiered merge uses to re-encode ONLY them
            self._segment_floor = self.next_id
            self._segments_mergeable = True
        return self._posting_lists

    # LSM-style bound: past this many appended segments, the next add_all
    # falls back to a full recompaction (merge) instead of appending —
    # per-(term, field) row fan-out stays bounded however many batches
    # arrive between vacuums
    max_segments: int = 32

    def _append_segment(self, new_postings: DataFrame,
                        new_stats: DataFrame) -> None:
        """Incremental compaction (round 4): encode ONLY the new batch's
        postings as an appended segment of the cached compacted lists.

        Correct without any merge because doc ids are unique across
        segments (add_all enforces it), so a doc exists in exactly one
        segment's row per (term, field) and blocks stay aligned to the
        absolute doc-id grid; the WAND kernels treat segment rows as
        independent slices and group by branch/term, so even INTERLEAVED
        caller-provided id ranges score correctly (gated by the
        `wand_topk_discarded` oracle entry, which appends a `% 5` batch).
        Assign-path appends additionally get disjoint ranges (ids
        continue from next_id), which keeps each segment's blocks dense
        on the grid. Only the per-(term, field) df total is re-aggregated
        at query time (wand_topk ``segmented``). Previously any add_all invalidated the compacted
        lists, forcing a FULL index re-encode before top-k service
        resumed — the per-ingest-batch rewrite that kills a 100 TB index.

        Block-impact bounds of older segments were encoded at the
        then-current avg_field_length; after the append they degrade to
        the parameter-free (max_tf, min_fl) fallback (codec.
        block_impact_bounds) — looser pruning, never wrong scores."""
        from .config import IndexLayout
        from .operators.compact import compact_posting_lists
        layout = self._posting_lists_layout or IndexLayout()
        delta = compact_posting_lists(
            new_postings, layout,
            max_doc_id=self.next_id - 1,
            doc_stats=new_stats,
            bm25=dict(DEFAULT_BM25),
            avg_field_length=dict(self.avg_field_length))
        segs = getattr(self, "_segments", None) or [self._posting_lists]
        # logical segment count can exceed len(segs): a delta-saved index
        # loads as ONE DataFrame spanning several persisted segments
        prev_n = max(int(getattr(self, "_segment_count", 1) or 1), len(segs))
        if "segment" in segs[0].columns:
            # lists loaded from a (delta-)saved index carry the segment
            # partition column — stamp the new batch so the union aligns
            delta = delta.withColumn("segment", F.lit(prev_n))
        delta = delta.cache()
        delta.count()  # encode the batch now, while its inputs are hot
        # segments stay INDIVIDUALLY cached; the served lists are a lazy
        # union over them — appending batch N never re-reads or re-caches
        # batches 1..N-1 (work per add_all is O(batch), not O(index))
        segs.append(delta)
        self._segments = segs
        lists = segs[0]
        for s in segs[1:]:
            lists = lists.unionByName(s)
        self._posting_lists = lists
        self._segment_count = prev_n + 1

    def _merge_small_segments(self, postings: Optional[DataFrame] = None,
                              doc_stats: Optional[DataFrame] = None) -> bool:
        """Tiered (LSM-style) merge at the ``max_segments`` cap: re-encode
        ONLY the segments appended since the base compaction into one,
        leaving the base untouched — O(appended docs), where the previous
        fallback (full invalidate → re-encode on next use) is O(index).
        At a 1% ingest-batch ratio that overflow rewrite was ~100× the
        appended volume; tiered it stays proportional to what arrived.

        Appended rows are identified by ``doc_id >= _segment_floor`` (the
        next_id at base-compaction time) against the cached postings
        union — valid only while every appended batch's ids sit above the
        floor (the assign path guarantees it; a caller-provided batch
        with interleaved ids clears ``_segments_mergeable`` in add_all
        and the cap falls back to the full merge). When called from
        add_all mid-ingest, ``postings``/``doc_stats`` are the PRE-batch
        snapshots — the incoming batch must not fold into the merged
        segment, or its subsequent _append_segment would double-count its
        docs across two segments. → True if merged."""
        from .config import IndexLayout
        from .operators.compact import compact_posting_lists
        segs = getattr(self, "_segments", None)
        floor = getattr(self, "_segment_floor", None)
        if (not getattr(self, "_segments_mergeable", False)
                or floor is None or not segs or len(segs) < 3):
            return False
        layout = self._posting_lists_layout or IndexLayout()
        pred = F.col("doc_id") >= floor
        src_post = postings if postings is not None else self.postings
        src_stats = doc_stats if doc_stats is not None else self.doc_stats
        small_post = src_post.where(pred).select(
            "term", "field_id", "doc_id", "tf")
        merged = compact_posting_lists(
            small_post, layout,
            max_doc_id=self.next_id - 1,
            doc_stats=src_stats.where(pred),
            bm25=dict(DEFAULT_BM25),
            avg_field_length=dict(self.avg_field_length))
        base = segs[0]
        # logical count can exceed len(segs) when the base DataFrame spans
        # several persisted (delta-saved) segments — preserve that share
        base_logical = max(
            1, int(getattr(self, "_segment_count", 1) or 1) - (len(segs) - 1))
        if "segment" in base.columns:
            merged = merged.withColumn("segment", F.lit(base_logical))
        merged = merged.cache()
        merged.count()  # materialize before dropping the small segments
        for s in segs[1:]:
            try:
                s.unpersist()
            except Exception:
                pass
        self._segments = [base, merged]
        self._posting_lists = base.unionByName(merged)
        self._segment_count = base_logical + 1
        return True

    def search_topk_wand(self, query: str, k: int,
                         posting_lists: Optional[DataFrame] = None,
                         layout=None, metrics: Optional[dict] = None,
                         adaptive_min_docs: int = 100_000,
                         tombstone_collect_threshold: int = 1_000_000,
                         filter_collect_threshold: int = 1_000_000,
                         wide_fanout_exact_threshold: Optional[int] =
                         DEFAULT_WAND_FANOUT_EXACT_THRESHOLD,
                         theta0_min_docs: Optional[int] = None,
                         **options) -> DataFrame:
        """Top-k search over the compacted index with distributed block-max
        WAND pruning (plans/wand.py).

        Contract: flat string queries (OR / AND / AND_NOT, any field
        subset, field boosts) over a compacted index; ``boostDocument``
        is not supported on this path (a per-doc multiplier invalidates
        the stored block bounds — use ``search_df(top_k=k)``). Within
        that contract, scores are identical to ``search_df`` and only
        provably sub-threshold docs are skipped: OR runs disjunctive
        block-max WAND, AND runs posting-list intersection at grid-cell
        granularity with block skip (reference AND semantics,
        src/utils.ts:108-121; multi-field loop, src/results.ts:170-189),
        AND_NOT subtracts the negative lists inside surviving positive
        cells only (src/utils.ts:129-133). Unsupported options raise
        instead of silently returning wrong results.

        ``filter`` (round 4): a Column / SQL-string predicate over the
        stored fields IS served — reference semantics (src/search.ts:199:
        scores are computed as if unfiltered, failing docs just cannot
        appear), so the failing doc_ids ship into the kernels exactly
        like tombstones and are dropped at decode time; df/idf stay
        untouched. The failing set is bounded by
        ``filter_collect_threshold`` (a predicate that excludes nearly
        everything belongs on ``search_df``, where it pushes into the
        scan). Callable filters stay unsupported here.

        A discarded, unvacuumed index stays servable: the tombstoned
        doc_ids ship into the shard kernels and are dropped at block-decode
        time (round-3 VERDICT "what's wrong" #4 — previously any discard
        forced a full compaction rewrite before top-k service resumed),
        and df/idf are recounted over the live postings as a joined
        DataFrame — never on the driver — so this composes with wide
        expansions too (the round-3 corner). Mass ``discard_where``
        tombstone sets above ``tombstone_collect_threshold`` ids still
        require a vacuum (they would not fit a task closure).

        Wide expansions (matched terms > expansionCollectThreshold) take
        the pruned path too (round 4): the expansion ships as a DataFrame
        joined against the compacted lists inside ``wand_topk`` — no
        driver materialization of the derived-term set. Above
        ``wide_fanout_exact_threshold`` derived terms (round 5) the
        pruned path is provably counterproductive — theta never clears
        the per-list bounds, 0% of blocks prune, and per-list overhead
        loses 3.3-3.7x to the exact plan (BASELINE.md round-5 fan-out
        probe) — so the engine serves the result-identical exact plan
        instead (None disables; ``metrics=`` callers always get WAND).

        After ``add_all`` on a compacted index, the new docs live in an
        appended SEGMENT (incremental compaction — no index rewrite);
        this path serves multi-segment lists transparently (per-(term,
        field) df totals are re-aggregated inside ``wand_topk``)."""
        from .plans.wand import wand_topk
        tombstones = None
        if self.has_tombstones():
            tombstones = list(self.tombstones)
            if self._tombstone_df is not None:
                limit = int(tombstone_collect_threshold)
                extra = bounded_collect(
                    self._tombstone_df.select("doc_id"), limit + 1)
                if len(extra) > limit:
                    raise ValueError(
                        "WAND path: discard_where tombstone set exceeds "
                        f"tombstone_collect_threshold={limit}; run "
                        "vacuum() first or raise the threshold")
                tombstones.extend(int(r["doc_id"]) for r in extra)
        opts = {**self._search_options, **options}
        cw = str(opts.get("combineWith", OR)).lower()
        if cw not in (OR, AND, AND_NOT):
            raise ValueError(
                f"search_topk_wand supports combineWith=OR/AND/AND_NOT "
                f"(got {cw}); use search_df(top_k=k)")
        if opts.get("boostDocument") is not None:
            raise ValueError(
                "search_topk_wand does not support boostDocument; "
                "use search_df(top_k=k)")
        flt = opts.get("filter")
        if flt is not None and callable(flt):
            raise ValueError(
                "search_topk_wand supports filter only as a Column / SQL "
                "string predicate over stored fields; for a Python "
                "callable use search_df(top_k=k)")
        fields = opts.get("fields") or list(self.config.fields)
        field_ids = [self.field_ids[f] for f in fields]
        if (posting_lists is None and metrics is None
                and self.doc_count < adaptive_min_docs
                and getattr(self, "_posting_lists", None) is None):
            # adaptive skip: below the crossover, building the compacted
            # lists + the θ0/route/shard stages cost more than they prune
            # (BASELINE.md §WAND crossover) — the exact single-plan top-k
            # is result-identical by contract and faster. The skip applies
            # ONLY while no compacted lists exist yet: once compaction is
            # cached (or the index was loaded from a save), the pruned
            # path wins at every measured size (round-3 bench: AND WAND
            # 0.98 s vs exact 1.34 s even at 5k docs). Callers probing the
            # pruning machinery (metrics=) always get the real WAND path.
            return (self.search_df(query, top_k=k, **options)
                    .select("doc_id", "score"))
        boost = opts.get("boost") or {}
        specs, expansion_rows, expansion_dfs = self._plan_string_query(
            query, opts, field_ids)
        expansion_df = None
        branch_ids = None
        n_query_terms = None
        if expansion_dfs:
            # WIDE expansion: the matched term set exceeds
            # expansionCollectThreshold — ship the expansion as a DataFrame
            # and let wand_topk JOIN it against the compacted lists; the
            # derived-term set never touches the driver, so a short prefix
            # over a 10^9-term vocabulary still takes the pruned path. The
            # query's branch/term structure (needed for the AND branch
            # count and the quality bound) comes from the query string.
            from .plans.scoring import EXPANSION_SCHEMA
            expansion_df = self.spark.createDataFrame(
                expansion_rows, EXPANSION_SCHEMA)
            for df in expansion_dfs:
                expansion_df = expansion_df.unionByName(df)
            branch_ids = [s["branch"] for s in specs]
            n_query_terms = len({s["term"] for s in specs})
            expansion_rows = []
        if (wide_fanout_exact_threshold is not None
                and posting_lists is None and metrics is None):
            # extreme fan-out fallback (round 5): above the crossover
            # WAND decodes everything (theta never clears the per-list
            # bounds when thousands of lists each contribute) and its
            # per-list kernel overhead loses 3.3-3.7x to the exact JVM
            # plan (BASELINE.md round-5 wide-fanout probe + crossover
            # sweep) — serve the result-identical exact plan instead.
            # The width probe is bounded: len() on a collected
            # expansion, or limit(n+1).count() on the cached term
            # dictionary for DataFrame expansions. metrics= callers
            # (pruning probes) always get the real WAND path.
            limit = int(wide_fanout_exact_threshold)
            if expansion_df is not None:
                wide = expansion_df.limit(limit + 1).count() > limit
            else:
                wide = len(expansion_rows) > limit
            if wide:
                return (self.search_df(query, top_k=k, **options)
                        .select("doc_id", "score"))
        if posting_lists is None:
            lists = self.posting_lists(layout)
            # the grid span the cached lists were actually built with
            layout = getattr(self, "_posting_lists_layout", layout)
            segmented = getattr(self, "_segment_count", 1) > 1
        else:
            lists = posting_lists
            segmented = bool(options.get("segmented", False))
        live_df = None
        if tombstones:
            # compacted rows carry the pre-discard df (dead docs counted),
            # which would deflate idf — recount df over the live view for
            # just the matched derived terms as a JOINED DataFrame (never
            # on the driver, so wide expansions compose; on a saved index
            # the bucket predicate prunes partitions)
            if expansion_df is not None:
                derived_df = (expansion_df
                              .select(F.col("derived_term").alias("term"))
                              .distinct())
                live = (self.live_postings()
                        .join(F.broadcast(derived_df), "term", "left_semi"))
            else:
                derived = sorted({r[2] for r in expansion_rows})
                live = (self._pruned_postings(self.live_postings(), derived)
                        .where(F.col("term").isin(derived)))
            live_df = (live.where(F.col("field_id").isin(field_ids))
                       .groupBy("term", "field_id")
                       .agg(F.count("*").alias("df")))
        if flt is not None:
            # reference filter semantics (src/search.ts:199): scores stay
            # those of the unfiltered query — so the failing doc_ids ride
            # the tombstone mechanism (decode-time drop) WITHOUT touching
            # the df recount above
            pred = F.expr(flt) if isinstance(flt, str) else flt
            limit = int(filter_collect_threshold)
            failing = bounded_collect(
                self.live_docs()
                .where(~F.coalesce(pred, F.lit(False)))
                .select("doc_id"), limit + 1)
            if len(failing) > limit:
                raise ValueError(
                    "search_topk_wand: filter excludes more than "
                    f"filter_collect_threshold={limit} docs; such a "
                    "selective predicate belongs on search_df(top_k=k), "
                    "where it pushes into the scan")
            tombstones = list(tombstones or [])
            tombstones.extend(int(r["doc_id"]) for r in failing)
        return wand_topk(
            lists, expansion_rows, k, self.doc_count, self.avg_field_length,
            field_ids=field_ids,
            field_boost_by_id={self.field_ids[f]: float(boost.get(f) or 1.0)
                               for f in fields},
            combine_with=cw,
            bm25={**DEFAULT_BM25, **(opts.get("bm25") or {})},
            layout=layout, max_doc_id=self.next_id - 1,
            tombstones=tombstones, live_df=live_df, segmented=segmented,
            expansion_df=expansion_df, branch_ids=branch_ids,
            n_query_terms=n_query_terms, metrics=metrics,
            theta0_min_docs=theta0_min_docs)

    def search(self, query, **options) -> List[dict]:
        """Parity-shaped results (reference search(), src/search.ts:169-209)."""
        df = self.search_df(query, **{k: v for k, v in options.items()
                                      if k != "filter" or not callable(v)})
        results = []
        for r in df.collect():
            d = r.asDict()
            match: Dict[str, List[str]] = {}
            # (branch, rank, term, field_id): on the DF expansion path rank
            # is the expansion CLASS (ties within it), so term must sort
            # before field_id or multi-field matches could interleave terms
            # and break insertion order (round-3 ADVICE)
            for m in sorted(d["match"] or [],
                            key=lambda s: (s["branch"], s["rank"],
                                           s["term"], s["field_id"])):
                match.setdefault(m["term"], []).append(
                    self.config.fields[m["field_id"]])
            stored = {k: v for k, v in d.items()
                      if k not in ("doc_id", "doc_bucket", "score",
                                   "qterms", "match",
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
        # unsorted hits: the phrase groupBy is order-insensitive, so
        # search_df's global orderBy would be a wasted Exchange + Sort;
        # the row-store join only matters when a stored-field filter is
        # set (round 6 — two fewer stages per suggest query)
        hits = self._search_hits_df(query, opts,
                                    with_docs=opts.get("filter") is not None)
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
    def _point_docs(self, ext_ids: Sequence) -> DataFrame:
        """Live docs filtered to the given external ids. On an index loaded
        from a saved layout the docs row-store is partitioned by
        ``doc_bucket = pmod(xxhash64(id), n_doc_buckets)`` — the literal
        bucket set of the requested ids becomes a PartitionFilters predicate,
        so a point lookup reads ~|ids|/n_doc_buckets of the table instead of
        scanning it (round-3 VERDICT #5). The bucket is computed with the
        SAME Spark expression over a literal DF (type-faithful to the stored
        column), never re-implemented driver-side."""
        ids = list(ext_ids)
        docs = self.live_docs()
        n = getattr(self, "_n_doc_buckets", None)
        if n and ids and "doc_bucket" in self.docs.columns:
            id_type = self.docs.schema[self.config.id_field].dataType
            ids_df = self.spark.createDataFrame(
                [(v,) for v in ids],
                T.StructType([T.StructField("v", id_type)]))
            buckets = [r["b"] for r in ids_df.select(
                F.pmod(F.xxhash64("v"), F.lit(int(n)))
                .cast("int").alias("b")).distinct().collect()]
            docs = docs.where(F.col("doc_bucket").isin(buckets))
        return docs.where(F.col(self.config.id_field).isin(ids))

    def has(self, ext_id) -> bool:
        return self._point_docs([ext_id]).count() > 0

    def get_stored_fields(self, ext_id) -> Optional[dict]:
        """Point lookup of the stored-field projection by external id
        (reference getStoredFields, src/info.ts:31-41)."""
        rows = self._point_docs([ext_id]).collect()
        if not rows:
            return None
        d = rows[0].asDict()
        return {k: v for k, v in d.items()
                if k not in ("doc_id", "doc_bucket", self.config.id_field)
                and v is not None}

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
        rows = (self._point_docs(ext_ids)
                .select("doc_id", self.config.id_field).collect())
        found = {r[self.config.id_field]: int(r["doc_id"]) for r in rows}
        missing = [e for e in ext_ids if e not in found]
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
        # both directions in one pass: derived ⊖ stored catches added /
        # changed postings, a row-count mismatch catches pure removals
        # (stored rows the re-derived doc no longer produces) — the
        # reference warns on any changed document (src/warning.ts)
        d_cnt, s_cnt = derived.count(), stored.count()
        changed = d_cnt != s_cnt or (derived.select(*cols)
                                     .exceptAll(stored.select(*cols))
                                     .limit(1).count())
        if changed:
            self._log("warn", "slimsearch_spark: some documents have "
                              "changed before removal (version_conflict)")

        sums = (self.doc_stats.join(F.broadcast(victims), "doc_id",
                                    "left_semi")
                .groupBy("field_id")
                .agg(F.sum("field_len").alias("s"), F.count("*").alias("c"))
                .collect())
        self._remove_field_stats(sums)
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
        self._tombstone_df = None
        self._drop_tombstone_caches()
        self.postings = self.postings.limit(0).cache()
        self.doc_stats = self.doc_stats.limit(0).cache()
        self.docs = self.docs.limit(0).cache()
        self.doc_count = 0
        self.next_id = 0
        self.dirt_count = 0
        self.avg_field_length = {}
        self._field_doc_count = {}
        self._invalidate_posting_lists()

    def discard(self, ext_id) -> None:
        """Tombstone delete (reference src/remove.ts:63-88): doc disappears
        from searches immediately; postings stay until vacuum (which runs
        automatically past the configured dirt thresholds)."""
        row = self._point_docs([ext_id]).select("doc_id").collect()
        if not row:
            raise ValueError(
                f"cannot discard document with ID {ext_id}: not in the index")
        doc_id = int(row[0]["doc_id"])
        flens = {r["field_id"]: r["field_len"] for r in
                 self.doc_stats.where(F.col("doc_id") == doc_id).collect()}
        counts = dict(self._field_counts())
        for fid, flen in flens.items():
            count = counts.get(fid, 0)
            if count <= 1:
                self.avg_field_length[fid] = 0.0
                counts[fid] = 0
            else:
                total = self.avg_field_length.get(fid, 0.0) * count - flen
                self.avg_field_length[fid] = total / (count - 1)
                counts[fid] = count - 1
        self._field_doc_count = counts
        self.tombstones.append(doc_id)
        self.doc_count -= 1
        self.dirt_count += 1
        self._maybe_auto_vacuum()

    def discard_all(self, ext_ids: Sequence) -> None:
        """Batch tombstone (reference discardAll, src/remove.ts:105-120) —
        one batched plan, not a per-id loop."""
        self.discard_many(ext_ids)

    def discard_many(self, ext_ids: Sequence) -> None:
        """Batch tombstone (reference discardAll, src/remove.ts:105-120) with
        one lookup job instead of per-id round-trips. The batched
        average-inverse equals the sequential one exactly (removing a set
        from a running mean is order-independent when every doc has the
        field)."""
        ids = list(ext_ids)
        rows = self._point_docs(ids).select("doc_id").collect()
        doc_ids = {int(r["doc_id"]) for r in rows}
        if len(doc_ids) != len(ids):
            raise ValueError("cannot discard: some IDs not in the index")
        tomb = self.spark.createDataFrame([(d,) for d in doc_ids],
                                          "doc_id long")
        sums = (self.doc_stats.join(F.broadcast(tomb), "doc_id", "left_semi")
                .groupBy("field_id")
                .agg(F.sum("field_len").alias("s"), F.count("*").alias("c"))
                .collect())
        self._remove_field_stats(sums)
        self.tombstones.extend(sorted(doc_ids))
        self.doc_count -= len(doc_ids)
        self.dirt_count += len(doc_ids)
        self._maybe_auto_vacuum()

    def discard_where(self, condition) -> int:
        """Mass tombstone by predicate over the row store — the persisted-
        tombstone-table scale form: the matched doc_ids never reach the
        driver (no list, no broadcast); stats update is one aggregation
        job. → number of docs discarded.

        ``condition``: a Column / SQL string over the stored-field columns.
        """
        if isinstance(condition, str):
            condition = F.expr(condition)
        victims = (self.live_docs().where(condition)
                   .select("doc_id").cache())
        sums = (self.doc_stats.join(victims, "doc_id", "left_semi")
                .groupBy("field_id")
                .agg(F.sum("field_len").alias("s"), F.count("*").alias("c"))
                .collect())
        n_victims = victims.count()
        if not n_victims:
            victims.unpersist()
            return 0
        self._remove_field_stats(sums)
        self._tombstone_caches.append(victims)
        if self._tombstone_df is None:
            self._tombstone_df = victims
        else:
            old = self._tombstone_df
            new = (old.select("doc_id")
                   .unionByName(victims.select("doc_id")).cache())
            new.count()  # materialize before dropping the superseded union
            self._tombstone_df = new
            self._tombstone_caches.append(new)
            if any(c is old for c in self._tombstone_caches):
                # the superseded union chain is dead weight once the new
                # union is materialized — unpersist eagerly, not at vacuum
                self._tombstone_caches = [c for c in self._tombstone_caches
                                          if c is not old]
                old.unpersist()
        self.doc_count -= n_victims
        self.dirt_count += n_victims
        self._maybe_auto_vacuum()
        return n_victims

    @property
    def dirt_factor(self) -> float:
        """Proportion of discarded docs (reference SearchIndex.ts:215-217)."""
        return self.dirt_count / (1 + self.doc_count + self.dirt_count)

    def _maybe_auto_vacuum(self) -> None:
        """Vacuum automatically after a discard once BOTH thresholds are
        reached (reference maybeAutoVacuum, src/vacuum.ts:15-21,100-108;
        defaults minDirtCount=20, minDirtFactor=0.1, src/defaults.ts:43-49).
        ``IndexConfig.auto_vacuum``: True = defaults, dict = overrides,
        False = manual vacuum only. Batching knobs (batchSize/batchWait)
        are cooperative-scheduling artifacts with no Spark analogue — the
        vacuum rewrite is already one batched distributed plan."""
        av = getattr(self.config, "auto_vacuum", True)
        if av is False or av is None:
            return
        conds = dict(DEFAULT_AUTO_VACUUM)
        if isinstance(av, Mapping):
            conds.update(av)
        if (self.dirt_count >= conds["minDirtCount"]
                and self.dirt_factor >= conds["minDirtFactor"]):
            self.vacuum()

    def vacuum(self) -> None:
        """Compaction rewrite (reference src/vacuum.ts:23-108): drop postings
        and stats of tombstoned docs, reset dirt."""
        tomb = self._all_tombstones()
        if tomb is None:
            self.dirt_count = 0
            return
        self.postings = (self.postings
                         .join(tomb, "doc_id", "left_anti").cache())
        self.doc_stats = (self.doc_stats
                          .join(tomb, "doc_id", "left_anti").cache())
        self.docs = (self.docs
                     .join(tomb, "doc_id", "left_anti").cache())
        self.postings.count()
        self.tombstones = []
        self._tombstone_df = None
        self._drop_tombstone_caches()
        self.dirt_count = 0
        self._invalidate_posting_lists()

    def _drop_tombstone_caches(self) -> None:
        """Unpersist every DataFrame discard_where cached — without this,
        executor storage leaks across discard_where/vacuum cycles (round-2
        ADVICE). Safe before the rewritten state materializes: the dropped
        plans recompute from lineage if ever re-evaluated."""
        for df in self._tombstone_caches:
            try:
                df.unpersist()
            except Exception:
                pass
        self._tombstone_caches = []

    def _invalidate_posting_lists(self) -> None:
        """Drop the cached compacted lists + term dictionary after any
        in-place postings mutation (remove/vacuum — add_all appends a
        segment instead) — both re-derive lazily on next use."""
        for df in ([getattr(self, "_posting_lists", None),
                    getattr(self, "_term_dict", None)]
                   + list(getattr(self, "_segments", None) or [])):
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass
        self._posting_lists = None
        self._posting_lists_layout = None
        self._segments = None
        self._segment_count = 1
        self._segment_floor = None
        self._segments_mergeable = False
        self._term_dict = None

    def unpersist(self, blocking: bool = False) -> None:
        """Release EVERY cached DataFrame this index holds — base tables
        (postings/doc_stats/docs), compacted posting lists, appended
        segments, term dictionary, tombstone caches.

        Why this exists (round 5, found by the 1M serving-loop probe): a
        long-lived session that serves successive index GENERATIONS — a
        cold reader calling ``load_index`` after every ingest batch, a
        blue/green swap, a test loop — accumulates every generation's
        caches in executor storage memory; ten 1M-doc generations
        overflowed a 16 GB local-mode heap where one fits easily. Spark
        only evicts cached blocks LRU under allocation pressure, and in
        local mode storage and execution share a single JVM heap, so the
        pressure shows up as GC thrash before eviction saves you.
        Dropping the superseded generation explicitly is deterministic.

        The index stays fully usable afterwards — every cache rebuilds
        lazily on next use — so this is a memory release, not a close."""
        self._drop_tombstone_caches()
        self._invalidate_posting_lists()
        for df in (self.postings, self.doc_stats, self.docs,
                   self._tombstone_df):
            if df is not None:
                try:
                    df.unpersist(blocking)
                except Exception:
                    pass

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
        dup_in = (new_docs.groupBy(self.config.id_field)
                  .count().where(F.col("count") > 1).limit(1).collect())
        if dup_in:
            raise ValueError(
                f"duplicate ID {dup_in[0][self.config.id_field]} within "
                "the add_all batch")
        if "doc_id" in new_docs.columns:
            # caller-provided internal ids (same trust as build); they must
            # not collide with existing ones nor repeat within the batch
            assigned = new_docs
            clash = (assigned.select("doc_id")
                     .join(self.docs.select("doc_id"), "doc_id", "left_semi")
                     .limit(1).collect())
            if clash:
                raise ValueError(
                    f"duplicate doc_id {clash[0]['doc_id']} in add_all")
            clash_in = (assigned.groupBy("doc_id").count()
                        .where(F.col("count") > 1).limit(1).collect())
            if clash_in:
                raise ValueError(
                    f"duplicate doc_id {clash_in[0]['doc_id']} within "
                    "the add_all batch")
        else:
            assigned = assign_doc_ids(new_docs, order_cols)
            assigned = assigned.withColumn(
                "doc_id", F.col("doc_id") + F.lit(self.next_id))
        from pyspark import StorageLevel
        tokenized = tokenize_fields(assigned, self.config).persist(
            StorageLevel.MEMORY_AND_DISK)  # one tokenize pass feeds the
        # stats collect, the segment encode, and the term-dict union
        new_postings = build_postings(tokenized)
        new_stats = build_doc_stats(tokenized)
        n_new = assigned.count()
        # running averages, batched: per-field mean extended by the batch
        sums = {r["field_id"]: (r["s"], r["c"]) for r in
                new_stats.groupBy("field_id")
                .agg(F.sum("field_len").alias("s"), F.count("*").alias("c"))
                .collect()}
        self._add_field_stats(sums)
        keep = ["doc_id", self.config.id_field] + \
            [f for f in self.config.store_fields if f in assigned.columns]
        if "field_len" not in self.postings.columns:
            # saved-layout postings lack the denormalized field_len
            # (index_store strips it) — align the batch so the union
            # stays well-formed; scoring falls back to the stats join
            new_postings = new_postings.drop("field_len")
        if "bucket" in self.postings.columns and \
                getattr(self, "_n_term_buckets", None):
            new_postings = new_postings.withColumn(
                "bucket", F.pmod(F.xxhash64("term"),
                                 F.lit(self._n_term_buckets)).cast("int"))
        new_docs_rows = assigned.select(*dict.fromkeys(keep))
        if "doc_bucket" in self.docs.columns and \
                getattr(self, "_n_doc_buckets", None):
            # loaded row store is doc-bucketed: stamp new rows with the
            # same hash, or point lookups' bucket predicate would miss them
            new_docs_rows = new_docs_rows.withColumn(
                "doc_bucket", F.pmod(F.xxhash64(self.config.id_field),
                                     F.lit(self._n_doc_buckets)).cast("int"))
        # pre-batch snapshots: a tiered merge at the cap must re-encode
        # only the EARLIER appended segments, never the incoming batch
        # (which _append_segment adds as its own segment right after)
        pre_postings, pre_stats = self.postings, self.doc_stats
        self.postings = self.postings.unionByName(new_postings).cache()
        self.doc_stats = self.doc_stats.unionByName(new_stats).cache()
        self.docs = self.docs.unionByName(
            new_docs_rows, allowMissingColumns=True).cache()
        self.doc_count += n_new
        if "doc_id" in new_docs.columns and n_new:
            # n_new guard (round 6): an EMPTY batch aggregates min/max to
            # NULL and the int() cast raised TypeError — latent since the
            # caller-id path landed; next_id/floor are correctly untouched
            # by a no-op batch
            lo_hi = assigned.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
            self.next_id = max(self.next_id, int(lo_hi[1]) + 1)
            floor = getattr(self, "_segment_floor", None)
            if floor is not None and int(lo_hi[0]) < floor:
                # caller-provided ids interleaved below the base segment's
                # id ceiling: the floor predicate can no longer separate
                # appended rows from base rows — the max_segments overflow
                # must take the full merge, never the tiered one
                self._segments_mergeable = False
        else:
            self.next_id += n_new
        if (getattr(self, "_posting_lists", None) is not None and n_new
                and getattr(self, "_segment_count", 1) >= self.max_segments
                and not self._merge_small_segments(pre_postings, pre_stats)):
            # at the cap with no tiered merge possible: full invalidate
            # (re-encode everything lazily on next use)
            self._invalidate_posting_lists()
        if getattr(self, "_posting_lists", None) is not None and n_new:
            # the index is already compacted (WAND-serving): append the
            # batch as a new SEGMENT instead of invalidating — no full
            # re-encode before top-k service resumes (round-4)
            self._append_segment(new_postings, new_stats)
            if getattr(self, "_term_dict", None) is not None:
                # dictionary-sized re-aggregation, not a postings rescan:
                # the dictionary carries df (round 6), so the batch's own
                # per-(term, field) counts fold in by sum. A dictionary
                # restored from a saved layout has no df column — keep
                # its old union+distinct maintenance (scoring falls back
                # to the live df aggregation for it anyway).
                old_td = self._term_dict
                if "df" in old_td.columns:
                    td = (old_td
                          .unionByName(
                              new_postings.groupBy("term", "field_id")
                              .agg(F.count("*").cast("int").alias("df")))
                          .groupBy("term", "field_id")
                          .agg(F.sum("df").cast("int").alias("df")).cache())
                else:
                    td = (old_td
                          .unionByName(new_postings
                                       .select("term", "field_id")
                                       .distinct())
                          .distinct().cache())
                td.count()
                try:
                    old_td.unpersist()
                except Exception:
                    pass
                self._term_dict = td
        else:
            self._invalidate_posting_lists()
        tokenized.unpersist()

    def absorb(self, other: "SparkSearchIndex") -> None:
        """Ingest another index's documents WITHOUT re-tokenizing — the
        continuous-ingestion pattern at very large scale: build a shard
        index over the new data as a bounded, independently resumable job
        (`build` / `build_index.py`), then absorb it into the serving
        index in O(shard): the shard's postings are already tokenized, so
        absorption is an id-shift + union, and when the serving index is
        compacted the shard lands as an appended SEGMENT
        (`_append_segment` — one O(shard) encode, the base lists
        untouched). `SparkSearchIndex.merge` is the from-scratch
        consolidation (k shards → one fresh index, O(total) compaction);
        `absorb` is the incremental form (shard → live serving index,
        O(shard)). BM25 stats update exactly like `add_all`: running
        average over the absorbed field-length sums, df recomputed by the
        serving plans over the union.

        The other index's tombstones compact away (only its live docs
        ingest); its internal doc ids shift by this index's ``next_id``
        (dense above the existing range, so the tiered segment merge's
        floor predicate keeps working). Same config guards as `merge`;
        the other index is not mutated and remains usable."""
        cfg = self.config
        if list(other.config.fields) != list(cfg.fields):
            raise ValueError(
                "absorb: field lists differ "
                f"({list(other.config.fields)} vs {list(cfg.fields)}) — "
                "field_id spaces would misalign")
        if other.config.id_field != cfg.id_field:
            raise ValueError(
                f"absorb: id_field differs ({other.config.id_field} "
                f"vs {cfg.id_field})")
        dup = (other.live_docs()
               .join(self.live_docs().select(cfg.id_field),
                     cfg.id_field, "left_semi")
               .select(cfg.id_field).limit(1).collect())
        if dup:
            raise ValueError(
                f"absorb: duplicate ID {dup[0][cfg.id_field]!r} — the "
                "absorbed index overlaps this one")
        offset = int(self.next_id)
        shifted = (F.col("doc_id") + F.lit(offset)).cast("long")
        tomb = other._all_tombstones()
        o_post, o_stats, o_docs = other.postings, other.doc_stats, other.docs
        if tomb is not None:
            o_post = o_post.join(tomb, "doc_id", "left_anti")
            o_stats = o_stats.join(tomb, "doc_id", "left_anti")
            o_docs = o_docs.join(tomb, "doc_id", "left_anti")
        pcols = ["term", "field_id", "doc_id", "tf"] + (
            ["field_len"] if "field_len" in o_post.columns else [])
        new_postings = (o_post.select(*pcols)
                        .withColumn("doc_id", shifted))
        new_stats = (o_stats.select("doc_id", "field_id", "field_len")
                     .withColumn("doc_id", shifted))
        keep = ["doc_id", cfg.id_field] + \
            [f for f in cfg.store_fields if f in o_docs.columns]
        new_docs_rows = (o_docs.select(*dict.fromkeys(keep))
                         .withColumn("doc_id", shifted))
        n_new = new_docs_rows.count()
        # running averages, batched — identical to add_all
        sums = {r["field_id"]: (r["s"], r["c"]) for r in
                new_stats.groupBy("field_id")
                .agg(F.sum("field_len").alias("s"), F.count("*").alias("c"))
                .collect()}
        self._add_field_stats(sums)
        if "bucket" in self.postings.columns and \
                getattr(self, "_n_term_buckets", None):
            new_postings = new_postings.withColumn(
                "bucket", F.pmod(F.xxhash64("term"),
                                 F.lit(self._n_term_buckets)).cast("int"))
        if "doc_bucket" in self.docs.columns and \
                getattr(self, "_n_doc_buckets", None):
            new_docs_rows = new_docs_rows.withColumn(
                "doc_bucket", F.pmod(F.xxhash64(cfg.id_field),
                                     F.lit(self._n_doc_buckets)).cast("int"))
        self_fl = "field_len" in self.postings.columns
        new_fl = "field_len" in new_postings.columns
        if self_fl and not new_fl:
            # absorbing a saved-layout shard into a built index: degrade
            # this index to the doc_stats-join scoring path rather than
            # union NULL field_lens into the posting rows
            self.postings = self.postings.drop("field_len")
        elif new_fl and not self_fl:
            new_postings = new_postings.drop("field_len")
        pre_postings, pre_stats = self.postings, self.doc_stats
        self.postings = self.postings.unionByName(new_postings).cache()
        self.doc_stats = self.doc_stats.unionByName(new_stats).cache()
        self.docs = self.docs.unionByName(
            new_docs_rows, allowMissingColumns=True).cache()
        self.doc_count += n_new
        self.next_id = offset + int(other.next_id)
        if (getattr(self, "_posting_lists", None) is not None and n_new
                and getattr(self, "_segment_count", 1) >= self.max_segments
                and not self._merge_small_segments(pre_postings, pre_stats)):
            self._invalidate_posting_lists()
        if getattr(self, "_posting_lists", None) is not None and n_new:
            self._append_segment(new_postings, new_stats)
            if getattr(self, "_term_dict", None) is not None:
                # df-carrying dictionary: fold the absorbed shard's
                # counts; a loaded df-less dictionary keeps the old
                # union+distinct (see add_all)
                old_td = self._term_dict
                if "df" in old_td.columns:
                    td = (old_td
                          .unionByName(
                              new_postings.groupBy("term", "field_id")
                              .agg(F.count("*").cast("int").alias("df")))
                          .groupBy("term", "field_id")
                          .agg(F.sum("df").cast("int").alias("df")).cache())
                else:
                    td = (old_td
                          .unionByName(new_postings
                                       .select("term", "field_id")
                                       .distinct())
                          .distinct().cache())
                td.count()
                try:
                    old_td.unpersist()
                except Exception:
                    pass
                self._term_dict = td
        else:
            self._invalidate_posting_lists()

    def replace(self, doc: Mapping[str, Any]) -> None:
        self.discard(doc[self.config.id_field])
        row = self.spark.createDataFrame([doc])
        self.add_all(row)
