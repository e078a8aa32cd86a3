"""Pure-Python oracle: an exact reimplementation of the reference semantics.

This is NOT the engine — it is the rank-identity referee (SURVEY.md §5) that the
distributed Spark engine is tested against. It mirrors, operation for operation:

* add / field-length bookkeeping   — slimsearch src/add.ts:7-115
* BM25+ scoring                    — src/utils.ts:137-152 (k=1.2, b=0.7, d=0.5)
* query execution + expansion      — src/results.ts:170-325
* combinators OR/AND/AND_NOT       — src/utils.ts:88-134
* result assembly, quality, sort   — src/search.ts:169-209
* autoSuggest                      — src/autoSuggest.ts:68-98
* discard/remove/vacuum semantics  — src/remove.ts, src/vacuum.ts

Python dicts preserve insertion order exactly like JS Maps, so RawResult
iteration order (and therefore tie order under the stable sort) matches the
reference wherever our trie-free expansion enumerates terms in the same order.
Prefix/fuzzy candidates are enumerated in sorted term order (the reference uses
trie child-insertion order); all golden fixtures are score-distinct so this
never changes an expected ranking (SURVEY.md P5).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Mapping, Optional, Sequence, Union

from .config import (
    AND,
    AND_NOT,
    DEFAULT_BM25,
    DEFAULT_MAX_FUZZY,
    DEFAULT_WEIGHTS,
    OR,
    WILDCARD,
)
from .functions.tokenize import tokenize_py


def default_process_term(term: str) -> str:
    return term.lower()


def js_round(x: float) -> int:
    """JS Math.round: half away from zero toward +Infinity."""
    return math.floor(x + 0.5)


def levenshtein(a: str, b: str, max_dist: int) -> Optional[int]:
    """Plain Levenshtein with early bail; None if distance > max_dist."""
    if abs(len(a) - len(b)) > max_dist:
        return None
    if a == b:
        return 0
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        row_min = i
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            row_min = min(row_min, cur[-1])
        if row_min > max_dist:
            return None
        prev = cur
    return prev[-1] if prev[-1] <= max_dist else None


def calc_bm25(tf: int, df: int, n_docs: int, field_len: float, avg_field_len: float,
              bm25: Mapping[str, float]) -> float:
    """BM25+ (src/utils.ts:137-152)."""
    k, b, d = bm25["k"], bm25["b"], bm25["d"]
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * (d + (tf * (k + 1)) / (tf + k * (1 - b + (b * field_len) / avg_field_len)))


class OracleIndex:
    """In-memory reference model (one per fixture corpus)."""

    def __init__(self, fields: Sequence[str], id_field: str = "id",
                 store_fields: Sequence[str] = (),
                 search_options: Optional[dict] = None,
                 auto_suggest_options: Optional[dict] = None,
                 tokenize: Callable[[str], List[str]] = tokenize_py,
                 process_term: Callable[[str], Any] = default_process_term):
        self.fields = list(fields)
        self.id_field = id_field
        self.store_fields = list(store_fields)
        self._field_ids = {f: i for i, f in enumerate(fields)}
        self._index: Dict[str, Dict[int, Dict[int, int]]] = {}
        self._doc_ids: Dict[int, Any] = {}
        self._id_to_short: Dict[Any, int] = {}
        self._field_length: Dict[int, Dict[int, int]] = {}
        self._avg_field_length: Dict[int, float] = {}
        self._stored: Dict[int, dict] = {}
        self._next_id = 0
        self._doc_count = 0
        self._dirt_count = 0
        self._search_options = dict(search_options or {})
        self._auto_suggest_options = dict(auto_suggest_options or {})
        self._tokenize = tokenize
        self._process_term = process_term

    # ---- build (src/add.ts:71-115) ----
    def add(self, doc: Mapping[str, Any]) -> None:
        doc_id = doc.get(self.id_field)
        if doc_id is None:
            raise ValueError(f'document does not have ID field "{self.id_field}"')
        if doc_id in self._id_to_short:
            raise ValueError(f"duplicate ID {doc_id}")
        short = self._next_id
        self._id_to_short[doc_id] = short
        self._doc_ids[short] = doc_id
        self._doc_count += 1
        self._next_id += 1
        if self.store_fields:
            stored = {}
            for f in self.store_fields:
                v = doc.get(f)
                if v is not None:
                    stored[f] = v
            self._stored[short] = stored
        for fname in self.fields:
            value = doc.get(fname)
            if value is None:
                continue
            tokens = self._tokenize(str(value))
            fid = self._field_ids[fname]
            unique_terms = len(set(tokens))  # raw tokens, incl. '' (add.ts:96)
            self._field_length.setdefault(short, {})[fid] = unique_terms
            avg = self._avg_field_length.get(fid, 0.0)
            count = self._doc_count - 1
            self._avg_field_length[fid] = (avg * count + unique_terms) / (count + 1)
            for token in tokens:
                pt = self._process_term(token)
                terms = pt if isinstance(pt, list) else ([pt] if pt else [])
                for term in terms:
                    self._index.setdefault(term, {}).setdefault(fid, {})
                    fm = self._index[term][fid]
                    fm[short] = fm.get(short, 0) + 1

    def add_all(self, docs: Sequence[Mapping[str, Any]]) -> None:
        for d in docs:
            self.add(d)

    # ---- maintenance (src/remove.ts, src/vacuum.ts) ----
    def discard(self, doc_id: Any) -> None:
        short = self._id_to_short.get(doc_id)
        if short is None:
            raise ValueError(f"cannot discard document with ID {doc_id}: not in the index")
        del self._id_to_short[doc_id]
        del self._doc_ids[short]
        self._stored.pop(short, None)
        for fid, flen in self._field_length.get(short, {}).items():
            self._remove_field_length(fid, self._doc_count, flen)
        self._field_length.pop(short, None)
        self._doc_count -= 1
        self._dirt_count += 1

    def _remove_field_length(self, fid: int, count: int, length: int) -> None:
        # src/remove.ts:7-22 — inverse of the running average, count = doc
        # count BEFORE the decrement
        if count == 1:
            self._avg_field_length[fid] = 0.0
            return
        total = self._avg_field_length.get(fid, 0.0) * count - length
        self._avg_field_length[fid] = total / (count - 1)

    def vacuum(self) -> None:
        for term in list(self._index):
            fmap = self._index[term]
            for fid in list(fmap):
                postings = fmap[fid]
                for short in list(postings):
                    if short not in self._doc_ids:
                        del postings[short]
                if not postings:
                    del fmap[fid]
            if not fmap:
                del self._index[term]
        self._dirt_count = 0

    def replace(self, doc: Mapping[str, Any]) -> None:
        self.discard(doc[self.id_field])
        self.add(doc)

    def has(self, doc_id: Any) -> bool:
        return doc_id in self._id_to_short

    # ---- query (src/results.ts) ----
    def _term_results(self, source_term, derived_term, term_weight, term_boost,
                      field_term_data, field_boosts, boost_document, bm25, results):
        if field_term_data is None:
            return results
        for fname, fboost in field_boosts.items():
            fid = self._field_ids[fname]
            postings = field_term_data.get(fid)
            if postings is None:
                continue
            df = len(postings)
            # lazy delete-on-search (src/results.ts:109-114): discarded docs
            # don't count toward df
            live = [s for s in postings if s in self._doc_ids]
            df -= len(postings) - len(live)
            avg_len = self._avg_field_length.get(fid, 0.0)
            for short in live:
                doc_boost = 1
                if boost_document is not None:
                    doc_boost = boost_document(self._doc_ids[short], derived_term,
                                               self._stored.get(short))
                    if not doc_boost:
                        continue
                tf = postings[short]
                field_len = self._field_length[short][fid]
                raw = calc_bm25(tf, df, self._doc_count, field_len, avg_len, bm25)
                weighted = term_weight * term_boost * fboost * doc_boost * raw
                entry = results.get(short)
                if entry is not None:
                    entry["score"] += weighted
                    if source_term not in entry["terms"]:
                        entry["terms"].append(source_term)
                    entry["match"].setdefault(derived_term, []).append(fname)
                else:
                    results[short] = {"score": weighted, "terms": [source_term],
                                      "match": {derived_term: [fname]}}
        return results

    def _execute_query_spec(self, spec: dict, options: dict) -> dict:
        opts = {**self._search_options, **options}
        fields = opts.get("fields") or self.fields
        boost = opts.get("boost") or {}
        field_boosts = {f: (boost.get(f) or 1) for f in fields}
        weights = {**DEFAULT_WEIGHTS, **(opts.get("weights") or {})}
        max_fuzzy = opts.get("maxFuzzy", DEFAULT_MAX_FUZZY)
        bm25 = {**DEFAULT_BM25, **(opts.get("bm25") or {})}
        boost_document = opts.get("boostDocument")
        term = spec["term"]

        results: dict = {}
        self._term_results(term, term, 1, spec["termBoost"], self._index.get(term),
                           field_boosts, boost_document, bm25, results)

        prefix_terms: List[str] = []
        if spec["prefix"]:
            prefix_terms = sorted(t for t in self._index if t.startswith(term))

        fuzzy_matches: Dict[str, int] = {}
        if spec["fuzzy"]:
            fuzzy = 0.2 if spec["fuzzy"] is True else spec["fuzzy"]
            max_dist = int(fuzzy) if fuzzy >= 1 else min(max_fuzzy, js_round(len(term) * fuzzy))
            if max_dist:
                for t in sorted(self._index):
                    d = levenshtein(term, t, max_dist)
                    if d is not None:
                        fuzzy_matches[t] = d

        for t in prefix_terms:
            distance = len(t) - len(term)
            if not distance:
                continue
            fuzzy_matches.pop(t, None)  # prefix wins (src/results.ts:230-234)
            weight = weights["prefix"] * len(t) / (len(t) + 0.3 * distance)
            self._term_results(term, t, weight, spec["termBoost"], self._index[t],
                               field_boosts, boost_document, bm25, results)

        for t, distance in fuzzy_matches.items():
            if not distance:
                continue
            weight = weights["fuzzy"] * len(t) / (len(t) + distance)
            self._term_results(term, t, weight, spec["termBoost"], self._index[t],
                               field_boosts, boost_document, bm25, results)

        return results

    @staticmethod
    def _combine(results: List[dict], combine_with: str) -> dict:
        if not results:
            return {}
        op = combine_with.lower()
        if op not in (OR, AND, AND_NOT):
            raise ValueError(f"Invalid combination operator: {combine_with}")

        def merge_or(a, b):
            for doc, v in b.items():
                e = a.get(doc)
                if e is None:
                    a[doc] = v
                else:
                    e["score"] += v["score"]
                    e["match"].update(v["match"])
                    for t in v["terms"]:
                        if t not in e["terms"]:
                            e["terms"].append(t)
            return a

        def merge_and(a, b):
            combined = {}
            for doc, v in b.items():
                e = a.get(doc)
                if e is None:
                    continue
                for t in v["terms"]:
                    if t not in e["terms"]:
                        e["terms"].append(t)
                e["match"].update(v["match"])
                combined[doc] = {"score": e["score"] + v["score"],
                                 "terms": e["terms"], "match": e["match"]}
            return combined

        def merge_and_not(a, b):
            for doc in b:
                a.pop(doc, None)
            return a

        fn = {OR: merge_or, AND: merge_and, AND_NOT: merge_and_not}[op]
        acc = results[0]
        for r in results[1:]:
            acc = fn(acc, r)
        return acc

    def _execute_query(self, query, options: dict) -> dict:
        if query is WILDCARD:
            opts = {**self._search_options, **options}
            boost_document = opts.get("boostDocument")
            out = {}
            for short, ext in self._doc_ids.items():
                score = (boost_document(ext, "", self._stored.get(short))
                         if boost_document else 1)
                out[short] = {"score": score, "terms": [], "match": {}}
            return out
        if isinstance(query, Mapping):  # query tree with option cascade
            options = {**options, **{k: v for k, v in query.items() if k != "queries"}}
            sub = [self._execute_query(q, options) for q in query["queries"]]
            return self._combine(sub, options.get("combineWith", OR))
        opts = {**self._search_options, **options}
        terms: List[str] = []
        for token in self._tokenize(query):
            pt = self._process_term(token)
            if isinstance(pt, list):
                terms.extend(t for t in pt if t)
            elif pt:
                terms.append(pt)
        specs = []
        for i, term in enumerate(terms):
            fuzzy = opts.get("fuzzy", False)
            prefix = opts.get("prefix", False)
            boost_term = opts.get("boostTerm")
            specs.append({
                "term": term,
                "fuzzy": fuzzy(term, i, terms) if callable(fuzzy) else (fuzzy or False),
                "prefix": prefix(term, i, terms) if callable(prefix) else prefix is True,
                "termBoost": boost_term(term, i, terms) if callable(boost_term) else 1,
            })
        per_spec = [self._execute_query_spec(s, options) for s in specs]
        return self._combine(per_spec, opts.get("combineWith", OR))

    def search(self, query, **options) -> List[dict]:
        opts = {**self._search_options, **options}
        raw = self._execute_query(query, options)
        results = []
        for short, v in raw.items():
            quality = len(v["terms"]) or 1
            result = {
                "id": self._doc_ids[short],
                "score": v["score"] * quality,
                "terms": list(v["match"].keys()),
                "queryTerms": v["terms"],
                "match": v["match"],
                **self._stored.get(short, {}),
            }
            flt = opts.get("filter")
            if flt is None or flt(result):
                results.append(result)
        if query is WILDCARD and opts.get("boostDocument") is None:
            return results
        results.sort(key=lambda r: -r["score"])  # stable, like JS sort byScore
        return results

    def auto_suggest(self, query: str, **options) -> List[dict]:
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
        out = [{"suggestion": phrase, "terms": s["terms"], "score": s["score"] / s["count"]}
               for phrase, s in suggestions.items()]
        out.sort(key=lambda r: -r["score"])
        return out
