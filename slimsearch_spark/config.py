"""Engine configuration and defaults.

Mirrors the reference's option surface (slimsearch ``src/defaults.ts:5-49``,
``src/typings.ts:98-331``) re-expressed as plain Python dataclasses. These are
the *semantics* knobs; physical/layout knobs (buckets, salting, block size)
live in :class:`IndexLayout`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Mapping, Optional, Sequence, Union

# Sentinel wildcard query (reference: src/symbols.ts:1)
WILDCARD = object()

# Combination operators (reference: src/constant.ts:5-7)
OR = "or"
AND = "and"
AND_NOT = "and_not"

# BM25+ defaults (reference: src/defaults.ts:5)
DEFAULT_BM25 = {"k": 1.2, "b": 0.7, "d": 0.5}

# Expansion weights (reference: src/defaults.ts:34)
DEFAULT_WEIGHTS = {"fuzzy": 0.45, "prefix": 0.375}

DEFAULT_MAX_FUZZY = 6  # reference: src/defaults.ts:31 (maxFuzzy)

# Prefix/fuzzy expansion: matched dictionary slices up to this size are
# collected and broadcast (lowest-latency path); larger slices stay as a
# joined DataFrame so the driver never materializes a wide expansion.
DEFAULT_EXPANSION_COLLECT_THRESHOLD = 10_000
# above this many live docs the expansion defaults to the no-collect
# DataFrame path even when narrow: the broadcast path's per-term isin
# scan + driver planning loses to the single join as the postings side
# grows (measured crossover ~250k docs: 1.0x at 100k, 1.18x at 300k,
# 3.5x at 1M — expansion_scale_probe, BASELINE.md round-4). An explicit
# expansionCollectThreshold in options always wins over the heuristic.
DEFAULT_EXPANSION_DF_MIN_DOCS = 250_000

# Block-max WAND is the wrong plan at extreme expansion fan-out: with
# thousands of derived query terms every doc matches many lists, theta
# never clears the per-list bounds (0% of 20.9M blocks pruned at 20k
# terms x 1M docs — BASELINE.md round-5 wide-fanout probe) and the
# per-list kernel overhead makes WAND 3.3-3.7x SLOWER than the exact
# JVM plan, which is scan-dominated and nearly flat in term count.
# Above this many derived terms search_topk_wand serves the
# (result-identical by contract) exact plan instead; the width probe is
# one bounded count over the cached term dictionary. Calibrated by the
# round-5 fan-out crossover sweep (BASELINE.md).
DEFAULT_WAND_FANOUT_EXACT_THRESHOLD = 4_096

# The disjunctive-WAND global-θ pre-pass is its own Spark action (one
# mapInPandas over the matched lists + a k-th-largest collect) BEFORE the
# main pruned pass. Seeding θ0 only pays when there are enough blocks for
# pruning to matter: below this many live docs the grid is a handful of
# blocks per list and the pre-pass job costs more wall clock than it
# prunes (round-6 measurement at 5k docs: OR = 2 jobs slower than AND,
# which has no pre-pass, on result-identical queries). θ0 = 0 is always
# CORRECT (WAND prunes only provably sub-threshold blocks; the top-k is
# identical either way), so this is a pure plan-cost knob — skipping the
# pre-pass small, keeping it at scale. metrics= probes always run it.
DEFAULT_WAND_THETA0_MIN_DOCS = 100_000

# Callable boostDocument evaluates driver-side over the live doc map (the
# reference's per-result callback has no distributed form); above this many
# live docs the engine raises instead of silently collecting the corpus —
# the Column-expression boost is the executor-side scale path.
DEFAULT_DOC_BOOST_COLLECT_THRESHOLD = 100_000

# Tokenizer split class (reference: src/constant.ts:3). Unicode Symbol chars
# (+ = < > | $ ~ ^ `) are NOT separators — significant for source code.
TOKEN_SPLIT_PATTERN = r"[\n\r\p{Z}\p{P}]+"


@dataclass
class SearchOptions:
    """Per-query options (reference: src/typings.ts:98-222, defaults.ts:28-36)."""

    combine_with: str = OR
    prefix: Union[bool, Callable[[str, int, Sequence[str]], bool]] = False
    fuzzy: Union[bool, float, Callable[[str, int, Sequence[str]], Any]] = False
    max_fuzzy: int = DEFAULT_MAX_FUZZY
    fields: Optional[Sequence[str]] = None
    boost: Mapping[str, float] = field(default_factory=dict)
    weights: Mapping[str, float] = field(default_factory=dict)
    bm25: Mapping[str, float] = field(default_factory=lambda: dict(DEFAULT_BM25))
    boost_term: Optional[Callable[[str, int, Sequence[str]], float]] = None
    boost_document: Optional[Callable[..., float]] = None
    filter: Optional[Callable[[dict], bool]] = None
    top_k: Optional[int] = None  # north-star addition; reference returns all


@dataclass
class AutoSuggestOptions(SearchOptions):
    """autoSuggest defaults: AND + prefix on last term (defaults.ts:38-41)."""

    combine_with: str = AND

    def __post_init__(self) -> None:
        if self.prefix is False:
            self.prefix = lambda term, index, terms: index == len(terms) - 1


def search_options_dict(so: "SearchOptions") -> dict:
    """SearchOptions dataclass → the engine's option-dict surface (the
    camelCase keys mirror the reference's SearchOptions fields)."""
    out = {
        "combineWith": so.combine_with, "prefix": so.prefix,
        "fuzzy": so.fuzzy, "maxFuzzy": so.max_fuzzy, "fields": so.fields,
        "boost": dict(so.boost), "weights": dict(so.weights),
        "bm25": dict(so.bm25), "boostTerm": so.boost_term,
        "boostDocument": so.boost_document, "filter": so.filter,
        "top_k": so.top_k,
    }
    return {k: v for k, v in out.items() if v not in (None, {}, ())}


def _default_extract_field(document, field_name: str):
    """Reference default extractField (src/defaults.ts:10-13): plain key
    access on the document."""
    if isinstance(document, Mapping):
        return document.get(field_name)
    return getattr(document, field_name, None)


def _default_stringify_field(value, field_name: str = "") -> str:
    """Reference default stringifyField (src/defaults.ts:14): toString."""
    return value if isinstance(value, str) else str(value)


def _default_process_term(term: str) -> str:
    """Reference default processTerm (src/defaults.ts:16): lowercase."""
    return term.lower()


# Introspectable defaults — the reference's defaultOptions key set
# (src/defaults.ts:7-26, exposed via getDefaultValue src/defaults.ts:75-79)
# plus this engine's search-option defaults as a compatibility superset.
DEFAULT_OPTIONS: dict = {
    # reference defaultOptions surface
    "idField": "id",
    "extractField": _default_extract_field,
    "stringifyField": _default_stringify_field,
    "processTerm": _default_process_term,
    "fields": None,
    "searchOptions": None,
    "storeFields": [],
    "logger": None,  # None routes engine warnings through warnings.warn
    "autoVacuum": True,
    "autoSuggestOptions": {"combineWith": AND, "prefix": "last-term"},
    # engine search-option defaults (superset, kept for introspection)
    "combineWith": OR,
    "prefix": False,
    "fuzzy": False,
    "maxFuzzy": DEFAULT_MAX_FUZZY,
    "weights": dict(DEFAULT_WEIGHTS),
    "bm25": dict(DEFAULT_BM25),
    "tokenizePattern": TOKEN_SPLIT_PATTERN,
}


def get_default_value(option_name: str):
    """Introspect a default option value; unknown names throw (reference
    src/defaults.ts:75-79). ``tokenize`` resolves lazily to the default
    tokenizer callable (import-cycle-free)."""
    if option_name == "tokenize":
        from .functions.tokenize import tokenize_py
        return tokenize_py
    if option_name not in DEFAULT_OPTIONS:
        raise ValueError(f"slimsearch_spark: unknown option {option_name}")
    return DEFAULT_OPTIONS[option_name]


# Auto-vacuum trigger thresholds (reference src/defaults.ts:43-49):
# vacuum runs after a discard when BOTH are reached.
DEFAULT_AUTO_VACUUM = {"minDirtCount": 20, "minDirtFactor": 0.1}


@dataclass
class IndexConfig:
    """Index-build options (reference createIndex, src/SearchIndex.ts:143-197)."""

    fields: Sequence[str]
    id_field: str = "id"
    store_fields: Sequence[str] = ()
    # 'jvm' = F.split/F.lower built-ins (whole-stage codegen fast path);
    # 'regex_udf' = pandas UDF with the `regex` module (JS-parity-safe path).
    # Both are validated equal on the parity corpora (tests/test_tokenize.py).
    tokenizer: str = "jvm"
    search_options: Optional[SearchOptions] = None
    # index-level autoSuggest defaults (reference src/SearchIndex.ts:49,
    # 161-163, src/typings.ts:330): merged over the built-in AND +
    # last-term-prefix defaults for every auto_suggest/auto_suggest_df
    # call; per-call options still win. Accepts an AutoSuggestOptions /
    # SearchOptions dataclass or a plain camelCase option dict.
    auto_suggest_options: Optional[Union[SearchOptions, Mapping]] = None
    # True (reference default) = vacuum automatically when dirt_count ≥
    # minDirtCount AND dirt_factor ≥ minDirtFactor; a dict overrides the
    # thresholds; False disables (src/defaults.ts:25, src/vacuum.ts:15-21).
    auto_vacuum: Union[bool, Mapping[str, float]] = True
    # index-time analysis chain overrides (reference src/defaults.ts:15-16,
    # src/add.ts:97-113): tokenize(text)->tokens and processTerm(term)->
    # term | list[term] | falsy-to-drop. Applied at BUILD and reused
    # query-side unless per-query options override them.
    tokenize: Optional[Callable[[str], Sequence[str]]] = None
    process_term: Optional[Callable[[str], Any]] = None
    # custom field extraction / stringification (reference
    # src/typings.ts:246,277; defaults src/defaults.ts:10-14), applied at
    # index (and remove re-derive) time inside the Arrow analysis UDF:
    # extract_field(doc_dict, field_name) -> value | None (None skips the
    # field for that doc, the reference's == null check, src/add.ts:89-91);
    # stringify_field(value, field_name) -> str (default str(value), the
    # reference's .toString()). Dot-path struct columns stay the
    # zero-Python fast path when neither is set.
    extract_field: Optional[Callable[[Mapping, str], Any]] = None
    stringify_field: Optional[Callable[[Any, str], str]] = None
    # logger(level, message) — reference src/defaults.ts:22; default routes
    # engine warnings through warnings.warn
    logger: Optional[Callable[[str, str], None]] = None


@dataclass
class IndexLayout:
    """Physical layout knobs for the materialized index (scale path)."""

    n_term_buckets: int = 64          # salted xxhash64(term) shuffle width
    n_doc_buckets: int = 64           # saved docs row-store partition width
    block_doc_range: int = 512        # doc-id grid span per compressed block
    hot_term_salts: int = 16          # salt fan-out for stopword-like hot terms
    hot_term_df_threshold: int = 100_000  # df above which a term is "hot"
    wand_ranges_per_core: int = 2     # doc-range shards per core for WAND topk
