"""Text-analysis column expressions for LLM-data-pipeline operators
(SURVEY.md §2.3 E6, north-star "text analysis").

Everything is a pure Catalyst expression — no Python UDFs — so these run
inside whole-stage codegen over a 100 TB documents table. The reference's
only string op is a regex path rewrite (``Nomic MultiModal Retrieval.py``:162);
the rest of this module is the extended surface mandated by BASELINE.json.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(v: Column | str) -> Column:
    return F.col(v) if isinstance(v, str) else v


def tokenize(text: Column | str, sep: str = " ") -> Column:
    """Whitespace tokenization → array<string> (empty tokens dropped)."""
    return F.filter(F.split(_c(text), sep), lambda t: t != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokenize(text))


# A BPE-ish segmentation: runs of letters, runs of digits, or a single
# other non-space char. Kept to syntax shared by Java regex and RE2 so the
# DuckDB oracle can reproduce it exactly.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_ish_tokens(text: Column | str) -> Column:
    return F.regexp_extract_all(_c(text), F.lit(BPE_ISH_PATTERN), 0)


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct sliding word n-grams — the dedup unit for MinHash/Jaccard.

    Docs shorter than ``n`` words contribute their full text as the single
    shingle (so they can still match exact copies of themselves).

    Implementation note: built as a zip_with chain over the token array and
    its j-shifted slices, NOT as ``transform(sequence, i -> element_at(ws,
    i+j))``. Interpreted higher-order functions re-evaluate every subtree
    referenced *inside* the lambda once per element — with the tokenizer in
    the lambda that is O(positions x |text|) per row (measured ~2 ms/doc at
    sf0.1). As zip_with arguments, the slices are evaluated once per row.
    """
    ws = tokenize(text)
    acc = ws
    for j in range(1, n):
        shifted = F.slice(ws, j + 1, F.greatest(F.size(ws) - j, F.lit(0)))
        # zip_with pads the shorter side with nulls; concat_ws skips them,
        # which is exactly the short-doc / boundary semantics we want
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat_ws(" ", a, b))
    acc = F.slice(acc, 1, F.greatest(F.size(ws) - (n - 1), F.lit(1)))
    return F.when(F.size(ws) == 0, F.array(F.lit(""))).otherwise(
        F.array_distinct(acc)
    )


def jaccard(a: Column | str, b: Column | str) -> Column:
    """Exact Jaccard similarity of two array columns (as float64)."""
    inter = F.size(F.array_intersect(_c(a), _c(b))).cast("double")
    union = F.size(F.array_union(_c(a), _c(b))).cast("double")
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint (md5 hex — identical in Spark and
    DuckDB, so it doubles as the cross-engine dedup key)."""
    return F.md5(_c(text))


def normalized_fingerprint(text: Column | str) -> Column:
    """Fingerprint of the canonical bag-of-words (sorted distinct tokens) —
    catches re-orderings/repetitions that raw-text equality misses."""
    bag = F.array_sort(F.array_distinct(tokenize(text)))
    return F.md5(F.concat_ws(" ", bag))


def rolling_fingerprints(
    text: Column | str, k: int = 8, keep_suffixes: tuple[str, ...] = ("0", "8")
) -> Column:
    """Content-defined rolling-hash fingerprints (north-star "document
    fingerprinting (rolling hash)"): hash EVERY k-char gram of the text
    (the rolling window), keep the grams whose hash lands in a fixed
    residue class — here, md5 hex ending in ``keep_suffixes`` (2/16 =
    1/8 expected sampling rate). Selection depends only on local content,
    so shared substrings between two documents yield the SAME
    fingerprints regardless of their position — the property that makes
    these usable for partial-overlap / containment detection, where
    whole-doc hashes and position-anchored chunking both fail.

    Returns a distinct array of selected hash strings. One expression
    pass per row — O(len·k) hashing, no shuffle, no Python; md5 is used
    as the gram hash so the result is engine-portable (the DuckDB oracle
    recomputes it value-exactly). Texts shorter than ``k`` contribute
    their single clipped gram (subject to the same selection), so exact
    short duplicates can still match."""
    t = _c(text)
    n_grams = F.greatest(F.length(t) - (k - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), n_grams),
        lambda i: F.md5(t.substr(i, F.lit(k))),
    )
    kept = F.filter(
        grams,
        lambda h: F.substring(h, 32, 1).isin(*keep_suffixes),
    )
    return F.array_sort(F.array_distinct(kept))


# --------------------------------------------------------------------- #
# quality scoring
# --------------------------------------------------------------------- #

def char_class_ratio(text: Column | str, pattern: str) -> Column:
    """Fraction of characters matching a regex character class."""
    t = _c(text)
    kept = F.length(t) - F.length(F.regexp_replace(t, pattern, ""))
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        kept.cast("double") / F.length(t).cast("double")
    )


def quality_score(text: Column | str) -> Column:
    """Heuristic document quality in [0,1]: rewards alphabetic content and
    moderate token length, penalizes digits/punctuation soup. A composite
    of pure column expressions so the DuckDB oracle can restate it
    verbatim (see registry.ORACLE['text_quality'])."""
    t = _c(text)
    alpha = char_class_ratio(t, "[A-Za-z ]")
    digit = char_class_ratio(t, "[0-9]")
    toks = token_count(t)
    avg_wlen = F.when(toks == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(t, " ", "")).cast("double") / toks.cast("double")
    )
    # plausible-word-length bonus: 1 at avg length 5, fading linearly
    wlen_bonus = F.greatest(
        F.lit(0.0), F.lit(1.0) - F.abs(avg_wlen - F.lit(5.0)) / F.lit(5.0)
    )
    raw = alpha * F.lit(0.6) + wlen_bonus * F.lit(0.3) + (F.lit(1.0) - digit) * F.lit(0.1)
    return F.least(F.lit(1.0), F.greatest(F.lit(0.0), raw))


# --------------------------------------------------------------------- #
# language identification (n-gram/stopword heuristic)
# --------------------------------------------------------------------- #

# Minimal public stopword markers per language. On real text the argmax of
# marker-hit ratios is a serviceable cheap lang-id; here it doubles as a
# deterministic, SQL-restatable operator.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "fr": ("le", "la", "et", "les", "des", "un"),
    "es": ("el", "los", "las", "y", "un", "es"),
}


def lang_marker_score(text: Column | str, lang: str) -> Column:
    ws = tokenize(text)
    markers = LANG_MARKERS[lang]
    hits = F.size(F.filter(ws, lambda w: w.isin(*markers)))
    return F.when(F.size(ws) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(ws).cast("double")
    )


def lang_id(text: Column | str, min_score: float = 0.05) -> Column:
    """Predicted language = argmax marker ratio (ties → lexicographic
    language order), or 'und' when no language clears ``min_score``.
    CJK content short-circuits to 'zh' on any CJK codepoint."""
    t = _c(text)
    scores = [(lang, lang_marker_score(t, lang)) for lang in sorted(LANG_MARKERS)]
    best_score = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    # reversed so the first (lexicographically smallest) lang wins ties
    for lang, s in reversed(scores):
        pred = F.when((s == best_score) & (s >= min_score), F.lit(lang)).otherwise(pred)
    has_cjk = F.regexp_like(t, F.lit("[\\x{4e00}-\\x{9fff}]"))
    return F.when(has_cjk, F.lit("zh")).otherwise(pred)


# --------------------------------------------------------------------- #
# repetition + curation rules (Gopher-style quality filters)
# --------------------------------------------------------------------- #

def repetition_ratio(text: Column | str, n: int = 3) -> Column:
    """Repeated-n-gram fraction: 1 − distinct/total word n-gram windows.

    The boilerplate/looping-text detector of quality-filter stacks
    (Gopher's "repetition" rules family): natural prose repeats few
    trigram windows, template/boilerplate and degenerate generations
    repeat many. 0 = all windows distinct. Pure HOF expression — total
    windows is arithmetic on token count, distinct comes from
    ``word_shingles`` — so it is SQL-restatable verbatim."""
    t = _c(text)
    total = F.greatest(token_count(t) - F.lit(n - 1), F.lit(1))
    distinct = F.size(word_shingles(t, n))
    return F.lit(1.0) - distinct.cast("double") / total.cast("double")


#: PII-ish scrub patterns, kept to syntax Java regex and RE2 share so the
#: DuckDB oracle applies the identical patterns. Ordered: applied in
#: sequence by redact_patterns.
SCRUB_PATTERNS: dict[str, str] = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "url": "https?://[^ ]+",
    "long_digits": "[0-9]{6,}",
}


def redact_patterns(
    text: Column | str,
    patterns: dict[str, str] | None = None,
    replacement: str = "[REDACTED]",
) -> Column:
    """Scrub every ``patterns`` match (default ``SCRUB_PATTERNS``: emails,
    URLs, long digit runs) — the PII pass of a training-data pipeline.
    One chained ``regexp_replace`` per pattern, all JVM-side."""
    out = _c(text)
    for pat in (patterns or SCRUB_PATTERNS).values():
        out = F.regexp_replace(out, pat, replacement)
    return out


def pattern_counts(
    text: Column | str, patterns: dict[str, str] | None = None
) -> list[Column]:
    """One count column per scrub pattern (aliased ``n_<name>``)."""
    t = _c(text)
    return [
        F.size(F.regexp_extract_all(t, F.lit(pat), 0)).alias(f"n_{name}")
        for name, pat in (patterns or SCRUB_PATTERNS).items()
    ]


#: Gopher-flavored curation rule set. Each rule is a named boolean
#: expression; a doc is kept when every rule passes. Thresholds are the
#: public Gopher/C4-family ballpark adapted to whitespace tokenization.
def curation_rules(text: Column | str, n_rep: int = 3) -> dict[str, Column]:
    t = _c(text)
    toks = token_count(t)
    nonspace = F.length(F.regexp_replace(t, " ", ""))
    avg_wlen = F.when(toks == 0, F.lit(0.0)).otherwise(
        nonspace.cast("double") / toks.cast("double")
    )
    return {
        "min_tokens": toks >= 50,
        "max_tokens": toks <= 100_000,
        "word_len": (avg_wlen >= 3.0) & (avg_wlen <= 10.0),
        "alpha": char_class_ratio(t, "[A-Za-z ]") >= 0.8,
        "digits": char_class_ratio(t, "[0-9]") <= 0.2,
        "repetition": repetition_ratio(t, n_rep) <= 0.05,
    }
