"""Text-analysis kernels for large-scale training-data pipelines.

These extend the crawl engine with the document-level operations a 100 TB
web-text pipeline needs (language ID, quality scoring, token counting,
fingerprinting). Everything here is pure JVM-side ``pyspark.sql.functions``
— whole-stage-codegen-friendly, no Python in the hot path — and each has an
exact ANSI/DuckDB SQL twin in ``__spark_entry__.oracle_sql`` so the driver
verifies it against an independent engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: tiny pinned English stopword list — shared verbatim with the SQL oracles
EN_STOPWORDS = [
    "the", "and", "of", "to", "a", "in", "is", "it", "for", "on",
    "with", "as", "at", "by", "this", "that", "are", "was", "be", "or",
]

#: BPE-ish tokenizer regex: letter runs, digit runs, single punctuation
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def words(text: Column) -> Column:
    """Whitespace tokens of lowercased text (empty strings removed)."""
    return F.filter(
        F.split(F.lower(text), " "), lambda w: F.length(w) > 0
    )


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


def token_count_bpe(text: Column) -> Column:
    """BPE-ish subword-boundary token count via TOKEN_REGEX."""
    return F.regexp_count(text, F.lit(TOKEN_REGEX))


def distinct_stopword_hits(text: Column) -> Column:
    """How many distinct pinned stopwords appear in the text."""
    stops = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    return F.size(F.array_intersect(F.array_distinct(words(text)), stops))


def lang_id(text: Column, min_hits: int = 3) -> Column:
    """n-gram-free heuristic language ID: 'en' when ≥ min_hits distinct
    English stopwords occur, else 'unknown'. (A real pipeline swaps in a
    fastText-style model via a pandas UDF; the gate/plumbing is identical.)"""
    return F.when(
        distinct_stopword_hits(text) >= min_hits, F.lit("en")
    ).otherwise(F.lit("unknown"))


def quality_features(text: Column) -> dict[str, Column]:
    """Cheap quality signals (Gopher/C4-style rules, public recipes):
    char length, whitespace-token count, mean word length, stopword hits,
    punctuation count, digit ratio."""
    n_chars = F.length(text)
    n_tokens = token_count_ws(text)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_word_len": F.round(
            (n_chars - n_tokens + 1) / F.greatest(n_tokens, F.lit(1)), 4
        ),
        "stopword_hits": distinct_stopword_hits(text),
        "punct_count": F.regexp_count(text, F.lit(r"[\.,;:!\?]")),
        "digit_ratio": F.round(
            F.regexp_count(text, F.lit("[0-9]"))
            / F.greatest(n_chars, F.lit(1)),
            4,
        ),
    }


def quality_score(text: Column) -> Column:
    """Composite 0-1 quality score from the features (fixed weights,
    rounded for cross-engine comparability)."""
    f = quality_features(text)
    len_ok = F.when((f["n_tokens"] >= 10) & (f["n_tokens"] <= 100000), 1.0).otherwise(0.0)
    word_ok = F.when((f["mean_word_len"] >= 2.0) & (f["mean_word_len"] <= 12.0), 1.0).otherwise(0.0)
    stop_ok = F.when(f["stopword_hits"] >= 2, 1.0).otherwise(0.0)
    digit_ok = F.when(f["digit_ratio"] <= 0.3, 1.0).otherwise(0.0)
    return F.round(
        0.3 * len_ok + 0.2 * word_ok + 0.3 * stop_ok + 0.2 * digit_ok, 4
    )


def fingerprint_md5(text: Column) -> Column:
    """Document fingerprint: md5 over the normalized (lowercased,
    whitespace-collapsed) token stream — the exact-dedup key."""
    return F.md5(F.concat_ws(" ", words(text)))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (distinct), built with JVM higher-order
    functions — the input to Jaccard/MinHash."""
    w = words(text)
    idx = F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", F.slice(w, i + 1, n)
            ),
        )
    )
