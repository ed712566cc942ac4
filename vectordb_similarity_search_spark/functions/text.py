"""Text-analysis column expressions for the LLM-data-pipeline surface
(north star: language-ID, quality scoring, token counting, shingling).

Everything here is a native Spark SQL expression (JVM-side, codegen-able);
nothing drops to Python. These are the building blocks for the documents
queries and the dedup operators.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WHITESPACE = r"\s+"

# Tiny marker-word lists for the heuristic language guesser. Deliberately
# small and deterministic so the oracle twin can replay them in SQL.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "de", "y", "es"],
    "fr": ["le", "la", "les", "et", "est"],
}


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization -> array<string>."""
    c = F.col(c) if isinstance(c, str) else c
    return F.split(c, WHITESPACE)


def n_tokens(c: Column | str) -> Column:
    return F.size(tokens(c))


def char_shingles(c: Column | str, n: int = 5) -> Column:
    """Distinct character n-grams of a string (the shingle set for
    Jaccard/MinHash dedup). Pure expression:
    transform(sequence(1, len-n+1), i -> substr(s, i, n))."""
    c = F.col(c) if isinstance(c, str) else c
    idx = F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substr(c, i, F.lit(n))))


def token_count_in(c: Column | str, words: list[str]) -> Column:
    """How many tokens of ``c`` appear in ``words`` (marker/stopword hits)."""
    toks = tokens(c)
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wordset, t)))


def stopword_ratio(c: Column | str, words: list[str]) -> Column:
    return token_count_in(c, words).cast("double") / n_tokens(c).cast("double")


def avg_token_len(c: Column | str) -> Column:
    """Mean token length = non-space chars / token count (integer-exact
    inputs, so the double division is bit-stable cross-engine)."""
    toks = tokens(c)
    total = F.aggregate(toks, F.lit(0), lambda acc, tk: acc + F.length(tk))
    return total.cast("double") / F.size(toks).cast("double")


def quality_bucket(c: Column | str, stop_words: list[str]) -> Column:
    """Deterministic quality heuristic over token count / token length
    (north-star 'quality scoring' op). Buckets: good / short / odd_tokens."""
    nt = n_tokens(c)
    atl = avg_token_len(c)
    return (
        F.when(nt < 20, "short")
        .when((atl < 2.0) | (atl > 10.0), "odd_tokens")
        .otherwise("good")
    )


def lang_guess(c: Column | str) -> Column:
    """Heuristic language ID from marker-word hits, deterministic tie-break
    by fixed language order (en > de > es > fr), 'unk' when nothing matches.
    Intentionally simple enough for the DuckDB oracle to replay exactly."""
    scores = {lang: token_count_in(c, words) for lang, words in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    out = F.lit("unk")
    for lang in reversed(list(scores)):  # earlier languages win ties
        out = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def word_ngrams(c: Column | str, n: int) -> Column:
    """Distinct word n-grams (space-joined) of a token-array column.

    Collapse-proof by construction: built as a ``zip_with`` chain over
    shifted slices — each intermediate array is referenced exactly once by
    its parent, so even when Catalyst inlines the whole thing into one
    expression (CollapseProject), nothing is re-evaluated per element.
    The naive ``transform(sequence(...), i -> concat(element_at(tk, i),
    ..., element_at(tk, i+n-1)))`` form re-evaluates the token array per
    gram once projections collapse — measured 14.6 s vs 0.9 s for
    5000 x 146 grams at sf0.1.

    ``zip_with`` pads the shorter array with NULLs and ``concat``
    propagates them, so the gram array is trimmed to the first
    ``size - n + 1`` entries; inputs with fewer than ``n`` tokens yield
    an empty array.
    """
    return F.array_distinct(word_ngrams_all(c, n))


def word_ngrams_all(c: Column | str, n: int) -> Column:
    """ALL word n-grams in document order, multiplicity kept — the
    LM-count sibling of :func:`word_ngrams` (which is just
    ``array_distinct`` over this, so the collapse-proof chain lives in
    ONE place). Empty-array result below ``n`` tokens."""
    c = F.col(c) if isinstance(c, str) else c
    sz = F.size(c)
    grams = c
    for k in range(2, n + 1):
        shifted = F.slice(c, k, F.greatest(sz - (k - 1), F.lit(1)))
        grams = F.zip_with(
            grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return F.when(
        sz >= n, F.slice(grams, 1, sz - (n - 1))
    ).otherwise(F.array().cast("array<string>"))
