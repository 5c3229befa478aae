"""Text-analysis column builders (beyond-reference north-star ops).

Pure ``pyspark.sql.functions`` column expressions — JVM-side, codegen'd, no
Python UDFs anywhere in the hot path. Each has an exactly-equivalent ANSI
SQL form used by the DuckDB oracles in ``queries/text.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# language marker words for the n-gram/stopword language-ID heuristic.
# Priority (ties resolve to the earlier entry): en > de > es > fr > zh.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["de", "le", "shi", "zai", "he"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokenize(col: str | Column, sep: str = " ") -> Column:
    """Whitespace tokenization: ``split(trim(text), ' ')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), sep)


def shingles(tokens: Column, k: int = 3) -> Column:
    """Token k-grams; a doc shorter than k tokens contributes its whole
    token string as the single shingle (so no doc has zero shingles)."""
    joined = F.array_join(tokens, " ")
    make = F.transform(
        F.sequence(F.lit(0), F.size(tokens) - k),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j + 1) for j in range(k)]
        ),
    )
    return F.when(F.size(tokens) >= k, make).otherwise(F.array(joined))


def language_scores(tokens: Column) -> dict[str, Column]:
    """Marker-word hit count per language."""
    return {
        lang: F.size(F.filter(tokens, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def predicted_language(tokens: Column) -> Column:
    """Deterministic argmax over language scores (ties → priority order)."""
    scores = language_scores(tokens)
    langs = list(LANG_MARKERS)
    # CASE chain in priority order: the first language whose score is >=
    # every other's wins, so ties resolve to the earlier (higher-priority)
    # entry — same shape as the SQL oracle's CASE.
    out = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            term = scores[lang] >= scores[other]
            cond = term if cond is None else (cond & term)
        out = F.when(cond, F.lit(lang)) if out is None else out.when(cond, F.lit(lang))
    return out.otherwise(F.lit(langs[0]))
