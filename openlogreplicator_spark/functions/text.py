"""Text-analysis operators for a large-scale training-data pipeline.

Everything here is a pure column expression (JVM-side, whole-stage codegen,
no Python in the hot path) so it runs at 100 TB scan speed.  Each function
has an exact ANSI-SQL twin used as the DuckDB oracle in __spark_entry__.py,
so formulas stick to the portable subset (md5, split, length arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword lists kept tiny and hard-coded: the point is the operator shape
# (broadcast set membership over tokens), not linguistic quality.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"],
    "de": ["der", "die", "und", "das", "von", "zu", "den", "mit", "ist", "des"],
    "fr": ["le", "la", "de", "et", "les", "des", "est", "un", "une", "du"],
}


def tokens(text: Column) -> Column:
    """Lowercased word tokens; empty strings filtered (portable split)."""
    arr = F.split(F.regexp_replace(F.lower(text), r"[^a-z0-9 ]", " "), " ")
    return F.filter(arr, lambda t: t != "")


def token_count(text: Column) -> Column:
    """Whitespace/punct tokenization count — the cheap token estimator."""
    return F.size(tokens(text))


def char_count_matching(text: Column, pattern: str) -> Column:
    """Portable regexp_count: length minus length-after-removal."""
    return F.length(text) - F.length(F.regexp_replace(text, pattern, ""))


def quality_score(text: Column) -> Column:
    """Composite document-quality heuristic in [0,1]: penalize very short
    docs, high punctuation density, low alpha ratio.  Deterministic column
    arithmetic — an example of a scorer you'd tune for corpus filtering."""
    n = F.length(text).cast("double")
    non_alpha = char_count_matching(text, r"[^a-zA-Z]").cast("double")
    punct = char_count_matching(text, r"[!-/:-@\[-`{-~]").cast("double")
    alpha_ratio = (n - non_alpha) / F.greatest(n, F.lit(1.0))
    punct_ratio = punct / F.greatest(n, F.lit(1.0))
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    score = F.lit(0.4) * alpha_ratio + F.lit(0.4) * len_score + F.lit(0.2) * (
        F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))
    )
    # very short docs are never high quality regardless of ratios
    return F.round(score * F.least(n / F.lit(20.0), F.lit(1.0)), 6)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def lang_id(text: Column) -> Column:
    """N-gram-free heuristic language ID: script ranges first (CJK /
    Cyrillic / Arabic), then argmax of stopword hit counts for latin
    languages, default 'en'.  Shape matters: a single scan, no UDF."""
    cjk = char_count_matching(text, r"[一-鿿]")
    cyr = char_count_matching(text, r"[Ѐ-ӿ]")
    ara = char_count_matching(text, r"[؀-ۿ]")
    toks = tokens(text)

    def hits(lang: str) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))

    en, es, de, fr = hits("en"), hits("es"), hits("de"), hits("fr")
    best_latin = (
        F.when((es > en) & (es >= de) & (es >= fr), "es")
        .when((de > en) & (de >= fr), "de")
        .when(fr > en, "fr")
        .otherwise("en")
    )
    return (
        F.when(cjk > 0, "zh")
        .when(cyr > 0, "ru")
        .when(ara > 0, "ar")
        .otherwise(best_latin)
    )


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: md5 over the sorted distinct token
    list — stable under whitespace/punct/word-order perturbations (the
    rolling-hash analog for near-canonical dedup keys)."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(text))), " "))
