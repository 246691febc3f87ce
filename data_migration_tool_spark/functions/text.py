"""Text-analysis expression builders for the documents pipeline.

All pure Catalyst expressions (split / transform / filter / md5) so they
stay inside whole-stage codegen; each has an exact ANSI-SQL twin used in
the DuckDB oracles (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram-ish language-ID
# heuristic. Deliberately simple & deterministic: the heuristic (not a
# model) is the operator under test.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of"),
    "de": ("der", "die", "das"),
    "fr": ("le", "la", "les"),
    "es": ("el", "los", "una"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in")


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization; empty strings filtered."""
    return F.filter(F.split(_c(col), " "), lambda t: t != F.lit(""))


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col)).cast("bigint")


def word_shingles(col: str | Column, n: int = 3) -> Column:
    """n-token shingles as strings (for MinHash / Jaccard dedup).

    Built by index over the token array — pure codegen, no UDF.
    """
    toks = tokens(col)
    k = F.size(toks) - F.lit(n - 1)
    # guard: sequence(1, 0) would be DESCENDING [1,0] in Spark, not empty
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )


def stopword_ratio(col: str | Column) -> Column:
    toks = tokens(col)
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return stop.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(col: str | Column) -> Column:
    """Composite document quality in [0,1]: length band + stopword band.

    Mirrors the shape of heuristic quality filters in large-scale corpus
    pipelines; exact logic is fixed so the oracle can replicate it.
    """
    n = token_count(col)
    length_ok = (n >= F.lit(20)) & (n <= F.lit(2000))
    sw = stopword_ratio(col)
    sw_ok = (sw >= F.lit(0.01)) & (sw <= F.lit(0.6))
    return (
        F.when(length_ok & sw_ok, F.lit(1.0))
        .when(length_ok | sw_ok, F.lit(0.5))
        .otherwise(F.lit(0.0))
    )


def predicted_lang(col: str | Column) -> Column:
    """Marker-word language ID: argmax of per-language marker hits,
    ties broken by language code order, 'und' when no marker hits."""
    toks = tokens(col)

    def marker_hits(markers: tuple[str, ...]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*markers)))

    scores = [
        (lang, marker_hits(markers)) for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best = F.greatest(*[s for _, s in scores])
    expr = F.lit("und")
    # reversed so earlier language codes win ties
    for lang, s in reversed(scores):
        expr = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(col: str | Column) -> Column:
    """Document fingerprint: md5 of the normalized text (lowercased,
    whitespace collapsed). Exact-dup detection key."""
    norm = F.regexp_replace(F.trim(F.lower(_c(col))), "\\s+", " ")
    return F.md5(norm)
