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


def bind(expr: Column, fn) -> Column:
    """Evaluate ``expr`` once per row and pass it to ``fn`` as a bound
    lambda variable.

    Catalyst re-evaluates a named subexpression that appears inside a
    higher-order-function lambda once PER ELEMENT (lambda bodies are
    interpreted outside whole-stage codegen, with no common-subexpression
    elimination). Wrapping the value in a 1-element array and
    ``transform``-ing it rebinds it as a NamedLambdaVariable, which IS
    evaluated exactly once — turning e.g. shingling from O(tokens²) per
    row back into O(tokens). Works for any data type, including structs.
    """
    return F.element_at(F.transform(F.array(expr), fn), 1)


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization; empty strings filtered."""
    return F.filter(F.split(_c(col), " "), lambda t: t != F.lit(""))


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col)).cast("bigint")


def word_shingles(col: str | Column, n: int = 3) -> Column:
    """n-token shingles as strings (for MinHash / Jaccard dedup).

    Built by index over the token array — pure Catalyst, no UDF. The
    token array is bound once per row (see ``bind``); referencing
    ``tokens(col)`` directly inside the transform lambda would re-split
    the text for every element_at — O(tokens²) per row.
    """

    def shingles_of(toks: Column) -> Column:
        k = F.size(toks) - F.lit(n - 1)
        # guard: sequence(1, 0) would be DESCENDING [1,0] in Spark, not empty
        idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
        )

    return bind(tokens(col), shingles_of)


def _stopword_ratio_of(toks: Column) -> Column:
    stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return stop.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def stopword_ratio(col: str | Column) -> Column:
    return bind(tokens(col), _stopword_ratio_of)


def quality_score(col: str | Column) -> Column:
    """Composite document quality in [0,1]: length band + stopword band.

    Mirrors the shape of heuristic quality filters in large-scale corpus
    pipelines; exact logic is fixed so the oracle can replicate it.
    """

    def score_of(toks: Column) -> Column:
        measures = F.struct(
            F.size(toks).cast("bigint").alias("n"),
            _stopword_ratio_of(toks).alias("sw"),
        )

        def band(m: Column) -> Column:
            n, sw = m["n"], m["sw"]
            length_ok = (n >= F.lit(20)) & (n <= F.lit(2000))
            sw_ok = (sw >= F.lit(0.01)) & (sw <= F.lit(0.6))
            return (
                F.when(length_ok & sw_ok, F.lit(1.0))
                .when(length_ok | sw_ok, F.lit(0.5))
                .otherwise(F.lit(0.0))
            )

        return bind(measures, band)

    return bind(tokens(col), score_of)


def predicted_lang(col: str | Column) -> Column:
    """Marker-word language ID: argmax of per-language marker hits,
    ties broken by language code order, 'und' when no marker hits."""
    langs = sorted(LANG_MARKERS)

    def lang_of(toks: Column) -> Column:
        scores = F.array(
            *[
                F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang])))
                for lang in langs
            ]
        )

        def argmax(sc: Column) -> Column:
            best = F.array_max(sc)
            expr = F.lit("und")
            # reversed so earlier language codes win ties
            for i in reversed(range(len(langs))):
                s = F.element_at(sc, i + 1)
                expr = F.when((s == best) & (best > 0), F.lit(langs[i])).otherwise(expr)
            return expr

        return bind(scores, argmax)

    return bind(tokens(col), lang_of)


def fingerprint(col: str | Column) -> Column:
    """Document fingerprint: md5 of the normalized text (lowercased,
    whitespace collapsed). Exact-dup detection key."""
    norm = F.regexp_replace(F.trim(F.lower(_c(col))), "\\s+", " ")
    return F.md5(norm)


# BPE-style pre-tokenizer pattern (simplified GPT-2 shape): letter runs,
# digit runs, single punctuation marks. Counting its matches approximates
# subword token counts far better than whitespace splitting on
# punctuation-heavy or concatenated text. Plain character classes only,
# so Java regex (Spark) and RE2 (DuckDB) agree exactly.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def bpe_token_count(col: str | Column) -> Column:
    """Count of BPE-ish pre-tokens (``BPE_PATTERN`` matches)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_PATTERN), F.lit(0))).cast(
        "bigint"
    )


# Winnowing constants (Schleimer et al., SIGMOD'03 "local algorithms
# for document fingerprinting"): k-char grams, polynomial hash base B
# mod the Mersenne prime M, sliding windows of w hashes.
WINNOW_K = 5
WINNOW_W = 4
WINNOW_B = 257
WINNOW_M = 2147483647
_POWS = [WINNOW_B**p for p in range(WINNOW_K - 1, -1, -1)]


def char_kgram_hashes(col: str | Column) -> Column:
    """Polynomial (Rabin-Karp family) hash of every ``WINNOW_K``-char
    gram: ``sum(codepoint(c_j) * B^(k-1-j)) mod M``. Integer-exact and
    order-identical in any engine — the oracle reproduces it with
    ``ascii``/``substr`` arithmetic. max term 0x10FFFF * 257^4 < 2^63,
    so the sum never overflows bigint."""
    s = _c(col)

    def hashes_of(st: Column) -> Column:
        n = F.length(st) - F.lit(WINNOW_K - 1)
        idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
            F.array().cast("array<int>")
        )
        return F.transform(
            idx,
            lambda i: sum(
                F.ascii(F.substr(st, i + j, F.lit(1))).cast("bigint") * F.lit(p)
                for j, p in enumerate(_POWS)
            )
            % F.lit(WINNOW_M),
        )

    return bind(s, hashes_of)


def winnow_fingerprints(col: str | Column) -> Column:
    """Winnowing fingerprint set: the distinct minima of every
    ``WINNOW_W``-wide window over the k-gram hash stream. Guarantees at
    least one shared fingerprint for any match of length ≥ w + k - 1 —
    the content-overlap detection primitive (MOSS). Pure scan-side
    array expression; no shuffle, no UDF."""

    def select_of(h: Column) -> Column:
        n = F.size(h) - F.lit(WINNOW_W - 1)
        idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
            F.array().cast("array<int>")
        )
        sel = F.transform(
            idx,
            lambda j: F.least(
                *[F.element_at(h, j + w) for w in range(WINNOW_W)]
            ),
        )
        return F.array_distinct(sel)

    return bind(char_kgram_hashes(col), select_of)


# ---------------------------------------------------------------------------
# PII scrubbing (training-data redaction pass)
# ---------------------------------------------------------------------------

# Engine-portable patterns: no lookaround, no backreferences — the
# subset where Java regex (Spark) and RE2 (DuckDB oracle) agree on
# every match boundary.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"


def pii_counts(col: str | Column) -> Column:
    """struct(n_emails, n_phones) found in the text — counted BEFORE
    redaction so the counts audit what ``scrub_pii`` removed."""
    c = _c(col)
    return F.struct(
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_phones"),
    )


def scrub_pii(col: str | Column) -> Column:
    """Redact emails then phone numbers to fixed placeholder tokens.

    Order matters and is part of the contract: emails are replaced
    first so their digit-bearing local parts can never be half-matched
    by the phone pattern. Pure ``regexp_replace`` chain — scan-side,
    whole-stage-codegen, zero shuffles at any corpus size.
    """
    c = _c(col)
    no_email = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_email, PHONE_RE, "<PHONE>")
