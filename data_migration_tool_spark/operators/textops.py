"""Text-analysis operators over a documents table (id, text, ...).

Thin DataFrame wrappers around the expression builders in
``functions.text`` — all JVM-side, whole-stage-codegen friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_migration_tool_spark.functions import text as TX


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    def stats_of(toks):
        return F.struct(
            F.size(toks).cast("bigint").alias("n_tokens"),
            F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct_tokens"),
            (
                F.aggregate(
                    F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
                ).cast("double")
                / F.greatest(F.size(toks), F.lit(1)).cast("double")
            ).alias("avg_token_len"),
        )

    # one bound evaluation of the token array per row; CollapseProject
    # keeps the struct alias intact (non-cheap expr referenced 3×)
    return df.select(
        F.col(id_col), TX.bind(TX.tokens(text_col), stats_of).alias("_s")
    ).select(id_col, "_s.n_tokens", "_s.n_distinct_tokens", "_s.avg_token_len")


def quality_scores(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return df.select(
        F.col(id_col),
        TX.token_count(text_col).alias("n_tokens"),
        TX.stopword_ratio(text_col).alias("stopword_ratio"),
        TX.quality_score(text_col).alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("predicted_lang", TX.predicted_lang(text_col))


def token_frequencies(
    df: DataFrame, text_col: str = "text", top_n: int = 20
) -> DataFrame:
    """Corpus token frequency (explode → groupBy → top-n). At 100 TB the
    groupBy partial-aggregates per partition before the shuffle, so the
    shuffle carries only distinct tokens per partition."""
    return (
        df.select(F.explode(TX.tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(top_n)
    )
