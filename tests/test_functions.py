from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_migration_tool_spark.functions import (
    cosine_similarity,
    davg,
    dsum,
    ordered_string_agg,
    row_md5,
)
from data_migration_tool_spark.functions import text as TX


def test_dsum_davg_exact(spark):
    df = spark.createDataFrame([(1.10,), (2.20,), (3.30,)], "x double")
    row = df.agg(
        dsum("x").alias("s"), davg("x").alias("a")
    ).first()
    assert row["s"] == 6.6
    assert abs(row["a"] - 2.2) < 1e-12


def test_ordered_string_agg(spark):
    df = spark.createDataFrame(
        [("g", "b", 2), ("g", "a", 1), ("g", "c", 3)], "g string, v string, o int"
    )
    row = (
        df.groupBy("g").agg(ordered_string_agg("v", "o").alias("agg")).first()
    )
    assert row["agg"] == "a,b,c"


def test_row_md5_null_safety(spark):
    df = spark.createDataFrame([("a", None), (None, "a")], "x string, y string")
    hashes = [r[0] for r in df.select(row_md5(df)).collect()]
    assert hashes[0] != hashes[1]


def test_cosine_similarity(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])],
        "a array<float>, b array<float>",
    )
    vals = [r[0] for r in df.select(cosine_similarity("a", "b")).collect()]
    assert abs(vals[0]) < 1e-12
    assert math.isclose(vals[1], 1.0, rel_tol=1e-9)


def test_text_functions(spark):
    df = spark.createDataFrame([("the cat sat on the mat",)], "text string")
    row = df.select(
        TX.token_count("text").alias("n"),
        TX.word_shingles("text", 3).alias("sh"),
        TX.predicted_lang("text").alias("lang"),
        TX.fingerprint("text").alias("fp"),
    ).first()
    assert row["n"] == 6
    assert row["sh"][0] == "the cat sat"
    assert len(row["sh"]) == 4
    assert row["lang"] == "en"
    assert len(row["fp"]) == 32
