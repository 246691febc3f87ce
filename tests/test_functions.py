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


def test_bpe_token_count(spark):
    from data_migration_tool_spark.functions.text import bpe_token_count, token_count

    df = spark.createDataFrame(
        [(1, "don't panic, it's fine!"), (2, "abc123 x")],
        "id long, text string",
    )
    got = {
        r["id"]: (r["ws"], r["bpe"])
        for r in df.select(
            "id",
            token_count("text").alias("ws"),
            bpe_token_count("text").alias("bpe"),
        ).collect()
    }
    # don ' t panic , it ' s fine !  → 10 BPE-ish tokens vs 4 ws tokens
    assert got[1] == (4, 10)
    # abc 123 x → letter run, digit run, letter run
    assert got[2] == (2, 3)


def test_winnow_shared_fingerprint_property(spark):
    from data_migration_tool_spark.functions.text import winnow_fingerprints

    # two docs sharing a 20-char substring (≥ w + k - 1 = 8) MUST share
    # at least one fingerprint; a disjoint-alphabet doc must share none
    common = "zzqqxxvvnnzzqqxxvvnn"
    df = spark.createDataFrame(
        [
            (1, "aaa " + common + " bbb"),
            (2, "ccc " + common + " ddd"),
            (3, "1234567890123456789012345"),
        ],
        "id long, text string",
    )
    fps = {
        r["id"]: set(r["fp"])
        for r in df.select(
            "id", winnow_fingerprints("text").alias("fp")
        ).collect()
    }
    assert fps[1] & fps[2]
    assert not (fps[1] & fps[3])
