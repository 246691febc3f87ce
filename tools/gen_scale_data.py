"""Deterministic upsampler: sf0.1 → sfN scale-evidence data.

The driver ships parquet only up to sf0.1 (TESTDATA.md); the scale
evidence pass (SCALE.md) needs a 10× dataset to measure per-query
scaling exponents. This synthesizes it from sf0.1 itself — NO new
randomness (hash-derived transforms only), so the output is bitwise
reproducible:

* relational tables: R key-offset copies. Every key domain gets its own
  stride = max(key)+1 computed from the source, and foreign keys shift
  by the same stride as their parent, so join fan-outs per key are
  preserved exactly (a 10× dataset behaves like 10× more customers /
  orders / parts, not like 10 hot duplicates of each).
* nation/region: copied as-is (fixed-size dimensions at every TPC-H SF).
* documents: copies get their words deterministically shuffled
  (xxhash64(word, pos, doc, rep) sort key), so replica texts are NOT
  near-duplicates of the original — shingle/MinHash cluster density
  stays at sf0.1 levels instead of multiplying 10×, which would turn
  the dedup family's LSH buckets quadratically hot and fake
  super-linear exponents.
* embeddings: copies circularly rotate the vector by rep positions —
  same norm/dimension stats, but a rotation is cosine-unrelated to the
  original, so ANN/near-dup cluster multiplicity stays realistic.
* events: event_id/user_id offset, timestamps kept — the time range
  stays fixed while user volume grows, which is how a real event
  stream scales (windows get denser, not longer).

Usage: python tools/gen_scale_data.py [--reps 10] [--out .scale/sf1]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"

# table -> {column: key_domain}; FK columns share the parent's domain
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
# which table/column defines each domain's stride
DOMAIN_SOURCE = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}


def _shuffle_words(text: F.Column, doc_id: F.Column, rep: int) -> F.Column:
    """Deterministic per-(doc, rep) word shuffle: sort words by
    xxhash64(word, position, doc_id, rep). Keeps length/vocabulary
    stats, destroys shingle overlap with the original."""
    words = F.split(text, r"\s+")
    keyed = F.transform(
        words,
        lambda w, i: F.struct(
            F.xxhash64(w, i, doc_id, F.lit(rep)).alias("k"), w.alias("w")
        ),
    )
    return F.concat_ws(" ", F.transform(F.array_sort(keyed), lambda s: s.w))


def _rotate_vec(vec: F.Column, rep: int, dim: int, key: F.Column) -> F.Column:
    """Circular rotation by rep positions + a sign-flip mask keyed by
    the row's (already offset, globally unique) vec_id (rep 0 =
    identity, untouched originals). The mask matters for CHAINED
    upsampling (sf1 → sf10): pure rotations compose additively, so rep
    chains with equal sums (0∘r = r∘0, 1+2 = 2+1) mint EXACT duplicate
    vectors — measured 18k/200k before the mask — faking a
    mass-duplication regime the near-dup exponents would then measure
    instead of the algorithm. Keying the mask by the unique vec_id
    makes every rep>0 copy's transform distinct across any chain;
    norms and pairwise-unrelatedness are preserved (sign flips are
    orthogonal)."""
    shift = rep % dim
    if shift == 0:
        return vec
    rot = F.concat(F.slice(vec, shift + 1, dim - shift), F.slice(vec, 1, shift))
    return F.transform(
        rot,
        lambda x, i: F.when(
            F.pmod(F.xxhash64(key, i), F.lit(2)) == 1, -x
        ).otherwise(x),
    )


def upsample(
    spark: SparkSession,
    out_dir: str,
    reps: int,
    src_dir: str = SRC,
    tables: list[str] | None = None,
) -> None:
    """``src_dir`` may be a previous upsample output (e.g. .scale/sf1 →
    .scale/sf10): strides derive from max(key)+1 of whatever source is
    given, so chained upsampling composes. ``tables`` restricts the
    pass to the named KEYED tables (second-decade scale checks need
    only the tables their queries read — a full 100× build of every
    table is wasted disk)."""
    os.makedirs(out_dir, exist_ok=True)
    strides: dict[str, int] = {}
    cache: dict[str, DataFrame] = {}
    wanted = set(tables) if tables else set(KEYED)
    domains = {
        dom
        for tbl in wanted
        for dom in KEYED[tbl].values()
    }
    for dom, (tbl, col) in DOMAIN_SOURCE.items():
        if dom not in domains:
            continue
        if tbl not in cache and not os.path.exists(f"{src_dir}/{tbl}.parquet"):
            # Subset runs (--tables) may omit a domain's defining table
            # (e.g. lineitem without supplier): derive the stride from a
            # present table's FK column instead. One stride per domain,
            # computed once, so every wanted table sharing the domain
            # still shifts consistently.
            tbl, col = next(
                (t, c)
                for t in wanted
                for c, d in KEYED[t].items()
                if d == dom and os.path.exists(f"{src_dir}/{t}.parquet")
            )
        if tbl not in cache:
            cache[tbl] = spark.read.parquet(f"{src_dir}/{tbl}.parquet")
        strides[dom] = cache[tbl].agg(F.max(col)).first()[0] + 1

    if tables is None:
        for tbl in ("region", "nation"):
            spark.read.parquet(
                f"{src_dir}/{tbl}.parquet"
            ).write.mode("overwrite").parquet(f"{out_dir}/{tbl}.parquet")

    emb_dim = (
        len(spark.read.parquet(f"{src_dir}/embeddings.parquet").first()["embedding"])
        if "embeddings" in wanted
        else 0
    )

    for tbl, keycols in KEYED.items():
        if tbl not in wanted:
            continue
        src = cache.get(tbl) or spark.read.parquet(f"{src_dir}/{tbl}.parquet")
        parts = []
        for rep in range(reps):
            df = src
            for col, dom in keycols.items():
                df = df.withColumn(
                    col, (F.col(col) + F.lit(rep * strides[dom])).cast("long")
                )
            if tbl == "documents" and rep > 0:
                df = df.withColumn(
                    "text", _shuffle_words(F.col("text"), F.col("doc_id"), rep)
                ).withColumn("n_chars", F.length("text"))
            if tbl == "part" and rep > 0:
                # Grow the NAME dictionary with the table (r12): exact
                # name copies collapse under the fuzzy-match plan's
                # distinct(), making any scale measurement vacuous —
                # and 10 hot copies of each name is the mass-duplicate
                # regime, not growth. Suffixing the FIRST token with
                # the rep index mints new names (dictionary ∝ reps)
                # that are 1-2 edits from their parents (realistic
                # fuzz), keeps the second token — the match-blocking
                # key — stable, and preserves '%color%' substring
                # selectivity for the TPC-H LIKE filters.
                df = df.withColumn(
                    "p_name",
                    F.concat(
                        F.split("p_name", " ")[0],
                        F.lit(str(rep)),
                        F.expr(
                            "substring(p_name, length(split(p_name, ' ')[0])"
                            " + 1)"
                        ),
                    ),
                )
            if tbl == "embeddings" and rep > 0:
                df = df.withColumn(
                    "embedding",
                    _rotate_vec(F.col("embedding"), rep, emb_dim, F.col("vec_id")),
                )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{tbl}.parquet")
        print(f"{tbl}: {src.count()} -> {out.count()} rows", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", default=".scale/sf1")
    ap.add_argument("--src", default=SRC)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated KEYED table subset (default: all + dims)",
    )
    args = ap.parse_args()
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    upsample(
        spark,
        args.out,
        args.reps,
        src_dir=args.src,
        tables=args.tables.split(",") if args.tables else None,
    )
