"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has none). Each property is an invariant
the engine's cross-engine exactness claims rest on:

- exact-decimal aggregation is partitioning-invariant (bit-equal under
  any parallelism),
- row hashing distinguishes NULL placement and value boundaries,
- ordered string aggregation equals the sequential model,
- the batch maker partitions losslessly.

Examples are kept small (Spark job per example); the point is the
random structure, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_migration_tool_spark.functions.hashing import row_md5
from data_migration_tool_spark.functions.scalars import dsum, ordered_string_agg
from data_migration_tool_spark.orchestrate.batching import run_batches

MONEY = st.decimals(
    min_value=-10**9, max_value=10**9, places=2, allow_nan=False, allow_infinity=False
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(st.lists(MONEY, min_size=1, max_size=200), st.integers(1, 7))
def test_dsum_partitioning_invariant(spark, values, nparts):
    df = spark.createDataFrame([(float(v),) for v in values], "x double")
    a = df.coalesce(1).agg(dsum("x").alias("s")).first().s
    b = df.repartition(nparts).agg(dsum("x").alias("s")).first().s
    assert a == b  # bit-equal, not approx — decimal accumulation is exact


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.one_of(st.none(), st.text(max_size=5)),
                  st.one_of(st.none(), st.text(max_size=5))),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_row_md5_injective_on_distinct_rows(spark, rows):
    df = spark.createDataFrame(rows, "a string, b string")
    out = df.select(row_md5(df).alias("h")).collect()
    assert len({r.h for r in out}) == len(set(rows))


def test_row_md5_null_vs_empty_vs_sentinel_like(spark):
    # the classic concat_ws collisions must NOT collide here
    rows = [(None, "x"), ("x", None), ("", "x"), ("x", ""), (None, None), ("", "")]
    df = spark.createDataFrame(rows, "a string, b string")
    hashes = [r.h for r in df.select(row_md5(df).alias("h")).collect()]
    assert len(set(hashes)) == len(rows)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 1000), st.text(min_size=1, max_size=6)),
        min_size=1,
        max_size=50,
        unique_by=lambda t: t[0],
    )
)
def test_ordered_string_agg_matches_sequential_model(spark, pairs):
    df = spark.createDataFrame(pairs, "ord int, val string")
    got = df.agg(ordered_string_agg("val", "ord").alias("s")).first().s
    expected = ",".join(v for _, v in sorted(pairs))
    assert got == expected


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(), max_size=100), st.integers(1, 17))
def test_run_batches_lossless_partition(items, batch_size):
    batches = list(run_batches(items, batch_size))
    flat = [x for _, chunk in batches for x in chunk]
    assert flat == items
    assert all(len(chunk) <= batch_size for _, chunk in batches)
    assert all(len(chunk) == batch_size for _, chunk in batches[:-1])


@settings(max_examples=20, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=40,
    )
)
def test_cc_algorithms_agree(spark, edges):
    from data_migration_tool_spark.operators.dedup import (
        dup_clusters,
        dup_clusters_two_star,
    )

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    a = sorted(map(tuple, dup_clusters(df).collect()))
    b = sorted(map(tuple, dup_clusters_two_star(df).collect()))
    assert a == b


@settings(max_examples=20, deadline=None)
@given(
    vec=st.lists(
        st.floats(-100, 100, allow_nan=False, allow_infinity=False, width=32),
        min_size=2,
        max_size=16,
    )
)
def test_int8_quantize_bounds(spark, vec):
    from data_migration_tool_spark.functions.vectors import int8_quantize_stats
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, vec)], "vec_id long, embedding array<double>")
    q = df.select(int8_quantize_stats("embedding").alias("q")).first()["q"]
    assert q["n_dims"] == len(vec)
    assert 0 <= q["q_min"] <= q["q_max"] <= 255
    assert q["q_min"] * len(vec) <= q["q_sum"] <= q["q_max"] * len(vec)


@settings(max_examples=15, deadline=None)
@given(
    lts=st.lists(st.integers(0, 50), min_size=1, max_size=8),
    rts=st.lists(st.integers(0, 50), min_size=1, max_size=8),
    direction=st.sampled_from(["backward", "forward"]),
    tol=st.one_of(st.none(), st.integers(1, 20)),
)
def test_asof_join_matches_pandas_merge_asof(spark, lts, rts, direction, tol):
    """pandas.merge_asof is an independent third implementation of the
    as-of semantics (besides this repo's and DuckDB's)."""
    import pandas as pd

    rts = sorted(set(rts))  # merge_asof requires sorted, unique right keys here
    left = spark.createDataFrame(
        [(1, i, float(t)) for i, t in enumerate(lts)], "k long, lid long, ts double"
    )
    right = spark.createDataFrame(
        [(1, 100 + i, float(t)) for i, t in enumerate(rts)], "k long, rid long, ts double"
    )
    got = {
        r["lid"]: r["rid"]
        for r in __import__("data_migration_tool_spark.operators.asof", fromlist=["asof_join"]).asof_join(
            left, right, on=["k"], left_ts="ts", right_ts="ts",
            right_values=["rid"], direction=direction,
            tolerance_seconds=float(tol) if tol is not None else None,
        ).collect()
    }
    lp = pd.DataFrame({"k": 1, "lid": range(len(lts)), "ts": [float(t) for t in lts]}).sort_values("ts", kind="stable")
    rp = pd.DataFrame({"k": 1, "rid": [100 + i for i in range(len(rts))], "ts": [float(t) for t in rts]}).sort_values("ts", kind="stable")
    exp_df = pd.merge_asof(
        lp, rp, on="ts", by="k", direction=direction,
        tolerance=float(tol) if tol is not None else None,
    )
    exp = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in exp_df.itertuples()
    }
    assert got == exp


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        min_size=1,
        max_size=40,
    )
)
def test_bpe_train_matches_reference_on_random_corpora(spark, words):
    """Distributed BPE == pure-Python Sennrich reference on arbitrary
    small corpora (merge sequence AND frequencies), including pathological
    repeats like 'aaaa' where greedy left-to-right application matters."""
    from collections import Counter

    from data_migration_tool_spark.operators.bpe import bpe_train

    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id BIGINT, text STRING"
    )
    got = [tuple(r) for r in bpe_train(docs, num_merges=4).collect()]

    freq = Counter(words)
    syms = {w: list(w) for w in freq}
    expect = []
    for rank in range(1, 5):
        pc = Counter()
        for w, c in freq.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            break
        (a, b), f = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rank, a, b, f))
        for w in syms:
            out = []
            for tok in syms[w]:
                if out and out[-1] == a and tok == b:
                    out[-1] = a + b
                else:
                    out.append(tok)
            syms[w] = out
    assert got == expect


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(alphabet="abcx ", min_size=0, max_size=400), min_size=1, max_size=8
    ),
    size=st.integers(min_value=1, max_value=50),
    overlap=st.integers(min_value=0, max_value=30),
)
def test_chunk_overlap_reconstruction_property(spark, texts, size, overlap):
    """Every chunk equals the corresponding python slice; strides cover
    the full text (no tail dropped) for any size/stride combination."""
    from data_migration_tool_spark.operators.textops import chunk_with_overlap

    stride = max(1, size - min(overlap, size - 1))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        (r.doc_id, r.chunk_start): (r.chunk_len, r.chunk_md5)
        for r in chunk_with_overlap(df, size=size, stride=stride).collect()
    }
    import hashlib

    want = {}
    for i, t in enumerate(texts):
        if not t:
            continue
        for start in range(0, len(t), stride):
            piece = t[start : start + size]
            want[(i, start)] = (
                len(piece),
                hashlib.md5(piece.encode()).hexdigest(),
            )
    assert got == want


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    groups=st.lists(
        st.tuples(st.sampled_from("abcd"), st.integers(0, 10_000)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[1],
    ),
    cap=st.integers(min_value=1, max_value=10),
)
def test_cap_per_group_invariants(spark, groups, cap):
    """Output size per group = min(n, cap); kept ids are a subset; and
    membership equals the md5-rank model computed in python."""
    import hashlib

    from data_migration_tool_spark.operators.textops import cap_per_group

    df = spark.createDataFrame(groups, "source string, doc_id long")
    kept = [
        (r.source, r.doc_id)
        for r in cap_per_group(df, "source", "doc_id", cap=cap).collect()
    ]
    by_group: dict[str, list[int]] = {}
    for g, i in groups:
        by_group.setdefault(g, []).append(i)
    want = set()
    for g, ids in by_group.items():
        ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        want.update((g, i) for i in ranked[:cap])
    assert set(kept) == want and len(kept) == len(want)


@given(
    st.sampled_from(["day", "hour", "minute", "month", "year", "'day'", "'hour'"]),
    st.integers(-500, 500),
    st.datetimes(
        min_value=__import__("datetime").datetime(2000, 1, 1),
        max_value=__import__("datetime").datetime(2030, 1, 1),
    ).map(lambda d: d.replace(microsecond=0)),
    st.datetimes(
        min_value=__import__("datetime").datetime(2000, 1, 1),
        max_value=__import__("datetime").datetime(2030, 1, 1),
    ).map(lambda d: d.replace(microsecond=0)),
)
@settings(max_examples=25, deadline=None)
def test_redshift_datediff_matches_duckdb_boundary_semantics(
    part, n, t1, t2
):
    """The DATEDIFF rewrite must reproduce Redshift/DuckDB
    boundary-crossing counts (date_diff in DuckDB counts boundaries,
    like Redshift) — checked by running the REWRITTEN SQL through
    DuckDB against DuckDB's own native date_diff."""
    import duckdb

    from data_migration_tool_spark.translate.dml import rewrite_rs_functions

    bare = part.strip("'")
    src = (
        f"SELECT DATEDIFF({part}, TIMESTAMP '{t1}', TIMESTAMP '{t2}') AS d"
    )
    out, warnings = rewrite_rs_functions(src)
    assert "DATEDIFF" not in out.upper() and not warnings
    # DuckDB has no TIMESTAMPDIFF; its date_diff counts boundaries
    # (like Redshift), so map the Spark spelling textually and run the
    # whole rewritten expression through DuckDB
    import re as _re

    ducked = _re.sub(
        r"TIMESTAMPDIFF\((\w+),",
        lambda m: f"date_diff('{m.group(1)}',",
        out,
    )
    got = duckdb.sql(ducked).fetchone()[0]
    want = duckdb.sql(
        f"SELECT date_diff('{bare}', TIMESTAMP '{t1}', TIMESTAMP '{t2}') AS d"
    ).fetchone()[0]
    assert got == want


@given(
    st.sampled_from(["teradata", "oracle", "redshift", "hive"]),
    st.sampled_from(
        [
            "NVL(a, 0)",
            "DATEADD(day, 1, ts)",
            "INDEX(s, 'x')",
            "DECODE(x, 1, 'a')",
            "GETDATE()",
            "SYSDATE",
            "NULLIFZERO(v)",
            "LEN(s)",
            "it''s TOP 5",
        ]
    ),
    st.text(
        alphabet=st.characters(
            whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=127
        ),
        max_size=8,
    ),
)
@settings(max_examples=60, deadline=None)
def test_dialect_rewrites_never_touch_string_literals(dialect, phrase, pad):
    """Whatever a literal contains — function spellings, keywords,
    escaped quotes — every dialect's rewrite chain must emit it
    verbatim. A corrupted literal silently corrupts DATA in translated
    DML (the r4 ADVICE finding, generalized)."""
    from data_migration_tool_spark.translate.dml import translate_statement

    lit = f"{pad} {phrase} {pad}".strip()
    sql = f"SELECT col1 FROM t WHERE note = '{lit}'"
    out = translate_statement(sql, dialect=dialect).sql
    assert f"'{lit}'" in out, (dialect, lit, out)


@given(
    st.lists(
        st.tuples(
            st.dates(
                min_value=__import__("datetime").date(2000, 1, 1),
                max_value=__import__("datetime").date(2030, 1, 1),
            ),
            st.dates(
                min_value=__import__("datetime").date(2000, 1, 1),
                max_value=__import__("datetime").date(2030, 1, 1),
            ),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_redshift_week_datediff_matches_sunday_reference(spark, pairs):
    """DATEDIFF(week, a, b) rewrite vs a pure-Python Sunday-week
    reference: Redshift counts Sunday–Saturday week boundaries crossed,
    i.e. (sunday_of(b) - sunday_of(a)) / 7 with Python's weekday()
    (Mon=0 … Sun=6). Every example's pair list is evaluated in ONE
    Spark job through the actually-rewritten SQL."""
    import datetime as dt

    from data_migration_tool_spark.translate.dml import translate_statement

    ts = translate_statement(
        "SELECT DATEDIFF(week, a, b) AS w FROM wk_pairs", dialect="redshift"
    )
    assert "DAYOFWEEK" in ts.sql

    def sunday(d: dt.date) -> dt.date:
        return d - dt.timedelta(days=(d.weekday() + 1) % 7)

    want = [(sunday(b) - sunday(a)).days // 7 for a, b in pairs]
    spark.createDataFrame(
        [(a.isoformat(), b.isoformat()) for a, b in pairs], "a string, b string"
    ).createOrReplaceTempView("wk_pairs")
    got = [r.w for r in spark.sql(ts.sql).collect()]
    assert got == want


@settings(**_SETTINGS | {"max_examples": 6})
@given(st.data())
def test_transfer_log_mining_matches_dict_replay(spark, data):
    """mine_job_stats equals the reference's per-table dict mutation on
    RANDOM logs (teradata_transfer_run_log_dag.py:281-360 replays one
    dict per table in log order): random job-record and error-Job
    events per table, randomly interleaved across tables, with job ids
    drawn from a pool that sorts differently by string order than by
    arrival order — so any regression from last-writer-wins back to a
    MAX/MIN aggregation fails here on structure, independent of the
    fixture. The pure-Python replay below IS the reference semantics."""
    from data_migration_tool_spark.orchestrate.transfer_logs import mine_job_stats

    jid_pool = ["j1", "j10", "j2", "jx0"]  # string order != any arrival order
    n_tables = data.draw(st.integers(1, 4), label="n_tables")
    events = []  # (table, kind, payload)
    for t in range(n_tables):
        table = f"tbl{t}"
        evs = data.draw(
            st.lists(
                st.one_of(
                    st.tuples(
                        st.just("records"),
                        st.sampled_from(jid_pool),
                        st.integers(0, 99999),
                        st.integers(0, 9),
                    ),
                    st.tuples(
                        st.just("err_job"),
                        st.sampled_from(jid_pool),
                        st.sampled_from(["quota exceeded", "Skipping source"]),
                    ),
                ),
                min_size=1,
                max_size=4,
            ),
            label=f"events_{table}",
        )
        events.extend((table, *e) for e in evs)
    order = data.draw(st.permutations(range(len(events))), label="order")

    rows = []
    for line_no, idx in enumerate(order):
        ev = events[idx]
        if ev[1] == "records":
            table, _, jid, succ, errs = ev
            rows.append(
                (
                    line_no,
                    "INFO",
                    f"Job {jid} (table {table}) completed. "
                    f"Number of records: {succ}, errors: {errs}.",
                )
            )
        else:
            table, _, jid, why = ev
            rows.append(
                (
                    line_no,
                    "ERROR",
                    f"Job {jid} (table {table}) failed with {why}.",
                )
            )

    # the reference replay: one dict per table, mutated in log order
    expect: dict[str, dict] = {}
    for line_no, idx in [(ln, i) for ln, i in enumerate(order)]:
        ev = events[idx]
        table = ev[0]
        d = expect.setdefault(
            table,
            {
                "first_sev": "ERROR" if ev[1] == "err_job" else "INFO",
                "bq_job_id": None,
                "agent_id": None,
                "success_records": None,
                "error_records": None,
                "errs": [],
            },
        )
        if ev[1] == "records":
            _, _, jid, succ, errs = ev
            d["bq_job_id"], d["success_records"], d["error_records"] = jid, succ, errs
        else:
            _, _, jid, why = ev
            d["agent_id"] = jid  # teradata err-Job writes the job id here
            d["errs"].append(f"Job {jid} (table {table}) failed with {why}.")

    logs = spark.createDataFrame(
        rows, "line_no long, severity string, message_text string"
    )
    got = {
        r.src_table_name: r
        for r in mine_job_stats(logs, "u", "c", "r").collect()
    }
    assert set(got) == set(expect)
    for table, d in expect.items():
        r = got[table]
        msg = " ".join(d["errs"])
        assert r.bq_job_id == d["bq_job_id"], (table, r.bq_job_id, d["bq_job_id"])
        assert r.agent_id == d["agent_id"]
        assert r.success_records == d["success_records"]
        assert r.error_records == d["error_records"]
        assert r.message == msg
        assert r.job_status == (
            "FAILED" if d["first_sev"] == "ERROR" else "SUCCEEDED"
        )
        assert r.transfer_run_state == (
            "SUCCEEDED" if msg == "" else ("SKIPPED" if "Skipping" in msg else "FAILED")
        )


@settings(**_SETTINGS | {"max_examples": 6})
@given(st.data())
def test_redshift_log_mining_matches_dict_replay(spark, data):
    """Same dict-replay property for the redshift dialect
    (redshift_transfer_run_log_dag.py:250-330), whose attribution
    differs in the one way that makes ordering HARDER: error-Job lines
    write bq_job_id (not agent_id), so records and err_job lines are
    competing writers of the SAME field and the mined value depends on
    cross-class line order — unpinnable by any per-class aggregate."""
    from data_migration_tool_spark.orchestrate.transfer_logs import mine_job_stats

    jid_pool = ["j1", "j10", "j2", "jx0"]
    n_tables = data.draw(st.integers(1, 3), label="n_tables")
    events = []
    for t in range(n_tables):
        table = f"tbl{t}"
        evs = data.draw(
            st.lists(
                st.one_of(
                    st.tuples(
                        st.just("records"),
                        st.sampled_from(jid_pool),
                        st.integers(0, 99999),
                        st.integers(0, 9),
                    ),
                    st.tuples(
                        st.just("err_job"),
                        st.sampled_from(jid_pool),
                        st.sampled_from(["capacity", "Skipping slice"]),
                    ),
                ),
                min_size=1,
                max_size=4,
            ),
            label=f"events_{table}",
        )
        events.extend((table, *e) for e in evs)
    order = data.draw(st.permutations(range(len(events))), label="order")

    rows, expect = [], {}
    for line_no, idx in enumerate(order):
        ev = events[idx]
        table = ev[0]
        d = expect.setdefault(
            table,
            {
                "first_sev": "ERROR" if ev[1] == "err_job" else "INFO",
                "bq_job_id": None,
                "success_records": None,
                "error_records": None,
                "errs": [],
            },
        )
        if ev[1] == "records":
            _, _, jid, succ, errs = ev
            rows.append((line_no, "INFO",
                         f"Job {jid} (table {table}) completed. "
                         f"Number of records: {succ}, errors: {errs}."))
            d["bq_job_id"], d["success_records"], d["error_records"] = jid, succ, errs
        else:
            _, _, jid, why = ev
            msg = f"Job {jid} (table {table}) failed with {why}."
            rows.append((line_no, "ERROR", msg))
            d["bq_job_id"] = jid  # redshift: err-Job writes bq_job_id
            d["errs"].append(msg)

    logs = spark.createDataFrame(
        rows, "line_no long, severity string, message_text string"
    )
    got = {
        r.src_table_name: r
        for r in mine_job_stats(logs, "u", "c", "r", variant="redshift").collect()
    }
    assert set(got) == set(expect)
    for table, d in expect.items():
        r = got[table]
        msg = " ".join(d["errs"])
        assert r.bq_job_id == d["bq_job_id"], (table, r.bq_job_id, d["bq_job_id"])
        assert r.agent_id is None  # no agent writers in this dialect
        assert r.success_records == d["success_records"]
        assert r.error_records == d["error_records"]
        assert r.message == msg
        assert r.job_status == (
            "FAILED" if d["first_sev"] == "ERROR" else "SUCCEEDED"
        )


# --------------------------------------------------------------- transpiler
# Dict-replay for DDL (VERDICT r8 ask #5): generate random CREATE TABLE
# statements from the GRAMMAR of the reference's conformance corpora
# (tests/end_to_end/input/ddl/teradata/ppl_data_types.sql:8-30 is the
# attribute lattice: SET/MULTISET × FALLBACK/JOURNAL/CHECKSUM × per-
# column CHARACTER SET / CASESPECIFIC / FORMAT / TITLE / COMPRESS /
# DEFAULT × DECIMAL(p,s)/NUMBER/TIMESTAMP(n) [WITH TIME ZONE] × PRIMARY
# INDEX), with the EXPECTED Spark schema computed by the generator
# itself — an independent from-scratch model, not the transpiler's own
# rules. Each example then proves the transpiled DDL is real on both
# engines: Spark's SQL parser accepts spark_sql() and the schema_ddl()
# string round-trips to the expected types; DuckDB creates the same
# relation and its information_schema agrees column-for-column.

from data_migration_tool_spark.translate.transpiler import transpile_ddl  # noqa: E402

_DUCK_TYPE = {
    "INT": "INTEGER",
    "STRING": "VARCHAR",
    "BINARY": "BLOB",
    "TIMESTAMP_NTZ": "TIMESTAMP",  # DuckDB TIMESTAMP is tz-naive
    "TIMESTAMP": "TIMESTAMP WITH TIME ZONE",
}


def _assert_transpiled(spark, ddl, dialect, expected, *, type_overrides=None,
                       head_warn=(), cluster=None, partition=None, db="srcdb"):
    """Shared oracle for all four lattices. ``expected`` = list of
    (name, spark_type, nullable) the GENERATOR intended."""
    import duckdb

    t = transpile_ddl(
        ddl,
        dialect=dialect,
        name_mapping={db: "lake_" + db},
        type_overrides=type_overrides,
    )
    assert t.database == "lake_" + db
    assert [(c.name, c.spark_type, c.nullable) for c in t.columns] == expected
    assert not any(
        "unparsed" in w or "unmapped" in w for w in t.warnings
    ), t.warnings  # everything generated is in-corpus
    for opt in head_warn:
        assert any(opt in w for w in t.warnings), (opt, t.warnings)
    if cluster is not None:
        assert t.cluster_by == cluster
    if partition is not None:
        assert t.partition_by == partition

    # Spark accepts the emitted DDL (parse only — no catalog writes)
    spark._jsparkSession.sessionState().sqlParser().parsePlan(t.spark_sql())
    # and the schema string round-trips to the intended types
    schema = spark.createDataFrame([], t.schema_ddl()).schema
    got = [(f.name, f.dataType.simpleString()) for f in schema.fields]
    assert got == [(n, ty.lower()) for n, ty, _ in expected]

    # DuckDB expresses the same relation with agreeing column types
    con = duckdb.connect()
    cols = ", ".join(
        f'"{c.name}" {_DUCK_TYPE.get(c.spark_type.split("(")[0], c.spark_type)}'
        if "(" not in c.spark_type
        else f'"{c.name}" {c.spark_type}'
        for c in t.columns
    )
    con.execute(f"CREATE TABLE rt ({cols})")
    info = con.execute(
        "SELECT column_name, data_type FROM information_schema.columns "
        "WHERE table_name='rt' ORDER BY ordinal_position"
    ).fetchall()
    for (name, duck_ty), (en, ety, _) in zip(info, expected):
        want = ety if "(" in ety else _DUCK_TYPE.get(ety, ety)
        assert name == en and duck_ty == want, (name, duck_ty, want)
    con.close()


@st.composite
def _ident(draw, i):
    return f"c{i}_" + draw(st.from_regex(r"[a-z][a-z0-9_]{0,5}", fullmatch=True))


@st.composite
def _td_type(draw):
    kind = draw(st.sampled_from(
        ["simple", "decimal", "number", "char", "varchar", "ts", "json", "varbyte"]
    ))
    if kind == "decimal":
        p = draw(st.integers(1, 38)); s = draw(st.integers(0, p))
        return f"DECIMAL({p},{s})", f"DECIMAL({p},{s})"
    if kind == "number":
        which = draw(st.integers(0, 2))
        if which == 0:
            return "NUMBER", "DECIMAL(38,0)"
        p = draw(st.integers(1, 38))
        if which == 1:
            return f"NUMBER({p})", f"DECIMAL({p},0)"
        s = draw(st.integers(0, p))
        return f"NUMBER({p},{s})", f"DECIMAL({p},{s})"
    if kind == "char":
        return f"CHAR({draw(st.integers(1, 2048))})", "STRING"
    if kind == "varchar":
        return f"VARCHAR({draw(st.integers(1, 16000))})", "STRING"
    if kind == "ts":
        n = draw(st.integers(0, 6))
        if draw(st.booleans()):
            return f"TIMESTAMP({n}) WITH TIME ZONE", "TIMESTAMP"
        return f"TIMESTAMP({n})", "TIMESTAMP_NTZ"
    if kind == "json":
        return f"JSON({draw(st.integers(1, 5000))})", "STRING"
    if kind == "varbyte":
        return f"VARBYTE({draw(st.integers(1, 1024))})", "BINARY"
    return draw(st.sampled_from([
        ("BYTEINT", "TINYINT"), ("SMALLINT", "SMALLINT"), ("INTEGER", "INT"),
        ("BIGINT", "BIGINT"), ("FLOAT", "DOUBLE"), ("DATE", "DATE"),
    ]))


_TD_ATTRS = st.lists(
    st.sampled_from([
        "CHARACTER SET LATIN", "CHARACTER SET UNICODE", "NOT CASESPECIFIC",
        "CASESPECIFIC", "FORMAT 'YYYY-MM-DD'", "TITLE 'freight, class'",
        "COMPRESS", "COMPRESS 0", "DEFAULT NULL", "WITH DEFAULT",
    ]),
    max_size=3,
    unique=True,
)

_TD_HEAD = st.lists(
    st.sampled_from([
        ("FALLBACK", ",FALLBACK"),
        ("JOURNAL", ",\n NO BEFORE JOURNAL,\n NO AFTER JOURNAL"),
        ("CHECKSUM", ",\n CHECKSUM = DEFAULT"),
        ("MERGEBLOCKRATIO", ",\n DEFAULT MERGEBLOCKRATIO"),
        ("MAP", ",\n MAP = TD_MAP1"),
    ]),
    max_size=5,
    unique=True,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.data())
def test_transpile_teradata_lattice(spark, data):
    ncols = data.draw(st.integers(1, 6))
    cols, defs = [], []
    for i in range(ncols):
        name = data.draw(_ident(i))
        src, spark_ty = data.draw(_td_type())
        attrs = data.draw(_TD_ATTRS)
        notnull = data.draw(st.booleans())
        toks = list(attrs) + (["NOT NULL"] if notnull else [])
        # NOT NULL may appear anywhere among the attributes (the corpus
        # shows both "... LATIN NOT CASESPECIFIC NOT NULL" and
        # "DECIMAL(13,13) DEFAULT NULL") — order must not matter
        if notnull and toks:
            pos = data.draw(st.integers(0, len(toks) - 1))
            toks.remove("NOT NULL")
            toks.insert(pos, "NOT NULL")
        defs.append(f"{name} {src} {' '.join(toks)}".strip())
        cols.append((name, spark_ty, not notnull))
    head = data.draw(_TD_HEAD)
    setm = data.draw(st.sampled_from(["SET ", "MULTISET ", ""]))
    pidx = data.draw(st.one_of(st.none(), st.integers(1, ncols)))
    tail = ""
    cluster = []
    if pidx:
        cluster = [c[0] for c in cols[:pidx]]
        uniq = "UNIQUE " if data.draw(st.booleans()) else ""
        tail = f"\n{uniq}PRIMARY INDEX ( {' ,'.join(cluster)} )"
    comment = "-- corpus header\n" if data.draw(st.booleans()) else ""
    body = ",\n      ".join(defs)
    heads = "".join(h[1] for h in head)
    ddl = (
        f"{comment}CREATE {setm}TABLE srcdb.t_prop {heads}\n"
        f"     (\n      {body})\n{tail};"
    )
    _assert_transpiled(
        spark, ddl, "teradata", cols,
        head_warn=[h[0] for h in head], cluster=cluster,
    )


@st.composite
def _ora_type(draw):
    kind = draw(st.sampled_from(["varchar2", "number", "char", "clob", "date", "ts", "float"]))
    if kind == "varchar2":
        return f"VARCHAR2({draw(st.integers(1, 4000))})", "STRING"
    if kind == "number":
        which = draw(st.integers(0, 2))
        if which == 0:
            return "NUMBER", "DECIMAL(38,0)"
        p = draw(st.integers(1, 38))
        if which == 1:
            return f"NUMBER({p})", f"DECIMAL({p},0)"
        s = draw(st.integers(0, p))
        return f"NUMBER({p},{s})", f"DECIMAL({p},{s})"
    if kind == "char":
        return f"CHAR({draw(st.integers(1, 255))})", "STRING"
    if kind == "clob":
        return "CLOB", "STRING"
    if kind == "date":
        return "DATE", "DATE"
    if kind == "ts":
        return f"TIMESTAMP({draw(st.integers(0, 9))})", "TIMESTAMP_NTZ"
    return "FLOAT", "DOUBLE"


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.data())
def test_transpile_oracle_lattice(spark, data):
    ncols = data.draw(st.integers(1, 6))
    cols, defs = [], []
    for i in range(ncols):
        name = data.draw(_ident(i))
        src, spark_ty = data.draw(_ora_type())
        notnull = data.draw(st.booleans())
        named = data.draw(st.booleans())  # inline named constraint form
        default = data.draw(st.sampled_from(["", " DEFAULT 'abc'", " DEFAULT 0"]))
        nn = (
            f" CONSTRAINT {name}_nn NOT NULL" if notnull and named
            else (" NOT NULL" if notnull else "")
        )
        defs.append(f"{name} {src}{default}{nn}")
        cols.append((name, spark_ty, not notnull))
    body = ",\n  ".join(defs)
    ddl = f"CREATE TABLE srcdb.ora_prop (\n  {body}\n);"
    _assert_transpiled(spark, ddl, "oracle", cols)


@st.composite
def _rs_type(draw):
    return draw(st.sampled_from([
        ("character varying(256)", "STRING"), ("INTEGER", "INT"),
        ("BIGINT", "BIGINT"), ("DOUBLE PRECISION", "DOUBLE"),
        ("BOOLEAN", "BOOLEAN"), ("TIMESTAMP", "TIMESTAMP_NTZ"),
        ("DATE", "DATE"),
    ]) | st.builds(
        lambda p, s: (f"DECIMAL({p},{min(s, p)})", f"DECIMAL({p},{min(s, p)})"),
        st.integers(1, 38), st.integers(0, 38),
    ))


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.data())
def test_transpile_redshift_lattice(spark, data):
    ncols = data.draw(st.integers(1, 6))
    cols, defs = [], []
    for i in range(ncols):
        name = data.draw(_ident(i))
        src, spark_ty = data.draw(_rs_type())
        attrs = data.draw(st.lists(
            st.sampled_from(["ENCODE lzo", "ENCODE az64", "IDENTITY(1,1)", "DISTKEY"]),
            max_size=2, unique=True,
        ))
        notnull = data.draw(st.booleans())
        toks = list(attrs) + (["NOT NULL"] if notnull else [])
        defs.append(f"{name} {src} {' '.join(toks)}".strip())
        cols.append((name, spark_ty, not notnull))
    nsort = data.draw(st.one_of(st.none(), st.integers(1, ncols)))
    sort_cols = [c[0] for c in cols[:nsort]] if nsort else []
    tail = f"\nDISTSTYLE KEY\nCOMPOUND SORTKEY({', '.join(sort_cols)})" if nsort else ""
    body = ",\n  ".join(defs)
    ddl = f"CREATE TABLE srcdb.rs_prop (\n  {body}\n){tail};"
    _assert_transpiled(
        spark, ddl, "redshift", cols,
        head_warn=["DISTSTYLE"] if nsort else (), cluster=sort_cols,
    )


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.data())
def test_transpile_hive_lattice(spark, data):
    ncols = data.draw(st.integers(1, 6))
    cols, defs = [], []
    for i in range(ncols):
        name = data.draw(_ident(i))
        src, spark_ty = data.draw(st.sampled_from([
            ("STRING", "STRING"), ("DOUBLE", "DOUBLE"), ("INT", "INT"),
            ("BIGINT", "BIGINT"), ("BOOLEAN", "BOOLEAN"),
            ("datetime", "TIMESTAMP"),  # global_typeconvert override
            ("DECIMAL(12,2)", "DECIMAL(12,2)"),
        ]))
        tick = data.draw(st.booleans())
        defs.append(f"`{name}` {src}" if tick else f"{name} {src}")
        cols.append((name, spark_ty, True))
    part = data.draw(st.booleans())
    tail = ""
    if part:
        tail += "\nPARTITIONED BY (ds STRING, hr INT)"
    tail += "\nSTORED AS PARQUET\nLOCATION '/lake/t_hive'"
    if data.draw(st.booleans()):
        tail += "\nTBLPROPERTIES ('orc.compress'='SNAPPY')"
    body = ",\n  ".join(defs)
    ddl = f"CREATE TABLE `srcdb`.`hive_prop` (\n  {body}\n){tail};"
    _assert_transpiled(
        spark, ddl, "hive", cols,
        type_overrides={"datetime": "TIMESTAMP"},
        head_warn=["STORED AS", "LOCATION"],
        partition=["ds", "hr"] if part else [],
    )


@given(
    st.integers(0, 2**32 - 1),
    st.integers(1, 3),
    st.integers(1, 3),
    st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_dhash_bits_matches_pure_python(seed, tw, th, rgb):
    """dhash_bits (numpy tile means + bit assembly + two's-complement
    fold) against an independent per-pixel pure-Python reference, over
    random images whose dims tile the 9x8 grid exactly."""
    import numpy as np

    from data_migration_tool_spark.operators.multimodal import dhash_bits

    rng = np.random.default_rng(seed)
    h, w = 8 * th, 9 * tw
    px = rng.integers(0, 256, size=(h, w, 3) if rgb else (h, w)).astype(
        np.uint8
    )

    # reference: plain loops, ints only
    def gray(y, x):
        if rgb:
            return (int(px[y, x, 0]) + int(px[y, x, 1]) + int(px[y, x, 2])) // 3
        return int(px[y, x])

    # NOTE: the operator collapses RGB->gray BEFORE tiling (floor mean
    # per pixel), so the reference must too
    grid = [[0] * 9 for _ in range(8)]
    for by in range(8):
        for bx in range(9):
            s = 0
            for dy in range(th):
                for dx in range(tw):
                    s += gray(by * th + dy, bx * tw + dx)
            grid[by][bx] = s // (tw * th)
    want = 0
    for by in range(8):
        for bx in range(8):
            if grid[by][bx] > grid[by][bx + 1]:
                want |= 1 << (by * 8 + bx)
    if want >= 1 << 63:
        want -= 1 << 64
    assert dhash_bits(px) == want


@given(
    st.integers(0, 2**32 - 1),
    st.integers(2, 6),
    st.integers(2, 5),
    st.integers(2, 5),
)
@settings(max_examples=25, deadline=None)
def test_scene_change_sad_matches_bruteforce(seed, w, h, nf):
    """scene_changes' per-pair SAD over the full BGR payload equals a
    per-pixel pure-Python reference on random frame content (encoder →
    container walk → diff, two independent paths)."""
    import numpy as np

    from data_migration_tool_spark.operators.multimodal import (
        _avi_frame_arrays,
        encode_avi,
    )

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(nf, h, w)).astype(int)

    avi = encode_avi(w, h, nf, 5, lambda x, y, f: int(frames[f, y, x]))
    decoded = _avi_frame_arrays(avi)
    assert decoded is not None
    _usf, dw, dh, mats = decoded
    assert (dw, dh, len(mats)) == (w, h, nf)
    for f in range(1, nf):
        got = int(
            np.abs(
                mats[f].astype(np.int64) - mats[f - 1].astype(np.int64)
            ).sum()
        )
        want = 3 * int(np.abs(frames[f] - frames[f - 1]).sum())
        assert got == want
