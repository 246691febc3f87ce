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
