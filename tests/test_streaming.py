from __future__ import annotations

import json
import os

from data_migration_tool_spark.streaming.file_stream import (
    deduped_stream,
    run_events_stream_demo,
    watch_config_dir,
    windowed_event_counts,
)


def test_windowed_event_counts_batch(spark, tables):
    out = windowed_event_counts(tables["events"]).collect()
    assert len(out) > 0
    assert all(r["window_end"] > r["window_start"] for r in out)
    total = sum(r["n_events"] for r in out)
    assert total == tables["events"].count()


def test_deduped_stream_batch(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b")], "k int, v string"
    )
    assert deduped_stream(df, ["k"]).count() == 2


def test_events_streaming_end_to_end(spark, tmp_path):
    rows = run_events_stream_demo(
        spark, "/root/testdata/sf0.001/events.parquet", str(tmp_path)
    )
    assert len(rows) > 0
    # streaming result must equal the batch computation
    from data_migration_tool_spark.tables import load_table

    batch = windowed_event_counts(
        load_table(spark, "/root/testdata/sf0.001", "events")
    ).collect()
    key = lambda r: (r["window_start"], r["event_type"])  # noqa: E731
    assert sorted([tuple(r) for r in rows], key=lambda t: (t[0], t[2])) == sorted(
        [tuple(r) for r in batch], key=lambda t: (t[0], t[2])
    )


def test_watch_config_dir_dispatch(spark, tmp_path):
    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "cfg1.json").write_text(json.dumps({"type": "ddl", "source": "hive"}))
    (landing / "cfg2.json").write_text(json.dumps({"type": "data", "source": "td"}))
    seen: list[str] = []

    def dispatch(batch_df, batch_id):
        for r in batch_df.collect():
            seen.append(json.loads(r["value"])["type"])

    q = watch_config_dir(
        spark, str(landing), str(tmp_path / "ckpt"), dispatch, available_now=True
    )
    assert q.awaitTermination(60)
    assert sorted(seen) == ["data", "ddl"]
    # restart with same checkpoint: nothing re-dispatched (exactly-once)
    seen.clear()
    q2 = watch_config_dir(
        spark, str(landing), str(tmp_path / "ckpt"), dispatch, available_now=True
    )
    assert q2.awaitTermination(60)
    assert seen == []
    # new file arrives → only it is dispatched
    (landing / "cfg3.json").write_text(json.dumps({"type": "sql", "source": "rs"}))
    q3 = watch_config_dir(
        spark, str(landing), str(tmp_path / "ckpt"), dispatch, available_now=True
    )
    assert q3.awaitTermination(60)
    assert seen == ["sql"]


def test_stateful_sessionization_across_microbatches(spark, tmp_path):
    """State must carry open sessions across micro-batch boundaries:
    stream the events table as TWO time-split files with
    maxFilesPerTrigger=1 (two real batches), take each (user, session)'s
    final emission, and require exact equality with the one-pass batch
    sessionization."""
    import shutil
    import pandas as pd
    from pyspark.sql import functions as F
    from data_migration_tool_spark.streaming.stateful import sessionize_stream
    from data_migration_tool_spark.tables import load_table
    from data_migration_tool_spark.plans.windowq import user_sessions

    sf_dir = "/root/testdata/sf0.001"
    e = load_table(spark, sf_dir, "events")
    cut = e.agg(F.expr("percentile_approx(ts, 0.5)")).first()[0]
    landing = tmp_path / "landing"
    landing.mkdir()
    # micros-normalized writes: the landed files round-trip as micros,
    # so the streaming read needs no nanos handling
    e.filter(F.col("ts") <= F.lit(cut)).coalesce(1).write.parquet(
        str(tmp_path / "f0")
    )
    e.filter(F.col("ts") > F.lit(cut)).coalesce(1).write.parquet(
        str(tmp_path / "f1")
    )
    for i, d in enumerate(("f0", "f1")):
        src = next((tmp_path / d).glob("*.parquet"))
        dst = landing / f"{i}_events.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (1_000_000_000 + i * 1000, 1_000_000_000 + i * 1000))

    schema = spark.read.parquet(str(landing / "0_events.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(landing))
    )
    q = (
        sessionize_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sess_mb")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    assert len(q.recentProgress) >= 2, "expected two micro-batches"

    emitted = spark.table("sess_mb").toPandas()
    # n_events grows monotonically per (user, session): the max-count
    # emission is the final one
    final = (
        emitted.sort_values("n_events")
        .drop_duplicates(["user_id", "session_id"], keep="last")
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    expected = (
        user_sessions(spark, sf_dir)
        .toPandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        final[["user_id", "session_id", "n_events", "duration_us", "sum_value"]],
        expected[["user_id", "session_id", "n_events", "duration_us", "sum_value"]],
        check_dtype=False,
    )


def test_cdc_stream_upsert_across_batches(spark, tmp_path):
    """Two landed change files applied as two streaming drains: the
    checkpoint makes the second drain process ONLY the new file, and
    latest-wins merge semantics hold across batches (update replaces,
    new key inserts, stale version loses)."""
    from data_migration_tool_spark.streaming.cdc import apply_cdc_stream

    landing = str(tmp_path / "landing")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)

    schema = "k long, v string, ver long"

    def drain():
        changes = spark.readStream.schema(schema).parquet(landing)
        q = apply_cdc_stream(spark, changes, target, ["k"], "ver", ckpt)
        assert q.awaitTermination(120)

    spark.createDataFrame(
        [(1, "a0", 1), (2, "b0", 1)], schema
    ).coalesce(1).write.mode("append").parquet(landing)
    drain()
    assert {tuple(r) for r in spark.read.parquet(target).collect()} == {
        (1, "a0", 1), (2, "b0", 1)
    }

    # batch 2: update k=1 (newer ver), stale row for k=2 (older ver
    # loses), insert k=3
    spark.createDataFrame(
        [(1, "a1", 2), (2, "b-stale", 0), (3, "c0", 1)], schema
    ).coalesce(1).write.mode("append").parquet(landing)
    drain()
    assert {tuple(r) for r in spark.read.parquet(target).collect()} == {
        (1, "a1", 2), (2, "b0", 1), (3, "c0", 1)
    }


def test_quota_stream_v2_gate_or_run(spark, tmp_path):
    """State-V2 (transformWithStateInPandas) needs google.protobuf for
    its state protocol. Without it the wrapper must raise a loud, named
    error BEFORE any stream starts; with it, the V2 path must produce
    the same totals as the gated V1 query."""
    import os
    import shutil

    import pytest as _pytest

    from data_migration_tool_spark.streaming.quota import (
        _state_v2_available,
        quota_stream_v2,
    )

    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    shutil.copy(
        "/root/testdata/sf0.001/events.parquet",
        os.path.join(landing, "events.parquet"),
    )

    if not _state_v2_available():
        with _pytest.raises(RuntimeError, match="protobuf"):
            quota_stream_v2(
                spark.readStream.schema(
                    spark.read.parquet(landing).schema
                ).parquet(landing)
            )
        return

    from data_migration_tool_spark.plans.streamq import events_stream_user_quota

    schema = spark.read.parquet(landing).schema
    stream = spark.readStream.schema(schema).parquet(landing)
    sink = "quota_v2_test"
    q = (
        quota_stream_v2(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    v2 = {tuple(r) for r in spark.table(sink).collect()}
    v1 = {
        tuple(r)
        for r in events_stream_user_quota(spark, "/root/testdata/sf0.001").collect()
    }
    assert v2 == v1


def test_stream_dedup_across_two_microbatches(spark, tmp_path):
    """Redelivery arriving in a LATER micro-batch: batch 1 lands the
    events once, batch 2 redelivers every event. Rows still inside the
    watermark dedup against state; rows behind the advanced watermark
    are dropped as late — either way each event contributes exactly
    once, so the aggregate equals batch-distinct."""
    import os
    import uuid

    from pyspark.sql import functions as F

    from data_migration_tool_spark.tables import load_table, normalize_timestamps

    sf_dir = "/root/testdata/sf0.001"
    batch = load_table(spark, sf_dir, "events")
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    ck = str(tmp_path / "ckpt")
    batch.write.parquet(os.path.join(landing, "f1"))

    stream = normalize_timestamps(
        spark.readStream.schema(batch.schema)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "64")
        .parquet(landing)
    )
    agg = (
        stream.withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sink = f"dedup2_{uuid.uuid4().hex[:8]}"
    w = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", ck)
    )
    q = w.trigger(availableNow=True).start()
    assert q.awaitTermination(300)

    # batch 2: full redelivery, then drain again from the checkpoint
    batch.write.parquet(os.path.join(landing, "f2"))
    q = w.trigger(availableNow=True).start()
    assert q.awaitTermination(300)

    got = {r.event_type: r.n for r in spark.table(sink).collect()}
    want = {
        r.event_type: r.n
        for r in batch.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_exactly_once_append_sink_replay_safe(spark, tmp_path):
    """The idempotent append sink must converge to exactly-once output
    under (a) a full stream drain, (b) a manual replay of an
    already-committed batch (marker short-circuit), and (c) a forced
    rewrite of a batch directory with the marker removed (overwrite
    idempotence — the property correctness actually rests on)."""
    import os

    from data_migration_tool_spark.streaming.txn_sink import (
        append_batch_idempotent,
        exactly_once_append,
        read_appended,
    )

    landing = str(tmp_path / "landing")
    target = str(tmp_path / "target")
    ck = str(tmp_path / "ck")
    os.makedirs(landing)
    rows = spark.createDataFrame(
        [(i, f"r{i}") for i in range(100)], "id long, v string"
    )
    rows.coalesce(1).write.mode("append").parquet(landing)

    stream = spark.readStream.schema(rows.schema).parquet(landing)
    q = exactly_once_append(stream, target, ck)
    assert q.awaitTermination(300)

    out = read_appended(spark, target)
    assert out.count() == 100
    assert "batch_id" in out.columns

    # (b) replay of a committed batch is a no-op
    replay = spark.createDataFrame([(999, "dup")], "id long, v string")
    wrote = append_batch_idempotent(replay, 0, target)
    assert wrote is False
    assert read_appended(spark, target).count() == 100

    # (c) marker gone → the batch REWRITES its own directory, still no dups
    os.remove(os.path.join(target, "_manifest", "0"))
    batch0 = rows  # checkpoint contract: same batch id = same content
    wrote = append_batch_idempotent(batch0, 0, target)
    assert wrote is True
    assert read_appended(spark, target).count() == 100

    # second drain from the checkpoint: nothing new, nothing duplicated
    q = exactly_once_append(
        spark.readStream.schema(rows.schema).parquet(landing), target, ck
    )
    assert q.awaitTermination(300)
    assert read_appended(spark, target).count() == 100


def test_compact_batch_dirs(spark, tmp_path):
    """r13 per-batch small-file compaction: committed batch dirs are
    rewritten to one file with byte-equal content, markers and the
    replay short-circuit survive, uncommitted dirs are untouched, and
    a crash between the swap renames self-heals on the next call."""
    import os
    import shutil

    import pytest

    from data_migration_tool_spark.streaming.txn_sink import (
        append_batch_idempotent,
        compact_batch_dirs,
        read_appended,
    )

    target = str(tmp_path / "target")
    rows = spark.createDataFrame(
        [(i, f"r{i}") for i in range(100)], "id long, v string"
    )
    # two committed batches, written wide (many small files each)
    assert append_batch_idempotent(rows.repartition(8), 0, target)
    assert append_batch_idempotent(rows.repartition(8), 1, target)
    # one UNCOMMITTED batch dir: data landed, marker missing (crash
    # before the marker write)
    rows.repartition(8).write.parquet(os.path.join(target, "batch_id=2"))

    before = sorted(
        (r.id, r.v, r.batch_id) for r in read_appended(spark, target).collect()
    )
    n_files = lambda b: sum(  # noqa: E731
        1
        for f in os.listdir(os.path.join(target, f"batch_id={b}"))
        if f.endswith(".parquet")
    )
    assert n_files(0) == 8 and n_files(2) == 8

    assert compact_batch_dirs(spark, target) == [0, 1]
    assert n_files(0) == 1 and n_files(1) == 1
    assert n_files(2) == 8  # uncommitted: the replay path owns it
    after = sorted(
        (r.id, r.v, r.batch_id) for r in read_appended(spark, target).collect()
    )
    assert after == before
    # markers survive the swap protocol (off during, rewritten after)
    assert os.path.exists(os.path.join(target, "_manifest", "0"))
    assert os.path.exists(os.path.join(target, "_manifest", "1"))
    # replay of a compacted committed batch still short-circuits
    assert append_batch_idempotent(rows, 0, target) is False
    # idempotent: nothing left to compact
    assert compact_batch_dirs(spark, target) == []

    # crash mid-swap (code-review r13 protocol: the marker is OFF in
    # that window, so BOTH recovery paths work): live dir missing,
    # marker missing, _compact_old_ orphan present
    os.rename(
        os.path.join(target, "batch_id=1"),
        os.path.join(target, "_compact_old_1"),
    )
    os.remove(os.path.join(target, "_manifest", "1"))
    # recovery path A — a stream replay of the batch rewrites its
    # directory wholesale (no marker → no short-circuit); emulate it
    # being possible by checking the marker really is gone
    assert not os.path.exists(os.path.join(target, "_manifest", "1"))
    # recovery path B — the next compactor call restores the dir AND
    # re-creates the marker before doing new work
    assert compact_batch_dirs(spark, target) == []
    assert os.path.isdir(os.path.join(target, "batch_id=1"))
    assert os.path.exists(os.path.join(target, "_manifest", "1"))
    assert sorted(
        (r.id, r.v, r.batch_id) for r in read_appended(spark, target).collect()
    ) == before

    # leftover tmp debris from an interrupted rewrite is cleared
    shutil.copytree(
        os.path.join(target, "batch_id=0"),
        os.path.join(target, "_compact_tmp_0"),
    )
    compact_batch_dirs(spark, target)
    assert not os.path.exists(os.path.join(target, "_compact_tmp_0"))

    # remote layouts are refused loudly
    with pytest.raises(ValueError, match="local targets only"):
        compact_batch_dirs(spark, "s3a://bucket/sink")


def test_txn_sink_markers_only_for_local_targets(spark, tmp_path):
    """Marker files are driver-local os calls while data goes through
    Spark writers — with an hdfs://s3a://gs:// target the two would hit
    different filesystems, so the marker optimization must disable
    itself for any non-file URI (a stale LOCAL marker must never skip a
    REMOTE write). Correctness then rests on overwrite idempotence
    alone. file:// and bare paths keep the short-circuit."""
    from data_migration_tool_spark.streaming.txn_sink import (
        _is_local_dir,
        append_batch_idempotent,
        read_appended,
    )

    assert _is_local_dir(str(tmp_path / "x"))
    assert _is_local_dir("file:///data/out")
    for remote in ("hdfs://nn/out", "s3a://bucket/out", "gs://bucket/out"):
        assert not _is_local_dir(remote)

    # file:// URI target: data via Spark, marker via os — both local, so
    # the replay short-circuit works and no remote-style skip happens
    target = "file://" + str(tmp_path / "ft")
    rows = spark.createDataFrame([(1, "a")], "id long, v string")
    assert append_batch_idempotent(rows, 7, target) is True
    assert append_batch_idempotent(rows, 7, target) is False  # marker hit
    assert read_appended(spark, target).count() == 1


def test_lsh_ingest_stream_across_batches(spark, tmp_path):
    """Three landed doc files drained as three micro-batches: each
    batch's near-dup pairs are checked against everything ingested
    BEFORE it; the band index grows as streaming state; a crashed-batch
    replay converges (idempotent per-batch writes)."""
    from data_migration_tool_spark.operators import dedup as DD
    from data_migration_tool_spark.streaming.lsh_ingest import (
        ingest_batch,
        lsh_ingest_stream,
    )

    landing = str(tmp_path / "landing")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)

    base = "the quick brown fox jumps over the lazy dog by the river"
    batches = [
        [(0, base), (1, base.replace("river", "creek"))],
        [(2, base), (3, "completely different text about spark engines")],
        [(4, base.replace("river", "creek")), (5, base)],
    ]
    schema = "doc_id long, text string"

    def drain():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(landing)
        q = lsh_ingest_stream(stream, state, ckpt, threshold=0.5)
        assert q.awaitTermination(180)

    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        drain()

    got = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(f"{state}/pairs").select(
            "id_a", "id_b"
        ).collect()
    }

    # sequential reference with the batch operator: batch k vs docs
    # ingested before it (plus within-batch pairs)
    all_rows, want = [], set()
    for rows in batches:
        nd = spark.createDataFrame(rows, schema)
        standing = spark.createDataFrame(
            all_rows or [], schema
        )
        ref = DD.minhash_lsh_incremental(
            nd, DD.lsh_index(standing), standing, threshold=0.5
        )
        want |= {(r.id_a, r.id_b) for r in ref.collect()}
        all_rows += rows
    assert got == want
    # the near-dup family {0,1,2,4,5} must interconnect; 3 is isolated
    assert all(3 not in p for p in got)
    assert {p for p in got if 0 in p}  # doc 0 pairs exist

    # replay safety: re-running a completed batch changes nothing
    before = sorted(got)
    nd = spark.createDataFrame(batches[2], schema)
    ingest_batch(
        nd, 2, f"{state}/index", f"{state}/corpus", f"{state}/pairs"
    )
    after = sorted(
        (r.id_a, r.id_b)
        for r in spark.read.parquet(f"{state}/pairs").select(
            "id_a", "id_b"
        ).collect()
    )
    assert after == before


def test_substr_ingest_stream_across_batches(spark, tmp_path):
    """Three landed doc files drained as three micro-batches: each
    batch is exact-substring-deduped against the gram index ingested
    BEFORE it; the index grows by novel grams only; the union of all
    cleaned outputs equals the one-shot batch run over the full corpus
    (ids ascend across batches, so canonical election agrees); a
    crashed-batch replay converges (idempotent per-batch writes)."""
    from data_migration_tool_spark.streaming.substr_ingest import (
        ingest_batch,
        substr_ingest_stream,
    )
    from tests.test_dataops import _exact_substr_brute

    landing = str(tmp_path / "landing")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)

    span = "alpha beta gamma delta epsilon"
    batches = [
        [(0, span + " zeta eta"), (1, "one two three four five six")],
        [(2, "lead in words " + span), (3, "one two three four five六")],
        [(4, span + " " + span), (5, "fresh tokens only here now")],
    ]
    schema = "doc_id long, text string"

    def drain():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(landing)
        q = substr_ingest_stream(stream, state, ckpt)
        assert q.awaitTermination(180)

    for rows in batches:
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(landing)
        drain()

    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.n_spans, r.clean_md5)
        for r in spark.read.parquet(f"{state}/cleaned")
        .select("doc_id", "n_tokens", "n_removed", "n_spans", "clean_md5")
        .collect()
    }
    want = _exact_substr_brute([d for rows in batches for d in rows])
    assert got == want
    # the planted cross-batch dup fired: docs 2 and 4 lose the span to
    # canonical owner 0; doc 4's SECOND copy is covered too (intra-doc)
    assert got[2][1] >= 5 and got[4][1] == 10
    # index is duplicate-free (novel grams only were appended)
    idx = spark.read.parquet(f"{state}/index").select("g")
    assert idx.count() == idx.distinct().count()

    # replay safety: re-running a completed batch changes nothing
    nd = spark.createDataFrame(batches[2], schema)
    ingest_batch(nd, 2, f"{state}/index", f"{state}/cleaned")
    again = {
        r.doc_id: (r.n_tokens, r.n_removed, r.n_spans, r.clean_md5)
        for r in spark.read.parquet(f"{state}/cleaned")
        .select("doc_id", "n_tokens", "n_removed", "n_spans", "clean_md5")
        .collect()
    }
    assert again == want


def test_stream_stager_handles_directory_tables(spark, tmp_path):
    """The stream queries must accept events.parquet as a Spark-written
    DIRECTORY of part files (any real lake layout), not only the
    single-file testdata layout: results must equal the single-file
    run row-for-row."""
    from data_migration_tool_spark.plans.streamq import (
        events_stream_daily_counts,
    )
    from data_migration_tool_spark.tables import load_table

    src_dir = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    # write events as a 3-part DIRECTORY table
    load_table(spark, src_dir, "events").repartition(3).write.parquet(
        os.path.join(sf_dir, "events.parquet")
    )
    got = {
        tuple(r)
        for r in events_stream_daily_counts(spark, sf_dir).collect()
    }
    want = {
        tuple(r)
        for r in events_stream_daily_counts(spark, src_dir).collect()
    }
    assert got == want and len(got) > 0


def test_no_bare_await_termination_call_sites():
    """The loud-drain convention as an invariant (VERDICT r11 #5):
    every awaitTermination call site repo-wide must consume the
    boolean — via _drain_or_raise, an ``if not``, or an ``assert`` —
    because a silently-ignored timeout means reading a partially
    written sink. The r11 sweep converted every plan; this pins the
    convention so no new bare drain can land."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bare = []
    for base in ("data_migration_tool_spark", "tests"):
        for dirpath, _dirs, files in os.walk(os.path.join(root, base)):
            for name in files:
                if not name.endswith(".py"):
                    continue
                path = os.path.join(dirpath, name)
                for i, line in enumerate(open(path), 1):
                    if "awaitTermination(" not in line:
                        continue
                    s = line.strip()
                    if s.startswith("#") or "``" in s or '"' in s:
                        continue  # comments / docstrings / this scanner
                    if re.search(
                        r"(if not |assert |= |return ).*awaitTermination\(", s
                    ):
                        continue
                    bare.append(f"{path}:{i}: {s}")
    assert not bare, "bare awaitTermination call sites:\n" + "\n".join(bare)


def test_orders_stream_join_ivm_equals_direct_join(spark):
    """The r12 streaming CDC join-view maintenance: three micro-batches
    of delete+insert events applied through the partition-pruned
    on-disk apply must reproduce the direct post-change join exactly
    (the no-stream ground truth)."""
    from pyspark.sql import functions as F

    from data_migration_tool_spark.plans.streamq import (
        orders_stream_join_ivm,
    )
    from data_migration_tool_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {tuple(r) for r in orders_stream_join_ivm(spark, sf).collect()}

    o = load_table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderstatus"
    ).filter(F.col("orderkey") % 10 != 3)
    li = load_table(spark, sf, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"),
        (
            F.col("l_extendedprice").cast("decimal(12,2)")
            * (F.lit(1).cast("decimal(3,2)")
               - F.col("l_discount").cast("decimal(4,2)"))
        ).alias("rev"),
    )
    want = {
        tuple(r)
        for r in o.join(li, ["orderkey"])
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("rev").cast("double").alias("sum_revenue"),
        )
        .collect()
    }
    assert got == want and len(got) > 0
