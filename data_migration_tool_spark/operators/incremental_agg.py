"""Incremental aggregate maintenance — materialized-rollup algebra.

The reference's incremental load path appends only the new time window
(src/datamigration/dags/datamigration_utils/hive_bq_load_utils_inc.py:
542-667) but then re-derives downstream aggregates from scratch.  At
100 TB the rescan is the bottleneck: a day's delta is ~1/1000 of the
corpus.  This module gives rollups the same incremental contract the
loads already have, via the classic partial-aggregate algebra:

    agg(base ∪ delta) == merge(partials(base), partials(delta))

* ``partials`` reduces a table to per-key states (count, Σx, Σx²,
  min, max).  Σx/Σx² accumulate in EXACT decimal — order-independent,
  so states computed at different times / parallelisms merge cleanly.
* ``merge_partials`` combines any number of state tables with one
  groupBy: counts and sums add, min/max fold.  States are tiny
  (key-grain), so maintenance cost is O(delta + |keys|), never O(base).
* ``finalize`` assembles mean/variance from the exact sums with a fixed
  IEEE sequence (same guarantees as plans/relational.price_dispersion_
  stats — no catastrophic cancellation because the sums are exact).

The correctness gate (``orders_incremental_agg``) proves the algebra
end-to-end: Spark computes merge(partials(pre-1997), partials(1997+));
the DuckDB oracle aggregates the whole table directly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("n", "sx", "sxx", "mn", "mx")


def partials(
    df: DataFrame,
    keys: list[str],
    measure: str,
    dec: str = "decimal(12,2)",
) -> DataFrame:
    """Reduce ``df`` to the per-key mergeable state of ``measure``.

    One map-side-combinable shuffle on ``keys``; the result is
    key-grain (tiny), suitable for persisting as the rollup's state
    table between micro-batches."""
    x = F.col(measure).cast(dec)
    return df.groupBy(*keys).agg(
        F.count(measure).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.min(measure).alias("mn"),
        F.max(measure).alias("mx"),
    )


def merge_partials(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Combine state tables: counts/sums add, min/max fold.

    Input states are key-grain, so this groupBy shuffles only
    |keys|-scale rows — the whole point of maintaining partials."""
    merged = reduce(lambda a, b: a.unionByName(b), states)
    return merged.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sx").alias("sx"),
        F.sum("sxx").alias("sxx"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )


def finalize(state: DataFrame, keys: list[str]) -> DataFrame:
    """Assemble the user-facing rollup from exact sums.

    mean/var derive from Σx/Σx² with a fixed IEEE sequence — identical
    on any engine and at any parallelism."""
    sx_d = F.col("sx").cast("double")
    sxx_d = F.col("sxx").cast("double")
    n = F.col("n")
    # n==1 → NULL (not a DIVIDE_BY_ZERO under ANSI mode): sample
    # variance is undefined for a single observation. Oracles mirror
    # this with NULLIF(n - 1, 0).
    var = F.when(n > F.lit(1), (sxx_d - sx_d * sx_d / n) / (n - 1))
    # total rounds ONCE decimal->double at the final projection (Spark's
    # cast is BigDecimal.doubleValue; oracles route the same decimal
    # through VARCHAR so DuckDB also rounds once — raw DECIMAL outputs
    # diverge in the official gate's pandas canonicalization).
    return state.select(
        *keys,
        n.alias("n_rows"),
        F.col("sx").cast("double").alias("total"),
        (sx_d / n).alias("mean"),
        var.alias("variance"),
        F.col("mn").alias("min_value"),
        F.col("mx").alias("max_value"),
    )


def retract_partials(
    state: DataFrame,
    deletes: DataFrame,
    base: DataFrame,
    keys: list[str],
    measure: str,
    dec: str = "decimal(12,2)",
) -> DataFrame:
    """Maintain per-key partial states under DELETES (``deletes ⊆
    base``, multiset semantics) — the non-invertible complement of
    ``merge_partials``.

    count/Σx/Σx² are INVERTIBLE: the deletes' own partials subtract
    exactly (decimal sums are order-free). min/max are NOT — deleting
    the row that holds a group's extreme says nothing about the new
    extreme. The classic engine choices are per-group heaps (state
    explosion) or lazy recompute; this takes the Spark-shaped lazy
    path: only groups whose deleted rows TOUCH the current extreme
    (delete-min == state-min or delete-max == state-max — deletes ⊆
    base makes equality the only possible touch) are recomputed, from
    the retained rows of those keys alone, reached by a broadcast
    left-semi on the (small) touched-key set. Untouched groups adjust
    arithmetically; groups deleted whole vanish (no retained rows →
    no recomputed state). Cost is O(Δ + touched-group rows), never
    O(base).

    Inputs are (keys, measure) relations; ``base`` is the PRE-delete
    table the state was computed from. Compose with inserts by
    ``merge_partials([retract_partials(...), partials(inserts, ...)])``.

    NULL hygiene (ADVICE r11): every key join here is NULL-SAFE
    (``<=>``), so deletes on a NULL-keyed group are applied, not
    silently dropped; and the delta sums are coalesced to 0 before
    subtracting — a delete batch whose rows for some group carry only
    NULL measures produces dn=0 with NULL dsx/dsxx, and ``sx − NULL``
    would otherwise silently NULL that group's sums (the state tracks
    non-null measures only, so such deletes correctly change nothing).
    """
    from functools import reduce as _reduce
    from operator import and_ as _and

    def _semi_nullsafe(df: DataFrame, keys_df: DataFrame) -> DataFrame:
        kd = keys_df.select(
            *[F.col(k).alias(f"_tk{i}") for i, k in enumerate(keys)]
        )
        cond = _reduce(
            _and,
            [df[k].eqNullSafe(kd[f"_tk{i}"]) for i, k in enumerate(keys)],
        )
        return df.join(F.broadcast(kd), cond, "leftsemi")

    dp = partials(deletes, keys, measure, dec).select(
        *[F.col(k).alias(f"_dk{i}") for i, k in enumerate(keys)],
        F.col("n").alias("dn"),
        F.col("sx").alias("dsx"),
        F.col("sxx").alias("dsxx"),
        F.col("mn").alias("dmn"),
        F.col("mx").alias("dmx"),
    )
    stypes = {f.name: f.dataType for f in state.schema.fields}
    jcond = _reduce(
        _and,
        [
            state[k].eqNullSafe(dp[f"_dk{i}"])
            for i, k in enumerate(keys)
        ],
    )
    merged = state.join(dp, jcond, "left").drop(
        *[f"_dk{i}" for i in range(len(keys))]
    )
    touched = F.coalesce(
        (F.col("dmn") == F.col("mn")) | (F.col("dmx") == F.col("mx")),
        F.lit(False),
    )
    # Unchanged and arithmetically-adjusted groups FUSE into one
    # projection (r13, guide §1.2): for a group the delete batch never
    # touched, every delta column is NULL from the left join, so
    # n − coalesce(dn, 0) ≡ n (and likewise for the sums) — the
    # subtract-with-NULL-coalesce covers both cases bit-identically.
    # The former unchanged/adjusted split referenced the state⋈delta
    # join subtree from three union branches; per-trigger stream IVM
    # paid the join (and the delete-partials shuffle under it) three
    # times. Two references remain: this projection + touched_keys.
    untouched = merged.filter(~touched).select(
        *keys,
        (F.col("n") - F.coalesce(F.col("dn"), F.lit(0)))
        .cast(stypes["n"])
        .alias("n"),
        (F.col("sx") - F.coalesce(F.col("dsx"), F.lit(0)))
        .cast(stypes["sx"])
        .alias("sx"),
        (F.col("sxx") - F.coalesce(F.col("dsxx"), F.lit(0)))
        .cast(stypes["sxx"])
        .alias("sxx"),
        F.col("mn"),
        F.col("mx"),
    )
    touched_keys = merged.filter(touched).select(*keys)
    retained_rows = _semi_nullsafe(
        base.select(*keys, measure), touched_keys
    ).exceptAll(
        _semi_nullsafe(deletes.select(*keys, measure), touched_keys)
    )
    recomputed = partials(retained_rows, keys, measure, dec).select(
        *keys,
        *[F.col(c).cast(stypes[c]).alias(c) for c in STATE_COLS],
    )
    return untouched.unionByName(recomputed)


def join_delta(
    base_a: DataFrame,
    delta_a: DataFrame,
    base_b: DataFrame,
    delta_b: DataFrame,
    on: list[str],
) -> DataFrame:
    """Incremental view maintenance for an INNER equi-join view under
    inserts — the join complement of the partial-aggregate algebra
    above. The classic delta rule:

        (A ∪ ΔA) ⋈ (B ∪ ΔB)  ==  (A ⋈ B)  ∪  Δ(A ⋈ B)
        Δ(A ⋈ B)  ==  ΔA ⋈ B  ∪  A ⋈ ΔB  ∪  ΔA ⋈ ΔB

    (disjoint unions when ΔA∩A = ΔB∩B = ∅ — insert-only deltas, the
    reference's append-window load contract). Returns the DELTA frame;
    the maintained view is ``old_view.unionByName(join_delta(...))``.

    Scale shape: the base tables NEVER join each other here — each of
    the three terms carries at least one delta side, so maintenance
    cost is O(Δ·matched) + the base-side shuffles can be avoided
    entirely when the bases are bucketed on the join key (the
    sources/bucketing.py layout) and the deltas broadcast. At 100 TB
    with a daily delta ~1/1000 of the corpus, re-deriving the view
    from scratch rescans 1000× more than this delta path moves."""
    return (
        delta_a.join(base_b, on)
        .unionByName(base_a.join(delta_b, on))
        .unionByName(delta_a.join(delta_b, on))
    )


def join_retract(
    base_a: DataFrame,
    del_a: DataFrame,
    base_b: DataFrame,
    del_b: DataFrame,
    on: list[str],
    retained_a: DataFrame | None = None,
) -> DataFrame:
    """The DELETE side of join-view maintenance: rows to RETRACT from
    the materialized view when ``del_a ⊆ A`` and ``del_b ⊆ B`` are
    removed (multiset semantics). Derivation:

        (A − δA) ⋈ (B − δB)  ==  (A ⋈ B)  −  Δ⁻
        Δ⁻  ==  δA ⋈ B  ∪  (A − δA) ⋈ δB

    — the second term joins the RETAINED a-side so a row deleted from
    both sides is not retracted twice. Apply with multiset subtraction:
    ``view.exceptAll(join_retract(...))``. Inserts and deletes in one
    batch compose: retract first, then union ``join_delta`` of the
    inserts against the retained bases.

    Scale shape: same as ``join_delta`` — each term carries a delta
    side, cost O(δ·matched); the one full-base participant
    (``A.exceptAll(δA)``) is a broadcast-anti against the (small)
    delta, not a second base join.

    ``retained_a``: callers that can express A − δA directly — e.g. a
    CDC feed where δA is a predicate slice of A, so the retained side
    is just the complementary filter — pass it here and skip the
    ``exceptAll`` entirely (r13, guide §2.4: Spark plans EXCEPT ALL as
    a full two-sided shuffle with count bookkeeping, two exchanges the
    filter form never pays). Must equal ``base_a.exceptAll(del_a)`` as
    a multiset; the default derives it."""
    if retained_a is None:
        retained_a = base_a.exceptAll(del_a)
    return del_a.join(base_b, on).unionByName(retained_a.join(del_b, on))


def sweep_state_versions(state_dir: str, keep_last: int = 3) -> list[str]:
    """Keep-last-k retention for immutable per-batch state versions
    (r13, VERDICT r12 #2): delete all but the newest ``keep_last``
    COMMITTED versions under ``state_dir`` and return the swept
    version names (sorted).

    A production stream lands one ``state_dir/v{batch}`` directory per
    trigger forever; without retention the version count — and the
    O(versions) directory listing every trigger's latest-state lookup
    pays — grows unboundedly. Call this AFTER the new version's
    ``_SUCCESS`` lands (the version-commit step), so replay protection
    survives the sweep:

    * only directories WITH a ``_SUCCESS`` marker count toward (or are
      touched by) retention — uncommitted crash debris is the
      redelivery path's property, not ours to reap;
    * the newest ``keep_last`` committed versions always survive, so a
      re-delivered batch (at-least-once foreachBatch) still finds its
      own version and skips the state step — ``keep_last`` must exceed
      the sink's redelivery depth, which is 1 for foreachBatch (a
      failed trigger re-runs only itself), hence the default 3 is
      conservative;
    * sweeping strictly-older versions can never change the
      latest-state lookup's answer, so a crash mid-sweep is harmless
      (the next sweep finishes the job).
    """
    import os
    import re
    import shutil

    if keep_last < 1:
        raise ValueError(
            f"sweep_state_versions: keep_last must be >= 1 (got "
            f"{keep_last}) — retention may never delete the current "
            f"state version"
        )

    def _version_key(name: str) -> tuple[int, str]:
        # order by the NUMERIC version, not lexicographically: with
        # unpadded names (the v{batch} convention), "v10" sorts before
        # "v9" as a string and the sweep would delete the just-written
        # newest version — recomputing every later trigger from stale
        # state (and zero-padded names hit the same cliff when the
        # counter outgrows the pad width, e.g. v100000 < v99999)
        m = re.search(r"(\d+)$", name)
        return (int(m.group(1)) if m else -1, name)

    committed = sorted(
        (
            v
            for v in os.listdir(state_dir)
            if os.path.exists(os.path.join(state_dir, v, "_SUCCESS"))
        ),
        key=_version_key,
    )
    doomed = committed[:-keep_last]
    for v in doomed:
        shutil.rmtree(os.path.join(state_dir, v), ignore_errors=True)
    return doomed


def sweep_applied_markers(
    spark, view_path: str, keep_last: int = 3
) -> list[str]:
    """Keep-last-k retention for the ``_applied/`` replay markers that
    ``apply_view_changes_pruned`` writes — the marker-side twin of
    ``sweep_state_versions`` (r13: the state versions got retention,
    but a months-long stream still lands one marker file per trigger
    forever, and the directory listing a filesystem must maintain for
    ``_applied/`` grows without bound).

    Same safety argument as the state sweep, because the marker's only
    job is replay protection: a re-delivered batch must still FIND its
    own marker, and foreachBatch's redelivery depth is 1 (only the
    failed trigger re-runs), so any ``keep_last`` > 1 keeps the skip
    behavior intact — a marker old enough to be swept belongs to a
    batch the checkpoint has durably committed past, which can never be
    re-delivered. Sweeping therefore changes no observable behavior on
    the non-crash path; the conservative default matches
    ``sweep_state_versions``. Ordering is by the NUMERIC tail of the
    marker name (the ``batch-{id}`` convention), for the same
    v10-sorts-before-v9 reason documented there.

    Goes through the Hadoop FileSystem (not ``os``) because markers
    are created via the Hadoop ``Path`` API and the view may live on
    any Hadoop-supported store. Returns the swept marker names
    (oldest first); a view with no ``_applied/`` dir is a no-op.
    """
    import re

    if keep_last < 1:
        raise ValueError(
            f"sweep_applied_markers: keep_last must be >= 1 (got "
            f"{keep_last}) — retention may never delete the newest "
            f"batch's marker (redelivery depth is at least 1)"
        )
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(f"{view_path}/_applied")
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return []

    def _marker_key(name: str) -> tuple[int, str]:
        m = re.search(r"(\d+)$", name)
        return (int(m.group(1)) if m else -1, name)

    # skip hidden entries (e.g. RawLocalFileSystem's .{name}.crc
    # checksum sidecars — deleting a marker through the checksum FS
    # reaps its sidecar automatically, so they never need sweeping)
    names = sorted(
        (
            st.getPath().getName()
            for st in fs.listStatus(root)
            if not st.getPath().getName().startswith((".", "_"))
        ),
        key=_marker_key,
    )
    doomed = names[:-keep_last]
    for n in doomed:
        p = jvm.org.apache.hadoop.fs.Path(f"{view_path}/_applied/{n}")
        fs.delete(p, False)
    return doomed


def apply_view_changes_pruned(
    spark,
    view_path: str,
    retract: DataFrame | None = None,
    inserts: DataFrame | None = None,
    bucket_col: str = "dmt_bucket",
    batch_marker: str | None = None,
    retract_anti_keys: list[str] | None = None,
) -> list:
    """Apply Δ⁻ retractions and Δ⁺ inserts to an ON-DISK view stored
    partitioned by a key-derived bucket column, rewriting ONLY the
    touched partitions — the r12 fix for the one O(view) pass left in
    the IVM family (VERDICT r11 #3: ``view.exceptAll(join_retract(…))``
    rewrote the whole view; SCALE.md r11 measured its second-decade
    exponent at 0.63 vs 0.46 for the insert-only path, the exceptAll
    being the delta).

    Contract: the view at ``view_path`` is parquet partitioned by
    ``bucket_col`` (any deterministic function of the view's join key
    — a date, ``key % n``, ``pmod(hash(key), n)``); ``retract`` and
    ``inserts`` carry the same schema INCLUDING ``bucket_col``. The
    touched-bucket set is derived from the deltas themselves (one
    bucket-grain distinct — |buckets| rows, collected because the
    overwrite decision is driver-side anyway); untouched partitions
    are NEVER read and never rewritten:

    * read ``view_path`` filtered to the touched buckets — a
      PARTITION-PRUNED scan (PartitionFilters at the file source, the
      untouched directories not even listed into the plan);
    * multiset-subtract Δ⁻ and append Δ⁺ on that slice only;
    * write back under ``partitionOverwriteMode=dynamic``, which
      replaces exactly the partitions present in the written frame —
      the touched ones — and leaves every other directory untouched
      on disk.

    The new slice is ``localCheckpoint``-materialized before the write
    (touched-partition-scale, not view-scale) because Spark refuses to
    overwrite a path it is concurrently reading. Cost is O(Δ +
    touched-partition rows) end to end, never O(view). Returns the
    sorted touched-bucket values (empty list → no-op, nothing read or
    written).

    Whole-bucket retraction trap: dynamic partition overwrite replaces
    only partitions PRESENT in the written frame, so a touched bucket
    whose rows are ALL retracted would silently keep its old files
    (caught building the r12 gate query — pb = orderkey % 30 made
    every delete-touched bucket empty and the apply became a no-op on
    them). Touched buckets absent from the new slice are therefore
    deleted explicitly through the Hadoop FS, which also keeps the
    "retract a whole day → drop that day's partition" case O(1).
    Exception (r13, ADVICE r12): a batch that would delete the LAST
    remaining data partition is refused with a RuntimeError before
    any deletion — an all-partitions-deleted parquet dir (only
    ``_applied/`` and ``_SUCCESS`` left) fails schema inference on
    the next read, so "maintained to empty" is not a representable
    on-disk state; drop the view path instead. The batch marker is
    not written on refusal, so a redelivery refuses identically.
    Bucket values must be partition-path-safe scalars (ints, dates,
    plain identifiers): the emptied-dir path is built as
    ``{bucket_col}={value}`` without Hadoop's percent-escaping, which
    a key-DERIVED bucket satisfies by construction.

    Replay protection: pass ``batch_marker`` (any stable id — a
    foreachBatch ``batch_id``) and the apply becomes SKIP-IF-SEEN: a
    marker file under ``<view_path>/_applied/`` is checked before any
    work and written after the overwrite commits, so a re-delivered
    batch (the at-least-once foreachBatch contract) is a no-op instead
    of double-appending its inserts. The residual window is a crash
    BETWEEN the overwrite and the marker write — the same window
    Spark's own foreachBatch idempotency guidance leaves; closing it
    entirely needs an append-only per-batch layout
    (``streaming/txn_sink.py``), which trades away the in-place
    partitioned view this operator exists to maintain.
    """
    marker = None
    if batch_marker is not None:
        jvm = spark._jvm
        hconf = spark._jsc.hadoopConfiguration()
        marker = jvm.org.apache.hadoop.fs.Path(
            f"{view_path}/_applied/{batch_marker}"
        )
        if marker.getFileSystem(hconf).exists(marker):
            return []

    def _mark() -> None:
        if marker is not None:
            fs = marker.getFileSystem(
                spark._jsc.hadoopConfiguration()
            )
            fs.create(marker, True).close()

    deltas = [d for d in (retract, inserts) if d is not None]
    if not deltas:
        _mark()
        return []
    from functools import reduce as _reduce

    # The delta plans are consumed TWICE (touched-bucket distinct, then
    # the slice rebuild) and are often expensive joins (join_retract /
    # join_delta terms, CDC ⋈ retained-side). Persist them for the span
    # of this call so the second consumer reads batch-scale cache
    # instead of re-running the join (r13 opt: guide §5 — reuse that
    # is cheaper than recompute; measured 1.4-2.5× per-trigger win on
    # the stream IVM queries). Delta frames are Δ-scale by contract,
    # so the cache is small; the finally releases it on every path,
    # including the empty-view refusal below.
    for d in deltas:
        d.persist()
    try:
        touched_df = _reduce(
            lambda a, b: a.unionByName(b),
            [d.select(bucket_col) for d in deltas],
        ).distinct()
        # NULL buckets (a key-derived bucket of a NULL join key) are a
        # legitimate touched value: sort them first explicitly (None
        # does not order against ints/strings), include them in the
        # pruned scan via isNull, and map them to Hive's
        # default-partition directory in the emptied-dir path below.
        touched = sorted(
            (r[0] for r in touched_df.collect()),
            key=lambda v: (v is not None, v if v is not None else 0),
        )
        if not touched:
            _mark()
            return []
        non_null = [v for v in touched if v is not None]
        pred = (
            F.col(bucket_col).isin(non_null) if non_null else F.lit(False)
        )
        if None in touched:
            pred = pred | F.col(bucket_col).isNull()
        cur = spark.read.parquet(view_path).filter(pred)
        new = cur
        if retract is not None:
            if retract_anti_keys:
                # WHOLE-KEY retraction (r13, guide §3.1): when the
                # caller guarantees the retraction removes EVERY view
                # row of each retracted key (CDC deleting whole
                # entities — the stream IVM contract), a broadcast
                # left-anti on the (batch-scale) distinct key set is
                # multiset-identical to the exceptAll and removes its
                # two-sided shuffle of the touched-bucket slice: the
                # slice streams map-side past the broadcast set. Keys
                # must be non-null (anti join NULL semantics would
                # retain NULL-keyed rows); the default exceptAll path
                # below stays the general contract and its oracle gate
                # (orders_join_ivm_retract_pruned exercises it).
                kd = retract.select(*retract_anti_keys).distinct()
                new = new.join(
                    F.broadcast(kd), retract_anti_keys, "left_anti"
                )
            else:
                new = new.exceptAll(retract.select(*cur.columns))
        if inserts is not None:
            new = new.unionByName(inserts.select(*cur.columns))
        new = new.localCheckpoint(eager=True)
        present = {
            r[0] for r in new.select(bucket_col).distinct().collect()
        }
        old_mode = spark.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # REBALANCE by the bucket before the dynamic overwrite
            # (r13 opt; guide §6 output sizing): without it every
            # write task holding rows of k touched buckets emits k
            # part files — n_tasks × |touched| small files that every
            # later pruned read, dynamic-overwrite commit, and
            # final-view scan re-pays in listing + open cost (the
            # stream IVM queries measured 640-file views at bench
            # scale). The AQE rebalance clusters rows by bucket at
            # the advisory partition size, so a bucket gets ~1 file
            # at test scale while an oversized bucket still SPLITS
            # across tasks instead of serializing into one straggler
            # writer (the guard against repartition(bucket)'s
            # one-task-per-bucket skew at 100 TB).
            new.hint("rebalance", bucket_col).write.mode(
                "overwrite"
            ).partitionBy(bucket_col).parquet(view_path)
        finally:
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", old_mode
            )
        emptied = [b for b in touched if b not in present]
        if emptied:
            jvm = spark._jvm
            hconf = spark._jsc.hadoopConfiguration()

            def _part_name(b) -> str:
                return (
                    "__HIVE_DEFAULT_PARTITION__" if b is None else str(b)
                )

            # Refuse to empty the view ENTIRELY (r13, ADVICE r12): a
            # partitioned parquet dir whose every data partition is
            # deleted keeps only _applied/ and _SUCCESS, and the next
            # spark.read.parquet(view_path) fails schema inference — an
            # unreadable on-disk state no maintenance call should
            # create. The marker is intentionally NOT written, so a
            # retry refuses identically instead of silently skipping.
            root = jvm.org.apache.hadoop.fs.Path(view_path)
            fs = root.getFileSystem(hconf)
            doomed = {f"{bucket_col}={_part_name(b)}" for b in emptied}
            survivors = [
                st.getPath().getName()
                for st in fs.listStatus(root)
                if st.isDirectory()
                and st.getPath().getName().startswith(f"{bucket_col}=")
                and st.getPath().getName() not in doomed
            ]
            if not survivors:
                raise RuntimeError(
                    f"apply_view_changes_pruned: this batch would "
                    f"retract the view's last remaining rows, leaving "
                    f"{view_path} with no data partitions — an empty "
                    f"partitioned parquet dir is unreadable (schema "
                    f"inference fails). Drop the view path instead of "
                    f"maintaining it to empty, or include the batch's "
                    f"inserts in the same apply."
                )
            for b in emptied:
                p = jvm.org.apache.hadoop.fs.Path(
                    f"{view_path}/{bucket_col}={_part_name(b)}"
                )
                p.getFileSystem(hconf).delete(p, True)
        _mark()
        return touched
    finally:
        for d in deltas:
            d.unpersist()
