"""Bad-record quarantine for semi-structured loads (CSV / JSON).

The reference tolerates malformed input at load time rather than
failing the job (``ignore_unknown_values=True`` on its BigQuery row
inserts, ``common_utils/bigquery_client_utils/utils.py:14``; BQ batch
loads expose the same idea as ``max_bad_records``). The Spark-first
equivalent: read PERMISSIVE with a corrupt-record column, split the
frame into good rows and quarantined raw lines, persist the quarantine
for replay/debugging, and fail loudly only past a declared threshold.

Scale: one pass over the input — the corrupt-record column is populated
by the same scan that parses good rows; the split is two filters over a
cached frame, not two reads. The quarantine write is O(bad rows).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


@dataclass(frozen=True)
class QuarantineResult:
    good: DataFrame
    n_good: int
    n_bad: int
    quarantine_path: str | None


class BadRecordThresholdExceeded(RuntimeError):
    pass


def read_with_quarantine(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema_ddl: str,
    quarantine_dir: str | None = None,
    max_bad_records: int = 0,
    delimiter: str | None = None,
    header: bool = False,
) -> QuarantineResult:
    """Read CSV/JSON with an explicit schema, quarantining rows that
    fail to parse instead of nulling them silently or failing the scan.

    - good rows: every column parsed, ``CORRUPT_COL`` is NULL.
    - bad rows: the raw line lands in ``CORRUPT_COL``; written verbatim
      as text to ``quarantine_dir`` (one line per bad record) so the
      load can be replayed after a fix.
    - ``max_bad_records``: hard gate, the reference's bad-record budget;
      exceeding it raises after the quarantine is persisted (debugging
      evidence survives the failure).
    """
    if fmt not in ("csv", "json"):
        raise ValueError(f"quarantine reader supports csv/json, got {fmt!r}")
    schema = f"{schema_ddl}, {CORRUPT_COL} STRING"
    reader = (
        spark.read.format(fmt)
        .schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if fmt == "csv":
        reader = reader.option("header", str(header).lower())
        if delimiter:
            reader = reader.option("sep", delimiter)
    df = reader.load(path)

    # One underlying scan serves both filters.
    df = df.cache()
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)

    n_bad = bad.count()
    written = None
    if n_bad and quarantine_dir:
        bad.write.mode("overwrite").text(quarantine_dir)
        written = quarantine_dir
    n_good = good.count()
    if n_bad > max_bad_records:
        df.unpersist()
        raise BadRecordThresholdExceeded(
            f"{n_bad} bad records in {path} exceeds max_bad_records="
            f"{max_bad_records}"
            + (f" (quarantined at {written})" if written else "")
        )
    return QuarantineResult(
        good=good, n_good=n_good, n_bad=n_bad, quarantine_path=written
    )
