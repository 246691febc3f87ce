#!/usr/bin/env python
"""Canonical row dump for cross-engine diffing.

For each named query (default: the historically hash-flaky set) this
writes ``ROWDUMP_<query>.json`` at the repo root containing BOTH engines'
results in the gate's canonical form — columns sorted by name, rows
sorted as strings, every value stringified with type tags — so a driver
hash mismatch can be diffed value-by-value instead of guessed at.

Usage: python tools/dump_rows.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_migration_tool_spark.session import get_spark  # noqa: E402
from data_migration_tool_spark.tables import TPCH_TABLES, table_path  # noqa: E402

DEFAULT_QUERIES = [
    "q2_min_cost_supplier",
    "q12_late_shipment_priority",
    "returnflag_pivot",
    "orders_partition_checksums",
]


def typed(v) -> str:
    """Canonical string WITH a python-type tag, so float-vs-Decimal and
    str-vs-bytes differences are visible, not collapsed."""
    if v is None:
        return "NULL"
    tag = type(v).__name__
    if isinstance(v, float):
        return f"{tag}:{v!r}"
    if isinstance(v, decimal.Decimal):
        return f"{tag}:{v}"
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"{tag}:{v.isoformat()}"
    if isinstance(v, (list, tuple)):
        return f"{tag}:[" + ",".join(typed(x) for x in v) + "]"
    return f"{tag}:{v}"


def dump_side(cols: list[str], rows: list[tuple]) -> dict:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        [typed(r[i]) for i in order] for r in rows
    )
    return {"columns": [cols[i] for i in order], "rows": lines}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT_QUERIES

    import __spark_entry__ as ent

    qs = ent.queries()
    oracles = ent.oracle_sql()

    spark = get_spark(app_name="dmt-rowdump")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TPCH_TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in names:
        out = {"query": name, "sf_dir": sf_dir}
        sdf = qs[name](spark, sf_dir)
        out["spark"] = dump_side(sdf.columns, [tuple(r) for r in sdf.collect()])
        if name in oracles:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            out["oracle"] = dump_side(ocols, cur.fetchall())
        path = os.path.join(root, f"ROWDUMP_{name}.json")
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
        print("wrote", path)


if __name__ == "__main__":
    main()
