from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as ent


def test_entry_smoke(spark):
    df = ent.entry(spark)
    assert df.count() > 0
    assert "sum_qty" in df.columns


def test_queries_and_oracles_aligned():
    qs = ent.queries()
    os_ = ent.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 14


def test_all_queries_run_sf0001(spark):
    for name, builder in ent.queries().items():
        df = builder(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name
