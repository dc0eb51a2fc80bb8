"""Replicates the driver's correctness gate locally: every entry in
``__spark_entry__.queries()`` runs on Spark AND its ``oracle_sql()`` twin
runs on DuckDB over the same parquet tables; the row multisets must match
exactly (names, values, counts). Runs at sf0.001 for speed — the driver
repeats this at sf0.01."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(str(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_matches_oracle(spark, con, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        # rows-only contract entry (non-SQL-expressible): must execute and
        # have a stable schema
        df = q(spark, SF_DIR)
        assert df.columns
        assert df.count() >= 0
        return
    sdf = q(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    rel = con.sql(sql)
    drows = rel.fetchall()
    dcols = [d[0] for d in rel.description]
    assert sorted(scols) == sorted(dcols), (scols, dcols)
    got = normalize(srows, scols)
    want = normalize(drows, dcols)
    assert len(got) == len(want), (len(got), len(want))
    assert got == want, (got[:3], want[:3])


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["subj", "label"]
