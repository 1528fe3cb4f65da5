"""Replica of the driver's correctness gate: run every registered query on
Spark and its DuckDB oracle on the same parquet, compare row count, column
names, and order-insensitive value content. Catches oracle drift before the
driver does (at sf0.001 for speed; the driver uses sf0.01)."""

from __future__ import annotations

import math

import duckdb
import pytest

from etl_lala_spark.io import TABLES, table_path
from etl_lala_spark.plans import all_queries

QUERIES = all_queries()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def normalize(rows, cols):
    """Sort columns by name, normalize values, return a sortable multiset."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 9)
                    if v == 0:
                        v = 0.0  # collapse -0.0
            vals.append(repr(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    if q.oracle is None:
        # rows-only: the driver records the weaker check; assert it runs.
        assert isinstance(srows, list)
        return

    con = duck_con(sf_dir)
    res = con.execute(q.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), f"{name}: column names differ"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} != {len(orows)}"
    snorm, onorm = normalize(srows, scols), normalize(orows, ocols)
    mismatch = [(a, b) for a, b in zip(snorm, onorm) if a != b][:5]
    assert snorm == onorm, f"{name}: value mismatch, first diffs: {mismatch}"
