"""Generate larger scale factors from the driver's sf0.1 tables for the
local scaling-curve measurement (round-5 verdict #2).

The driver testdata is read-only and capped at sf0.1 (~600k lineitem), so
the sf1.0 input used by ``tools/scale_curve.py`` is synthesized here: K
foreign-key-consistent copies of every scaling table, copy k living in its
own key range (every key column shifted by ``k * (max_key + 1)``) so join
fan-outs, group cardinalities, and referential integrity scale the way a
real 10x data growth would (10x customers each with the same order count —
not 10x orders piled onto the same customers).

Two tables get per-copy DECORRELATION so content-similarity workloads scale
linearly instead of artificially quadratically:

- ``documents.text``: for copy k > 0 the words are deterministically
  permuted (sort by ``hash(word, k, doc_id)``), so cross-copy shingle /
  minhash similarity collapses to background levels — 10 verbatim copies of
  every document would put each doc in a 10-clique and make near-dup
  pair-explosion dominate the curve for reasons unrelated to plan shape.
  (Real corpora do contain duplicate families; what they do NOT do is
  multiply every family size by exactly the scale factor.)
- ``embeddings.embedding``: each value is nudged by a deterministic
  per-copy, per-dimension offset (±0.005·k scale) so copies are not exact
  translates of one another.

``region`` and ``nation`` stay fixed (they are fixed-size in TPC-H too).
Events keep their time range (10x users in the same window — denser
streams, same watermark horizon).

Usage: python tools/make_scale_sf.py [K] [SRC_DIR] [OUT_DIR]
Defaults: K=10, SRC=/root/testdata/sf0.1, OUT=<repo>/.scale/sf1.0
Deterministic; safe to re-run (overwrites).
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def shifted_union(con, src: str, table: str, k: int, shifts: dict[str, str],
                  exprs: dict[str, str] | None = None) -> str:
    """UNION ALL of K copies with per-copy key shifts / expressions."""
    cols = [c[0] for c in con.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{src}/{table}.parquet')"
    ).fetchall()]
    parts = []
    for copy in range(k):
        sel = []
        for c in cols:
            if c in shifts:
                sel.append(f"{c} + {copy} * ({shifts[c]}) AS {c}")
            elif exprs and c in exprs:
                sel.append(exprs[c].format(k=copy) + f" AS {c}")
            else:
                sel.append(c)
        parts.append(
            f"SELECT {', '.join(sel)} "
            f"FROM read_parquet('{src}/{table}.parquet')"
        )
    return " UNION ALL ".join(parts)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else os.path.join(REPO, ".scale", "sf1.0")
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def off(table: str, key: str) -> str:
        (m,) = con.sql(
            f"SELECT max({key}) + 1 FROM read_parquet('{src}/{table}.parquet')"
        ).fetchone()
        return str(int(m))

    o_c, o_s, o_p = off("customer", "c_custkey"), off("supplier", "s_suppkey"), off("part", "p_partkey")
    o_o, o_e, o_u = off("orders", "o_orderkey"), off("events", "event_id"), off("events", "user_id")
    o_d, o_v = off("documents", "doc_id"), off("embeddings", "vec_id")

    jobs: dict[str, tuple[dict[str, str], dict[str, str] | None]] = {
        "customer": ({"c_custkey": o_c}, None),
        "supplier": ({"s_suppkey": o_s}, None),
        "part": ({"p_partkey": o_p}, None),
        "orders": ({"o_orderkey": o_o, "o_custkey": o_c}, None),
        "lineitem": (
            {"l_orderkey": o_o, "l_partkey": o_p, "l_suppkey": o_s}, None
        ),
        "events": ({"event_id": o_e, "user_id": o_u}, None),
        "documents": (
            {"doc_id": o_d},
            {
                # copy 0 verbatim; later copies word-permuted (decorrelated)
                "text": (
                    "CASE WHEN {k} = 0 THEN text ELSE array_to_string("
                    "list_transform(list_sort(list_transform("
                    "string_split(text, ' '), w -> lpad(CAST(hash(w || '#{k}#' "
                    "|| CAST(doc_id AS VARCHAR)) % 1000000000 AS VARCHAR), 10, "
                    "'0') || '|' || w)), s -> s[12:]), ' ') END"
                ),
                "n_chars": (
                    "CASE WHEN {k} = 0 THEN n_chars ELSE CAST(strlen("
                    "array_to_string(list_transform(list_sort(list_transform("
                    "string_split(text, ' '), w -> lpad(CAST(hash(w || '#{k}#' "
                    "|| CAST(doc_id AS VARCHAR)) % 1000000000 AS VARCHAR), 10, "
                    "'0') || '|' || w)), s -> s[12:]), ' ')) AS BIGINT) END"
                ),
            },
        ),
        "embeddings": (
            {"vec_id": o_v},
            {
                "embedding": (
                    "list_transform(embedding, (x, i) -> CAST(x + 0.0005 * {k} "
                    "* (CAST(i % 11 AS DOUBLE) - 5) AS FLOAT))"
                ),
            },
        ),
    }

    for table in ("region", "nation"):
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{src}/{table}.parquet')) TO "
            f"'{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"{table}: copied")
    for table, (shifts, exprs) in jobs.items():
        q = shifted_union(con, src, table, k, shifts, exprs)
        con.sql(f"COPY ({q}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        (n,) = con.sql(
            f"SELECT count(*) FROM read_parquet('{out}/{table}.parquet')"
        ).fetchone()
        print(f"{table}: {n} rows")
    print("done:", out)


if __name__ == "__main__":
    main()
