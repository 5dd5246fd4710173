#!/usr/bin/env python3
"""Build a re-typed copy of a testdata SF dir to rehearse fixture drift.

Usage: python3 tools/retype_fixture.py <srcSfDir> <dstDir> \
    [date|timestamp|nanos|embdouble|decimal|intflip]

The r10->r11 testdata regeneration silently flipped physical types
(TIMESTAMP(NANOS) -> TIMESTAMP_NTZ) and killed 7 queries at plan time;
Tables.normalize{Ts,Date,Embedding,Numeric} now canonicalize every shape.
This tool rehearses the NEXT flip end-to-end, so the full driver gate can
be replayed against a drifted copy:

  - date (default) / timestamp: orders.o_orderdate and lineitem.l_shipdate
    re-typed to DATE / tz-adjusted TIMESTAMP (via DuckDB; TIMESTAMPTZ
    writes isAdjustedToUTC=true micros -> Spark TimestampType);
  - nanos: those two PLUS events.ts re-typed to TIMESTAMP(NANOS) (via
    pyarrow — DuckDB downgrades NS to micros on parquet write), i.e. the
    full REVERSION to the round-<=10 fixture shape;
  - embdouble: embeddings.embedding re-typed FLOAT[] -> DOUBLE[]
    (value-preserving widening; Tables.normalizeEmbedding casts it back,
    exactly, so the similarity family stays green);
  - decimal: every measure column re-typed DOUBLE -> DECIMAL(15,2), the
    TPC-H-spec shape a generator unification would plausibly ship
    (Tables.normalizeNumeric casts back to double; the oracle prelude
    casts the DuckDB side identically);
  - intflip: every integer column's width flipped (int32 -> BIGINT,
    int64 -> INTEGER — exact at test SFs), the unification drift
    (Tables.normalizeNumeric casts widths back to canonical).

Every other table is symlinked, so arms can be CHAINED (src = a previous
arm's dst) to rehearse combined drift. Replay:

    python3 tools/retype_fixture.py /root/testdata/sf0.001 /tmp/retyped001
    SPARK_GRAFT_CPUS=8 sbt "runMain graft.Verify /tmp/retyped001 /tmp/v_re"
    python3 tools/selfcheck.py /tmp/retyped001 /tmp/v_re   # expect 0 fail

(Recorded green for all arms at round 13, and three more times by the
full gate during round 14: 101 pass / 0 fail each, every run.)
"""
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

DEC = "DECIMAL(15,2)"
# arm -> table -> {column: duckdb type}; "nanos" entries use the pyarrow
# TIMESTAMP(NANOS) path instead of a DuckDB CAST (DuckDB downgrades NS on
# parquet write), marked with the sentinel type "NANOS".
ARMS = {
    "date": {"orders": {"o_orderdate": "DATE"},
             "lineitem": {"l_shipdate": "DATE"}},
    "timestamp": {"orders": {"o_orderdate": "TIMESTAMPTZ"},
                  "lineitem": {"l_shipdate": "TIMESTAMPTZ"}},
    "nanos": {"orders": {"o_orderdate": "NANOS"},
              "lineitem": {"l_shipdate": "NANOS"},
              "events": {"ts": "NANOS"}},
    "embdouble": {"embeddings": {"embedding": "DOUBLE[]"}},
    "decimal": {"customer": {"c_acctbal": DEC},
                "supplier": {"s_acctbal": DEC},
                "part": {"p_retailprice": DEC},
                "orders": {"o_totalprice": DEC},
                "lineitem": {c: DEC for c in
                             ("l_quantity", "l_extendedprice",
                              "l_discount", "l_tax")}},
    "intflip": {"region": {"r_regionkey": "BIGINT"},
                "nation": {"n_nationkey": "BIGINT", "n_regionkey": "BIGINT"},
                "customer": {"c_custkey": "INTEGER", "c_nationkey": "BIGINT"},
                "supplier": {"s_suppkey": "INTEGER", "s_nationkey": "BIGINT"},
                "part": {"p_partkey": "INTEGER", "p_size": "BIGINT"},
                "orders": {"o_orderkey": "INTEGER", "o_custkey": "INTEGER"},
                "lineitem": {"l_orderkey": "INTEGER", "l_partkey": "INTEGER",
                             "l_suppkey": "INTEGER", "l_linenumber": "BIGINT"},
                "events": {"event_id": "INTEGER", "user_id": "INTEGER"},
                "documents": {"doc_id": "INTEGER", "n_chars": "INTEGER"},
                "embeddings": {"vec_id": "INTEGER", "label": "BIGINT"}},
}


def retype_nanos(src_file, dst_file, cols):
    t = pq.read_table(src_file)
    for col in cols:
        i = t.column_names.index(col)
        t = t.set_column(i, col, t.column(col).cast(pa.timestamp("ns")))
    pq.write_table(t, dst_file, version="2.6", coerce_timestamps=None)


def main(src, dst, retype="date"):
    if retype not in ARMS:  # validate BEFORE creating dst — a typo'd arm
        print(f"unknown retype arm {retype!r}; expected one of {tuple(ARMS)}",
              file=sys.stderr)  # must not leave a half-built fixture dir
        return 1
    retyped = ARMS[retype]
    # Pre-scan EVERY dst path before writing anything — a mid-loop bail
    # after earlier tables were written would leave dst a mixed half-built
    # fixture dir (same never-half-built rule as the arm validation above).
    stale = [f"{dst}/{t}.parquet" for t in TABLES
             if os.path.lexists(f"{dst}/{t}.parquet")]
    if stale:
        print("refusing to overwrite: " + ", ".join(stale), file=sys.stderr)
        return 1
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")  # naive->TZ cast must re-label, not shift
    for t in TABLES:
        s, d = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
        cols = retyped.get(t)
        if cols:
            if "NANOS" in cols.values():
                retype_nanos(s, d, list(cols))
                print(f"{t}.{','.join(cols)} -> TIMESTAMP(NANOS)")
            else:
                repl = ", ".join(f"CAST({c} AS {ty}) AS {c}"
                                 for c, ty in cols.items())
                con.execute(f"COPY (SELECT * REPLACE ({repl}) "
                            f"FROM read_parquet('{s}')) TO '{d}' (FORMAT PARQUET)")
                print(f"{t}: " + ", ".join(f"{c} -> {ty}" for c, ty in cols.items()))
        else:
            os.symlink(os.path.realpath(s), d)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else "date"))
