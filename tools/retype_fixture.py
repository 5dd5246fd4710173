#!/usr/bin/env python3
"""Build a re-typed copy of a testdata SF dir to rehearse fixture drift.

Usage: python3 tools/retype_fixture.py <srcSfDir> <dstDir> [date|timestamp|nanos|embdouble]

The r10->r11 testdata regeneration silently flipped physical types
(TIMESTAMP(NANOS) -> TIMESTAMP_NTZ) and killed 7 queries at plan time;
Tables.normalizeTs/normalizeDate now canonicalize every shape. This tool
rehearses the NEXT flip end-to-end, so the full driver gate can be
replayed against a drifted copy:

  - date (default) / timestamp: orders.o_orderdate and lineitem.l_shipdate
    re-typed to DATE / tz-adjusted TIMESTAMP (via DuckDB; TIMESTAMPTZ
    writes isAdjustedToUTC=true micros -> Spark TimestampType);
  - nanos: those two PLUS events.ts re-typed to TIMESTAMP(NANOS) (via
    pyarrow — DuckDB downgrades NS to micros on parquet write), i.e. the
    full REVERSION to the round-<=10 fixture shape;
  - embdouble: embeddings.embedding re-typed FLOAT[] -> DOUBLE[]
    (value-preserving widening; Tables.normalizeEmbedding casts it back,
    exactly, so the similarity family stays green).

Every other table is symlinked. Replay:

    python3 tools/retype_fixture.py /root/testdata/sf0.001 /tmp/retyped001
    SPARK_GRAFT_CPUS=8 sbt "runMain graft.Verify /tmp/retyped001 /tmp/v_re"
    python3 tools/selfcheck.py /tmp/retyped001 /tmp/v_re   # expect 0 fail

(Recorded green for all four arms at round 13: 101 pass / 0 fail each.)
"""
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
RETYPED = {"orders": "o_orderdate", "lineitem": "l_shipdate"}
NANOS_RETYPED = dict(RETYPED, events="ts")
EMB_RETYPED = {"embeddings": "embedding"}
CASTS = {"date": "DATE", "timestamp": "TIMESTAMPTZ", "embdouble": "DOUBLE[]"}


def retype_nanos(src_file, dst_file, col):
    t = pq.read_table(src_file)
    i = t.column_names.index(col)
    t = t.set_column(i, col, t.column(col).cast(pa.timestamp("ns")))
    pq.write_table(t, dst_file, version="2.6", coerce_timestamps=None)


def main(src, dst, retype="date"):
    arms = ("date", "timestamp", "nanos", "embdouble")
    if retype not in arms:  # validate BEFORE creating dst — a typo'd arm
        print(f"unknown retype arm {retype!r}; expected one of {arms}",
              file=sys.stderr)  # must not leave a half-built fixture dir
        return 1
    retyped = {"nanos": NANOS_RETYPED, "embdouble": EMB_RETYPED}.get(retype, RETYPED)
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")  # naive->TZ cast must re-label, not shift
    for t in TABLES:
        s, d = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
        if os.path.exists(d):
            print(f"refusing to overwrite {d}", file=sys.stderr)
            return 1
        if t in retyped:
            c = retyped[t]
            if retype == "nanos":
                retype_nanos(s, d, c)
                print(f"{t}.{c} -> TIMESTAMP(NANOS)")
            else:
                con.execute(f"COPY (SELECT * REPLACE (CAST({c} AS {CASTS[retype]}) AS {c}) "
                            f"FROM read_parquet('{s}')) TO '{d}' (FORMAT PARQUET)")
                print(f"{t}.{c} -> {CASTS[retype]}")
        else:
            os.symlink(s, d)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else "date"))
