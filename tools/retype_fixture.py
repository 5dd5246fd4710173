#!/usr/bin/env python3
"""Build a re-typed copy of a testdata SF dir to rehearse fixture drift.

Usage: python3 tools/retype_fixture.py <srcSfDir> <dstDir> [date|timestamp]

The r10->r11 testdata regeneration silently flipped physical types
(TIMESTAMP(NANOS) -> TIMESTAMP_NTZ) and killed 7 queries at plan time;
Tables.normalizeTs/normalizeDate now canonicalize every shape. This tool
rehearses the NEXT flip end-to-end: it re-types orders.o_orderdate and
lineitem.l_shipdate to DATE (default) or tz-adjusted TIMESTAMP and
symlinks every other table, so the full driver gate can be replayed
against the drifted copy:

    python3 tools/retype_fixture.py /root/testdata/sf0.001 /tmp/retyped001
    SPARK_GRAFT_CPUS=8 sbt "runMain graft.Verify /tmp/retyped001 /tmp/v_re"
    python3 tools/selfcheck.py /tmp/retyped001 /tmp/v_re   # expect 0 fail

(Recorded green for both arms at round 13: 101 pass / 0 fail.)
"""
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
RETYPED = {"orders": "o_orderdate", "lineitem": "l_shipdate"}
# TIMESTAMPTZ writes isAdjustedToUTC=true micros -> Spark TimestampType,
# the other realistic drift arm (DATE is the first)
CASTS = {"date": "DATE", "timestamp": "TIMESTAMPTZ"}


def main(src, dst, retype="date"):
    cast = CASTS[retype]
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")  # naive->TZ cast must re-label, not shift
    for t in TABLES:
        s, d = f"{src}/{t}.parquet", f"{dst}/{t}.parquet"
        if os.path.exists(d):
            print(f"refusing to overwrite {d}", file=sys.stderr)
            return 1
        if t in RETYPED:
            c = RETYPED[t]
            con.execute(f"COPY (SELECT * REPLACE (CAST({c} AS {cast}) AS {c}) "
                        f"FROM read_parquet('{s}')) TO '{d}' (FORMAT PARQUET)")
            print(f"{t}.{c} -> {cast}")
        else:
            os.symlink(s, d)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else "date"))
