#!/usr/bin/env python3
"""Build a hostile copy of a testdata SF dir: every table gets four
adversarial-but-schema-valid rows appended to the real data.

Usage: python3 tools/hostile_fixture.py <srcSfDir> <dstDir>

Row kinds (mirroring CatalogRobustnessSpec's hostile arm):
  - nulls: every column NULL (a broken upstream record);
  - zeros: "" strings, 0 numerics, epoch timestamps, empty arrays;
  - junk:  whitespace-and-truncated-JSON strings, -1 ids, NaN measures,
           a zero vector;
  - exotic: multibyte/astral text (RTL, zero-width, combining marks,
           CRLF) — the char-vs-byte / regex / hashing divergence class
           (recorded clean: no engine disagrees on any of it).

Lets the FULL driver gate (Verify + selfcheck) be replayed against
poisoned data, measuring not just that the engine survives (the spec
pins that) but where the two engines' semantics diverge off-contract:

    python3 tools/hostile_fixture.py /root/testdata/sf0.001 /tmp/hostile001
    SPARK_GRAFT_CPUS=8 sbt "runMain graft.Verify /tmp/hostile001 /tmp/v_h"
    python3 tools/selfcheck.py /tmp/hostile001 /tmp/v_h

Recorded 2026-08-14 (round 14): 101 pass / 0 fail at BOTH sf0.001 and
sf0.01. The round-13 divergence (100/101: m4's static oracle enumerated
the clean fixture's category domain while the engine's one-hot fit
DISCOVERS it, sklearn-style) is closed — Verify now overlays a
fit-time-aware m4 oracle regenerated from the observed domain
(SparkEntry.oracleSqlDynamic / m4OracleFor, same capped rule the encoder
fits with), so a junk category grows the same indicator column on both
sides. Known oracle-engine
(DuckDB 1.0.0) limitations this replay must route around, all verified
against constant-fold behavior: vectorized NaN comparisons are
inconsistent (hence explicit isnan branches in oracles), grouped ORDER BY
ignores default_null_order and can missort a NULL timestamp group even
under an explicit NULLS FIRST (hence no-bucket-for-NULL-time semantics),
and STDDEV errors outright on NaN input (hence the isfinite fit guards,
which are also the engine's semantics).
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Deliberately POST-epoch (unlike CatalogRobustnessSpec's pre-epoch junk):
# DuckDB 1.0.0 missorts zero/negative-epoch timestamps relative to NULL in
# grouped ORDER BYs (and ignores default_null_order there), so a pre-epoch
# row makes the ORACLE's ordering wrong, not the engine's. The pre-epoch
# floor semantics stay covered by TablesSpec + the engine-side spec, where
# no DuckDB sort is involved.
ZEROS_US = 86_400_000_000       # 1970-01-02
JUNK_US = 13_046_400_000_000    # 1970-06-01

# exotic arm: multibyte/astral text with RTL + zero-width + combining
# marks + CRLF — the class where char-vs-byte length, regex splitting,
# and hashing could diverge between engines
EXOTIC_TEXT = "مرحبا \U0001D518\U0001D52B​ é\r\nfin"

def hostile(name, typ, kind):
    if kind == "nulls":
        return None
    if kind == "exotic":
        if pa.types.is_string(typ):
            return EXOTIC_TEXT
        kind = "zeros"  # non-string columns: plain benign values
        if name.endswith("_id") or "key" in name:
            return -3
    # id/key columns get UNIQUE sentinels (-2/-1, disjoint from the real
    # non-negative key space): a hostile id that collides with a real one
    # (e.g. 0) makes tie order and per-key partitions ill-defined, so the
    # two engines can disagree on rows the QUERY semantics don't pin down
    is_key = name.endswith("_id") or "key" in name
    if pa.types.is_string(typ):
        return "" if kind == "zeros" else " \t\n {"
    if pa.types.is_integer(typ):
        if is_key:
            return -2 if kind == "zeros" else -1
        return 0 if kind == "zeros" else -1
    if pa.types.is_floating(typ):
        return 0.0 if kind == "zeros" else float("nan")
    if pa.types.is_decimal(typ):
        # decimals carry no NaN — negative stands in as the junk value, so
        # the tool also composes with retype_fixture.py's `decimal` arm
        import decimal
        return decimal.Decimal(0) if kind == "zeros" else decimal.Decimal(-1)
    if pa.types.is_timestamp(typ):
        return ZEROS_US if kind == "zeros" else JUNK_US
    if pa.types.is_list(typ):
        return [] if kind == "zeros" else [0.0] * 64
    raise SystemExit(f"no hostile {kind} value for {typ}")

def main(src, dst):
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        cols = []
        for f in tbl.schema:
            vals = [hostile(f.name, f.type, k)
                    for k in ("nulls", "zeros", "junk", "exotic")]
            if pa.types.is_timestamp(f.type):
                cols.append(pa.array(vals, type=pa.timestamp("us")).cast(f.type))
            else:
                cols.append(pa.array(vals, type=f.type))
        extra = pa.table(dict(zip(tbl.column_names, cols)), schema=tbl.schema)
        pq.write_table(pa.concat_tables([tbl, extra]), f"{dst}/{t}.parquet")
        print(f"[hostile] {t}: {tbl.num_rows} real + 4 hostile rows")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
