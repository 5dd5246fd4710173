#!/usr/bin/env python3
"""Dev-only self-check: mimic the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <out>/<query>/ parquet written by graft.Verify, runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB (views over the same parquet
tables), sorts columns by name, and compares values exactly.
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import pyarrow.dataset as ds

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # every Spark entrypoint pins spark.sql.session.timeZone=UTC (the
    # normalizeTs/normalizeDate contract); pin the oracle session too, or a
    # non-UTC host would shift TIMESTAMPTZ fixtures (the retype_fixture
    # "timestamp" drift arm) instant->wall-clock by the local offset in
    # every CAST/date_trunc and fail the compare spuriously
    con.execute("SET TimeZone='UTC'")
    # engine ordering convention: NULL keys sort FIRST under ascending
    # ORDER BY (Spark's asc default). On the real fixture no sort key is
    # ever NULL so this is inert for the driver's compare; it matters when
    # replaying the gate against tools/hostile_fixture.py's poisoned copy,
    # where DuckDB's nulls-last default would shift every group ordering.
    con.execute("SET default_null_order='nulls_first'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # A query that died at PLAN time never writes a parquet dir; iterating
    # only oracle_sql.json keys would still catch it (no spark output), but
    # a rows-only query (no oracle entry) that breaks would vanish entirely.
    # Verify dumps every failure to errors.json — surface each as a FAIL so
    # a casual selfcheck can't report green over plan-time breakage.
    try:
        errors = json.load(open(f"{out_dir}/errors.json"))
    except FileNotFoundError:
        errors = {}
    for name, msg in sorted(errors.items()):
        print(f"FAIL {name}: Verify recorded a failure: {msg}")
        n_fail += 1
    for name, sql in sorted(oracles.items()):
        if name in errors:
            continue  # already reported above with Verify's own message
        try:
            spark_tbl = ds.dataset(f"{out_dir}/{name}").to_table()
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
        try:
            duck_tbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        sc = sorted(spark_tbl.column_names)
        dc = sorted(duck_tbl.column_names)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}"); n_fail += 1; continue
        if spark_tbl.num_rows != duck_tbl.num_rows:
            print(f"FAIL {name}: rows spark={spark_tbl.num_rows} duck={duck_tbl.num_rows}")
            n_fail += 1; continue
        srows = list(zip(*[spark_tbl.column(c).to_pylist() for c in sc]))
        drows = list(zip(*[duck_tbl.column(c).to_pylist() for c in sc]))
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows))
               if tuple(map(norm, a)) != tuple(map(norm, b))]
        # dtype check (driver checks schema match)
        stypes = {c: str(spark_tbl.schema.field(c).type) for c in sc}
        dtypes = {c: str(duck_tbl.schema.field(c).type) for c in sc}
        tdiff = {c: (stypes[c], dtypes[c]) for c in sc if stypes[c] != dtypes[c]}
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(srows)} mismatched rows; first: "
                  f"row {bad[0][0]} spark={bad[0][1]} duck={bad[0][2]}  cols={sc}")
            n_fail += 1
        elif tdiff:
            print(f"WARN {name}: values match but dtypes differ: {tdiff}")
            n_pass += 1
        else:
            print(f"PASS {name} ({spark_tbl.num_rows} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
