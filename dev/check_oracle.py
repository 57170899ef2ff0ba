#!/usr/bin/env python3
"""Dev-only harness approximating the driver's correctness gate.

NOT part of the shipped library (the engine is pure Scala/Spark). Runs each
oracle SQL from Verify's oracle_sql.json in DuckDB over the same parquet
tables, loads the Spark result parquet, sorts columns by name and rows by
value, and compares cell-by-cell. Reports exact mismatches and float deltas
so float-hash risk is visible before the driver runs.

Usage: python3 dev/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(f)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = os.path.join(outdir, name)
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    try:
        got = con.sql(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} vs {wc}"); fails += 1; continue
    got, want = got[gc], want[gc]
    gt = [str(t) for t in got.dtypes]; wt = [str(t) for t in want.dtypes]
    if gt != wt:
        print(f"WARN {name}: dtypes {list(zip(gc, gt, wt))}")
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails += 1; continue
    g = got.sort_values(by=gc, na_position="first").reset_index(drop=True)
    w = want.sort_values(by=gc, na_position="first").reset_index(drop=True)
    bad = 0; max_delta = 0.0
    for c in gc:
        for a, b in zip(g[c], w[c]):
            na, nb = a != a, b != b  # NaN/NaT check
            try:
                na = na or a is None; nb = nb or b is None
            except Exception:
                pass
            if na and nb:
                continue
            if na != nb or (not isinstance(a, float) and a != b):
                bad += 1
                if bad <= 3: print(f"  {name}.{c}: {a!r} != {b!r}")
            elif isinstance(a, float) and a != b:
                d = abs(a - b)
                max_delta = max(max_delta, d)
                bad += 1
                if bad <= 3: print(f"  {name}.{c}: float {a!r} != {b!r} (d={d})")
    if bad:
        print(f"FAIL {name}: {bad} mismatched cells (max float delta {max_delta})")
        fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
