#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (builder prompt):
runs graft.Verify output against DuckDB oracles and hash-compares.

Usage: python3 tools/oracle_check.py [sfDir] [outDir]
(Development aid only — the real gate is driver-side.)
"""
import duckdb, glob, json, math, os, sys

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for p in sorted(glob.glob(f"{sfdir}/*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))


def canon(df):
    cols = sorted(df.columns)
    rows = []
    for _, r in df[cols].iterrows():
        row = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    row.append("NaN")
                else:
                    row.append(repr(v))
            else:
                row.append(str(v))
        rows.append("\x01".join(row))
    rows.sort()
    return cols, rows


fails = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{outdir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    gc, gr = canon(got)
    wc, wr = canon(want)
    if gc != wc:
        print(f"FAIL {name}: schema {gc} != {wc}")
        fails += 1
    elif gr != wr:
        diff = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
        print(f"FAIL {name}: rows {len(gr)} vs {len(wr)}; first diffs: {diff}")
        fails += 1
    else:
        print(f"OK   {name} ({len(gr)} rows)")

# queries without an oracle: rows-only check
for name in sorted(os.listdir(outdir)):
    d = f"{outdir}/{name}"
    if os.path.isdir(d) and name not in oracle:
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
        print(f"ROWS {name}: {n}")

sys.exit(1 if fails else 0)
