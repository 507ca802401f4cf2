#!/usr/bin/env python3
"""Local driver-mimic correctness check (dev loop only; NOT shipped code).

Usage: python3 scripts/check.py [outdir] [sfdir] [--only a,b | --skip a,b]
Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` has already run.
--only/--skip restrict which oracle queries run (resume support for
long scale-rehearsal gates); the rows-only and completeness passes
are restricted to the same subset.
Registers each testdata parquet as a DuckDB view named after the
table, runs every oracle_sql.json entry, and compares with the Spark
parquet dump: columns sorted by name, rows sorted, exact value match
(floats compared exactly after both sides' own round()s — mirrors a
hash compare).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

args = sys.argv[1:]
only = skip = None
if "--only" in args:
    i = args.index("--only"); only = set(args[i + 1].split(",")); del args[i:i + 2]
if "--skip" in args:
    i = args.index("--skip"); skip = set(args[i + 1].split(",")); del args[i:i + 2]
outdir = args[0] if len(args) > 0 else "/tmp/graft_verify"
sfdir = args[1] if len(args) > 1 else "/root/testdata/sf0.01"

def selected(name):
    return (only is None or name in only) and (skip is None or name not in skip)

con = duckdb.connect()
try:  # the sf1 gate's dedup oracles are minutes-long; use the box
    import os
    con.sql(f"SET threads={os.cpu_count()}")
except Exception:
    pass
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

n_pass = n_fail = 0
for name, sql in sorted(oracle.items()):
    if not selected(name):
        continue
    try:
        got = pd.read_parquet(glob.glob(f"{outdir}/{name}/*.parquet")[0])
    except Exception as e:
        print(f"FAIL {name}: no spark output ({e})"); n_fail += 1; continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
    g, x = norm(got.copy()), norm(exp.copy())
    if list(g.columns) != list(x.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(x.columns)}"); n_fail += 1; continue
    # dtype-family audit: a DuckDB HUGEINT→float64 against a Spark int64
    # may hash differently in the real driver even when values compare equal
    fam = lambda d: ("int" if "int" in str(d) else "float" if "float" in str(d) else str(d))
    bad_dt = [c for c in g.columns if fam(g[c].dtype) != fam(x[c].dtype)]
    if bad_dt:
        print(f"FAIL {name}: dtype mismatch {[(c, str(g[c].dtype), str(x[c].dtype)) for c in bad_dt]}")
        n_fail += 1; continue
    if len(g) != len(x):
        print(f"FAIL {name}: rows {len(g)} vs {len(x)}"); n_fail += 1; continue
    bad = None
    for c in g.columns:
        a, b = g[c], x[c]
        try:
            if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
                eq = ((a == b) | (a.isna() & b.isna())).all()
            else:
                eq = a.astype(object).where(pd.notna(a), None).equals(
                     b.astype(object).where(pd.notna(b), None))
        except Exception:
            eq = False
        if not eq:
            bad = c
            break
    if bad:
        # NaN-aware diff mask (plain != flags both-NaN pairs, inflating
        # the count and burying the genuinely differing rows)
        a, b = g[bad], x[bad]
        if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
            diff = ~((a == b) | (a.isna() & b.isna()))
        else:
            # object-dtype == treats None==None as unequal, so make the
            # mask null-aware explicitly for the non-float branch too
            ao = a.astype(object).where(pd.notna(a), None)
            bo = b.astype(object).where(pd.notna(b), None)
            diff = ~((ao == bo) | (a.isna() & b.isna()))
        print(f"FAIL {name}: col {bad} mismatch ({int(diff.sum())} rows); e.g.")
        idx = diff[diff].index[:3]
        for i in idx:
            print(f"   row {i}: spark={g[bad][i]!r} oracle={x[bad][i]!r}")
        n_fail += 1
    else:
        print(f"PASS {name} ({len(g)} rows)")
        n_pass += 1

# rows-only queries (no oracle): just report row counts
for d in sorted(glob.glob(f"{outdir}/*/")):
    name = d.rstrip("/").split("/")[-1]
    if name not in oracle and selected(name):
        try:
            n = len(pd.read_parquet(glob.glob(f"{d}/*.parquet")[0]))
            print(f"ROWS {name}: {n}")
        except Exception as e:
            print(f"ROWS {name}: unreadable ({e})"); n_fail += 1

# completeness: every registered query must have produced a dump dir —
# a rows-only query that CRASHES in Verify has no oracle entry and no
# dir, which the two loops above would silently skip
try:
    inventory = json.load(open(f"{outdir}/queries.json"))
except Exception:
    inventory = []  # pre-inventory dump; length checks above still apply
dumped = {d.rstrip("/").split("/")[-1] for d in glob.glob(f"{outdir}/*/")}
for name in sorted(n for n in set(inventory) - dumped if selected(n)):
    print(f"FAIL {name}: no output dumped (query threw in Verify)")
    n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail")
sys.exit(1 if n_fail else 0)
