#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs graft.Verify (via sbt) at a given SF dir, then executes each
oracle SQL in DuckDB against the same parquet tables and compares
row counts, sorted-column-name value hashes, and (on mismatch) prints
a diff sample. Usage:

    python3 tools/check.py [sfdir] [--skip-verify] [query ...]
"""
import sys, os, json, subprocess, hashlib, decimal

if len(sys.argv) > 1 and not sys.argv[1].startswith("--"):
    SF, ARGS = sys.argv[1], sys.argv[2:]
else:
    SF, ARGS = "/root/testdata/sf0.001", sys.argv[1:]
SKIP = "--skip-verify" in ARGS
ONLY = [a for a in ARGS if not a.startswith("--")]
OUT = "/tmp/graft_verify_" + os.path.basename(SF.rstrip("/"))

if not SKIP:
    r = subprocess.run(
        ["sbt", "-batch",
         f'runMain graft.Verify {SF} {OUT} ' + " ".join(ONLY)],
        capture_output=True, text=True, cwd="/root/repo",
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"})
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)
    # surface per-query failures from Verify
    for line in r.stderr.splitlines():
        if "[verify]" in line:
            print(line)

import duckdb
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def type_class(t):
    """Coarse type class, tagged into the hash so oracle-side type drift
    (e.g. DuckDB window sum -> HUGEINT vs Spark BIGINT) fails locally the
    way it fails at the driver. <=64-bit ints are one class and
    DECIMAL folds into float (the driver accepts both of those — r2
    q21 DECIMAL-vs-DOUBLE passed); int128 is distinct (r2 q28 failed)."""
    n = str(t).upper()
    if n.startswith("DECIMAL"): return "f"
    if n in ("UBIGINT", "HUGEINT", "UHUGEINT"): return "i128"
    if n in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"): return "i"
    if n in ("FLOAT", "DOUBLE"): return "f"
    return "o"

def canon(v, cls="o"):
    if v is None: return "NULL"
    if isinstance(v, decimal.Decimal): v = float(v)
    if isinstance(v, float):
        if v != v: return "NaN"
        return "f:" + repr(round(v, 9))
    return f"{cls}:{v}"

def table_hash(cols, types, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    cls = [type_class(t) for t in types]
    h = hashlib.md5()
    for row in sorted([tuple(canon(row[i], cls[i]) for i in order) for row in rows]):
        h.update("\x01".join(row).encode()); h.update(b"\x02")
    return h.hexdigest()

ok = fail = 0
names = ONLY or sorted(oracle.keys())
for name in names:
    pdir = f"{OUT}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{pdir}/*.parquet'")
        gcols, gtypes, grows = got.columns, got.types, got.fetchall()
        exp = con.sql(oracle[name])
        ecols, etypes, erows = exp.columns, exp.types, exp.fetchall()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    if sorted(map(str.lower, gcols)) != sorted(map(str.lower, ecols)):
        print(f"FAIL {name}: columns {sorted(gcols)} != {sorted(ecols)}"); fail += 1; continue
    if len(grows) != len(erows):
        print(f"FAIL {name}: rows {len(grows)} != {len(erows)}"); fail += 1; continue
    gh, eh = table_hash(gcols, gtypes, grows), table_hash(ecols, etypes, erows)
    if gh != eh:
        print(f"FAIL {name}: hash mismatch ({len(grows)} rows)")
        gcls = [type_class(t) for t in gtypes]
        ecls = [type_class(t) for t in etypes]
        gset = {tuple(canon(v, c) for v, c in zip(r, gcls)) for r in grows}
        eset = {tuple(canon(v, c) for v, c in zip(r, ecls)) for r in erows}
        print("  spark-only:", list(gset - eset)[:3])
        print("  duck-only :", list(eset - gset)[:3])
        print("  cols spark:", list(zip(gcols, map(str, gtypes))),
              " duck:", list(zip(ecols, map(str, etypes))))
        fail += 1
    else:
        print(f"ok   {name} ({len(grows)} rows)"); ok += 1

# queries without oracle: rows-only
import glob
allq = {os.path.basename(p) for p in glob.glob(f"{OUT}/*") if os.path.isdir(p)}
for name in sorted(allq - set(oracle)):
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}/*.parquet'").fetchone()[0]
    print(f"rows {name}: {n}")

print(f"\n{ok} ok, {fail} fail, {len(allq - set(oracle))} rows-only")
sys.exit(1 if fail else 0)
