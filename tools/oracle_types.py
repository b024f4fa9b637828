#!/usr/bin/env python3
"""Oracle type-drift guard: DESCRIBE every oracle SQL in DuckDB and fail
if any output column binds to a type the driver's hasher canonicalizes
differently from Spark's parquet output.

The round-5 lesson: `SUM(CASE ...)` and integer `//` in DuckDB return
HUGEINT (INT128). Values agree with Spark's BIGINT, rows/schema checks
pass, but the driver's value hash is type-aware — so the query fails
silently late. This guard makes that drift a local test failure instead.

Banned type substrings (checked recursively through LIST/STRUCT types):
  HUGEINT   - covers HUGEINT and UHUGEINT (the SUM / // drift class)
  DECIMAL   - driver hash normalizes DECIMAL inconsistently; repo
              convention is scaled BIGINT (see tools/check_oracle.py)
  UBIGINT/UINTEGER/USMALLINT/UTINYINT - unsigned widths Spark lacks

Usage: oracle_types.py <sfDir> <oracle_sql.json>
Exit 0 = all oracles clean; 1 = drift found; 2 = environment problem.
"""
import json, os, sys

try:
    import duckdb
except ImportError:
    print("SKIP: duckdb not importable", file=sys.stderr)
    sys.exit(2)

BANNED = ("HUGEINT", "DECIMAL", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")

sf, oracle_path = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(oracle_path))
fails = 0
for name in sorted(oracle):
    try:
        # DESCRIBE binds + type-checks without executing the query
        desc = con.sql("DESCRIBE " + oracle[name]).fetchall()
    except Exception as e:
        print(f"{name}: FAIL oracle does not bind: {e}")
        fails += 1
        continue
    bad = [(col, typ) for col, typ, *_ in desc
           if any(b in typ.upper() for b in BANNED)]
    if bad:
        print(f"{name}: FAIL banned oracle types {bad} "
              "(CAST the aggregate/division output, e.g. AS BIGINT)")
        fails += 1
    else:
        print(f"{name}: OK {[typ for _c, typ, *_ in desc]}")
print(f"{len(oracle) - fails}/{len(oracle)} oracles type-clean")
sys.exit(1 if fails else 0)
