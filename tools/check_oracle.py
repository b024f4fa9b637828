#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: for each query
parquet under OUTDIR, run the matching oracle_sql.json entry in DuckDB
against the sf parquet tables, sort columns by name, and compare
CANONICAL PER-CELL STRINGS row by row (not pandas `==`, which coerces
types and hid the round-1 DECIMAL failures).

Two deliberate strictness rules, learned from the round-1 verdict:
  1. The Spark output is read through pyarrow (preserving DECIMAL as
     Decimal) while the oracle is fetched from DuckDB — two DIFFERENT
     read paths, like the driver's. A DECIMAL column renders
     differently on the two paths even when values are identical.
  2. Any DECIMAL column in either frame's schema is an immediate FAIL:
     declared queries must never emit DECIMAL (emit scaled BIGINT or
     strings instead).

Usage: check_oracle.py <sfDir> <outDir>"""
import json, sys, glob, os
import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pyarrow as pa
import numpy as np
import datetime
import decimal

sf, out = sys.argv[1], sys.argv[2]


def fresh_con():
    """One connection PER QUERY (r16): the heavy graph-chain oracles
    leave tens of GiB of buffer-pool/scratch residue behind; on a
    shared connection that residue accumulates across queries until a
    later heavy chain dies on a system-level bad_alloc even though it
    passes standalone. A fresh connection gives every query the full
    headroom; the 48 GiB cap keeps any single query spilling instead
    of exhausting physical memory."""
    c = duckdb.connect()
    c.execute("SET memory_limit='48GiB'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return c


def canon(x):
    """Canonical string for one cell — strict enough that two values
    canonicalize equal only if a byte-faithful reader would agree."""
    if x is None:
        return "NULL"
    if isinstance(x, float):
        if x != x:
            return "NaN"
        return repr(x)  # shortest round-trip: equal iff same bits
    if isinstance(x, (np.floating,)):
        return canon(float(x))
    if isinstance(x, (np.integer,)):
        return str(int(x))
    if isinstance(x, decimal.Decimal):
        return "DECIMAL:" + str(x)
    if isinstance(x, pd.Timestamp):
        if pd.isna(x):
            return "NULL"
        return x.isoformat()
    if isinstance(x, (datetime.datetime, datetime.date)):
        return x.isoformat()
    if isinstance(x, (bytes, bytearray)):
        return "0x" + bytes(x).hex()
    if isinstance(x, np.ndarray):
        return "[" + ",".join(canon(v) for v in x.tolist()) + "]"
    if isinstance(x, (list, tuple)):
        return "[" + ",".join(canon(v) for v in x) + "]"
    if isinstance(x, dict):
        return "{" + ",".join(f"{k}:{canon(v)}" for k, v in sorted(x.items())) + "}"
    if x is pd.NaT:
        return "NULL"
    try:
        if pd.isna(x):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(x)


def decimal_cols_arrow(schema):
    return [f.name for f in schema if pa.types.is_decimal(f.type)]


oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    files = sorted(glob.glob(f"{d}/*.parquet"))
    table = pa.concat_tables([pq.read_table(f) for f in files])
    dec_cols = decimal_cols_arrow(table.schema)
    if dec_cols:
        print(f"{name}: FAIL decimal columns in Spark output schema: {dec_cols} "
              "(driver hash gate normalizes DECIMAL inconsistently — emit scaled BIGINT)")
        fails += 1
        continue
    nrows = table.num_rows
    if name not in oracle:
        print(f"{name}: NO-ORACLE rows={nrows} " +
              ("OK(rows>0)" if nrows > 0 else "FAIL(empty)"))
        if nrows == 0:
            fails += 1
        continue
    con = fresh_con()
    # close on EVERY exit path (banned-type continue, fetch error) —
    # the heavy chain's buffer pool must not wait for GC to release
    try:
        res = con.sql(oracle[name])
        duck_types = [str(t) for t in res.types]
        # DECIMAL + the HUGEINT/unsigned class (uncast SUM / // in DuckDB
        # binds to INT128: values match Spark BIGINT but the driver's
        # type-aware value hash does not — round-5 text_bigram_coverage).
        BAN = ("DECIMAL", "HUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT")
        duck_dec = [c for c, t in zip(res.columns, duck_types)
                    if any(b in t.upper() for b in BAN)]
        if duck_dec:
            print(f"{name}: FAIL banned-type columns in oracle result: {duck_dec} "
                  "(mirror the scaled-BIGINT cast in the oracle SQL)")
            fails += 1
            continue
        exp_rows = res.fetchall()
        exp_cols = res.columns
    finally:
        con.close()  # release the heavy chain's buffer pool before the next query
    # pyarrow to_pylist keeps native Python types: ints stay ints,
    # nulls stay None (to_pandas would coerce nullable int64 → float64
    # NaN, a false diff the driver's reader does not have).
    spark_cols = sorted(table.column_names)
    got_rows = table.select(spark_cols).to_pylist()
    order = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
    exp_cols_sorted = [exp_cols[i] for i in order]
    if spark_cols != exp_cols_sorted:
        print(f"{name}: FAIL cols spark={spark_cols} duck={exp_cols_sorted}")
        fails += 1
        continue
    if nrows != len(exp_rows):
        print(f"{name}: FAIL rows spark={nrows} duck={len(exp_rows)}")
        fails += 1
        continue
    got_canon = [[canon(row[c]) for c in spark_cols] for row in got_rows]
    exp_canon = [[canon(row[i]) for i in order] for row in exp_rows]
    diffs = []
    for r in range(nrows):
        for c in range(len(spark_cols)):
            if got_canon[r][c] != exp_canon[r][c]:
                diffs.append((r, c))
    if diffs:
        print(f"{name}: FAIL {len(diffs)} canonical cell diffs; first at {diffs[:5]}")
        for r, c in diffs[:3]:
            print(f"   row {r} col {spark_cols[c]}: "
                  f"spark={got_canon[r][c]!r} duck={exp_canon[r][c]!r}")
        fails += 1
        continue
    print(f"{name}: OK rows={nrows}")
sys.exit(1 if fails else 0)
