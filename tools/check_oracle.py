#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB over the sf_dir
tables, and compares schema + rows. Reports per-query PASS/FAIL.
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Oracle result-type allowlist (VERDICT r9 #2). The driver's hasher
# normalizes int32-vs-int64 but NOT int128 or JSON: DuckDB silently
# widens integer sum() to HUGEINT and types to_json() as JSON, both of
# which serialize as a different dtype than anything Spark can emit —
# rows/schema green, hash red (a16 cost two rounds to this). Every
# oracle column must type inside this set, and must match the Spark
# parquet output's type EXACTLY so the gate never leans on the hasher's
# undocumented widening.
ALLOWED_TYPES = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                 "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP"}

def type_ok(t):
    t = t.strip()
    if t.endswith("[]"):
        return type_ok(t[:-2])
    return t in ALLOWED_TYPES

def type_check(con, name, sql, spark_parquet):
    """Returns a list of violation strings (empty = clean). DESCRIBE does
    not execute the query, so this also powers the per-scale LIMIT-0 type
    drill (COVERAGE.md) without paying query time."""
    errs = []
    otypes = {r[0]: r[1] for r in con.sql(f"DESCRIBE ({sql})").fetchall()}
    for c, t in otypes.items():
        if not type_ok(t):
            errs.append(f"oracle col {c} types {t} (not in allowlist)")
    if spark_parquet is not None:
        stypes = {r[0]: r[1] for r in
                  con.sql(f"DESCRIBE SELECT * FROM '{spark_parquet}'").fetchall()}
        for c, t in otypes.items():
            st = stypes.get(c)
            if st is not None and st != t:
                errs.append(f"col {c}: spark={st} oracle={t} (must be identical)")
    return errs

def main():
    args = [a for a in sys.argv[1:] if a != "--types"]
    types_only = "--types" in sys.argv[1:]
    out_dir, sf_dir = args[0], args[1]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if types_only:
        # LIMIT-0 type drill (VERDICT r9 #6): DESCRIBE every oracle against
        # this scale's tables — catches scale-dependent type widening (an
        # integer sum that stays INTEGER at sf0.001 but plans HUGEINT) with
        # zero query execution. Spark-side compare included when the dump
        # for a query exists in out_dir.
        n_bad = 0
        for name in sorted(oracle):
            files = glob.glob(f"{out_dir}/{name}/*.parquet")
            try:
                errs = type_check(con, name, oracle[name],
                                  files[0] if files else None)
            except Exception as e:
                errs = [f"type check error: {e}"]
            for e in errs:
                print(f"TYPE-FAIL {name}: {e}"); n_bad += 1
        print(f"\ntype drill: {len(oracle)} oracles, {n_bad} violations")
        sys.exit(1 if n_bad else 0)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = con.sql(f"SELECT * FROM '{files[0]}'").fetchdf()
        if name not in oracle:
            print(f"ROWS-ONLY {name}: {len(got)} rows"); n_rowsonly += 1
            continue
        try:
            terrs = type_check(con, name, oracle[name], files[0])
        except Exception as e:
            terrs = [f"type check error: {e}"]
        if terrs:
            print(f"FAIL {name}: TYPE GUARD: {'; '.join(terrs)}")
            n_fail += 1
            continue
        try:
            exp = con.sql(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}"); n_fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); n_fail += 1; continue
        got, exp = got[gc], exp[gc]
        # order-sensitive value compare (both sides carry a total ORDER BY)
        mismatch = None
        for c in gc:
            gv, ev = got[c].tolist(), exp[c].tolist()
            for i, (a, b) in enumerate(zip(gv, ev)):
                if not eq(a, b):
                    mismatch = (c, i, a, b); break
            if mismatch: break
        if mismatch:
            c, i, a, b = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)

def eq(a, b):
    import math
    import numpy as np
    if a is None or b is None:
        return (a is None or (isinstance(a, float) and math.isnan(a))) and \
               (b is None or (isinstance(b, float) and math.isnan(b)))
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # bit-exact: the query contract demands it
    if isinstance(a, (list, np.ndarray)) or isinstance(b, (list, np.ndarray)):
        a, b = list(a), list(b)
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    return a == b

if __name__ == "__main__":
    main()
