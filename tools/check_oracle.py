#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query dumped by
graft.Verify, run its oracle SQL in DuckDB over the same sf dir and compare.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
       python3 tools/check_oracle.py --strict /tmp/verify_out /root/testdata/sf0.01

--strict simulates the worst-case driver read path: Spark output via
pandas/pyarrow (decimals stay Decimal objects), oracle via DuckDB .df()
(decimals surface as float64), compared at str() level with NO numeric
normalization. A query passing --strict is immune to representation-level
hash mismatches (trailing-zero decimals, last-ulp float drift, rounding-mode
ties) — make new queries pass this before shipping them.
"""
import json, os, sys, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(v):
    if v is None: return None
    if isinstance(v, float):
        if math.isnan(v): return "nan"
        return float(f"{v:.10g}")
    # decimals -> float-ish string for tolerant compare; keep exact too
    import decimal, datetime
    if isinstance(v, decimal.Decimal): return str(v)
    if isinstance(v, datetime.datetime): return v.isoformat()
    if isinstance(v, (list, tuple)): return tuple(norm(x) for x in v)
    return v

def main(outdir, sfdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        pq = os.path.join(outdir, name)
        try:
            got = con.execute(
                f"SELECT * FROM '{pq}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); fail += 1; continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); fail += 1; continue
        # driver semantics: sort columns by name, then compare values
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL {name}: schema {gcols} vs {ecols}"); fail += 1; continue
        g = [tuple(norm(v) for v in row) for row in got[gcols].itertuples(index=False)]
        e = [tuple(norm(v) for v in row) for row in exp[ecols].itertuples(index=False)]
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); fail += 1; continue
        # compare both as ordered and as sorted multisets
        ordered = g == e
        unordered = sorted(map(repr, g)) == sorted(map(repr, e))
        if unordered:
            ok += 1
            print(f"ok   {name}: {len(g)} rows" + ("" if ordered else " (order differs)"))
        else:
            fail += 1
            diff = [(a, b) for a, b in zip(sorted(map(repr,g)), sorted(map(repr,e))) if a != b][:3]
            print(f"FAIL {name}: value mismatch; first diffs: {diff}")
    print(f"\n{ok} ok, {fail} fail")
    return 1 if fail else 0

def strict(outdir, sfdir):
    import glob
    import pandas as pd
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
        if not files:
            print(f"FAIL {name}: no spark output"); fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}"); fail += 1; continue
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec:
            print(f"FAIL {name}: schema {gc} vs {ec}"); fail += 1; continue
        g = sorted(repr(tuple(str(v) for v in row))
                   for row in got[gc].itertuples(index=False))
        e = sorted(repr(tuple(str(v) for v in row))
                   for row in exp[ec].itertuples(index=False))
        if g == e:
            ok += 1; print(f"ok   {name}: {len(g)} rows (strict)")
        else:
            fail += 1
            d = [(a, b) for a, b in zip(g, e) if a != b][:2]
            print(f"FAIL {name}: strict mismatch; first diffs: {d}")
    print(f"\n{ok} ok, {fail} fail (strict)")
    return 1 if fail else 0

if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--strict":
        sys.exit(strict(args[1], args[2]))
    sys.exit(main(args[0], args[1]))
