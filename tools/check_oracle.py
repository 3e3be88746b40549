#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query dumped by
graft.Verify, run its oracle SQL in DuckDB over the same sf dir and compare.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
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

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
