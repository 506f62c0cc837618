#!/usr/bin/env python3
"""Local dev harness mimicking the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: read the Spark-written
parquet at <verifyOutDir>/<name>/, run the oracle SQL in DuckDB over the
testdata tables, sort columns by name and rows by value, compare exactly.
Dev-only tool (python/duckdb is driver-side); the Scala library never
depends on it.
"""
import duckdb, sys, os, json, math

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return round(v, 9)
    if isinstance(v, list): return tuple(norm(x) for x in v)
    return v

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        spark_dir = f"{out}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"MISSING {name}: no spark output"); n_bad += 1; continue
        try:
            got = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            gcols, grows = got.columns if hasattr(got,'columns') else None, None
            gdesc = [d[0] for d in got.description]; grows = got.fetchall()
            exp = con.execute(oracle[name])
            edesc = [d[0] for d in exp.description]; erows = exp.fetchall()
        except Exception as ex:
            print(f"ERROR  {name}: {ex}"); n_bad += 1; continue
        gc, gr = canon(grows, gdesc)
        ec, er = canon(erows, edesc)
        if gc != ec:
            print(f"FAIL   {name}: columns differ spark={gc} oracle={ec}"); n_bad += 1; continue
        if len(gr) != len(er):
            print(f"FAIL   {name}: rowcount spark={len(gr)} oracle={len(er)}"); n_bad += 1
            for a in gr[:3]: print("   spark:", a)
            for b in er[:3]: print("   oracl:", b)
            continue
        diff = [(a,b) for a,b in zip(gr,er) if a != b]
        if diff:
            print(f"FAIL   {name}: {len(diff)}/{len(gr)} rows differ; first: \n   spark: {diff[0][0]}\n   oracl: {diff[0][1]}")
            n_bad += 1; continue
        print(f"OK     {name} ({len(gr)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
