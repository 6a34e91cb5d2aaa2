#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracles.py <sfdir> <verify_outdir> [query ...]

Reads each <verify_outdir>/<name> parquet (written by graft.Verify), runs
the matching oracle SQL from <verify_outdir>/oracle_sql.json against the
testdata parquet tables, and compares: row count, column-name set, and
exact cell values with columns sorted by name (the driver hashes the
value matrix after a by-name column sort — exact equality here implies
hash equality there).
"""
import json, sys, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            spark = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        ok = True
        if len(spark) != len(oracle):
            print(f"FAIL {name}: rows {len(spark)} vs {len(oracle)}")
            ok = False
        sc, oc = sorted(spark.columns), sorted(oracle.columns)
        if ok and sc != oc:
            print(f"FAIL {name}: cols {sc} vs {oc}")
            ok = False
        if ok:
            s = spark[sc].reset_index(drop=True)
            o = oracle[oc].reset_index(drop=True)
            for c in sc:
                sv, ov = s[c].tolist(), o[c].tolist()
                for i, (a, b) in enumerate(zip(sv, ov)):
                    if a is None and b is None:
                        continue
                    if isinstance(a, float) and isinstance(b, float):
                        if math.isnan(a) and math.isnan(b):
                            continue
                        if a != b:
                            print(f"FAIL {name}: col {c} row {i}: {a!r} != {b!r}")
                            ok = False
                            break
                    elif str(a) != str(b) and a != b:
                        print(f"FAIL {name}: col {c} row {i}: {a!r} != {b!r}")
                        ok = False
                        break
                if not ok:
                    break
        if ok:
            print(f"pass {name}")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
