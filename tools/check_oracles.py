#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/check_oracles.py <sfdir> <verify_outdir> [query ...]

Reads each <verify_outdir>/<name> parquet (written by graft.Verify), runs
the matching oracle SQL from <verify_outdir>/oracle_sql.json against the
testdata parquet tables, and compares: row count, column-name set, and
exact cell values with columns sorted by name (the driver hashes the
value matrix after a by-name COLUMN sort only — row order counts).

Row-order handling: when the oracle SQL ends in a top-level ORDER BY the
compare is ORDER-SENSITIVE, exactly like the driver (exact equality here
implies hash equality there). Only when the oracle has no top-level
ORDER BY (where the driver's hash is itself order-dependent and the
query must already be registered rows-only or fully ordered) are rows
sorted on both sides, as a best-effort value check — that path is
weaker than the driver and says so.
"""
import json, re, sys, math
import duckdb
import numpy as np


def _norm(x):
    """Normalize a cell for comparison: numpy arrays/lists -> tuples
    (bare != on an ndarray raises ambiguous-truth-value), numpy scalars
    -> python scalars."""
    if isinstance(x, np.ndarray):
        return tuple(_norm(v) for v in x.tolist())
    if isinstance(x, (list, tuple)):
        return tuple(_norm(v) for v in x)
    if isinstance(x, np.generic):
        return x.item()
    return x


def _cells_equal(a, b):
    """Representation-faithful compare. The driver hashes the string
    form of each cell as pandas renders it, so int64 99111 and float64
    99111.0 hash DIFFERENTLY there even though they are numerically
    equal — this replica must reject exactly that drift (round 8's
    q_json HUGEINT bug passed the old lax `a == b` compare and shipped
    red). Rule: after normalization the two cells must have the SAME
    python type (so int-vs-float, bool-vs-int, str-vs-int all fail),
    then compare exactly; NaN==NaN because both render as 'nan'."""
    a, b = _norm(a), _norm(b)
    if a is None and b is None:
        return True
    if type(a) is not type(b):
        return False
    if isinstance(a, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    if isinstance(a, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def _selftest():
    """Assert the compare is representation-sensitive. Run with
    --selftest; exits nonzero on any regression toward laxness."""
    cases = [
        (99111, 99111.0, False),   # the round-8 q_json drift, must FAIL
        (99111.0, 99111, False),
        (True, 1, False),          # bool-vs-int renders 'True' vs '1'
        ("1", 1, False),
        (99111, 99111, True),
        (1.5, 1.5, True),
        (float("nan"), float("nan"), True),
        (None, None, True),
        (None, float("nan"), False),
        ((1, 2.0), (1, 2.0), True),
        ((1, 2), (1, 2.0), False), # drift inside nested arrays too
        (np.int64(7), 7, True),    # numpy scalars normalize to python
        (np.float64(7.0), 7, False),
    ]
    bad = [(a, b, want) for a, b, want in cases if _cells_equal(a, b) != want]
    for a, b, want in bad:
        print(f"SELFTEST FAIL: _cells_equal({a!r}, {b!r}) != {want}")
    print(f"== selftest: {len(cases) - len(bad)}/{len(cases)} ==")
    sys.exit(1 if bad else 0)


def _has_toplevel_order_by(sql):
    """True when an ORDER BY token occurs at parenthesis depth 0 —
    i.e. it orders the outermost query, not a subquery or an OVER()
    window. Depth-tracked (not regex-suffix-based) so sort expressions
    that themselves contain calls, e.g. `ORDER BY round(s, 6)`, are
    still recognized as top-level. SQL string literals are skipped
    first, so parens or the words 'order by' INSIDE a literal (regex
    patterns, label text) can neither corrupt the depth nor fake a
    top-level ORDER BY."""
    depth = 0
    for m in re.finditer(r"'(?:[^']|'')*'|\(|\)|ORDER\s+BY", sql, re.IGNORECASE):
        tok = m.group(0)
        if tok.startswith("'"):
            continue
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            return True
    return False


def _row_sort(df, cols):
    """Best-effort row sort for oracles WITHOUT a top-level ORDER BY.
    List/dict-typed columns are excluded from the key (lists are
    unsortable; dicts make sort_values raise TypeError)."""
    keys = [c for c in cols
            if not df[c].map(lambda v: isinstance(v, (list, np.ndarray, dict))).any()]
    if not keys:
        return df.reset_index(drop=True)
    return df.sort_values(by=keys, kind="mergesort").reset_index(drop=True)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    if sys.argv[1:2] == ["--selftest"]:
        _selftest()
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sfdir, outdir = args[0], args[1]
    only = set(args[2:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # per-query record in the DRIVER's CORRECTNESS_r{N}.json schema, so
    # the committed local artifact is a drop-in replacement when the
    # driver ships an empty file (it did in r16 and r17)
    records = {}
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "err": None}
        records[name] = rec
        try:
            spark = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            rec["err"] = str(e)[:500]
            n_fail += 1
            continue
        ok = True
        if len(spark) != len(oracle):
            print(f"FAIL {name}: rows {len(spark)} vs {len(oracle)}")
            rec["err"] = f"rows {len(spark)} vs {len(oracle)}"
            ok = False
        rec["rows_match"] = len(spark) == len(oracle)
        sc, oc = sorted(spark.columns), sorted(oracle.columns)
        rec["schema_match"] = sc == oc
        if ok and sc != oc:
            print(f"FAIL {name}: cols {sc} vs {oc}")
            rec["err"] = f"cols {sc} vs {oc}"
            ok = False
        if ok:
            try:
                if _has_toplevel_order_by(sql):
                    s = spark[sc].reset_index(drop=True)
                    o = oracle[oc].reset_index(drop=True)
                else:
                    print(f"note {name}: no top-level ORDER BY — "
                          "row-sorted compare (weaker than the driver)")
                    s = _row_sort(spark[sc], sc)
                    o = _row_sort(oracle[oc], oc)
                for c in sc:
                    sv, ov = s[c].tolist(), o[c].tolist()
                    for i, (a, b) in enumerate(zip(sv, ov)):
                        if not _cells_equal(a, b):
                            print(f"FAIL {name}: col {c} row {i}: {a!r} != {b!r}")
                            rec["err"] = f"col {c} row {i}: {a!r} != {b!r}"[:500]
                            ok = False
                            break
                    if not ok:
                        break
            except Exception as e:
                print(f"FAIL {name}: compare error {e}")
                rec["err"] = f"compare error {e}"[:500]
                ok = False
        rec["hash_match"] = ok
        if ok:
            print(f"pass {name}")
            n_pass += 1
        else:
            n_fail += 1
    if json_out:
        with open(json_out, "w") as f:
            json.dump(records, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(records)} queries)")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
