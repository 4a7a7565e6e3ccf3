#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: replay oracle_sql.json
in DuckDB over the same sf directory and compare against the parquet
results dumped by graft.Verify.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Comparison mimics the driver: sort columns by name, sort rows, compare
values (exact, with a parallel approximate check to flag float-precision
risk separately from real mismatches).
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Driver hash is sensitive to the PHYSICAL result type (Arrow level):
# DuckDB widening an uncast sum(BIGINT) to HUGEINT made four gates
# hash-red across rounds 7-8 even though every value matched.  Any
# oracle whose result schema strays outside this allowlist is a FAIL
# before values are even compared.
ALLOWED_TYPES = {"BIGINT", "INTEGER", "DOUBLE", "FLOAT", "VARCHAR",
                 "BOOLEAN", "DATE", "TIMESTAMP"}


def bad_result_types(rel):
    """Columns of a DuckDB relation whose type is outside the allowlist."""
    return [f"{c}:{t}" for c, t in zip(rel.columns, map(str, rel.types))
            if str(t) not in ALLOWED_TYPES]


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [cols[i] for i in order], out


def approx_equal(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle_sql = json.loads((Path(out_dir) / "oracle_sql.json").read_text())

    results = {}
    for name in sorted(p.name for p in Path(out_dir).iterdir() if p.is_dir()):
        res_dir = Path(out_dir) / name
        got = con.sql(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
        got_cols, got_rows = normalize(got.fetchall(), got.columns)
        if name not in oracle_sql:
            results[name] = f"ROWS-ONLY ({len(got_rows)} rows)"
            continue
        try:
            exp = con.sql(oracle_sql[name])
            bad_types = bad_result_types(exp)
            exp_cols, exp_rows = normalize(exp.fetchall(), exp.columns)
        except Exception as e:
            results[name] = f"ORACLE-ERROR: {str(e)[:200]}"
            continue
        if bad_types:
            results[name] = f"RESULT-TYPE ({', '.join(bad_types)} not in allowlist)"
        elif got_cols != exp_cols:
            results[name] = f"SCHEMA-MISMATCH spark={got_cols} duckdb={exp_cols}"
        elif len(got_rows) != len(exp_rows):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(got_rows)} duckdb={len(exp_rows)}"
        elif got_rows == exp_rows:
            results[name] = f"EXACT-MATCH ({len(got_rows)} rows)"
        else:
            n_bad = sum(1 for g, e in zip(got_rows, exp_rows)
                        if not all(approx_equal(a, b) for a, b in zip(g, e)))
            if n_bad == 0:
                first = next((g, e) for g, e in zip(got_rows, exp_rows) if g != e)
                results[name] = f"APPROX-MATCH (float repr drift, e.g. {first})"
            else:
                first = next((g, e) for g, e in zip(got_rows, exp_rows)
                             if not all(approx_equal(a, b) for a, b in zip(g, e)))
                results[name] = (f"VALUE-MISMATCH {n_bad}/{len(got_rows)} rows, "
                                 f"first: spark={first[0]} duckdb={first[1]}")

    missing = set(oracle_sql) - set(results)
    width = max(len(n) for n in results) if results else 10
    fails = 0
    for name, res in sorted(results.items()):
        ok = res.startswith(("EXACT", "ROWS-ONLY"))
        fails += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL':4} {name:{width}} {res}")
    for name in sorted(missing):
        print(f"FAIL {name:{width}} NO-RESULT (query errored in Verify?)")
        fails += 1
    print(f"\n{len(results) - fails}/{len(results)} pass, {fails} fail")
    return 1 if fails else 0


def types_only(sf_dir, oracle_json):
    """Audit ONLY the oracle result-column types (no Verify output needed).

    Usage: python3 tools/oracle_check.py --types-only <sfDir> <oracle_sql.json>
    """
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle_sql = json.loads(Path(oracle_json).read_text())
    fails = 0
    for name in sorted(oracle_sql):
        try:
            bad = bad_result_types(con.sql(oracle_sql[name]))
        except Exception as e:
            print(f"FAIL {name} ORACLE-ERROR: {str(e)[:200]}")
            fails += 1
            continue
        if bad:
            print(f"FAIL {name} RESULT-TYPE ({', '.join(bad)})")
            fails += 1
    print(f"\n{len(oracle_sql) - fails}/{len(oracle_sql)} type-clean, {fails} fail")
    return 1 if fails else 0


USAGE = """usage:
  python3 tools/oracle_check.py <sfDir> <verifyOutDir>
  python3 tools/oracle_check.py --types-only <sfDir> <oracle_sql.json>"""

if __name__ == "__main__":
    if len(sys.argv) < 3:
        print(USAGE, file=sys.stderr)
        sys.exit(2)
    if sys.argv[1] == "--types-only":
        if len(sys.argv) < 4:
            print(USAGE, file=sys.stderr)
            sys.exit(2)
        sys.exit(types_only(sys.argv[2], sys.argv[3]))
    sys.exit(main(sys.argv[1], sys.argv[2]))
