#!/usr/bin/env python3
"""Lint every DuckDB oracle twin for hash-breaking output types.

DuckDB widens integer SUMs to HUGEINT and some arithmetic to DECIMAL;
pyarrow surfaces both as float64/object, so a value-identical result
still fails the driver's stringified hash compare (the class that broke
sample_budget_mix in round 12). This lints the whole class: DESCRIBE
each oracle against views over the sf tables and fail on any output
column typed HUGEINT/UHUGEINT/DECIMAL.

Usage: python3 scripts/lint_oracle_types.py <oracle_sql.json> <sfDir>
Exit 0 = clean, 1 = at least one offending column (listed on stdout).
"""
import sys, os, json
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

BAD = ("HUGEINT", "UHUGEINT", "DECIMAL")


def main(oracle_json: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(oracle_json) as f:
        oracles = json.load(f)

    offenders = []
    errors = []
    for name, sql in sorted(oracles.items()):
        try:
            desc = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:
            errors.append(f"{name}: DESCRIBE failed: {e}")
            continue
        for col, typ, *_ in desc:
            if any(b in typ.upper() for b in BAD):
                offenders.append(f"{name}: column '{col}' is {typ}")

    for o in offenders:
        print("BAD-TYPE", o)
    for e in errors:
        print("ERROR   ", e)
    n = len(oracles)
    print(f"{n - len({o.split(':')[0] for o in offenders})}/{n} twins type-clean")
    return 1 if offenders or errors else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
