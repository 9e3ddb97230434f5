#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/check.py <outDir> <sfDir>
  outDir: Verify output dir (one parquet dir per query + oracle_sql.json)
  sfDir:  testdata dir with the source parquet tables

For each query: run the oracle SQL in DuckDB against views over the sf
tables, load the Spark parquet result, sort columns by name, sort rows,
and compare values exactly (doubles compared exactly — queries are
expected to round; any FP residue shows up here before the driver sees it).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable sorting/compare across engines
    out = df.copy()
    for c in out.columns:
        out[c] = out[c].map(cell)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if pd.isna(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if pd.isna(v) if isinstance(v, (pd.Timestamp,)) else False:
        return "NULL"
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(cell(x) for x in v) + "]"
    return str(v)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    results = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(qdir)
        if not os.path.isdir(qdir):
            continue
        spark_df = pd.concat(
            [pd.read_parquet(p) for p in sorted(glob.glob(os.path.join(qdir, "*.parquet")))],
            ignore_index=True)
        if name not in oracles:
            results[name] = f"NO-ORACLE rows={len(spark_df)}"
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-ERROR {e}"
            continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(s.columns)} duck={list(d.columns)}"
        elif len(s) != len(d):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(s)} duck={len(d)}"
        elif not s.equals(d):
            neq = (s != d).any(axis=1)
            idx = s.index[neq][:3]
            diffs = [f"row {i}: spark={s.loc[i].to_dict()} duck={d.loc[i].to_dict()}" for i in idx]
            results[name] = "VALUE-MISMATCH " + " | ".join(diffs)
        else:
            results[name] = f"OK rows={len(s)}"

    fails = 0
    for name, r in sorted(results.items()):
        status = "PASS" if r.startswith("OK") or r.startswith("NO-ORACLE") else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"{status:4} {name:28} {r[:400]}")
    print(f"\n{len(results) - fails}/{len(results)} pass")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
