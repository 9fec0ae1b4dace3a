#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Runs after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
for each query output parquet under <outDir>, executes the matching
oracle SQL from oracle_sql.json in DuckDB (tables = the sfDir parquet
files registered by name) and compares row count, column names, and a
hash of the sorted values.

Usage: python3 scripts/check.py <sfDir> <outDir>
"""
import sys, os, json, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes: ints -> int64, floats -> rounded float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def table_hash(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False, float_format="%.6f").encode()).hexdigest()


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        got = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(got)} rows")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"  [FAIL-sql ] {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, w = normalize(got), normalize(want)
        ok_cols = list(g.columns) == list(w.columns)
        ok_rows = len(g) == len(w)
        ok_hash = ok_cols and ok_rows and table_hash(g) == table_hash(w)
        if ok_hash:
            print(f"  [ok       ] {name}: {len(g)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(f"  [FAIL     ] {name}: cols={ok_cols} rows(g/w)={len(g)}/{len(w)}")
            if not ok_cols:
                print(f"              spark cols:  {list(g.columns)}")
                print(f"              oracle cols: {list(w.columns)}")
            elif ok_rows:
                diff = (g != w) & ~(g.isna() & w.isna())
                bad = diff.any(axis=1)
                print("              first diffs (spark vs oracle):")
                print(pd.concat([g[bad].head(3).add_suffix("_spark"),
                                 w[bad].head(3).add_suffix("_oracle")], axis=1)
                      .to_string(max_colwidth=40))
    print(f"PASS {n_pass} / FAIL {n_fail} / total {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
