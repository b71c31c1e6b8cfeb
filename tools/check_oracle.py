#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python tools/check_oracle.py <sf_dir> <verify_out_dir>

Loads each <verify_out_dir>/<name> parquet (Spark result), runs the
matching SQL from oracle_sql.json in DuckDB with the sf tables
registered as views, sorts columns by name and rows by all columns,
and reports exact-match / mismatch per query.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Timestamps → ISO strings, floats stay; sort rows for order-insensitive compare.
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
            exp = norm(con.sql(sql).df())
            if list(got.columns) != list(exp.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
                n_bad += 1
                continue
            if len(got) != len(exp):
                print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
                n_bad += 1
                continue
            diffs = []
            for c in got.columns:
                a, b = got[c], exp[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    eq = (a.astype(float).fillna(-9e99) - b.astype(float).fillna(-9e99)).abs() == 0.0
                else:
                    eq = a.fillna("§null§").astype(str) == b.fillna("§null§").astype(str)
                if not eq.all():
                    i = int((~eq).idxmax())
                    diffs.append(f"col {c} row {i}: {a[i]!r} vs {b[i]!r} ({int((~eq).sum())} diffs)")
            if diffs:
                print(f"FAIL {name}: " + "; ".join(diffs[:3]))
                n_bad += 1
            else:
                print(f"ok   {name} ({len(got)} rows)")
                n_ok += 1
        except Exception as e:
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
