#!/usr/bin/env python3
"""Local self-check: mimic the driver's correctness gate.

Runs DuckDB on each oracle_sql.json entry against the testdata parquet and
compares with the Spark parquet dumps produced by `graft.Verify`.

Usage:  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"
        python3 dev/check.py /root/testdata/sf0.01 /tmp/graft_verify
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            expected = con.sql(sql).df()
            actual = pd.read_parquet(f"{out_dir}/{name}")
            e, a = canon(expected), canon(actual)
            if list(e.columns) != list(a.columns):
                print(f"FAIL {name}: columns {list(a.columns)} != {list(e.columns)}")
                n_fail += 1
                continue
            if len(e) != len(a):
                print(f"FAIL {name}: rows {len(a)} != {len(e)}")
                n_fail += 1
                continue
            # exact value compare (row order must match too)
            diff_cols = []
            for c in e.columns:
                ev, av = e[c], a[c]
                if ev.dtype.kind == "f" or av.dtype.kind == "f":
                    ok = ((ev.isna() & av.isna()) | (ev == av)).all()
                else:
                    ok = ev.astype(str).equals(av.astype(str))
                if not ok:
                    diff_cols.append(c)
            if diff_cols:
                print(f"FAIL {name}: value mismatch in {diff_cols}")
                for c in diff_cols[:2]:
                    m = ~((e[c].isna() & a[c].isna()) | (e[c].astype(str) == a[c].astype(str)))
                    print(pd.DataFrame({"oracle": e[c][m], "spark": a[c][m]}).head(5))
                n_fail += 1
            else:
                print(f"PASS {name} ({len(e)} rows)")
        except Exception as ex:  # noqa: BLE001
            print(f"ERROR {name}: {ex}")
            n_fail += 1
    print(f"\n{'ALL GREEN' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
