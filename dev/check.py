#!/usr/bin/env python3
"""Local self-check: mimic the driver's correctness gate, STRICTLY.

Runs DuckDB on each oracle_sql.json entry against the testdata parquet and
compares with the Spark parquet dumps produced by `graft.Verify`.

The compare is a canonical RENDERING compare, not pandas `==`:
the driver hashes rendered values, so the two classes pandas equality
forgives are failures here:
  * int-vs-float dtype (DuckDB HUGEINT -> float64 renders `2747.0`
    against Spark's `2747`)  -> FAIL (dtype-kind)
  * IEEE signed zero (`-0.0` vs `0.0`)                  -> FAIL (value)
Same-kind width mismatches (int32 vs int64) render identically and pass
the driver today, but are one driver implementation detail away from red:
reported as FAIL (dtype-width) unless --lax-width is given.

Usage:  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"
        python3 dev/check.py /root/testdata/sf0.01 /tmp/graft_verify [--lax-width]
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

NUMERIC_KINDS = "iuf"


def render_cell(v):
    """One canonical scalar rendering: floats by shortest round-trip repr
    (distinguishes -0.0 from 0.0), ints bare, None/NaN as NULL."""
    if v is None:
        return "NULL"
    if isinstance(v, (float, np.floating)):
        if pd.isna(v):
            return "NULL"
        return repr(float(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("T00:00:00", "")
    return str(v)


def render(s: pd.Series) -> pd.Series:
    if s.dtype.kind == "M":
        # DuckDB's .df() bridges DATE to datetime64 while parquet keeps
        # date32 objects; the driver treats the two as equal — render
        # both as the bare date when the time part is midnight.
        return s.map(lambda v: "NULL" if pd.isna(v)
                     else v.isoformat().replace("T00:00:00", ""))
    if s.dtype.kind == "f":
        return s.map(lambda v: "NULL" if pd.isna(v) else repr(float(v)))
    if s.dtype.kind in "iu":
        return s.map(lambda v: str(int(v)))
    if s.dtype.kind == "b":
        return s.map(lambda v: str(bool(v)))
    return s.map(render_cell)


def compare(e: pd.DataFrame, a: pd.DataFrame, lax_width: bool):
    """Return list of (column, reason) mismatches between oracle e and
    Spark a (same column order, same row count assumed checked)."""
    bad = []
    for c in e.columns:
        ev, av = e[c], a[c]
        ek, ak = ev.dtype.kind, av.dtype.kind
        if ek != ak and (ek in NUMERIC_KINDS + "b" or ak in NUMERIC_KINDS + "b"):
            # int-vs-float (the HUGEINT class) renders differently -> driver red
            if not (ek in "iu" and ak in "iu"):
                bad.append((c, f"dtype-kind {av.dtype} != {ev.dtype}"))
                continue
        if ek in NUMERIC_KINDS and ak in NUMERIC_KINDS and ek == ak \
                and ev.dtype.itemsize != av.dtype.itemsize and not lax_width:
            bad.append((c, f"dtype-width {av.dtype} != {ev.dtype}"))
            continue
        if not render(ev).equals(render(av)):
            bad.append((c, "value"))
    return bad


def selftest():
    """The three classes this checker exists to catch."""
    e = pd.DataFrame({"x": [2747.0]})           # HUGEINT -> float64 render
    a = pd.DataFrame({"x": [2747]})
    assert compare(e, a, False), "int-vs-float must fail"
    e = pd.DataFrame({"x": [-0.0]})
    a = pd.DataFrame({"x": [0.0]})
    assert compare(e, a, False), "-0.0 vs 0.0 must fail"
    e = pd.DataFrame({"x": np.array([7], dtype="int64")})
    a = pd.DataFrame({"x": np.array([7], dtype="int32")})
    assert compare(e, a, False), "int width must fail strict"
    assert not compare(e, a, True), "int width passes lax"
    e = pd.DataFrame({"x": [1.5, None]})
    a = pd.DataFrame({"x": [1.5, None]})
    assert not compare(e, a, False), "equal floats+null must pass"


def main(sf_dir: str, out_dir: str, lax_width: bool) -> int:
    selftest()
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
            e = expected.reindex(sorted(expected.columns), axis=1).reset_index(drop=True)
            a = actual.reindex(sorted(actual.columns), axis=1).reset_index(drop=True)
            if list(e.columns) != list(a.columns):
                print(f"FAIL {name}: columns {list(a.columns)} != {list(e.columns)}")
                n_fail += 1
                continue
            if len(e) != len(a):
                print(f"FAIL {name}: rows {len(a)} != {len(e)}")
                n_fail += 1
                continue
            bad = compare(e, a, lax_width)
            if bad:
                print(f"FAIL {name}: {[f'{c} ({why})' for c, why in bad]}")
                for c, why in bad[:2]:
                    if why == "value":
                        m = render(e[c]) != render(a[c])
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
    args = [x for x in sys.argv[1:] if not x.startswith("--")]
    sys.exit(main(args[0], args[1], "--lax-width" in sys.argv))
