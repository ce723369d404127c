#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads <out>/oracle_sql.json, creates DuckDB views over the sf parquet
tables, runs each oracle SQL, reads the Spark result parquet, sorts
columns by name and rows by all columns, and compares cell values
exactly. Prints PASS/FAIL per query.

(Local development aid only — mirrors the driver-side gate; not part of
the shipped Spark library.)
"""
import json
import re
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def lint_sum_casts(oracle: dict) -> list:
    """Authoring-time guard for DuckDB HUGEINT-vs-Spark BIGINT schema
    drift: an integer SUM(...) in oracle SQL lands as HUGEINT (pandas
    float64) while Spark writes int64 — value-equal but hash-mismatched.
    Flag every SUM over an integer expression that is not CAST-wrapped.
    Window sums (SUM(...) OVER) are intermediates and exempt; sums over
    DOUBLE/DECIMAL expressions return DOUBLE and are exempt."""
    # value-preserving wrappers that may legitimately sit between the CAST
    # and the SUM, e.g. CAST(COALESCE(SUM(x), 0) AS BIGINT)
    wrappers = {"COALESCE", "ROUND", "ABS", "NULLIF", "GREATEST", "LEAST"}

    def cast_wrapped(pre: str) -> bool:
        while True:
            mm = re.search(r"([A-Za-z_]+)\s*\($", pre.rstrip())
            if not mm:
                return False
            fn = mm.group(1).upper()
            if fn == "CAST":
                return True
            if fn not in wrappers:
                return False
            pre = pre.rstrip()[:mm.start()]

    probs = []
    for name, sql in sorted(oracle.items()):
        # word boundary: don't match DuckDB's list_sum() HOF
        for m in re.finditer(r"(?<![A-Za-z_])SUM\s*\(", sql, re.I):
            if cast_wrapped(sql[:m.start()]):
                continue  # CAST(…SUM(...)…) — already pinned
            depth, i = 1, m.end()
            while i < len(sql) and depth:
                depth += sql[i] == "("
                depth -= sql[i] == ")"
                i += 1
            inner = sql[m.end():i - 1]
            if sql[i:].lstrip().upper().startswith("OVER"):
                continue
            if re.search(r"DOUBLE|DECIMAL|FLOAT|\d+\.\d", inner, re.I):
                continue
            probs.append(f"{name}: uncast integer SUM({inner[:60]}…) — "
                         "wrap as CAST(SUM(...) AS BIGINT)")
    return probs


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    out, sf = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for p in lint_sum_casts(oracle):
        print(f"LINT {p}")
        n_fail += 1
    for name, sql in sorted(oracle.items()):
        try:
            mine = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
            ref = con.sql(sql).df()
            a, b = norm(mine), norm(ref)
            if list(a.columns) != list(b.columns):
                raise AssertionError(f"columns {list(a.columns)} != {list(b.columns)}")
            if len(a) != len(b):
                raise AssertionError(f"rows {len(a)} != {len(b)}")
            for c in a.columns:
                av, bv = a[c], b[c]
                # dtype-faithful: DuckDB HUGEINT (SUM of ints) lands as
                # float64 while Spark writes int64 — value-equal but the
                # driver's hash sees different types. Fail loudly here.
                if av.dtype.kind != bv.dtype.kind:
                    raise AssertionError(
                        f"col {c} dtype kind {av.dtype}/{bv.dtype} differs "
                        f"(HUGEINT-vs-BIGINT? cast the oracle SUM to BIGINT)")
                if av.dtype.kind == "f":
                    # bit-exact after canonicalizing NaN: catches -0.0 vs
                    # 0.0 and 1-ulp drift that == would mask.
                    x = av.to_numpy(dtype="f8", na_value=np.nan).copy()
                    y = bv.to_numpy(dtype="f8", na_value=np.nan).copy()
                    x[np.isnan(x)] = np.nan
                    y[np.isnan(y)] = np.nan
                    xb, yb = x.view("u8"), y.view("u8")
                    ok = bool((xb == yb).all())
                    if not ok:
                        bad = int(np.argmax(xb != yb))
                        raise AssertionError(
                            f"col {c} float bits differ, e.g. row {bad}: "
                            f"{x[bad]!r} != {y[bad]!r}")
                    continue
                ok = (av.fillna("\0N") == bv.fillna("\0N")).all() if av.dtype == object \
                    else ((av.isna() & bv.isna()) | (av == bv)).all()
                if not ok:
                    bad = (~((av.isna() & bv.isna()) | (av == bv))).idxmax()
                    raise AssertionError(
                        f"col {c} differs, e.g. row {bad}: {av[bad]!r} != {bv[bad]!r}")
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {str(e).splitlines()[0]}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
