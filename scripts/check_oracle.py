#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (dev tooling only —
not part of the engine). Usage:

    python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json entry in DuckDB against views over the sfDir
parquet tables, loads the Spark result parquet written by graft.Verify,
sorts columns by name + rows by value, and compares.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    failures = 0

    def audit_order(name, sql, sdf):
        # Order-ambiguity audit: rows tying on the ORDER BY keys must be
        # identical in every other column, else the two engines may emit
        # tied rows in different orders (hash mismatch if the driver
        # hashes in row order).
        try:
            import re
            tail = re.split(r'ORDER BY', sql, flags=re.I)[-1]
            keys = [k.strip().split()[0] for k in tail.split(',')]
            cols0 = list(sdf.columns)
            keycols = [cols0[int(k) - 1] if k.isdigit() else k.split('.')[-1]
                       for k in keys]
            other = [c for c in cols0 if c not in keycols]
            if other and len(sdf):
                g = sdf.groupby(keycols, dropna=False)[other].nunique()
                if (g > 1).any(axis=1).any():
                    print(f"[warn] {name}: ORDER BY keys do not totally "
                          f"order the result (tied rows differ)")
        except Exception:
            pass

    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"[FAIL] {name}: no spark output at {spark_dir}")
            failures += 1
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle sql error: {e}")
            failures += 1
            continue
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                        ignore_index=True)
        audit_order(name, sql, sdf)
        o, s = canon(odf), canon(sdf)
        if list(o.columns) != list(s.columns):
            print(f"[FAIL] {name}: columns oracle={list(o.columns)} spark={list(s.columns)}")
            failures += 1
            continue
        if len(o) != len(s):
            print(f"[FAIL] {name}: rows oracle={len(o)} spark={len(s)}")
            failures += 1
            continue
        # Dtype audit: the driver's gate hashes dtype-coerced values, so a
        # DuckDB HUGEINT/object column vs Spark int64 fails there even when
        # the values compare equal here. Treat dtype divergence as FAIL.
        dt_bad = [(c, str(o[c].dtype), str(s[c].dtype)) for c in o.columns
                  if o[c].dtype.kind != s[c].dtype.kind]
        if dt_bad:
            print(f"[FAIL] {name}: dtype mismatch {dt_bad}")
            failures += 1
            continue
        mismatch = None
        for ci, c in enumerate(o.columns):
            ov, sv = o[c].tolist(), s[c].tolist()
            for ri in range(len(ov)):
                if not values_equal(ov[ri], sv[ri]):
                    mismatch = (c, ri, ov[ri], sv[ri])
                    break
            if mismatch:
                break
        if mismatch:
            c, ri, ov, sv = mismatch
            print(f"[FAIL] {name}: value mismatch col={c} row={ri} oracle={ov!r} spark={sv!r}")
            failures += 1
        else:
            print(f"[ ok ] {name}: {len(o)} rows x {len(o.columns)} cols match")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
