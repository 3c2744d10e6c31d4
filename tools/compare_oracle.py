#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run each oracle SQL in DuckDB
against the same parquet tables and diff it with the Spark result dumped by
graft.Verify. Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if not np.issubdtype(df[c].dtype, np.number):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))
    try:
        gated = json.load(open(f"{out_dir}/self_gated.json"))
    except OSError:
        gated = {}
    for name in sorted(gated):
        print(f"SELF-GATED {name}: no oracle by design ({gated[name]})")
    n_fail = 0
    for name in sorted(sql):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_fail += 1
            continue
        try:
            ora = con.execute(sql[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(ora)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: cols spark={list(a.columns)} oracle={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows spark={len(a)} oracle={len(b)}")
            n_fail += 1
            continue
        bad = None
        for c in a.columns:
            # DTYPE-STRICT (mirrors the driver's type-sensitive hashing):
            # int64 on one side vs float64 on the other is a FAIL even when
            # the values match — DuckDB types raw sum() as HUGEINT (rendered
            # float64 by pandas) while Spark emits int64; the driver's hash
            # distinguishes 7 from 7.0. Oracles must CAST(... AS BIGINT).
            a_int = np.issubdtype(a[c].dtype, np.integer)
            b_int = np.issubdtype(b[c].dtype, np.integer)
            a_flt = np.issubdtype(a[c].dtype, np.floating)
            b_flt = np.issubdtype(b[c].dtype, np.floating)
            if (a_int and b_flt) or (a_flt and b_int):
                bad = (f"col {c}: dtype mismatch spark={a[c].dtype} "
                       f"oracle={b[c].dtype} (uncast integer sum?)")
                break
            if np.issubdtype(a[c].dtype, np.number) and np.issubdtype(b[c].dtype, np.number):
                av, bv = a[c].to_numpy(dtype=float), b[c].to_numpy(dtype=float)
                # STRICT: bitwise equality (modulo NaN) — the engine's
                # decimal-sum + round6-both-sides policy makes every query
                # exactly reproducible across engines, so any drift is a bug
                nan_ok = np.isnan(av) == np.isnan(bv)
                close = (av == bv) | (np.isnan(av) & np.isnan(bv))
                if not (nan_ok.all() and close.all()):
                    i = int(np.argmin(nan_ok & close))
                    bad = f"col {c} row {i}: spark={av[i]} oracle={bv[i]}"
                    break
                # exact-match telemetry: report max abs diff
            else:
                if not a[c].equals(b[c]):
                    i = int((a[c] != b[c]).to_numpy().argmax())
                    bad = f"col {c} row {i}: spark={a[c][i]!r} oracle={b[c][i]!r}"
                    break
        if bad:
            print(f"FAIL {name}: {bad}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows, {len(a.columns)} cols)")
    print(f"{'ALL PASS' if n_fail == 0 else f'{n_fail} FAILURES'} / {len(sql)} queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
