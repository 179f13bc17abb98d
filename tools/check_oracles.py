#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql against graft.Verify output.

Mimics the driver's compare: for each query with oracle SQL, run the SQL in
DuckDB over the sf tables, sort columns by name, and compare row counts,
column names/types, and values.

Usage: python3 tools/check_oracles.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        try:
            act = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark output missing: {e}")
            n_bad += 1
            continue
        exp = exp[sorted(exp.columns)]
        act = act[sorted(act.columns)]
        if list(exp.columns) != list(act.columns):
            print(f"FAIL {name}: columns {list(act.columns)} != oracle "
                  f"{list(exp.columns)}")
            n_bad += 1
            continue
        if len(exp) != len(act):
            print(f"FAIL {name}: rows {len(act)} != oracle {len(exp)}")
            n_bad += 1
            continue
        exp_s = exp.astype(str).values.tolist()
        act_s = act.astype(str).values.tolist()
        # row-order independent (driver hashes sorted values)
        if sorted(map(tuple, exp_s)) != sorted(map(tuple, act_s)):
            diffs = [
                (e, a) for e, a in zip(sorted(map(tuple, exp_s)),
                                       sorted(map(tuple, act_s))) if e != a]
            print(f"FAIL {name}: {len(diffs)} value diffs; first: "
                  f"{diffs[0] if diffs else '?'}")
            n_bad += 1
            continue
        # dtype mismatch is a schema_match risk even when values print alike
        dt_exp = [str(d) for d in exp.dtypes]
        dt_act = [str(d) for d in act.dtypes]
        flag = "" if dt_exp == dt_act else f"  [dtype: {dt_act} vs {dt_exp}]"
        print(f"OK   {name}: {len(act)} rows{flag}")
        n_ok += 1
    no_oracle = []
    import os
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(os.path.join(out_dir, d)) and d not in oracle:
            no_oracle.append(d)
    if no_oracle:
        print(f"NO_ORACLE: {no_oracle}")
    print(f"{n_ok} ok, {n_bad} failed, {len(no_oracle)} without oracle")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
