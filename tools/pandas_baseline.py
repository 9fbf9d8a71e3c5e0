#!/usr/bin/env python3
"""Reference-equivalent throughput baseline.

The reference (justinminlee/healthcare-AIHW-ETL-pipeline) is an eager
single-node pandas script: melt wide measure columns to long form, drop
nulls, group-sum by dimensions, then chart aggregates (top-k, by-year).
This script runs THAT pipeline shape in pandas on the same parquet the
Spark engine benches against, so BENCH numbers have a concrete
reference-implementation baseline at the same scale.

Usage: python3 tools/pandas_baseline.py [sfDir]
Prints one JSON line: {"pandas_total_sec": ..., "steps": {...}, "rows": N}
"""
import json, sys, time
import pandas as pd

def main(sf_dir):
    t = {}
    t0 = time.time()
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    t["read"] = time.time() - t0
    n = len(li)

    # R1 melt (the reference's tables 4/5 unpivot, main.py compile step)
    t0 = time.time()
    tidy = li.melt(
        id_vars=["l_orderkey", "l_linenumber", "l_returnflag"],
        value_vars=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        var_name="measure", value_name="value").dropna(subset=["value"])
    t["melt"] = time.time() - t0

    # A1 clean aggregate (groupby dims -> sum)
    t0 = time.time()
    agg = tidy.groupby(["l_returnflag", "measure"], as_index=False)["value"].sum()
    t["agg"] = time.time() - t0

    # A2-A6 chart aggregates + T1/T2 top-k (streamlit_app chart prep)
    t0 = time.time()
    by_flag = li.groupby("l_returnflag", as_index=False)["l_quantity"].sum()
    top10 = li.groupby("l_partkey", as_index=False)["l_extendedprice"] \
        .sum().nlargest(10, "l_extendedprice")
    by_year = li.assign(year=li["l_shipdate"].dt.year) \
        .groupby("year", as_index=False)["l_extendedprice"].sum()
    t["charts"] = time.time() - t0

    # A11 profile (ydata minimal analog: per-column stats)
    t0 = time.time()
    prof = li[["l_quantity", "l_extendedprice"]].agg(
        ["count", "nunique", "min", "max", "mean", "std"])
    t["profile"] = time.time() - t0

    total = sum(t.values())
    print(json.dumps({"pandas_total_sec": round(total, 3),
                      "steps": {k: round(v, 3) for k, v in t.items()},
                      "rows": int(n),
                      "agg_rows": int(len(agg)) + len(by_flag) + len(top10)
                                  + len(by_year) + prof.size}))

if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
