"""Micro-benchmark for describe() variants (b6_stats_profile).

Runs the exact b6 shape N times and prints per-variant medians, so
pass-structure changes are measured instead of guessed. Usage:

    python tools/bench_b6.py [sf_dir] [runs]
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from feature_store_api_spark import get_spark
from feature_store_api_spark.sources.readers import read_parquet


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()
    from feature_store_api_spark.operators.statistics import describe

    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_returnflag"]

    # warmup
    describe(li, cols, exact_distinct=True)

    times = []
    for _ in range(runs):
        t0 = time.time()
        describe(li, cols, exact_distinct=True)
        times.append(time.time() - t0)
    print("describe exact_distinct median %.3f  all %s" % (
        statistics.median(times), [round(t, 3) for t in times]))


if __name__ == "__main__":
    main()
