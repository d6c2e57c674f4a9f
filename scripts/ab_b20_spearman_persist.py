"""Interleaved A/B (r14 verdict task 2): b20 spearman's shared y-side
rank-table subtree — explicit persist vs AQE ReuseExchange — at sf0.1
and the sf1 synthetic decade, plus a per-run job/stage census and the
executed plan's ReusedExchange count.

Usage: python scripts/ab_b20_spearman_persist.py [reps] [sf_dirs...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from data_and_analytics_etl_spark.catalog import load_table  # noqa: E402
from data_and_analytics_etl_spark.operators.profile import spearman_corr  # noqa: E402
from data_and_analytics_etl_spark.session import get_spark  # noqa: E402


def build(spark, sf_dir, persist):
    li = load_table(spark, sf_dir, "lineitem")
    return spearman_corr(li, "l_returnflag", "l_quantity",
                         "l_extendedprice", (0.0, 51.0), (0.0, 120000.0),
                         persist_rank_table=persist)


def run_once(spark, sf_dir, persist, label):
    spark.catalog.clearCache()
    st = spark.sparkContext.statusTracker()
    j0 = max(st.getJobIdsForGroup() or [-1])
    spark.sparkContext.setJobDescription(label)
    df = build(spark, sf_dir, persist)
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    dt = time.monotonic() - t0
    jobs = len([j for j in (st.getJobIdsForGroup() or []) if j > j0])
    plan = df._jdf.queryExecution().executedPlan().toString()
    reused = plan.count("ReusedExchange")
    return dt, jobs, reused


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    dirs = sys.argv[2:] or ["/root/testdata/sf0.1",
                            os.path.join(os.path.dirname(os.path.dirname(
                                os.path.abspath(__file__))),
                                "spark-warehouse", "sf1-synthetic")]
    spark = get_spark("ab-b20-spearman",
                      extra_conf={"spark.driver.memory": "8g"})
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in dirs:
        res = {False: [], True: []}
        census = {}
        run_once(spark, sf_dir, False, "warm")  # warm-up, not recorded
        run_once(spark, sf_dir, True, "warm")
        for i in range(reps):
            for persist in (False, True):
                dt, jobs, reused = run_once(
                    spark, sf_dir, persist, f"spearman persist={persist} {i}")
                res[persist].append(dt)
                census[persist] = (jobs, reused)
        for persist in (False, True):
            a = sorted(res[persist])
            jobs, reused = census[persist]
            print(f"{sf_dir} persist={persist}: min={a[0]:.3f} "
                  f"med={a[len(a)//2]:.3f} raw={[round(x,3) for x in a]} "
                  f"jobs/run={jobs} reused_exchanges={reused}")


if __name__ == "__main__":
    main()
