"""Dump .explain("formatted") for bench queries to plans/r<N>/.

Usage:
    python scripts/capture_plans.py before   # -> plans/r13/<bench>_before.txt
    python scripts/capture_plans.py after    # -> plans/r13/<bench>_after.txt
    python scripts/capture_plans.py after b20_spearman b16_transitive_closure

Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1) on the engine
session (same conf bench.py uses), so the committed files are the plans
the bench actually timed. Eager queries (dedup_clusters) run their
iterative construction during capture; their file holds the FINAL
frame's plan plus a note.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES, EAGER_QUERIES  # noqa: E402
from data_and_analytics_etl_spark.queries import REGISTRY  # noqa: E402
from data_and_analytics_etl_spark.session import get_spark  # noqa: E402

ROUND = 14


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", f"r{ROUND}")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("daa-etl-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for bname, probe in BENCH_QUERIES.items():
        if only and bname not in only:
            continue
        df = REGISTRY[probe].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted")
        note = ""
        if bname in EAGER_QUERIES:
            note = ("NOTE: eager/iterative query — construction runs "
                    "join rounds before this final-frame plan.\n\n")
        path = os.path.join(out_dir, f"{bname}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"-- {bname} ({probe}) @ {sf_dir}\n{note}{txt}")
        n_ex = txt.count("Exchange")
        print(f"{bname}: {n_ex} Exchange -> {path}")


if __name__ == "__main__":
    main()
