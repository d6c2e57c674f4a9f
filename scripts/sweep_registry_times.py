"""Wall-time sweep of the ENTIRE probe registry at sf0.1 (r13/r14
optimization-round methodology): construction + one noop-sink action
per probe, cache cleared between probes, slowest rows first in the
report. Timing-only — correctness is verify_probes.py's job.

Usage: python scripts/sweep_registry_times.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_and_analytics_etl_spark.queries import REGISTRY  # noqa: E402
from data_and_analytics_etl_spark.session import get_spark  # noqa: E402


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("registry-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(REGISTRY):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"sweep {name}")
        t0 = time.monotonic()
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times[name] = round(time.monotonic() - t0, 3)
        except Exception:
            errors[name] = traceback.format_exc(limit=1)
            times[name] = round(time.monotonic() - t0, 3)
        print(f"{times[name]:9.3f}  {name}"
              + ("  ERROR" if name in errors else ""), flush=True)
    print("\n=== slowest 25 ===")
    for name, t in sorted(times.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{t:9.3f}  {name}")
    print(f"total={sum(times.values()):.1f}s n={len(times)} "
          f"errors={sorted(errors)}")
    if out_path:
        with open(out_path, "w") as fh:
            json.dump({"sf_dir": sf_dir, "times": times,
                       "errors": errors}, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
