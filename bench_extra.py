"""Round-6 measurement harness (bench.py is FROZEN for driver timing —
this file carries the guide §1 isolation protocol: noop-sink timing so
the computation is measured without the count()-pruning effect, plan
capture for plans/r06/, and per-query loadavg sampling).

Usage:
  python bench_extra.py plan  <query> <outfile>   # explain("formatted")
  python bench_extra.py time  <query>[,query...] [n_runs]
  python bench_extra.py noop  <query>[,query...] [n_runs]

`time` counts (same methodology as bench.py); `noop` writes to the noop
sink (computes every column of every row).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench as B  # noqa: E402  (reuses the frozen query registry)
from osm_pbf2json_spark.session import get_session  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session():
    spark = get_session(
        master=f"local[{CPUS}]",
        app_name="osm-pbf2json-spark-bench-extra",
        shuffle_partitions=max(CPUS, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main():
    mode = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _session()

    if mode == "plan":
        out_path = sys.argv[3]
        df = B.BENCH_QUERIES[names[0]](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(out_path, "w") as f:
            f.write(plan)
        print(f"wrote {out_path} ({len(plan)} bytes)")
        spark.stop()
        return

    n_runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    # same warmup as bench.py: python workers spawned+imported once
    import pandas as pd

    def _noop(it):
        for pdf in it:
            yield pd.DataFrame({"n": [len(pdf)]})

    spark.range(0, CPUS * 8, 1, CPUS * 8).mapInPandas(_noop, "n long").count()
    B.bench_points(spark, sf_dir).count()

    keep_ids = {
        r.id() for r in list(spark.sparkContext._jsc.getPersistentRDDs().values())
    }

    def clear_stale_blocks():
        for r in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            if r.id() not in keep_ids:
                r.unpersist()

    results = {}
    for name in names:
        fn = B.BENCH_QUERIES[name]
        samples, loads = [], []
        for _ in range(n_runs):
            loads.append(round(os.getloadavg()[0], 2))
            spark.sparkContext.setJobDescription(f"r06:{name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            if mode == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            clear_stale_blocks()
        results[name] = {
            "best": min(samples),
            "samples": samples,
            "loadavg": loads,
        }
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
