"""Round-7 measurement harness (guide §1: measure first).

NOT the driver bench — ``bench.py`` is frozen.  This file isolates each
headline query with the noop sink, labels jobs, repeats, and can dump
``.explain("formatted")`` plans for the plan-diff evidence in
``plans/r07/``.

Usage::

    python bench_extra.py time  [repeats] [name ...]   # noop-sink timings
    python bench_extra.py plans <suffix>  [name ...]    # plans/r07/<q>_<suffix>.txt

Env contract mirrors bench.py: $SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _queries():
    from pyspark.sql import functions as F

    from etl_warehouse_agnostic_spark.harness import QUERIES

    import bench

    qs = {}
    for name in bench.HEADLINE:
        if name in QUERIES:
            qs[name] = QUERIES[name]
    qs["blocked_near_pairs"] = bench._q_blocked_near_pairs
    qs["silver_model"] = bench._q_silver_model
    # extra non-headline rows worth watching (registry-timed elsewhere)
    qs["recall_gates"] = QUERIES["recall_gates"]
    qs["training_pipeline"] = QUERIES["training_pipeline"]
    return qs


def main() -> int:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from etl_warehouse_agnostic_spark.session import get_spark

    spark = get_spark("bench-extra", cores=cpus, shuffle_partitions=cpus)
    qs = _queries()

    if mode == "plans":
        suffix = sys.argv[2]
        names = sys.argv[3:] or list(qs)
        out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r07")
        os.makedirs(out_dir, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
            print(f"wrote {name}_{suffix}.txt", flush=True)
        return 0

    # mode == "time"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = sys.argv[3:] or list(qs)
    # Arrow python-worker warm-up (same as bench.py)
    spark.range(10_000).mapInArrow(lambda it: it, "id long") \
        .write.mode("overwrite").format("noop").save()
    out: dict[str, dict] = {}
    for name in names:
        samples = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"{name} t{i}")
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(round(time.monotonic() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"all": out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
