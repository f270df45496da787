"""Gold-maintenance strategy shoot-out: affected-group RECOMPUTE vs
delta ARITHMETIC maintaining the SAME day rollup on the SAME
day-partitioned bronze over the same change stream.

The two strategies trade differently with delta shape:

- ``AggregateModel`` (recompute, ``day_of``-pruned) re-aggregates every
  row of every AFFECTED DAY each cycle. The generator's ``ts`` tracks
  ``lsn``, so updates/deletes of old keys re-stamp rows into the
  current day while their OLD rows sit in historical days — the
  old-group time-travel lookup widens the affected ``day_range``
  toward the whole table. Cost grows with GROUP SIZE (rows/day).
- ``DeltaAggregateModel`` folds ``old + agg(upserts) − agg(pre-epoch
  rows of the delta's keys)`` — reads the delta's source buckets once
  (pinned pre-epoch snapshot, semi-joined to the delta's keys) and
  touched gold buckets, independent of group size.

The headline number is the SPARSE TAIL: a handful of hot conversations
updated after the table is fully built (the common CDC shape). Their
historical rows are scattered across ~every day, so the recompute
model must rescan ~the whole table while the delta model reads a
handful of buckets. The dense phase (every epoch touches every day)
brackets the worst case for both.

Run order sandwiches delta between two recompute runs (R, D, R2;
overhead quoted against min(R, R2)) with CPU probes per case, so the
host's documented bimodal drift brackets the comparison. Both final
gold tables must agree row-for-row — the artifact embeds that check.

Usage::

    python tools/bench_gold_strategies.py --events 8000000 --epochs 6 \
        --out BENCH/BENCH_GOLD_STRATEGIES_r6.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=8_000_000)
    ap.add_argument("--convs", type=int, default=100_000)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--workdir", default="/dev/shm/etlwa-goldstrat")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BENCH_GOLD_STRATEGIES.json"))
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etl_warehouse_agnostic_spark.engine import CdcEngine
    from etl_warehouse_agnostic_spark.lake.manifest import ManifestStore
    from etl_warehouse_agnostic_spark.lake.table import LakeTable
    from etl_warehouse_agnostic_spark.schemas import KEY_COLS, TRANSCRIPTS_SCHEMA_V2
    from etl_warehouse_agnostic_spark.session import get_spark
    from etl_warehouse_agnostic_spark.silver import AggregateModel, DeltaAggregateModel
    from etl_warehouse_agnostic_spark.sources.changes import ChangeStreamSource
    from etl_warehouse_agnostic_spark.sources.generator import generate_changes

    spark = get_spark("bench-goldstrat", cores=args.cores,
                      shuffle_partitions=args.cores * 2)

    os.makedirs(args.workdir, exist_ok=True)
    changes = os.path.join(args.workdir, f"changes-{args.events}.parquet")
    if not os.path.exists(changes):
        generate_changes(
            spark, args.events, n_convs=args.convs, turns_per_conv=50,
            seed=42, evolution_lsn=args.events // 2,
        ).write.mode("overwrite").parquet(changes)

    # Sparse localized tail (same recipe as bench_models): ~10 hot convs
    # re-stamped past the main stream. Their event ts values keep the
    # ORIGINAL spread over the stream's ~90 days — exactly the shape
    # that forces the day-recompute model to open ~every day partition.
    tail = os.path.join(args.workdir, f"tail-{args.events}.parquet")
    if not os.path.exists(tail):
        hot = [r.conv_id for r in
               spark.read.parquet(changes).select("conv_id").distinct()
               .orderBy(F.pmod(F.hash("conv_id"), F.lit(2**31 - 1)))
               .limit(10).collect()]
        src_max = spark.read.parquet(changes).agg(F.max("lsn")).collect()[0][0]
        (spark.read.parquet(changes)
         .where(F.col("conv_id").isin(hot))
         .withColumn("lsn", F.col("lsn") + F.lit(src_max))
         .write.mode("overwrite").parquet(tail))

    RECOMPUTE_SCHEMA = T.StructType([
        T.StructField("day", T.DateType(), False),
        T.StructField("rows", T.LongType(), True),
        T.StructField("chars", T.LongType(), True),
    ])
    DELTA_SCHEMA = T.StructType([
        T.StructField("day", T.DateType(), False),
        T.StructField("rows", T.LongType(), True),
        T.StructField("chars", T.LongType(), True),
        T.StructField("_nn_chars", T.LongType(), True),
    ])

    def day_groups(rows):
        return rows.withColumn("day", F.to_date("ts"))

    def day_agg(rows):
        return rows.groupBy("day").agg(
            F.count(F.lit(1)).cast("long").alias("rows"),
            F.sum(F.length("text")).cast("long").alias("chars"),
        )

    probe_salt = [0]

    def probe() -> float:
        best = float("inf")
        for _ in range(2):
            probe_salt[0] += 1
            t0 = time.monotonic()
            spark.range(probe_salt[0], probe_salt[0] + 6_000_000 * args.cores).select(
                F.sum(F.xxhash64("id").cast("decimal(38,0)"))).collect()
            best = min(best, time.monotonic() - t0)
        return round(best, 3)

    probe()  # codegen warm-up, unrecorded

    def run_case(tag: str, strategy: str) -> tuple[dict, "LakeTable"]:
        root = os.path.join(args.workdir, tag)
        shutil.rmtree(root, ignore_errors=True)
        bronze = LakeTable.create(
            spark, os.path.join(root, "bronze"), TRANSCRIPTS_SCHEMA_V2,
            KEY_COLS, num_buckets=args.buckets,
            partition_spec={"col": "ts", "transform": "day"},
        )
        if strategy == "recompute":
            gold_t = LakeTable.create(
                spark, os.path.join(root, "gold"), RECOMPUTE_SCHEMA, ["day"],
                num_buckets=args.buckets)
            gold = AggregateModel(
                gold_t, bronze, ["day"], day_agg,
                name="day_rollup_recompute", row_groups=day_groups,
                day_of="day")
        else:
            gold_t = LakeTable.create(
                spark, os.path.join(root, "gold"), DELTA_SCHEMA, ["day"],
                num_buckets=args.buckets)
            gold = DeltaAggregateModel(
                gold_t, bronze, ["day"], {"chars": F.length("text")},
                count_col="rows", name="day_rollup_delta",
                row_groups=day_groups)
        eng = CdcEngine(
            spark, bronze, ManifestStore(os.path.join(root, "ck")),
            source_partitions=args.cores, silver_models=[gold],
        )
        src = ChangeStreamSource(spark, path=changes)
        max_lsn = src.max_lsn()
        epoch_size = max(1, (max_lsn + args.epochs - 1) // args.epochs)
        p0 = probe()
        walls, scans = [], []
        t0 = time.monotonic()
        while True:
            te = time.monotonic()
            if not eng.run(src, epoch_size=epoch_size, max_epochs=1):
                break
            walls.append(round(time.monotonic() - te, 3))
            scans.append(gold.last_scan)
        wall = time.monotonic() - t0
        tail_src = ChangeStreamSource(spark, path=tail)
        tt = time.monotonic()
        tail_res = eng.run(tail_src, epoch_size=tail_src.max_lsn())
        tail_wall = round(time.monotonic() - tt, 3)
        tail_scan = gold.last_scan
        p1 = probe()

        def scan_summary(s):
            if s is None:
                return None
            out = {"mode": s["mode"]}
            for k in ("buckets", "src_buckets", "gold_buckets"):
                if s.get(k) is not None:
                    out[f"n_{k}"] = len(s[k])
            if s.get("day_range") is not None:
                out["day_range"] = [str(v) for v in s["day_range"]]
            return out

        warm = walls[1:] or walls
        doc = {
            "tag": tag, "strategy": strategy,
            "wall_sec": round(wall, 3),
            "events_per_sec": round(max_lsn / wall, 1),
            "epoch_walls_sec": walls,
            "warm_epoch_mean_sec": round(sum(warm) / len(warm), 3),
            "dense_epoch_scans": [scan_summary(s) for s in scans],
            "sparse_tail_wall_sec": tail_wall,
            "sparse_tail_events": sum(r.rows_read for r in tail_res),
            "sparse_tail_scan": scan_summary(tail_scan),
            "probe_before_sec": p0, "probe_after_sec": p1,
            "gold_rows": gold_t.read().count(),
        }
        print(json.dumps(doc), flush=True)
        return doc, gold_t

    r1, gold_r1 = run_case("recompute1", "recompute")
    d, gold_d = run_case("delta", "delta")
    r2, gold_r2 = run_case("recompute2", "recompute")

    # Cross-strategy correctness: both final gold tables must agree
    # row-for-row on the visible columns (integer measures — exact).
    def snap(t):
        return sorted(
            (str(r["day"]), r["rows"], r["chars"])
            for r in t.read().select("day", "rows", "chars").collect()
        )

    agree = snap(gold_r1) == snap(gold_d) == snap(gold_r2)
    best_r = min((r1, r2), key=lambda c: c["warm_epoch_mean_sec"])
    out = {
        "metric": "gold_maintenance_strategy_comparison",
        "events": args.events, "epochs": args.epochs,
        "cores": args.cores, "buckets": args.buckets,
        "rollup": "day x (count, sum(length(text))) over day-partitioned bronze",
        "recompute_runs": [r1, r2],
        "delta_run": d,
        "strategies_agree": agree,
        "warm_epoch_delta_vs_best_recompute": round(
            d["warm_epoch_mean_sec"] / best_r["warm_epoch_mean_sec"], 3),
        "sparse_tail_delta_vs_best_recompute": round(
            d["sparse_tail_wall_sec"]
            / min(r1["sparse_tail_wall_sec"], r2["sparse_tail_wall_sec"]), 3),
    }
    with open(args.out, "w") as f:
        f.write(json.dumps(out) + "\n")
    print(json.dumps(out), flush=True)
    if not agree:
        print("FAIL: strategies disagree on final gold content", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
