"""Scaling evidence via the north rule's LITERAL launch path:
``spark-submit --py-files engine.zip`` on a multi-executor cluster at
two cluster sizes — N and 4N EXECUTORS.

``local-cluster[W,C,M]`` starts a standalone master plus W workers in
the driver JVM, and every worker forks a SEPARATE EXECUTOR JVM: real
driver↔executor RPC, netty shuffle-block transfers between processes,
python workers forked per executor, and ``--py-files`` shipping the
engine zip to each of them. That is the closest a single box can get
to a real cluster — unlike ``local[N]`` (threads inside one JVM, no
serialization boundary), an operator that accidentally depended on
driver-local state or an unshipped module fails here the same way it
would on YARN/K8s.

The job itself is byte-identical to the local path: run_ingest.py is
copied into the workdir and submitted WITHOUT the repo on PYTHONPATH,
so the only way the driver and executors can import
``etl_warehouse_agnostic_spark`` is the ``--py-files`` zip — proving
the packaging actually carries the engine.

Usage::

    python tools/bench_scaling_cluster.py --events 4000000 --n 1 \
        --cores-per-executor 4 --trials 2 --out BENCH/BENCH_SCALING_CLUSTER.json
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "etl_warehouse_agnostic_spark"


def build_zip(workdir: str) -> str:
    """Package the engine exactly as the docstring in run_ingest.py
    tells a cluster user to (``zip -r engine.zip etl_warehouse_agnostic_spark``)."""
    zpath = os.path.join(workdir, "engine.zip")
    src = os.path.join(REPO, PKG)
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, dirs, files in os.walk(src):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    return zpath


def spark_submit_bin() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def run_level(
    changes: str,
    executors: int,
    cores_per_exec: int,
    mem_mb: int,
    epochs: int,
    buckets: int,
    trials: int,
    workdir: str,
    with_models: bool,
) -> dict:
    total_cores = executors * cores_per_exec
    master = f"local-cluster[{executors},{cores_per_exec},{mem_mb}]"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY import path
    env.update(
        SPARK_GRAFT_MASTER=master,
        SPARK_GRAFT_DRIVER_MEM="8g",
        SPARK_LOCAL_IP="127.0.0.1",
        SPARK_LOCAL_HOSTNAME="localhost",
        PYSPARK_PYTHON=sys.executable,
        PYSPARK_DRIVER_PYTHON=sys.executable,
    )
    script = os.path.join(workdir, "run_ingest.py")
    shutil.copyfile(os.path.join(REPO, "run_ingest.py"), script)
    walls, results = [], []
    for t in range(trials):
        cmd = [
            spark_submit_bin(),
            "--master", master,
            "--driver-memory", "8g",  # builder-time conf is ignored under spark-submit
            "--py-files", os.path.join(workdir, "engine.zip"),
            "--conf", f"spark.executor.memory={max(1024, mem_mb - 1024)}m",
            "--conf", "spark.executor.cores=" + str(cores_per_exec),
            script,
            "--changes", changes, "--cores", str(total_cores),
            "--shuffle-partitions", str(max(2, total_cores * 2)),
            "--epochs", str(epochs), "--buckets", str(buckets),
            "--workdir", workdir, "--keep-workdir",
        ] + (["--with-models"] if with_models else [])
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=workdir, env=env)
        line = next(
            (l for l in reversed(out.stdout.strip().splitlines())
             if l.startswith("{")), None)
        if line is None:
            sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
            raise RuntimeError(f"spark-submit produced no result JSON (executors={executors})")
        r = json.loads(line)
        walls.append(r["wall_sec"])
        results.append(r)
        print(f"  executors={executors} trial={t}: wall={r['wall_sec']}s "
              f"eps={r['events_per_sec']} probes={r.get('probe_sec')}", flush=True)
    best = min(range(len(walls)), key=lambda i: walls[i])
    return {
        "executors": executors,
        "cores_per_executor": cores_per_exec,
        "trials_wall_sec": walls,
        "best": results[best],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--convs", type=int, default=50_000)
    ap.add_argument("--n", type=int, default=1, help="small cluster size N executors (large is 4N)")
    ap.add_argument("--cores-per-executor", type=int, default=4)
    ap.add_argument("--executor-mem-mb", type=int, default=6144)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--with-models", action="store_true")
    ap.add_argument("--workdir", default="/dev/shm/etlwa-scaling-cluster")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "BENCH_SCALING_CLUSTER.json"))
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    build_zip(args.workdir)
    changes = os.path.join(args.workdir, f"changes-{args.events}.parquet")
    if not os.path.exists(changes):
        print(f"generating {args.events} events …", flush=True)
        sys.path.insert(0, REPO)
        from etl_warehouse_agnostic_spark.session import get_spark
        from etl_warehouse_agnostic_spark.sources.generator import generate_changes

        spark = get_spark("scaling-gen")
        generate_changes(
            spark, args.events, n_convs=args.convs, turns_per_conv=50,
            seed=42, evolution_lsn=args.events // 2,
        ).write.mode("overwrite").parquet(changes)
        spark.stop()

    small = run_level(
        changes, args.n, args.cores_per_executor, args.executor_mem_mb,
        args.epochs, args.buckets, args.trials, args.workdir, args.with_models)
    large = run_level(
        changes, args.n * 4, args.cores_per_executor, args.executor_mem_mb,
        args.epochs, args.buckets, args.trials, args.workdir, args.with_models)

    t_n = min(small["trials_wall_sec"])
    t_4n = min(large["trials_wall_sec"])
    eff = (t_n / t_4n) / 4

    def _best_probe(level: dict) -> float | None:
        ps = level["best"].get("probe_sec") or {}
        return max(ps.values()) if ps else None

    p_n, p_4n = _best_probe(small), _best_probe(large)
    noise = {"probe_sec_n": p_n, "probe_sec_4n": p_4n}
    if p_n and p_4n:
        ratio = max(p_n, p_4n) / min(p_n, p_4n)
        noise["pair_probe_ratio"] = round(ratio, 2)
        noise["pairing_coherent"] = ratio <= 1.5

    doc = {
        "metric": "change_apply_scaling_efficiency",
        "launch": "spark-submit --py-files engine.zip --master local-cluster "
                  "(separate executor JVMs; repo NOT on PYTHONPATH — the zip "
                  "is the only way the engine reaches driver or executors)",
        "with_models": args.with_models,
        "n_executors": args.n,
        "4n_executors": args.n * 4,
        "cores_per_executor": args.cores_per_executor,
        "events": args.events,
        "epochs": args.epochs,
        "wall_sec_n": t_n,
        "wall_sec_4n": t_4n,
        "events_per_sec_n": round(args.events / t_n, 1),
        "events_per_sec_4n": round(args.events / t_4n, 1),
        "scaling_efficiency": round(eff, 3),
        "passes_0.8": eff >= 0.8,
        "noise": noise,
        "levels": [small, large],
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: doc[k] for k in
                      ("wall_sec_n", "wall_sec_4n", "events_per_sec_n",
                       "events_per_sec_4n", "scaling_efficiency", "passes_0.8")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
