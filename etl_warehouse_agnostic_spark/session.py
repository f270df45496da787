"""SparkSession factory with scale-oriented defaults.

Local mode is a stand-in for a multi-executor cluster: every knob here
(AQE, skew-join handling, Arrow, shuffle-partition sizing) is the one
you would set on a 1000-executor cluster; only ``master`` changes for
``spark-submit`` (see run_ingest.py).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

# Sessions already prewarmed (by JVM identity) — getOrCreate can hand
# the same session back to many get_spark calls.
_PREWARMED: set[int] = set()


def _prewarm(spark: SparkSession, parallelism: int) -> None:
    """One-time pipeline prewarm for a fresh session (opt-out via
    SPARK_GRAFT_PREWARM=0).

    The first heavy query of a session pays JVM/infra warm-up — C2
    compilation of shuffle writers/sorters, parquet+codec encoder
    init, broadcast machinery — measured at 15-20 s of a first
    4M-event CDC loop on this host while an identical second loop ran
    in ~8 s (round-7 profile; guide §1 steady-state measurement).
    This runs a tiny synthetic job through the same physical operators
    (window top-1 over a struct ordering, hash repartition, sorted
    partitionBy parquet write in both staging and at-rest codecs,
    broadcast anti-join) so later REAL queries start steady-state.
    Nothing here reads user data or caches any reusable result — the
    input is ``spark.range``, the output is discarded.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # enough per-core iterations to JIT; SPARK_GRAFT_PREWARM_ROWS
    # overrides the per-core row count for slower/faster hosts
    n = int(os.environ.get("SPARK_GRAFT_PREWARM_ROWS", "25000")) * max(4, parallelism)
    df = spark.range(n).select(
        F.concat(F.lit("k"), F.pmod("id", n // 8).cast("string")).alias("k"),
        (F.col("id") % 16).cast("int").alias("i"),
        F.col("id").alias("v"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("payload"),
    )
    w = Window.partitionBy("k", "i").orderBy(
        F.struct(F.col("v"), F.xxhash64("payload")).desc()
    )
    d = (
        df.withColumn("_rn", F.row_number().over(w)).where("_rn = 1").drop("_rn")
        .withColumn("_pb", F.pmod(F.xxhash64("k"), F.lit(64)).cast("int"))
    )
    root = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    tmp = os.path.join(root, f"spark-prewarm-{os.getpid()}")
    try:
        (
            d.repartition(F.col("_pb"))
            .sortWithinPartitions("_pb", "k", "i")
            .write.partitionBy("_pb").mode("overwrite")
            .option("compression", "snappy").parquet(tmp)
        )
        back = spark.read.parquet(tmp)
        (
            back.join(F.broadcast(back.select("k", "i").limit(n // 4)),
                      ["k", "i"], "left_anti")
            .write.mode("overwrite").option("compression", "zstd")
            .parquet(tmp + "-m")
        )
        # and the zstd DECODE path (table reads)
        spark.read.parquet(tmp + "-m").write.mode("overwrite").format("noop").save()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(tmp + "-m", ignore_errors=True)


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "etl-warehouse-agnostic-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores=None`` honours $SPARK_GRAFT_MASTER / $SPARK_GRAFT_CPUS so the
    same code runs under ``spark-submit --master yarn`` unchanged — the
    builder only supplies ``local[N]`` when no master is configured.
    """
    cores_n = cores or default_parallelism()
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores_n}]")
    if master.startswith("local"):
        # Sandboxed/containered hosts often have a blackhole DNS
        # resolver; a JVM name lookup that misses /etc/hosts then blocks
        # for its full timeout and recurs every cache-TTL — showing up
        # as intermittent multi-second idle stalls mid-job. Pin
        # everything to the loopback and cache resolutions forever.
        os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
        os.environ.setdefault("SPARK_LOCAL_HOSTNAME", "localhost")
    # One shuffle partition per core by default: in local mode extra
    # partitions only add scheduling overhead; on a real cluster this is
    # overridden upward (see run_ingest.py --shuffle-partitions).
    shuffle_n = shuffle_partitions or cores_n

    # Shuffle/spill dir: prefer tmpfs in this sandbox (the virtual disk
    # has erratic latency that serializes shuffle-heavy stages); on a
    # real cluster this is the executors' local NVMe via SPARK_LOCAL_DIRS.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None:
        local_dir = "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else None

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_n))
        .config("spark.default.parallelism", str(cores_n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # Task-side (v2) output commit: v1 serializes one rename per
        # task output on the driver — a real cost at one-file-per-bucket
        # layouts (and syscalls are expensive under gVisor sandboxes).
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.hadoop.parquet.summary.metadata.level", "NONE")
        .config("spark.shuffle.file.buffer", "1m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    )
    if master.startswith("local"):
        builder = (
            builder.config("spark.driver.host", "127.0.0.1")
            .config("spark.driver.bindAddress", "127.0.0.1")
            .config(
                "spark.driver.extraJavaOptions",
                "-Djava.net.preferIPv4Stack=true -Dsun.net.inetaddr.ttl=-1 "
                "-Dsun.net.inetaddr.negative.ttl=-1",
            )
        )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if os.environ.get("SPARK_GRAFT_PREWARM", "1") != "0" and id(spark) not in _PREWARMED:
        _PREWARMED.add(id(spark))
        _prewarm(spark, cores_n)
    return spark
