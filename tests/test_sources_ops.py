"""S5 bounded-slice planning, S8 grid reader edges, P7 validity split,
P8 refresh skip."""

import os
import time

from pyspark.sql import functions as F

from etl_warehouse_agnostic_spark.control import should_skip_refresh
from etl_warehouse_agnostic_spark.lake.manifest import ManifestStore
from etl_warehouse_agnostic_spark.operators.validity import filter_valid
from etl_warehouse_agnostic_spark.sources.changes import ChangeStreamSource
from etl_warehouse_agnostic_spark.sources.generator import generate_changes
from etl_warehouse_agnostic_spark.sources.sheets import grid_to_table


def test_plan_bounded_slices_covers_range_under_cap(spark):
    chg = generate_changes(spark, 5000, n_convs=40, turns_per_conv=8, seed=3)
    src = ChangeStreamSource(spark, df=chg)
    slices = src.plan_bounded_slices(0, 5000, max_rows=700, granules=256)
    # exact coverage: contiguous, starts at lo, ends at hi
    assert slices[0][0] == 0 and slices[-1][1] == 5000
    for (a, b), (c, _) in zip(slices, slices[1:]):
        assert b == c and a < b
    # each slice under the cap (granularity 5000/256≈19 rows, no
    # single granule can exceed 700)
    total = 0
    for lo, hi in slices:
        n = src.read_slice(lo, hi).count()
        assert n <= 700
        total += n
    assert total == 5000
    # degenerate range
    assert src.plan_bounded_slices(10, 10) == []


def test_grid_to_table_header_pad_and_dupes(spark):
    grid = spark.createDataFrame(
        [
            (0, ["banner"]),
            (1, ["id", "name", "name", None]),
            (2, ["1", "alice", "x", "extra-trimmed? no: col_3 keeps it"]),
            (3, ["2", "bob"]),  # short row → NULL-padded
        ],
        "row_idx long, cells array<string>",
    )
    out = grid_to_table(grid, skip_rows=1)
    assert out.columns == ["id", "name", "name_1", "col_3"]
    rows = {r["id"]: r for r in out.collect()}
    assert rows["2"]["name"] == "bob" and rows["2"]["name_1"] is None
    assert rows["1"]["col_3"] is not None
    # headerless mode: widest row sets the width
    out2 = grid_to_table(grid, skip_rows=2, header=False)
    assert out2.columns == ["col_0", "col_1", "col_2", "col_3"]
    assert out2.count() == 2


def test_filter_valid_first_reason_wins(spark):
    df = spark.createDataFrame(
        [(1, "a", 5), (2, None, 5), (3, None, -1), (4, "d", -1)],
        "id int, s string, v int",
    )
    valid, rejects = filter_valid(df, required_cols=["s"], rules={"v_pos": F.col("v") > 0})
    assert [r["id"] for r in valid.orderBy("id").collect()] == [1]
    got = {r["id"]: r["_reject_reason"] for r in rejects.collect()}
    # null_s fires before v_pos for id=3 (both fail)
    assert got == {2: "null_s", 3: "null_s", 4: "v_pos"}
    # no rules → everything valid, empty reject frame with the column
    v2, r2 = filter_valid(df)
    assert v2.count() == 4 and r2.count() == 0
    assert "_reject_reason" in r2.columns


def test_filter_valid_null_predicate_lands_in_rejects(spark):
    """SQL three-valued logic: a rule evaluating to NULL (v > 0 with v
    NULL) must FAIL the rule — the row lands in rejects, never vanishes
    from both sides (valid ∪ rejects == input, exactly)."""
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, -1)], "id int, v int"
    )
    valid, rejects = filter_valid(df, rules={"v_pos": F.col("v") > 0})
    assert [r["id"] for r in valid.orderBy("id").collect()] == [1]
    got = {r["id"]: r["_reject_reason"] for r in rejects.collect()}
    assert got == {2: "v_pos", 3: "v_pos"}
    assert valid.count() + rejects.count() == df.count()


def test_should_skip_refresh(tmpdir_path):
    store = ManifestStore(os.path.join(tmpdir_path, "ck"))
    assert not should_skip_refresh(store, 24)  # never ran → extract
    now = time.time()
    committed = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(now - 3600))
    store.finalize(1, {"epoch": 1, "committed_at": committed,
                       "offsets": {}, "lineage": {"lsn_range": [0, 10]}})
    assert should_skip_refresh(store, 24, now=now)  # 1h old < 24h
    assert not should_skip_refresh(store, 0.5, now=now)  # 1h old > 30min


def test_asof_join_null_fields_do_not_mix_versions(spark):
    """A right version with a NULL field must not inherit that field
    from an OLDER version (the whole payload travels atomically)."""
    import datetime

    from etl_warehouse_agnostic_spark.operators.joins import asof_join

    d = datetime.datetime
    left = spark.createDataFrame(
        [("u1", d(2024, 1, 5), 100), ("u1", d(2024, 1, 1), 101), ("u2", d(2024, 1, 5), 102)],
        "user_id string, ts timestamp, event_id int",
    )
    right = spark.createDataFrame(
        [
            ("u1", d(2024, 1, 2), "gold", "NYC"),
            ("u1", d(2024, 1, 4), None, "LA"),  # tier became NULL in v2
        ],
        "user_id string, ts timestamp, tier string, city string",
    )
    out = {
        r["event_id"]: (r["r_tier"], r["r_city"])
        for r in asof_join(left, right, on=["user_id"]).collect()
    }
    assert out[100] == (None, "LA")  # v2 wholesale — NOT (gold, LA)
    assert out[101] == (None, None)  # no version at-or-before
    assert out[102] == (None, None)  # unknown key


def test_asof_join_no_duplicate_ts_column(spark):
    """Output must carry exactly ONE left-timestamp column, and it must
    be selectable/filterable downstream (no AMBIGUOUS_REFERENCE)."""
    import datetime

    from etl_warehouse_agnostic_spark.operators.joins import asof_join

    d = datetime.datetime
    left = spark.createDataFrame(
        [("u1", d(2024, 1, 5), 100)], "user_id string, ts timestamp, event_id int"
    )
    right = spark.createDataFrame(
        [("u1", d(2024, 1, 2), "gold")], "user_id string, ts timestamp, tier string"
    )
    out = asof_join(left, right, on=["user_id"])
    assert out.columns.count("ts") == 1
    # downstream reference on ts must resolve
    assert out.where(F.col("ts") >= d(2024, 1, 1)).select("ts", "r_tier").count() == 1


def test_asof_auto_split_engages_on_hot_key_and_matches_plain(spark):
    """Default 'auto' mode: on a skewed input (one key holding ~90% of
    rows) with a tiny threshold, the census must ENGAGE the pre-split,
    and the result must equal the plain unbounded-window join."""
    from pyspark.sql import functions as F

    from etl_warehouse_agnostic_spark.operators.joins import (
        _auto_split_seconds,
        asof_join,
    )

    n = 4000
    base = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, "hot").otherwise(
            F.concat(F.lit("cold_"), (F.col("id") % 7).cast("string"))
        ).alias("key"),
        (F.to_timestamp(F.lit("2025-01-01 00:00:00"))
         + F.make_dt_interval(secs=F.col("id").cast("double"))).alias("ts"),
        F.col("id").alias("payload"),
    )
    left = base
    right = base.where(F.col("id") % 5 == 0).select(
        "key", "ts", F.concat(F.lit("v"), F.col("payload").cast("string")).alias("ver")
    )

    def run(**kw):
        return sorted(
            (r.key, r.payload, r.r_ver)
            for r in asof_join(left, right, on=["key"], **kw).collect()
        )

    plain = run(split_seconds=None)
    auto = run(split_seconds="auto", auto_split_threshold=500, auto_sample_fraction=0.5)
    assert auto == plain

    # and the census really decided to split (not a silent None)
    lt = left.select("key", F.col("ts").alias("_ts"))
    assert _auto_split_seconds(lt, ["key"], 500, 0.5) is not None
    # a generous threshold leaves the plain window in place
    assert _auto_split_seconds(lt, ["key"], 10_000_000, 0.5) is None


def test_asof_auto_census_falls_back_on_numeric_ts(spark):
    """ADVICE r4: split_seconds='auto' (the default) must not crash on
    a numeric (non-timestamp) ordering column — the census falls back
    to the plain-window path, which handles numeric ts fine."""
    from pyspark.sql import functions as F

    from etl_warehouse_agnostic_spark.operators.joins import asof_join

    left = spark.range(2000).select(
        F.lit("k").alias("key"), F.col("id").alias("ts"), F.col("id").alias("pay")
    )
    right = spark.range(0, 2000, 100).select(
        F.lit("k").alias("key"), F.col("id").alias("ts"),
        F.concat(F.lit("v"), F.col("id").cast("string")).alias("ver"),
    )
    # tiny threshold so the census WOULD split if it could
    out = asof_join(left, right, on=["key"], auto_split_threshold=10,
                    auto_sample_fraction=0.5)
    rows = {r.pay: r.r_ver for r in out.collect()}
    assert rows[250] == "v200" and rows[99] == "v0" and rows[1999] == "v1900"
