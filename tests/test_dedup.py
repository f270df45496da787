"""LWW dedup: window vs salted two-phase vs an independent oracle."""

import duckdb
import pytest

from etl_warehouse_agnostic_spark.operators.dedup import (
    lww_dedup_salted,
    lww_dedup_window,
    split_ops,
)
from etl_warehouse_agnostic_spark.sources.generator import generate_changes

KEYS = ["conv_id", "turn_idx"]
ORDER = ["lsn", "ts"]


@pytest.fixture(scope="module")
def changes(spark):
    return generate_changes(spark, 5000, n_convs=80, turns_per_conv=10, seed=11).cache()


def _oracle(changes_df):
    pdf = changes_df.toPandas()
    con = duckdb.connect()
    con.register("ch", pdf)
    return con.sql(
        """
        SELECT conv_id, turn_idx, op, lsn FROM (
          SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY lsn DESC, ts DESC) rn
          FROM ch) WHERE rn = 1
        ORDER BY conv_id, turn_idx
        """
    ).fetchall()


def _result(df):
    return [
        (r.conv_id, r.turn_idx, r.op, r.lsn)
        for r in df.select("conv_id", "turn_idx", "op", "lsn")
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]


def test_window_dedup_matches_oracle(spark, changes):
    assert _result(lww_dedup_window(changes, KEYS, ORDER, num_salts=8)) == _oracle(changes)


def test_salted_dedup_matches_oracle(spark, changes):
    assert _result(lww_dedup_salted(changes, KEYS, ORDER, num_salts=8)) == _oracle(changes)


def test_salted_equals_window(spark, changes):
    a = _result(lww_dedup_window(changes, KEYS, ORDER, num_salts=1))
    b = _result(lww_dedup_salted(changes, KEYS, ORDER, num_salts=32))
    assert a == b


def test_one_row_per_key(spark, changes):
    d = lww_dedup_salted(changes, KEYS, ORDER)
    assert d.count() == d.select(*KEYS).distinct().count()


def test_split_ops(spark, changes):
    d = lww_dedup_salted(changes, KEYS, ORDER)
    ups, dels = split_ops(d)
    assert "op" not in ups.columns
    assert ups.count() + dels.count() == d.count()
    assert dels.where("op <> 'D'").count() == 0
