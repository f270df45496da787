"""Warehouse-agnostic sink backends (the reference's headline feature).

The reference switches one pipeline between ClickHouse / Postgres /
Snowflake through a config file + connection-string factory
(config/warehouse_config.py:25-66, scripts/switch_warehouse.sh:1-66);
every extractor talks to ``get_connection_string()`` instead of a
concrete engine. This module is the Spark-native analog: one
``WarehouseBackend`` contract (merge / overwrite / read / epoch
idempotence), two real implementations, and a config-driven factory.

- :class:`LakeBackend` — the repo's snapshot-committed bucketed
  ``LakeTable`` (Iceberg-shaped copy-on-write parquet).
- :class:`DuckBackend` — an embedded SQL warehouse (DuckDB file),
  standing in for the reference's Postgres/ClickHouse targets: the
  MERGE is executed *by the warehouse* in one transaction
  (DELETE matched keys + INSERT the deduped delta — exactly what
  MERGE compiles to for an upsert-all pattern), with an ``_epochs``
  ledger making replayed epochs no-ops. On a real deployment the
  same class shape fronts Postgres over JDBC: only ``_connect`` and
  the bulk-transfer step change.

Scale note: Spark does the heavy lifting (scan, dedup, LWW collapse);
the warehouse applies only the per-epoch DELTA. The Spark→warehouse
transfer here is Arrow-batched (``toPandas`` on the deduped delta,
which is epoch-bounded, NOT table-sized); on a cluster this step is
the JDBC/COPY bulk path with the same O(delta) volume.
"""

from __future__ import annotations

import os
from typing import Any, Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from etl_warehouse_agnostic_spark.lake.table import LakeTable, MergeResult


class WarehouseBackend(Protocol):
    """The sink contract every warehouse must honor (J2/J3 + T2/T3)."""

    def merge(
        self,
        upserts: DataFrame,
        delete_keys: DataFrame | None = None,
        epoch_id: int | None = None,
    ) -> MergeResult: ...

    def overwrite(self, df: DataFrame, epoch_id: int | None = None) -> MergeResult: ...

    def read(self) -> DataFrame: ...

    def committed_epochs(self) -> list[int]: ...


class LakeBackend:
    """The default backend: snapshot-committed bucketed LakeTable."""

    def __init__(self, table: LakeTable):
        self.table = table

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_cols: list[str],
        **kw: Any,
    ) -> "LakeBackend":
        return cls(LakeTable.create(spark, path, schema, key_cols, **kw))

    def merge(self, upserts, delete_keys=None, epoch_id=None) -> MergeResult:
        return self.table.merge(upserts, delete_keys=delete_keys, epoch_id=epoch_id)

    def overwrite(self, df, epoch_id=None) -> MergeResult:
        return self.table.overwrite(df, epoch_id=epoch_id)

    def read(self) -> DataFrame:
        return self.table.read()

    def committed_epochs(self) -> list[int]:
        return self.table.committed_epochs()

    def evolve_schema(self, new_columns) -> T.StructType:
        return self.table.evolve_schema(new_columns)

    @property
    def schema(self) -> T.StructType:
        return self.table.schema


_SPARK_TO_DUCK = {
    "string": "VARCHAR",
    "int": "INTEGER",
    "bigint": "BIGINT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "boolean": "BOOLEAN",
    "timestamp": "TIMESTAMP",
    "timestamp_ntz": "TIMESTAMP",
    "date": "DATE",
}


class DuckBackend:
    """Embedded-SQL warehouse backend (Postgres/ClickHouse stand-in).

    MERGE semantics: within ONE transaction, delete the target rows
    whose key appears in the delta (upserts ∪ deletes), insert the
    upsert rows, record the epoch. A replayed epoch id short-circuits
    to a skipped no-op BEFORE any mutation — the same exactly-once
    contract LakeTable implements with snapshot summaries.
    """

    def __init__(self, db_path: str, table_name: str = "target"):
        import duckdb

        self.db_path = db_path
        self.table_name = table_name
        self._con = duckdb.connect(db_path)
        self._spark: SparkSession | None = None
        self._schema: T.StructType | None = None
        self._keys: list[str] = []

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        key_cols: list[str],
        **_: Any,
    ) -> "DuckBackend":
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        b = cls(path)
        b._spark = spark
        b._schema = schema
        b._keys = list(key_cols)
        cols = ", ".join(
            f'"{f.name}" {_SPARK_TO_DUCK[f.dataType.simpleString()]}' for f in schema.fields
        )
        b._con.execute(f"CREATE TABLE IF NOT EXISTS {b.table_name} ({cols})")
        b._con.execute(
            "CREATE TABLE IF NOT EXISTS _epochs (epoch_id BIGINT PRIMARY KEY, "
            "rows_written BIGINT, committed_at TIMESTAMP DEFAULT now())"
        )
        return b

    # -- helpers ------------------------------------------------------

    def _delta_frame(self, df: DataFrame):
        """Epoch-bounded delta → pandas via Arrow (the JDBC/COPY bulk
        path on a real warehouse; O(delta), never O(table))."""
        cols = [f.name for f in self._schema.fields if f.name in df.columns]
        return df.select(*cols).toPandas()

    @property
    def schema(self) -> T.StructType:
        return self._schema

    def evolve_schema(self, new_columns) -> T.StructType:
        """Add-only evolution, executed by the warehouse itself:
        ``ALTER TABLE ... ADD COLUMN`` per new field — exactly the
        reference's evolution path
        (extractors/leaflink/extractor.py:1053-1082). Existing rows
        read the new columns as NULL, same as LakeTable's add-only
        column projection."""
        fields = new_columns.fields if isinstance(new_columns, T.StructType) else list(new_columns)
        cur_names = set(self._schema.names)
        added = [f for f in fields if f.name not in cur_names]
        for f in added:
            self._con.execute(
                f'ALTER TABLE {self.table_name} ADD COLUMN '
                f'"{f.name}" {_SPARK_TO_DUCK[f.dataType.simpleString()]}'
            )
        if added:
            self._schema = T.StructType(list(self._schema.fields) + added)
        return self._schema

    def epoch_committed(self, epoch_id: int) -> bool:
        r = self._con.execute(
            "SELECT count(*) FROM _epochs WHERE epoch_id = ?", [epoch_id]
        ).fetchone()
        return bool(r[0])

    def committed_epochs(self) -> list[int]:
        return [r[0] for r in self._con.execute("SELECT epoch_id FROM _epochs ORDER BY 1").fetchall()]

    # -- contract -----------------------------------------------------

    def merge(self, upserts, delete_keys=None, epoch_id=None) -> MergeResult:
        if epoch_id is not None and self.epoch_committed(epoch_id):
            return MergeResult(0, epoch_id, 0, 0, 0, skipped=True)
        pdf = self._delta_frame(upserts)
        t = self.table_name
        key_eq = " AND ".join(f'{t}."{k}" = d."{k}"' for k in self._keys)
        self._con.execute("BEGIN TRANSACTION")
        try:
            self._con.register("_delta", pdf)
            self._con.execute(f"DELETE FROM {t} USING _delta d WHERE {key_eq}")
            if delete_keys is not None:
                dpdf = delete_keys.select(*self._keys).toPandas()
                self._con.register("_dkeys", dpdf)
                self._con.execute(f"DELETE FROM {t} USING _dkeys d WHERE {key_eq}")
            insert_cols = ", ".join(f'"{c}"' for c in pdf.columns)
            self._con.execute(
                f"INSERT INTO {self.table_name} ({insert_cols}) SELECT {insert_cols} FROM _delta"
            )
            if epoch_id is not None:
                self._con.execute(
                    "INSERT INTO _epochs (epoch_id, rows_written) VALUES (?, ?)",
                    [epoch_id, len(pdf)],
                )
            self._con.execute("COMMIT")
        except Exception:
            self._con.execute("ROLLBACK")
            raise
        return MergeResult(0, epoch_id, len(pdf), 0, 0)

    def overwrite(self, df, epoch_id=None) -> MergeResult:
        pdf = self._delta_frame(df)
        self._con.execute("BEGIN TRANSACTION")
        try:
            self._con.register("_full", pdf)
            self._con.execute(f"DELETE FROM {self.table_name}")
            insert_cols = ", ".join(f'"{c}"' for c in pdf.columns)
            self._con.execute(
                f"INSERT INTO {self.table_name} ({insert_cols}) SELECT {insert_cols} FROM _full"
            )
            if epoch_id is not None:
                self._con.execute(
                    "INSERT INTO _epochs (epoch_id, rows_written) VALUES (?, ?)",
                    [epoch_id, len(pdf)],
                )
            self._con.execute("COMMIT")
        except Exception:
            self._con.execute("ROLLBACK")
            raise
        return MergeResult(0, epoch_id, len(pdf), 0, 0)

    def read(self) -> DataFrame:
        """Whole-table read back into Spark. Embedded-file scope only:
        this materializes via the driver, which is fine for an embedded
        warehouse file but NOT the cluster path — fronting a real
        Postgres/ClickHouse, this method is ``spark.read.jdbc`` with
        ``partitionColumn``/``numPartitions`` (parallel, pushed-down),
        same contract, no driver bottleneck."""
        pdf = self._con.execute(f"SELECT * FROM {self.table_name}").df()
        if len(pdf) == 0:
            return self._spark.createDataFrame([], self._schema)
        return self._spark.createDataFrame(pdf, schema=self._schema)

    def close(self) -> None:
        self._con.close()


def make_warehouse(
    spark: SparkSession,
    config: dict[str, Any],
    schema: T.StructType,
    key_cols: list[str],
):
    """Config-driven backend switch — the reference's
    ``get_connection_string``/``switch_warehouse.sh`` analog. Config:
    ``{"type": "lake"|"duckdb", "path": ..., **backend kwargs}``."""
    wtype = config.get("type", "lake")
    path = config["path"]
    if wtype == "lake":
        kw = {k: v for k, v in config.items() if k not in ("type", "path")}
        return LakeBackend.create(spark, path, schema, key_cols, **kw)
    if wtype == "duckdb":
        return DuckBackend.create(spark, path, schema, key_cols)
    raise ValueError(f"unsupported warehouse type: {wtype!r}")
