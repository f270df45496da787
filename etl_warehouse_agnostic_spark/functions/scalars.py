"""Scalar Column helpers — the reference's scalar-function surface
re-expressed as JVM-side Spark Column expressions (whole-stage codegen,
no Python UDFs).

Reference ancestry (semantics only, see SURVEY.md §2.8):
  - Microsoft JSON dates ``/Date(1665059530000+0000)/`` parsed at
    extractors/repsly/extractor.py:512-548 and
    dbt/models/curated/repsly/client_notes.sql:36-56.
  - Dirty stringly-typed values '' / 'NULL' / 'nan' / '<NA>' nulled at
    extractors/repsly/extractor.py:735.
  - ``multiIf`` chains, e.g. dbt/models/curated/acumatica/bills.sql:33-37.
  - Boolean parsing from 'true'/'1'/'t'/'yes' at
    dbt/models/curated/repsly/visit_schedules_extended.sql:28-32.
  - Column sanitation (spaces/dashes/dots → '_') at
    extractors/google_sheets/extractor.py:219-238.
  - cityHash64 row identity / bucketing at
    dbt/models/raw/repsly/client_notes_raw.sql:43-51 → xxhash64 here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def bucket_of(key: ColumnOrName, num_buckets: int) -> Column:
    """Stable bucket id in [0, num_buckets) from a key column.

    ``pmod(xxhash64(k), n)`` — the Spark analog of Iceberg's
    ``bucket(n, k)`` transform and of the reference's cityHash64 keys.
    """
    return F.pmod(F.xxhash64(_col(key)), F.lit(num_buckets)).cast("int")


def salt_of(*keys: ColumnOrName, num_salts: int, seed: int = 17) -> Column:
    """Salt in [0, num_salts) for skew-splitting hot keys before a
    shuffle (SURVEY.md §2.9 T8). Derived from the full composite key so
    records of one hot conv_id spread across salts deterministically."""
    cols = [_col(k) for k in keys] + [F.lit(seed)]
    return F.pmod(F.xxhash64(*cols), F.lit(num_salts)).cast("int")


_MS_DATE_RE = r"^/Date\((-?\d+)([+-]\d{4})?\)/$"


def parse_microsoft_json_date(c: ColumnOrName) -> Column:
    """Parse ``/Date(1665059530000+0000)/`` (epoch millis, optional tz
    offset) into a timestamp; NULL when the shape doesn't match.

    Vectorized port of extractors/repsly/extractor.py:512-548 — regex
    extract + millis→timestamp, all JVM-side.
    """
    s = F.trim(_col(c))
    millis = F.regexp_extract(s, _MS_DATE_RE, 1)
    return F.when(
        millis != "", F.timestamp_millis(millis.cast("long"))
    ).otherwise(F.lit(None).cast("timestamp"))


def parse_timestamp_best_effort(c: ColumnOrName, formats: list[str] | None = None) -> Column:
    """``parseDateTimeBestEffortOrNull`` analog: try ISO variants, the
    Microsoft JSON-date shape, then date-only; first non-null wins."""
    s = F.trim(_col(c))
    candidates = [
        F.try_to_timestamp(s),  # ISO-8601 / Spark default
        F.try_to_timestamp(F.regexp_replace(s, r"Z$", "+00:00")),
        parse_microsoft_json_date(s),
    ]
    for fmt in formats or ["yyyy-MM-dd'T'HH:mm:ss.SSSXXX", "yyyy/MM/dd HH:mm:ss", "MM/dd/yyyy HH:mm:ss", "yyyy-MM-dd"]:
        candidates.append(F.try_to_timestamp(s, F.lit(fmt)))
    return F.coalesce(*candidates)


def multi_if(*branches: tuple[Column, Column], default: Column | None = None) -> Column:
    """ClickHouse ``multiIf(c1,v1,c2,v2,...,default)`` as a chained
    when/otherwise."""
    out = None
    for cond, val in branches:
        out = F.when(cond, val) if out is None else out.when(cond, val)
    if out is None:
        raise ValueError("multi_if needs at least one branch")
    return out.otherwise(default) if default is not None else out


_DIRTY = ["", "null", "none", "nan", "<na>", "n/a"]


def null_if_dirty(c: ColumnOrName) -> Column:
    """'' / 'NULL' / 'nan' / '<NA>' → NULL (case-insensitive)."""
    s = _col(c)
    return F.when(F.lower(F.trim(s)).isin(_DIRTY), F.lit(None)).otherwise(s)


def to_bool_lenient(c: ColumnOrName) -> Column:
    """'true'/'1'/'t'/'yes'/'y' → true; 'false'/'0'/'f'/'no'/'n' → false;
    else NULL."""
    s = F.lower(F.trim(_col(c)))
    return (
        F.when(s.isin("true", "1", "t", "yes", "y"), F.lit(True))
        .when(s.isin("false", "0", "f", "no", "n"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def try_decimal(c: ColumnOrName, precision: int = 18, scale: int = 2) -> Column:
    """``toDecimal64OrNull(x, 2)`` analog — regex-guarded try_cast."""
    s = F.trim(_col(c))
    return F.when(
        s.rlike(r"^-?\d+(\.\d+)?$"), s.cast(f"decimal({precision},{scale})")
    ).otherwise(F.lit(None).cast(f"decimal({precision},{scale})"))


def position_ci(haystack: ColumnOrName, needle: str) -> Column:
    """``positionCaseInsensitive(s, sub) > 0`` analog."""
    return F.instr(F.lower(_col(haystack)), needle.lower()) > 0


def sanitize_column_names(df: DataFrame) -> DataFrame:
    """Spaces/dashes/dots → '_', lowercase, dedupe with numeric suffix."""
    import re

    seen: dict[str, int] = {}
    mapping = []
    for name in df.columns:
        clean = re.sub(r"[^0-9a-zA-Z_]", "_", name.strip()).lower()
        clean = re.sub(r"_+", "_", clean).strip("_") or "col"
        if clean[0].isdigit():
            clean = f"c_{clean}"
        n = seen.get(clean, 0)
        seen[clean] = n + 1
        mapping.append((name, clean if n == 0 else f"{clean}_{n}"))
    return df.select([F.col(f"`{old}`").alias(new) for old, new in mapping])
