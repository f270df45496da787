"""Row-validity filtering (SURVEY.md §2.2 P7) — the quarantine split.

The reference drops invalid rows inline per model (e.g. ``WHERE
TimeStamp IS NOT NULL`` / non-empty business keys,
dbt/models/curated/repsly/client_notes.sql and siblings). Named here as
one operator that both FILTERS and ACCOUNTS: the reject side keeps the
first failed rule so DQ metrics (§2.11 A3/A4) fall out of a groupBy on
``_reject_reason`` instead of a second pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_valid(
    df: DataFrame,
    required_cols: list[str] | None = None,
    rules: dict[str, Column] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split df into (valid, rejects).

    ``required_cols`` become ``isNotNull`` rules named
    ``null_<col>``; ``rules`` maps reason → predicate that VALID rows
    must satisfy. Rejects carry ``_reject_reason`` = the first failed
    rule (deterministic: required-column rules in order, then ``rules``
    in insertion order). Both outputs are lazy projections of one scan —
    Catalyst pushes the combined predicate down; no extra shuffle.
    """
    named: list[tuple[str, Column]] = []
    for c in required_cols or []:
        named.append((f"null_{c}", F.col(c).isNotNull()))
    for reason, pred in (rules or {}).items():
        # Null-safe: a predicate that evaluates to NULL (SQL three-valued
        # logic, e.g. v > 0 with v NULL) must FAIL the rule, not vanish
        # from both sides of the split.
        named.append((reason, F.coalesce(pred, F.lit(False))))
    if not named:
        return df, df.where(F.lit(False)).withColumn("_reject_reason", F.lit(None).cast("string"))
    all_ok = F.lit(True)
    for _, pred in named:
        all_ok = all_ok & pred
    reason = None
    for r, pred in reversed(named):
        reason = F.when(~pred, F.lit(r)) if reason is None else F.when(~pred, F.lit(r)).otherwise(reason)
    valid = df.where(all_ok)
    rejects = df.where(~all_ok).withColumn("_reject_reason", reason)
    return valid, rejects
