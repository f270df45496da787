"""Sheet-range source (SURVEY.md §2.1 S8): a raw cell grid → a typed
table.

The reference pulls ``values().get(range)`` and fixes the grid up in
Python: skip leading rows, take the next row as the header, pad/trim
every data row to the header width (get_sheet_data,
extractors/google_sheets/extractor.py:450-523). Here the grid is a
DataFrame of ``(row_idx, cells array<string>)`` — however it arrived
(API fetch, CSV landing, JSON export) — and the same fixup is Column
expressions; only the single header row is collected to the driver.
Pair with :func:`operators.flatten.clean_tabular` for the dirty-null
scrub + row numbering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_to_table(
    grid: DataFrame,
    row_idx_col: str = "row_idx",
    cells_col: str = "cells",
    skip_rows: int = 0,
    header: bool = True,
) -> DataFrame:
    """Convert a cell grid to columns.

    - rows with ``row_idx < skip_rows`` are dropped (banner rows);
    - with ``header=True`` the first surviving row names the columns
      (one driver lookup of one row — the only non-distributed step);
    - data rows are padded (NULL) or trimmed to the header width,
      mirroring the reference's row-length normalization.
    """
    g = grid.where(F.col(row_idx_col) >= skip_rows)
    if header:
        first = g.orderBy(F.asc(row_idx_col)).select(row_idx_col, cells_col).first()
        if first is None:
            raise ValueError("empty grid: no header row")
        raw = [str(x) if x not in (None, "") else f"col_{i}" for i, x in enumerate(first[1])]
        seen: dict[str, int] = {}
        names = []
        for n in raw:  # dedupe repeated headers with a numeric suffix
            k = seen.get(n, 0)
            seen[n] = k + 1
            names.append(n if k == 0 else f"{n}_{k}")
        data = g.where(F.col(row_idx_col) > first[0])
    else:
        width_row = g.agg(F.max(F.size(cells_col))).first()
        names = [f"col_{i}" for i in range(int(width_row[0] or 0))]
        data = g
    cols = [
        F.try_element_at(F.col(cells_col), F.lit(i + 1)).alias(n)  # NULL-pads short rows
        for i, n in enumerate(names)
    ]
    return data.select(*cols)
