"""S4 — Excel readers (xlsx via openpyxl, xls via xlrd).

Reference: utils/reader.py:31-41,60-66 iterates ``openpyxl`` /
``xlrd`` rows on ``sheet_name``, skipping ``header_row_idx`` rows; the
files are capped at 12.5-50 MB (config_default.toml:54-55), so a
driver-side read → ``spark.createDataFrame`` is the honest mapping — the
parallel path at scale is converting the workbook to CSV/parquet once and
scanning that.

Both libraries are optional (not in the test container): the import is
gated and ``read_excel`` raises a clear error when unavailable, exactly
like the reference degrades when a format is not supported.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - exercised only where openpyxl is installed
    import openpyxl  # type: ignore

    HAS_OPENPYXL = True
except ImportError:
    openpyxl = None
    HAS_OPENPYXL = False

try:  # pragma: no cover - exercised only where xlrd is installed
    import xlrd  # type: ignore

    HAS_XLRD = True
except ImportError:
    xlrd = None
    HAS_XLRD = False


def iter_excel_rows(path: str, sheet_name: str | None = None, header_row_idx: int = 0):
    """Yield rows (lists of cell values) past the header offset —
    utils/reader.py:31-41 semantics. Dispatches on extension."""
    if path.endswith(".xlsx"):
        if not HAS_OPENPYXL:
            raise NotImplementedError(
                "xlsx reading needs openpyxl (not installed in this environment)"
            )
        wb = openpyxl.load_workbook(path, read_only=True, data_only=True)
        ws = wb[sheet_name] if sheet_name else wb.active
        for i, row in enumerate(ws.iter_rows(values_only=True)):
            if i < header_row_idx:
                continue
            yield list(row)
    elif path.endswith(".xls"):
        if not HAS_XLRD:
            raise NotImplementedError(
                "xls reading needs xlrd (not installed in this environment)"
            )
        book = xlrd.open_workbook(path)
        sheet = book.sheet_by_name(sheet_name) if sheet_name else book.sheet_by_index(0)
        for i in range(header_row_idx, sheet.nrows):
            yield sheet.row_values(i)
    else:
        raise ValueError(f"not an excel file: {path}")


def read_excel(
    spark: SparkSession,
    path: str,
    sheet_name: str | None = None,
    header_row_idx: int = 0,
) -> DataFrame:
    """Workbook → all-strings DataFrame (header = first yielded row), ready
    for the same infer_types/apply_types pipeline the CSV path uses."""
    rows = iter_excel_rows(path, sheet_name=sheet_name, header_row_idx=header_row_idx)
    header = [str(c) if c is not None else f"col_{i}" for i, c in enumerate(next(rows))]
    data = [
        tuple(None if c is None else str(c) for c in row)
        for row in rows
    ]
    return spark.createDataFrame(data, ", ".join(f"`{h}` string" for h in header))
