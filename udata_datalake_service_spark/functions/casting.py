"""smart_cast — typed, null-on-failure casting of string columns.

Reference semantics (analysis/csv.py:202-219 ``smart_cast`` with
``failsafe=True``, helpers ``str2bool``/``str2float`` at csv.py:33-50,
golden tests tests/test_analysis/test_analysis_csv.py:89-123):

- empty string → NULL for every type
- bool: {"true","t","yes","y","1"} → True, {"false","f","no","n","0"} → False,
  anything else → NULL (failsafe)
- int: plain int strings; NUMBER-FORMAT FALLBACK accepts "2.0" → 2 and
  French formats "1 020,20" → 1020 — int(str2float(v)) truncates — with the
  reference's ``if _value:`` quirk mapping float-zero strings to NULL;
  non-numeric → NULL
- float: same normalization, "1 020,20" → 1020.2
- date/datetime: multi-format chain (see dates.py)
- json/string: passthrough

Implementation is pure column expressions: normalize (strip NBSP/space
thousands separators, comma→dot) then ``try_cast`` for null-on-failure —
all inside whole-stage codegen, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from udata_datalake_service_spark.functions.dates import (
    parse_date_multi,
    parse_datetime_multi,
)

_TRUE_VALUES = ("true", "t", "yes", "y", "1", "ok", "oui", "vrai")
_FALSE_VALUES = ("false", "f", "no", "n", "0", "non", "faux")


def _trimmed(col: Column) -> Column:
    # NULL-ify empty / whitespace-only strings first (reference: empty → None)
    t = F.trim(col)
    return F.when(t == "", F.lit(None)).otherwise(t)


def normalize_number(col: Column) -> Column:
    """'1 020,20' → '1020.20'; strips spaces/NBSP/underscore group seps,
    converts a decimal comma to a dot (str2float, analysis/csv.py:41-50)."""
    c = F.regexp_replace(col, r"[\s  _]", "")
    # comma is decimal sep only when there's no dot already (European format)
    return F.when(
        c.contains(",") & ~c.contains("."), F.regexp_replace(c, ",", ".")
    ).otherwise(F.regexp_replace(c, ",", ""))


def str2bool_col(col: Column) -> Column:
    """Reference str2bool (analysis/csv.py:33-38) with failsafe → NULL."""
    low = F.lower(_trimmed(col))
    return (
        F.when(low.isin(*_TRUE_VALUES), F.lit(True))
        .when(low.isin(*_FALSE_VALUES), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def smart_cast(python_type: str, col: Column) -> Column:
    """Column-expression equivalent of the reference's per-cell smart_cast.

    ``try_cast`` semantics give the ``failsafe=True`` null-on-failure
    behavior without a Python exception handler per cell.
    """
    c = _trimmed(col)
    if python_type == "string" or python_type == "json":
        return c
    if python_type == "bool":
        return str2bool_col(c)
    if python_type == "int":
        n = normalize_number(c)
        # direct int, then the reference's fallback ``int(str2float(v))``
        # which TRUNCATES ("1 020,20" → 1020, analysis/csv.py:210-213);
        # its ``if _value:`` guard also swallows 0.0 → NULL (quirk kept)
        as_long = n.try_cast("long")
        via_double = n.try_cast("double")
        return F.when(as_long.isNotNull(), as_long).otherwise(
            F.when(
                via_double.isNotNull() & (via_double != 0.0),
                via_double.try_cast("long"),
            )
        )
    if python_type == "float":
        return normalize_number(c).try_cast("double")
    if python_type == "date":
        return parse_date_multi(c)
    if python_type == "datetime":
        return parse_datetime_multi(c)
    raise ValueError(f"unknown python_type: {python_type}")
