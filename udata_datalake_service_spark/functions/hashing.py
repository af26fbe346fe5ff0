"""Hashing helpers (F1/F2) + engine-portable hash families for dedup/LSH.

- ``md5_table_name`` — converted-table naming: md5(url)
  (analysis/csv.py:144, and the SQL side at cli.py:304 must agree).
- ``hash64`` — deterministic 64-bit-ish integer hash built from md5 so the
  DuckDB oracle can reproduce it exactly (Spark's ``hash``/``xxhash64`` are
  engine-specific; md5 is bit-identical everywhere).
- ``minhash_hex`` — one MinHash value as the lexicographic MIN of seeded md5
  hex digests. A string-min over md5(seed||x) is a perfectly valid min-wise
  hash family and, being pure SQL, is replayable by the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_table_name(url_col: Column) -> Column:
    """Reference table-naming rule: parsing_table = md5(url)."""
    return F.md5(url_col)


def hash64(col: Column, seed: int = 0) -> Column:
    """Portable integer hash: first 15 hex chars of md5 → BIGINT (60 bits).

    DuckDB equivalent used in oracles:
    ``CAST(('0x' || substr(md5(seed || x), 1, 15)) AS BIGINT)`` — or the
    conv-free variant in oracle SQL builders.
    """
    return F.conv(F.substring(F.md5(F.concat(F.lit(str(seed)), col)), 1, 15), 16, 10).cast(
        "bigint"
    )


def minhash_hex(token_array: Column, seed: int) -> Column:
    """MIN over md5(seed || token) hex strings for one permutation.

    Used per-seed to build a MinHash signature; see llm/dedup.py.
    """
    hashed = F.transform(
        token_array, lambda t: F.md5(F.concat(F.lit(str(seed) + "|"), t))
    )
    return F.array_min(hashed)


def morton_key(a, b, bits: int = 16):
    """Z-order (Morton) interleave of two non-negative columns quantized to
    ``bits`` bits each — the multi-column clustering key ZORDER/liquid
    clustering uses: sorting by it keeps rows close in BOTH dimensions, so
    parquet row-group min/max stats bound both columns and scans with a
    predicate on EITHER column skip row groups (single-column sort gives
    this for one column only; pinned by test_scale_ops).

    Columns must already be non-negative integers in [0, 2^bits); callers
    quantize (e.g. ``F.col("x") % (1<<bits)`` or a rank bucket) — this
    function interleaves, deliberately leaving the domain mapping policy
    at the call site. Pure bit arithmetic (whole-stage codegen).
    """
    from pyspark.sql import functions as F

    acc = F.lit(0).cast("long")
    for i in range(bits):
        bit_a = F.shiftrightunsigned(a.cast("long"), i).bitwiseAND(F.lit(1))
        bit_b = F.shiftrightunsigned(b.cast("long"), i).bitwiseAND(F.lit(1))
        acc = (
            acc
            + F.shiftleft(bit_a, 2 * i + 1).cast("long")
            + F.shiftleft(bit_b, 2 * i).cast("long")
        )
    return acc


def md5_32(col: Column) -> Column:
    """Portable 32-bit hash: first 8 md5 hex chars → BIGINT in [0, 2³²).

    The ONE definition of the md5-bucket device used by the hashing trick
    (`llm/tfidf.hashed_features_sparse`), the DSIR bucket LMs, and
    `llm/mixing.uniform_unit_hash` — DuckDB replay:
    ``('0x' || substr(md5(x), 1, 8))::UBIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
