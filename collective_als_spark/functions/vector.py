"""Vector & cast column expressions — UDF-free, whole-stage-codegen-able.

The reference implements these as Scala UDFs / BLAS calls:
  - ``checkedCast`` UDF (reference ``CollectiveALS.scala:85-92``,
    ``CollectiveALSModel.scala:34-41``): numeric → Int with range guard.
  - predict dot product via ``blas.sdot`` inside a UDF (reference
    ``CollectiveALSModel.scala:54-60``), NaN when either side is null.

Here both are pure Catalyst expressions (higher-order array functions),
so prediction joins stay inside whole-stage codegen — no Python or JVM
UDF boundary in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INT_MAX = 2147483647
_INT_MIN = -2147483648


def checked_cast(c: Column | str) -> Column:
    """Numeric → int with an out-of-range guard (errors instead of wrapping).

    Mirrors the reference's checkedCast UDF semantics: accept any numeric,
    require integral value within Int range, else raise.
    """
    col = F.col(c) if isinstance(c, str) else c
    d = col.cast("double")
    ok = (d >= _INT_MIN) & (d <= _INT_MAX) & (d == F.floor(d))
    return (
        F.when(col.isNull(), F.lit(None).cast("int"))
        .when(ok, d.cast("int"))
        .otherwise(F.raise_error(F.format_string(
            "value %s out of Integer range or non-integral", d.cast("string"))))
    )


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array<float|double> columns; NaN if either null.

    NaN-for-cold-start matches reference ``CollectiveALSModel.scala:54-60``.
    """
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    prod = F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(ca.isNull() | cb.isNull(), F.lit(float("nan"))).otherwise(prod)


def l2_norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(ca, F.lit(0.0), lambda acc, x: acc + x * x))


def l2_normalize(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    n = l2_norm(ca)
    return F.transform(ca, lambda x: x / n)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return dot(ca, cb) / (l2_norm(ca) * l2_norm(cb))


def quantize_scale_int8(a: Column | str) -> Column:
    """Symmetric int8 quantization scale: max(|x|)/127, floored at 1e-12
    so all-zero vectors stay finite. Double precision throughout so the
    DuckDB oracle reproduces it bit-for-bit."""
    ca = F.col(a) if isinstance(a, str) else a
    maxabs = F.array_max(F.transform(ca, lambda x: F.abs(x)))
    return F.greatest(maxabs, F.lit(1e-12)) / F.lit(127.0)


def quantize_int8(a: Column | str, scale: Column) -> Column:
    """Round-half-up int8 codes: floor(x/scale + 0.5). ``floor`` (not
    ``round``) so Spark and DuckDB — whose ``round`` half-modes differ —
    produce identical codes from identical doubles."""
    ca = F.col(a) if isinstance(a, str) else a
    return F.transform(ca, lambda x: F.floor(x / scale + F.lit(0.5)).cast("bigint"))


def zorder_key(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two non-negative ints: bit i of
    ``a`` lands at position 2i, of ``b`` at 2i+1. Rows sorted by this
    key cluster BOTH dimensions, so parquet row-group min/max stats
    prune box predicates on either column — the multi-dimensional
    layout trick behind Delta/Iceberg Z-ORDER, as a plain codegen
    expression."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + (F.shiftright(ca, i).bitwiseAND(F.lit(1)).cast("bigint") * (2 ** (2 * i)))
            + (F.shiftright(cb, i).bitwiseAND(F.lit(1)).cast("bigint") * (2 ** (2 * i + 1)))
        )
    return z
