"""Typed cast engine: declared cast maps applied as ONE projection.

Re-expresses the reference's cast_to_datatype
(/root/reference/src/les_etl_pipeline/utils/silver_funcs.py:15-34), which
loops 127 sequential withColumn calls (plan bloat, O(n^2) analysis —
SURVEY.md §4.2), as a single select. Cast semantics preserved exactly:

    BooleanType   'y' -> True, anything else including NULL -> False (F7)
    DateType      to_date, non-conforming -> NULL (F8)
    DoubleType    cast + round 2dp (F9; money is double-2dp by design)
    IntegerType   plain cast, garbage -> NULL (F10)
    StringType    passthrough
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cast_expr(colname: str, dtype: T.DataType, legacy_bool_null_false: bool = True) -> Column:
    """Build the cast expression for one column per reference semantics."""
    c = F.col(colname)
    if isinstance(dtype, T.BooleanType):
        # silver_funcs.py:24-27 — exact match on 'y' (ingest already
        # lowercased, F11); null -> False (diverges from SQL 3VL; pass
        # legacy_bool_null_false=False for NULL-preserving casts)
        expr = F.when(c.cast("string") == "y", F.lit(True)).otherwise(
            F.lit(False) if legacy_bool_null_false else F.when(c.isNull(), None).otherwise(False)
        )
    elif isinstance(dtype, T.DateType):
        expr = F.to_date(c)  # silver_funcs.py:28-29
    elif isinstance(dtype, T.DoubleType):
        expr = F.round(c.cast("double"), 2)  # silver_funcs.py:30-31
    elif isinstance(dtype, T.IntegerType):
        expr = c.cast("int")  # silver_funcs.py:32-33
    else:
        expr = c.cast(dtype)
    return expr.alias(colname)


def cast_to_datatype(df: DataFrame, cast_map: dict[str, T.DataType], **kw) -> DataFrame:
    """Apply a {column: DataType} cast map in one projection; columns not
    in the map pass through unchanged. Missing columns are skipped (files
    may carry column subsets — generate_asset_silver.py:31-44)."""
    exprs = [
        cast_expr(c, cast_map[c], **kw) if c in cast_map else F.col(c)
        for c in df.columns
    ]
    return df.select(*exprs)
