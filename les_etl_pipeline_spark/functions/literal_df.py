"""Driver-literal DataFrames with plan-provable bounded cardinality.

``spark.createDataFrame(small_python_list)`` plans as ``Scan
ExistingRDD`` — textually indistinguishable from a data-scale RDD (a
checkpointed corpus prints the same), so the plan-hygiene gate cannot
prove a nested-loop join against it is safe. ``driver_literal_df``
builds the same rows as ``Generate explode(<literal array>)`` over
``Range(0, 1)``: every row is embedded in the plan text, the fan-out is
the literal's length, and the gate's structural recognizer
(`tests/test_plan_hygiene.py::_is_bounded`) can verify bounded-ness with
no named allowlist entry (VERDICT r8 #5 — the ``scalar_broadcast``
helper option).

Use it for metadata-scale tables that feed broadcast joins: centroid
tables, PQ codebooks, parameter grids — anything that is k x d driver
scalars by construction. Do NOT use it for data (the rows land in the
plan string; Spark caps literal sizes long before that would be a good
idea anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def driver_literal_df(
    spark: SparkSession, rows: list[tuple], schema: str
) -> DataFrame:
    """Rows-as-plan-literals DataFrame with exactly ``schema``.

    Value semantics match ``spark.createDataFrame(rows, schema)`` (each
    field is cast to its declared type), but the physical plan is
    ``Project <- Generate explode([...]) <- Range(0,1)`` — provably
    bounded to ``len(rows)`` rows by plan inspection alone."""
    st = StructType.fromDDL(schema)
    names = [f.name for f in st.fields]
    types = [f.dataType.simpleString() for f in st.fields]

    def field_lit(value, dtype: str):
        if isinstance(value, (list, tuple)):
            arr = F.array(*[F.lit(v) for v in value]) if value else F.array()
            return arr.cast(dtype)
        return F.lit(value).cast(dtype)

    structs = [
        F.struct(
            *[field_lit(v, t).alias(n) for v, t, n in zip(row, types, names)]
        )
        for row in rows
    ]
    if not structs:
        return spark.createDataFrame([], schema)
    return (
        spark.range(1)
        .select(F.explode(F.array(*structs)).alias("_s"))
        .select(*[F.col(f"_s.{n}").alias(n) for n in names])
    )
