"""Round-3 relational additions: remaining TPC-H-shaped queries.

Populated incrementally; each query registers itself via
``registry.register`` with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .registry import register
