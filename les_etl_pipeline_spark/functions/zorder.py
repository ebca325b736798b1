"""Z-order (Morton) interleave keys for data-skipping file layout.

Sorting/clustering a table by a space-filling curve over two (or more)
filter columns makes parquet row-group min/max zone maps selective on
BOTH columns at once — the standard layout trick behind Delta/Iceberg
`OPTIMIZE ZORDER BY`. At 100 TB the key is computed once at write time
(`df.repartitionByRange(n, zkey).sortWithinPartitions(zkey)`) and every
later scan that filters either dimension prunes row groups for free.

The same bit plan is emitted twice — as a Spark Column and as ANSI SQL —
so an external engine can verify the key bit-for-bit (both run identical
two's-complement shift/mask arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, bits: int) -> Column:
    """Interleave the low ``bits`` of ``x`` (even bit positions) and
    ``y`` (odd positions) into a single ``2*bits``-wide integer key.
    Pure shift/mask column arithmetic — whole-stage-codegen friendly,
    no UDF."""
    out: Column | None = None
    for i in range(bits):
        xb = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        yb = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        out = xb + yb if out is None else out + xb + yb
    assert out is not None, "bits must be >= 1"
    return out


def morton_sql(x: str, y: str, bits: int) -> str:
    """The identical interleave as an SQL expression (DuckDB/ANSI bit
    operators), for engine-portable verification of the key."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)
