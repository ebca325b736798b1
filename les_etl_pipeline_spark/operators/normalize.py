"""Ingest normalization: the reference's driver-side CSV row cleaning
(S4/F11-F13, /root/reference/src/les_etl_pipeline/utils/bronze_funcs.py:
62-143) re-expressed as native Column transforms over a distributed scan —
no /tmp downloads, no Python row loops, no driver materialization
(SURVEY.md §4.2 anti-pattern 1).

Semantics preserved:
- null markers: empty string, 'ND<digit>'-prefixed, 'No Collateral' -> NULL
  (bronze_funcs.py:97-104)
- everything else lower().strip()
- lineage from the file name: {ed_code}_{YYYY}_{MM}_{DD}_*.csv ->
  ed_code (token 0), pcd (tokens 1-3 joined '-') (bronze_funcs.py:108-110)
- SCD2 + identity stamping (F1-F6, bronze_funcs.py:117-141):
  checksum, valid_from, valid_to, iscurrent, part
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: null markers (bronze_funcs.py:97-104). ND1..ND7 are EDW "no data" codes.
ND_PATTERN = r"^ND\d?"


def clean_cell(c: Column | str) -> Column:
    """F11: null-marker normalize + lower/trim. NULL-safe."""
    c = F.col(c) if isinstance(c, str) else c
    t = F.trim(c)
    return F.when(
        c.isNull()
        | (t == "")
        | t.rlike(ND_PATTERN)
        | (t == "No Collateral"),
        F.lit(None),
    ).otherwise(F.lower(t))


def normalize_cells(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Apply clean_cell to every (or the given) column in ONE projection."""
    target = set(cols) if cols is not None else set(df.columns)
    return df.select(
        *[clean_cell(c).alias(c) if c in target else F.col(c) for c in df.columns]
    )


def lineage_from_filename(df: DataFrame) -> DataFrame:
    """F13: derive filename / ed_code / pcd columns from the scanned file
    path ({ed_code}_{YYYY}_{MM}_{DD}_*.csv), fully distributed via
    input_file_name()."""
    fname = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return (
        df.withColumn("filename", fname)
        .withColumn("ed_code", F.regexp_extract(fname, r"^([^_]+)_", 1))
        .withColumn(
            "pcd",
            F.concat_ws(
                "-",
                F.regexp_extract(fname, r"^[^_]+_(\d{4})_(\d{2})_(\d{2})", 1),
                F.regexp_extract(fname, r"^[^_]+_(\d{4})_(\d{2})_(\d{2})", 2),
                F.regexp_extract(fname, r"^[^_]+_(\d{4})_(\d{2})_(\d{2})", 3),
            ),
        )
    )


def checksum(primary_cols: list[str], null_safe: bool = True) -> Column:
    """F1 row checksum over (ed_code, pcd, primary cols).

    The reference's concat() nulls the whole checksum when any key part is
    null (SURVEY.md §7.4(3)); default is the null-safe concat_ws fix,
    fidelity mode available with null_safe=False."""
    cols = [F.col("ed_code"), F.col("pcd"), *[F.col(c) for c in primary_cols]]
    if null_safe:
        return F.md5(F.concat_ws("\x1f", *[c.cast("string") for c in cols]))
    return F.md5(F.concat(*[c.cast("string") for c in cols]))


def part_key() -> Column:
    """F2+F3: part = ed_code + '_' + pcd with hyphens stripped
    (bronze_funcs.py:136-140) — the Hive partition key for every write."""
    return F.concat(F.col("ed_code"), F.lit("_"), F.regexp_replace("pcd", "-", ""))


def scd2_stamp(df: DataFrame, primary_cols: list[str], null_safe_checksum: bool = True) -> DataFrame:
    """F1-F6 initial-load SCD2 stamping (bronze_funcs.py:129-140)."""
    return df.withColumns(
        {
            "valid_from": F.current_timestamp(),
            "valid_to": F.lit(None).cast("timestamp"),
            "iscurrent": F.lit(1),
            "checksum": checksum(primary_cols, null_safe_checksum),
            "part": part_key(),
        }
    )


def transliterate_ascii(c: Column | str) -> Column:
    """F12: unicode transliteration to ASCII (bronze_funcs.py:22-33 ran
    unidecode over the whole file on the driver). Arrow-vectorized pandas
    UDF over NFKD decomposition + combining-mark strip — the one operator
    where SURVEY.md §2.4 concedes a UDF is genuinely required; everything
    around it stays JVM-side."""
    import unicodedata

    # NFKD strips combining marks but leaves ß and a few non-decomposing
    # ligatures; this table closes the gap to unidecode's output for the
    # characters EDW data actually contains (bronze_funcs.py:22-33)
    _LIGATURES = str.maketrans(
        {
            "ß": "ss", "ẞ": "SS",
            "æ": "ae", "Æ": "AE",
            "œ": "oe", "Œ": "OE",
            "ð": "d", "Ð": "D",
            "þ": "th", "Þ": "Th",
            "ø": "o", "Ø": "O",
            "đ": "d", "Đ": "D",
            "ł": "l", "Ł": "L",
        }
    )

    @F.pandas_udf("string")
    def _translit(s: pd.Series) -> pd.Series:
        def fix(v):
            if v is None:
                return None
            v = v.replace("﻿", "").replace("\0", "")
            v = v.translate(_LIGATURES)
            decomposed = unicodedata.normalize("NFKD", v)
            return "".join(ch for ch in decomposed if not unicodedata.combining(ch))

        return s.map(fix)

    return _translit(F.col(c) if isinstance(c, str) else c)
