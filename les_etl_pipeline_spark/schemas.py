"""EDW data contracts for the pipeline operators: typed cast maps, primary
keys, topic ranges, and validation rules.

Derived from the reference's runtime contracts (silver cast maps at
/root/reference/src/les_etl_pipeline/utils/silver_funcs.py:81-248, topic
ranges at generate_asset_silver.py:22-45 / generate_bond_info_silver.py:
22-36, primary keys at utils/bronze_funcs.py:10-14, rule shapes at
utils/validation_rules.py) — declared here fresh as *our* contract, with
representative typed columns per FIXTURES.md; AL/BL columns not listed
default to StringType at silver (the reference types all 127/36 — extend
these maps as fixtures grow; the cast engine skips absent columns either
way).
"""

from __future__ import annotations

from pyspark.sql import types as T

# primary key columns per dataset (bronze_funcs.py:10-14)
PRIMARY_COLS = {
    "assets": ["AL1", "AL2"],
    "bond_info": ["BL1", "BL2"],
    "deal_details": ["ed_code", "PoolCutOffDate"],
}

# SCD2 merge keys: a ROW identity, which the reference never defined (its
# PRIMARY_COLS identify a deal+date, not a row — every asset row of a deal
# shares AL1/AL2, so a merge keyed on them would fan out; the dead
# perform_scd2 hid this). AL5 = lease id, BL1/BL2 = report date + issuer.
MERGE_KEYS = {
    "assets": ["AL1", "AL2", "AL5"],
    "bond_info": ["BL1", "BL2"],
    "deal_details": ["PoolCutOffDate"],
}

#: first header cell per dataset is force-renamed (bronze_funcs.py:16-19)
INITIAL_COL = {"assets": "AL1", "bond_info": "BL1"}

# silver cast maps — representative typed subset (FIXTURES.md §1-2)
ASSET_COLUMNS: dict[str, T.DataType] = {
    "AL1": T.DateType(),
    "AL2": T.StringType(),
    "AL3": T.StringType(),
    "AL5": T.StringType(),
    "AL7": T.BooleanType(),
    "AL10": T.StringType(),
    "AL15": T.StringType(),
    "AL18": T.StringType(),
    "AL19": T.DateType(),
    "AL30": T.DoubleType(),
    "AL50": T.DateType(),
    "AL55": T.DoubleType(),
    "AL56": T.DoubleType(),
    "AL58": T.StringType(),
    "AL74": T.DoubleType(),
    "AL83": T.DoubleType(),
    "AL104": T.BooleanType(),
    "AL107": T.DateType(),
    "AL139": T.StringType(),
    "AL148": T.DateType(),
}

BOND_COLUMNS: dict[str, T.DataType] = {
    "BL1": T.DateType(),
    "BL2": T.StringType(),
    "BL4": T.BooleanType(),
    "BL11": T.DoubleType(),
    "BL13": T.DoubleType(),
    "BL18": T.DateType(),
    "BL19": T.StringType(),
    "BL29": T.StringType(),
    "BL32": T.StringType(),
    "BL38": T.DateType(),
    "BL39": T.DateType(),
    "BL43": T.DoubleType(),
}

DEAL_DETAILS_COLUMNS: dict[str, T.DataType] = {
    "ed_code": T.StringType(),
    "AssetClassCode": T.StringType(),
    "AssetClassName": T.StringType(),
    "CountryCodeOfSpvIncorporation": T.StringType(),
    "DealSize": T.DoubleType(),
    "DealVersion": T.IntegerType(),
    "ISIN": T.StringType(),
    "IsActiveDeal": T.BooleanType(),
    "IsECBEligible": T.BooleanType(),
    "IsMasterTrust": T.BooleanType(),
    "PoolCreationDate": T.DateType(),
    "PoolCutOffDate": T.DateType(),
    "InterestPaymentDate": T.DateType(),
    "SubmissionTimestamp": T.DateType(),
    "CurrentPoolBalance": T.DoubleType(),
    "OriginalPoolBalance": T.DoubleType(),
    "TotalNotionalValue": T.DoubleType(),
    "NumberOfActiveAssets": T.IntegerType(),
    "TotalNumberOfAssets": T.IntegerType(),
    "TotalResubmissionCount": T.IntegerType(),
    "Vintage": T.IntegerType(),
    "ECBDataQualityScore": T.StringType(),
    "CurrentLLPDUploadStatus": T.StringType(),
    "RequestId": T.StringType(),
    "SpvName": T.StringType(),
    "DataOwner": T.StringType(),
    "DataProvider": T.StringType(),
    "ContactInformation": T.StringType(),
}

# topic ranges (generate_asset_silver.py:22-45)
ASSET_TOPIC_RANGES = {
    "lease_info": ("AL", 6, 49),
    "lease_features": ("AL", 50, 73),
    "interest_rate": ("AL", 74, 82),
    "financial_info": ("AL", 83, 97),
    "performance_info": ("AL", 98, 132),
    "collateral_info": ("AL", 133, 153),
}

# topic ranges (generate_bond_info_silver.py:22-36)
BOND_TOPIC_RANGES = {
    "bond_info": ("BL", 3, 18),
    "transaction_info": ("BL", 19, 24),
    "tranche_info": ("BL", 25, 50),
}

#: silver primary projections: primary = ed_code, part + key range
ASSET_PRIMARY = ["ed_code", "part", "AL1", "AL2", "AL3", "AL4", "AL5"]
BOND_PRIMARY = ["ed_code", "part", "BL1", "BL2"]

# validation rules — representative subset mirroring validation_rules.py
# shapes (full coverage grows with fixtures; rule language in
# operators/validation.py)
ASSET_RULES: dict[str, dict] = {
    "AL1": {"type": "datetime", "nullable": False, "min": "2012-01-01", "max": "2030-12-31"},
    "AL2": {"nullable": False},
    "AL3": {"nullable": False},
    "AL5": {"nullable": False},
    "AL7": {"allowed": ["y", "n"]},
    "AL10": {"nullable": False},
    "AL18": {"allowed": [str(i) for i in range(7)]},
    "AL19": {"type": "datetime", "max": "2100-12-31"},
    "AL30": {"type": "number"},
    "AL50": {"type": "datetime"},
    "AL55": {"type": "number"},
    "AL56": {"type": "number", "nullable": False},
    "AL58": {"allowed": [str(i) for i in range(5)]},
    "AL104": {"allowed": ["y", "n"]},
    "AL107": {"type": "datetime"},
    "AL139": {"allowed": [str(i) for i in range(22)]},
    "AL148": {"type": "datetime"},
}

BOND_RULES: dict[str, dict] = {
    "BL1": {"type": "datetime", "nullable": False},
    "BL2": {"nullable": False},
    "BL4": {"allowed": ["y", "n"]},
    "BL11": {"type": "number"},
    "BL13": {"type": "number"},
    "BL18": {"type": "datetime"},
    "BL19": {"nullable": False},
    "BL29": {"nullable": False},
    "BL32": {"allowed": [str(i) for i in range(19)]},
    "BL38": {"type": "datetime", "nullable": False, "min": "2012-01-01"},
    "BL39": {"type": "datetime", "nullable": False},
    "BL43": {"type": "number"},
}

#: lineage columns carried by every bronze row (validation_rules.py:26-46)
LINEAGE_COLS = ("filename", "pcd", "ed_code")
