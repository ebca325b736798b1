"""EDW-style fixture generators (FIXTURES.md §1-3): assets/bond CSVs with
the reference file-naming contract, label rows, null markers, mixed case;
deal-details XML with ISIN lists and Submissions blocks."""

from __future__ import annotations

import os

ASSET_HEADER = ["LeaseID", "AL2", "AL3", "AL5", "AL7", "AL10", "AL18", "AL30", "AL56"]
ASSET_LABELS = ["Pool Cutoff", "Pool ID", "Servicer", "Lease", "Flag", "Ccy", "Enum", "Rate", "Balance"]


def write_asset_csv(dirpath: str, ed_code: str, ymd: tuple[int, int, int], rows: list[list[str]]) -> str:
    """{ed_code}_{YYYY}_{MM}_{DD}_assets.csv with header + label row."""
    y, m, d = ymd
    path = os.path.join(dirpath, f"{ed_code}_{y:04d}_{m:02d}_{d:02d}_assets.csv")
    with open(path, "w", encoding="utf-8") as f:
        f.write(",".join(ASSET_HEADER) + "\n")
        f.write(",".join(ASSET_LABELS) + "\n")
        for r in rows:
            f.write(",".join(r) + "\n")
    return path


DEFAULT_ASSET_ROWS = [
    # AL1(date), AL2, AL3, AL5, AL7, AL10, AL18, AL30, AL56
    ["2023-06-30", "POOL-1", " Acme Servicing ", "LS-1", "Y", "EUR", "2", "7.25", "18000.50"],
    ["2023-06-30", "POOL-1", "acme servicing", "LS-2", "n", "eur", "ND5", "1.5", "25000.00"],
    ["2023-06-30", "POOL-1", "No Collateral", "LS-3", "", "eur", "9", "x", ""],  # bad: AL56 required
    ["", "", "", "", "", "", "", "", ""],  # blank line -> skipped
]


def write_deal_xml(dirpath: str, ed_code: str, pcd: str = "2023-06-30") -> str:
    path = os.path.join(dirpath, f"{ed_code}_deal_details.xml")
    xml = f"""<?xml version="1.0"?>
<Deal xmlns="http://edw.example/ns">
  <EDCode>{ed_code}</EDCode>
  <AssetClassCode>LES</AssetClassCode>
  <AssetClassName>Leases</AssetClassName>
  <Country>IT</Country>
  <DealVisibleToOrg>x</DealVisibleToOrg>
  <DealVisibleToUser>y</DealVisibleToUser>
  <DealSize>500000000.00</DealSize>
  <DealVersion>3</DealVersion>
  <IsActiveDeal>y</IsActiveDeal>
  <ISIN><code>IT0001</code><code>IT0002</code></ISIN>
  <Submissions>
    <Submission>
      <PoolCutOffDate>{pcd}</PoolCutOffDate>
      <CurrentPoolBalance>321000000.00</CurrentPoolBalance>
      <NumberOfActiveAssets>1042</NumberOfActiveAssets>
      <MetricData>drop me</MetricData>
      <IsProvisional>n</IsProvisional>
    </Submission>
    <Submission><PoolCutOffDate>1999-01-01</PoolCutOffDate></Submission>
  </Submissions>
</Deal>
"""
    with open(path, "w", encoding="utf-8") as f:
        f.write(xml)
    return path


WIDE_ASSET_HEADER = [
    "LeaseID", "AL2", "AL3", "AL5",        # primary block
    "AL7", "AL10", "AL18", "AL30",         # lease_info (AL6-49)
    "AL50", "AL55", "AL56", "AL58",        # lease_features (AL50-73)
    "AL74", "AL80",                        # interest_rate (AL74-82)
    "AL83", "AL90",                        # financial_info (AL83-97)
    "AL104", "AL107",                      # performance_info (AL98-132)
    "AL139", "AL148",                      # collateral_info (AL133-153)
]


def write_wide_asset_csv(dirpath: str, ed_code: str, ymd: tuple[int, int, int], n_rows: int = 4) -> str:
    y, m, d = ymd
    path = os.path.join(dirpath, f"{ed_code}_{y:04d}_{m:02d}_{d:02d}_assets.csv")
    with open(path, "w", encoding="utf-8") as f:
        f.write(",".join(WIDE_ASSET_HEADER) + "\n")
        f.write(",".join("label" for _ in WIDE_ASSET_HEADER) + "\n")
        for i in range(n_rows):
            f.write(
                ",".join(
                    [
                        "2023-06-30", "POOL-1", "acme", f"LS-{i}",
                        "y" if i % 2 == 0 else "n", "EUR", str(i % 7), f"{i}.25",
                        "2019", f"{1000 + i}.00", f"{2000 + i}.50", str(i % 5),
                        f"0.0{i}", f"0.8{i}",
                        f"{300 + i}.00", f"{5500 + i}.00",
                        "n", "",
                        str(i % 22), "2023-01",
                    ]
                )
                + "\n"
            )
    return path


BOND_HEADER = ["ReportDate", "BL2", "BL4", "BL11", "BL13", "BL19", "BL25", "BL29", "BL32", "BL38", "BL39"]


def write_bond_csv(dirpath: str, ed_code: str, ymd: tuple[int, int, int]) -> str:
    y, m, d = ymd
    path = os.path.join(dirpath, f"{ed_code}_{y:04d}_{m:02d}_{d:02d}_bond.csv")
    rows = [
        ["2023-06-30", "SPV Alpha", "Y", "12345.67", "0.08", "Jane Doe", "tranche-a", "EUR", "3", "2040-12-15", "2018-05-20"],
        ["2023-06-30", "SPV Alpha", "n", "ND1", "0.05", "John Roe", "tranche-b", "eur", "18", "2041-01-15", "2018-05-20"],
        ["2023-06-30", "SPV Alpha", "", "1.0", "x", "", "tranche-c", "eur", "99", "2011-01-01", ""],  # bad row
    ]
    with open(path, "w", encoding="utf-8") as f:
        f.write(",".join(BOND_HEADER) + "\n")
        f.write(",".join("label" for _ in BOND_HEADER) + "\n")
        for r in rows:
            f.write(",".join(r) + "\n")
    return path
