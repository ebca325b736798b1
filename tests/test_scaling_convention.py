"""Pin the SCALING.md slope-row convention (VERDICT r12 #1): the 100x
extrapolation argument rests on measured slopes, so every registered
query must carry one — previously 36 sweep-heavy queries (including the
slowest) had no row, and the convention was self-asserted from a
curated probe list. These tests make the convention structural: a new
query cannot ship without a measured row (run
``tools/scale_probe.py --only <name>`` to add one), and the slope gate
(<= 1.0 for everything but the named baseline twins) can't silently
regress."""

from __future__ import annotations

import importlib.util
import inspect
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ROW_RE = re.compile(
    r"^\| (\S+) \| ([\d.]+) \| ([\d.]+) \| ([\d.]+) \| (-?[\d.]+) \|$"
)


def _probe_module():
    spec = importlib.util.spec_from_file_location(
        "scale_probe", os.path.join(REPO, "tools", "scale_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _scaling_rows() -> dict[str, tuple[float, float, float, float]]:
    rows: dict[str, tuple[float, float, float, float]] = {}
    with open(os.path.join(REPO, "SCALING.md")) as f:
        for line in f:
            m = _ROW_RE.match(line.strip())
            if m:
                rows[m.group(1)] = tuple(float(m.group(i)) for i in range(2, 6))
    return rows


def test_every_registered_query_has_a_measured_slope_row():
    """FULL-REGISTRY convention: SCALING.md carries a measured row for
    every registered query — in particular every query >= 1 s at sf0.1
    (the set VERDICT r12 found uncovered) — and no stale rows for
    queries that no longer exist."""
    from les_etl_pipeline_spark.queries import QUERIES

    rows = _scaling_rows()
    missing = sorted(set(QUERIES) - set(rows))
    assert not missing, (
        f"{len(missing)} registered queries lack a SCALING.md slope row "
        f"(run tools/scale_probe.py --only {' '.join(missing[:5])} ...): "
        f"{missing}"
    )
    stale = sorted(set(rows) - set(QUERIES))
    assert not stale, f"SCALING.md rows for unregistered queries: {stale}"
    head = open(os.path.join(REPO, "SCALING.md")).read(400)
    assert "FULL REGISTRY" in head


def test_worst_nonbaseline_slope_at_or_below_linear():
    """The slope gate: every query scales at-or-below linear on the
    sf0.01 -> sf0.1 step except the explicitly named quadratic baseline
    twins (kept as visible oracle anchors). 1.1 allows measurement
    noise on genuinely-linear scans; anything past it needs a plan
    audit, not an allowlist entry."""
    probe = _probe_module()
    rows = _scaling_rows()
    offenders = {
        n: v[3]
        for n, v in rows.items()
        if n not in probe.BASELINE_TWINS and v[3] > 1.1
    }
    assert not offenders, f"super-linear non-baseline slopes: {offenders}"
    # the baseline-twin exemption list stays minimal and real
    assert probe.BASELINE_TWINS <= set(rows)
    for n in probe.BASELINE_TWINS:
        assert rows[n][3] > 1.1, (
            f"{n} no longer measures super-linear — remove it from "
            "BASELINE_TWINS so the exemption list stays minimal"
        )


def test_embedding_normalization_list_matches_source():
    """EMB_QUERIES (the 4x-growth slope normalization) is derived from
    which queries read the embeddings table — pin it against source so
    a new embeddings query can't silently get the 10x denominator."""
    from les_etl_pipeline_spark.queries import QUERIES

    probe = _probe_module()
    reads_emb = set()
    for n, fn in QUERIES.items():
        try:
            src = inspect.getsource(fn)
        except OSError:
            continue
        if '"embeddings"' in src or "'embeddings'" in src:
            reads_emb.add(n)
    # direct readers must all be normalized
    missing = reads_emb - probe.EMB_QUERIES
    assert not missing, f"embeddings-reading queries not in EMB_QUERIES: {missing}"
    # entries beyond the direct readers must be the known operator-level
    # readers (table access inside the operator, not the query source)
    indirect = probe.EMB_QUERIES - reads_emb
    assert indirect <= {
        "dedup_semantic_prune",
        # registered bodies delegate to the shared _recall_df helper,
        # which does the table(spark, sf_dir, "embeddings") read
        "stream_ann_index_recall",
        "stream_ann_index_recall_retrained",
    }, indirect
