"""Property tests for the round-5 operators: winnowing's shared-substring
guarantee, LSH parameter chooser, BPE encode/train consistency, snapshot
store linearity. Pure-Python properties run under hypothesis; Spark-backed
ones use deterministic generated corpora."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

from les_etl_pipeline_spark.operators.dedup import choose_lsh_params


@given(
    threshold=st.floats(min_value=0.05, max_value=0.95),
    n_hashes=st.integers(min_value=4, max_value=256),
)
@settings(max_examples=200, deadline=None)
def test_choose_lsh_params_valid_and_near_target(threshold, n_hashes):
    b, r = choose_lsh_params(threshold, n_hashes)
    assert b >= 1 and r >= 1 and b * r <= n_hashes
    t = (1.0 / b) ** (1.0 / r)
    # chosen curve threshold must be at least as close to the target as
    # the two boundary configurations it could have picked instead
    for rb in (1, n_hashes):
        bb = n_hashes // rb
        tb = (1.0 / bb) ** (1.0 / rb)
        assert abs(t - threshold) <= abs(tb - threshold) + 1e-12


def _winnow_py(words: list[str], k: int, w: int) -> set[tuple[int, int]]:
    """Pure-Python winnowing reference: (hash, pos) fingerprints."""
    grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:10], 16) for g in grams]
    out = set()
    for i in range(len(hs) - w + 1):
        window = hs[i : i + w]
        m = min(window)
        # rightmost minimum
        pos = i + max(j for j, h in enumerate(window) if h == m)
        out.add((m, pos))
    return out


@given(
    words=st.lists(
        st.sampled_from("a b c d e aa bb cc".split()), min_size=8, max_size=60
    )
)
@settings(max_examples=60, deadline=None)
def test_winnowing_guarantee_shared_run_shares_fingerprint(words):
    """The SIGMOD'03 guarantee: two documents sharing a run of
    >= w + k - 1 words share at least one fingerprint HASH. Construct
    doc2 = junk + the first w+k-1 words of doc1 + junk and check."""
    k, w = 3, 4
    shared = words[: w + k - 1]
    doc1 = words
    doc2 = ["x1", "x2", "x3", "x4", "x5"] + shared + ["y1", "y2", "y3", "y4"]
    fp1 = {h for h, _ in _winnow_py(doc1, k, w)}
    fp2 = {h for h, _ in _winnow_py(doc2, k, w)}
    assert fp1 & fp2


def test_winnowing_query_matches_python_reference(spark, sf_dir):
    """The Spark winnowing query equals the pure-Python reference on the
    real corpus slice (hash arithmetic AND window selection)."""
    from les_etl_pipeline_spark.catalog import table
    from les_etl_pipeline_spark.queries.llm_data7 import (
        WIN_K,
        WIN_W,
        text_winnowing_fingerprints,
    )

    got: dict[int, set] = {}
    for r in text_winnowing_fingerprints(spark, sf_dir).collect():
        got.setdefault(r["doc_id"], set()).add((r["fp_hash"], r["fp_pos"]))
    docs = (
        table(spark, sf_dir, "documents")
        .where("doc_id < 150 AND text IS NOT NULL")
        .select("doc_id", "text")
        .collect()
    )
    for row in docs:
        want = _winnow_py(row["text"].split(" "), WIN_K, WIN_W)
        if want:
            assert got.get(row["doc_id"]) == want, f"doc {row['doc_id']}"
        else:
            assert row["doc_id"] not in got


@given(budget=st.integers(min_value=0, max_value=10**6))
@settings(max_examples=50, deadline=None)
def test_mixture_rate_bounds(budget):
    """Planned rates are always in [0, 1] and monotone in the budget."""
    src_tokens = 37_000
    n_sources = 20
    rate = min(1.0, budget / n_sources / src_tokens)
    assert 0.0 <= rate <= 1.0
    bigger = min(1.0, (budget + 1000) / n_sources / src_tokens)
    assert bigger >= rate


# -- round-11: the skyline local-prune kernel ---------------------------------
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),  # mn: tight range -> ties
            st.integers(min_value=0, max_value=9),  # mx: tight range -> dups
            st.sampled_from(["a", "b"]),
        ),
        min_size=0,
        max_size=60,
    )
)
@settings(max_examples=300, deadline=None)
def test_local_skyline_kernel_matches_quadratic_reference(pts):
    """`_local_skyline_pdf` (the mapInPandas phase-1 kernel) equals the
    quadratic NOT-EXISTS reference on dense integer grids — the shape
    that maximizes equal-mn ties and duplicate (mn, mx) pairs, where an
    off-by-one in the prev-max shift or the per-cell max would silently
    drop or keep the wrong rows. Checked grouped and ungrouped."""
    import pandas as pd

    from les_etl_pipeline_spark.operators.skyline import _local_skyline_pdf

    pdf = pd.DataFrame(
        {
            "id": range(len(pts)),
            "mn": [float(p[0]) for p in pts],
            "mx": [float(p[1]) for p in pts],
            "g": [p[2] for p in pts],
        }
    )

    def ref(rows, grouped):
        keep = []
        for r in rows:
            dom = any(
                (not grouped or s[3] == r[3])
                and s[1] <= r[1]
                and s[2] >= r[2]
                and (s[1] < r[1] or s[2] > r[2])
                for s in rows
            )
            if not dom:
                keep.append(r)
        return sorted(keep)

    rows = list(pdf.itertuples(index=False, name=None))
    got_u = sorted(
        _local_skyline_pdf(pdf, [], "mn", "mx")[["id", "mn", "mx", "g"]]
        .itertuples(index=False, name=None)
    )
    assert got_u == ref(rows, grouped=False)
    got_g = sorted(
        _local_skyline_pdf(pdf, ["g"], "mn", "mx")[["id", "mn", "mx", "g"]]
        .itertuples(index=False, name=None)
    )
    assert got_g == ref(rows, grouped=True)
