"""Sliding pane-merge: the shared shape behind every trailing-window
rollup in the registry (VERDICT r11 #4).

The idiom: a day-grain frame (one bounded summary row-set per day — a
KMV coin set, KLL survivors, bitmap buckets, regression moments, MG
candidate counts) is EXPLODED so each day's rows feed the ``window_days``
trailing windows they belong to, anchored windows are restricted to days
that actually exist (a window is only reported for an anchor day present
in the data), and a per-window merge reduces each window's <= window_days
pane row-sets to one result. Raw events are never re-read per window —
the naive form re-scans every event ``window_days`` times (the DuckDB
oracles do exactly that, deliberately).

Invariants this module owns (previously re-stated at five call sites):

1. NULL-day exclusion — a NULL day can neither contribute panes
   (``explode(sequence(NULL, ...))`` drops the row) nor anchor a window
   (NULL join keys never match a semi-join); the explicit filter makes
   the contract visible instead of incidental.
2. Anchor semi-join — pane explosion manufactures future anchor days
   (day d feeds d..d+W-1) that may not exist in the data; only days
   PRESENT in the anchor frame produce output windows, matching the
   oracles' ``days AS (SELECT DISTINCT day ...)`` CTE.
3. Bounded fan-out — each daily row is duplicated exactly
   ``window_days`` times and each window merges <= window_days panes, so
   per-window state is bounded by window_days x (per-day summary size),
   independent of raw cardinality. That bound is the whole point: at
   100 TB the pane frame is metadata-scale while the naive window join
   is a window_days-x re-scan.

Reference parity: none (the reference has no sliding-window surface —
SURVEY.md §2.5 note; scale-gap operator extracted from five r10/r11
queries).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sliding_panes(
    daily: DataFrame,
    day_col: str,
    window_days: int,
    anchor_col: str = "day7",
    anchors: DataFrame | None = None,
) -> DataFrame:
    """Explode a day-grain frame into anchored trailing-window panes:
    each input row reappears once per window it belongs to, keyed by
    ``anchor_col`` (the window's anchor day), restricted to anchor days
    that exist.

    ``anchors`` defaults to the distinct non-null days of ``daily``
    itself — correct whenever ``daily`` has a row-set for every day with
    data (sketch builds, daily aggregates). Pass an explicit one-column
    day frame when ``daily`` is subsetted and may LACK a day that still
    anchors a window (e.g. heavy-hitter per-day candidate counts: a day
    whose rows matched no candidate still anchors a window fed by its
    neighbours' panes).

    Returns ``daily``'s non-day columns unchanged plus ``anchor_col``;
    feed the result to a per-``anchor_col`` merge (groupBy/agg or a
    grouped sketch merge)."""
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    if anchor_col != day_col and anchor_col in daily.columns:
        # a carried column named like the anchor would silently produce
        # a duplicate/ambiguous column and a wrong semi-join downstream
        raise ValueError(
            f"anchor_col {anchor_col!r} collides with a carried column of"
            " `daily`; pass a distinct anchor_col"
        )
    # Lineage cuts (r14, guide §2.4): the day-grain frame feeds TWO
    # subtrees here (the pane explode and the default anchor set), and
    # the returned pane frame routinely feeds 2+ consumers in the
    # caller's merge (a sketch merge reads its input for counts AND for
    # the survivor join; a quantile selection reads the merge for m AND
    # for ranking) — each consumer re-executing the daily build from the
    # raw scan. Both frames are bounded metadata by invariant 3, so a
    # lazy localCheckpoint makes every re-read O(panes), not O(raw):
    # measured 8 raw-event scans -> 2 on sketch_kll_sliding_quantiles.
    nn = daily.where(F.col(day_col).isNotNull()).localCheckpoint(eager=False)
    carry = [c for c in daily.columns if c != day_col]
    panes = nn.select(
        F.explode(
            F.sequence(F.col(day_col), F.date_add(day_col, window_days - 1))
        ).alias(anchor_col),
        *carry,
    )
    if anchors is None:
        anchor_days = nn.select(F.col(day_col).alias(anchor_col)).distinct()
    else:
        acol = anchors.columns[0]
        anchor_days = (
            anchors.where(F.col(acol).isNotNull())
            .select(F.col(acol).alias(anchor_col))
            .distinct()
        )
    return panes.join(anchor_days, anchor_col, "left_semi").localCheckpoint(
        eager=False
    )


def sliding_pane_merge(
    daily: DataFrame,
    day_col: str,
    window_days: int,
    merge_fn: Callable[[DataFrame], DataFrame],
    anchor_col: str = "day7",
    anchors: DataFrame | None = None,
) -> DataFrame:
    """``sliding_panes`` + the caller's per-window merge in one step:
    ``merge_fn`` receives the anchored pane frame (group it by
    ``anchor_col``) and its result is returned as-is."""
    return merge_fn(
        sliding_panes(daily, day_col, window_days, anchor_col, anchors)
    )
