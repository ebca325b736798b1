"""Lazy lineage cuts with the full-partition-first-action contract.

A ``localCheckpoint(eager=False)`` materializes partitions the first
time an action COMPUTES them; a consumer whose first action early-exits
(``limit(1)``, ``take``, ``isEmpty``) would leave the remaining
partitions unmaterialized and silently recompute the upstream lineage
once per later consumer — the exact multi-scan cost the checkpoint was
inserted to remove. Every lazy cut in this package therefore relies on
the invariant that the FIRST downstream action computes EVERY partition
(a full aggregate, a shuffle, a collect of an aggregated frame, or the
noop sink). ``lazy_ckpt`` is the one place that contract is written
down so it travels with the call sites (round-15, ADVICE).

The helper is also IDEMPOTENT per DataFrame object: a frame already cut
by a caller is returned unchanged, so an operator can defensively cut
its input while queries hoist the same cut earlier (e.g. to read a
bounded sketch for a driver spine) without layering a second copy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TAG = "_les_lazy_ckpt"


def lazy_ckpt(df: DataFrame) -> DataFrame:
    """Cut lineage with a NON-eager localCheckpoint.

    Contract (enforced by convention, see module docstring): the first
    action over the returned frame must compute every partition.
    Idempotent — a frame returned by ``lazy_ckpt`` passes through
    unchanged, so hoisted caller-side cuts compose with defensive
    operator-side cuts without a second materialized copy.
    """
    if getattr(df, _TAG, False):
        return df
    out = df.localCheckpoint(eager=False)
    setattr(out, _TAG, True)
    return out
