"""Structural plan-hygiene recognizers shared by the CI gate
(``tests/test_plan_hygiene.py``) and the standalone linter
(``tools/plan_audit.py``) — extracted in round 11 so the tool cannot
drift from the enforced gate (it had: 37 name-list entries for BNLJ
builds the recognizer proves bounded on its own).

The one recognizer that matters at 100 TB: a ``BroadcastNestedLoopJoin``
is only acceptable when its BUILD side provably produces a BOUNDED
number of rows regardless of data scale — a global aggregate (one row),
a driver-embedded literal table, a constant ``Range``, or compositions
of those through row-preserving operators. Everything else is a
quadratic compare loop waiting for real data and must carry a named,
human-written justification.

Pure text analysis over ``df._jdf.queryExecution().executedPlan()
.toString()`` — no Spark session required here.
"""

from __future__ import annotations

import re

_TREE_PREFIX = re.compile(r"^((?::  |   |:- |\+- )*)(.*)$")
_CODEGEN = re.compile(r"^\*\(\d+\)\s*")

#: nodes that preserve (or reduce) the row bound of their single child
_ROW_PRESERVING = (
    "BroadcastExchange",
    "Exchange",
    "Project",
    "Filter",
    "ColumnarToRow",
    "InputAdapter",
    "WholeStageCodegen",
    "AQEShuffleRead",
    "Sort",
    "Coalesce",
    "ShuffleQueryStage",
    "BroadcastQueryStage",
    "AdaptiveSparkPlan",
)
_GLOBAL_AGG = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")


def parse_plan_tree(plan: str) -> list[tuple[int, str]]:
    """(depth, node text) per line of a physical-plan tree string."""
    nodes = []
    for ln in plan.splitlines():
        m = _TREE_PREFIX.match(ln)
        prefix, text = m.group(1), m.group(2).strip()
        if not text:
            continue
        nodes.append((len(prefix) // 3, _CODEGEN.sub("", text)))
    return nodes


def _children(nodes: list[tuple[int, str]], i: int) -> list[int]:
    d = nodes[i][0]
    out = []
    for j in range(i + 1, len(nodes)):
        dj = nodes[j][0]
        if dj <= d:
            break
        if dj == d + 1:
            out.append(j)
    return out


def is_bounded_subtree(nodes: list[tuple[int, str]], i: int) -> bool:
    """True iff the subtree at ``i`` provably produces a BOUNDED number
    of rows regardless of data scale:

    - a global aggregate (``keys=[]``) emits exactly one row;
    - a ``LocalTableScan`` is a driver-embedded literal table (it had to
      fit on the driver to exist — k x d scalars, never data-scale);
    - a nested-loop/cartesian product of bounded inputs is bounded;
    - row-preserving wrappers (project/filter/exchange/sort/...) inherit
      their child's bound.

    Anything else (scans, shuffles of real data, reused exchanges the
    text can't resolve) is NOT provably bounded and needs a named entry."""
    _, text = nodes[i]
    if text.startswith(_GLOBAL_AGG) and "keys=[]" in text:
        return True
    if text.startswith("LocalTableScan"):
        return True
    m = re.match(r"Range \((\d+), (\d+),", text)
    if m and int(m.group(2)) - int(m.group(1)) <= 10_000:
        return True  # literal range — driver-chosen constant cardinality
    if text.startswith("Generate explode(["):
        # literal-array explode (driver_literal_df): fan-out = the
        # literal's length, child must itself be bounded
        ch = _children(nodes, i)
        return len(ch) == 1 and is_bounded_subtree(nodes, ch[0])
    if text.startswith(("BroadcastNestedLoopJoin", "CartesianProduct")):
        ch = _children(nodes, i)
        return len(ch) == 2 and all(is_bounded_subtree(nodes, c) for c in ch)
    if text.startswith(_ROW_PRESERVING):
        ch = _children(nodes, i)
        return len(ch) == 1 and is_bounded_subtree(nodes, ch[0])
    return False


def unbounded_bnljs(plan: str) -> list[str]:
    """BNLJ nodes whose BUILD side is not provably bounded."""
    nodes = parse_plan_tree(plan)
    out = []
    for i, (_, text) in enumerate(nodes):
        if not text.startswith("BroadcastNestedLoopJoin"):
            continue
        ch = _children(nodes, i)
        if len(ch) != 2:
            out.append(text)
            continue
        build = ch[1] if "BuildRight" in text else ch[0]
        if not is_bounded_subtree(nodes, build):
            out.append(text)
    return out
