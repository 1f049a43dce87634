#!/usr/bin/env python
"""Round-11 optimization probe, batch 4 (continuation session): registry-wide
sweep for CHAINED exchanges with subset keys — the waste class behind the
scd2/inverted-index/frame-dedup folds: an Exchange on keys K1 feeding,
through row-local operators only (Project/Filter/Aggregate/Sort/Window),
another Exchange on keys K2 where names(K2) is a subset of names(K1).
Such a pair is a candidate for folding the first keyed pass into the
second (e.g. DISTINCT-then-group -> collect_set; DISTINCT-then-window ->
adjacent-duplicate drop inside the window).

A flag is a CANDIDATE, not a defect: the first exchange may be
load-bearing (it can shrink rows before the second shuffle, or its output
may be shared by other consumers). Every flag needs the manual review the
round log records.

Usage: python scripts/opt_probe4.py [query ...]   (default: all registered)
Output: one line per flagged query with the exchange pair's keys.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# operators that neither join another input nor re-key rows: an exchange
# above one of these still partitions "the same rows" as the one below
_PASS = (
    "Project",
    "Filter",
    "HashAggregate",
    "ObjectHashAggregate",
    "SortAggregate",
    "Sort",
    "Window",
    "WindowGroupLimit",
    "Expand",
)


def _tree_edges(plan: str):
    """Parse the formatted-explain tree section into (node_id, name, depth)
    rows and return id -> (name, parent_id)."""
    rows = []
    for line in plan.splitlines():
        if line.startswith("=="):
            continue
        m = re.match(r"^([ :+|*-]*)(\w[\w .]*?)\s+\((\d+)\)\s*$", line)
        if not m:
            if rows and not line.strip():
                break
            continue
        indent, name, nid = m.groups()
        rows.append((int(nid), name.split()[0], len(indent)))
    parents: dict[int, tuple[str, int | None]] = {}
    stack: list[tuple[int, int]] = []  # (depth, id)
    for nid, name, depth in rows:
        while stack and stack[-1][0] >= depth:
            stack.pop()
        parents[nid] = (name, stack[-1][1] if stack else None)
        stack.append((depth, nid))
    return parents


def _exchange_keys(plan: str):
    """node_id -> tuple of hashpartitioning key names (None if not hash)."""
    keys: dict[int, tuple[str, ...] | None] = {}
    for m in re.finditer(r"\((\d+)\) Exchange\n((?:[^\n]+\n)+)", plan):
        nid = int(m.group(1))
        args = m.group(2)
        hm = re.search(r"hashpartitioning\(([^)]*)\)", args)
        if not hm:
            keys[nid] = None
            continue
        names = tuple(
            re.sub(r"#\d+L?", "", t).strip()
            for t in hm.group(1).split(",")[:-1]  # last element is numPartitions
        )
        keys[nid] = names
    return keys


def main() -> None:
    from cooler_mapreduce_spark.registry import load_all
    from cooler_mapreduce_spark.session import get_session

    spark = get_session("opt-probe4", cpus=8)
    specs = load_all()
    names = sys.argv[1:] or sorted(specs)
    for qname in names:
        try:
            df = specs[qname].fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            print(f"{qname}: ERROR {type(exc).__name__}: {exc}", flush=True)
            continue
        parents = _tree_edges(plan)
        ex_keys = _exchange_keys(plan)
        flags = []
        for nid, keys in ex_keys.items():
            if not keys:
                continue
            # walk up through pass-through operators to the nearest exchange
            cur = parents.get(nid, (None, None))[1]
            while cur is not None:
                cname, cparent = parents[cur]
                if cname == "Exchange":
                    up = ex_keys.get(cur)
                    if up is not None and set(up) <= set(keys):
                        flags.append((up, keys))
                    break
                if cname == "AdaptiveSparkPlan" or cname in _PASS:
                    cur = cparent
                    continue
                break
        if flags:
            desc = "; ".join(f"{list(u)} <= {list(k)}" for u, k in flags)
            print(f"{qname}: {desc}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
