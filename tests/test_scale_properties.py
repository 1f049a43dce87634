"""Plan-level scale hygiene, enforced across the ENTIRE registry.

Correctness tests prove each query right; these prove no query plans an
operation that stops scaling — the regression net for SCALING.md's "no
O(n²), no unkeyed megajoin" claims. Plans are built, not executed, so the
sweep stays cheap.
"""

from __future__ import annotations

import pytest

from cooler_mapreduce_spark.registry import load_all

SPECS = load_all()

#: queries whose broadcast nested-loop is the DESIGN (bounded broadcast
#: side: query set / pair threshold), documented in their docstrings.
_NL_ALLOWED = {
    "ann_topk_bruteforce",     # |queries| rows broadcast against corpus
    "embedding_cosine_dups",   # exact all-pairs tier (oracle ground truth)
    "join_range_price_bands",  # theta join against a literal band table
    "join_asof_last_click",    # bounded theta as-of candidates
    "tfidf_top_terms",         # single-row N_docs scalar broadcast to every task
    "boilerplate_ngrams",      # single-row corpus-count scalar broadcast to df counts
    "gapfill_hourly_events",   # spine × types cross: both sides bounded by (hours × types)
    "quality_top_decile",      # single-row percentile threshold broadcast to every task
    "revenue_share_by_nation", # single-row grand-total scalar broadcast to 25 rows
    "event_cooccurrence_lift", # single-row user-total scalar broadcast to 10 pair rows
    "pareto_revenue_share",    # single-row p99 threshold broadcast to every task
}


def _plan(spark, name, sf_dir):
    return SPECS[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_no_cartesian_product(spark, oracle_sf_dir, name):
    assert "CartesianProduct" not in _plan(spark, name, oracle_sf_dir)


@pytest.mark.parametrize("name", sorted(set(SPECS) - _NL_ALLOWED))
def test_no_unexpected_nested_loop_join(spark, oracle_sf_dir, name):
    plan = _plan(spark, name, oracle_sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"{name} plans a nested-loop join; either key it or add it to "
        f"_NL_ALLOWED with a docstring justifying the bounded side"
    )
