"""Cross-tier consistency: the MR-compat (RDD/Python) tier and the
DataFrame tier implement the same semantics, so on ANY input they must
agree — property-based, the A/B idea from the reference's test strategy
aimed at the engine's two execution tiers."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from cooler_mapreduce_spark.functions.text import word_tokens
from cooler_mapreduce_spark.mr import run_job

_word = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x2FF),
    min_size=1,
    max_size=8,
)
_line = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_line, min_size=1, max_size=20)


def _mr_wc(key, text):
    for w in text.strip().lower().split():
        w = w.strip(".,!?;:\"'-")
        if w:
            yield (w, 1)


def _sum(key, values):
    return sum(values)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(corpus=_corpus)
def test_mr_tier_equals_dataframe_tier_word_count(spark, corpus):
    mr = dict(run_job(spark, [(None, line) for line in corpus], _mr_wc, _sum,
                      combine_fn=_sum).collect())
    df = (
        spark.createDataFrame([(line,) for line in corpus], "text string")
        .select(F.explode(word_tokens("text")).alias("w"))
        .groupBy("w")
        .count()
    )
    want = {r["w"]: r["count"] for r in df.collect()}
    assert mr == want


def test_er_resolution_composes_with_cluster_step(spark, sf_dir):
    """Cross-tier: the registered resolution query's output feeds the
    staged clustering kernel coherently on the REAL corpus — every
    matched record clusters WITH its matched master (cluster id = the
    master key, the min of the id spaces by construction), every 'new'
    record is a singleton of its own rec_id, and nothing is lost or
    invented (entity set = rec_ids ∪ matched masters)."""
    from cooler_mapreduce_spark.operators.entity import (
        cluster_matches,
        entity_resolution_customers,
    )

    resolved = entity_resolution_customers(spark, sf_dir).localCheckpoint()
    clusters = {r.entity_id: r.cluster_id for r in cluster_matches(resolved).collect()}
    rows = resolved.collect()
    assert rows, "resolution produced no records"
    expected_entities = {r.rec_id for r in rows} | {
        r.matched_custkey for r in rows if r.matched_custkey is not None
    }
    assert set(clusters) == expected_entities
    for r in rows:
        if r.matched_custkey is None:
            assert clusters[r.rec_id] == r.rec_id  # singleton
        else:
            # rec and its master share a cluster labeled by the master
            # key (masters are the minimum ids by the offset construction)
            assert clusters[r.rec_id] == clusters[r.matched_custkey] == r.matched_custkey
