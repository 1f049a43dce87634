"""Compat-layer tests: reference golden outputs, combiner A/B equivalence,
duck-typed reduce, old-style map API, unmodified reference job files.

Goldens mirror the reference's own inline expectations (FIXTURES.md F1;
reference test_task_executor.py:62-103, :232-248).
"""

from __future__ import annotations

import os

import pytest

from cooler_mapreduce_spark.mr import load_job_source, run_job, run_job_file, to_tsv_lines

LINES = [("f:0", "hello world"), ("f:1", "hello mapreduce"), ("f:2", "test data")]
GOLDEN = {"hello": 2, "world": 1, "mapreduce": 1, "test": 1, "data": 1}

REF_SAMPLES = "/root/reference/shared/samples"


def wc_map(key, text):
    for w in text.strip().lower().split():
        w = w.strip(".,!?;:\"'-")
        if w:
            yield (w, 1)


def wc_reduce(key, values):
    return sum(values)


def test_word_count_golden(spark):
    out = dict(run_job(spark, LINES, wc_map, wc_reduce).collect())
    assert out == GOLDEN


def test_combiner_ab_equivalence(spark):
    """The reference's strongest test idea (test_task_executor.py:289-336):
    combiner on/off must not change the result."""
    data = [("k", "hello hello hello world world hello mapreduce mapreduce hello")]
    without = sorted(run_job(spark, data, wc_map, wc_reduce).collect())
    with_c = sorted(run_job(spark, data, wc_map, wc_reduce, combine_fn=wc_reduce).collect())
    assert without == with_c == [("hello", 5), ("mapreduce", 2), ("world", 2)]


def test_combiner_reduces_shuffle_volume(spark):
    """Reference test_task_executor.py:250-287: the combiner must shrink
    the intermediate (pre-shuffle) data ≥50×. Same input shape — one
    record of "test word other" × 100 → 300 map-output pairs, 3 unique
    keys — counted at the exact point the compat layer hands pairs to the
    shuffle, and cross-checked against Spark's shuffle-write metrics."""
    from cooler_mapreduce_spark.mr import _adapt_map, _partition_combine

    sc = spark.sparkContext
    data = [(None, " ".join(["test word other"] * 100))]
    pairs = sc.parallelize(data, 1).flatMap(_adapt_map(wc_map))

    # record counts at the shuffle boundary (the reference's len(pickle))
    n_raw = pairs.count()
    n_combined = pairs.mapPartitions(_partition_combine(wc_reduce)).count()
    assert n_raw == 300
    assert n_combined == 3
    assert n_combined < n_raw / 50  # the reference's ≥50× claim

    # and the actual bytes Spark writes to the shuffle shrink too
    def shuffle_write_bytes(combine_fn):
        tracker = sc.statusTracker()
        before = set(tracker.getJobIdsForGroup(None))
        run_job(spark, data, wc_map, wc_reduce, combine_fn=combine_fn,
                num_reduce=2, sort_output=False).count()
        new_jobs = [j for j in tracker.getJobIdsForGroup(None) if j not in before]
        stage_ids = {s for j in new_jobs for s in tracker.getJobInfo(j).stageIds}
        status = sc._jsc.sc().statusStore()
        total = 0
        for sid in stage_ids:
            total += status.lastStageAttempt(sid).shuffleWriteBytes()
        return total

    try:
        no_combine = shuffle_write_bytes(None)
        with_combine = shuffle_write_bytes(wc_reduce)
    except Exception:
        pytest.skip("status-store internals unavailable in this Spark build")
    assert 0 < with_combine < no_combine


@pytest.mark.parametrize("num_reduce", [1, 2, 8])
def test_partition_count_invariance(spark, num_reduce):
    """Spark analogue of the reference's partitioning invariant
    (test_map_execution.py:157-213): results identical for any R, and
    every key appears exactly once."""
    out = run_job(spark, LINES, wc_map, wc_reduce, num_reduce=num_reduce).collect()
    assert dict(out) == GOLDEN
    assert len(out) == len(GOLDEN)  # no duplicate keys across partitions


def test_reduce_generator_convention(spark):
    """reduce_fn may yield (k, v) pairs instead of returning a scalar
    (reference task_executor.py:230-241)."""

    def explode_reduce(key, values):
        total = sum(values)
        yield (key, total)
        yield (key + "!", total * 10)

    out = dict(run_job(spark, [("f", "a a b")], wc_map, explode_reduce).collect())
    assert out == {"a": 2, "a!": 20, "b": 1, "b!": 10}


def test_reduce_list_scalar_convention(spark):
    """A reduce returning a *list of non-pairs* is a scalar result (the
    inverted-index job returns a doc list)."""

    def ii_map(key, text):
        for w in text.split():
            yield (w, key)

    def ii_reduce(key, values):
        return sorted(set(values))

    out = dict(run_job(spark, [(1, "x y"), (2, "y")], ii_map, ii_reduce).collect())
    assert out == {"x": [1], "y": [1, 2]}


def test_old_style_single_arg_map(spark):
    """weather_stats.py's pre-drift API: map_fn(text) -> [partition-list]
    (SURVEY.md §5 — evidence of reference API drift; we run both)."""

    def old_map(text):
        return [[("n", float(x)) for x in text.split(",")]]

    def avg_reduce(key, values):
        vals = list(values)
        return sum(vals) / len(vals)

    out = dict(run_job(spark, [(None, "1,2,3"), (None, "5")], old_map, avg_reduce).collect())
    assert out == {"n": 2.75}


def test_sorted_canonical_output(spark):
    """Output is key-sorted (reference task_executor.py:226)."""
    keys = [kv[0] for kv in run_job(spark, LINES, wc_map, wc_reduce).collect()]
    assert keys == sorted(keys)


def test_tsv_sink_format(spark):
    lines = set(to_tsv_lines(run_job(spark, LINES, wc_map, wc_reduce)).collect())
    assert "hello\t2" in lines and "data\t1" in lines


def test_job_source_loading(spark):
    src = """
def map_fn(key, value):
    yield (value % 2, value)

def reduce_fn(key, values):
    return max(values)
"""
    fns = load_job_source(src)
    out = dict(
        run_job(spark, [(None, v) for v in range(10)], fns["map_fn"], fns["reduce_fn"]).collect()
    )
    assert out == {0: 8, 1: 9}


@pytest.mark.skipif(not os.path.isdir(REF_SAMPLES), reason="reference checkout absent")
def test_reference_word_count_job_file_unmodified(spark):
    """The reference's shipped word_count.py job file runs as-is."""
    out = dict(
        run_job_file(spark, LINES, f"{REF_SAMPLES}/word_count.py").collect()
    )
    assert out == GOLDEN


@pytest.mark.skipif(not os.path.isdir(REF_SAMPLES), reason="reference checkout absent")
def test_reference_weather_job_file_unmodified(spark):
    """The reference's weather_stats.py (old-API map, dict-valued reduce,
    combiner algebra) runs as-is on its own sample CSV semantics."""
    csv = [(None, "Temperature,Humidity,Pressure"), (None, "20.0,50.0,1000.0"),
           (None, "30.0,70.0,1020.0"), (None, "malformed,line"), (None, "")]
    out = dict(
        run_job_file(spark, csv, f"{REF_SAMPLES}/weather_stats.py").collect()
    )
    assert set(out) == {"temperature", "humidity", "pressure"}
    assert out["temperature"]["average"] == 25.0
    assert out["temperature"]["min"] == 20.0
    assert out["temperature"]["max"] == 30.0
    assert out["temperature"]["count"] == 2
    assert out["pressure"]["average"] == 1010.0


@pytest.mark.skipif(not os.path.isdir(REF_SAMPLES), reason="reference checkout absent")
def test_reference_weather_job_file_with_combiner(spark):
    """Same job with its combiner active across many partitions — exercises
    the dict-merging branch of its reduce_fn."""
    csv = [(None, f"{20.0 + i},{50.0 + i},{1000.0 + i}") for i in range(8)]
    out = dict(
        run_job_file(spark, csv, f"{REF_SAMPLES}/weather_stats.py", num_reduce=4).collect()
    )
    assert out["humidity"]["count"] == 8
    assert out["humidity"]["average"] == 53.5
