"""1x/10x scale sweep for the five rows-only ITERATIVE tiers.

The full-registry sweep (scale_sweep.py) records runtime ratios; for
the iterative algorithms the round-6 verdict asked for more — show the
fixpoint/round counts and convergence are SCALE-STABLE, not just the
wall clock. The replica-inflated 10x fixture (build_inflated.py) makes
strong invariants checkable, because it repeats the embedding point
multiset 10x with only key offsets:

- k-means (fixed 10 rounds, lowest-vec_id init): the per-round means
  over 10 identical copies are the same rational numbers as the means
  of one copy, so every cluster size must be EXACTLY 10x at every
  round and the final centroids must agree to <= 1e-9 per component.
  (Not bit-identical: Spark's decimal-division result scale depends on
  the divisor's digit width, so a count of 2780 rounds the quotient at
  a different scale than 278 — measured last-ulp deltas only.)
- PCA power iteration (fixed 8 rounds): same point cloud => same
  principal direction; the scatter eigenvalue scales by exactly 10.
  Asserted: |cos(v_x1, v_x10)| >= 1 - 1e-9, eigenvalue ratio in
  [10*(1-1e-9), 10*(1+1e-9)].
- BPE training (fixed 10 merges): every pair count scales by exactly
  10, so the learned merge RULES must be identical rule-for-rule and
  every winning pair count exactly 10x.
- k-core peeling (data-dependent fixpoint): the stats out-param
  records rounds-to-fixpoint and survivor count at both scales; the
  assertion is convergence well inside the 60-round bound at both
  (the 10x affinity graph is DENSER — multiplicities cross the
  support threshold — so survivor counts legitimately differ).
- LPA (fixed 5 rounds by design — synchronous LPA can 2-cycle, so a
  fixpoint probe is deliberately not used): records community count
  and runtime; the round count is a constant at any scale.

Usage: python scripts/iterative_sweep.py [x1_dir] [x10_dir] [out.json]
"""
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F  # noqa: E402

from cooler_mapreduce_spark.session import get_session  # noqa: E402

x1 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
x10 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_inflated"
out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/iterative_sweep.json"

spark = get_session("iterative-sweep")
res: dict[str, dict] = {}


def timed(fn):
    t0 = time.time()
    r = fn()
    return r, round(time.time() - t0, 2)


# --- k-means ---------------------------------------------------------------
from cooler_mapreduce_spark.operators.similarity import (  # noqa: E402
    kmeans_lloyd_frame,
    pca_power_frame,
)

km = {}
for sfd, label in ((x1, "x1"), (x10, "x10")):
    (assigned, cents), secs = timed(lambda d=sfd: kmeans_lloyd_frame(spark, d))
    sizes = {r.cluster: r.n for r in
             assigned.groupBy("cluster").agg(F.count("*").alias("n")).collect()}
    km[label] = {"sec": secs, "centroids": cents, "sizes": sizes}
cent_delta = max(
    abs(a - b)
    for u, v in zip(km["x1"]["centroids"], km["x10"]["centroids"])
    for a, b in zip(u, v)
)
assert cent_delta <= 1e-9, f"kmeans centroids drifted under 10x replication: {cent_delta}"
assert all(km["x10"]["sizes"][c] == 10 * n for c, n in km["x1"]["sizes"].items()), \
    "kmeans cluster sizes not exactly 10x"
res["kmeans_embedding_clusters"] = {
    "x1_sec": km["x1"]["sec"], "x10_sec": km["x10"]["sec"], "rounds": "10 (fixed)",
    "centroid_max_delta": cent_delta, "sizes_exactly_10x": True,
}
print(json.dumps({"kmeans_embedding_clusters": res["kmeans_embedding_clusters"]}), flush=True)

# --- PCA power iteration ----------------------------------------------------
pca = {}
for sfd, label in ((x1, "x1"), (x10, "x10")):
    (mu, v, eig, tot), secs = timed(lambda d=sfd: pca_power_frame(spark, d))
    pca[label] = {"sec": secs, "v": v, "eig": eig}
align = abs(sum(a * b for a, b in zip(pca["x1"]["v"], pca["x10"]["v"])))
ratio = pca["x10"]["eig"] / pca["x1"]["eig"]
assert align >= 1 - 1e-9, f"pca principal direction moved under 10x replication: |cos|={align}"
assert abs(ratio - 10.0) <= 10 * 1e-9, f"pca scatter eigenvalue not 10x: {ratio}"
res["pca_power_embeddings"] = {
    "x1_sec": pca["x1"]["sec"], "x10_sec": pca["x10"]["sec"], "rounds": "8 (fixed)",
    "alignment": align, "eig_ratio": ratio,
}
print(json.dumps({"pca_power_embeddings": res["pca_power_embeddings"]}), flush=True)

# --- BPE training -----------------------------------------------------------
from cooler_mapreduce_spark.operators.textstats import bpe_train_merges  # noqa: E402

bpe = {}
for sfd, label in ((x1, "x1"), (x10, "x10")):
    df, secs = timed(lambda d=sfd: bpe_train_merges(spark, d))
    bpe[label] = {"sec": secs, "rules": [tuple(r) for r in df.collect()]}
assert [r[:-1] for r in bpe["x1"]["rules"]] == [r[:-1] for r in bpe["x10"]["rules"]], \
    "BPE merge rules diverged under 10x replication"
assert all(r10[-1] == 10 * r1[-1] for r1, r10 in zip(bpe["x1"]["rules"], bpe["x10"]["rules"])), \
    "BPE winning pair counts not exactly 10x"
res["bpe_train_merges"] = {
    "x1_sec": bpe["x1"]["sec"], "x10_sec": bpe["x10"]["sec"], "rounds": "10 (fixed)",
    "rules_identical": True, "counts_exactly_10x": True,
    "n_rules": len(bpe["x1"]["rules"]),
}
print(json.dumps({"bpe_train_merges": res["bpe_train_merges"]}), flush=True)

# --- k-core peeling ---------------------------------------------------------
from cooler_mapreduce_spark.operators.graph import (  # noqa: E402
    kcore_copurchase,
    label_propagation_communities,
)

kc = {}
for sfd, label in ((x1, "x1"), (x10, "x10")):
    stats: dict = {}
    df, secs = timed(lambda d=sfd, s=stats: kcore_copurchase(spark, d, stats=s))
    df.count()
    kc[label] = {"sec": secs, **stats}
    assert stats["rounds"] < 30, f"kcore fixpoint suspiciously slow at {label}: {stats['rounds']}"
res["kcore_copurchase"] = {
    "x1_sec": kc["x1"]["sec"], "x10_sec": kc["x10"]["sec"],
    "x1_rounds": kc["x1"]["rounds"], "x10_rounds": kc["x10"]["rounds"],
    "x1_survivors": kc["x1"]["survivors"], "x10_survivors": kc["x10"]["survivors"],
}
print(json.dumps({"kcore_copurchase": res["kcore_copurchase"]}), flush=True)

# --- LPA --------------------------------------------------------------------
lpa = {}
for sfd, label in ((x1, "x1"), (x10, "x10")):
    df, secs = timed(lambda d=sfd: label_propagation_communities(spark, d))
    lpa[label] = {"sec": secs, "n_communities": df.count()}
res["label_propagation_communities"] = {
    "x1_sec": lpa["x1"]["sec"], "x10_sec": lpa["x10"]["sec"], "rounds": "5 (fixed)",
    "x1_communities": lpa["x1"]["n_communities"],
    "x10_communities": lpa["x10"]["n_communities"],
}
print(json.dumps({"label_propagation_communities": res["label_propagation_communities"]}), flush=True)

with open(out, "w") as fh:
    json.dump(res, fh, indent=1, default=str)
print("ITERATIVE_SWEEP_OK", flush=True)
spark.stop()
