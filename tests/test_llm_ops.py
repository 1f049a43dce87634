"""Behavior tests for the LLM-pipeline operators (dedup / similarity /
multimodal) beyond the oracle hash gate."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cooler_mapreduce_spark.operators.multimodal import decode_media
from cooler_mapreduce_spark.registry import load_all

SPECS = load_all()


def test_lsh_recall_vs_bruteforce(spark, oracle_sf_dir):
    """Random-hyperplane LSH must recover ≥60% of the true top-10
    neighbors (single 12-bit table; more tables → higher recall)."""
    exact = SPECS["ann_topk_bruteforce"].fn(spark, oracle_sf_dir).collect()
    approx = SPECS["ann_topk_lsh"].fn(spark, oracle_sf_dir).collect()
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact}
    found = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(truth & found) / len(truth)
    assert recall >= 0.6, f"recall@10 = {recall:.2f}"


def test_lsh_cosines_are_exact_for_found_pairs(spark, sf_dir):
    """LSH may miss pairs but must never mis-score one: every (query,
    neighbor, cosine) it emits appears identically in brute force."""
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in SPECS["ann_topk_bruteforce"].fn(spark, sf_dir).collect()
    }
    for r in SPECS["ann_topk_lsh"].fn(spark, sf_dir).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:  # pairs outside exact top-10 can't be compared
            assert exact[key] == r["cosine"]


def test_minhash_no_false_negatives_for_exact_dups(spark, sf_dir):
    """Identical documents always collide in every band → any exact dup
    pair must be found by LSH with jaccard 1.0."""
    docs = SPECS["dedup_exact"].fn(spark, sf_dir).collect()
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in SPECS["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    }
    # dedup_exact only reports groups; regenerate member pairs via text join
    from cooler_mapreduce_spark.sources.catalog import table

    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    a, b = d.alias("a"), d.alias("b")
    dup_pairs = (
        a.join(b, (F.col("a.text") == F.col("b.text")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .collect()
    )
    for r in dup_pairs:
        assert lsh.get((r["doc_a"], r["doc_b"])) == 1.0


def test_simhash_pairs_have_similar_text(spark, sf_dir):
    """Hamming ≤ 3 on 48-bit simhash implies strongly overlapping token
    multisets — sanity-check one pair if any exist."""
    pairs = SPECS["dedup_simhash_pairs"].fn(spark, sf_dir).collect()
    for r in pairs:
        assert 0 <= r["hamming"] <= 3


def test_decode_media_stub_contract():
    """Without an installed codec the real branch raises; the
    deterministic fake produces byte-exact features either way."""
    from cooler_mapreduce_spark.operators.multimodal import _pil_image

    if _pil_image() is None:
        with pytest.raises(NotImplementedError):
            decode_media(b"\xff\xd8\xff", "image/jpeg")
    with pytest.raises(NotImplementedError):
        decode_media(b"RIFF....", "video/avi")  # no video codec anywhere
    feats = decode_media(b"abc", "text/utf-8", fake=True)
    assert feats == {
        "n_bytes": 3,
        "first_byte": 97,
        "byte_checksum": 97 + 98 + 99,
        "media_kind": "text/utf-8",
    }


def test_decode_media_real_codec_when_available():
    """Exercises the PIL branch wherever PIL exists (skipped in codec-less
    containers): decode features come from the decoded RGB buffer, and
    resize produces a real image of the target geometry."""
    import io

    PIL_Image = pytest.importorskip("PIL.Image")
    from cooler_mapreduce_spark.operators.multimodal import resize_media

    im = PIL_Image.new("RGB", (8, 6), (10, 20, 30))
    buf = io.BytesIO()
    im.save(buf, format="PNG")
    blob = buf.getvalue()

    feats = decode_media(blob, "image/png")
    assert feats["n_bytes"] == 8 * 6 * 3
    assert feats["first_byte"] == 10
    assert feats["media_kind"] == "image/png"
    assert feats["byte_checksum"] == (10 + 20 + 30) * 8 * 6

    out = resize_media(blob, (4, 3))
    with PIL_Image.open(io.BytesIO(out)) as r:
        assert r.size == (4, 3)
        assert (r.format or "").upper() == "PNG"


def test_multimodal_checksum_column(spark, sf_dir):
    """The mapInPandas pipeline's checksum (not oracle-checkable in SQL)
    equals a JVM-side recomputation via aggregate over the blob bytes."""
    from cooler_mapreduce_spark.operators.multimodal import _extract_features
    from cooler_mapreduce_spark.sources.catalog import table

    d = table(spark, sf_dir, "documents")
    media = d.select("doc_id", F.encode("text", "utf-8").alias("media"))
    feats = media.mapInPandas(
        _extract_features,
        schema="doc_id bigint, n_bytes bigint, first_byte int, byte_checksum bigint, media_kind string",
    )
    sample = {r["doc_id"]: r for r in feats.limit(50).collect()}
    for r in d.select("doc_id", "text").limit(20).collect():
        blob = r["text"].encode("utf-8")
        if r["doc_id"] in sample:
            got = sample[r["doc_id"]]
            assert got["n_bytes"] == len(blob)
            assert got["byte_checksum"] == sum(blob) % 1_000_000_007


def test_language_id_predicts_known_language_tokens(spark):
    """Docs made of pure stopwords must be identified exactly."""
    df = spark.createDataFrame(
        [(1, "the and of to in", "en"), (2, "el la de que y", "es"), (3, "xyzzy qwerty", "??")],
        "doc_id long, text string, lang string",
    )
    from cooler_mapreduce_spark.operators.textstats import _langid_expr

    t = df.select(
        "doc_id", F.split(F.lower("text"), " ").alias("toks")
    ).select("doc_id", F.expr(_langid_expr("toks", "spark")).alias("pred"))
    out = {r["doc_id"]: r["pred"] for r in t.collect()}
    assert out == {1: "en", 2: "es", 3: "und"}


def test_media_resize_pipeline_shapes(spark, sf_dir):
    """binary->binary transform: every output blob bounded, one row per
    input, stub decode raises without fake=True."""
    import pytest as _pytest

    from cooler_mapreduce_spark.operators.multimodal import (
        media_resize_pipeline,
        resize_media,
    )
    from cooler_mapreduce_spark.sources.catalog import table

    out = media_resize_pipeline(spark, sf_dir, target=(64, 64)).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert len(out) == n_docs
    assert all(isinstance(r["media"], (bytes, bytearray)) for r in out)
    assert all(r["n_bytes"] == len(r["media"]) for r in out)
    with _pytest.raises(NotImplementedError):
        resize_media(b"xx", (8, 8))


def test_media_frame_sample_pipeline_shapes(spark, sf_dir):
    """1->many frame explode: every doc contributes >=1 frame, frame_no
    dense from 0."""
    from cooler_mapreduce_spark.operators.multimodal import media_frame_sample_pipeline
    from cooler_mapreduce_spark.sources.catalog import table

    df = media_frame_sample_pipeline(spark, sf_dir, every_n=4)
    n_docs = table(spark, sf_dir, "documents").count()
    per_doc = {r["doc_id"]: r["cnt"] for r in df.groupBy("doc_id").agg(
        F.count("*").alias("cnt")).collect()}
    assert len(per_doc) == n_docs
    assert all(c >= 1 for c in per_doc.values())
    firsts = df.groupBy("doc_id").agg(F.min("frame_no").alias("m")).collect()
    assert all(r["m"] == 0 for r in firsts)


def test_embedding_dups_lsh_covers_exact(spark, oracle_sf_dir):
    """The LSH-candidate variant must recover >=80% of the exact
    all-pairs result (deterministic planes; measured 0.857 at sf0.01 /
    0.91 at sf0.1 for the fixture's 0.45 threshold — at production
    near-dup thresholds collision probability approaches 1), emit ZERO
    false pairs (verification is exact), and identical cosines."""
    exact = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in SPECS["embedding_cosine_dups"].fn(spark, oracle_sf_dir).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in SPECS["embedding_cosine_dups_lsh"].fn(spark, oracle_sf_dir).collect()
    }
    assert exact, "fixture must exercise the positive path"
    assert set(lsh) <= set(exact)  # verification is exact -> no false pairs
    assert len(set(lsh) & set(exact)) / len(exact) >= 0.8
    for k in set(lsh) & set(exact):
        assert lsh[k] == exact[k]


def test_dedup_exact_positive_path_sf01():
    """The sf0.1 fixture injects 8 exact-duplicate groups (the smaller
    SFs have none — their dedup_exact result is legitimately empty);
    run at sf0.1 so the operator's positive path is exercised: every
    group keeps its smallest doc_id and counts >= 2 copies."""
    import duckdb

    from cooler_mapreduce_spark.session import get_session

    spark = get_session("t-dedup-sf01")
    rows = SPECS["dedup_exact"].fn(spark, "/root/testdata/sf0.1").collect()
    assert len(rows) == duckdb.connect().execute(
        "SELECT COUNT(*) FROM (SELECT text FROM '/root/testdata/sf0.1/documents.parquet'"
        " GROUP BY text HAVING COUNT(*)>1)"
    ).fetchone()[0] > 0
    assert all(r["n_copies"] >= 2 for r in rows)


def test_connected_components_transitive_closure(spark):
    """A~B, B~C (never A~C directly) must land in ONE cluster — the
    transitivity the pairwise tiers cannot express; plus a disjoint pair
    and proof that propagation crosses >1 hop."""
    from cooler_mapreduce_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a bigint, doc_b bigint"
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_matches_union_find(spark):
    """Cross-check the distributed label propagation against a classic
    union-find on seeded random graphs (independent algorithm, same
    fixpoint)."""
    import random

    from cooler_mapreduce_spark.operators.dedup import connected_components

    for seed in (7, 42, 1234):
        rng = random.Random(seed)
        nodes = list(range(100, 160))
        edges = [tuple(rng.sample(nodes, 2)) for _ in range(40)]

        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        touched = {n for e in edges for n in e}
        want = {n: min(m for m in touched if find(m) == find(n)) for n in touched}

        pairs = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
        got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
        assert got == want, f"seed {seed}"


def test_connected_components_path_graph_diameter(spark):
    """A 100-node path graph (diameter 99 ≫ any propagation budget) must
    fully converge — the case plain min-label propagation needs 99 rounds
    for and the old max_rounds=20 loop silently truncated. Star
    contraction must label every node with the path's minimum, and a
    reversed-id path must too (contraction direction can't depend on
    edge orientation)."""
    from cooler_mapreduce_spark.operators.dedup import connected_components

    edges = [(i, i + 1) for i in range(99)]
    pairs = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(100)}

    rev = spark.createDataFrame([(b, a) for a, b in edges], "doc_a bigint, doc_b bigint")
    got = {r.doc_id: r.cluster_id for r in connected_components(rev).collect()}
    assert got == {i: 0 for i in range(100)}


def test_connected_components_asserts_convergence(spark):
    """max_rounds exhaustion raises instead of returning partial labels."""
    import pytest as _pytest

    from cooler_mapreduce_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(31)], "doc_a bigint, doc_b bigint"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_rounds=1)


def test_split_leakage_positive_path_sf01():
    """At sf0.1 the duplicate-text groups straddle the 80/20 hash split
    (3 contents land in both splits), so the leakage audit's positive
    path is exercised — and it must agree with a direct DuckDB count."""
    import duckdb

    from cooler_mapreduce_spark.session import get_session

    spark = get_session("t-leak-sf01")
    row = SPECS["split_leakage_audit"].fn(spark, "/root/testdata/sf0.1").collect()[0]
    want = duckdb.connect().execute("""
        WITH tagged AS (
            SELECT md5(text) h,
                   CASE WHEN CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                             AS BIGINT) % 100 < 80 THEN 'train' ELSE 'test' END AS split
            FROM '/root/testdata/sf0.1/documents.parquet')
        SELECT COUNT(*) FILTER (WHERE n_splits > 1) FROM (
            SELECT h, COUNT(DISTINCT split) AS n_splits FROM tagged GROUP BY h)
    """).fetchone()[0]
    assert row["n_leaked_contents"] == want > 0
    assert row["n_leaked_docs"] >= 2 * row["n_leaked_contents"]


# --------------------------------------------------------------------------
# corpus-hygiene pin tests (synthetic docs with known-good answers)


def _write_docs(spark, tmp_path, rows):
    """Write synthetic rows in the documents schema to a temp sf dir."""
    df = spark.createDataFrame(
        [(i, t, lang, "src0", len(t)) for i, t, lang in rows],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_repetition_filter_flags_repeated_doc(spark, tmp_path):
    """An all-one-token doc must be flagged (dup-trigram frac = 1, top
    bigram covers everything); an all-distinct doc must not."""
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, " ".join(["spam"] * 40), "en"),
            (2, " ".join(f"w{i}" for i in range(40)), "fr"),
        ],
    )
    out = {r["lang"]: r.asDict() for r in SPECS["repetition_filter"].fn(spark, sf).collect()}
    assert out["en"]["n_flagged"] == 1 and out["en"]["total_dup_trigrams"] == 37
    assert out["fr"]["n_flagged"] == 0 and out["fr"]["total_dup_trigrams"] == 0


def test_decontaminate_finds_verbatim_benchmark_copy(spark, tmp_path):
    """doc 17k is benchmark (id % 17 == 0); a train doc repeating its text
    verbatim is 100% contaminated, a disjoint doc 0%."""
    leak = " ".join(f"b{i}" for i in range(12))
    clean = " ".join(f"c{i}" for i in range(12))
    sf = _write_docs(spark, tmp_path, [(0, leak, "en"), (1, leak, "en"), (2, clean, "en")])
    out = {r["doc_id"]: r.asDict() for r in
           SPECS["decontaminate_ngram_overlap"].fn(spark, sf).collect()}
    assert set(out) == {1, 2}  # doc 0 is benchmark, not train
    assert out[1]["n_contaminated"] == out[1]["n_shingles"] > 0
    assert out[2]["n_contaminated"] == 0


def test_boilerplate_ngrams_detects_shared_header(spark, tmp_path):
    """A 4-gram header present in every doc is boilerplate; unique tails
    are not. Every doc's n_boiler ≥ 1 → total_boilerplate ≥ n_docs."""
    header = "terms of service apply"
    sf = _write_docs(
        spark,
        tmp_path,
        [(i, f"{header} " + " ".join(f"u{i}x{j}" for j in range(8)), "en") for i in range(30)],
    )
    row = SPECS["boilerplate_ngrams"].fn(spark, sf).collect()[0]
    assert row["n_docs"] == 30
    assert row["total_boilerplate"] >= 30  # the shared header shingle, per doc
    assert row["total_boilerplate"] < row["total_shingles"]  # tails unique


def test_corpus_shuffle_is_deterministic_permutation(spark, tmp_path):
    """Every doc appears exactly once; positions are 1..n per shard; two
    runs give identical assignments (seeded, engine-stable)."""
    sf = _write_docs(spark, tmp_path, [(i, f"t {i}", "en") for i in range(64)])
    a = SPECS["corpus_shuffle_shards"].fn(spark, sf).collect()
    b = SPECS["corpus_shuffle_shards"].fn(spark, sf).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    assert sorted(r["doc_id"] for r in a) == list(range(64))
    from collections import defaultdict
    by_shard = defaultdict(list)
    for r in a:
        by_shard[r["shard"]].append(r["pos"])
    for shard, poss in by_shard.items():
        assert poss == list(range(1, len(poss) + 1)), f"shard {shard}"


def test_importance_sample_invariant_and_weighted(spark, sf_dir):
    """The importance sampler must (a) return the identical row set at
    any partition layout (deterministic hash membership, no RNG), and
    (b) actually skew retention toward longer documents."""
    from cooler_mapreduce_spark.registry import load_all
    from cooler_mapreduce_spark.sources.catalog import table

    fn = load_all()["importance_sample_by_length"].fn
    base = {r.doc_id for r in fn(spark, sf_dir).collect()}
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = {r.doc_id for r in fn(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == again

    docs = table(spark, sf_dir, "documents").select("doc_id", "n_chars").collect()
    long_ids = {r.doc_id for r in docs if r.n_chars >= 400}
    short_ids = {r.doc_id for r in docs if r.n_chars < 100}
    # saturated weight => every long doc kept
    assert long_ids <= base
    # short docs are down-sampled (kept rate < 1), unless there are none
    if short_ids:
        assert len(short_ids & base) < len(short_ids)


def test_doc_chunk_windows_covers_every_token(spark, sf_dir):
    """Chunk geometry invariants, per document: chunk 0 starts at token 1,
    consecutive chunks advance by exactly the stride, the last chunk ends
    at token n (so no token is unreachable), and every full chunk carries
    exactly W tokens — the contract a sequence-packing consumer relies on."""
    from cooler_mapreduce_spark.operators.corpus import (
        _CHUNK_STRIDE,
        _CHUNK_W,
        doc_chunk_windows,
    )
    from cooler_mapreduce_spark.sources.catalog import table

    rows = doc_chunk_windows(spark, sf_dir).collect()
    n_tokens = {
        r["doc_id"]: r["n"]
        for r in table(spark, sf_dir, "documents")
        .selectExpr("doc_id", "size(split(text, ' ')) AS n")
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(n_tokens)
    for doc_id, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_no)
        n = n_tokens[doc_id]
        assert [c.chunk_no for c in chunks] == list(range(len(chunks)))
        for c in chunks[:-1]:
            assert c.n_chunk_tokens == _CHUNK_W  # only the tail may be short
        last = chunks[-1]
        # last chunk reaches token n exactly
        assert last.chunk_no * _CHUNK_STRIDE + last.n_chunk_tokens == n
        # minimality: the penultimate window did NOT already contain the
        # end (a further window would be a redundant suffix of the last)
        if len(chunks) > 1:
            assert (last.chunk_no - 1) * _CHUNK_STRIDE + _CHUNK_W < n


def test_unigram_nll_min_count_is_one_sided(spark, sf_dir):
    """The vocab-pruning broadcast bound (doc_unigram_nll min_count) may
    only DROP rare-term contributions, never invent or inflate one:
    min_count=1 is a no-op (identical to the exact registered query),
    and under a real threshold every doc's scored-token count shrinks or
    stays — with kept terms' log-probs unchanged (T counts all tokens)."""
    from cooler_mapreduce_spark.operators.textstats import doc_unigram_nll

    exact = doc_unigram_nll(spark, sf_dir)
    noop = doc_unigram_nll(spark, sf_dir, min_count=1)
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, noop.collect()))
    # compare full per-doc token counts (no top-100 truncation, which
    # would make the two result sets cover different docs)
    def all_docs(min_count):
        return {
            r["doc_id"]: r["n_tokens"]
            for r in doc_unigram_nll(
                spark, sf_dir, min_count=min_count, top=None
            ).collect()
        }

    full = all_docs(None)
    # the synthetic fixture's vocab is small and flat, so derive a
    # threshold that provably prunes: strictly above the rarest term's
    # frequency (min_count compares stf >= threshold)
    from cooler_mapreduce_spark.sources.catalog import table

    d = table(spark, sf_dir, "documents")
    stf_min = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("t"))
        .filter("t <> ''")
        .groupBy("t")
        .count()
        .agg(F.min("count"))
        .collect()[0][0]
    )
    pruned = all_docs(stf_min + 1)
    assert set(pruned) <= set(full)
    assert all(pruned[d2] <= full[d2] for d2 in pruned)
    assert any(pruned[d2] < full[d2] for d2 in pruned)  # threshold actually bites


def test_bpe_merges_match_pure_python_reference(spark, oracle_sf_dir):
    """Every learned BPE rule (order, pair, merged symbol, weighted
    count) must equal an independent pure-Python BPE trained on the
    identical word-frequency table — same greedy left-to-right apply,
    same (count DESC, left ASC, right ASC) argmax tie-break."""
    import duckdb

    got = [tuple(r) for r in SPECS["bpe_train_merges"].fn(spark, oracle_sf_dir).collect()]
    assert len(got) == 10

    wc = duckdb.sql(
        "SELECT w, COUNT(*) FROM (SELECT unnest(string_split(lower(text), ' ')) AS w"
        f" FROM '{oracle_sf_dir}/documents.parquet') WHERE len(w) > 0 GROUP BY w"
    ).fetchall()
    cur = [(list(w), c) for w, c in wc]
    want = []
    for r in range(10):
        pc = {}
        for s, c in cur:
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + c
        if not pc:
            break
        (a, b), c = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        want.append((r + 1, a, b, a + b, c))
        nxt = []
        for s, cnt in cur:
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            nxt.append((out, cnt))
        cur = nxt
    assert got == want


def test_bpe_encode_stats_match_reference(spark, oracle_sf_dir):
    """The encode-side stats must equal the pure-Python reference's
    encoding of the same corpus under the same 10 learned rules, and
    the compression ratio must be > 1 (merges shorten tokenizations)."""
    import duckdb

    row = SPECS["bpe_encode_stats"].fn(spark, oracle_sf_dir).collect()[0]

    wc = duckdb.sql(
        "SELECT w, COUNT(*) FROM (SELECT unnest(string_split(lower(text), ' ')) AS w"
        f" FROM '{oracle_sf_dir}/documents.parquet') WHERE len(w) > 0 GROUP BY w"
    ).fetchall()
    cur = [(list(w), c) for w, c in wc]
    for r in range(10):
        pc = {}
        for s, c in cur:
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + c
        if not pc:
            break
        (a, b), _ = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        nxt = []
        for s, cnt in cur:
            out = []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            nxt.append((out, cnt))
        cur = nxt
    want_tokens = sum(len(s) * c for s, c in cur)
    want_chars = sum(sum(len(x) for x in s) * c for s, c in cur)
    assert row.n_distinct_words == len(wc)
    assert row.n_word_occurrences == sum(c for _, c in wc)
    assert row.total_chars == want_chars
    assert row.total_bpe_tokens == want_tokens
    assert row.chars_per_token == want_chars / want_tokens > 1.0


def test_kmeans_matches_pure_python_reference(spark, oracle_sf_dir):
    """Every Lloyd's round is deterministic by construction (literal
    centroids, sequential-fold distances, first-argmin, decimal-staged
    means) — so cluster sizes and final centroid norms must equal a
    pure-Python implementation of the identical quantized algorithm."""
    import decimal

    import duckdb

    got = sorted(
        tuple(r) for r in SPECS["kmeans_embedding_clusters"].fn(spark, oracle_sf_dir).collect()
    )

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{oracle_sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    vecs = [(vid, [float(x) for x in e]) for vid, e in rows]
    k, rounds = 8, 5
    cents = [list(vecs[j][1]) for j in range(k)]
    q = decimal.Decimal("1e-12")

    def sqd(e, c):
        acc = 0.0
        for x, y in zip(e, c):
            acc += (x - y) * (x - y)
        return acc

    assign = None
    for _ in range(rounds):
        assign = []
        for vid, e in vecs:
            d = [sqd(e, c) for c in cents]
            assign.append((vid, min(range(k), key=lambda j: (d[j], j))))
        for j in range(k):
            members = [e for (vid, e), (_, cl) in zip(vecs, assign) if cl == j]
            if not members:
                continue
            cents[j] = [
                float(
                    sum(
                        decimal.Decimal(m[p]).quantize(q, rounding=decimal.ROUND_HALF_UP)
                        for m in members
                    )
                )
                / len(members)
                for p in range(len(cents[j]))
            ]
    sizes = {}
    for _, cl in assign:
        sizes[cl] = sizes.get(cl, 0) + 1
    want = sorted(
        (j, n, round(sum(v * v for v in cents[j]) ** 0.5, 9)) for j, n in sizes.items()
    )
    assert got == want


def test_bpe_fold_generalizes_beyond_fixture(spark):
    """The Spark BPE loop must match the pure-Python reference on
    corpora it was never tuned on — adversarial wordlists exercising
    overlapping pairs ('aaaa'), merged-symbol collisions ('abab' with
    rule chains), and single-char words (no pairs)."""
    from pyspark.sql import functions as F

    from cooler_mapreduce_spark.operators.textstats import _bpe_train

    corpora = [
        ["aaaa", "aa", "a", "aaa", "aaaa", "aaaa"],
        ["abab", "ab", "ba", "abba", "abab", "bb", "a", "b"],
        ["xy", "xyz", "zyx", "x", "yz", "xyz", "xyz", "zz"],
    ]
    for words in corpora:
        docs = spark.createDataFrame([(i, w) for i, w in enumerate(words)], "doc_id long, text string")
        docs.createOrReplaceTempView("_bpe_fuzz_docs")

        # drive _bpe_train against this corpus via a monkeypatched table()
        import cooler_mapreduce_spark.operators.textstats as ts

        orig = ts.table
        ts.table = lambda sp, sf, name: sp.table("_bpe_fuzz_docs")
        try:
            _, got = ts._bpe_train(spark, "ignored", rounds=4)
        finally:
            ts.table = orig

        wc = {}
        for w in words:
            wc[w] = wc.get(w, 0) + 1
        cur = [(list(w), c) for w, c in wc.items()]
        want = []
        for r in range(4):
            pc = {}
            for s, c in cur:
                for i in range(len(s) - 1):
                    pc[(s[i], s[i + 1])] = pc.get((s[i], s[i + 1]), 0) + c
            if not pc:
                break
            (a, b), c = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
            want.append((r + 1, a, b, a + b, c))
            nxt = []
            for s, cnt in cur:
                out = []
                for x in s:
                    if out and out[-1] == a and x == b:
                        out[-1] = a + b
                    else:
                        out.append(x)
                nxt.append((out, cnt))
            cur = nxt
        assert got == want, (words, got, want)


def test_kcore_matches_pure_python_peeling(spark, oracle_sf_dir):
    """The distributed k-core must equal sequential peeling of the
    identical affinity edge set (k-cores are confluent — any peeling
    order yields the same maximal subgraph), including each surviving
    node's in-core degree."""
    import duckdb

    got = sorted(tuple(r) for r in SPECS["kcore_copurchase"].fn(spark, oracle_sf_dir).collect())

    edges = duckdb.sql(f"""
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM '{oracle_sf_dir}/lineitem.parquet' a
        JOIN '{oracle_sf_dir}/lineitem.parquet' b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """).fetchall()
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    k = 3
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    want = sorted((n, len(nb)) for n, nb in adj.items())
    assert got == want
    assert 0 < len(want) < len(edges)  # nontrivial: some peeled, some survive


def test_pca_power_matches_numpy_replica(spark, oracle_sf_dir):
    """pca_power_frame == a NumPy float64 replica of the identical
    algorithm (same start vector, same rounds, same sign fix) to 1e-6 —
    the engine's decimal staging only perturbs at ~1e-12/step."""
    import numpy as np

    from cooler_mapreduce_spark.operators.similarity import (
        _PCA_ROUNDS,
        pca_power_frame,
    )

    mu, v, eig, total = pca_power_frame(spark, oracle_sf_dir)

    rows = (
        spark.read.parquet(f"{oracle_sf_dir}/embeddings.parquet")
        .select("embedding")
        .collect()
    )
    X = np.array([list(r.embedding) for r in rows], dtype=np.float64)
    mu_np = X.mean(axis=0)
    Xc = X - mu_np
    v_np = np.zeros(X.shape[1])
    v_np[0] = 1.0
    w_np = v_np
    for _ in range(_PCA_ROUNDS):
        w_np = Xc.T @ (Xc @ v_np)
        v_np = w_np / np.linalg.norm(w_np)
    pivot = int(np.argmax(np.abs(v_np)))
    if v_np[pivot] < 0:
        v_np = -v_np
    assert np.allclose(np.array(mu), mu_np, atol=1e-6)
    assert np.allclose(np.array(v), v_np, atol=1e-6)
    assert abs(eig - np.linalg.norm(w_np)) / np.linalg.norm(w_np) < 1e-6
    assert abs(total - (Xc * Xc).sum()) / (Xc * Xc).sum() < 1e-9
    # unit norm + deterministic re-run
    assert abs(sum(c * c for c in v) - 1.0) < 1e-12
    _, v2, eig2, _ = pca_power_frame(spark, oracle_sf_dir)
    assert v2 == v and eig2 == eig


def test_frame_dedup_positive_path(spark):
    """Synthetic videos with genuinely shared frames: A and B share a long
    common prefix (trimmed-copy scenario), C is unrelated, D is a
    boilerplate frame shared by too many docs (bucket cap drops it)."""
    from cooler_mapreduce_spark.operators.multimodal import (
        frame_dedup_pairs,
        sample_frames,
    )

    # 4096 shared bytes with period > 256 -> 16 DISTINCT shared frames
    common = bytes(((i * 31) + (i >> 8)) & 0xFF for i in range(4096))
    repeat = bytes(range(256)) * 16          # degenerate: 16 IDENTICAL frames
    rows = [
        (1, common + b"A" * 512),
        (2, common + b"B" * 2048),           # same prefix, different tail
        (3, bytes(reversed(range(256))) * 20),  # unrelated
        (4, repeat),
        (5, repeat + b"C" * 300),            # shares only the repeated frame
    ]
    import pandas as pd

    frames = []
    for doc_id, blob in rows:
        for i, fr in enumerate(sample_frames(blob, 1, fake=True)):
            frames.append((doc_id, i, bytearray(fr)))
    df = spark.createDataFrame(
        pd.DataFrame(frames, columns=["doc_id", "frame_no", "frame"])
    )
    got = {
        (r.doc_a, r.doc_b, r.n_shared_frames)
        for r in frame_dedup_pairs(df, bucket_cap=16, min_shared=3).collect()
    }
    # 1/2 share 16 DISTINCT fingerprints; 4/5 share only ONE (their 16
    # common frames are the same repeated pattern -> one fingerprint, so
    # distinct-fingerprint counting keeps them under min_shared=3 — the
    # black-frame false-positive the distinct() exists for).
    assert got == {(1, 2, 16)}
    got1 = {
        (r.doc_a, r.doc_b)
        for r in frame_dedup_pairs(df, bucket_cap=16, min_shared=1).collect()
    }
    assert got1 == {(1, 2), (4, 5)}


def test_label_propagation_matches_pure_python_replica(spark, oracle_sf_dir):
    """Synchronous LPA with the (count DESC, label ASC) argmax is fully
    deterministic — the distributed rounds must equal a sequential
    replica of the identical update rule on the identical affinity
    edges, community by community."""
    import duckdb

    got = sorted(
        tuple(r)
        for r in SPECS["label_propagation_communities"].fn(spark, oracle_sf_dir).collect()
    )

    edges = duckdb.sql(f"""
        SELECT a.l_partkey AS u, b.l_partkey AS v
        FROM '{oracle_sf_dir}/lineitem.parquet' a
        JOIN '{oracle_sf_dir}/lineitem.parquet' b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """).fetchall()
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    label = {n: n for n in adj}
    for _ in range(5):
        nxt = {}
        for n, nbrs in adj.items():
            counts = {}
            for m in nbrs:
                counts[label[m]] = counts.get(label[m], 0) + 1
            nxt[n] = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        label = nxt
    comm = {}
    for n, lb in label.items():
        comm.setdefault(lb, []).append(n)
    want = sorted((lb, len(ms), min(ms)) for lb, ms in comm.items())
    assert got == want
    assert 1 < len(want) < len(adj)  # nontrivial: real grouping happened


def test_semdedup_prune_monotone_in_threshold(spark, oracle_sf_dir):
    """SemDeDup invariants the oracle can't see: (1) raising τ can only
    prune FEWER items (the offending-pair set shrinks), (2) a τ above
    the corpus max cosine prunes nothing, (3) every cell keeps at least
    its top-priority member (the first item in the keep order has no
    earlier cellmate, so no τ can prune it), (4) the census partitions
    the corpus: n_pruned + n_kept == n_total summing to |embeddings|."""
    from cooler_mapreduce_spark.operators.similarity import semdedup_prune_cells

    rows_lo = {r.cell: r for r in semdedup_prune_cells(spark, oracle_sf_dir).collect()}
    rows_hi = {
        r.cell: r
        for r in semdedup_prune_cells(spark, oracle_sf_dir, thr=0.40).collect()
    }
    rows_off = semdedup_prune_cells(spark, oracle_sf_dir, thr=1.01).collect()
    assert rows_lo and set(rows_lo) == set(rows_hi)
    for cell, lo in rows_lo.items():
        hi = rows_hi[cell]
        assert lo.n_pruned + lo.n_kept == lo.n_total == hi.n_total
        assert hi.n_pruned <= lo.n_pruned          # (1)
        assert lo.n_kept >= 1                      # (3)
    assert all(r.n_pruned == 0 for r in rows_off)  # (2)
    n_emb = spark.read.parquet(f"{oracle_sf_dir}/embeddings.parquet").count()
    assert sum(r.n_total for r in rows_lo.values()) == n_emb  # (4)


def test_jl_projection_fidelity_at_predicted_noise_level(spark, oracle_sf_dir):
    """The JL audit's error must sit at the 1/sqrt(k) noise level the
    lemma predicts for k=16 (~0.25): clearly above zero (the projection
    IS lossy — an all-but-zero error would mean the audit compares the
    vector with itself) and bounded (mean < 0.25, max < 0.75, measured
    0.20 / 0.69). Also: the projection must be deterministic across
    runs (literal planes), and cos_proj must stay a valid cosine."""
    from cooler_mapreduce_spark.operators.similarity import (
        embedding_jl_projection_fidelity,
    )

    rows = embedding_jl_projection_fidelity(spark, oracle_sf_dir).collect()
    assert len(rows) == 50 * 49 // 2
    errs = [abs(r.cos_full - r.cos_proj) for r in rows]
    mean = sum(errs) / len(errs)
    assert 0.05 < mean < 0.25, mean
    assert max(errs) < 0.75, max(errs)
    assert all(-1.0 <= r.cos_proj <= 1.0 for r in rows)
    rows2 = embedding_jl_projection_fidelity(spark, oracle_sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_pq_codes_informative_and_fidelity_bounded(spark, oracle_sf_dir):
    """PQ invariants beyond the hash check: codes come from the label
    set; the code space is actually USED (no codebook collapse); each
    subspace's code agrees with the vector's own label above the 10%
    random rate (the sub-centroids are label means, so the own-label
    centroid should win more often than chance); reconstruction
    fidelity sits in the measured band for this weak-cluster fixture
    (mean ≈0.39) and never collapses to ~0; deterministic re-run."""
    from cooler_mapreduce_spark.operators.similarity import embedding_pq_fidelity
    from cooler_mapreduce_spark.sources.catalog import table

    df = embedding_pq_fidelity(spark, oracle_sf_dir)
    emb = table(spark, oracle_sf_dir, "embeddings").select("vec_id", "label")
    rows = df.join(emb, "vec_id").collect()
    labels = {r.label for r in rows}
    n = len(rows)
    assert n == emb.count()
    for s in (1, 2, 3, 4):
        codes = [getattr(r, f"code{s}") for r in rows]
        assert set(codes) <= labels
        own = sum(1 for r in rows if getattr(r, f"code{s}") == r.label) / n
        assert own > 1.5 / len(labels), (s, own)
    assert len({(r.code1, r.code2, r.code3, r.code4) for r in rows}) > n // 5
    fids = [r.cos_fidelity for r in rows]
    assert 0.3 < sum(fids) / n < 0.6, sum(fids) / n
    assert min(fids) > 0.1
    again = embedding_pq_fidelity(spark, oracle_sf_dir).collect()
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, again))


def test_pq_adc_recall_above_random_below_exact(spark, oracle_sf_dir):
    """The PQ-ADC recall audit must land where the fidelity predicts:
    above the random-rank baseline (10/(N-1) ~= 0.02 — reconstruction
    carries SOME signal) yet clearly below 0.5 (10 codes per subspace
    cannot rank this weak-cluster corpus — the audit's whole point).
    Every per-query recall stays a valid fraction of TOP_K."""
    from cooler_mapreduce_spark.operators.similarity import ann_recall_pq

    rows = ann_recall_pq(spark, oracle_sf_dir).collect()
    assert len(rows) == 8
    mean = sum(r.recall for r in rows) / len(rows)
    assert 0.02 < mean < 0.5, mean
    assert all(0.0 <= r.recall <= 1.0 and r.hits == round(r.recall * 10) for r in rows)


def test_dp_noise_has_laplace_shape_and_census_partitions(spark, oracle_sf_dir):
    """Governance invariants: (a) the DP release's noise draws are the
    deterministic Laplace(1/eps) inverse-CDF samples — nonzero, distinct
    across groups (seeded per key), and bounded by the draw the hash
    uniform implies; (b) re-release reuses the SAME draw (privacy-budget
    pinning); (c) the k-anonymity census partitions the table exactly:
    band row totals sum to |customer| and min/max respect band edges."""
    from cooler_mapreduce_spark.operators.governance import (
        dp_noisy_segment_counts,
        kanonymity_census,
    )
    from cooler_mapreduce_spark.sources.catalog import table

    c = table(spark, oracle_sf_dir, "customer")
    exact = {
        r.segment: r.n
        for r in c.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rel = dp_noisy_segment_counts(spark, oracle_sf_dir).collect()
    noises = {r.segment: r.noisy_count - exact[r.segment] for r in rel}
    assert all(abs(v) > 1e-9 for v in noises.values())          # noise applied
    assert len(set(round(v, 6) for v in noises.values())) == len(noises)
    assert all(abs(v) < 40 for v in noises.values())            # < b*ln(1e6)
    rel2 = dp_noisy_segment_counts(spark, oracle_sf_dir).collect()
    assert sorted(map(tuple, rel)) == sorted(map(tuple, rel2))  # pinned draw

    rows = kanonymity_census(spark, oracle_sf_dir).collect()
    assert sum(r.n_rows for r in rows) == c.count()
    for r in rows:
        if r.band == "k<5":
            assert r.max_k < 5
        elif r.band == "5<=k<20":
            assert 5 <= r.min_k and r.max_k < 20
        else:
            assert r.min_k >= 20


def test_jl_recall_beats_pq_and_random(spark, oracle_sf_dir):
    """The compression->recall matrix must order sensibly on this
    fixture: JL-16 ranking (mean recall ~0.10) beats PQ-ADC (~0.06)
    beats random (~0.02) and all stay below 0.5 — the quantitative
    ordering the fidelity audits predict (JL mean cos error 0.20 vs
    PQ reconstruction fidelity 0.39 but with only 10 codes/subspace)."""
    from cooler_mapreduce_spark.operators.similarity import (
        ann_recall_jl,
        ann_recall_pq,
    )

    jl = [r.recall for r in ann_recall_jl(spark, oracle_sf_dir).collect()]
    pq = [r.recall for r in ann_recall_pq(spark, oracle_sf_dir).collect()]
    mean_jl, mean_pq = sum(jl) / len(jl), sum(pq) / len(pq)
    assert 0.02 < mean_jl < 0.5, mean_jl
    assert mean_jl > mean_pq > 0.02, (mean_jl, mean_pq)


def test_ccnet_buckets_partition_and_order(spark, oracle_sf_dir):
    """The tercile split must partition the corpus into three near-equal
    buckets (binned cutoffs land within one bin of exact terciles),
    with head < middle < tail mean NLL — the monotonicity that makes
    the keep/sample/drop policy meaningful."""
    rows = {r.bucket: r for r in SPECS["ccnet_perplexity_buckets"]
            .fn(spark, oracle_sf_dir).collect()}
    assert set(rows) == {"head", "middle", "tail"}
    n = sum(r.n_docs for r in rows.values())
    # tolerance: tie blocks (identical nll) straddling a cutoff go whole
    # to one side, plus the one-crossing-bin interpolation error
    for r in rows.values():
        assert abs(r.n_docs - n / 3) <= max(5, 0.05 * n), (r.bucket, r.n_docs, n)
    assert rows["head"].mean_nll < rows["middle"].mean_nll < rows["tail"].mean_nll


def test_takedown_cascade_manifest_matches_oracle(spark, oracle_sf_dir):
    """The right-to-erasure cascade audit must hash-match its DuckDB
    oracle at the oracle SF — deleted/retained/leaked counts per
    entity, with the leak counts 0 because the in-plan simulated
    delete job IS correct (the kernel takes the retained snapshots as
    inputs; the injection test below proves the same kernel goes
    positive on a faulty one)."""
    from cooler_mapreduce_spark.operators.governance import (
        TAKEDOWN_ORACLE,
        takedown_cascade_manifest,
    )
    from tests.oracle import assert_matches_oracle

    df = takedown_cascade_manifest(spark, oracle_sf_dir)
    assert_matches_oracle(df, TAKEDOWN_ORACLE, oracle_sf_dir, "takedown_cascade")
    rows = {r.entity: r for r in df.collect()}
    assert set(rows) == {"customer", "orders", "lineitem"}
    assert all(r.n_leaked == 0 for r in rows.values())
    assert rows["customer"].n_deleted > 0  # positive path at oracle SF


def test_takedown_audit_detects_leaky_delete_job(spark, oracle_sf_dir):
    """FALSIFIABILITY of the leak legs (r10 verdict What's-wrong #1):
    feed the audit kernel a delete job that MISSED rows — some
    requested customers retained, some of their orders retained, some
    lineitems of deleted orders retained — and every per-entity leak
    count must equal the independently computed miss count. A kernel
    whose leak expressions were tautologies of the request predicate
    (or hard-coded 0) fails here."""
    from cooler_mapreduce_spark.operators.governance import (
        _TAKEDOWN_MOD,
        takedown_audit_frame,
    )
    from cooler_mapreduce_spark.sources.catalog import table

    c = table(spark, oracle_sf_dir, "customer", fan_out=False)
    o = table(spark, oracle_sf_dir, "orders", fan_out=False)
    li = table(spark, oracle_sf_dir, "lineitem", fan_out=False).select(
        "l_orderkey", "l_linenumber"
    )
    req = c.filter(F.col("c_custkey") % _TAKEDOWN_MOD == 0).select("c_custkey")
    del_o_keys = o.join(req, o.o_custkey == req.c_custkey, "left_semi").select(
        "o_orderkey"
    )
    # the FAULTY delete job: every 3rd condemned row survives
    missed_c = F.col("c_custkey") % (3 * _TAKEDOWN_MOD) == 0
    post_c = c.filter((F.col("c_custkey") % _TAKEDOWN_MOD != 0) | missed_c)
    post_o = o.join(req, o.o_custkey == req.c_custkey, "left_anti").unionAll(
        o.join(req, o.o_custkey == req.c_custkey, "left_semi").filter(
            F.col("o_orderkey") % 3 == 0
        )
    )
    post_l = li.join(
        del_o_keys, li.l_orderkey == del_o_keys.o_orderkey, "left_anti"
    ).unionAll(
        li.join(del_o_keys, li.l_orderkey == del_o_keys.o_orderkey, "left_semi")
        .filter(F.col("l_orderkey") % 3 == 0)
    )
    rows = {
        r.entity: r
        for r in takedown_audit_frame(req, c, o, li, post_c, post_o, post_l).collect()
    }
    want_leak_c = c.filter(missed_c).count()
    want_leak_o = (
        o.join(req, o.o_custkey == req.c_custkey, "left_semi")
        .filter(F.col("o_orderkey") % 3 == 0)
        .count()
    )
    want_leak_l = (
        li.join(del_o_keys, li.l_orderkey == del_o_keys.o_orderkey, "left_semi")
        .filter(F.col("l_orderkey") % 3 == 0)
        .count()
    )
    assert want_leak_c > 0 and want_leak_o > 0 and want_leak_l > 0
    assert rows["customer"].n_leaked == want_leak_c
    assert rows["orders"].n_leaked == want_leak_o
    assert rows["lineitem"].n_leaked == want_leak_l
    # deleted/retained stay consistent with the faulty snapshots
    assert rows["customer"].n_deleted == req.count() - want_leak_c
    assert rows["customer"].n_retained == post_c.count()
    assert rows["orders"].n_retained == post_o.count()
    assert rows["lineitem"].n_retained == post_l.count()


def test_takedown_scd2_detects_current_only_delete(spark, oracle_sf_dir):
    """The SCD2-erasure trap, made falsifiable: a delete job that drops
    only a requested key's CURRENT version leaves its historical
    versions behind. Feed the version-class audit kernel that faulty
    post-delete history and the 'historical' class must report exactly
    the requested keys' historical version count as leaked while
    'current' reads clean — the split a current-only filter produces
    and a whole-history cascade never does."""
    from cooler_mapreduce_spark.operators.governance import (
        _TAKEDOWN_MOD,
        takedown_versions_audit_frame,
    )
    from cooler_mapreduce_spark.operators.merge import scd2_customer_history
    from cooler_mapreduce_spark.sources.catalog import table

    hist = scd2_customer_history(spark, oracle_sf_dir).select(
        "custkey", "version", "is_current"
    )
    c = table(spark, oracle_sf_dir, "customer", fan_out=False)
    req = c.filter(F.col("c_custkey") % _TAKEDOWN_MOD == 0).select(
        F.col("c_custkey").alias("custkey")
    )
    # the FAULTY delete job: only requested keys' CURRENT rows removed
    requested = hist.join(req, "custkey", "left_semi")
    post = hist.join(
        requested.filter(F.col("is_current")).select("custkey", "version"),
        ["custkey", "version"],
        "left_anti",
    )
    rows = {
        r.version_class: r
        for r in takedown_versions_audit_frame(req, hist, post).collect()
    }
    want_hist_leak = requested.filter(~F.col("is_current")).count()
    want_cur_del = requested.filter(F.col("is_current")).count()
    assert want_hist_leak > 0 and want_cur_del > 0  # positive path at oracle SF
    assert rows["historical"].n_leaked == want_hist_leak
    assert rows["historical"].n_deleted == 0
    assert rows["current"].n_leaked == 0
    assert rows["current"].n_deleted == want_cur_del
    assert rows["historical"].n_retained == post.filter(~F.col("is_current")).count()


def test_erasure_propagation_detects_retained_embeddings(spark, oracle_sf_dir):
    """STAGED r12 kernel: a document erasure propagated to the source
    table and the fingerprint artifact but NOT to the embedding corpus
    (the 'model artifacts still hold the erased data' compliance hole)
    must report exactly the requested vectors as embedding leaks while
    documents and fingerprints read clean; the fully-propagated run
    must read zero leaks everywhere with the request-set delete count
    on every artifact."""
    from cooler_mapreduce_spark.operators.governance import (
        _TAKEDOWN_DOC_MOD,
        erasure_propagation_manifest,
    )
    from cooler_mapreduce_spark.operators.textstats import doc_fingerprint
    from cooler_mapreduce_spark.sources.catalog import table

    docs = table(spark, oracle_sf_dir, "documents", fan_out=False).select(
        "doc_id", "n_chars"
    )
    emb = table(spark, oracle_sf_dir, "embeddings", fan_out=False).select(
        "vec_id", "label"
    )
    fp = doc_fingerprint(spark, oracle_sf_dir).select("doc_id")
    req = docs.filter(F.col("doc_id") % _TAKEDOWN_DOC_MOD == 0).select("doc_id")
    n_req = req.count()
    assert n_req > 0

    docs_post = docs.join(req, "doc_id", "left_anti")
    fp_post = fp.join(req, "doc_id", "left_anti")
    emb_post_full = emb.join(
        req.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_anti"
    )

    # fully propagated: every artifact clean, request-count deletes
    rows = {
        r.artifact: r
        for r in erasure_propagation_manifest(
            req,
            [
                ("documents", ["doc_id"], docs, docs_post),
                ("doc_fingerprint", ["doc_id"], fp, fp_post),
                ("embeddings", ["vec_id"], emb, emb_post_full),
            ],
        ).collect()
    }
    assert set(rows) == {"documents", "doc_fingerprint", "embeddings"}
    assert all(r.n_leaked == 0 for r in rows.values())
    assert all(r.n_deleted == n_req for r in rows.values())

    # the compliance hole: embeddings never cascaded
    rows = {
        r.artifact: r
        for r in erasure_propagation_manifest(
            req,
            [
                ("documents", ["doc_id"], docs, docs_post),
                ("doc_fingerprint", ["doc_id"], fp, fp_post),
                ("embeddings", ["vec_id"], emb, emb),
            ],
        ).collect()
    }
    assert rows["embeddings"].n_leaked == n_req
    assert rows["embeddings"].n_deleted == 0
    assert rows["documents"].n_leaked == 0
    assert rows["doc_fingerprint"].n_leaked == 0


def test_retention_audit_detects_both_failure_modes(spark, oracle_sf_dir):
    """Falsifiability pins for the retention audit kernel's TWO failure
    counters: (a) a hold-ignoring expiry job (purges everything old,
    litigation holds included) must read exactly the held expired rows
    as n_overdeleted, and (b) a lazy job that skips one year's slice
    must read that slice as n_leaked — each pinned per year to an
    independently computed set, so a hard-coded zero in either leg
    fails here."""
    from cooler_mapreduce_spark.operators.governance import (
        _LEGAL_HOLD_MOD,
        _RETENTION_CUTOFF,
        retention_audit_frame,
    )
    from cooler_mapreduce_spark.sources.catalog import table

    o = table(spark, oracle_sf_dir, "orders", fan_out=False).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    hold = (
        table(spark, oracle_sf_dir, "customer", fan_out=False)
        .filter(F.col("c_custkey") % _LEGAL_HOLD_MOD == 0)
        .select("c_custkey")
    )
    cutoff = F.lit(_RETENTION_CUTOFF).cast("timestamp_ntz")
    expired = o.filter(F.col("o_orderdate") < cutoff)
    condemned = expired.join(
        hold, o.o_custkey == F.col("c_custkey"), "left_anti"
    ).select("o_orderkey", "o_orderdate")
    held_expired = expired.join(
        hold, expired.o_custkey == F.col("c_custkey"), "left_semi"
    )
    assert held_expired.count() > 0  # positive path at oracle SF

    # (a) hold-ignoring job: deletes ALL expired rows, holds included
    post_a = o.filter(F.col("o_orderdate") >= cutoff).select(
        "o_orderkey", "o_orderdate"
    )
    rows = {
        r["order_year"]: r
        for r in retention_audit_frame(o, post_a, condemned).collect()
    }
    over_want = {
        r["order_year"]: r["n"]
        for r in held_expired.groupBy(
            F.year("o_orderdate").alias("order_year")
        ).agg(F.count("*").alias("n")).collect()
    }
    assert any(n > 0 for n in over_want.values())
    for y, r in rows.items():
        assert r["n_overdeleted"] == over_want.get(y, 0)
        assert r["n_leaked"] == 0  # it deleted everything condemned, and then some

    # (b) lazy job: correct policy delete except it skips one year
    skip_year = 1996
    kept_slice = condemned.filter(F.year("o_orderdate") == skip_year)
    n_slice = kept_slice.count()
    assert n_slice > 0
    post_b = o.join(
        condemned.filter(F.year("o_orderdate") != skip_year).select("o_orderkey"),
        "o_orderkey",
        "left_anti",
    ).select("o_orderkey", "o_orderdate")
    rows = {
        r["order_year"]: r
        for r in retention_audit_frame(o, post_b, condemned).collect()
    }
    assert rows[skip_year]["n_leaked"] == n_slice
    assert rows[skip_year]["n_deleted"] == 0
    for y, r in rows.items():
        assert r["n_overdeleted"] == 0
        if y != skip_year:
            assert r["n_leaked"] == 0


def test_ivf_delta_assign_matches_sequential_mirror(spark, oracle_sf_dir):
    """STAGED r12 kernel: the incremental IVF maintenance manifest must
    equal a sequential Python mirror (same fixed-point centroid fit on
    the base, same round-9 cosine, same lowest-cell tie-break) on the
    real base/delta split, and the label-permutation injection (a delta
    batch whose labels were rotated) must drive n_drifted positive and
    flag refits — pinned per cell to the mirror's counts."""
    import math

    from cooler_mapreduce_spark.operators.similarity import (
        _IVF_DELTA_MOD,
        _IVF_REFIT_DRIFT,
        _labelmean_centroids_frame,
        ivf_delta_assign_frame,
    )
    from cooler_mapreduce_spark.sources.catalog import table

    emb = table(spark, oracle_sf_dir, "embeddings", fan_out=False)
    base = emb.filter(F.col("vec_id") % _IVF_DELTA_MOD != 0)
    delta = emb.filter(F.col("vec_id") % _IVF_DELTA_MOD == 0)
    cents = _labelmean_centroids_frame(base)

    # sequential mirror: same fixed-point fit, same assignment
    rows = emb.select("vec_id", "label", "embedding").collect()
    base_rows = [r for r in rows if r["vec_id"] % _IVF_DELTA_MOD != 0]
    delta_rows = [r for r in rows if r["vec_id"] % _IVF_DELTA_MOD == 0]
    sums: dict[int, list[int]] = {}
    counts: dict[int, int] = {}
    dim = len(rows[0]["embedding"])
    for r in base_rows:
        acc = sums.setdefault(r["label"], [0] * dim)
        for i, v in enumerate(r["embedding"]):
            acc[i] += math.floor(float(v) * 1073741824.0)
        counts[r["label"]] = counts.get(r["label"], 0) + 1
    mirror_cents = {
        lab: [(s / 1073741824.0) / counts[lab] for s in acc]
        for lab, acc in sums.items()
    }
    assert {c for c, _ in cents} == set(mirror_cents)
    for c, vec in cents:
        assert vec == pytest.approx(mirror_cents[c], abs=0.0)

    def mirror_assign(r):
        v = [float(x) for x in r["embedding"]]
        nrm = math.sqrt(sum(x * x for x in v))
        best = None
        for cell, cvec in sorted(mirror_cents.items()):
            nc = math.sqrt(sum(x * x for x in cvec))
            score = round(sum(a * b for a, b in zip(v, cvec)) / (nrm * nc), 9)
            if best is None or score > best[1]:
                best = (cell, score)
        return best[0]

    from collections import defaultdict

    m_base = defaultdict(int)
    for r in base_rows:
        m_base[mirror_assign(r)] += 1
    m_add = defaultdict(int)
    m_drift = defaultdict(int)
    for r in delta_rows:
        c = mirror_assign(r)
        m_add[c] += 1
        if r["label"] != c:
            m_drift[c] += 1

    got = {r["cell"]: r for r in ivf_delta_assign_frame(base, delta, cents).collect()}
    cells = set(m_base) | set(m_add)
    assert set(got) == cells
    for c in cells:
        assert got[c]["n_base"] == m_base.get(c, 0), c
        assert got[c]["n_added"] == m_add.get(c, 0), c
        assert got[c]["n_drifted"] == m_drift.get(c, 0), c
        tot = m_base.get(c, 0) + m_add.get(c, 0)
        assert got[c]["added_share"] == pytest.approx(
            round(m_add.get(c, 0) / tot, 9), abs=0.0
        )
    assert sum(r["n_added"] for r in got.values()) == len(delta_rows)

    # drift injection: rotate the delta labels — the vectors still land
    # in their true cells, but their claimed labels now disagree
    n_labels = len(mirror_cents)
    rotated = delta.withColumn("label", (F.col("label") + 1) % n_labels)
    inj = {
        r["cell"]: r
        for r in ivf_delta_assign_frame(base, rotated, cents).collect()
    }
    want_drift = defaultdict(int)
    for r in delta_rows:
        c = mirror_assign(r)
        if (r["label"] + 1) % n_labels != c:
            want_drift[c] += 1
    assert sum(want_drift.values()) > 0
    for c, r in inj.items():
        assert r["n_drifted"] == want_drift.get(c, 0), c
        if r["n_added"] > 0:
            assert r["refit"] == (
                want_drift.get(c, 0) / r["n_added"] > _IVF_REFIT_DRIFT
            )
    assert any(r["refit"] for r in inj.values())


def test_ivf_maintenance_face_matches_staged_oracle(spark, oracle_sf_dir):
    """The staged r12 face must already hash-match its kept-beside
    oracle (the takedown template: registration becomes a one-line
    @query move with zero new risk)."""
    from cooler_mapreduce_spark.operators.similarity import (
        IVF_DELTA_ORACLE,
        ivf_index_maintenance,
    )
    from tests.oracle import assert_matches_oracle

    assert_matches_oracle(
        ivf_index_maintenance(spark, oracle_sf_dir),
        IVF_DELTA_ORACLE,
        oracle_sf_dir,
        name="ivf_index_maintenance(staged)",
    )
