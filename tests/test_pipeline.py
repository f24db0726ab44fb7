"""Pipeline + multimodal operator tests (Spark-side semantics that the
DuckDB oracles can't cover: LSH recall, simhash properties, stubbed
decoder seams)."""

import pytest
from pyspark.sql import functions as F

from parquet_go_spark import multimodal as M
from parquet_go_spark import pipeline as P

SF = "/root/testdata/sf0.001"


def test_minhash_candidates_superset_sanity(spark):
    """Every exact-Jaccard pair above a high threshold should be an LSH
    candidate with these band parameters (8 bands × 4 rows ≈ s-curve
    midpoint ~0.6); at the fixture's low similarities we just assert
    the candidate set is deterministic across two runs."""
    a = {tuple(r) for r in P.dedup_minhash_lsh(spark, SF).collect()}
    b = {tuple(r) for r in P.dedup_minhash_lsh(spark, SF).collect()}
    assert a == b


def test_simhash_is_deterministic_and_64bit(spark):
    rows = P.simhash(spark, SF).collect()
    assert len(rows) > 0
    again = {r["doc_id"]: r["simhash"] for r in P.simhash(spark, SF).collect()}
    for r in rows:
        assert again[r["doc_id"]] == r["simhash"]


def test_ann_lsh_recall_vs_exact(spark):
    """The bucketed path must recover a reasonable fraction of the
    exact top-k (random-hyperplane LSH, 8 bits, top-10 of 500)."""
    exact = P.ann_cosine_topk(spark, SF, n_queries=5, k=10).collect()
    approx = P.ann_lsh_topk(spark, SF, n_queries=5, k=10).collect()
    ex = {(r["query_id"], r["vec_id"]) for r in exact}
    ap = {(r["query_id"], r["vec_id"]) for r in approx}
    assert len(ap) > 0
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.2, recall  # 8-bit buckets on near-random vectors


def test_multimodal_metadata_and_features(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with_payloads = M.attach_fake_payloads(docs)
    meta = M.extract_metadata(with_payloads).collect()
    n_docs = docs.count()
    assert len(meta) == n_docs
    assert all(r["n_bytes"] > 0 and r["modality"] in
               ("image", "audio", "video") for r in meta)

    feats = M.decode_features(with_payloads).collect()
    assert len(feats) == n_docs
    for r in feats[:10]:
        assert len(r["features"]) == 8
        assert abs(sum(r["features"]) - 1.0) < 1e-9  # histogram sums to 1


def test_multimodal_real_decoder_raises(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(2)
    with_payloads = M.attach_fake_payloads(docs)
    with pytest.raises(Exception, match="Pillow|NotImplementedError"):
        M.decode_features(with_payloads, decoder="pil").collect()


def test_frame_sample_counts(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    frames = M.frame_sample(M.attach_fake_payloads(docs))
    got = {r["doc_id"]: r["n"] for r in
           frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    want = {r["doc_id"]: -(-r["n"] // 64) for r in
            docs.select("doc_id", F.length("text").alias("n")).collect()}
    assert got == want


def test_dedup_embedding_blocked_matches_exact(spark):
    """The LSH-block + exact-rerank arm must recover the full
    brute-force pair set at test scale (seeded planes, 2×16) — forced
    past the cost-based exact crossover with exact_max=0. The
    registered path itself takes the exact arm at this n and must
    (trivially but contractually) match too."""
    exact = {tuple(r) for r in P.dedup_embedding_exact(spark, SF).collect()}
    lsh = {tuple(r) for r in P.dedup_embedding_df(
        P._embeddings(spark, SF), exact_max=0).collect()}
    assert lsh == exact, (len(lsh), len(exact))
    registered = {tuple(r) for r in P.dedup_embedding(spark, SF).collect()}
    assert registered == exact, (len(registered), len(exact))


def _near_dup_fixture(spark, n_cluster=3000, n_random=1000, dim=64):
    """n_cluster near-identical vectors (one megacluster — the LSH
    hot-bucket hazard) + n_random unrelated vectors; ids 0..n-1 with
    the cluster first so its rep is the min id."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    base = rng.standard_normal(dim)
    base /= np.linalg.norm(base)
    cluster = base + 0.01 * rng.standard_normal((n_cluster, dim))
    rand = rng.standard_normal((n_random, dim))
    m = np.vstack([cluster, rand]).astype("float32")
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n_cluster + n_random, dtype="int64"),
         "embedding": list(m)}
    )
    return spark.createDataFrame(pdf)


def test_dedup_embedding_hot_bucket_star_cap(spark):
    """A k-duplicate megacluster must NOT fan out O(k²) candidate pairs:
    buckets wider than EMB_BUCKET_CAP emit a star through the bucket
    rep, so the candidate count stays linear-ish in n while the exact
    rerank + connected components still recover the full cluster."""
    n_cluster, n_random = 3000, 1000
    emb = _near_dup_fixture(spark, n_cluster, n_random).cache()
    n = n_cluster + n_random
    n_planes = P._emb_planes_for(n)
    assert n_planes > P.DEDUP_EMB_PLANES  # adaptive: 4000 vecs > 4 buckets
    cand = P._emb_candidates(emb, n_planes).count()
    # uncapped, the cluster alone is >= tables * k^2/2 = 72M pairs
    assert cand < (n_cluster * n_cluster) // 4, cand
    pairs = P.dedup_embedding_df(emb, threshold=0.9, exact_max=0)
    nodes = emb.select(F.col("vec_id").alias("doc_id"))
    edges = pairs.select(F.col("id_a").alias("doc_a"),
                         F.col("id_b").alias("doc_b"))
    edges = edges.unionByName(
        edges.select(F.col("doc_b").alias("doc_a"),
                     F.col("doc_a").alias("doc_b")))
    comp = {r["doc_id"]: r["component"]
            for r in P.min_label_components(nodes, edges, 10).collect()}
    assert all(comp[i] == 0 for i in range(n_cluster))  # one cluster, rep 0
    emb.unpersist()


def test_components_long_path_checkpointed(spark):
    """min-label propagation over a diameter-15 path graph: converges,
    and localCheckpoint bounds the plan depth (the returned frame's
    lineage roots at a LogicalRDD scan, not 15 stacked join rounds)."""
    n = 16
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    fwd = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    edges = fwd.unionByName(
        fwd.select(F.col("doc_b").alias("doc_a"),
                   F.col("doc_a").alias("doc_b")))
    labels = P.min_label_components(nodes, edges, max_iters=40)
    comp = {r["doc_id"]: r["component"] for r in labels.collect()}
    assert comp == {i: 0 for i in range(n)}
    plan = labels._jdf.queryExecution().optimizedPlan().toString()
    assert "ExistingRDD" in plan  # checkpoint truncated the lineage
    assert len(plan) < 25_000, len(plan)


def test_simhash_jvm_matches_numpy_reference(spark):
    """The JVM bit-vote aggregation must reproduce the classic numpy
    fold over the same xxhash64 token hashes."""
    import numpy as np

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).withColumn("h", F.xxhash64("token"))
    ref = {}
    for doc_id, rows in __import__("itertools").groupby(
        sorted(tok.collect(), key=lambda r: r["doc_id"]),
        key=lambda r: r["doc_id"],
    ):
        h = np.array([r["h"] for r in rows], dtype=np.int64).view(np.uint64)
        bits = (h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        votes = (bits.astype(np.int64) * 2 - 1).sum(axis=0)
        sig = np.uint64(0)
        for b in np.flatnonzero(votes > 0):
            sig |= np.uint64(1) << np.uint64(b)
        ref[doc_id] = int(sig.view(np.int64) if hasattr(sig, "view")
                          else np.array([sig], np.uint64).view(np.int64)[0])
    got = {r["doc_id"]: r["simhash"]
           for r in P.simhash(spark, SF).collect() if r["doc_id"] in ref}
    for k in ref:
        assert got[k] == ref[k], (k, got[k], ref[k])


def test_ngram_jaccard_cap_active_drops_hot_shingles(spark):
    """With an aggressively low cap the hot shingles leave the index —
    result rows can only shrink, never error."""
    base = P.dedup_ngram_jaccard(spark, SF).count()
    capped = P.dedup_ngram_jaccard(spark, SF, max_shingle_df=1).count()
    assert capped <= base


def test_ann_ivf_recall_vs_exact(spark):
    """IVF probing must recover a solid fraction of the exact top-k
    (nprobe=4 of 16 cells on near-random vectors)."""
    exact = P.ann_cosine_topk(spark, SF, n_queries=5, k=10).collect()
    approx = P.ann_ivf_topk(spark, SF, n_queries=5, k=10).collect()
    ex = {(r["query_id"], r["vec_id"]) for r in exact}
    ap = {(r["query_id"], r["vec_id"]) for r in approx}
    assert len(ap) > 0
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.2, recall
    again = {(r["query_id"], r["vec_id"])
             for r in P.ann_ivf_topk(spark, SF, n_queries=5, k=10).collect()}
    assert again == ap  # deterministic


def test_minhash_hot_bucket_cap_bounds_pairs(spark, tmp_path):
    """A 1000-identical-doc cluster collides in every band; the capped
    path must emit O(k) star pairs (not O(k^2)) while keeping every
    duplicate connected to the cluster representative, and the capped
    result on a normal corpus must equal the uncapped one."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq

    k = 1000
    text = "the quick brown fox jumps over the lazy dog again and again"
    t = pa.table({
        "doc_id": pa.array(range(k), pa.int64()),
        "lang": pa.array(["en"] * k),
        "text": pa.array([text] * k),
        "n_chars": pa.array([len(text)] * k, pa.int64()),
    })
    sf = str(tmp_path)
    pq.write_table(t, os.path.join(sf, "documents.parquet"))

    pairs = P.dedup_minhash_lsh(spark, sf).collect()
    # star topology: k-1 pairs, not k*(k-1)/2
    assert len(pairs) == k - 1, len(pairs)
    rep = min(min(r["doc_a"], r["doc_b"]) for r in pairs)
    connected = {rep}
    for r in pairs:
        assert r["doc_a"] == rep  # every pair goes through the rep
        connected.add(r["doc_b"])
    assert len(connected) == k  # all duplicates reachable -> one cluster

    # normal corpus (no giant buckets): capped == uncapped, recall intact
    capped = {tuple(r) for r in P.dedup_minhash_lsh(spark, SF).collect()}
    uncapped = {tuple(r)
                for r in P.dedup_minhash_lsh(spark, SF,
                                             bucket_cap=1 << 30).collect()}
    assert capped == uncapped


def test_decontaminate_flags_benchmark_overlap(spark):
    """A corpus doc copying a benchmark passage is flagged; clean docs
    are not; the benchmark side is broadcast (no corpus-text shuffle)."""
    corpus = spark.createDataFrame(
        [
            (1, "the capital of france is paris and it is large"),
            (2, "completely unrelated text about spark codecs here"),
            (3, "nothing shared with any benchmark document at all"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "what is the capital of france is paris answer")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_hits"], r["contaminated"])
           for r in P.decontaminate(spark, corpus=corpus,
                                    benchmark=bench).collect()}
    assert got[1][1] is True and got[1][0] >= 2  # shares 3-grams
    assert got[2] == (0, False)
    assert got[3] == (0, False)
    # plan: benchmark side broadcast
    plan = P.decontaminate(spark, corpus=corpus, benchmark=bench) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
