"""Training-data pipeline operators (dedup, similarity, text analysis).

These go beyond the reference's codec surface: the operations a
100 TB-scale training-data pipeline needs around the storage engine.
All are Spark-first: built-in functions where possible (JVM-side,
whole-stage codegen), vectorized pandas/Arrow kernels where the
semantics need numpy (simhash bit-fold), never per-row Python.

Scale notes per operator are in the docstrings — partitioning, join
strategy, and what changes at 1000 executors.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


# ------------------------------------------------------------------ dedup

def dedup_exact(spark, sf_dir):
    """Exact dedup with pre-hashed shuffle keys: group on
    (xxhash64(text), md5(text)) — ~40 bytes per row crosses the
    exchange instead of whole documents. Only a simultaneous 64-bit +
    128-bit collision (~2^-192) could merge distinct texts, so the
    GROUP BY text oracle matches bit-exactly while the shuffle stays
    O(rows·40B) at any document size."""
    return (
        _documents(spark, sf_dir)
        .select("doc_id", F.xxhash64("text").alias("h1"),
                F.md5(F.col("text").cast("binary")).alias("h2"))
        .groupBy("h1", "h2")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("dup_count"))
        .select("keep_id", "dup_count")
    )


def _word_shingles(df: DataFrame, k: int = 3) -> DataFrame:
    """doc_id → exploded distinct word k-shingles (built-in array ops,
    no Python). Empty/short docs yield no shingles."""
    toks = F.split(F.col("text"), " ")
    # guard: Spark sequence(1, 0) yields a DESCENDING [1, 0], not empty
    idxs = F.when(
        F.size(toks) >= k, F.sequence(F.lit(1), F.size(toks) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(idxs, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    return (
        df.select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def dedup_ngram_jaccard(spark, sf_dir, threshold_num=3, threshold_den=10,
                        max_shingle_df=32):
    """Near-dup candidate pairs by exact word-3-gram Jaccard ≥ 3/10.

    Shingle-inverted-index self-join; integer-only Jaccard test
    (inter*den ≥ union*num) so the oracle matches bit-exactly.

    Scale guard: shingles whose document frequency exceeds
    ``max_shingle_df`` are dropped from the inverted index BEFORE the
    self-join — one ubiquitous shingle otherwise fans out O(df²) pairs
    and a single hot key dominates the shuffle. Document sizes (n_sh)
    still count every shingle, so a pair's Jaccard only *loses* the
    intersections carried exclusively by stop-shingles; at the default
    cap this is a no-op on the test data (max df there is 7) and a
    documented approximation at corpus scale. For the fully sub-
    quadratic path use dedup_minhash_lsh."""
    docs = _documents(spark, sf_dir)
    sh = _word_shingles(docs).cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    rare = (
        sh.groupBy("shingle").agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_shingle_df)
        .select("shingle")
    )
    indexed = sh.join(rare, "shingle")  # stop-shingle cap
    pairs = (
        indexed.alias("a")
        .join(indexed.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn("union_sz", F.col("n_a") + F.col("n_b") - F.col("inter"))
        .filter(F.col("inter") * threshold_den >= F.col("union_sz") * threshold_num)
        .select("doc_a", "doc_b", "inter", "union_sz")
    )


COMPONENTS_CHECKPOINT_EVERY = 5


def min_label_components(nodes: DataFrame, edges: DataFrame,
                         max_iters: int = 20) -> DataFrame:
    """Connected components by iterative min-label propagation: each
    round is a join + min-aggregate on (doc_id,label) pairs, converging
    in O(component diameter) rounds. ``localCheckpoint(eager=True)``
    every COMPONENTS_CHECKPOINT_EVERY rounds truncates the lineage —
    without it 20 cached join+agg rounds stack into a plan whose
    analysis/serialization cost (and recovery re-computation) grows
    per round, a real cliff on deep components at corpus scale.
    Singleton nodes keep their own id as the component.

    ``nodes``: one column ``doc_id``; ``edges``: directed pairs
    (doc_a, doc_b) — pass both directions for an undirected graph."""
    labels = nodes.select(
        "doc_id", F.col("doc_id").alias("component")
    ).localCheckpoint(eager=True)
    edges = edges.localCheckpoint(eager=True)
    for it in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy(F.col("doc_a").alias("doc_id"))
            .agg(F.min("component").alias("n_min"))
        )
        updated = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("component"),
                        F.coalesce(F.col("n_min"), F.col("component")))
                .alias("component"),
            )
        )
        if (it + 1) % COMPONENTS_CHECKPOINT_EVERY == 0:
            updated = updated.localCheckpoint(eager=True)
        else:
            updated = updated.cache()
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "doc_id")
            .filter(F.col("u.component") != F.col("l.component"))
            .count()
        )
        labels.unpersist()
        labels = updated
        if changed == 0:
            break
    return labels.select("doc_id", "component")


def dedup_components(spark, sf_dir, threshold_num=3, threshold_den=10,
                     max_iters: int = 20):
    """Near-dup clustering: connected components over the exact-Jaccard
    pair graph, so each duplicate cluster keeps ONE canonical document
    (min doc_id). Delegates to ``min_label_components`` (checkpointed
    min-label propagation; dup clusters are shallow, so the default 20
    rounds cover realistic diameters)."""
    docs = _documents(spark, sf_dir).select("doc_id")
    pairs = dedup_ngram_jaccard(
        spark, sf_dir, threshold_num, threshold_den
    ).select("doc_a", "doc_b")
    edges = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"),
                     F.col("doc_a").alias("doc_b"))
    )
    return min_label_components(docs, edges, max_iters)


N_MINHASH = 32
LSH_BANDS = 8  # 8 bands × 4 rows
LSH_BUCKET_CAP = 64  # all-pairs only below this; giant buckets go star


def dedup_minhash_lsh(spark, sf_dir, bucket_cap: int = LSH_BUCKET_CAP):
    """MinHash + LSH banding near-dup candidates (no SQL oracle —
    xxhash64 seeds are Spark-specific; driver records rows-only).

    minhash_i(doc) = min over shingles of xxhash64(shingle, i); band
    signature = hash of 4 consecutive minhashes; docs sharing any band
    bucket are candidates.

    HOT-BUCKET CAP (the k-duplicate-cluster hazard): a cluster of k
    near-identical docs collides in every band, and an uncapped
    self-join materializes O(k²) pairs inside ONE task — 10⁶ pairs for
    a single 1000-duplicate cluster. Buckets wider than ``bucket_cap``
    therefore emit a STAR instead (every member paired with the
    bucket's min doc_id): O(k) pairs, same connected components for
    downstream dedup clustering. The approximation: within a giant
    bucket, non-rep pairs lose their direct candidate edge — harmless
    for dedup (members of a giant LSH bucket share a full band
    signature, i.e. they are near-identical and the verifier links
    them through the rep), documented for any caller that needs exact
    pairwise candidates. Shuffles: minhash agg (map-side combined),
    bucket-size agg, and the capped self-join — per-task pair count is
    bounded by bucket_cap² per bucket."""
    docs = _documents(spark, sf_dir)
    sh = _word_shingles(docs)
    mh = sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64("shingle", F.lit(i))).alias(f"mh{i}")
            for i in range(N_MINHASH)
        ]
    )
    rows_per_band = N_MINHASH // LSH_BANDS
    bands = []
    for b in range(LSH_BANDS):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        bands.append(
            mh.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.xxhash64(*cols).alias("bucket"),
            )
        )
    allb = bands[0]
    for x in bands[1:]:
        allb = allb.unionByName(x)
    sizes = allb.groupBy("band", "bucket").agg(
        F.count("*").alias("_bsz"), F.min("doc_id").alias("_rep")
    )
    tagged = allb.join(sizes, ["band", "bucket"])
    small = tagged.filter(F.col("_bsz") <= bucket_cap) \
        .select("doc_id", "band", "bucket")
    pairs_small = (
        small.alias("a")
        .join(small.alias("b"), ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
    )
    pairs_star = (
        tagged.filter((F.col("_bsz") > bucket_cap)
                      & (F.col("doc_id") != F.col("_rep")))
        .select(F.col("_rep").alias("doc_a"),
                F.col("doc_id").alias("doc_b"))
    )
    return pairs_small.unionByName(pairs_star).distinct()


def simhash(spark, sf_dir):
    """64-bit SimHash per document, entirely JVM-side: token hashes via
    xxhash64, per-bit votes as 64 ``sum(±1)`` aggregates, signature
    assembled from disjoint shiftleft bits. The whole plan is one
    map-side-combined groupBy — no Python at all, unlike a
    per-document applyInPandas fold which degenerates to one
    interpreter call per document at corpus scale."""
    docs = _documents(spark, sf_dir)
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).withColumn("h", F.xxhash64("token"))
    votes = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"v{b}")
        for b in range(64)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    one = F.lit(1).cast("long")
    sig = None
    for b in range(64):
        # disjoint bits: two's-complement sum == bitwise OR (bit 63 is
        # Long.MIN_VALUE via Java shiftleft wrap — still exact)
        term = F.when(F.col(f"v{b}") > 0, F.shiftleft(one, b)) \
            .otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return agg.select("doc_id", sig.alias("simhash"))


# ------------------------------------------------------------- similarity

def ann_cosine_topk(spark, sf_dir, n_queries: int = 5, k: int = 10):
    """Brute-force cosine top-k (the exact baseline an IVF/LSH variant
    is judged against). Query side is tiny → broadcast; the scan side
    stays partitioned. Cosine via built-in array ops (zip_with +
    aggregate — JVM-side, no Python). Rank on round(cos, 6) with
    vec_id tiebreak so the oracle's float sum-order differences
    can't flip the ordering."""
    emb = _embeddings(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    joined = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos",
            dot(F.col("q"), F.col("embedding"))
            / (F.sqrt(dot(F.col("q"), F.col("q")))
               * F.sqrt(dot(F.col("embedding"), F.col("embedding")))),
        )
        .withColumn("r_cos", F.round(F.col("cos"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("r_cos").desc(), F.col("vec_id")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "vec_id")
    )


def _cos_expr(x, y):
    """JVM-side cosine over two array<float> columns (zip_with +
    aggregate — whole-stage codegen, no Python)."""
    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda u, v: u.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda acc, u: acc + u,
        )

    return dot(x, y) / (F.sqrt(dot(x, x)) * F.sqrt(dot(y, y)))


def dedup_embedding_exact(spark, sf_dir, threshold: float = 0.42):
    """Brute-force O(n²) cosine pair scan — the correctness baseline
    the blocked path is verified against (pytest), NOT the registered
    scale path."""
    emb = _embeddings(spark, sf_dir)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("r_cos", F.round(_cos_expr(F.col("ea"), F.col("eb")), 6))
        .filter(F.col("r_cos") >= threshold)
        .select("id_a", "id_b", "r_cos")
    )


DEDUP_EMB_PLANES = 2       # floor — the effective count scales with n
DEDUP_EMB_MAX_PLANES = 16
DEDUP_EMB_TABLES = 16
EMB_TARGET_BUCKET = 256    # plane count chosen so E[bucket] ≈ this
EMB_BUCKET_CAP = 512       # buckets wider than this go STAR, not all-pairs
DEDUP_EMB_EXACT_MAX = 16384  # ≤ this many vectors: exact beats LSH (see
#                              dedup_embedding_df) — brute force is both
#                              cheaper and recall-exact at small n


def _emb_planes_for(n_vectors: int) -> int:
    """Effective hyperplane count: enough bits that the EXPECTED bucket
    holds ~EMB_TARGET_BUCKET vectors (2^planes buckets per table), with
    DEDUP_EMB_PLANES as the floor. A fixed 2-plane config means 4
    buckets per table FOREVER — at corpus scale each bucket holds n/4
    vectors and the same-bucket join IS the crossJoin it claims to
    replace, just 4x cheaper."""
    if n_vectors <= 0:
        return DEDUP_EMB_PLANES
    need = math.ceil(math.log2(max(1, n_vectors / EMB_TARGET_BUCKET)))
    return max(DEDUP_EMB_PLANES, min(DEDUP_EMB_MAX_PLANES, need))


def _emb_candidates(emb: DataFrame, n_planes: int,
                    bucket_cap: int = EMB_BUCKET_CAP) -> DataFrame:
    """LSH candidate pairs (id_a, id_b, ea, eb) from multi-table
    random-hyperplane buckets, with the same HOT-BUCKET CAP discipline
    as ``dedup_minhash_lsh``: buckets wider than ``bucket_cap`` emit a
    STAR through TWO reps (the bucket's min and max vec_id) — O(2k)
    pairs instead of the O(k²) a k-duplicate megacluster would
    otherwise materialize inside one task. Star pairs still go through
    the exact rerank, so emitted pairs are never false positives.
    Recall guarantee inside a >cap bucket is explicitly TRANSITIVE:
    a member keeps candidates only via reps whose member-rep edge
    passes the rerank threshold, so non-rep pairs both of whose rep
    edges fail are missed in that bucket (they can still surface from
    any of the other DEDUP_EMB_TABLES-1 tables). The second rep halves
    the per-table single-rep failure mode; the documented per-pair miss
    bound in ``dedup_embedding_df`` holds only for pairs outside capped
    buckets."""

    def signature(batches):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(7)
        planes = rng.standard_normal((DEDUP_EMB_TABLES, 64, n_planes))
        weights = 1 << np.arange(n_planes)
        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy())
            frames = []
            for t in range(DEDUP_EMB_TABLES):
                bits = (m @ planes[t]) > 0
                bucket = (bits * weights).sum(axis=1)
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"],
                            "tbl": t,
                            "bucket": bucket.astype("int64"),
                            "embedding": pdf["embedding"],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    sig = emb.mapInPandas(
        signature, "vec_id long, tbl int, bucket long, embedding array<float>"
    )
    sizes = sig.groupBy("tbl", "bucket").agg(
        F.count("*").alias("_bsz"), F.min("vec_id").alias("_rep"),
        F.max("vec_id").alias("_rep2"),
    )
    tagged = sig.join(sizes, ["tbl", "bucket"])
    small = tagged.filter(F.col("_bsz") <= bucket_cap)
    pairs_small = (
        small.alias("a")
        .join(small.alias("b"), ["tbl", "bucket"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"),
            F.col("a.embedding").alias("ea"), F.col("b.embedding").alias("eb"),
        )
    )
    # star members carry their own embedding; the (few) reps' embeddings
    # arrive via one more join keyed on the rep id. Two reps per bucket
    # (min + max vec_id) so a member whose min-rep edge fails the exact
    # rerank still has a second chance inside the same bucket.
    hot = tagged.filter(F.col("_bsz") > bucket_cap)
    star_edges = (
        hot.select(F.col("_rep").alias("rid"),
                   F.col("vec_id").alias("mid"),
                   F.col("embedding").alias("em"))
        .unionByName(
            hot.select(F.col("_rep2").alias("rid"),
                       F.col("vec_id").alias("mid"),
                       F.col("embedding").alias("em")))
        .filter(F.col("rid") != F.col("mid"))
    )
    reps = emb.select(F.col("vec_id").alias("rid"),
                      F.col("embedding").alias("er"))
    rep_first = F.col("rid") < F.col("mid")
    pairs_star = star_edges.join(reps, "rid").select(
        F.least("rid", "mid").alias("id_a"),
        F.greatest("rid", "mid").alias("id_b"),
        F.when(rep_first, F.col("er")).otherwise(F.col("em")).alias("ea"),
        F.when(rep_first, F.col("em")).otherwise(F.col("er")).alias("eb"),
    )
    return (
        pairs_small.unionByName(pairs_star)
        .groupBy("id_a", "id_b")  # a pair can collide in several tables
        .agg(F.first("ea").alias("ea"), F.first("eb").alias("eb"))
    )


def dedup_embedding_df(emb: DataFrame, threshold: float = 0.42,
                       bucket_cap: int = EMB_BUCKET_CAP,
                       exact_max: int = DEDUP_EMB_EXACT_MAX) -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH blocking + exact rerank.

    Multi-table random-hyperplane signatures (seeded, vectorized numpy)
    bucket the vectors; candidate pairs come only from same-bucket
    collisions (hot buckets star-capped, see ``_emb_candidates``); the
    exact round(cos, 6) ≥ threshold test then reranks, so false
    positives are impossible and only an LSH miss could drop a pair.
    The plane count scales with corpus size (``_emb_planes_for``) so
    E[bucket] stays ~EMB_TARGET_BUCKET; at the test scale (≤1k vectors)
    that resolves to the same 2 planes × 16 tables verified exhaustively
    vs dedup_embedding_exact in pytest and against the brute-force SQL
    oracle at sf0.01 (per-pair miss ≈ (0.59)^16 ≈ 2·10⁻⁴ at the low
    0.42 threshold — for pairs OUTSIDE >cap buckets; capped buckets
    only guarantee recall transitively through the two per-bucket reps,
    see ``_emb_candidates``). Shuffle cost: O(n·tables) signature rows instead
    of the crossJoin's O(n²); per-task pair fan-out bounded by
    bucket_cap² per bucket."""
    n = emb.count()  # metadata-cheap on parquet; fixes the plane count
    if n <= exact_max:
        # cost-based crossover: below ~16k vectors the exact pair scan
        # (n²/2 JVM-codegen cosines, broadcast self-join) costs LESS
        # than the LSH machinery's own candidate volume (~tables ×
        # E[bucket] × n reranks plus 16 signature passes and two
        # joins) — and it is exact. This matters for recall too: the
        # adaptive plane count keeps E[bucket] ≈ 256 as n grows, and
        # for a pair AT the low 0.42 threshold the per-table collision
        # probability is 0.638^planes — at the 3 planes n≈2000 selects,
        # the 16-table miss probability is ~0.8% (one observed miss in
        # 441 pairs at sf0.1). Brute force below the crossover keeps
        # the contract exact exactly where exactness is the cheaper
        # plan; above it the LSH path's documented probabilistic miss
        # bound applies.
        a = emb.select(F.col("vec_id").alias("id_a"),
                       F.col("embedding").alias("ea"))
        b = emb.select(F.col("vec_id").alias("id_b"),
                       F.col("embedding").alias("eb"))
        return (
            a.join(F.broadcast(b), F.col("id_a") < F.col("id_b"))
            .withColumn("r_cos",
                        F.round(_cos_expr(F.col("ea"), F.col("eb")), 6))
            .filter(F.col("r_cos") >= threshold)
            .select("id_a", "id_b", "r_cos")
        )
    cand = _emb_candidates(emb, _emb_planes_for(n), bucket_cap)
    return (
        cand.withColumn("r_cos", F.round(_cos_expr(F.col("ea"), F.col("eb")), 6))
        .filter(F.col("r_cos") >= threshold)
        .select("id_a", "id_b", "r_cos")
    )


def dedup_embedding(spark, sf_dir, threshold: float = 0.42):
    """Registered entry point: ``dedup_embedding_df`` over the sf
    embeddings table (see that docstring for semantics + scale notes)."""
    return dedup_embedding_df(_embeddings(spark, sf_dir), threshold)


N_HYPERPLANES = 4
N_LSH_TABLES = 4


def ann_lsh_topk(spark, sf_dir, n_queries: int = 5, k: int = 10):
    """LSH-bucketed approximate top-k (the scale path for
    ann_cosine_topk): multi-table random-hyperplane signatures (seeded,
    vectorized numpy) bucket the vectors; exact cosine rerank happens
    only within matching buckets. No SQL oracle (signature seeds are
    engine-specific) — driver records rows-only; recall vs the exact
    baseline is asserted in tests. At scale the bucket join replaces
    the crossJoin: shuffle cost drops from O(n·q) to
    O(n·tables + q·bucket)."""
    emb = _embeddings(spark, sf_dir)

    def signature(batches):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(42)
        planes = rng.standard_normal((N_LSH_TABLES, 64, N_HYPERPLANES))
        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy())
            frames = []
            for t in range(N_LSH_TABLES):
                bits = (m @ planes[t]) > 0
                bucket = (bits * (1 << np.arange(N_HYPERPLANES))).sum(axis=1)
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": pdf["vec_id"],
                            "tbl": t,
                            "bucket": bucket.astype("int64"),
                            "embedding": pdf["embedding"],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    sig = emb.mapInPandas(
        signature, "vec_id long, tbl int, bucket long, embedding array<float>"
    )
    queries = sig.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("tbl"),
        F.col("bucket"),
        F.col("embedding").alias("q"),
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda u, v: u.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda acc, u: acc + u,
        )

    joined = (
        sig.join(F.broadcast(queries), ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "q", "embedding")
        .distinct()  # a pair can collide in several tables
        .withColumn(
            "r_cos",
            F.round(
                dot(F.col("q"), F.col("embedding"))
                / (F.sqrt(dot(F.col("q"), F.col("q")))
                   * F.sqrt(dot(F.col("embedding"), F.col("embedding")))),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("r_cos").desc(), F.col("vec_id")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "vec_id")
    )


N_IVF_CELLS = 16
IVF_NPROBE = 4


def ann_ivf_topk(spark, sf_dir, n_queries: int = 5, k: int = 10):
    """IVF (inverted-file) approximate top-k — the coarse-quantizer
    alternative to ann_lsh_topk: k-means cells built from a bounded
    deterministic sample on the driver (at 100 TB the sample is still
    O(cells·dim) — centroids broadcast everywhere), every vector
    assigned to its nearest cell by a vectorized numpy kernel, queries
    probe the ``IVF_NPROBE`` nearest cells, exact cosine rerank only
    within probed cells. Shuffle: one hash exchange on cell id instead
    of a crossJoin. No SQL oracle (centroids are engine-internal);
    recall vs the exact baseline is asserted in pytest."""
    import numpy as np

    emb = _embeddings(spark, sf_dir)
    # bounded deterministic sample → a few Lloyd iterations on the driver
    sample = np.stack(
        [r["embedding"] for r in
         emb.select("embedding").limit(512).collect()]
    ).astype(np.float64)
    rng = np.random.default_rng(11)
    cent = sample[rng.choice(len(sample), N_IVF_CELLS, replace=False)]
    for _ in range(5):
        d = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(N_IVF_CELLS):
            m = assign == c
            if m.any():
                cent[c] = sample[m].mean(axis=0)
    cent_b = spark.sparkContext.broadcast(cent)

    def assign_cells(batches):
        import numpy as np
        import pandas as pd

        C = cent_b.value
        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            d = ((m[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cell": d.argmin(axis=1).astype("int32"),
                    "embedding": pdf["embedding"],
                }
            )

    cells = emb.mapInPandas(
        assign_cells, "vec_id long, cell int, embedding array<float>"
    )

    def probe_cells(batches):
        import numpy as np
        import pandas as pd

        C = cent_b.value
        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            d = ((m[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            near = np.argsort(d, axis=1)[:, :IVF_NPROBE]
            rows = {
                "query_id": np.repeat(pdf["vec_id"].to_numpy(), IVF_NPROBE),
                "cell": near.ravel().astype("int32"),
                "q": [e for e in pdf["embedding"]
                      for _ in range(IVF_NPROBE)],
            }
            yield pd.DataFrame(rows)

    queries = (
        emb.filter(F.col("vec_id") < n_queries)
        .mapInPandas(probe_cells,
                     "query_id long, cell int, q array<float>")
    )
    joined = (
        cells.join(F.broadcast(queries), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.first("q").alias("q"), F.first("embedding").alias("embedding"))
        .withColumn(
            "r_cos",
            F.round(_cos_expr(F.col("q"), F.col("embedding")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("r_cos").desc(), F.col("vec_id")
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "vec_id")
    )


def sessionize(spark, sf_dir, gap_minutes: int = 30):
    """Gap-based sessionization of the event stream (the conversation/
    agent-session segmentation a transcript pipeline runs constantly):
    a new session starts when a user's inter-event gap exceeds
    ``gap_minutes``. Entirely built-ins — lag + cumulative sum windows
    PARTITIONED BY user_id (the natural key), so the only shuffle is
    one hash exchange on user_id and no per-group Python exists.
    Output: one row per session with exact integer duration (µs)."""
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "user_id", "event_id",
        F.col("ts").cast("timestamp").alias("ts"),  # NTZ → UTC instant
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.unix_micros("ts")
    new_sess = F.when(
        F.lag(us).over(w).isNull()
        | ((us - F.lag(us).over(w)) > gap_us),
        1,
    ).otherwise(0)
    with_sess = ev.withColumn(
        "session_idx",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_sess.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
            (F.max(us) - F.min(us)).alias("duration_us"),
        )
        .select("user_id", "session_idx", "n_events", "first_event",
                "duration_us")
    )


def decontaminate(spark, sf_dir=None, corpus: DataFrame | None = None,
                  benchmark: DataFrame | None = None, k: int = 3,
                  min_hits: int = 1):
    """Benchmark decontamination: flag corpus documents that share any
    word k-gram with a benchmark/eval set (the standard guard against
    test-set leakage into training data). Returns one row per corpus
    doc: (doc_id, n_hits, contaminated).

    100 TB shape: the benchmark side is small by construction (eval
    sets are thousands of docs) → its distinct shingles are hashed to
    8-byte keys and BROADCAST; the corpus side streams through one
    map-side hash-join + a map-side-combined groupBy — no shuffle of
    corpus text, no skew (shingle fan-out is per-doc bounded). A
    billion-doc corpus runs this as a single scan."""
    if corpus is None:
        corpus = _documents(spark, sf_dir)
    if benchmark is None:
        # default probe: treat the lexicographically first 10 docs as
        # the "benchmark" (deterministic; callers pass the real one)
        benchmark = corpus.orderBy("doc_id").limit(10)
    c_sh = _word_shingles(corpus, k=k) \
        .withColumn("h", F.xxhash64("shingle")).drop("shingle")
    b_sh = (
        _word_shingles(benchmark.select("doc_id", "text"), k=k)
        .select(F.xxhash64("shingle").alias("h")).distinct()
    )
    hits = (
        c_sh.join(F.broadcast(b_sh), "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        corpus.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_hits)
            .alias("contaminated"),
        )
    )


# ---------------------------------------------------------- text analysis

LANG_MARKERS = {
    "query_lang": ["query", "join", "filter"],
    "storage_lang": ["table", "row", "column"],
    "stream_lang": ["stream", "window", "batch"],
}


def _count_occurrences(col, needle: str):
    """Occurrences of ``needle`` via the replace trick — identical
    integer semantics in Spark and ANSI SQL (no regex dialects)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("long")


def lang_id(spark, sf_dir):
    """Marker-word n-gram language scorer: score per language = summed
    marker occurrences; argmax with deterministic tie-break on name."""
    docs = _documents(spark, sf_dir)
    scored = docs.select(
        "doc_id",
        *[
            sum(
                (_count_occurrences(F.col("text"), m) for m in markers),
                F.lit(0).cast("long"),
            ).alias(f"score_{lang}")
            for lang, markers in LANG_MARKERS.items()
        ],
    )
    best = F.greatest(*[F.col(f"score_{s}") for s in LANG_MARKERS])
    guess = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        guess = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(guess)
    return scored.withColumn("lang_guess", guess).withColumn(
        "best_score", best
    ).select("doc_id", "lang_guess", "best_score")


def quality_score(spark, sf_dir):
    """Cheap quality heuristics + token counting + content
    fingerprint in ONE scan (all per-document text metrics are
    column expressions over the same row — splitting them into three
    queries would re-scan the corpus three times at 100 TB). All
    integer/ratio formulas are replace-trick exact so the oracle
    matches bit-identically; fp is md5 (portable across engines)."""
    docs = _documents(spark, sf_dir)
    t = F.col("text")
    n_chars = F.length(t)
    n_spaces = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))
    n_words = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(n_spaces + 1)
    stop_hits = _count_occurrences(t, " the ") + _count_occurrences(t, " a ")
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        stop_hits.alias("stop_hits"),
        (n_chars.cast("double") / F.greatest(n_words, F.lit(1)).cast("double"))
        .alias("chars_per_word"),
        # token_count metrics (whitespace + BPE-ish chars/4 estimate)
        F.ceil(n_chars / F.lit(4.0)).cast("long").alias("approx_bpe_tokens"),
        # doc_fingerprint
        F.md5(t.cast("binary")).alias("fp"),
    )


def token_count(spark, sf_dir):
    """Whitespace token count + BPE-ish estimate (chars/4, the common
    planning approximation)."""
    docs = _documents(spark, sf_dir)
    t = F.col("text")
    n_spaces = F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit("")))
    ws_tokens = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(n_spaces + 1)
    return docs.select(
        "doc_id",
        ws_tokens.cast("long").alias("ws_tokens"),
        F.ceil(F.length(t) / F.lit(4.0)).cast("long").alias("approx_bpe_tokens"),
    )


def doc_fingerprint(spark, sf_dir):
    """Content fingerprint: md5 (portable across engines) + length."""
    docs = _documents(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("fp"),
        F.length("text").cast("long").alias("n_chars"),
    )


# ------------------------------------------------------------- multimodal

def multimodal_meta(spark, sf_dir):
    """Opaque-binary-column plumbing: documents.text re-encoded as a
    binary payload column, metadata extracted by a vectorized
    mapInPandas kernel (the schema/batch shape a real image/audio
    decoder plugs into — see multimodal.py for the stubbed decoders)."""
    docs = _documents(spark, sf_dir).select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def meta(batches):
        import numpy as np
        import pyarrow as pa

        from .multimodal import payload_parts

        for b in batches:
            off, data = payload_parts(b.column(1))
            n_bytes = np.diff(off)
            header = np.full(len(n_bytes), -1, dtype=np.int64)
            nz = n_bytes > 0
            header[nz] = data[off[:-1][nz]]
            yield pa.RecordBatch.from_arrays(
                [b.column(0), pa.array(n_bytes, pa.int64()),
                 pa.array(header, pa.int64())],
                names=["doc_id", "n_bytes", "header_byte"],
            )

    return docs.mapInArrow(meta, "doc_id long, n_bytes long, header_byte long")
