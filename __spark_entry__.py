"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2.9
plus the training-data pipeline operators; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL for each (omitted only for the
hash-seed-dependent ops minhash/simhash → rows-only check).

Codec operators are checked end-to-end: the Spark query pushes the real
column data through encode→decode (mapInArrow) and returns the decoded
values, so the driver's value-hash compare is a bit-identity test of
the codec (north_rule invariant).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from parquet_go_spark import pipeline as P
from parquet_go_spark import queries as Q

_LINEITEM_INTS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                  "l_shipdate"]
_LINEITEM_STRS = ["l_returnflag", "l_linestatus"]
_LINEITEM_DBLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_LINEITEM_ALL = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"]


def _q_multimodal_frames(spark, sf_dir):
    """Multimodal plumbing in one query: payload metadata extraction
    (n_bytes, header_byte — the old multimodal_meta) joined with the
    frame-sampler's per-doc frame count. Zero-payload docs keep a null
    n_frames (the sampler emits nothing for them)."""
    from pyspark.sql import functions as F

    from parquet_go_spark import multimodal as M
    from parquet_go_spark import pipeline as P

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frames = M.frame_sample(
        M.attach_fake_payloads(docs), id_col="doc_id"
    )
    counts = frames.groupBy("doc_id").agg(F.count("*").alias("n_frames"))
    return P.multimodal_meta(spark, sf_dir).join(counts, "doc_id", "left")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full encode→manifest→decode round-trip of lineitem."""
    return Q.q_roundtrip_identity(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """EXACTLY 50 entries — the driver checks the first 50 in dict
    order (r2 verdict: 55 registered → 5 silently never checked).
    Overlapping entries were merged, not dropped: delta_roundtrip ⊂
    delta_encode (deltas are computed over the DECODED codec output),
    manifest_write ⊂ resume_from_manifest, token_count +
    doc_fingerprint ⊂ quality_score, multimodal_meta ⊂
    multimodal_frames. ann_lsh_topk (rows-only) is pytest-covered
    (tests/test_pipeline.py recall-vs-exact) — ann_cosine_topk and
    ann_ivf_topk represent the ANN family here."""
    return {
        # codec round-trips (bit-identity through the blob format)
        "roundtrip_identity": Q.q_roundtrip_identity,
        "dict_encode": Q.q_dict_encode,
        "for_bitpack": Q.q_for_bitpack,
        "fsst_encode": Q.q_fsst_encode,
        "bss_roundtrip": Q.q_bss_roundtrip,
        "prefix_roundtrip": Q.q_prefix_roundtrip,
        "zlib_roundtrip": Q.q_zlib_roundtrip,
        "nested_roundtrip": Q.q_nested_roundtrip,
        "list_roundtrip": Q.q_list_roundtrip,
        "uint_roundtrip": Q.q_uint_roundtrip,
        "json_source": Q.q_json_source,
        "nested_prune": Q.q_nested_prune,
        "nested_list_prune": Q.q_nested_list_prune,
        "decimal_roundtrip": Q.q_decimal_roundtrip,
        "selective_revenue": Q.q_selective_revenue,
        # codec semantics / stats / selection
        "rle_runs": Q.q_rle_runs,
        "delta_encode": Q.q_delta_encode,
        "profile_stats": Q.q_profile_stats,
        "codec_select": Q.q_codec_select,
        # table layer: chunks, manifests, pruning, resume
        "encode_chunks": Q.q_encode_chunks,
        "decode_chunks": Q.q_decode_chunks,
        "chunk_skip_filter": Q.q_chunk_skip_filter,
        "stats_pushdown": Q.q_stats_pushdown,
        "text_search": Q.q_text_search,
        "bloom_point_lookup": Q.q_bloom_point_lookup,
        "resume_from_manifest": Q.q_resume_from_manifest,
        "resume_stale_values": Q.q_resume_stale_values,
        "delete_rows": Q.q_delete_rows,
        "upsert_values": Q.q_upsert_values,
        "stream_ingest": Q.q_stream_ingest,
        "stream_window_agg": Q.q_stream_window_agg,
        "stream_sessionize": Q.q_stream_sessionize,
        "locality_roundtrip": Q.q_locality_roundtrip,
        "zorder_cluster": Q.q_zorder_cluster,
        "compact_roundtrip": Q.q_compact_roundtrip,
        "schema_evolution": Q.q_schema_evolution,
        # analytics over the DECODED table (engine output -> Spark SQL)
        "pricing_summary": Q.q_pricing_summary,
        "join_decoded": Q.q_join_decoded,
        # training-data pipeline operators
        "dedup_exact": P.dedup_exact,
        "dedup_ngram_jaccard": P.dedup_ngram_jaccard,
        "dedup_components": P.dedup_components,
        "dedup_minhash_lsh": P.dedup_minhash_lsh,   # rows-only
        "dedup_embedding": P.dedup_embedding,
        "simhash": P.simhash,                        # rows-only
        "ann_cosine_topk": P.ann_cosine_topk,
        "ann_ivf_topk": P.ann_ivf_topk,              # rows-only
        "multimodal_frames": _q_multimodal_frames,
        "lang_id": P.lang_id,
        "quality_score": P.quality_score,
        "sessionize": P.sessionize,
    }


# --------------------------------------------------------------- oracles

def _profile_stats_sql() -> str:
    parts = [
        f"SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_values, "
        f"CAST(count(*) - count({c}) AS BIGINT) AS null_count, "
        f"CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct FROM lineitem"
        for c in _LINEITEM_ALL
    ]
    return " UNION ALL ".join(parts)


def _encode_chunks_sql() -> str:
    parts = [
        f"SELECT '{c}' AS col_name, CAST(count(*) AS BIGINT) AS n_values, "
        f"CAST(count(*) - count({c}) AS BIGINT) AS null_count FROM lineitem"
        for c in _LINEITEM_ALL
    ]
    return " UNION ALL ".join(parts)


def _codec_select_sql() -> str:
    """Replicates plan.choose_codec's decision rules in SQL per column
    (stats over the same deterministic (l_orderkey, l_linenumber)
    order the Spark side profiles in)."""
    parts = []
    for c in _LINEITEM_DBLS:
        parts.append(
            f"SELECT '{c}' AS col_name, 'bss' AS codec, 'zstd' AS entropy"
        )
    for c in _LINEITEM_STRS:
        parts.append(
            f"SELECT '{c}' AS col_name, "
            f"CASE WHEN s.nd <= 65536 AND s.nd*2 <= s.nn THEN 'dict' "
            f"ELSE 'fsst' END AS codec, 'zstd' AS entropy "
            f"FROM (SELECT count({c}) AS nn, count(DISTINCT {c}) AS nd "
            f"FROM lineitem) s"
        )
    for c in _LINEITEM_INTS:
        parts.append(
            f"SELECT '{c}' AS col_name, CASE "
            # dict: nd<=65536 AND nd/nn<=0.1 AND run_frac>0.3
            f"WHEN s.nd <= 65536 AND s.nd*10 <= s.nn "
            f"AND (d.chg + 1)*10 < s.nn*7 THEN 'dict' "
            # delta: sorted_frac >= 0.9 (denominator = n-1 diff pairs)
            f"WHEN d.nondec*10 >= (s.nn - 1)*9 THEN 'delta' "
            f"WHEN s.nd <= 65536 AND s.nd*10 <= s.nn THEN 'dict' "
            f"ELSE 'for' END AS codec, 'none' AS entropy "
            f"FROM (SELECT count({c}) AS nn, count(DISTINCT {c}) AS nd "
            f"FROM lineitem) s, "
            f"(SELECT sum(CASE WHEN v <> pv THEN 1 ELSE 0 END) AS chg, "
            f"sum(CASE WHEN v >= pv THEN 1 ELSE 0 END) AS nondec "
            f"FROM (SELECT {c} AS v, lag({c}) OVER "
            f"(ORDER BY l_orderkey, l_linenumber) AS pv FROM lineitem)) d"
        )
    return " UNION ALL ".join(parts)


def _lang_id_sql() -> str:
    score_exprs = []
    for lang, markers in sorted(P.LANG_MARKERS.items()):
        terms = " + ".join(
            f"CAST((length(text) - length(replace(text, '{m}', '')))"
            f"/{len(m)} AS BIGINT)"
            for m in markers
        )
        score_exprs.append(f"{terms} AS score_{lang}")
    langs = sorted(P.LANG_MARKERS)
    cases = " ".join(
        f"WHEN score_{lang} = g THEN '{lang}'" for lang in langs
    )
    greatest = ", ".join(f"score_{lang}" for lang in langs)
    return (
        f"WITH s AS (SELECT doc_id, {', '.join(score_exprs)} FROM documents), "
        f"g AS (SELECT *, greatest({greatest}) AS g FROM s) "
        f"SELECT doc_id, CASE {cases} ELSE 'und' END AS lang_guess, "
        f"g AS best_score FROM g"
    )


def oracle_sql() -> dict[str, str]:
    n_words = ("CASE WHEN length(trim(text)) = 0 THEN 0 "
               "ELSE length(text) - length(replace(text, ' ', '')) + 1 END")
    return {
        "roundtrip_identity": "SELECT * FROM lineitem",
        "dict_encode":
            "SELECT l_returnflag, l_linestatus, l_shipdate FROM lineitem",
        "for_bitpack":
            "SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem",
        "fsst_encode": "SELECT doc_id, text FROM documents",
        "bss_roundtrip":
            "SELECT l_quantity, l_extendedprice, l_discount FROM lineitem",
        "prefix_roundtrip": "SELECT c_custkey, c_name FROM customer",
        "zlib_roundtrip":
            "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",
        "nested_roundtrip": """
            SELECT event_id, user_id AS meta_u, event_type AS meta_e,
                   ts AS meta_t,
                   CASE WHEN event_id % 7 = 0 THEN event_id END AS id2,
                   user_id AS kv_uid
            FROM events""",
        "uint_roundtrip":
            "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem",
        "json_source":
            "SELECT doc_id, lang, text, n_chars AS nc FROM documents",
        "nested_prune":
            "SELECT event_id, user_id AS meta_u, "
            "CASE WHEN event_id % 5 <> 0 THEN value END AS meta_v, "
            "CASE WHEN event_id % 11 <> 0 THEN event_type END AS attr_et, "
            "CASE WHEN event_id % 7 <> 0 THEN CAST(FLOOR(value) AS DOUBLE) "
            "END AS dur_s, "
            "CASE WHEN event_id % 7 <> 0 THEN "
            "CAST(CAST(value AS DECIMAL(38,6)) AS DOUBLE) END AS amt "
            "FROM events",
        "nested_list_prune": """
            WITH t AS (
                SELECT event_id,
                       CASE WHEN event_id % 7 = 0 THEN NULL
                            ELSE ([{'name': event_type, 'v': value},
                                   {'name': upper(event_type),
                                    'v': value*2}]
                                 )[1:(event_id % 3)::INT]
                       END AS tc
                FROM events)
            SELECT event_id, CAST(len(tc) AS BIGINT) AS n_calls,
                   tc[1].name AS first_name
            FROM t""",
        "decimal_roundtrip":
            "SELECT l_orderkey, l_linenumber, "
            "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) "
            "AS price FROM lineitem",
        "selective_revenue": """
            SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(38,4))
                       * CAST(l_discount AS DECIMAL(38,4))
                       AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                 AND TIMESTAMP '1996-12-31 23:59:59'""",
        "list_roundtrip": """
            SELECT vec_id, CAST(label AS BIGINT) AS label,
                   CAST(len(embedding) AS BIGINT) AS dim,
                   CAST(embedding[1] AS DOUBLE) AS e0,
                   CAST(embedding[64] AS DOUBLE) AS e63
            FROM embeddings""",
        "rle_runs": """
            SELECT l_returnflag, CAST(sum(is_start) AS BIGINT) AS n_runs,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM (SELECT l_returnflag,
                         CASE WHEN lag(l_returnflag) OVER
                              (ORDER BY l_orderkey, l_linenumber)
                              IS DISTINCT FROM l_returnflag
                              THEN 1 ELSE 0 END AS is_start
                  FROM lineitem)
            GROUP BY l_returnflag""",
        "delta_encode": """
            SELECT user_id, event_id, ts,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id)
                       AS delta_us
            FROM events""",
        "profile_stats": _profile_stats_sql(),
        "codec_select": _codec_select_sql(),
        "encode_chunks": _encode_chunks_sql(),
        "decode_chunks": "SELECT l_orderkey, l_extendedprice FROM lineitem",
        "chunk_skip_filter":
            "SELECT * FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 3000",
        "text_search":
            "SELECT doc_id, n_chars FROM documents "
            "WHERE list_contains(string_split(text, ' '), 'window')",
        "stats_pushdown":
            "SELECT CAST(count(*) AS BIGINT) AS n, "
            "CAST(count(*) - count(l_quantity) AS BIGINT) AS nulls, "
            "CAST(min(l_quantity) AS DOUBLE) AS min_v, "
            "CAST(max(l_quantity) AS DOUBLE) AS max_v, "
            "CAST(sum(l_quantity) AS DOUBLE) AS sum_v FROM lineitem",
        "bloom_point_lookup":
            "SELECT * FROM lineitem WHERE l_orderkey = 1000",
        "resume_from_manifest":
            "SELECT CAST(1 AS BIGINT) AS snapshot_id, "
            "CAST(8 AS BIGINT) AS n_chunks, "
            "CAST(count(*) AS BIGINT) AS n_rows, "
            "CAST(8 AS BIGINT) AS reused_chunks FROM lineitem",
        "resume_stale_values":
            "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, "
            "l_quantity + 100.0 AS l_quantity, l_extendedprice, "
            "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
            "FROM lineitem",
        "delete_rows":
            "SELECT * FROM lineitem "
            "WHERE l_orderkey NOT BETWEEN 10000 AND 20000",
        "upsert_values":
            "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, "
            "CASE WHEN l_orderkey <= 2000 THEN l_quantity + 500.0 "
            "ELSE l_quantity END AS l_quantity, l_extendedprice, "
            "l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate "
            "FROM lineitem",
        "stream_ingest": "SELECT * FROM lineitem",
        # ::TIMESTAMP: DuckDB's to_timestamp() returns TIMESTAMPTZ;
        # the Spark side is a plain TimestampType — same instants, but
        # the driver compares types strictly (r2 schema_match failure)
        "stream_window_agg": """
            SELECT to_timestamp(floor(epoch(ts)/3600)*3600)::TIMESTAMP
                       AS w_start,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(event_id) AS BIGINT) AS sum_event_id
            FROM events GROUP BY 1""",
        "stream_sessionize": """
            WITH g AS (
                SELECT user_id, event_id,
                       CASE WHEN lag(epoch_us(ts)) OVER
                                (PARTITION BY user_id ORDER BY ts, event_id)
                                IS NULL
                            OR epoch_us(ts) - lag(epoch_us(ts)) OVER
                                (PARTITION BY user_id ORDER BY ts, event_id)
                                > 30*60*1000000
                            THEN 1 ELSE 0 END AS new_sess,
                       epoch_us(ts) AS us
                FROM events),
            s AS (SELECT user_id, event_id,
                         sum(new_sess) OVER
                             (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_idx
                  FROM g)
            SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                   CAST(count(*) AS BIGINT) AS n_events,
                   min(event_id) AS first_event
            FROM s GROUP BY user_id, session_idx""",
        "sessionize": """
            WITH g AS (
                SELECT user_id, event_id, epoch_us(ts) AS us,
                       CASE WHEN lag(epoch_us(ts)) OVER
                                (PARTITION BY user_id ORDER BY ts, event_id)
                                IS NULL
                            OR epoch_us(ts) - lag(epoch_us(ts)) OVER
                                (PARTITION BY user_id ORDER BY ts, event_id)
                                > 30*60*1000000
                            THEN 1 ELSE 0 END AS new_sess
                FROM events),
            s AS (SELECT user_id, event_id, us,
                         sum(new_sess) OVER
                             (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_idx
                  FROM g)
            SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                   CAST(count(*) AS BIGINT) AS n_events,
                   min(event_id) AS first_event,
                   max(us) - min(us) AS duration_us
            FROM s GROUP BY user_id, session_idx""",
        "locality_roundtrip": "SELECT * FROM lineitem",
        "zorder_cluster":
            "SELECT * FROM lineitem WHERE l_partkey BETWEEN 100 AND 600",
        "compact_roundtrip": "SELECT * FROM lineitem",
        "schema_evolution":
            "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, "
            "l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
            "l_linestatus, CASE WHEN l_orderkey <= 30000 THEN NULL "
            "ELSE l_shipdate END AS l_shipdate FROM lineitem",
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(38,4)))
                       AS DOUBLE) AS sum_base_price,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(38,4))
                       * (CAST(1 AS DECIMAL(38,4))
                          - CAST(l_discount AS DECIMAL(38,4)))
                       AS DECIMAL(38,4))) AS DOUBLE) AS sum_disc_price,
                   CAST(count(*) AS BIGINT) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus""",
        "join_decoded": """
            SELECT o_orderpriority,
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(38,4))
                       * (CAST(1 AS DECIMAL(38,4))
                          - CAST(l_discount AS DECIMAL(38,4)))
                       AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority""",
        "dedup_exact":
            "SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) "
            "AS dup_count FROM documents GROUP BY text",
        "dedup_ngram_jaccard": """
            WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                          FROM documents),
            sh AS (SELECT DISTINCT doc_id, shingle FROM (
                       SELECT doc_id, unnest(list_transform(
                           range(1, greatest(len(t)-2, 0) + 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                           AS shingle
                       FROM toks)),
            sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
                      FROM sh GROUP BY doc_id),
            pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                             CAST(count(*) AS BIGINT) AS inter
                      FROM sh a JOIN sh b USING (shingle)
                      WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
            SELECT doc_a, doc_b, inter,
                   na.n_sh + nb.n_sh - inter AS union_sz
            FROM pairs
            JOIN sizes na ON na.doc_id = doc_a
            JOIN sizes nb ON nb.doc_id = doc_b
            WHERE inter*10 >= (na.n_sh + nb.n_sh - inter)*3""",
        "dedup_components": """
            WITH RECURSIVE
            toks AS (SELECT doc_id, string_split(text, ' ') AS t
                     FROM documents),
            sh AS (SELECT DISTINCT doc_id, shingle FROM (
                       SELECT doc_id, unnest(list_transform(
                           range(1, greatest(len(t)-2, 0) + 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
                           AS shingle
                       FROM toks)),
            sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
                      FROM sh GROUP BY doc_id),
            prs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                           CAST(count(*) AS BIGINT) AS inter
                    FROM sh a JOIN sh b USING (shingle)
                    WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
            good AS (SELECT doc_a, doc_b FROM prs
                     JOIN sizes na ON na.doc_id = doc_a
                     JOIN sizes nb ON nb.doc_id = doc_b
                     WHERE inter*10 >= (na.n_sh + nb.n_sh - inter)*3),
            edges AS (SELECT doc_a, doc_b FROM good
                      UNION ALL SELECT doc_b, doc_a FROM good),
            reach(doc_id, r) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT reach.doc_id, e.doc_b
                FROM reach JOIN edges e ON reach.r = e.doc_a)
            SELECT doc_id, min(r) AS component
            FROM reach GROUP BY doc_id""",
        "dedup_embedding": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   round(list_cosine_similarity(a.embedding::DOUBLE[],
                         b.embedding::DOUBLE[]), 6) AS r_cos
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND round(list_cosine_similarity(a.embedding::DOUBLE[],
                    b.embedding::DOUBLE[]), 6) >= 0.42""",
        "multimodal_frames": """
            SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
                   CAST(CASE WHEN length(text) = 0 THEN -1
                        ELSE ascii(substr(text, 1, 1)) END AS BIGINT)
                       AS header_byte,
                   CASE WHEN strlen(text) > 0
                        THEN CAST(ceil(strlen(text)/64.0) AS BIGINT)
                   END AS n_frames
            FROM documents""",
        "ann_cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                       FROM embeddings WHERE vec_id < 5),
            s AS (SELECT q.query_id, e.vec_id,
                         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]), 6)
                             AS r_cos
                  FROM embeddings e, q WHERE e.vec_id <> q.query_id)
            SELECT query_id, CAST(rnk AS BIGINT) AS rank, vec_id FROM (
                SELECT query_id, vec_id, row_number() OVER
                    (PARTITION BY query_id ORDER BY r_cos DESC, vec_id)
                    AS rnk
                FROM s)
            WHERE rnk <= 10""",
        "lang_id": _lang_id_sql(),
        "quality_score": f"""
            SELECT doc_id,
                   CAST(length(text) AS BIGINT) AS n_chars,
                   CAST({n_words} AS BIGINT) AS n_words,
                   CAST((length(text) - length(replace(text, ' the ', '')))/5
                        AS BIGINT)
                 + CAST((length(text) - length(replace(text, ' a ', '')))/3
                        AS BIGINT) AS stop_hits,
                   CAST(length(text) AS DOUBLE)
                 / CAST(greatest({n_words}, 1) AS DOUBLE) AS chars_per_word,
                   CAST(ceil(length(text)/4.0) AS BIGINT)
                       AS approx_bpe_tokens,
                   md5(text) AS fp
            FROM documents""",
    }
