"""ANSI interval columns through the engine (SURVEY §2 type corners;
parquet.thrift:165-177 INTERVAL converted type).

Spark's Arrow UDF channel rejects DayTimeIntervalType /
YearMonthIntervalType, so table.py lowers top-level interval columns
to their internal integer form (day-time = int64 micros, year-month =
int32 months) JVM-side before the encode UDF and casts back after the
decode UDF; the manifest keeps the original DDL. These tests pin:
bit-exact round-trip (sub-second precision included), null handling,
exact field-bound restoration (e.g. HOUR TO MINUTE), projection, and
the rewrite paths (upsert) that merge lowered ints with a fresh batch.
"""

import os

import pytest
from pyspark.sql import functions as F

from parquet_go_spark import table as T


def _iv_df(spark, n=200):
    # sub-second micros in the day-time interval + nulls on both kinds
    return spark.sql(f"""
        SELECT CAST(id % 20 AS STRING)            AS conv_id,
               CAST(id AS INT)                    AS turn_idx,
               CASE WHEN id % 7 = 0 THEN NULL
                    ELSE make_dt_interval(CAST(id % 3 AS INT),
                                          CAST(id % 24 AS INT),
                                          CAST(id % 60 AS INT),
                                          CAST(id % 10 AS DOUBLE)
                                          + 0.000001 * CAST(id AS DOUBLE))
               END                                AS dur,
               CASE WHEN id % 11 = 0 THEN NULL
                    ELSE make_ym_interval(CAST(id % 5 AS INT),
                                          CAST(id % 12 AS INT))
               END                                AS age
        FROM range({n})
    """)


def test_interval_roundtrip_bit_identical(spark, tmp_path):
    src = _iv_df(spark)
    out = os.path.join(str(tmp_path), "iv_tbl")
    info = T.write_table(src, out, key_cols=("conv_id", "turn_idx"),
                         num_chunks=4)
    assert info["n_rows"] == 200
    got = T.read_table(spark, out)
    # exact logical types restored (incl. field bounds)
    assert dict((f.name, f.dataType.simpleString())
                for f in got.schema.fields) == dict(
        (f.name, f.dataType.simpleString()) for f in src.schema.fields)
    assert got.exceptAll(src).count() == 0
    assert src.exceptAll(got).count() == 0
    # null pattern survives
    assert (got.filter("dur IS NULL").count()
            == src.filter("dur IS NULL").count())


def test_interval_field_bounds_restored(spark, tmp_path):
    # a narrow HOUR TO MINUTE interval must come back HOUR TO MINUTE,
    # not the widened DAY TO SECOND the restore multiply produces
    src = spark.sql("""
        SELECT CAST(id AS STRING) AS conv_id, CAST(id AS INT) AS turn_idx,
               CAST(make_dt_interval(0, CAST(id % 24 AS INT),
                                     CAST(id % 60 AS INT), 0)
                    AS INTERVAL HOUR TO MINUTE) AS hm
        FROM range(50)
    """)
    assert src.schema["hm"].dataType.simpleString() == \
        "interval hour to minute"
    out = os.path.join(str(tmp_path), "iv_hm")
    T.write_table(src, out, key_cols=("conv_id", "turn_idx"), num_chunks=2)
    got = T.read_table(spark, out)
    assert got.schema["hm"].dataType.simpleString() == \
        "interval hour to minute"
    assert got.exceptAll(src).count() == 0


def test_interval_projection_and_append(spark, tmp_path):
    src = _iv_df(spark)
    out = os.path.join(str(tmp_path), "iv_proj")
    T.write_table(src, out, key_cols=("conv_id", "turn_idx"), num_chunks=2)
    # project just the interval column (+ key): decode reads only those
    # blobs and still restores the interval type
    got = T.read_table(spark, out, columns=["turn_idx", "dur"])
    assert [f.name for f in got.schema.fields] == ["turn_idx", "dur"]
    assert got.schema["dur"].dataType.simpleString() == \
        src.schema["dur"].dataType.simpleString()
    assert got.count() == 200
    # append a second batch; both batches restore
    more = _iv_df(spark, 60).withColumn(
        "conv_id", F.concat_ws("-", F.lit("b"), F.col("conv_id")))
    T.write_table(more, out, key_cols=("conv_id", "turn_idx"),
                  num_chunks=2, chunk_prefix="b2-", append=True)
    assert T.read_table(spark, out).count() == 260


def test_interval_upsert_merges_lowered(spark, tmp_path):
    src = _iv_df(spark)
    out = os.path.join(str(tmp_path), "iv_ups")
    T.write_table(src, out, key_cols=("conv_id", "turn_idx"), num_chunks=4)
    # replace turn 3's dur, insert a new key
    batch = spark.sql("""
        SELECT '3' AS conv_id, 3 AS turn_idx,
               make_dt_interval(9, 9, 9, 9.5) AS dur,
               make_ym_interval(9, 9) AS age
        UNION ALL
        SELECT 'new' AS conv_id, 999 AS turn_idx,
               make_dt_interval(1, 1, 1, 1.000001) AS dur,
               NULL AS age
    """)
    T.upsert_table(spark, out, batch)
    got = T.read_table(spark, out)
    assert got.count() == 201
    # NB: PySpark can't collect() YearMonthIntervalType values
    # (fromInternal is NOT_IMPLEMENTED upstream) — compare via
    # exceptAll, which stays JVM-side
    touched = got.filter("(conv_id = '3' AND turn_idx = 3) "
                         "OR conv_id = 'new'")
    assert touched.count() == 2
    assert touched.exceptAll(batch).count() == 0
    assert batch.exceptAll(touched).count() == 0


def test_interval_predicate_pruning(spark, tmp_path):
    # timedelta predicate bounds convert to lowered micros: chunk
    # skipping AND the row filter both run against stored int64s
    import datetime

    src = spark.sql("""
        SELECT CAST(id AS STRING) AS conv_id, CAST(id AS INT) AS turn_idx,
               make_dt_interval(0, CAST(id AS INT), 0, 0) AS dur
        FROM range(48)
    """)
    out = os.path.join(str(tmp_path), "iv_pred")
    # range-chunk on turn_idx so per-chunk dur min/max are tight
    T.write_table(src, out, key_cols=("conv_id", "turn_idx"),
                  num_chunks=4, chunk_expr=F.col("turn_idx") / 12)
    got = T.read_table(
        spark, out,
        predicates={"dur": (datetime.timedelta(hours=10),
                            datetime.timedelta(hours=20))},
        push_row_filter=True,
    )
    assert got.count() == 11
    assert got.agg(F.min("turn_idx"), F.max("turn_idx")).collect()[0] \
        == (10, 20)


def test_nested_interval_roundtrip(spark, tmp_path):
    # intervals inside struct / array<struct> / map values are lowered
    # in place by the recursive expression and restored with exact
    # field bounds; null structs/arrays/maps and null leaves survive
    src = spark.sql("""
        SELECT CAST(id AS STRING) AS conv_id, CAST(id AS INT) AS turn_idx,
               CASE WHEN id % 5 = 0 THEN NULL
                    ELSE named_struct(
                        'd', CASE WHEN id % 3 = 0 THEN NULL
                                  ELSE make_dt_interval(0,
                                       CAST(id % 24 AS INT), 1, 0.5) END,
                        'n', id)
               END AS s,
               CASE WHEN id % 7 = 0 THEN NULL
                    ELSE array(named_struct(
                        'tag', CONCAT('t', id),
                        'ym', make_ym_interval(0, CAST(id % 12 AS INT))))
               END AS arr,
               CASE WHEN id % 4 = 0 THEN NULL
                    ELSE map('k', make_dt_interval(0, 0, CAST(id % 60 AS INT), 0))
               END AS m
        FROM range(80)
    """)
    out = os.path.join(str(tmp_path), "iv_nested")
    T.write_table(src, out, key_cols=("conv_id", "turn_idx"), num_chunks=2)
    got = T.read_table(spark, out)
    assert got.schema.simpleString() == src.schema.simpleString()
    # Spark forbids set ops on MAP columns (interval or not) —
    # compare the map as its entry array
    cmp = [F.col("conv_id"), F.col("turn_idx"), F.col("s"), F.col("arr"),
           F.map_entries("m").alias("m_e")]
    assert got.select(cmp).exceptAll(src.select(cmp)).count() == 0
    assert src.select(cmp).exceptAll(got.select(cmp)).count() == 0
    # nested-child projection restores the interval element type
    arr_ym = T.read_table(spark, out, columns=["turn_idx", "arr.ym"])
    assert arr_ym.schema["arr.ym"].dataType.simpleString() == \
        "array<interval year to month>"
    assert arr_ym.count() == 80


def test_interval_narrow_ym_bounds_exact(spark, tmp_path):
    # regression: CAST(ym AS INT) uses the END-field unit, so an
    # INTERVAL YEAR column stored YEARS while restore multiplied
    # months — 2 years came back as INTERVAL '0' YEAR. The div
    # lowering is bound-independent.
    src = spark.sql("""
        SELECT CAST(id AS STRING) AS conv_id, CAST(id AS INT) AS turn_idx,
               CAST(make_ym_interval(CAST(id AS INT), 0)
                    AS INTERVAL YEAR) AS yrs,
               CAST(make_ym_interval(0, CAST(id % 12 AS INT))
                    AS INTERVAL MONTH) AS mos,
               CAST(make_dt_interval(CAST(id AS INT), 0, 0, 0)
                    AS INTERVAL DAY) AS days
        FROM range(30)
    """)
    out = os.path.join(str(tmp_path), "iv_narrow")
    T.write_table(src, out, key_cols=("conv_id", "turn_idx"), num_chunks=2)
    got = T.read_table(spark, out)
    assert got.schema.simpleString() == src.schema.simpleString()
    assert got.exceptAll(src).count() == 0
    assert src.exceptAll(got).count() == 0


def test_search_text_on_interval_table(spark, tmp_path):
    # regression: search_text decoded with the original (interval)
    # schema and hit Spark's Arrow-channel rejection
    src = spark.sql("""
        SELECT CAST(id AS STRING) AS conv_id, CAST(id AS INT) AS turn_idx,
               CASE WHEN id = 7 THEN 'hello needle world'
                    ELSE 'plain text' END AS text,
               make_dt_interval(0, CAST(id AS INT), 0, 0) AS dur
        FROM range(20)
    """)
    out = os.path.join(str(tmp_path), "iv_search")
    T.write_table(src, out, key_cols=("conv_id", "turn_idx"),
                  num_chunks=2, token_bloom_cols=("text",))
    hits = T.search_text(spark, out, "text", "needle")
    assert hits.schema["dur"].dataType.simpleString() == \
        "interval day to second"
    rows = hits.select("turn_idx", "text").collect()
    assert len(rows) == 1 and rows[0].turn_idx == 7


def test_interval_map_key_rejected_loudly(spark, tmp_path):
    src = spark.sql("""
        SELECT CAST(id AS STRING) AS conv_id, CAST(id AS INT) AS turn_idx,
               map(make_ym_interval(0, 1), id) AS m
        FROM range(5)
    """)
    out = os.path.join(str(tmp_path), "iv_badkey")
    with pytest.raises(Exception):
        T.write_table(src, out, key_cols=("conv_id", "turn_idx"),
                      num_chunks=1)
