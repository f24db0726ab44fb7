"""Record sources beyond parquet (SURVEY §2.1 S5: JSON record source).

The reference's ``WriteJSON`` path turns JSON payloads into
schema-directed column values, including nested list/map population
(⟨ref⟩ data/*.go per SURVEY §2.1). Spark-first that is simply the
built-in JSON datasource + ``from_json`` — both run in the JVM with
whole-stage codegen and honor the declared schema exactly (missing
fields → null, nested struct/array/map populated recursively), so no
custom parsing layer is warranted. These helpers pin the
schema-explicit contract (never schema inference at scale — one
malformed line must not flip a column type)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["json_records", "parse_json_column"]


def json_records(spark: SparkSession, path: str, ddl: str) -> DataFrame:
    """Read JSON-lines with an EXPLICIT schema (S5 parity). At scale the
    explicit schema also skips the inference pass over the data."""
    return spark.read.schema(ddl).json(path)


def parse_json_column(df: DataFrame, col: str, ddl: str) -> DataFrame:
    """Parse an embedded JSON string column into typed columns
    (schema-directed, nested structs/arrays/maps included)."""
    return df.withColumn("_r", F.from_json(F.col(col), ddl)).select("_r.*")
