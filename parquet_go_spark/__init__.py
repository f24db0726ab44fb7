"""parquet_go_spark — a PySpark-native per-column lightweight-compression engine.

Capabilities of ``balamurugana/parquet-go`` (a Go Parquet codec library),
re-expressed Spark-first (SURVEY.md):

- numpy codec kernels (``kernels/``): PLAIN, RLE/bit-packed hybrid,
  dictionary, delta + frame-of-reference bit-packing, byte-stream-split,
  FSST — semantics per the Apache Parquet spec (parquet.thrift:566-631)
  plus the FSST paper; all vectorized, no per-row Python.
- a per-column-chunk codec auto-selector (``plan.py``) mirroring
  parquet-go's PLAIN / RLE_DICTIONARY / DELTA encoding choices.
- a Spark encode/decode path (``encode.py`` / ``decode.py``):
  ``repartitionByRange`` on conv_id (+ salting for skew) →
  ``sortWithinPartitions`` → ``mapInArrow`` vectorized kernels →
  encoded-chunk files + per-partition lineage manifests (``manifest.py``),
  checkpoint-resumable (Iceberg-style commit).
"""

__version__ = "0.1.0"
