"""parquet_go_spark — a PySpark-native per-column lightweight-compression engine.

Capabilities of ``balamurugana/parquet-go`` (a Go Parquet codec library),
re-expressed Spark-first (SURVEY.md):

- numpy codec kernels (``kernels/``): PLAIN, RLE/bit-packed hybrid,
  dictionary, delta + frame-of-reference bit-packing (with a patched
  PFOR variant for outlier-heavy data), byte-stream-split, front-coded
  prefix strings, FSST — semantics per the Apache Parquet spec
  (parquet.thrift:566-631) plus the FSST/PFOR papers; all vectorized,
  no per-row Python.
- a per-column-chunk codec auto-selector (``plan.py``) mirroring
  parquet-go's PLAIN / RLE_DICTIONARY / DELTA encoding choices, with
  size-verified fallbacks.
- a Spark encode/decode path (``encode.py`` / ``decode.py``):
  hash+turn-block-salted (or value-range, or shuffle-free locality)
  chunking → ``sortWithinPartitions`` → ``mapInArrow`` vectorized
  kernels → encoded-chunk files + lineage manifests (``manifest.py``)
  with atomic snapshot commits, checkpoint resume, time travel,
  per-chunk bloom filters, and blob-level projection/filter pushdown.
- ``streaming.py`` (exactly-once micro-batch ingest), ``table.py``
  (write_table / read_table / compact), ``pipeline.py`` (dedup /
  similarity / text analysis), ``multimodal.py`` (binary payloads).
"""

from .table import compact, read_table, verify_roundtrip, write_table

__all__ = ["write_table", "read_table", "compact", "verify_roundtrip"]

__version__ = "0.2.0"
