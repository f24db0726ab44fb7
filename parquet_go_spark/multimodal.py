"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as opaque ``binary`` columns next to a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as vectorized pandas kernels over ``mapInPandas`` batches. The
actual media codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode step is STUBBED two ways, both behind the same interface:

- ``decoder="fake"`` (default): a deterministic fake decoder — byte
  statistics standing in for pixels/samples — so the Spark-side
  plumbing (schema, partitioning, UDF signature, Arrow batch shape) is
  real and fully tested end-to-end;
- ``decoder="pil"`` / ``"ffmpeg"``: raise ``NotImplementedError`` with
  the exact dependency needed, at call time, inside the executor — the
  seam where the real library plugs in.

At 100 TB: payload columns dominate bytes, so the scan stays columnar
(payloads are only materialized inside the mapInPandas batches that
need them — column pruning keeps metadata-only queries payload-free),
and batch size is bounded by ``spark.sql.execution.arrow.
maxRecordsPerBatch`` × payload size, not by partition size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_fake_payloads",
    "extract_metadata",
    "decode_features",
    "frame_sample",
]

_FEATURE_DIM = 8


def attach_fake_payloads(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic stand-in payloads: the text column's UTF-8 bytes
    tagged with a fake modality. Lets every downstream kernel run on
    real testdata without media files."""
    return df.withColumn("payload", F.col(text_col).cast("binary")).withColumn(
        "modality",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64(text_col), F.lit(3)) + 1).cast("int"),
        ),
    )


def extract_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Payload → typed metadata row (vectorized, one pass per batch)."""

    def meta(batches):
        import pandas as pd

        for pdf in batches:
            p = pdf["payload"]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "modality": pdf["modality"],
                    "n_bytes": p.map(len).astype("int64"),
                    "magic": p.map(
                        lambda b: b[:4].hex() if len(b) >= 4 else ""
                    ),
                }
            )

    return df.mapInPandas(
        meta, f"{id_col} long, modality string, n_bytes long, magic string"
    )


def decode_features(df: DataFrame, id_col: str = "doc_id",
                    decoder: str = "fake") -> DataFrame:
    """Payload → fixed-dim float feature vector.

    ``fake``: numpy byte-histogram features (deterministic); real
    decoders raise at the plug-in seam."""

    def feats(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if decoder == "pil":
                raise NotImplementedError(
                    "image decode needs Pillow (not in this container); "
                    "plug a PIL.Image.open-based kernel in here"
                )
            if decoder == "ffmpeg":
                raise NotImplementedError(
                    "audio/video decode needs ffmpeg bindings (not in "
                    "this container); plug a pyav/ffmpeg kernel in here"
                )
            if decoder != "fake":
                raise ValueError(f"unknown decoder {decoder!r}")
            out_feats = []
            for b in pdf["payload"]:
                a = np.frombuffer(b, np.uint8)
                if len(a) == 0:
                    out_feats.append([0.0] * _FEATURE_DIM)
                    continue
                hist = np.bincount(a >> 5, minlength=_FEATURE_DIM)
                out_feats.append(
                    (hist / len(a)).astype(np.float64).tolist()
                )
            yield pd.DataFrame({id_col: pdf[id_col], "features": out_feats})

    return df.mapInPandas(feats, f"{id_col} long, features array<double>")


def frame_sample(df: DataFrame, id_col: str = "doc_id",
                 every_n: int = 64, frame_bytes: int = 16) -> DataFrame:
    """Sample fixed-size 'frames' from each payload (the video
    frame-sampling batch shape: one input row → many frame rows).
    Output explodes — at scale repartition afterwards, don't let one
    long video skew a partition."""

    def frames(batches):
        import pandas as pd

        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for i, b in zip(pdf[id_col], pdf["payload"]):
                for k, off in enumerate(range(0, len(b), every_n)):
                    ids.append(i)
                    idxs.append(k)
                    blobs.append(bytes(b[off : off + frame_bytes]))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": blobs}
            )

    return df.mapInPandas(
        frames, f"{id_col} long, frame_idx long, frame binary"
    )
