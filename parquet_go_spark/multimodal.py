"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as opaque ``binary`` columns next to a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as vectorized Arrow kernels over ``mapInArrow`` batches — every
kernel works on the batch's *concatenated* payload buffer (offsets +
one uint8 array) with numpy gathers, never a per-row Python loop.
The actual media codecs (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode step is STUBBED two ways, both behind the
same interface:

- ``decoder="fake"`` (default): a deterministic fake decoder — byte
  statistics standing in for pixels/samples — so the Spark-side
  plumbing (schema, partitioning, UDF signature, Arrow batch shape) is
  real and fully tested end-to-end;
- ``decoder="pil"`` / ``"ffmpeg"``: raise ``NotImplementedError`` with
  the exact dependency needed, at call time, inside the executor — the
  seam where the real library plugs in.

At 100 TB: payload columns dominate bytes, so the scan stays columnar
(payloads are only materialized inside the mapInArrow batches that
need them — column pruning keeps metadata-only queries payload-free),
and batch size is bounded by ``spark.sql.execution.arrow.
maxRecordsPerBatch`` × payload size, not by partition size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attach_fake_payloads",
    "extract_metadata",
    "decode_features",
    "frame_sample",
    "payload_parts",
]

_FEATURE_DIM = 8


def payload_parts(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Binary array → (offsets:int64[n+1], data:uint8) zero-copy views
    over the batch's concatenated payload buffer."""
    a = arr.cast(pa.large_binary())
    if len(a) == 0:
        return np.zeros(1, np.int64), np.zeros(0, np.uint8)
    off = np.frombuffer(a.buffers()[1], np.int64, len(a) + 1,
                        offset=a.offset * 8)
    data = np.frombuffer(a.buffers()[2], np.uint8)
    return off, data


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
    """Payload → typed metadata row (one numpy pass per batch: lengths
    from the offsets buffer, magics from a strided 4-byte gather)."""

    def meta(batches):
        for b in batches:
            pay = b.column(b.schema.get_field_index("payload"))
            off, data = payload_parts(pay)
            n_bytes = np.diff(off)
            n = len(n_bytes)
            # magic = hex of the first 4 bytes; vectorized: gather a
            # (k,4) byte matrix, hex the whole buffer once, view as S8
            has4 = n_bytes >= 4
            magic = np.full(n, "", dtype="U8")
            k = int(has4.sum())
            if k:
                idx = off[:-1][has4][:, None] + np.arange(4)
                hex_all = data[idx].tobytes().hex()
                magic[has4] = np.frombuffer(
                    hex_all.encode("ascii"), dtype="S8"
                ).astype("U8")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(b.schema.get_field_index(id_col)),
                    b.column(b.schema.get_field_index("modality")),
                    pa.array(n_bytes, pa.int64()),
                    pa.array(magic),
                ],
                names=[id_col, "modality", "n_bytes", "magic"],
            )

    return df.mapInArrow(
        meta, f"{id_col} long, modality string, n_bytes long, magic string"
    )


def decode_features(df: DataFrame, id_col: str = "doc_id",
                    decoder: str = "fake") -> DataFrame:
    """Payload → fixed-dim float feature vector.

    ``fake``: byte-histogram features via one segmented bincount over
    the whole batch (deterministic); real decoders raise at the
    plug-in seam."""

    def feats(batches):
        for b in batches:
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
            pay = b.column(b.schema.get_field_index("payload"))
            off, data = payload_parts(pay)
            n_bytes = np.diff(off)
            n = len(n_bytes)
            # one bincount over (row_id * DIM + bucket) for the batch
            seg = np.repeat(np.arange(n, dtype=np.int64), n_bytes)
            buckets = (data[off[0] : off[-1]] >> 5).astype(np.int64)
            hist = np.bincount(
                seg * _FEATURE_DIM + buckets, minlength=n * _FEATURE_DIM
            ).reshape(n, _FEATURE_DIM)
            denom = np.maximum(n_bytes, 1).astype(np.float64)
            flat = (hist / denom[:, None]).ravel()
            offsets = pa.array(
                np.arange(n + 1, dtype=np.int64) * _FEATURE_DIM,
                pa.int64(),
            )
            features = pa.LargeListArray.from_arrays(
                offsets, pa.array(flat, pa.float64())
            )
            yield pa.RecordBatch.from_arrays(
                [b.column(b.schema.get_field_index(id_col)),
                 features.cast(pa.list_(pa.float64()))],
                names=[id_col, "features"],
            )

    return df.mapInArrow(feats, f"{id_col} long, features array<double>")


def frame_sample(df: DataFrame, id_col: str = "doc_id",
                 every_n: int = 64, frame_bytes: int = 16) -> DataFrame:
    """Sample fixed-size 'frames' from each payload (the video
    frame-sampling batch shape: one input row → many frame rows), all
    offset arithmetic + a single varlen gather in numpy. Output
    explodes — at scale repartition afterwards, don't let one long
    video skew a partition."""

    def frames(batches):
        for b in batches:
            pay = b.column(b.schema.get_field_index("payload"))
            off, data = payload_parts(pay)
            n_bytes = np.diff(off)
            n_frames = -(-n_bytes // every_n)  # ceil; 0 for empty docs
            total = int(n_frames.sum())
            ids = b.column(b.schema.get_field_index(id_col)) \
                .to_numpy(zero_copy_only=False)
            out_ids = np.repeat(ids, n_frames)
            fcum = np.zeros(len(n_frames) + 1, np.int64)
            np.cumsum(n_frames, out=fcum[1:])
            frame_idx = np.arange(total, dtype=np.int64) - np.repeat(
                fcum[:-1], n_frames
            )
            starts = np.repeat(off[:-1], n_frames) + frame_idx * every_n
            ends = np.minimum(starts + frame_bytes,
                              np.repeat(off[1:], n_frames))
            flens = ends - starts
            foffs = np.zeros(total + 1, np.int64)
            np.cumsum(flens, out=foffs[1:])
            nb = int(foffs[-1])
            intra = (np.arange(nb, dtype=np.int64)
                     - np.repeat(foffs[:-1], flens))
            blob = data[np.repeat(starts, flens) + intra]
            frames_arr = pa.LargeBinaryArray.from_buffers(
                pa.large_binary(), total,
                [None, pa.py_buffer(np.ascontiguousarray(foffs).tobytes()),
                 pa.py_buffer(np.ascontiguousarray(blob).tobytes())],
            )
            yield pa.RecordBatch.from_arrays(
                [pa.array(out_ids, pa.int64()),
                 pa.array(frame_idx, pa.int64()),
                 frames_arr.cast(pa.binary())],
                names=[id_col, "frame_idx", "frame"],
            )

    return df.mapInArrow(
        frames, f"{id_col} long, frame_idx long, frame binary"
    )
