"""Multimodal column plumbing (north-star set).

Images/audio/video are opaque ``binary`` columns plus typed metadata;
the Spark-side plumbing (schemas, batch shapes, partitioning, Arrow
transfer) is real and tested, while the actual media decode is stubbed
behind import-try + a deterministic fake — the decode libraries are not
in this container (task contract). Swapping the fake for pillow/ffmpeg
changes ONE function body, not the dataflow.

Design:
- payload stays binary end-to-end (parquet BYTE_ARRAY round-trips);
- per-item metadata is JVM-computable (length, md5) — no UDF;
- feature extraction / frame sampling run as Arrow-batched mapInPandas
  so a 100 TB media corpus streams through executors in columnar
  batches, with ``spark.sql.execution.arrow.maxRecordsPerBatch``
  bounding per-batch memory (media rows are fat: keep batches small).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

MEDIA_META_SCHEMA = (
    "media_id BIGINT, payload BINARY, media_type STRING, byte_len BIGINT, content_md5 STRING"
)


def attach_binary_payload(
    df: DataFrame,
    id_col: str,
    source_col: str,
    media_type: str = "application/octet-stream",
) -> DataFrame:
    """Wrap a column's bytes as a media payload with typed metadata.

    In production the payload column comes straight from parquet/webdataset;
    here it is synthesized from text via encode() so the rest of the
    plumbing is exercised for real. byte_len/md5 are JVM expressions —
    metadata extraction must never require touching Python.
    """
    payload = F.encode(F.col(source_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        payload.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(payload).cast("bigint").alias("byte_len"),
        F.md5(payload).alias("content_md5"),
    )


def _try_real_decoder():
    """Real decoders are not in this container; gate the import."""
    try:  # pragma: no cover - environment-dependent
        import PIL.Image  # noqa: F401

        return PIL.Image
    except ImportError:
        return None


def decode_media(payload: bytes, media_type: str):
    """STUB: decode an image/audio/video payload.

    Raises NotImplementedError when no decoder library is present —
    callers that need real pixels must run where pillow/ffmpeg exist.
    The *fake* paths below never call this.
    """
    decoder = _try_real_decoder()
    if decoder is None:
        raise NotImplementedError(
            "media decode requires pillow/ffmpeg, not present in this environment"
        )
    raise NotImplementedError("real decode path not wired yet")  # pragma: no cover


def extract_features_histogram(df: DataFrame) -> DataFrame:
    """Deterministic fake feature extractor over binary payloads.

    mapInPandas with an Arrow-batched iterator — the real-library
    version would decode and run a model per batch; the fake computes a
    16-bin byte histogram: exact integer counts (``bin_counts``,
    oracle-comparable) plus the normalized float variant (``features``,
    shape-identical to a real embedding column).
    """
    import pandas as pd

    out_schema = (
        "media_id BIGINT, byte_len BIGINT, bin_counts ARRAY<BIGINT>, features ARRAY<FLOAT>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counts, feats = [], []
            for payload in pdf["payload"]:
                # NULL payload (e.g. encode(NULL text)) => zero histogram,
                # same defense as resize_media — a None here would raise
                # TypeError and abort the job after 4 task retries
                payload = payload or b""
                hist = [0] * FEATURE_DIM
                for byte in payload:
                    hist[byte % FEATURE_DIM] += 1
                total = float(len(payload)) or 1.0
                counts.append(hist)
                feats.append([h / total for h in hist])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": pdf["byte_len"],
                    "bin_counts": counts,
                    "features": feats,
                }
            )

    return df.select("media_id", "payload", "byte_len").mapInPandas(run, out_schema)


def resize_media(df: DataFrame, width: int = 8, height: int = 8) -> DataFrame:
    """Deterministic fake media resize: resample each payload's byte
    stream to exactly ``width*height`` bytes by nearest-neighbor index
    mapping (the 1-D analogue of NN image scaling; empty payloads yield
    zeros). Output is structurally what a real resize produces — a new
    binary payload of fixed size plus (width, height) metadata — so the
    pipeline downstream of a pillow-backed version is exercised as-is;
    swapping in real pixels changes only the per-batch kernel
    (decode_media gates that path on library presence).

    mapInPandas, Arrow-batched: media rows are fat, so the batch size
    knob (``arrow.maxRecordsPerBatch``) bounds executor memory; the
    kernel itself is vectorized numpy per payload, no per-byte Python.
    """
    import numpy as np
    import pandas as pd

    out_len = width * height
    out_schema = (
        "media_id BIGINT, width INT, height INT, payload BINARY, "
        "byte_len BIGINT, content_md5 STRING"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        idx_base = np.arange(out_len, dtype=np.float64)
        for pdf in batches:
            payloads, md5s = [], []
            for payload in pdf["payload"]:
                src = np.frombuffer(payload or b"", dtype=np.uint8)
                if len(src) == 0:
                    resized = np.zeros(out_len, dtype=np.uint8)
                else:
                    resized = src[(idx_base * len(src) / out_len).astype(np.int64)]
                raw = resized.tobytes()
                payloads.append(raw)
                md5s.append(hashlib.md5(raw).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": np.int32(width),
                    "height": np.int32(height),
                    "payload": payloads,
                    "byte_len": np.int64(out_len),
                    "content_md5": md5s,
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, out_schema)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic fake frame sampler: slice the payload into
    ``n_frames`` evenly spaced chunks (stand-in for video frame
    extraction; same output shape: one row per (media, frame)).

    Pure JVM expressions — posexplode of computed substrings; a real
    ffmpeg-backed sampler would swap in a mapInPandas like
    extract_features.
    """
    slices = F.expr(
        f"transform(sequence(0, {n_frames - 1}), "
        f"i -> substring(payload, i * cast(byte_len/{n_frames} as int) + 1, "
        f"cast(byte_len/{n_frames} as int)))"
    )
    return df.select(
        "media_id",
        F.posexplode(slices).alias("frame_idx", "frame_bytes"),
    ).withColumn("frame_md5", F.md5(F.col("frame_bytes")))
