"""Multimodal column handling — opaque ``binary`` payloads with typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic fake (see :func:`_fake_decode_geometry`) while
everything Spark-side is real and tested: binary column plumbing, schema
contracts, Arrow batch iteration, row-expansion (frame sampling), and
partition behavior. Swapping the fake for PIL/ffmpeg is a body-only change
to the pandas functions.

Scale notes: ``mapInPandas`` streams Arrow batches — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of corpus
size; the frame sampler expands rows inside the iterator (never
``collect``). Binary payloads stay opaque bytes end-to-end: no JVM↔Python
string re-encoding.

Both operators remain oracle-checkable because the fake decode is pure
arithmetic over the payload (length/md5), which DuckDB can mirror in SQL.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FRAME_BYTES = 64  # fake "frame" size for the frame sampler
FRAME_STRIDE = 2  # sample every 2nd frame

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("format", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("checksum", StringType(), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_offset", LongType(), False),
        StructField("frame_len", LongType(), False),
        StructField("frame_md5", StringType(), False),
    ]
)


def _real_decode(payload: bytes) -> tuple[int, int]:
    """Real image decode — requires an image codec, absent in this
    container. Kept as the marked extension point."""
    raise NotImplementedError(
        "image codecs (PIL/opencv) are not available in this environment; "
        "using the deterministic fake decode instead"
    )


def _fake_decode_geometry(n_bytes: int) -> tuple[int, int]:
    """STUB decode: deterministic fake geometry derived from payload size
    (stands in for a real header parse; same arithmetic as the oracle)."""
    return n_bytes % 640, n_bytes % 480


def _binary_payload(docs: DataFrame) -> DataFrame:
    """The multimodal ingestion contract: an opaque binary column + typed
    metadata. Here the synthetic ``text`` bytes stand in for image data."""
    return docs.selectExpr(
        "doc_id",
        "CAST(text AS BINARY) AS payload",
        "'fake/raw' AS format",
    )


# ==========================================================================
# M1 — image decode (mapInPandas, one row per payload)
# ==========================================================================
def image_decode(docs: DataFrame) -> DataFrame:
    """M1: decode opaque image payloads into typed features. Arrow-batched
    ``mapInPandas``; the geometry step is the marked fake, the checksum is
    a real bytes digest."""

    # NOTE: the closure must be self-contained (locals + in-function imports
    # only). Referencing module-level symbols would make cloudpickle import
    # this package on every executor's Python worker — which fails when the
    # package is driver-side-only (sys.path injection, no --py-files).
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            n_bytes = pdf["payload"].map(len)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": pdf["format"],
                    "n_bytes": n_bytes,
                    # fake geometry decode (see _fake_decode_geometry)
                    "width": n_bytes % 640,
                    "height": n_bytes % 480,
                    "checksum": pdf["payload"].map(
                        lambda b: _hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return (
        _binary_payload(docs)
        .mapInPandas(decode, DECODE_SCHEMA)
        .orderBy("doc_id")
    )


ORACLE_IMAGE_DECODE = """
SELECT doc_id,
       'fake/raw' AS format,
       strlen(text) AS n_bytes,
       strlen(text) % 640 AS width,
       strlen(text) % 480 AS height,
       md5(text) AS checksum
FROM documents
ORDER BY doc_id
"""


# ==========================================================================
# M2 — frame sampling (mapInPandas, row expansion)
# ==========================================================================
def frame_sample(docs: DataFrame) -> DataFrame:
    """M2: split each payload into fixed {fb}-byte frames and keep every
    {fs}. row (video frame-sampling plumbing: the pandas iterator expands
    one input row into many output rows — batch shapes stay Arrow-bounded
    either way).""".format(fb=FRAME_BYTES, fs=FRAME_STRIDE)

    frame_bytes, frame_stride = FRAME_BYTES, FRAME_STRIDE
    cols = [f.name for f in FRAME_SCHEMA.fields]

    # Self-contained closure — see the note in image_decode.
    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = (len(data) + frame_bytes - 1) // frame_bytes
                for idx in range(0, n_frames, frame_stride):
                    chunk = data[idx * frame_bytes : (idx + 1) * frame_bytes]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_offset"].append(idx * frame_bytes)
                    out["frame_len"].append(len(chunk))
                    out["frame_md5"].append(_hashlib.md5(chunk).hexdigest())
            yield _pd.DataFrame(out)

    return (
        _binary_payload(docs)
        .mapInPandas(sample, FRAME_SCHEMA)
        .orderBy("doc_id", "frame_idx")
    )


ORACLE_FRAME_SAMPLE = f"""
WITH frames AS (
  SELECT doc_id,
         unnest(range(0, CAST(CEIL(strlen(text) * 1.0 / {FRAME_BYTES}) AS BIGINT))) AS frame_idx,
         text
  FROM documents
)
SELECT doc_id,
       frame_idx,
       frame_idx * {FRAME_BYTES} AS frame_offset,
       length(substr(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_len,
       md5(substr(text, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
FROM frames
WHERE frame_idx % {FRAME_STRIDE} = 0
ORDER BY doc_id, frame_idx
"""


ORACLE_SQL_MULTIMODAL = {
    "multimodal_image_decode": ORACLE_IMAGE_DECODE,
    "multimodal_frame_sample": ORACLE_FRAME_SAMPLE,
}
