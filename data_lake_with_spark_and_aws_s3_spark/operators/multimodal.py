"""Multimodal columns (SURVEY.md §2.10): typed struct columns binding
text + embedding + metadata, opaque binary payloads with typed
metadata, and the decode / feature-extract plumbing as Arrow-batched
mapInPandas.

The image/audio decode libraries are NOT in this container, so the
decode step is a clearly-marked deterministic fake behind
`decode_image_stub` (NotImplementedError for real codecs) — but the
Spark-side plumbing is real and tested: binary schema, struct access,
mapInPandas batch iteration, output schema declaration, partition
preservation.

Scale posture: binary payloads ride Parquet as BYTE_ARRAY with
dictionary off; metadata stays in scalar columns so predicates on it
prune row groups WITHOUT touching the blobs (column pruning = you
never read the bytes you don't decode). mapInPandas streams
Arrow batches — constant memory per task regardless of blob count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import load_table


@query(
    "q_multimodal_struct",
    oracle="""
    SELECT d.doc_id,
           d.text AS media_text,
           CAST(length(d.text) AS BIGINT) AS text_len,
           CAST(len(e.embedding) AS BIGINT) AS embedding_dim,
           d.lang AS meta_lang,
           d.source AS meta_source
    FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
    """,
    tags=("multimodal", "struct"),
)
def q_multimodal_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal record type: struct(text, embedding, metadata map)
    assembled, then accessed with dotted paths / element_at — proves
    the nested type round-trips through Catalyst (the oracle checks
    the flattened projection)."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    media = d.join(e, d.doc_id == e.vec_id).select(
        "doc_id",
        F.struct(
            F.col("text"),
            F.col("embedding"),
            F.create_map(
                F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
            ).alias("meta"),
        ).alias("media"),
    )
    return media.select(
        "doc_id",
        F.col("media.text").alias("media_text"),
        F.length("media.text").cast("long").alias("text_len"),
        F.size("media.embedding").cast("long").alias("embedding_dim"),
        F.element_at("media.meta", "lang").alias("meta_lang"),
        F.element_at("media.meta", "source").alias("meta_source"),
    )


def decode_image_stub(payload: bytes) -> dict:
    """STUB decode (real codecs unavailable in this container).

    Deterministic fake: 'width'/'height' derived from the payload
    bytes so tests are stable. A real deployment replaces this body
    with e.g. PIL.Image.open(io.BytesIO(payload)) — the Spark-side
    plumbing (schema, batching, partitioning) does not change.
    """
    if not isinstance(payload, (bytes, bytearray)):
        raise NotImplementedError("real image decoding requires a codec library")
    n = len(payload)
    return {"width": 16 + n % 64, "height": 16 + (n * 7) % 64, "n_bytes": n}


@query(
    "q_multimodal_binary",
    # The stub features are pure functions of the payload byte length,
    # so the mapInPandas output IS oracle-checkable: strlen() in DuckDB
    # is byte length of the UTF-8 text, identical to len() of the
    # binary-cast payload on the Spark side.
    oracle="""
    SELECT doc_id,
           lang,
           CAST(16 + strlen(text) % 64 AS BIGINT) AS width,
           CAST(16 + (strlen(text) * 7) % 64 AS BIGINT) AS height,
           CAST(strlen(text) AS BIGINT) AS n_bytes
    FROM documents
    """,
    tags=("multimodal", "binary", "pandas-udf"),
)
def q_multimodal_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque binary payloads + Arrow-batched feature extraction.
    The Python decode path (mapInPandas) is the thing under test; the
    stub's outputs are deterministic functions of byte length so the
    whole pipeline is value-checked against SQL.

    documents.text stands in for an image payload (cast to binary);
    mapInPandas streams Arrow batches through decode_image_stub and
    emits typed metadata. The frame shape — binary in, scalars out,
    schema declared up front — is exactly what a real image/audio
    pipeline uses."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload"), "lang"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode_image_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "lang": pdf["lang"],
                    "width": feats.map(lambda f: f["width"]),
                    "height": feats.map(lambda f: f["height"]),
                    "n_bytes": feats.map(lambda f: f["n_bytes"]),
                }
            )

    return d.mapInPandas(
        extract, schema="doc_id long, lang string, width long, height long, n_bytes long"
    )


_FRAME_BYTES = 16
_FRAME_STRIDE = 4  # keep every 4th frame


@query(
    "q_multimodal_frames",
    # documents.text is ASCII (word-salad vocabulary + spaces), so
    # DuckDB's character-based substr/ord mirror the Spark side's BYTE
    # slicing exactly; the checksum is an integer sum of frame bytes.
    oracle=f"""
    WITH f AS (
      SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
             substr(text, CAST(i * {_FRAME_BYTES} + 1 AS INTEGER),
                    {_FRAME_BYTES}) AS fr
      FROM documents, UNNEST(range(0, strlen(text) // {_FRAME_BYTES})) t(i)
      WHERE i % {_FRAME_STRIDE} = 0
    )
    SELECT doc_id, frame_idx,
           frame_idx * {_FRAME_BYTES} AS byte_offset,
           CAST(list_reduce(list_transform(range(1, {_FRAME_BYTES + 1}),
                j -> ord(substr(fr, CAST(j AS INTEGER), 1))),
                (s, x) -> s + x) AS BIGINT) AS checksum
    FROM f
    """,
    tags=("multimodal", "binary", "frame-sampling", "pandas-udf"),
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque binary payloads — the video-ingest
    plumbing shape: treat each payload as a container of fixed-size
    frames (16 bytes here; a real container would parse
    headers in the same place the slicing loop sits), keep every
    4th full frame, and emit one typed metadata row per
    sampled frame (index, byte offset, checksum). One input row fans
    out to many output rows THROUGH mapInPandas — the part worth
    testing: per-batch Python fan-out with a declared schema, Arrow
    in/out, no driver involvement.

    As with decode_image_stub, the frame MATH is a deterministic fake
    (real decoders aren't in this container) but every Spark-side
    mechanism is real, and the fake is a pure function of the bytes
    so the whole fan-out is value-checked against SQL byte arithmetic.

    Scale: frames stream Arrow batch by Arrow batch (constant memory
    per task however large the corpus); the output carries offsets,
    not payload bytes, so downstream shuffles never move media. Real
    frame-sample pipelines add a second mapInPandas stage decoding
    ONLY the sampled offsets — a quarter of the decode cost here."""
    import pandas as _pd

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, idxs, offs, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(0, len(b) // _FRAME_BYTES, _FRAME_STRIDE):
                    fr = b[i * _FRAME_BYTES : (i + 1) * _FRAME_BYTES]
                    doc_ids.append(doc_id)
                    idxs.append(i)
                    offs.append(i * _FRAME_BYTES)
                    sums.append(sum(fr))
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.array(doc_ids, dtype="int64"),
                    "frame_idx": _pd.array(idxs, dtype="int64"),
                    "byte_offset": _pd.array(offs, dtype="int64"),
                    "checksum": _pd.array(sums, dtype="int64"),
                }
            )

    return d.mapInPandas(
        sample,
        "doc_id long, frame_idx long, byte_offset long, checksum long",
    )


_RASTER_W = 16  # fake raster width (bytes per row)


@query(
    "q_multimodal_resize",
    # ASCII payload => DuckDB's substr/ord mirror byte indexing. The
    # resized raster keeps even rows x even cols (nearest-neighbor 2x
    # downsample); its checksum is an exact integer byte sum.
    oracle=f"""
    WITH dims AS (
      SELECT doc_id, text,
             CAST({_RASTER_W} AS BIGINT) AS in_w,
             CAST(strlen(text) // {_RASTER_W} AS BIGINT) AS in_h
      FROM documents
      WHERE strlen(text) // {_RASTER_W} >= 2
    ),
    kept AS (
      SELECT doc_id, in_w, in_h,
             ord(substr(text, CAST(r * {_RASTER_W} + c + 1 AS INTEGER), 1)) AS b
      FROM dims,
           UNNEST(range(0, in_h)) t(r),
           UNNEST(range(0, {_RASTER_W})) u(c)
      WHERE r % 2 = 0 AND c % 2 = 0
    )
    SELECT doc_id, in_w, in_h,
           CAST({_RASTER_W} // 2 AS BIGINT) AS out_w,
           CAST((in_h + 1) // 2 AS BIGINT) AS out_h,
           CAST(COUNT(*) AS BIGINT) AS out_bytes,
           CAST(SUM(b) AS BIGINT) AS out_checksum
    FROM kept
    GROUP BY doc_id, in_w, in_h
    """,
    tags=("multimodal", "binary", "resize", "pandas-udf"),
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing over binary rasters: each payload is read as a
    16-byte-wide raster and 2x-downsampled nearest-neighbor (numpy
    reshape + [::2, ::2] stride slice) inside Arrow-batched
    mapInPandas — the per-batch vectorized shape a real image resize
    (PIL/cv2 at the decode_image_stub boundary) drops into unchanged.
    Output dims + byte count + checksum of the RESIZED raster are
    hashed, so a stride/mis-shape bug changes the answer.

    Scale: map-only (zero shuffle); blobs stream through Arrow batches
    at constant memory; metadata-only readers never touch the bytes
    (column pruning). The tail row fragment below in_w bytes is
    dropped, exactly as a real decoder crops to full scanlines."""
    import numpy as np

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = np.frombuffer(bytes(payload), dtype=np.uint8)
                in_h = len(buf) // _RASTER_W
                if in_h < 2:
                    continue
                raster = buf[: in_h * _RASTER_W].reshape(in_h, _RASTER_W)
                small = raster[::2, ::2]  # nearest-neighbor 2x downsample
                rows.append(
                    (
                        int(doc_id),
                        _RASTER_W,
                        in_h,
                        small.shape[1],
                        small.shape[0],
                        int(small.size),
                        int(small.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "in_w", "in_h", "out_w", "out_h",
                    "out_bytes", "out_checksum",
                ],
            )

    return d.mapInPandas(
        resize,
        schema=(
            "doc_id long, in_w long, in_h long, out_w long, out_h long, "
            "out_bytes long, out_checksum long"
        ),
    )
