"""Multimodal (image/audio/video) column plumbing (SURVEY §7 Phase 6).

No reference counterpart (north-star capability). Media travel as opaque
``binary`` payload columns with typed metadata — the pattern that scales:
payload bytes stay columnar (Parquet BYTE_ARRAY), metadata is queryable
without touching payloads, and decode/feature-extraction runs as
Arrow-batched ``mapInPandas`` so bytes cross the JVM↔Python boundary once
per batch, not per row.

The actual codec step is STUBBED (this container ships no image/audio
libraries): ``decode_image`` raises NotImplementedError unless PIL is
importable, and ``extract_features`` computes deterministic
payload-derived pseudo-features (md5-seeded) so the full pipeline —
schema, batching, partitioning, output shape — is real and
oracle-checkable while the codec is swappable.

At 100 TB: payloads dominate bytes; keep them in their own column chunk
(never in join keys), push metadata predicates to the scan so payload
pages for filtered-out rows are never read, and size
``spark.sql.files.maxPartitionBytes`` so one task's batch of payloads
fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

try:  # the real codec path, absent in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False

FEATURE_SCHEMA = (
    "media_id long, n_bytes int, fp string, pseudo_width int, pseudo_height int"
)


def media_table(df: DataFrame, id_col: str, payload_text_col: str) -> DataFrame:
    """Build a media(media_id, kind, payload binary, meta) table from a
    text column (the fixture stand-in for real image bytes)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image/fake").alias("kind"),
        F.col(payload_text_col).cast("binary").alias("payload"),
        F.struct(
            F.length(payload_text_col).alias("n_chars"),
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """The swappable codec. Real implementation requires PIL."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL (not shipped in this container); "
            "extract_features uses deterministic pseudo-features instead"
        )
    import io

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def _pseudo_features(payload: bytes) -> tuple[int, str, int, int]:
    """Deterministic payload-derived features: byte count, md5 hex, and
    md5-seeded pseudo dimensions (stand-ins for real width/height).
    DuckDB-renderable: md5 + hex-slice arithmetic."""
    fp = hashlib.md5(payload).hexdigest()
    width = int(fp[:4], 16) % 1920
    height = int(fp[4:8], 16) % 1080
    return len(payload), fp, width, height


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over payload bytes. One
    mapInPandas pass; output schema is fixed and typed. Swap
    _pseudo_features for a real decode when codecs are available."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_pseudo_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [f[0] for f in feats],
                    "fp": [f[1] for f in feats],
                    "pseudo_width": [f[2] for f in feats],
                    "pseudo_height": [f[3] for f in feats],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def sql_extract_features(table: str, id_col: str, payload_text_col: str) -> str:
    """DuckDB rendering of the pseudo-feature pipeline (payload = utf8
    bytes of the text column, so md5(text) == md5(payload))."""
    fp = f"md5({payload_text_col})"
    return f"""
SELECT {id_col} AS media_id,
       CAST(octet_length(encode({payload_text_col})) AS INT) AS n_bytes,
       {fp} AS fp,
       CAST(('0x' || substr({fp}, 1, 4))::BIGINT % 1920 AS INT) AS pseudo_width,
       CAST(('0x' || substr({fp}, 5, 4))::BIGINT % 1080 AS INT) AS pseudo_height
FROM {table}
"""


RESIZE_SCHEMA = "media_id long, out_w int, out_h int, n_bytes_out int, payload_hex string"


def pseudo_resize(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize plumbing with the codec stubbed: the 'resized image' is the
    payload truncated to out_w*out_h bytes (a real implementation decodes,
    resamples, re-encodes inside the same Arrow block — the schema, batch
    shape and output contract stay identical). Payload bytes are projected
    as hex so the result is hash-comparable across engines."""
    budget = out_w * out_h

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = [bytes(p)[:budget] for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "n_bytes_out": [len(o) for o in outs],
                    "payload_hex": [o.hex() for o in outs],
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


def sql_pseudo_resize(
    table: str, id_col: str, payload_text_col: str, out_w: int, out_h: int
) -> str:
    # DuckDB 1.0 has no substring(BLOB): slice the VARCHAR then encode.
    # Byte-identical because the fixture text is pure ASCII (asserted:
    # octet_length(encode(text)) == len(text) for every doc at every sf).
    budget = out_w * out_h
    blob = f"encode({payload_text_col})"
    return f"""
SELECT {id_col} AS media_id,
       {out_w} AS out_w, {out_h} AS out_h,
       CAST(least(octet_length({blob}), {budget}) AS INT) AS n_bytes_out,
       lower(hex(encode(substring({payload_text_col}, 1, {budget})))) AS payload_hex
FROM {table}
"""


def frame_sample(
    media: DataFrame, frame_bytes: int, every_k: int
) -> DataFrame:
    """Video frame sampling plumbing: treat the payload as a sequence of
    fixed-size frames and emit every k-th frame's bytes (hex). Pure
    column expressions — sequence + transform for the sampled offsets,
    posexplode, substring on binary — no Python in the loop; a real
    container format swaps the offset arithmetic for an index parse in
    an Arrow block, same output contract. Returns
    (media_id, frame_no, frame_hex)."""
    n_frames = F.floor(F.length("payload") / frame_bytes).cast("int")
    # Guard zero-frame payloads: sequence(0, -1, +k) is an error in Spark;
    # emit an empty array so explode drops the row (= DuckDB's empty range).
    idx = F.when(
        n_frames > 0,
        F.sequence(F.lit(0), n_frames - 1, F.lit(every_k)),
    ).otherwise(F.array().cast("array<int>"))
    out = media.select(
        "media_id",
        "payload",
        F.explode(idx).alias("frame_no"),
    )
    return out.select(
        "media_id",
        "frame_no",
        F.lower(
            F.hex(
                F.expr(f"substring(payload, frame_no * {frame_bytes} + 1, {frame_bytes})")
            )
        ).alias("frame_hex"),
    )


def sql_frame_sample(
    table: str, id_col: str, payload_text_col: str, frame_bytes: int, every_k: int
) -> str:
    # VARCHAR slicing (see sql_pseudo_resize: fixture text is pure ASCII,
    # DuckDB 1.0 has no substring(BLOB)).
    blob = f"encode({payload_text_col})"
    return f"""
WITH m AS (
  SELECT {id_col} AS media_id, {payload_text_col} AS payload_txt,
         CAST(floor(octet_length({blob}) / {frame_bytes}) AS INT) AS n_frames
  FROM {table}
),
frames AS (
  SELECT media_id, payload_txt,
         unnest(range(0, greatest(n_frames, 0), {every_k})) AS frame_no
  FROM m
)
SELECT media_id, CAST(frame_no AS INT) AS frame_no,
       lower(hex(encode(substring(payload_txt, frame_no * {frame_bytes} + 1, {frame_bytes})))) AS frame_hex
FROM frames
"""
