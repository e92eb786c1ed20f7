"""Multimodal column plumbing — image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio decode libraries, so the decode step
itself is STUBBED (deterministic fake, clearly marked); everything
Spark-side — binary column handling, metadata schema, Arrow batch shape
through mapInPandas, partitioning — is real and tested. Swapping the
fake for PIL/torchaudio is a one-function change at the marked point.

Scale shape: media bytes travel in their own column so column pruning
keeps them out of every stage that doesn't decode; decode runs in
mapInPandas (Arrow batches, one Python roundtrip per batch, never per
row) and is embarrassingly parallel.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 4

MEDIA_SCHEMA_SUFFIX = (
    "media binary, media_format string, media_width int, media_height int, media_n_bytes int"
)


def attach_fake_media(df: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Deterministic synthetic media column: the md5 digest bytes of the
    text stand in for encoded image bytes; metadata derived from id
    arithmetic. (Real pipelines read bytes from object storage.)"""
    return df.select(
        id_col,
        F.unhex(F.md5(F.col(text_col))).alias("media"),
        F.element_at(
            F.array(F.lit("png"), F.lit("jpeg"), F.lit("webp")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_format"),
        (F.col(id_col) % 16 + 16).cast("int").alias("media_width"),
        (F.col(id_col) % 9 + 9).cast("int").alias("media_height"),
        F.length(F.unhex(F.md5(F.col(text_col)))).cast("int").alias("media_n_bytes"),
    )


def decode_image(media_bytes: bytes, media_format: str):
    """REAL decode entry point — intentionally unimplemented in this
    container (no PIL/libvips). The pipeline never calls it unless
    ``fake=False`` is requested."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; use extract_features(fake=True) (deterministic stub)"
    )


def _fake_features(media: bytes, width: int, height: int) -> list[float]:
    """Deterministic stand-in for a decoded-image feature vector:
    4 floats derived from the byte content + dims. Same signature and
    batch shape as a real extractor.

    The hash is taken over the HEX of the bytes (not the raw bytes) so
    an independent SQL oracle can reproduce it — DuckDB's md5() only
    accepts VARCHAR. The kernel still consumes the binary column."""
    h = hashlib.md5(bytes(media).hex().encode()).digest()
    return [
        int.from_bytes(h[0:4], "big") / 2**32,
        int.from_bytes(h[4:8], "big") / 2**32,
        float(width) / 64.0,
        float(height) / 32.0,
    ]


def extract_features(df: DataFrame, id_col="doc_id", fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over media batches. The Arrow
    batch is the unit of Python work; schema and partitioning are the
    production shape regardless of the stubbed kernel."""
    out_schema = f"{id_col} long, media_format string, features array<double>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = [
                    _fake_features(m, w, h)
                    for m, w, h in zip(
                        pdf["media"], pdf["media_width"], pdf["media_height"]
                    )
                ]
            else:
                feats = [
                    decode_image(m, f) for m, f in zip(pdf["media"], pdf["media_format"])
                ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media_format": pdf["media_format"],
                    "features": feats,
                }
            )

    cols = [id_col, "media", "media_format", "media_width", "media_height"]
    return df.select(*cols).mapInPandas(kernel, schema=out_schema)


def resize_media(
    df: DataFrame, target_w: int, target_h: int, id_col="doc_id", fake: bool = True
) -> DataFrame:
    """mapInPandas resize: same row count, new media bytes + updated
    dims. The fake kernel derives output bytes deterministically from
    (input bytes, target dims) — same signature, Arrow batch shape and
    schema as a real PIL/libvips resize, which plugs in at the marked
    point."""
    out_schema = (
        f"{id_col} long, media binary, media_format string, "
        "media_width int, media_height int, media_n_bytes int"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                # hex-of-bytes hashing so a SQL oracle can reproduce
                # the fake output (see _fake_features)
                resized = [
                    hashlib.md5(
                        (bytes(m).hex() + f"{target_w}x{target_h}").encode()
                    ).digest()
                    for m in pdf["media"]
                ]
            else:
                resized = [decode_image(m, f) for m, f in zip(pdf["media"], pdf["media_format"])]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "media": resized,
                    "media_format": pdf["media_format"],
                    "media_width": target_w,
                    "media_height": target_h,
                    "media_n_bytes": [len(b) for b in resized],
                }
            )

    cols = [id_col, "media", "media_format"]
    return df.select(*cols).mapInPandas(kernel, schema=out_schema)


def sample_frames(
    df: DataFrame, n_frames: int, id_col="doc_id", fake: bool = True
) -> DataFrame:
    """mapInPandas frame sampling — the one-to-many media op (a video
    row fans out to ``n_frames`` frame rows, each with its own bytes).
    The fake kernel derives frame bytes from (video bytes, frame index);
    a real ffmpeg/torchvision sampler plugs in at the marked point.
    Output rows stay inside the input's partition (no shuffle)."""
    out_schema = f"{id_col} long, frame_idx int, frame binary, frame_n_bytes int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for did, m in zip(pdf[id_col], pdf["media"]):
                for i in range(n_frames):
                    if fake:
                        fb = hashlib.md5(
                            (bytes(m).hex() + f"frame{i}").encode()
                        ).digest()
                    else:
                        fb = decode_image(m, f"frame{i}")
                    ids.append(did)
                    idxs.append(i)
                    frames.append(fb)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "frame_idx": idxs,
                    "frame": frames,
                    "frame_n_bytes": [len(b) for b in frames],
                }
            )

    return df.select(id_col, "media").mapInPandas(kernel, schema=out_schema)


def media_metadata(df: DataFrame, id_col="doc_id") -> DataFrame:
    """Metadata-only projection — verifies column pruning keeps the
    binary column out of the scan when not needed."""
    return df.select(
        id_col, "media_format", "media_width", "media_height", "media_n_bytes"
    )
