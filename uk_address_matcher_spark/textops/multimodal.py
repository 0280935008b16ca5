"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

Media arrive as `media` spans (media_ref URIs) inside interleaved
documents. The Spark-side plumbing — schema, partitioning, Arrow batch
shape, UDF signatures — is real and tested; the actual codec work (image
decode, resampling, frame extraction) is STUBBED deterministically because
this container ships no image/audio libraries: `deterministic_fake=True`
derives bytes/features from md5(media_ref), `deterministic_fake=False`
raises NotImplementedError at the exact point a real decoder would be
called (drop-in replacement documented per function).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_kind", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def media_table(documents: DataFrame) -> DataFrame:
    """Explode media spans: (doc_id, media_ref, offset)."""
    return documents.select(
        "doc_id",
        F.explode(
            F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("media"))
        ).alias("m"),
    ).select("doc_id", F.col("m")["media_ref"].alias("media_ref"), F.col("m")["offset"].alias("offset"))


def _fake_bytes(ref: str, n: int = 64) -> bytes:
    out = b""
    i = 0
    while len(out) < n:
        out += hashlib.md5(f"{ref}|{i}".encode()).digest()
        i += 1
    return out[:n]


def decode_media(
    media: DataFrame, deterministic_fake: bool = True, batch_hint: int = 1024
) -> DataFrame:
    """(doc_id, media_ref) -> MEDIA_SCHEMA rows via mapInPandas.

    Real implementation point: replace the `_fake_bytes` branch with a
    fetch (object store GET on media_ref) + codec (PIL / torchaudio /
    pyav). The Arrow batch iteration, schema and partition behaviour are
    identical either way.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real media decode requires codec libraries; this "
                    "container is text-only (see module docstring)"
                )
            refs = pdf["media_ref"]
            content = refs.map(lambda r: _fake_bytes(r, 64))
            h = refs.map(
                lambda r: int(hashlib.md5(r.encode()).hexdigest()[:8], 16)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": refs,
                    "media_kind": h.map(lambda x: ["image", "audio", "video"][x % 3]),
                    "content": content,
                    "width": (h % 1920 + 16).astype("int32"),
                    "height": (h % 1080 + 16).astype("int32"),
                    "n_frames": (h % 300 + 1).astype("int32"),
                }
            )

    return media.mapInPandas(decode, MEDIA_SCHEMA)


def extract_features(
    decoded: DataFrame, dim: int = 8, deterministic_fake: bool = True
) -> DataFrame:
    """Per-media feature vector via an Arrow-batched pandas UDF.

    Real implementation point: replace the md5 branch with an embedding
    model forward pass (batched — the UDF already receives Arrow record
    batches, the natural GPU batch boundary).
    """

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def featurize(content: pd.Series) -> pd.Series:
        if not deterministic_fake:
            raise NotImplementedError("real feature extraction needs a model")

        def feat(b: bytes) -> list[float]:
            # hash the HEX of the content (not raw bytes): DuckDB's md5()
            # is VARCHAR-only, so hashing the hex string keeps the fake
            # feature oracle-replayable. /256.0 (not /255) keeps every
            # value dyadic — exactly representable in float32 AND double,
            # so round(x, 6) agrees bit-for-bit across engines.
            d = hashlib.md5(b.hex().encode()).digest()
            return [d[i] / 256.0 for i in range(dim)]

        return content.map(feat)

    return decoded.select(
        "doc_id", "media_ref", featurize(F.col("content")).alias("feature")
    )


def sample_frames(
    decoded: DataFrame, every_n: int = 30, deterministic_fake: bool = True
) -> DataFrame:
    """Video frame sampling: one row per sampled frame index.

    The frame INDEX computation is real (pure expressions); producing the
    frame pixels is the stubbed decode step.
    """
    frames = decoded.filter(F.col("media_kind") == "video").select(
        "doc_id",
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
    if not deterministic_fake:
        raise NotImplementedError("real frame extraction needs a video codec")
    return frames.withColumn(
        "frame_digest", F.md5(F.concat_ws("#", "media_ref", "frame_idx"))
    )
