"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are STUBS:
``decode_image``/``decode_audio`` raise NotImplementedError unless
``fake=True``, in which case a deterministic fake decoder (byte statistics)
stands in. Everything Spark-side — schema, batch iteration, partitioning,
output typing — is real and tested; swapping the kernel body for PIL/ffmpeg
is a one-function change.

Scale notes: mapInPandas streams Arrow record batches, so payload bytes
never materialize as Python objects row-by-row; partition sizing should cap
``spark.sql.files.maxPartitionBytes`` so a batch of payloads fits executor
memory (binary columns dominate row width).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata accompanying every payload — the schema a 100 TB multimodal
# lakehouse table would carry per asset.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video|text
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("first_byte", T.IntegerType()),
        T.StructField("byte_sum_mod", T.LongType()),  # deterministic fake "feature"
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def to_media_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media-shaped table from any source by treating content bytes
    as an opaque payload (how the fixtures stand in for real image bytes)."""
    payload = F.col(text_col).cast("binary")
    return docs.select(
        F.col(id_col).alias("asset_id"),
        F.lit("image").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder: derives pseudo
    width/height and byte stats from the payload alone."""
    n = len(payload)
    s = int(sum(payload) % 1_000_003) if n else 0
    return {
        "n_bytes": n,
        "first_byte": payload[0] if n else -1,
        "byte_sum_mod": s,
        "width": (s % 64) + 1,
        "height": (n % 64) + 1,
    }


def decode_images(media: DataFrame, fake: bool = True, batch_hint: int = 256) -> DataFrame:
    """Decode/feature-extract payloads with mapInPandas (Arrow batches).

    ``fake=False`` is the production signature and raises
    NotImplementedError in this container (no codec libs, see module doc).
    """
    if not fake:
        raise NotImplementedError(
            "real image decoding requires PIL/libvips, not present in this "
            "container; use fake=True for the deterministic stand-in"
        )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p if p is not None else b"") for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "asset_id", pdf["asset_id"].values)
            yield out[[f.name for f in IMAGE_FEATURES_SCHEMA.fields]]

    return media.mapInPandas(_decode, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' plumbing demo: slice the payload at a fixed stride
    into up to ``max_frames`` chunks (what video frame extraction looks like
    shape-wise: one row in, many typed rows out). Pure built-ins."""
    idx = F.sequence(
        F.lit(0),
        F.least(
            F.floor(F.octet_length("payload") / every_n_bytes).cast("int"),
            F.lit(max_frames - 1),
        ),
    )
    # substring() operates directly on BinaryType (byte offsets, returns
    # binary) — slicing via cast("string") would corrupt any non-ASCII
    # payload because byte and char offsets diverge.
    return media.select(
        "asset_id",
        F.posexplode(
            F.transform(
                idx, lambda i: F.substring(F.col("payload"), i * every_n_bytes + 1, F.lit(every_n_bytes))
            )
        ).alias("frame_idx", "frame_payload"),
    ).filter(F.octet_length(F.col("frame_payload")) > 0)
