"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed via Arrow-batched ``mapInPandas``.

Two kernel families share every Spark-side contract (schema, batching,
partitioning, output typing):

- ``fake=True`` (default for the oracle-gated fixture entries): a
  deterministic byte-statistics stand-in, SQL-reproducible cross-engine.
- ``fake=False``: REAL decoding via ``functions/codecs.py`` — pure
  stdlib/numpy decoders for the publicly-documented formats (PNG 8-bit via
  zlib inflate + scanline unfiltering, baseline JPEG per ITU-T T.81 in
  functions/jpeg.py, BMP 24bpp, RIFF WAV PCM 8/16-bit). Payloads in other
  containers (MP3, progressive JPEG, ...) raise ValueError
  (``on_error="skip"`` drops them instead) — an honest refusal, never a
  fabricated answer; ``decode_stats`` surfaces exactly what a corpus
  decoded vs dropped per format, so a pipeline SEES what it lost.

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


def _skip_kernel(media: DataFrame, kernel, schema: T.StructType, on_error: str) -> DataFrame:
    """Shared Arrow batch loop for all real-codec kernels: run ``kernel``
    per payload, re-raise or drop on ValueError per ``on_error`` — the ONE
    place the skip semantics live (codecs.py normalizes every corrupt-
    payload failure to ValueError, so 'skip' really skips truncated/corrupt
    files, not just wrong-magic ones)."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    skip = on_error == "skip"
    names = [f.name for f in schema.fields]

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    feats.append(kernel(p if p is not None else b""))
                    ids.append(aid)
                except ValueError:
                    if not skip:
                        raise
            out = pd.DataFrame(feats) if feats else pd.DataFrame(
                columns=[n for n in names if n != "asset_id"]
            )
            out.insert(0, "asset_id", pd.Series(ids, dtype="int64"))
            yield out[names]

    return media.mapInPandas(_run, schema=schema)


def _real_decode(payload: bytes) -> dict:
    """REAL image decode (PNG/BMP via codecs.py): true width/height and
    pixel statistics over the DECODED bytes (the fake kernel's stats are
    over payload bytes — different surface, deliberately)."""
    from kadiyadb_spark.functions import codecs

    img = codecs.decode_image(payload)
    flat = img.reshape(-1)
    return {
        "n_bytes": len(payload),
        "first_byte": int(flat[0]) if flat.size else -1,
        "byte_sum_mod": int(flat.sum(dtype="int64") % 1_000_003),
        "width": int(img.shape[1]),
        "height": int(img.shape[0]),
    }


def decode_images(
    media: DataFrame, fake: bool = True, batch_hint: int = 256, on_error: str = "raise"
) -> DataFrame:
    """Decode/feature-extract payloads with mapInPandas (Arrow batches).

    ``fake=False`` REALLY decodes PNG/BMP payloads (codecs.py) — width and
    height are the image's true dimensions and byte stats cover the decoded
    pixels. Unsupported containers AND corrupt payloads (truncated headers,
    bad zlib streams — codecs normalizes them all to ValueError) raise per
    payload, or are dropped with ``on_error="skip"`` (the curation posture
    for a crawl corpus with stray or damaged files).
    """
    kernel = _fake_decode if fake else _real_decode
    return _skip_kernel(media, kernel, IMAGE_FEATURES_SCHEMA, on_error)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("pix_checksum", T.LongType()),
    ]
)


def _fake_resize(payload: bytes, out_w: int, out_h: int) -> dict:
    """Deterministic stand-in for image resize: lay the payload out row-major
    as the fake-decoded width x height pixel grid and nearest-neighbor sample
    an out_w x out_h grid (positions past the payload read as 0). The
    checksum of sampled 'pixels' is the verifiable output.

    Loop-free: the sample positions form an outer sum of two index vectors,
    so one numpy gather over the payload buffer computes the checksum — the
    kernel shape a real resampler (PIL/libvips) drops into."""
    import numpy as np

    d = _fake_decode(payload)
    w, h, n = d["width"], d["height"], len(payload)
    rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
    pos = (rows[:, None] * w + cols[None, :]).ravel()
    buf = np.frombuffer(payload, dtype=np.uint8)
    tot = int(buf[pos[pos < n]].sum(dtype=np.int64))
    return {"out_w": out_w, "out_h": out_h, "pix_checksum": tot % 1_000_003}


def _real_resize(payload: bytes, out_w: int, out_h: int) -> dict:
    """REAL decode (PNG/BMP) + nearest-neighbor resample; checksum over the
    sampled pixel bytes is the verifiable output (same contract as the fake
    kernel, computed over true pixels)."""
    from kadiyadb_spark.functions import codecs

    small = codecs.resize_nearest(codecs.decode_image(payload), out_w, out_h)
    return {
        "out_w": out_w,
        "out_h": out_h,
        "pix_checksum": int(small.sum(dtype="int64") % 1_000_003),
    }


def resize_images(
    media: DataFrame, out_w: int = 8, out_h: int = 8, fake: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """Resize via mapInPandas (Arrow batches). ``fake=False`` REALLY decodes
    PNG/BMP and nearest-neighbor resamples the true pixel grid (codecs.py);
    the fake kernel keeps the oracle-stable byte-grid stand-in. Same
    ``on_error`` contract as decode_images (shared _skip_kernel)."""
    base = _fake_resize if fake else _real_resize
    return _skip_kernel(
        media, lambda p: base(p, out_w, out_h), RESIZED_SCHEMA, on_error
    )


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


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("win_idx", T.LongType()),
        T.StructField("energy", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def audio_windows(
    media: DataFrame,
    window: int = 64,
    stride: int = 32,
    fake: bool = True,
    batch_hint: int = 256,
    on_error: str = "raise",
) -> DataFrame:
    """Frame-sample audio payloads into overlapping fixed-size windows and
    extract per-window features — the audio half of the multimodal
    contract (decode -> window -> feature), the prep for VAD / loudness
    filtering / segment-level dedup of an audio corpus.

    ``fake=True`` treats payload bytes as byte-centered PCM
    (sample_i = byte_i - 128) — the SQL-reproducible stand-in. ``fake=False``
    REALLY parses RIFF WAV (codecs.py: PCM 8/16-bit, any channel count;
    channel 0 is windowed) and raises ValueError on non-WAV or corrupt
    payloads — or drops them with ``on_error="skip"``, the same curation
    contract as decode_images/resize_images. Both
    features are INTEGER-exact either way: ``energy`` = sum(sample^2) over
    the window, ``zero_crossings`` = sign changes between consecutive
    samples (>= 0 counts as non-negative). Only FULL windows emit — a
    trailing partial window would smuggle a length-dependent bias into
    energy.

    Scale shape: one mapInPandas pass, numpy per payload (vectorized
    square/compare — no per-sample Python); output rows ~ n_bytes/stride
    per asset, so downstream aggregation cost tracks audio duration, not
    corpus row count."""
    if window < 2 or stride < 1:
        raise ValueError(f"need window >= 2 and stride >= 1, got {window}/{stride}")
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    skip = on_error == "skip"
    import numpy as np

    def _samples(payload: bytes) -> "np.ndarray":
        if fake:
            return np.frombuffer(payload or b"", dtype=np.uint8).astype(np.int64) - 128
        from kadiyadb_spark.functions import codecs

        frames, _rate = codecs.decode_audio(payload or b"")
        return frames[:, 0].astype(np.int64)

    def _win(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, wins, es, zs = [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    b = _samples(payload)
                except ValueError:
                    if skip:
                        continue
                    raise
                n = len(b)
                for k in range((n - window) // stride + 1 if n >= window else 0):
                    s = b[k * stride : k * stride + window]
                    ids.append(aid)
                    wins.append(k)
                    es.append(int((s * s).sum()))
                    zs.append(int(((s[:-1] >= 0) != (s[1:] >= 0)).sum()))
            yield pd.DataFrame(
                {"asset_id": ids, "win_idx": wins, "energy": es, "zero_crossings": zs}
            )

    return media.mapInPandas(_win, schema=AUDIO_WINDOW_SCHEMA)


DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("format", T.StringType()),  # png|jpeg|bmp|wav|unknown
        T.StructField("n_assets", T.LongType()),
        T.StructField("n_decoded", T.LongType()),
        T.StructField("n_failed", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
    ]
)


def decode_stats(media: DataFrame, fake: bool = False) -> DataFrame:
    """Per-(media_type, container format) decode census: how much of the
    corpus actually decodes vs what ``on_error="skip"`` would silently drop
    — the observability a crawl pipeline needs before trusting a skip
    posture (a corpus that is 70% progressive JPEG should KNOW it).

    Format comes from magic-byte sniffing (codecs.sniff; 'unknown' for
    unrecognized containers); decoded/failed from actually attempting the
    real decoder for the asset's media_type (images via decode_image,
    audio via decode_audio, video via decode_avi). ``fake=True`` counts every sniffed-format
    payload as decoded without running the codec — the cheap census when
    only the format mix is needed.

    Scale shape: counts aggregate INSIDE each Arrow batch (the kernel
    emits one partial row per (type, format) per batch), so the shuffle
    carries O(batches x formats) rows regardless of corpus size — the
    map-side-combine pattern, payload bytes never leave the scan stage."""
    from kadiyadb_spark.functions import codecs

    def _census(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            agg: dict[tuple[str, str], list[int]] = {}
            for mt, p in zip(pdf["media_type"], pdf["payload"]):
                b = bytes(p) if p is not None else b""
                fmt = codecs.sniff(b) or "unknown"
                ok = True
                if not fake:
                    try:
                        if mt == "audio":
                            codecs.decode_audio(b)
                        elif mt == "video":
                            codecs.decode_video(b)
                        else:
                            codecs.decode_image(b)
                    except ValueError:
                        ok = False
                elif fmt == "unknown":
                    ok = False
                row = agg.setdefault((mt, fmt), [0, 0, 0, 0])
                row[0] += 1
                row[1] += 1 if ok else 0
                row[2] += 0 if ok else 1
                row[3] += len(b)
            yield pd.DataFrame(
                [
                    {
                        "media_type": mt,
                        "format": fmt,
                        "n_assets": v[0],
                        "n_decoded": v[1],
                        "n_failed": v[2],
                        "total_bytes": v[3],
                    }
                    for (mt, fmt), v in agg.items()
                ],
                columns=[f.name for f in DECODE_STATS_SCHEMA.fields],
            )

    partial = media.mapInPandas(_census, schema=DECODE_STATS_SCHEMA)
    return partial.groupBy("media_type", "format").agg(
        F.sum("n_assets").cast("long").alias("n_assets"),
        F.sum("n_decoded").cast("long").alias("n_decoded"),
        F.sum("n_failed").cast("long").alias("n_failed"),
        F.sum("total_bytes").cast("long").alias("total_bytes"),
    )


VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("pix_sum_mod", T.LongType()),
        T.StructField("fps", T.DoubleType()),
    ]
)


def video_frames(
    media: DataFrame,
    every_n: int = 1,
    max_frames: int = 64,
    on_error: str = "raise",
) -> DataFrame:
    """REAL video frame sampling: decode each payload's container — AVI
    (codecs.decode_avi, uncompressed 24bpp DIB streams) or animated GIF
    (codecs.decode_gif_frames, composited on the logical screen) — keep every
    ``every_n``-th frame up to ``max_frames``, and emit per-frame stats
    (true width/height, decoded-pixel checksum, stream fps). One row per
    SAMPLED frame — the row-explosion shape a training pipeline's
    frame-extraction stage has, with the same ValueError/skip contract as
    the other real kernels (compressed or corrupt containers refuse;
    ``on_error="skip"`` drops the asset).

    Scale shape: per-payload numpy inside Arrow batches; output rows track
    sampled frames, not container bytes — a 100 TB video corpus fans out
    embarrassingly parallel and only KB-scale stats rows shuffle."""
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    skip = on_error == "skip"

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from kadiyadb_spark.functions import codecs

        for pdf in batches:
            rows = []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    frames, fps = codecs.decode_video(bytes(p) if p is not None else b"")
                except ValueError:
                    if skip:
                        continue
                    raise
                for k, i in enumerate(range(0, len(frames), every_n)):
                    if k >= max_frames:
                        break
                    f = frames[i]
                    rows.append(
                        {
                            "asset_id": aid,
                            "frame_idx": i,
                            "width": f.shape[1],
                            "height": f.shape[0],
                            "pix_sum_mod": int(f.sum(dtype="int64") % 1_000_003),
                            "fps": fps,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_FRAME_SCHEMA.fields])

    return media.mapInPandas(_frames, schema=VIDEO_FRAME_SCHEMA)


SCENE_CUT_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("from_idx", T.LongType()),
        T.StructField("to_idx", T.LongType()),
        T.StructField("mad", T.DoubleType()),
        T.StructField("is_cut", T.LongType()),
    ]
)


def scene_cuts(
    media: DataFrame,
    threshold: float,
    every_n: int = 1,
    max_frames: int = 64,
    on_error: str = "raise",
) -> DataFrame:
    """Scene-cut detection over video containers (AVI / animated GIF):
    decode, sample every ``every_n``-th frame (up to ``max_frames``), and
    emit one row per CONSECUTIVE sampled-frame transition with its mean
    absolute pixel difference and a cut flag (``mad > threshold``) — the
    shot-segmentation stage a video training pipeline runs before
    clip-level sampling/dedup (a cut boundary is where you split clips).

    The diff is integer pixel arithmetic (int64 abs-diff mean — no FP
    accumulation order anywhere; the mean of an integer sum divided by a
    fixed pixel count is one IEEE division), so results are engine- and
    layout-exact. Same ValueError/skip contract as the other real
    kernels; one row per transition leaves the Arrow batch, never pixels.
    """
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")
    skip = on_error == "skip"
    thr = float(threshold)

    def _cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from kadiyadb_spark.functions import codecs

        for pdf in batches:
            rows = []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    frames, _fps = codecs.decode_video(bytes(p) if p is not None else b"")
                except ValueError:
                    if skip:
                        continue
                    raise
                sampled = [
                    (i, frames[i])
                    for k, i in enumerate(range(0, len(frames), every_n))
                    if k < max_frames
                ]
                for (i0, f0), (i1, f1) in zip(sampled, sampled[1:]):
                    diff = int(
                        np.abs(
                            f1.astype(np.int64) - f0.astype(np.int64)
                        ).sum(dtype=np.int64)
                    )
                    mad = diff / float(f0.size)
                    rows.append(
                        {
                            "asset_id": aid,
                            "from_idx": i0,
                            "to_idx": i1,
                            "mad": mad,
                            "is_cut": int(mad > thr),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in SCENE_CUT_SCHEMA.fields])

    return media.mapInPandas(_cuts, schema=SCENE_CUT_SCHEMA)


def _ahash_kernel(payload: bytes) -> dict:
    """Real perceptual average-hash: decode (PNG/BMP/JPEG via codecs) ->
    integer grayscale -> 8x8 nearest-neighbor downsample -> bit k set iff
    pixel_k * 64 > sum(pixels) (the strict-integer form of 'above the
    mean' — no FP mean, no rounding mode). Returned as two 32-bit halves
    so the 64-bit hash never touches the sign bit."""
    import numpy as np

    from kadiyadb_spark.functions import codecs

    img = codecs.decode_image(payload)
    # integer grayscale: floor mean of channels (uint16 sum stays exact)
    gray = img.astype("uint32").sum(axis=2) // img.shape[2]
    small = codecs.resize_nearest(gray[:, :, None].astype("uint8"), 8, 8)[:, :, 0]
    flat = small.astype("int64").reshape(-1)
    tot = int(flat.sum())
    bits = (flat * 64 > tot).astype("int64")
    lo = int((bits[:32] << np.arange(32, dtype="int64")).sum())
    hi = int((bits[32:] << np.arange(32, dtype="int64")).sum())
    return {"ahash_lo": lo, "ahash_hi": hi}


def image_ahash(
    media: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    on_error: str = "raise",
) -> DataFrame:
    """Perceptual average-hash per image asset — the content-identity key
    for IMAGE dedup that byte-md5 cannot be: the same pixels re-encoded
    (PNG <-> BMP, different compressors) hash identically, and uniform
    brightness shifts cancel (every pixel moves WITH the mean) — both
    pytest-pinned. Group on (ahash_lo, ahash_hi) for exact perceptual
    dup groups; near-dups via hamming distance
    bit_count(xor(lo)) + bit_count(xor(hi)) with SimHash-style chunk
    blocking (dedup.simhash_near_duplicates' device).

    Map-only Arrow kernel over the shared skip loop (corrupt payloads
    drop under ``on_error='skip'``, the crawl posture); emits two 32-bit
    halves so the 64-bit hash stays sign-free in any engine."""
    src = media.select(
        F.col(id_col).alias("asset_id"), F.col(payload_col).alias("payload")
    )
    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType()),
            T.StructField("ahash_lo", T.LongType()),
            T.StructField("ahash_hi", T.LongType()),
        ]
    )
    return _skip_kernel(src, _ahash_kernel, schema, on_error).withColumnRenamed(
        "asset_id", id_col
    )
