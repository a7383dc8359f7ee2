"""Baseline-JPEG codec tests (functions/jpeg.py, ITU-T T.81).

Independence of the checks: the flat-block tests verify against the CLOSED
FORM of the DCT (a constant block has exactly one nonzero coefficient, so
the quality-100 roundtrip must be bit-exact), not against the encoder's own
output values; lossy roundtrips assert spec-level error bounds, and the
dispatcher/skip contracts mirror the other real codecs."""

import struct

import numpy as np
import pytest
from pyspark.sql import Row

from kadiyadb_spark.functions import codecs as C
from kadiyadb_spark.functions import multimodal as M
from kadiyadb_spark.functions.jpeg import decode_jpeg, encode_jpeg

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False


def _img(h, w, ch, seed=0):
    i = np.arange(h * w * ch, dtype=np.int64) + seed
    return ((i * 2654435761) % 251).astype(np.uint8).reshape(h, w, ch)


def test_flat_blocks_quality100_bit_exact_gray():
    """Constant 8x8 blocks have a single DC coefficient; with all-ones
    quantizers (q=100) the roundtrip is exactly lossless."""
    blocks = np.array([[3, 130], [255, 77], [0, 201]], dtype=np.uint8)
    img = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    out = decode_jpeg(encode_jpeg(img, quality=100))
    assert out.shape == (24, 16, 1)
    assert np.array_equal(out[:, :, 0], img)


def test_flat_blocks_quality100_bit_exact_420_gray_equal():
    """16x16 flat blocks survive 4:2:0 chroma averaging exactly when all
    three channels are equal (chroma planes are constant 128)."""
    blocks = np.array([[10, 200]], dtype=np.uint8)
    g = np.repeat(np.repeat(blocks, 16, axis=0), 16, axis=1)
    img = np.stack([g, g, g], axis=-1)
    out = decode_jpeg(encode_jpeg(img, quality=100, subsampling="420"))
    assert np.array_equal(out, img)


@pytest.mark.parametrize("sub", ["444", "420"])
def test_smooth_gradient_bounded_error(sub):
    h, w = 33, 47
    img = np.zeros((h, w, 3), np.uint8)
    for i in range(3):
        img[:, :, i] = np.clip(np.add.outer(np.arange(h) * 2, np.arange(w)) + 40 * i, 0, 255)
    out = decode_jpeg(encode_jpeg(img, quality=92, subsampling=sub))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_restart_intervals_do_not_change_pixels():
    img = _img(24, 40, 3, seed=5)
    base = decode_jpeg(encode_jpeg(img, quality=95))
    dri = decode_jpeg(encode_jpeg(img, quality=95, restart_interval=3))
    assert np.array_equal(base, dri)
    dri420 = decode_jpeg(encode_jpeg(img, quality=95, subsampling="420", restart_interval=2))
    base420 = decode_jpeg(encode_jpeg(img, quality=95, subsampling="420"))
    assert np.array_equal(base420, dri420)


def test_non_multiple_of_8_dimensions():
    """Edge-replication padding must crop back to the exact (h, w)."""
    for h, w in [(1, 1), (7, 9), (17, 23)]:
        img = _img(h, w, 3, seed=h * 31 + w)
        out = decode_jpeg(encode_jpeg(img, quality=90))
        assert out.shape == (h, w, 3)


def test_lossy_error_bounded_random():
    """Worst-case random noise at q=95 stays within a sane per-pixel bound
    (quantizer steps at q=95 are <= 6 for luma low frequencies)."""
    img = _img(16, 16, 1, seed=9)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 8


def test_sniff_and_dispatcher():
    b = encode_jpeg(_img(8, 8, 3, seed=1), quality=90)
    assert C.sniff(b) == "jpeg"
    assert C.decode_image(b).shape == (8, 8, 3)


def test_rejects_progressive_and_corrupt():
    b = bytearray(encode_jpeg(_img(8, 8, 1), quality=90))
    # rewrite the SOF0 marker to SOF2 (progressive): honest refusal
    i = bytes(b).find(b"\xff\xc0")
    b[i + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(b))
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0junk")
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg at all")
    # truncated entropy data normalizes to ValueError through the dispatcher
    full = encode_jpeg(_img(16, 16, 3), quality=90)
    with pytest.raises(ValueError):
        C.decode_image(full[: len(full) // 2])


def test_decode_images_real_jpeg_and_skip(spark):
    good = encode_jpeg(_img(8, 8, 3, seed=2), quality=100)
    corrupt = good[:40]  # sniffs as jpeg, dies mid-parse
    rows = [
        Row(asset_id=1, media_type="image", payload=bytearray(good), n_bytes=0),
        Row(asset_id=2, media_type="image", payload=bytearray(corrupt), n_bytes=0),
    ]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    got = M.decode_images(media, fake=False, on_error="skip").collect()
    assert [r.asset_id for r in got] == [1]
    assert got[0].width == 8 and got[0].height == 8
    with pytest.raises(Exception, match="(?i)jpeg|corrupt"):
        M.decode_images(media, fake=False).collect()


if HAVE_HYP:

    @settings(max_examples=25, deadline=None)
    @given(
        bh=st.integers(1, 3),
        bw=st.integers(1, 3),
        seed=st.integers(0, 10_000),
    )
    def test_flat_block_roundtrip_property(bh, bw, seed):
        vals = ((np.arange(bh * bw, dtype=np.int64) * 2654435761 + seed) % 256).astype(np.uint8)
        img = np.repeat(np.repeat(vals.reshape(bh, bw), 8, axis=0), 8, axis=1)
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert np.array_equal(out[:, :, 0], img)

    @settings(max_examples=20, deadline=None)
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        ch=st.sampled_from([1, 3]),
        seed=st.integers(0, 10_000),
    )
    def test_shape_preserved_property(h, w, ch, seed):
        img = _img(h, w, ch, seed=seed)
        out = decode_jpeg(encode_jpeg(img, quality=85))
        assert out.shape == (h, w, ch)


def test_decode_stats_mixed_corpus(spark):
    """Per-format census: decodable PNG/JPEG/WAV count as decoded, raw
    text bytes as unknown/failed; counts fold inside Arrow batches."""
    from kadiyadb_spark.functions import multimodal as MM

    png = C.encode_png(_img(8, 8, 3, seed=1))
    jpg = encode_jpeg(_img(16, 16, 1, seed=2), quality=90)
    wav = C.encode_wav((np.arange(64) % 32).astype(np.int16), bits=16)
    corrupt_jpg = jpg[:30]
    rows = [
        Row(asset_id=1, media_type="image", payload=bytearray(png), n_bytes=0),
        Row(asset_id=2, media_type="image", payload=bytearray(jpg), n_bytes=0),
        Row(asset_id=3, media_type="audio", payload=bytearray(wav), n_bytes=0),
        Row(asset_id=4, media_type="image", payload=bytearray(b"plain text"), n_bytes=0),
        Row(asset_id=5, media_type="image", payload=bytearray(corrupt_jpg), n_bytes=0),
    ]
    media = spark.createDataFrame(rows, schema=MM.MEDIA_SCHEMA)
    got = {(r.media_type, r.format): r for r in MM.decode_stats(media, fake=False).collect()}
    assert got[("image", "png")].n_decoded == 1
    jpeg_row = got[("image", "jpeg")]
    assert (jpeg_row.n_assets, jpeg_row.n_decoded, jpeg_row.n_failed) == (2, 1, 1)
    assert got[("audio", "wav")].n_decoded == 1
    unk = got[("image", "unknown")]
    assert (unk.n_assets, unk.n_decoded, unk.n_failed) == (1, 0, 1)
    assert unk.total_bytes == len(b"plain text")
    # fake=True: sniffed formats count as decoded without running codecs
    fast = {(r.media_type, r.format): r for r in MM.decode_stats(media, fake=True).collect()}
    assert fast[("image", "jpeg")].n_decoded == 2  # corrupt one not attempted
    assert fast[("image", "unknown")].n_failed == 1
