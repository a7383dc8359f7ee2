"""Real-codec tests: pure-stdlib/numpy PNG/BMP/WAV decoding (codecs.py) and
the multimodal fake=False kernels built on it.

Independence of the checks: the PNG all-filters test encodes with a
test-side FORWARD filter implementation (spec 9.2) so encoder and decoder
are two separate readings of the published spec; the WAV test encodes with
the stdlib ``wave`` module — an implementation we didn't write at all."""

import io
import struct
import wave
import zlib

import numpy as np
import pytest
from pyspark.sql import Row

from kadiyadb_spark.functions import codecs as C
from kadiyadb_spark.functions import multimodal as M


def _img(h, w, ch, seed=0):
    # deterministic pseudo-random pixels without RNG state
    i = np.arange(h * w * ch, dtype=np.int64) + seed
    return ((i * 2654435761) % 251).astype(np.uint8).reshape(h, w, ch)


# -- PNG ----------------------------------------------------------------------


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(ch):
    img = _img(13, 7, ch, seed=ch)
    out = C.decode_png(C.encode_png(img))
    assert out.shape == (13, 7, ch)
    assert (out == img).all()


def _forward_filter(img: np.ndarray, ftype: int) -> bytes:
    """Test-side PNG forward filter (spec 9.2) — independent of the decoder's
    inverse. Produces the filtered scanline stream for one filter type."""
    h, w, ch = img.shape
    raw = img.reshape(h, w * ch).astype(np.int32)
    out = bytearray()
    prior = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        cur = raw[y]
        left = np.concatenate([np.zeros(ch, dtype=np.int32), cur[:-ch]])
        pleft = np.concatenate([np.zeros(ch, dtype=np.int32), prior[:-ch]])
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prior
        elif ftype == 3:
            filt = cur - (left + prior) // 2
        else:  # paeth
            p = left + prior - pleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prior), np.abs(p - pleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, pleft))
            filt = cur - pred
        out.append(ftype)
        out.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prior = cur
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decodes_every_scanline_filter(ftype):
    """Each of the five spec filters, forward-applied by an independent
    test-side implementation, must invert to the original pixels."""
    img = _img(9, 11, 3, seed=ftype + 10)
    ihdr = struct.pack(">IIBBBBB", 11, 9, 8, 2, 0, 0, 0)
    png = (
        C.PNG_SIG
        + C._png_chunk(b"IHDR", ihdr)
        + C._png_chunk(b"IDAT", zlib.compress(_forward_filter(img, ftype)))
        + C._png_chunk(b"IEND", b"")
    )
    assert (C.decode_png(png) == img).all()


def test_png_rejects_unsupported():
    with pytest.raises(ValueError, match="signature"):
        C.decode_png(b"JFIF not a png")
    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    png = C.PNG_SIG + C._png_chunk(b"IHDR", ihdr) + C._png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="bit depth"):
        C.decode_png(png)
    # interlaced
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    png = C.PNG_SIG + C._png_chunk(b"IHDR", ihdr) + C._png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlaced"):
        C.decode_png(png)


# -- BMP ----------------------------------------------------------------------


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5])  # every row-padding phase
def test_bmp_roundtrip_row_padding(w):
    img = _img(4, w, 3, seed=w)
    assert (C.decode_bmp(C.encode_bmp(img)) == img).all()


def test_bmp_top_down_negative_height():
    """Negative biHeight stores rows top-down (no flip)."""
    img = _img(3, 2, 3, seed=99)
    b = bytearray(C.encode_bmp(img[::-1]))  # encoder writes bottom-up of the flip
    b[22:26] = struct.pack("<i", -3)  # declare top-down
    assert (C.decode_bmp(bytes(b)) == img[::-1][::-1]).all()  # == original rows as stored
    # top-down decode must differ from the bottom-up reading of the same body
    assert not (C.decode_bmp(bytes(b)) == C.decode_bmp(C.encode_bmp(img[::-1]))).all()


def test_bmp_rejects_unsupported():
    with pytest.raises(ValueError, match="signature"):
        C.decode_bmp(b"PNG nope")


# -- WAV ----------------------------------------------------------------------


def test_wav_roundtrip_16bit_stereo():
    n = 50
    samples = np.stack(
        [np.arange(-n, n, 2, dtype=np.int16) * 100, np.arange(n, dtype=np.int16) * -7], axis=1
    )
    out, rate = C.decode_wav(C.encode_wav(samples, rate=22050, bits=16))
    assert rate == 22050 and out.shape == (n, 2) and (out == samples).all()


def test_wav_roundtrip_8bit_mono():
    samples = (np.arange(100, dtype=np.int16) % 200) - 100
    out, rate = C.decode_wav(C.encode_wav(samples, rate=8000, bits=8))
    assert rate == 8000 and (out[:, 0] == samples).all()


def test_wav_decodes_stdlib_wave_output():
    """Cross-check against an encoder we didn't write: python's stdlib
    ``wave`` module."""
    samples = (np.sin(np.arange(200) / 7) * 12000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(samples.tobytes())
    out, rate = C.decode_wav(buf.getvalue())
    assert rate == 16000 and (out[:, 0] == samples).all()


def test_wav_rejects_non_pcm():
    b = bytearray(C.encode_wav(np.zeros(4, dtype=np.int16)))
    b[20:22] = struct.pack("<H", 3)  # IEEE float format tag
    with pytest.raises(ValueError, match="only PCM"):
        C.decode_wav(bytes(b))


def test_resize_nearest_known_grid():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    out = C.resize_nearest(img, 2, 2)
    assert out[:, :, 0].tolist() == [[0, 2], [8, 10]]


# -- multimodal fake=False (Spark side) ----------------------------------------


def test_decode_images_real_png_bmp_and_skip(spark):
    png_img, bmp_img = _img(6, 5, 3, seed=1), _img(3, 8, 3, seed=2)
    rows = [
        Row(asset_id=1, media_type="image", payload=bytearray(C.encode_png(png_img)), n_bytes=0),
        Row(asset_id=2, media_type="image", payload=bytearray(C.encode_bmp(bmp_img)), n_bytes=0),
        # JPEG is a REAL codec since r8 — this payload sniffs as jpeg but is
        # corrupt, so it exercises the corrupt-body skip path instead
        Row(asset_id=3, media_type="image", payload=bytearray(b"\xff\xd8\xffJPEG..."), n_bytes=0),
    ]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    got = {r.asset_id: r for r in
           M.decode_images(media, fake=False, on_error="skip").collect()}
    assert set(got) == {1, 2}  # the corrupt-JPEG payload skipped
    assert (got[1].width, got[1].height) == (5, 6)
    assert got[1].byte_sum_mod == int(png_img.sum(dtype="int64") % 1_000_003)
    assert (got[2].width, got[2].height) == (8, 3)
    assert got[2].byte_sum_mod == int(bmp_img.sum(dtype="int64") % 1_000_003)
    with pytest.raises(Exception, match="(?i)jpeg"):
        M.decode_images(media, fake=False, on_error="raise").collect()


def test_resize_images_real_checksum(spark):
    img = _img(10, 10, 3, seed=5)
    media = spark.createDataFrame(
        [Row(asset_id=7, media_type="image", payload=bytearray(C.encode_png(img)), n_bytes=0)],
        schema=M.MEDIA_SCHEMA,
    )
    got = M.resize_images(media, out_w=4, out_h=4, fake=False).collect()[0]
    want = int(C.resize_nearest(img, 4, 4).sum(dtype="int64") % 1_000_003)
    assert (got.out_w, got.out_h, got.pix_checksum) == (4, 4, want)


def test_audio_windows_real_wav(spark):
    samples = ((np.arange(96, dtype=np.int64) * 37) % 257 - 128).astype(np.int16)
    payload = C.encode_wav(samples, rate=16000, bits=16)
    media = spark.createDataFrame(
        [Row(asset_id=9, media_type="audio", payload=bytearray(payload), n_bytes=0)],
        schema=M.MEDIA_SCHEMA,
    )
    got = sorted(
        M.audio_windows(media, window=32, stride=32, fake=False).collect(),
        key=lambda r: r.win_idx,
    )
    assert len(got) == 3
    for r in got:
        s = samples[r.win_idx * 32 : r.win_idx * 32 + 32].astype(np.int64)
        assert r.energy == int((s * s).sum())
        assert r.zero_crossings == int(((s[:-1] >= 0) != (s[1:] >= 0)).sum())


# -- hypothesis property coverage ----------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except Exception:  # pragma: no cover
    HAVE_HYP = False


if HAVE_HYP:

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        ch=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 10_000),
    )
    def test_png_roundtrip_property(h, w, ch, seed):
        img = _img(h, w, ch, seed=seed)
        assert (C.decode_png(C.encode_png(img)) == img).all()

    @settings(max_examples=40, deadline=None)
    @given(h=st.integers(1, 10), w=st.integers(1, 10), seed=st.integers(0, 10_000))
    def test_bmp_roundtrip_property(h, w, seed):
        img = _img(h, w, 3, seed=seed)
        assert (C.decode_bmp(C.encode_bmp(img)) == img).all()

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(1, 300),
        chans=st.integers(1, 3),
        bits=st.sampled_from([8, 16]),
        seed=st.integers(0, 10_000),
    )
    def test_wav_roundtrip_property(n, chans, bits, seed):
        lim = 127 if bits == 8 else 30000
        base = (np.arange(n * chans, dtype=np.int64) * 2654435761 + seed) % (2 * lim + 1) - lim
        samples = base.astype(np.int16).reshape(n, chans)
        out, rate = C.decode_wav(C.encode_wav(samples, rate=44100, bits=bits))
        assert rate == 44100 and (out == samples).all()


def test_corrupt_payloads_normalize_to_valueerror():
    """Every corrupt-payload failure mode surfaces as ValueError — the one
    type the skip path keys on (truncated header -> struct.error, bad zlib
    stream -> zlib.error, zero channels -> ZeroDivisionError: all wrapped)."""
    with pytest.raises(ValueError):
        C.decode_image(b"BM" + b"\x00" * 10)  # truncated BMP header
    good = C.encode_png(_img(3, 3, 3))
    # corrupt the IDAT payload bytes (keeps chunk framing, breaks zlib)
    bad = bytearray(good)
    idat = good.index(b"IDAT")
    bad[idat + 8] ^= 0xFF
    with pytest.raises(ValueError):
        C.decode_image(bytes(bad))
    wav = bytearray(C.encode_wav(np.zeros(4, dtype=np.int16)))
    wav[22:24] = struct.pack("<H", 0)  # channels = 0
    with pytest.raises(ValueError, match="channels"):
        C.decode_audio(bytes(wav))
    with pytest.raises(ValueError, match="undecodable"):
        C.decode_audio(b"\xff\xfbMP3 frames")


def test_skip_drops_corrupt_not_just_wrong_magic(spark):
    """on_error='skip' must survive a payload with VALID magic but corrupt
    body — the malformed files crawls actually produce."""
    truncated_bmp = b"BM" + b"\x00" * 8  # sniffs as bmp, dies in the header
    rows = [
        Row(asset_id=1, media_type="image", payload=bytearray(C.encode_png(_img(4, 4, 3))), n_bytes=0),
        Row(asset_id=2, media_type="image", payload=bytearray(truncated_bmp), n_bytes=0),
    ]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    assert [r.asset_id for r in M.decode_images(media, fake=False, on_error="skip").collect()] == [1]
    assert [r.asset_id for r in M.resize_images(media, fake=False, on_error="skip").collect()] == [1]
    # audio: one real WAV + one MP3-magic payload, skip keeps the WAV rows
    wav = C.encode_wav((np.arange(96) % 64).astype(np.int16), bits=16)
    arows = [
        Row(asset_id=5, media_type="audio", payload=bytearray(wav), n_bytes=0),
        Row(asset_id=6, media_type="audio", payload=bytearray(b"\xff\xfbJUNK" * 30), n_bytes=0),
    ]
    amedia = spark.createDataFrame(arows, schema=M.MEDIA_SCHEMA)
    got = M.audio_windows(amedia, window=32, stride=32, fake=False, on_error="skip").collect()
    assert {r.asset_id for r in got} == {5}
    with pytest.raises(Exception, match="undecodable"):
        M.audio_windows(amedia, window=32, stride=32, fake=False).collect()


# -- AVI (uncompressed video) --------------------------------------------------


def test_avi_roundtrip_multiframe():
    frames = _img(3 * 5 * 7 * 3, 1, 1, seed=11).reshape(3, 5, 7, 3)
    out, fps = C.decode_avi(C.encode_avi(frames, fps=24))
    assert fps == 24.0
    assert np.array_equal(out, frames)


def test_avi_row_padding_and_sniff():
    # width 7 -> stride 24 != 21: padding must be stripped on decode
    frames = _img(2 * 4 * 7 * 3, 1, 1, seed=3).reshape(2, 4, 7, 3)
    b = C.encode_avi(frames, fps=10)
    assert C.sniff(b) == "avi"
    out, _ = C.decode_avi(b)
    assert np.array_equal(out, frames)


def test_avi_rejects_compressed_and_corrupt():
    frames = _img(1 * 8 * 8 * 3, 1, 1, seed=1).reshape(1, 8, 8, 3)
    b = bytearray(C.encode_avi(frames))
    i = bytes(b).find(b"strf")
    # biCompression lives 16 bytes into the BITMAPINFOHEADER body
    b[i + 8 + 16 : i + 8 + 20] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compressed"):
        C.decode_avi(bytes(b))
    with pytest.raises(ValueError, match="undecodable video"):
        C.decode_video(b"RIFF\x00\x00\x00\x00WAVEjunk")
    with pytest.raises(ValueError):
        C.decode_video(C.encode_avi(frames)[:40])


def test_video_frames_sampling_and_skip(spark):
    frames = _img(6 * 4 * 4 * 3, 1, 1, seed=9).reshape(6, 4, 4, 3)
    good = C.encode_avi(frames, fps=5)
    rows = [
        Row(asset_id=1, media_type="video", payload=bytearray(good), n_bytes=0),
        Row(asset_id=2, media_type="video", payload=bytearray(good[:50]), n_bytes=0),
    ]
    media = spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)
    got = M.video_frames(media, every_n=2, on_error="skip").collect()
    assert {r.asset_id for r in got} == {1}
    assert sorted(r.frame_idx for r in got) == [0, 2, 4]  # every 2nd frame
    for r in got:
        i = r.frame_idx
        assert (r.width, r.height) == (4, 4) and r.fps == 5.0
        assert r.pix_sum_mod == int(frames[i].sum(dtype="int64") % 1_000_003)
    with pytest.raises(Exception, match="(?i)avi|truncated"):
        M.video_frames(media, every_n=1).collect()
    # max_frames caps the fan-out
    capped = M.video_frames(media, every_n=1, max_frames=2, on_error="skip").collect()
    assert sorted(r.frame_idx for r in capped) == [0, 1]


def test_image_ahash_reencode_and_brightness_invariance(spark):
    """The perceptual-dup contract: PNG and BMP encodings of the SAME
    pixels hash identically (byte md5 cannot do this); a uniform
    brightness shift cancels exactly (strict-integer mean form); a
    different image diverges; corrupt payloads drop under skip."""
    import numpy as np
    from pyspark.sql import Row

    from kadiyadb_spark.functions import codecs
    from kadiyadb_spark.functions.multimodal import image_ahash

    rng = np.arange(64 * 48 * 3, dtype=np.uint8).reshape(48, 64, 3)
    img = (rng * 7 % 200).astype(np.uint8)          # textured, no clipping room issues
    other = (255 - img[::-1, ::-1])                  # a genuinely different image
    rows = [
        Row(asset_id=0, payload=bytearray(codecs.encode_png(img))),
        Row(asset_id=1, payload=bytearray(codecs.encode_bmp(img))),
        Row(asset_id=2, payload=bytearray(codecs.encode_png((img + 10).astype(np.uint8)))),
        Row(asset_id=3, payload=bytearray(codecs.encode_png(other))),
        Row(asset_id=4, payload=bytearray(b"not an image at all")),
    ]
    df = spark.createDataFrame(rows)
    got = {
        r.asset_id: (r.ahash_lo, r.ahash_hi)
        for r in image_ahash(df, on_error="skip").collect()
    }
    assert 4 not in got and len(got) == 4
    assert got[0] == got[1]          # container-independent
    assert got[0] == got[2]          # brightness-shift invariant
    assert got[0] != got[3]
    h = got[0]
    dist = bin(h[0] ^ got[3][0]).count("1") + bin(h[1] ^ got[3][1]).count("1")
    assert dist > 8                   # far apart, not a near-tie


# ---------------------------------------------------------------- GIF


def test_gif_hand_built_spec_vector():
    """Decode a GIF assembled byte-by-byte from the spec (not our encoder):
    2x2, 4-entry global table, 2-bit LZW. Pins the wire format
    independently of the encoder."""
    # pixels (row major): red, green, blue, red -> indices 0 1 2 0
    # LZW min code size 2: CLEAR=4 EOI=5, width starts at 3
    # codes: 4(clear) 0 1 2 0 5(eoi) -> LSB-first bit packing
    codes = [(4, 3), (0, 3), (1, 3), (2, 3), (0, 4), (5, 4)]
    # width widens to 4 after the decoder's table reaches 8 entries:
    # roots 0..3 + clear/eoi = 6, +1 after '1', +1 after '2' -> 8, so the
    # codes for the final pixel and EOI are 4 bits wide
    acc = nbits = 0
    data = bytearray()
    for code, width in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    gif = (
        b"GIF89a"
        + struct.pack("<HHBBB", 2, 2, 0x81, 0, 0)  # GCT, 4 entries (2^(1+1))
        + bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])  # R G B filler
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + b"\x00"
        + bytes([2, len(data)]) + bytes(data) + b"\x00\x3b"
    )
    img = C.decode_gif(gif)
    exp = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 0, 0]]], np.uint8
    )
    assert (img == exp).all()
    assert C.sniff(gif) == "gif"
    assert (C.decode_image(gif) == exp).all()


@pytest.mark.parametrize("inter", [False, True])
def test_gif_roundtrip_shapes_and_palettes(inter):
    rng = np.random.default_rng(11)
    for h, w, ncol in [(1, 1, 1), (2, 3, 2), (13, 5, 7), (16, 16, 256), (33, 7, 100)]:
        pal = np.unique(rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8), axis=0)
        img = pal[rng.integers(0, pal.shape[0], size=(h, w))]
        out = C.decode_gif(C.encode_gif(img, interlace=inter))
        assert out.shape == img.shape and (out == img).all()


def test_gif_lzw_table_overflow_clear_and_compression():
    """128x128 uniform noise forces table growth to 4096 + mid-stream
    CLEAR; a flat image must compress massively (real LZW, not the
    uncompressed-literal trick)."""
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, size=(128, 128), dtype=np.uint8)
    img = np.stack([g] * 3, axis=-1)
    assert (C.decode_gif(C.encode_gif(img)) == img).all()
    flat = np.full((64, 64, 3), 7, np.uint8)
    b = C.encode_gif(flat)
    assert (C.decode_gif(b) == flat).all()
    assert len(b) < 200  # 12288 raw pixels -> ~100 bytes


def test_gif_rejects_corrupt_and_over_palette():
    img = np.array([[[255, 0, 0]], [[0, 255, 0]]], np.uint8)
    b = C.encode_gif(img)
    for cut in (5, 11, len(b) - 2):
        with pytest.raises(ValueError):
            C.decode_gif(b[:cut])
    with pytest.raises(ValueError):
        C.decode_gif(b"NOTAGIF00000")
    with pytest.raises(ValueError):  # >256 distinct colors cannot be GIF-encoded
        rng = np.random.default_rng(0)
        C.encode_gif(rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8))


def test_gif_decoder_mutation_fuzz_never_leaks():
    """Adversarial-byte robustness (the skip contract depends on it): any
    single-byte mutation or truncation of a valid GIF either still decodes
    to SOME correctly-shaped image or raises ValueError — never IndexError/
    struct.error/numpy exceptions leaking out of decode_gif."""
    rng = np.random.default_rng(42)
    pal = np.unique(rng.integers(0, 256, size=(9, 3), dtype=np.uint8), axis=0)
    img = pal[rng.integers(0, pal.shape[0], size=(11, 7))]
    good = bytearray(C.encode_gif(img, interlace=True))
    for trial in range(400):
        b = bytearray(good)
        mode = trial % 3
        if mode == 0:
            b[rng.integers(0, len(b))] ^= int(rng.integers(1, 256))
        elif mode == 1:
            b = b[: rng.integers(0, len(b))]
        else:
            for _ in range(4):
                b[rng.integers(0, len(b))] = int(rng.integers(0, 256))
        try:
            out = C.decode_gif(bytes(b))
            assert out.ndim == 3 and out.shape[2] == 3 and out.dtype == np.uint8
        except ValueError:
            pass


def test_decompression_bomb_guards():
    """A kilobyte of adversarial bytes must never demand gigabytes: forged
    header dimensions hit MAX_PIXELS before any allocation, and a PNG
    whose zlib stream inflates past the header-implied size is rejected
    by the BOUNDED inflate (never fully decompressed)."""
    # PNG: forged IHDR dims over the cap
    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, 0)
    png = C.PNG_SIG + C._png_chunk(b"IHDR", ihdr) + C._png_chunk(b"IDAT", b"x")
    with pytest.raises(ValueError, match="pixel decoder limit"):
        C.decode_png(png + C._png_chunk(b"IEND", b""))
    # PNG: sane dims, but the stream is a bomb (inflates way past expected)
    bomb = zlib.compress(b"\x00" * 50_000_000, 9)  # ~50 KB -> 50 MB
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    png = (
        C.PNG_SIG
        + C._png_chunk(b"IHDR", ihdr)
        + C._png_chunk(b"IDAT", bomb)
        + C._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="size mismatch"):
        C.decode_png(png)
    # GIF: forged logical-screen + descriptor dims over the cap
    gif = (
        b"GIF89a" + struct.pack("<HHBBB", 60000, 60000, 0x80, 0, 0)
        + bytes(6)  # 2-entry GCT
        + b"\x2c" + struct.pack("<HHHH", 0, 0, 60000, 60000) + b"\x00"
    )
    with pytest.raises(ValueError, match="pixel decoder limit"):
        C.decode_gif(gif)
    # JPEG: forged SOF0 dims over the cap
    from kadiyadb_spark.functions import jpeg as J

    sof = struct.pack(">BHHB", 8, 60000, 60000, 1) + bytes([1, 0x11, 0])
    jpg = b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    with pytest.raises(ValueError, match="pixel decoder limit"):
        J.decode_jpeg(jpg + b"\xff\xd9")


def test_gif_frame_count_bomb_guard(monkeypatch):
    """decode_gif_frames bounds TOTAL output (n_frames * W * H), not just
    the per-frame pixel count: each image block appends a full canvas
    copy, so a small payload with many tiny image blocks must raise once
    the cumulative output would pass MAX_PIXELS (ADVICE r09). The cap is
    shrunk via monkeypatch so the boundary is exercised cheaply."""
    frames = np.zeros((5, 4, 4, 3), dtype=np.uint8)
    frames[:, 0, 0, 0] = np.arange(5)  # distinct frames, tiny palette
    payload = C.encode_gif_frames(frames, fps=10)
    # 4x4 screen = 16 px/frame; cap at 4 frames' worth of output
    monkeypatch.setattr(C, "MAX_PIXELS", 4 * 16)
    with pytest.raises(ValueError, match="total decoder limit"):
        C.decode_gif_frames(payload)
    # exactly at the cap: 4 frames decode fine
    out, _ = C.decode_gif_frames(C.encode_gif_frames(frames[:4], fps=10))
    assert out.shape == (4, 4, 4, 3)


def test_gif_animation_roundtrip_and_video_dispatch():
    """Multi-frame GIF: encode_gif_frames -> decode_gif_frames identity
    (full-canvas frames), fps from the GCE delay, decode_video dispatch,
    and decode_gif (image contract) still returns frame 0."""
    rng = np.random.default_rng(5)
    pal = np.unique(rng.integers(0, 256, size=(30, 3), dtype=np.uint8), axis=0)
    frames = pal[rng.integers(0, pal.shape[0], size=(4, 9, 7))]
    b = C.encode_gif_frames(frames, fps=25)
    out, fps = C.decode_gif_frames(b)
    assert out.shape == frames.shape and (out == frames).all() and fps == 25.0
    out2, fps2 = C.decode_video(b)
    assert (out2 == frames).all() and fps2 == 25.0
    assert (C.decode_gif(b) == frames[0]).all()


def _gif_image_block(left, top, w, h, idx, gce=None):
    out = b""
    if gce is not None:
        disposal, trans = gce
        flags = (disposal << 2) | (1 if trans is not None else 0)
        out += (b"\x21\xf9\x04" + bytes([flags]) + struct.pack("<H", 10)
                + bytes([trans if trans is not None else 0]) + b"\x00")
    data = C._gif_lzw_encode(np.array(idx, dtype=np.uint8), 2)
    out += b"\x2c" + struct.pack("<HHHH", left, top, w, h) + b"\x00" + bytes([2])
    for i in range(0, len(data), 255):
        out += bytes([len(data[i : i + 255])]) + data[i : i + 255]
    return out + b"\x00"


def test_gif_animation_partial_frames_transparency_disposal():
    """The GIF89a animation model, hand-assembled: a partial frame
    composites at its (left, top) offset, a transparent index leaves the
    canvas visible, and disposal 2 restores the backdrop region after the
    frame (so frame 3 sees background, not frame 2's pixels)."""
    # screen 4x2, GCT [black, red, green, blue], background index 0
    hdr = b"GIF89a" + struct.pack("<HHBBB", 4, 2, 0x81, 0, 0) + bytes(
        [0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255]
    )
    gif = (
        hdr
        + _gif_image_block(0, 0, 4, 2, [1] * 8)                      # all red
        + _gif_image_block(1, 0, 2, 1, [2, 0], gce=(2, 0))           # green + transparent, dispose->bg
        + _gif_image_block(0, 1, 1, 1, [3])                          # blue bottom-left
        + b"\x3b"
    )
    fr, fps = C.decode_gif_frames(gif)
    assert fr.shape == (3, 2, 4, 3) and fps == 10.0
    assert (fr[0] == [255, 0, 0]).all()
    # frame 2: green composited at (0,1); transparent at (0,2) -> red below
    assert (fr[1][0, 1] == [0, 255, 0]).all()
    assert (fr[1][0, 2] == [255, 0, 0]).all()
    # frame 3: disposal 2 restored (0,1)-(0,2) to the BLACK background
    assert (fr[2][0, 1] == [0, 0, 0]).all() and (fr[2][0, 2] == [0, 0, 0]).all()
    assert (fr[2][1, 0] == [0, 0, 255]).all()
    assert (fr[2][0, 0] == [255, 0, 0]).all()  # untouched canvas persists


def test_public_decode_boundary_valueerror_only():
    """The skip contract at the PUBLIC boundary: mutations/truncations of
    every container type through decode_image / decode_audio /
    decode_video either decode or raise ValueError — nothing else leaks
    (struct.error, zlib.error, numpy exceptions, IndexError)."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 200, size=(6, 5, 3), dtype=np.uint8)
    pal = np.unique(img.reshape(-1, 3), axis=0)
    gif_img = pal[rng.integers(0, pal.shape[0], size=(6, 5))]
    payloads = {
        "image": [
            C.encode_png(img),
            C.encode_bmp(img),
            C.encode_gif(gif_img, interlace=True),
        ],
        "audio": [C.encode_wav(np.arange(-40, 40, dtype=np.int16), bits=16)],
        "video": [
            C.encode_avi(np.stack([img, img]), fps=10),
            C.encode_gif_frames(np.stack([gif_img, gif_img]), fps=10),
        ],
    }
    fns = {"image": C.decode_image, "audio": C.decode_audio, "video": C.decode_video}
    for kind, goods in payloads.items():
        fn = fns[kind]
        for good in goods:
            for trial in range(120):
                b = bytearray(good)
                if trial % 2:
                    b = b[: rng.integers(0, len(b))]
                else:
                    b[rng.integers(0, len(b))] ^= int(rng.integers(1, 256))
                try:
                    fn(bytes(b))
                except ValueError:
                    pass


def test_scene_cuts_golden_and_skip(spark):
    import numpy as np

    from kadiyadb_spark.functions import codecs
    from kadiyadb_spark.functions.multimodal import scene_cuts

    base = np.zeros((4, 4, 3), dtype=np.uint8)
    frames = np.stack([base, base + 3, base + 60, base + 61])
    gif = codecs.encode_gif_frames(frames, fps=10)
    media = spark.createDataFrame(
        [(1, "video", bytearray(gif), len(gif)), (2, "video", bytearray(b"junk"), 4)],
        "asset_id long, media_type string, payload binary, n_bytes long",
    )
    got = {
        (r["from_idx"], r["to_idx"]): (r["mad"], r["is_cut"])
        for r in scene_cuts(
            media.filter("asset_id = 1"), threshold=10.0
        ).collect()
    }
    assert got == {(0, 1): (3.0, 0), (1, 2): (57.0, 1), (2, 3): (1.0, 0)}
    # corrupt payload: raise by default, skip drops the asset
    import pytest as _pt

    with _pt.raises(Exception):
        scene_cuts(media, threshold=10.0).collect()
    ok = scene_cuts(media, threshold=10.0, on_error="skip").collect()
    assert {r["asset_id"] for r in ok} == {1}
    # every_n sampling: transitions between SAMPLED frames
    s2 = {
        (r["from_idx"], r["to_idx"]): r["mad"]
        for r in scene_cuts(
            media.filter("asset_id = 1"), threshold=10.0, every_n=2
        ).collect()
    }
    assert s2 == {(0, 2): 60.0}
    with _pt.raises(ValueError):
        scene_cuts(media, threshold=1.0, every_n=0)
