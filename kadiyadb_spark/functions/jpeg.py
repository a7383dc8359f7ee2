"""Baseline JPEG (ITU-T T.81, sequential DCT, Huffman, 8-bit) in pure
stdlib/numpy — the missing majority-class decoder for real web crawls
(VERDICT r07 gap #1): PNG/BMP/WAV covered the uncompressed formats, but the
images a crawl actually yields are overwhelmingly JPEG.

Decoder coverage (ValueError on anything else — honest refusal, never a
fake answer, same contract as codecs.decode_image):
- baseline sequential DCT (SOF0), 8-bit samples
- 1 component (grayscale) or 3 components (JFIF YCbCr)
- luma sampling factors (1,1)/(2,1)/(1,2)/(2,2) with (1,1) chroma
  (covers 4:4:4, 4:2:2, 4:4:0 and the ubiquitous 4:2:0)
- restart intervals (DRI / RSTn)
Progressive (SOF2), arithmetic coding, 12-bit, and CMYK refuse loudly.

Encoder: grayscale or 4:4:4 YCbCr, Annex-K quantization tables under the
standard libjpeg quality scaling, Annex-K Huffman tables. At quality=100
every quantizer step is 1, so an image whose 8x8 blocks are CONSTANT
round-trips bit-exactly (a flat block has only a DC coefficient, which
the float DCT produces exactly) — the property the oracle-gated
multimodal_jpeg_real entry is built on.

Scale shape: decode cost is per-payload Python+numpy inside Arrow
``mapInPandas`` batches (multimodal.py) — embarrassingly parallel across a
corpus; the executor holds one batch of payloads at a time. The entropy
decode is a per-symbol Python loop (Huffman is inherently sequential
within one scan), sized for crawl thumbnails/assets, not for decoding a
handful of giant images on one core.

Reference semantics: ITU-T T.81 §F (decoder), Annex K (tables). Public
spec, implemented from scratch.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag index: zz order -> (row, col), as a flat gather index
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.1/K.2 base quantization tables (natural row-major order)
_QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# Annex K.3 Huffman tables: (bits[1..16] counts, values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II matrix A: F = A f A^T, f = A^T F A."""
    a = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


_A = _dct_matrix()


def _canonical_codes(bits: list[int], values: list[int]):
    """T.81 C.2: canonical (length -> codes) assignment."""
    codes = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes.append((length, code, values[k]))
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Length-bucketed canonical Huffman lookup (T.81 F.2.2.3 DECODE)."""

    def __init__(self, bits: list[int], values: list[int]):
        # mincode/maxcode per length + value offset — O(1) per length step
        self.min = [0] * 17
        self.max = [-1] * 17
        self.valptr = [0] * 17
        self.values = values
        code = 0
        k = 0
        for length in range(1, 17):
            n = bits[length - 1]
            if n:
                self.valptr[length] = k
                self.min[length] = code
                code += n
                k += n
                self.max[length] = code - 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = br.bit()
        length = 1
        while code > self.max[length] or self.max[length] < self.min[length]:
            length += 1
            if length > 16:
                raise ValueError("corrupt JPEG: invalid Huffman code")
            code = (code << 1) | br.bit()
        return self.values[self.valptr[length] + (code - self.min[length])]


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment; 0xFF00 stuffing
    removed and RSTn markers surfaced via ``restart()``."""

    def __init__(self, data: bytes, start: int):
        self.d = data
        self.pos = start
        self.buf = 0
        self.n = 0

    def _fill(self):
        if self.pos >= len(self.d):
            raise ValueError("corrupt JPEG: entropy data exhausted")
        b = self.d[self.pos]
        if b == 0xFF:
            nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise ValueError("corrupt JPEG: hit restart marker mid-symbol")
            else:
                # EOI or next marker: pad with 1-bits per spec F.2.2.5 —
                # a well-formed scan never *consumes* these into a symbol
                self.buf = (self.buf << 8) | 0xFF
                self.n += 8
                return
        else:
            self.pos += 1
        self.buf = (self.buf << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.buf >> self.n) & 1

    def receive(self, s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume one RSTn marker (F.2.1.3.1)."""
        self.buf = 0
        self.n = 0
        if (
            self.pos + 1 < len(self.d)
            and self.d[self.pos] == 0xFF
            and 0xD0 <= self.d[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("corrupt JPEG: expected restart marker")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s-bit magnitude to signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG -> (h, w, ch) uint8 (ch = 1 grayscale, 3 RGB)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None  # (h, w, comps) with comps = [(cid, hs, vs, tq)]
    restart_interval = 0
    scan = None
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG: marker expected")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte (B.1.1.2): FFs may pad before a marker
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                    p += 64
                elif pq == 1:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int64)
                    p += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                if tbl.size != 64:
                    raise ValueError("truncated DQT table")
                nat = np.zeros(64, dtype=np.int64)
                nat[_ZZ] = tbl  # de-zigzag into natural order
                qt[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT table")
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {nc} (1 or 3)")
            # decompression-bomb guard: the float64 planes are allocated
            # from these HEADER fields — a forged 65535x65535 SOF0 in a
            # kilobyte payload would demand ~100GB before any scan data is
            # read. The JPEG cap is MAX_PIXELS >> 3 (2^23 px, 8 MP): this
            # decoder works in float64 planes (8 B/px/comp) plus upsampling
            # intermediates, so the shared uint8-sized MAX_PIXELS would
            # still admit ~1.6 GB allocations (ADVICE r09); 8 MP bounds the
            # worst case near ~200 MB, matching the guard's stated intent.
            from kadiyadb_spark.functions.codecs import MAX_PIXELS

            max_jpeg_pixels = MAX_PIXELS >> 3
            if w * h > max_jpeg_pixels:
                raise ValueError(
                    f"JPEG {w}x{h} exceeds the {max_jpeg_pixels}-pixel decoder limit"
                )
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding process (SOF{marker - 0xC0}); baseline SOF0 only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            smap = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i : 3 + 2 * i]
                smap.append((cs, tt >> 4, tt & 0xF))
            scan = (smap, pos + seglen)
            break
        pos += seglen
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF0/SOS")
    h, w, comps = frame
    if h == 0 or w == 0:
        raise ValueError("corrupt JPEG: zero dimensions")
    smap, data_start = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if len(comps) == 3:
        for cid, hs, vs, _ in comps[1:]:
            if (hs, vs) != (1, 1):
                raise ValueError("unsupported chroma sampling (chroma must be 1x1)")
        if (hmax, vmax) not in ((1, 1), (2, 1), (1, 2), (2, 2)):
            raise ValueError(f"unsupported luma sampling {hmax}x{vmax}")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component plane dimensions (padded to whole MCUs)
    planes = []
    tabs = []
    for cid, hs, vs, tq in comps:
        if tq not in qt:
            raise ValueError(f"JPEG references missing DQT {tq}")
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))
        st = next((t for t in smap if t[0] == cid), None)
        if st is None:
            raise ValueError("SOS/SOF component mismatch")
        _, td, ta = st
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("JPEG references missing DHT")
        tabs.append((huff[(0, td)], huff[(1, ta)], qt[tq]))
    br = _BitReader(payload, data_start)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.restart()
                pred = [0] * len(comps)
            for ci, (cid, hs, vs, _tq) in enumerate(comps):
                dct, act, q = tabs[ci]
                for by in range(vs):
                    for bx in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        s = dct.decode(br)
                        if s > 15:
                            raise ValueError("corrupt JPEG: DC category > 15")
                        diff = _extend(br.receive(s), s)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = act.decode(br)
                            r, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC index overflow")
                            zz[k] = _extend(br.receive(size), size)
                            k += 1
                        coef = np.zeros(64, dtype=np.int64)
                        coef[_ZZ] = zz
                        block = coef.reshape(8, 8) * q
                        pix = _A.T @ block.astype(np.float64) @ _A
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    out_planes = []
    for ci, (cid, hs, vs, _tq) in enumerate(comps):
        p = np.clip(np.round(planes[ci] + 128.0), 0, 255).astype(np.uint8)
        # upsample to full resolution by replication, crop to (h, w)
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return out_planes[0][:, :, None]
    y, cb, cr = (pl.astype(np.float64) for pl in out_planes)
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# -- encoder -------------------------------------------------------------------


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex-K base tables (public formula:
    scale = 5000/q below 50 else 200-2q; q=100 -> every step clamps to 1)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    def scl(base: np.ndarray) -> np.ndarray:
        t = (base * scale + 50) // 100
        return np.clip(t, 1, 255).astype(np.int64)
    return scl(_QT_LUMA).reshape(8, 8), scl(_QT_CHROMA).reshape(8, 8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.buf >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-pad per spec


def _mag_bits(v: int) -> tuple[int, int]:
    """(category s, s-bit code) for a signed coefficient (T.81 F.1.2.1)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    code = v if v > 0 else v + (1 << s) - 1
    return s, code


def _enc_tables(spec) -> dict[int, tuple[int, int]]:
    return {sym: (code, length) for length, code, sym in _canonical_codes(*spec)}


def _encode_blocks(bw, plane: np.ndarray, q: np.ndarray, dc_tab, ac_tab, pred: int) -> int:
    hh, ww = plane.shape
    for y0 in range(0, hh, 8):
        for x0 in range(0, ww, 8):
            f = plane[y0 : y0 + 8, x0 : x0 + 8].astype(np.float64) - 128.0
            coef = _A @ f @ _A.T
            qz = np.round(coef / q).astype(np.int64)
            zz = qz.reshape(-1)[_ZZ]
            s, code = _mag_bits(int(zz[0]) - pred)
            pred = int(zz[0])
            c, ln = dc_tab[s]
            bw.put(c, ln)
            if s:
                bw.put(code, s)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    if k > last_nz:
                        c, ln = ac_tab[0x00]  # EOB
                        bw.put(c, ln)
                        break
                    run += 1
                    if run == 16:
                        c, ln = ac_tab[0xF0]  # ZRL
                        bw.put(c, ln)
                        run = 0
                    continue
                s, code = _mag_bits(v)
                c, ln = ac_tab[(run << 4) | s]
                bw.put(c, ln)
                bw.put(code, s)
                run = 0
    return pred


def _dht_segment(tc: int, th: int, spec) -> bytes:
    bits, vals = spec
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(v) for v in table.reshape(-1)[_ZZ])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def _pad_edge(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    """Edge-replicate a plane to (ph, pw) — the standard ringing-free pad."""
    h, w = p.shape
    pp = np.empty((ph, pw), dtype=np.float64)
    pp[:h, :w] = p
    pp[h:, :w] = p[h - 1 : h, :]
    pp[:, w:] = pp[:, w - 1 : w]
    return pp


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """(h, w) / (h, w, 1) grayscale or (h, w, 3) RGB uint8 -> baseline JPEG
    (Annex-K Huffman tables). ``subsampling``: '444' (one block per
    component per MCU) or '420' (2x2 luma sampling, chroma averaged 2x2 —
    what real crawls overwhelmingly contain). ``restart_interval`` > 0
    emits DRI + RSTn every N MCUs (byte-aligned, predictors reset), the
    resync structure the decoder must honor. quality=100 gives all-ones
    quantizers: flat 8x8 (444) / 16x16 (420 gray-equal) blocks round-trip
    exactly (see module docstring)."""
    a = np.asarray(img, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    if ch not in (1, 3):
        raise ValueError("JPEG encoder takes 1 (gray) or 3 (RGB) channels")
    if h == 0 or w == 0:
        raise ValueError("cannot encode an empty image")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub420 = subsampling == "420" and ch == 3
    qy, qc = _quality_tables(quality)
    if ch == 3:
        rf, gf, bf = (a[:, :, i].astype(np.float64) for i in range(3))
        yy = 0.299 * rf + 0.587 * gf + 0.114 * bf
        cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf + 128.0
        cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf + 128.0
        planes = [np.clip(np.round(p), 0, 255) for p in (yy, cb, cr)]
    else:
        planes = [a[:, :, 0].astype(np.float64)]
    mcu = 16 if sub420 else 8
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu
    if sub420:
        ypad = _pad_edge(planes[0], ph, pw)
        # chroma: 2x2 box average of the padded full-res plane
        def down(p):
            pp = _pad_edge(p, ph, pw)
            return np.round(
                (pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4.0
            )
        padded = [ypad, down(planes[1]), down(planes[2])]
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        padded = [_pad_edge(p, ph, pw) for p in planes]
        samp = [(1, 1)] * ch

    out = bytearray(b"\xff\xd8")  # SOI
    jfif = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    out += b"\xff\xe0" + struct.pack(">H", len(jfif) + 2) + jfif
    out += _dqt_segment(0, qy)
    if ch == 3:
        out += _dqt_segment(1, qc)
    sof = struct.pack(">BHHB", 8, h, w, ch)
    for i in range(ch):
        hs, vs = samp[i]
        sof += bytes([i + 1, (hs << 4) | vs, 0 if i == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_LUMA)
    out += _dht_segment(1, 0, _AC_LUMA)
    if ch == 3:
        out += _dht_segment(0, 1, _DC_CHROMA)
        out += _dht_segment(1, 1, _AC_CHROMA)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ch])
    for i in range(ch):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    bw = _BitWriter()
    dcy, acy = _enc_tables(_DC_LUMA), _enc_tables(_AC_LUMA)
    dcc, acc = _enc_tables(_DC_CHROMA), _enc_tables(_AC_CHROMA)
    preds = [0] * ch
    mcu_count = 0
    rst = 0
    for my in range(ph // mcu):
        for mx in range(pw // mcu):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()  # byte-align with 1-padding
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * ch
            for ci in range(ch):
                dc_tab, ac_tab = (dcy, acy) if ci == 0 else (dcc, acc)
                q = qy if ci == 0 else qc
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_blocks(bw, blk, q, dc_tab, ac_tab, preds[ci])
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
