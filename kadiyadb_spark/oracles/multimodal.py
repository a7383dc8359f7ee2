"""DuckDB oracle SQL for the driver correctness gate — binary codec decode/resize/frame/audio census entries.

Split out of __spark_entry__.py (r09, VERDICT r08 item 6): same strings,
byte-for-byte — the gate dict is asserted identical to the pre-split
snapshot in tests/test_entry_rotation.py.
"""
from __future__ import annotations



def oracles() -> dict[str, str]:
    o: dict[str, str] = {}

    # ---- multimodal (deterministic fake decode; text is ASCII so byte sums
    # equal codepoint sums) ----
    o["multimodal_decode"] = """
SELECT doc_id AS asset_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(ord(substr(text, 1, 1)) AS BIGINT) AS first_byte,
       CAST(list_sum([ord(substr(text, i, 1)) for i in range(1, len(text) + 1)]) % 1000003 AS BIGINT) AS byte_sum_mod,
       CAST((list_sum([ord(substr(text, i, 1)) for i in range(1, len(text) + 1)]) % 1000003) % 64 + 1 AS BIGINT) AS width,
       CAST(octet_length(encode(text)) % 64 + 1 AS BIGINT) AS height
FROM documents
"""

    # 8x8 nearest-neighbor sample over the fake-decoded w x h grid: the 64
    # sampled positions are generated here as explicit SQL terms (w/h are
    # per-row columns, so each term's arithmetic stays in SQL).
    _bsum = f"list_sum([ord(substr(text, i, 1)) for i in range(1, len(text) + 1)])"
    _pix_terms = " + ".join(
        f"(CASE WHEN (({j} * h) // 8) * w + (({i} * w) // 8) + 1 <= n "
        f"THEN ord(substr(text, CAST((({j} * h) // 8) * w + (({i} * w) // 8) + 1 AS INT), 1)) ELSE 0 END)"
        for j in range(8)
        for i in range(8)
    )
    o["multimodal_resize"] = f"""
WITH dims AS (
  SELECT doc_id, text, len(text) AS n,
         ({_bsum} % 1000003) % 64 + 1 AS w,
         octet_length(encode(text)) % 64 + 1 AS h
  FROM documents
)
SELECT doc_id AS asset_id, CAST(8 AS BIGINT) AS out_w, CAST(8 AS BIGINT) AS out_h,
       CAST(({_pix_terms}) % 1000003 AS BIGINT) AS pix_checksum
FROM dims
"""

    o["multimodal_frames"] = """
WITH f AS (
  SELECT doc_id,
         unnest(range(0, least(octet_length(encode(text)) // 64, 7) + 1)) AS i,
         text
  FROM documents
),
s AS (
  SELECT doc_id, i, substr(text, CAST(i * 64 + 1 AS INT), 64) AS sub FROM f
)
SELECT doc_id AS asset_id, CAST(i AS BIGINT) AS frame_idx,
       CAST(len(sub) AS BIGINT) AS frame_len, md5(sub) AS frame_md5
FROM s WHERE len(sub) > 0
"""

    o["multimodal_png_real"] = """
WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents)
SELECT doc_id,
       CAST(8 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(6 * list_sum(list_transform(range(1, 33),
                                        i -> ord(substr(hx, CAST(i AS INT), 1))))
            % 1000003 AS BIGINT) AS pix_sum
FROM h
"""

    # GIF is lossless (palette + LZW), so the decoded pixels equal the hex
    # construction exactly — same arithmetic as the PNG twin, reached
    # through a completely different wire format (and half the payloads
    # interlaced, which only permutes row STORAGE order, not pixel values).
    o["multimodal_gif_real"] = """
WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents)
SELECT doc_id,
       CAST(8 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(6 * list_sum(list_transform(range(1, 33),
                                        i -> ord(substr(hx, CAST(i AS INT), 1))))
            % 1000003 AS BIGINT) AS pix_sum
FROM h
"""

    # Animated GIF frame sampling (every_n=2): doc k has 3 + doc_id % 3
    # full-canvas frames, frame k = hex bytes + k, so the sampled frames
    # are the EVEN indices below n_frames and frame k's pixel sum is
    # 6*S + 192*k (192 bytes each shifted by k) — all md5 hex arithmetic.
    o["multimodal_gif_frames"] = """
WITH h AS (
  SELECT doc_id,
         list_sum(list_transform(range(1, 33),
                                 i -> ord(substr(md5(text), CAST(i AS INT), 1)))) AS s
  FROM documents),
f AS (SELECT doc_id, s, unnest(range(0, 3 + doc_id % 3)) AS k FROM h)
SELECT doc_id, CAST(k AS BIGINT) AS frame_idx,
       CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
       CAST((6 * s + 192 * k) % 1000003 AS BIGINT) AS pix_sum
FROM f WHERE k % 2 = 0
"""

    # The decodability of each payload class is BY CONSTRUCTION (hex-derived
    # PNG/flat-JPEG/WAV always decode; raw text bytes never sniff as any
    # container), so the census is pure doc_id % 4 arithmetic in SQL.
    o["multimodal_decode_stats"] = """
SELECT CASE WHEN doc_id % 4 = 2 THEN 'audio' ELSE 'image' END AS media_type,
       CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                       WHEN 2 THEN 'wav' ELSE 'unknown' END AS format,
       count(*) AS n_assets,
       CAST(sum(CASE WHEN doc_id % 4 = 3 THEN 0 ELSE 1 END) AS BIGINT) AS n_decoded,
       CAST(sum(CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_failed
FROM documents GROUP BY 1, 2
"""

    # Frame 0 = the 192 hex bytes (sum = 6 * S); frame 1 = bytes + 1
    # (sum = 6 * (S + 32)); uncompressed DIB frames round-trip exactly.
    o["multimodal_avi_real"] = """
WITH h AS (
  SELECT doc_id,
         list_sum(list_transform(range(1, 33),
                                 i -> ord(substr(md5(text), CAST(i AS INT), 1)))) AS s
  FROM documents)
SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
       CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
       CAST((6 * (s + 32 * f)) % 1000003 AS BIGINT) AS pix_sum
FROM h, (SELECT unnest([0, 1]) AS f) frames
"""

    # Four flat 8x8 blocks, value_j = sum(hex chars 8j..8j+7) % 256; the
    # quality-100 JPEG roundtrip is bit-exact on flat blocks, so the decoded
    # pixel sum is 64 * sum(values) — pure hex arithmetic in SQL.
    o["multimodal_jpeg_real"] = """
WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
b AS (
  SELECT doc_id,
         list_transform(range(0, 4),
           j -> list_sum(list_transform(range(1, 9),
                  i -> ord(substr(hx, CAST(j * 8 + i AS INT), 1)))) % 256) AS vs
  FROM h)
SELECT doc_id,
       CAST(16 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST((64 * (vs[1] + vs[2] + vs[3] + vs[4])) % 1000003 AS BIGINT) AS pix_sum
FROM b
"""

    o["multimodal_wav_real"] = """
WITH h AS (
  SELECT doc_id,
         list_sum(list_transform(range(1, 33),
             i -> (ord(substr(md5(text), CAST(i AS INT), 1)) - 128)
                  * (ord(substr(md5(text), CAST(i AS INT), 1)) - 128))) AS e
  FROM documents)
SELECT doc_id,
       CAST(6 AS BIGINT) AS n_windows,
       CAST(6 * e AS BIGINT) AS total_energy,
       CAST(0 AS BIGINT) AS total_zc,
       CAST(e AS BIGINT) AS peak_energy
FROM h
"""

    o["multimodal_audio"] = """
WITH w AS (
  SELECT doc_id, text,
         unnest(range(0, greatest((octet_length(encode(text)) - 64) // 32 + 1, 0))) AS k
  FROM documents
  WHERE octet_length(encode(text)) >= 64
),
feat AS (
  SELECT doc_id, k,
         list_sum([(ord(substr(text, CAST(k * 32 + i AS INT), 1)) - 128)
                   * (ord(substr(text, CAST(k * 32 + i AS INT), 1)) - 128)
                   for i in range(1, 65)]) AS energy,
         list_sum([CASE WHEN (ord(substr(text, CAST(k * 32 + i AS INT), 1)) >= 128)
                          != (ord(substr(text, CAST(k * 32 + i + 1 AS INT), 1)) >= 128)
                        THEN 1 ELSE 0 END
                   for i in range(1, 64)]) AS zc
  FROM w
)
SELECT doc_id AS asset_id,
       count(*) AS n_windows,
       CAST(sum(energy) AS BIGINT) AS total_energy,
       CAST(sum(zc) AS BIGINT) AS total_zc,
       CAST(max(energy) AS BIGINT) AS peak_energy
FROM feat
GROUP BY doc_id
"""

    # scene_cuts: the gif_scene fixture shifts frames uniformly, so each
    # transition's mean abs diff is exactly |OFF[k+1]-OFF[k]| — no pixel
    # arithmetic needed, LZW losslessness carries it through the codec.
    o["multimodal_scene_cuts"] = """
WITH d AS (SELECT doc_id, 3 + CAST(doc_id % 3 AS INT) AS nf FROM documents),
t AS (
  SELECT doc_id, CAST(k AS BIGINT) AS from_idx, CAST(k + 1 AS BIGINT) AS to_idx,
         ([0,2,40,43,90])[CAST(k AS INT) + 2] - ([0,2,40,43,90])[CAST(k AS INT) + 1] AS delta
  FROM d, unnest(range(nf - 1)) AS t(k))
SELECT doc_id, from_idx, to_idx, CAST(delta AS DOUBLE) AS mad,
       CAST(CASE WHEN CAST(delta AS DOUBLE) > 10.0 THEN 1 ELSE 0 END AS BIGINT) AS is_cut
FROM t
"""
    return o
