"""Multimodal query entries: metadata projection, the actor-pool
decode/feature stage, and resize. All three are oracle-backed — the
fake decoder's byte checksums get an exact DuckDB twin via hex()
expansion (2 hex chars per payload byte → strpos arithmetic), so even
the binary-payload path is value-hash verified."""

from __future__ import annotations

from ..stages.multimodal import (
    FRAME_BYTES,
    HEADER_BYTES,
    MEDIA_META_SQL,
    MEDIA_RESIZE_SQL,
    media_frames_pipeline,
    media_meta_pipeline,
    media_pipeline,
    media_resize_pipeline,
)

# frame_stride default in MediaFeaturizer
_STRIDE = 4

MEDIA_DECODE_SQL = f"""
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
         hex(encode(text)) AS hx,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST(octet_length(encode(text)) // 1024 + 1 AS BIGINT) AS est_frames
  FROM documents
),
b0 AS (SELECT doc_id, hx, unnest(range(n_bytes)) AS i FROM m),
b AS (
  SELECT doc_id, i,
         strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INT), 1)) * 16
           + strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS INT), 1)) - 17
             AS byte
  FROM b0
),
s AS (
  SELECT doc_id,
         CAST(sum(byte) AS BIGINT) AS payload_checksum,
         CAST(sum(CASE WHEN i < {HEADER_BYTES} THEN byte ELSE 0 END) AS BIGINT)
             AS header_checksum
  FROM b GROUP BY doc_id
)
SELECT m.doc_id, m.kind, m.n_bytes,
       CAST(COALESCE(s.payload_checksum, 0) AS BIGINT) AS payload_checksum,
       CAST(COALESCE(s.header_checksum, 0) AS BIGINT) AS header_checksum,
       CAST((m.est_frames + {_STRIDE - 1}) // {_STRIDE} AS BIGINT)
           AS sampled_frames
FROM m LEFT JOIN s USING (doc_id)
"""

MEDIA_FRAMES_SQL = f"""
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
         hex(encode(text)) AS hx,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST(octet_length(encode(text)) // {FRAME_BYTES} + 1 AS BIGINT)
             AS est_frames
  FROM documents
),
frames AS (
  SELECT doc_id, kind, n_bytes,
         CAST(unnest(range(0, est_frames, {_STRIDE})) AS BIGINT) AS frame_idx
  FROM m
),
b0 AS (SELECT doc_id, hx, unnest(range(n_bytes)) AS i FROM m),
fb AS (
  SELECT doc_id, CAST(i // {FRAME_BYTES} AS BIGINT) AS frame_idx,
         CAST(sum(
           strpos('0123456789ABCDEF', substr(hx, CAST(2*i+1 AS INT), 1)) * 16
             + strpos('0123456789ABCDEF', substr(hx, CAST(2*i+2 AS INT), 1)) - 17
         ) AS BIGINT) AS cks
  FROM b0 GROUP BY 1, 2
)
SELECT f.doc_id, f.kind, f.frame_idx,
       f.frame_idx * {FRAME_BYTES} AS frame_off,
       greatest(0, least({FRAME_BYTES}, f.n_bytes - f.frame_idx * {FRAME_BYTES}))
           AS frame_bytes,
       CAST(COALESCE(fb.cks, 0) AS BIGINT) AS frame_checksum
FROM frames f LEFT JOIN fb USING (doc_id, frame_idx)
"""

REGISTRY: dict[str, tuple] = {
    "media_meta": (media_meta_pipeline, MEDIA_META_SQL),
    "media_decode": (lambda sf_dir: media_pipeline(sf_dir), MEDIA_DECODE_SQL),
    "media_resize": (lambda sf_dir: media_resize_pipeline(sf_dir), MEDIA_RESIZE_SQL),
    "media_frames": (lambda sf_dir: media_frames_pipeline(sf_dir), MEDIA_FRAMES_SQL),
}
