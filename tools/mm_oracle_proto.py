#!/usr/bin/env python3
"""Prototype of the mm_manifest DuckDB oracle: parse the gate's written
media fixture files (PNG / WAV / MP4 / AVI-MJPEG) from raw bytes in SQL —
RIFF + ISO-BMFF + JPEG-marker walks as recursive CTEs — and replay the
byte-stat features. Iterated here, then ported into PipelineQueries.scala.

Usage: tools/mm_oracle_proto.py [media_dir] [gate_parquet_dir]
"""
import sys

import duckdb

media = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/target/scratch/mm_media"
gate = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out/mm_manifest"


def be(h, off, nbytes):
    """Big-endian unsigned int from hex string h at 0-based byte offset."""
    return f"CAST('0x' || substring({h}, 2*({off}) + 1, {2*nbytes}) AS BIGINT)"


def le(h, off, nbytes):
    """Little-endian unsigned int: byte pairs reversed."""
    parts = " || ".join(
        f"substring({h}, 2*(({off}) + {i}) + 1, 2)" for i in range(nbytes - 1, -1, -1))
    return f"CAST('0x' || {parts} AS BIGINT)"


def fourcc(h, off):
    """Raw hex of the 4cc at byte offset (compared against hex literals —
    blob bytes are not valid UTF-8, so no decode())."""
    return f"substring({h}, 2*({off}) + 1, 8)"


SQL = f"""
WITH RECURSIVE files AS (
  SELECT CAST(regexp_extract(filename, 'media_(\\d+)\\.', 1) AS BIGINT) AS media_id,
         lower(regexp_extract(filename, '\\.([a-z0-9]+)$', 1)) AS ext,
         hex(content) AS h,
         CAST(octet_length(content) AS BIGINT) AS n
  FROM read_blob('{media}/media_*')
),
kinds AS (
  SELECT *, CASE ext WHEN 'png' THEN 'image' WHEN 'wav' THEN 'audio'
                     WHEN 'mp4' THEN 'video' WHEN 'avi' THEN 'video'
                     ELSE 'binary' END AS kind
  FROM files
),
-- byte stats: histogram -> exact-integer-sum mean + entropy as the
-- kernel's ascending-byte-value left fold; round_even == Math.rint
bytes AS (
  SELECT media_id, n, unnest(range(0, n)) AS i FROM kinds
),
bvals AS (
  SELECT b.media_id, {be('k.h', 'b.i', 1)} AS v
  FROM bytes b JOIN kinds k USING (media_id)
),
hist AS (
  SELECT media_id, v, CAST(count(*) AS BIGINT) AS c FROM bvals GROUP BY 1, 2
),
stats AS (
  SELECT k.media_id,
         round_even(CAST(sum(c * v) AS DOUBLE) / k.n * 10000, 0) / 10000 AS byte_mean,
         round_even(
           list_reduce(
             list_prepend(0.0, list(CAST(c AS DOUBLE) / k.n ORDER BY v)),
             (acc, p) -> acc - p * ln(p) / ln(2)) * 10000, 0) / 10000 AS byte_entropy
  FROM hist JOIN kinds k USING (media_id)
  GROUP BY k.media_id, k.n
),
-- PNG: signature + IHDR (the spec-mandated first chunk)
png AS (
  SELECT media_id,
         CASE WHEN substring(h, 1, 16) = '89504E470D0A1A0A'
              AND {fourcc('h', 12)} = '49484452'
              THEN {be('h', 16, 4)} ELSE 0 END AS width,
         CASE WHEN substring(h, 1, 16) = '89504E470D0A1A0A'
              AND {fourcc('h', 12)} = '49484452'
              THEN {be('h', 20, 4)} ELSE 0 END AS height
  FROM kinds WHERE ext = 'png'
),
-- RIFF walk (WAV + AVI): every chunk, descending into LISTs
rwalk(media_id, h, off, lim) AS (
  SELECT media_id, h, CAST(12 AS BIGINT), n FROM kinds
  WHERE ext IN ('wav', 'avi') AND {fourcc('h', 0)} = '52494646'
  UNION ALL
  SELECT media_id, h, s.nx.o, s.nx.l FROM (
    SELECT media_id, h, off, lim,
           {fourcc('h', 'off')} AS cc, {le('h', 'off + 4', 4)} AS sz
    FROM rwalk WHERE off + 8 <= lim
  ) t, LATERAL (SELECT unnest(list_filter([
        struct_pack(o := t.off + 8 + t.sz + (t.sz % 2), l := t.lim),
        CASE WHEN t.cc = '4C495354' AND t.sz >= 4
             THEN struct_pack(o := t.off + 12, l := t.off + 8 + t.sz) END],
      x -> x IS NOT NULL AND x.o + 8 <= x.l)) AS nx) s
  WHERE t.off + 8 + t.sz <= t.lim
),
rchunks AS (
  SELECT media_id, off, {fourcc('h', 'off')} AS cc,
         {le('h', 'off + 4', 4)} AS sz, off + 8 AS ds, h
  FROM rwalk WHERE off + 8 <= lim
),
-- WAV: fmt chunk -> rate/channels/blockAlign; frames = data bytes / blockAlign
wav AS (
  SELECT f.media_id,
         {le('f.h', 'f.ds + 4', 4)} AS sample_rate,
         {le('f.h', 'f.ds + 2', 2)} AS channels,
         CAST(d.sz / {le('f.h', 'f.ds + 12', 2)} AS BIGINT) AS frames
  FROM (SELECT * FROM rchunks WHERE cc = '666D7420') f
  JOIN (SELECT * FROM rchunks WHERE cc = '64617461') d USING (media_id)
),
-- AVI: avih -> usPerFrame/totalFrames; 00dc/00db chunks are the frames
avih AS (
  SELECT media_id, {le('h', 'ds', 4)} AS us_per_frame,
         {le('h', 'ds + 16', 4)} AS total_frames
  FROM rchunks WHERE cc = '61766968'
),
avifr AS (
  SELECT media_id, CAST(count(*) AS BIGINT) AS n_frames,
         min(ds) AS first_ds, any_value(h) AS h
  FROM rchunks
  WHERE substring(cc, 5, 4) IN ('6463', '6462') AND sz > 0
  GROUP BY media_id
),
-- first frame's JPEG: marker walk to SOF0-3 = the decoded dimensions
jwalk(media_id, h, off) AS (
  SELECT media_id, h, first_ds + 2 FROM avifr
  WHERE substring(h, 2*first_ds + 1, 4) = 'FFD8'
  UNION ALL
  SELECT media_id, h, off + 2 + {be('h', 'off + 2', 2)} FROM jwalk
  WHERE substring(h, 2*off + 1, 2) = 'FF'
    AND substring(h, 2*off + 3, 2) NOT IN ('C0','C1','C2','C3','D8','D9','DA')
),
jsof AS (
  SELECT media_id, {be('h', 'off + 5', 2)} AS height, {be('h', 'off + 7', 2)} AS width
  FROM jwalk
  WHERE substring(h, 2*off + 1, 2) = 'FF'
    AND substring(h, 2*off + 3, 2) IN ('C0','C1','C2','C3')
),
-- MP4: ISO-BMFF box walk (big-endian sizes; descend into moov/trak)
bwalk(media_id, h, off, lim) AS (
  SELECT media_id, h, CAST(0 AS BIGINT), n FROM kinds WHERE ext = 'mp4'
  UNION ALL
  SELECT media_id, h, s.nx.o, s.nx.l FROM (
    SELECT media_id, h, off, lim,
           {fourcc('h', 'off + 4')} AS bt, {be('h', 'off', 4)} AS sz
    FROM bwalk WHERE off + 8 <= lim
  ) t, LATERAL (SELECT unnest(list_filter([
        struct_pack(o := t.off + t.sz, l := t.lim),
        CASE WHEN t.bt IN ('6D6F6F76','7472616B')
             THEN struct_pack(o := t.off + 8, l := t.off + t.sz) END],
      x -> x IS NOT NULL AND x.o + 8 <= x.l)) AS nx) s
  WHERE t.sz >= 8 AND t.off + t.sz <= t.lim
),
boxes AS (
  SELECT media_id, off, {fourcc('h', 'off + 4')} AS bt,
         {be('h', 'off', 4)} AS sz, off + 8 AS ds, h
  FROM bwalk WHERE off + 8 <= lim
),
mvhd AS (
  SELECT media_id,
         CASE WHEN {be('h', 'ds', 1)} = 1
              THEN {be('h', 'ds + 20', 4)} ELSE {be('h', 'ds + 12', 4)} END AS timescale,
         CASE WHEN {be('h', 'ds', 1)} = 1
              THEN {be('h', 'ds + 24', 8)} ELSE {be('h', 'ds + 16', 4)} END AS duration
  FROM boxes WHERE bt = '6D766864'
),
tkhd AS (
  -- first tkhd with nonzero dims wins, else first tkhd (kernel semantics)
  SELECT media_id, width, height FROM (
    SELECT media_id,
           {be('h', 'off + sz - 8', 2)} AS width,
           {be('h', 'off + sz - 4', 2)} AS height,
           row_number() OVER (PARTITION BY media_id
             ORDER BY CASE WHEN {be('h', 'off + sz - 8', 2)} != 0
                            AND {be('h', 'off + sz - 4', 2)} != 0
                      THEN 0 ELSE 1 END, off) AS rk
    FROM boxes WHERE bt = '746B6864'
  ) WHERE rk = 1
)
SELECT k.media_id, k.kind, k.n AS n_bytes,
  s.byte_mean, s.byte_entropy,
  CAST(CASE k.ext WHEN 'png' THEN p.width WHEN 'avi' THEN j.width
                  WHEN 'mp4' THEN t.width ELSE 0 END AS INT) AS width,
  CAST(CASE k.ext WHEN 'png' THEN p.height WHEN 'avi' THEN j.height
                  WHEN 'mp4' THEN t.height ELSE 0 END AS INT) AS height,
  CAST(coalesce(w.sample_rate, 0) AS INT) AS sample_rate,
  CAST(coalesce(w.channels, 0) AS INT) AS channels,
  CAST(coalesce(round_even(w.frames * 1000.0 / w.sample_rate, 0), 0) AS BIGINT) AS audio_ms,
  CAST(CASE k.ext
    WHEN 'avi' THEN coalesce(round_even(a.us_per_frame * a.total_frames / 1000.0, 0), 0)
    WHEN 'mp4' THEN coalesce(round_even(m.duration * 1000.0 / m.timescale, 0), 0)
    ELSE 0 END AS BIGINT) AS video_ms,
  CAST(coalesce(fr.n_frames, 0) AS INT) AS n_frames
FROM kinds k
JOIN stats s USING (media_id)
LEFT JOIN png p USING (media_id)
LEFT JOIN wav w USING (media_id)
LEFT JOIN avih a USING (media_id)
LEFT JOIN avifr fr USING (media_id)
LEFT JOIN jsof j USING (media_id)
LEFT JOIN mvhd m USING (media_id)
LEFT JOIN tkhd t USING (media_id)
ORDER BY k.media_id
"""

con = duckdb.connect()
ref = con.execute(SQL).df()
print(ref.head(12).to_string())
print(f"{len(ref)} oracle rows")

try:
    mine = con.execute(f"SELECT * FROM '{gate}/*.parquet' ORDER BY media_id").df()
except Exception as e:
    print(f"(no gate parquet yet: {e})")
    sys.exit(0)

cols = sorted(mine.columns)
mine = mine[cols].reset_index(drop=True)
ref = ref[cols].reset_index(drop=True)
mr = [tuple(str(v) for v in r) for r in mine.itertuples(index=False)]
rr = [tuple(str(v) for v in r) for r in ref.itertuples(index=False)]
bad = [i for i, (a, b) in enumerate(zip(mr, rr)) if a != b]
print(f"rows: mine={len(mr)} oracle={len(rr)}; mismatches={len(bad)}")
for i in bad[:5]:
    print(" mine :", mr[i])
    print(" ref  :", rr[i])
print("dtypes mine:", {c: str(t) for c, t in mine.dtypes.items()})
print("dtypes ref :", {c: str(t) for c, t in ref.dtypes.items()})
