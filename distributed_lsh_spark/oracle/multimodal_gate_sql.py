"""Self-contained DuckDB oracle SQL for the multimodal driver-gate query.

Independence: the VALUES below are the fixture's PLANTED pixel planes and
PCM samples — generated BEFORE encoding, never touched by the decoders.
The engine side must parse real PPM/BMP/WAV/y4m bytes back into exactly
these arrays and then run the feature math; this SQL replays only the
feature math (Rec.601 luminance 8x8 nearest-neighbor thumbnail; RMS
loudness envelope over FEATURE_DIM windows) over the raw planted values.
A decoder bug (wrong stride, wrong row order, wrong sample scaling)
changes the engine's features and reddens the row.

Float parity: all math is float64 in both engines with matching operation
order; the engine stores features as float32, so the oracle casts through
REAL before rounding — any sub-1e-8 double-summation divergence (e.g.
NumPy's cumsum-based window sums vs SQL's direct sums) is absorbed by the
float32 rounding step.
"""

from __future__ import annotations

FEATURE_DIM = 64


def sql_multimodal_features(media: list[dict]) -> str:
    """media: fixtures.make_media_gate_fixture() rows -> one DuckDB SQL
    string returning (media_id, kind, idx, val) ordered by (media_id, idx):
    64 feature values per media row."""
    kinds = ",".join(f"({m['media_id']},'{m['kind']}')" for m in media)

    # ---- images + the video's first frame: (h, w) dims + per-pixel lum
    # expression terms.  RGB rows embed (r, g, b); grayscale rows embed the
    # luminance plane value with weights (1, 0, 0).
    dims, px = [], []
    for m in media:
        if m["kind"] == "image":
            h, w, _ = m["pixels"].shape
            dims.append(f"({m['media_id']},{h},{w})")
            for y in range(h):
                for x in range(w):
                    r, g, b = (int(v) for v in m["pixels"][y, x])
                    px.append(f"({m['media_id']},{y},{x},{r},{g},{b})")
        elif m["kind"] == "video":
            h, w = m["plane"].shape
            dims.append(f"({m['media_id']},{h},{w})")
            for y in range(h):
                for x in range(w):
                    v = int(m["plane"][y, x])
                    px.append(f"({m['media_id']},{y},{x},{v},0,0)")
    lum = {m["media_id"]: ("(p.r*0.299 + p.g*0.587 + p.b*0.114)"
                           if m["kind"] == "image" else "CAST(p.r AS DOUBLE)")
           for m in media if m["kind"] in ("image", "video")}
    # one img_feats branch per media id so the grayscale rows skip the
    # Rec.601 weighting exactly like image_feature's 2-D path
    img_selects = " UNION ALL ".join(f"""
  SELECT m.media_id, (a.i * 8 + b.i) AS idx, {expr} / 255.0 AS val
  FROM dims m JOIN idx8 a ON TRUE JOIN idx8 b ON TRUE
  JOIN px p ON p.media_id = m.media_id
    AND p.y = LEAST(CAST(floor((a.i + 0.5) * m.h / 8) AS INT), m.h - 1)
    AND p.x = LEAST(CAST(floor((b.i + 0.5) * m.w / 8) AS INT), m.w - 1)
  WHERE m.media_id = {mid}""" for mid, expr in lum.items())

    # ---- audio: planted PCM ints -> exact float samples -> RMS windows.
    # s is emitted as an exact rational (num / den) so 16-bit mono
    # (v/32768), stereo mean ((l+r)/65536) and 8-bit ((v-128)/128) are all
    # bit-identical to the engine's scaling.
    auds, smp = [], []
    for m in media:
        if m["kind"] != "audio":
            continue
        pcm, bits, ch = m["pcm"], m["pcm_bits"], m["pcm_channels"]
        if bits == 16 and ch == 1:
            vals = [(int(v), 32768) for v in pcm]
        elif bits == 16:
            vals = [(int(row.sum()), 32768 * ch) for row in pcm]
        else:
            vals = [(int(v) - 128, 128) for v in pcm]
        auds.append(f"({m['media_id']},{len(vals)})")
        smp.extend(f"({m['media_id']},{i},{num},{den})"
                   for i, (num, den) in enumerate(vals))

    return f"""WITH kinds(media_id, kind) AS (VALUES {kinds}),
idx8(i) AS (SELECT * FROM range(8)),
idx64(j) AS (SELECT * FROM range({FEATURE_DIM})),
dims(media_id, h, w) AS (VALUES {",".join(dims)}),
px(media_id, y, x, r, g, b) AS (VALUES {",".join(px)}),
auds(media_id, n) AS (VALUES {",".join(auds)}),
smp(media_id, i, num, den) AS (VALUES {",".join(smp)}),
img_feats AS ({img_selects}
),
win AS (
  SELECT a.media_id, w.j,
         (w.j * a.n) // {FEATURE_DIM} AS lo,
         ((w.j + 1) * a.n) // {FEATURE_DIM} AS hi
  FROM auds a JOIN idx64 w ON TRUE
),
aud_feats AS (
  -- LEFT join + coalesce + GREATEST(count, 1): audio shorter than
  -- {FEATURE_DIM} samples has EMPTY windows (lo == hi), for which the
  -- engine's audio_feature emits 0.0 (counts clamped to 1) — an inner
  -- join would silently drop those (media_id, idx) rows and the contract
  -- is 64 feature values per media row
  SELECT w.media_id, w.j AS idx,
         sqrt(coalesce(sum((p.num / CAST(p.den AS DOUBLE))
                           * (p.num / CAST(p.den AS DOUBLE))), 0.0)
              / GREATEST(w.hi - w.lo, 1)) AS val
  FROM win w LEFT JOIN smp p ON p.media_id = w.media_id
                            AND p.i >= w.lo AND p.i < w.hi
  GROUP BY w.media_id, w.j, w.hi, w.lo
)
SELECT CAST(f.media_id AS BIGINT) AS media_id, k.kind,
       CAST(f.idx AS INT) AS idx,
       round(CAST(CAST(f.val AS REAL) AS DOUBLE), 6) AS val
FROM (SELECT * FROM img_feats UNION ALL SELECT * FROM aud_feats) f
JOIN kinds k ON k.media_id = f.media_id
ORDER BY f.media_id, f.idx"""
