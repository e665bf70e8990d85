"""Deterministic synthetic `pages` corpus with planted duplicate clusters
(FIXTURES.md §1).  Pure Python/`random.Random` so the oracle and the Spark
engine see identical bytes; no wall clock, no external data.

Schema (BASELINE.json input_hint):
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string
plus generation metadata (kind, base_id) used only by tests.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from datetime import datetime, timedelta

VOCab_SIZE = 5000
_BASE_TS = datetime(2026, 1, 1, 0, 0, 0)


@dataclass
class PagesCorpus:
    rows: list[dict]                      # url, warc_ts, html, text, lang, kind, base_id
    truth_pairs: set[tuple[int, int]]     # planted dup pairs by row index (exact + near)
    hot_text: str                         # the boilerplate stub text (hot-key trap)

    def texts_by_id(self) -> dict[int, str]:
        return {i: r["text"] for i, r in enumerate(self.rows)}


def _html_wrap(text: str, title: str) -> bytes:
    return (f"<html><head><title>{title}</title></head>"
            f"<body><p>{text}</p></body></html>").encode("utf-8")


def _mutate(tokens: list[str], rng: random.Random, rate: float,
            vocab: list[str]) -> list[str]:
    out = list(tokens)
    n_edits = max(1, int(len(tokens) * rate))
    for _ in range(n_edits):
        pos = rng.randrange(len(out))
        if rng.random() < 0.7 or len(out) < 10:
            out[pos] = rng.choice(vocab)     # substitution
        else:
            del out[pos]                     # deletion
    return out


def make_pages_corpus(n_rows: int = 200, seed: int = 42,
                      hot_copies: int | None = None) -> PagesCorpus:
    """Plant: ~10% exact-dup members (cluster size 2-5), ~10% near-dups
    (0.3-1% token edits, Jaccard >= ~0.9), ~3% borderline (15-25% edits,
    must NOT pair), one hot-key stub repeated `hot_copies` times, ~0.5%
    long-repeat docs (shared 200-token span inside distinct docs), rest
    unique."""
    rng = random.Random(f"pages:{seed}:{n_rows}")
    vocab = [f"tok{i:04d}" for i in range(VOCab_SIZE)]
    if hot_copies is None:
        hot_copies = max(8, n_rows // 10) if n_rows <= 400 else 50

    def base_doc() -> list[str]:
        length = rng.randint(50, 400)
        return [rng.choice(vocab) for _ in range(length)]

    rows: list[dict] = []
    truth: set[tuple[int, int]] = set()
    langs = ["de", "fr", "es"]

    def add_row(tokens: list[str], kind: str, base_id: int | None) -> int:
        i = len(rows)
        text = " ".join(tokens)
        rows.append({
            "url": f"https://site{rng.randrange(10000):04d}.example/p/{i}",
            "warc_ts": _BASE_TS + timedelta(seconds=37 * i),
            "html": _html_wrap(text, f"page {i}"),
            "text": text,
            "lang": "en" if i % 10 < 9 else langs[i % 3],
            "kind": kind,
            "base_id": base_id,
        })
        return i

    n_exact = int(n_rows * 0.10)
    n_near = int(n_rows * 0.10)
    n_border = int(n_rows * 0.03)
    n_longrep = max(2, int(n_rows * 0.005) * 2)

    # exact-dup clusters
    placed = 0
    while placed < n_exact:
        size = min(rng.randint(2, 5), n_exact - placed + 1)
        if size < 2:
            break
        toks = base_doc()
        ids = [add_row(toks, "exact", None) for _ in range(size)]
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                truth.add((a, b))
        placed += size

    # near-dup pairs (base + mutated copy)
    for _ in range(n_near // 2):
        toks = base_doc()
        a = add_row(toks, "near_base", None)
        b = add_row(_mutate(toks, rng, rng.uniform(0.003, 0.01), vocab), "near", a)
        truth.add((a, b) if a < b else (b, a))

    # borderline: heavy edits, must NOT pair at jaccard >= 0.8
    for _ in range(n_border // 2):
        toks = base_doc()
        a = add_row(toks, "border_base", None)
        add_row(_mutate(toks, rng, rng.uniform(0.15, 0.25), vocab), "border", a)

    # hot-key trap: identical boilerplate stub
    hot_toks = [vocab[i % 50] for i in range(60)]
    hot_ids = [add_row(hot_toks, "hot", None) for _ in range(hot_copies)]
    for i, a in enumerate(hot_ids):
        for b in hot_ids[i + 1:]:
            truth.add((a, b))

    # long-repeat: a shared 200-token span inside otherwise-distinct docs
    span = [rng.choice(vocab) for _ in range(200)]
    for _ in range(n_longrep):
        toks = base_doc() + span + base_doc()
        add_row(toks, "longrep", None)

    while len(rows) < n_rows:
        add_row(base_doc(), "unique", None)

    return PagesCorpus(rows=rows, truth_pairs=truth, hot_text=" ".join(hot_toks))


@dataclass
class VectorsFixture:
    """ANN-parity fixture mirroring the reference input format (FIXTURES.md
    §2: 1-based id + d integer coordinates, MapReduce-LSH/.../lsh/builder/
    HashReducer.java:162-184)."""

    points: "np.ndarray"          # (n, d) int64, row i has id i+1
    queries: "np.ndarray"         # (nq, d) int64
    ground_truth: "np.ndarray"    # (nq, max_k) float64 exact L2, ascending


def make_vectors_fixture(n: int = 1000, d: int = 16, t: int = 255,
                         n_queries: int = 50, max_k: int = 100,
                         seed: int = 42) -> VectorsFixture:
    import numpy as np

    rng = np.random.default_rng(seed + 1)
    points = rng.integers(0, t + 1, size=(n, d), dtype=np.int64)
    # half the queries near data points (guaranteed neighbors), half uniform
    near = points[rng.choice(n, n_queries // 2, replace=False)] + \
        rng.integers(-2, 3, size=(n_queries // 2, d))
    near = np.clip(near, 0, t)
    uni = rng.integers(0, t + 1, size=(n_queries - n_queries // 2, d), dtype=np.int64)
    queries = np.concatenate([near, uni]).astype(np.int64)

    diffs = points[None, :, :].astype(np.float64) - queries[:, None, :].astype(np.float64)
    dists = np.sqrt((diffs ** 2).sum(axis=2))       # (nq, n)
    dists.sort(axis=1)
    return VectorsFixture(points=points, queries=queries,
                          ground_truth=dists[:, :max_k])


@dataclass
class AnnGateFixture:
    """Self-contained c-k-ANN driver-gate fixture: a deterministic
    integer-vector corpus plus the reference hash model's bucket tables
    for EVERY (radius, table).  The SQL oracle computes its own buckets
    from the embedded hash-family parameters (oracle/ann_gate_sql.
    _bucket_ctes — the explicit left-to-right float chain reproduces
    NumPy bit-for-bit on this fixture, with floor() arguments >= 9.5e-6
    from integer boundaries); the bucket tables here remain as the
    cross-check target for tests/test_ann_parity.py."""

    model: object                  # ReferenceLSHModel
    points: "np.ndarray"           # (n, d) int64, point_id = row index
    queries: "np.ndarray"          # (nq, d) int64, query_id = row index
    point_buckets: list            # (point_id, radius_id, table_id, bucket)
    query_buckets: list            # (query_id, radius_id, table_id, bucket)
    k: int


ANN_GATE_N, ANN_GATE_D, ANN_GATE_T, ANN_GATE_NQ, ANN_GATE_K = 120, 6, 20, 8, 5


def make_ann_gate_fixture(seed: int = 42) -> AnnGateFixture:
    """n=120 d=6 t=20 -> model (m=10, L=10, 6 radii, threshold 35): small
    enough that the bucket tables embed as SQL VALUES (~7.7k rows) yet the
    search exercises radius expansion past R=1 and the per-query cap."""
    import numpy as np

    from distributed_lsh_spark.oracle.reference_lsh import ReferenceLSHModel

    model = ReferenceLSHModel(dim=ANN_GATE_D, max_coordinate=ANN_GATE_T,
                              cardinality=ANN_GATE_N, seed=seed)
    rng = np.random.default_rng(seed + 7)
    points = rng.integers(0, ANN_GATE_T + 1,
                          size=(ANN_GATE_N, ANN_GATE_D), dtype=np.int64)
    near = np.clip(points[rng.choice(ANN_GATE_N, ANN_GATE_NQ // 2, replace=False)]
                   + rng.integers(-1, 2, size=(ANN_GATE_NQ // 2, ANN_GATE_D)),
                   0, ANN_GATE_T)
    uni = rng.integers(0, ANN_GATE_T + 1,
                       size=(ANN_GATE_NQ - ANN_GATE_NQ // 2, ANN_GATE_D),
                       dtype=np.int64)
    queries = np.concatenate([near, uni]).astype(np.int64)

    def buckets(vecs):
        rows = []
        for rid, radius in enumerate(model.radii()):
            for tid in range(model.L):
                for vid, b in enumerate(model.bucket_ids(tid, radius, vecs)):
                    rows.append((vid, rid, tid, int(b)))
        return rows

    return AnnGateFixture(model=model, points=points, queries=queries,
                          point_buckets=buckets(points),
                          query_buckets=buckets(queries), k=ANN_GATE_K)


COS_GATE_N, COS_GATE_D, COS_GATE_TAU = 80, 8, 0.9
COS_GATE_PLANTED = [(3, 5), (17, 40), (22, 23), (50, 71), (60, 61), (9, 64)]


def make_cosine_gate_fixture(seed: int = 42) -> "np.ndarray":
    """(n, d) INTEGER vectors with planted near-parallel pairs — integer
    coords keep every dot product / squared norm exactly representable in
    both engines, so the brute-force DuckDB oracle and the NumPy block
    matmul agree to the last double bit.  Random 8-d int vectors sit far
    below cos 0.9; the planted pairs (+-1 perturbations) sit near 0.999."""
    import numpy as np

    rng = np.random.default_rng(seed + 23)
    v = rng.integers(-50, 51, size=(COS_GATE_N, COS_GATE_D), dtype=np.int64)
    for a, b in COS_GATE_PLANTED:
        v[b] = v[a] + rng.integers(-1, 2, size=COS_GATE_D)
    return v


def encode_ppm(img) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6) with a header comment (exercises
    the full header grammar in functions/multimodal.decode_ppm)."""
    h, w = img.shape[:2]
    return (b"P6\n# gate fixture\n%d %d\n255\n" % (w, h)) + img.tobytes()


def encode_bmp(img, top_down: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB BMP with 4-byte row padding;
    bottom-up by default, top-down (negative height) when requested."""
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        row = img[y, :, ::-1].tobytes()                    # RGB -> BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    body = b"".join(rows)
    off = 14 + 40
    header = (b"BM" + (off + len(body)).to_bytes(4, "little") + b"\x00" * 4
              + off.to_bytes(4, "little")
              + (40).to_bytes(4, "little")
              + w.to_bytes(4, "little", signed=True)
              + (-h if top_down else h).to_bytes(4, "little", signed=True)
              + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
              + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
              + b"\x00" * 16)
    return header + body


#: Adam7 pass grid, mirrored from the decoder (ISO/IEC 15948 §4.5.2).
_PNG_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def encode_png(data, ctype: int = 2, filters=None, palette=None,
               split_idat: bool = False, depth: int = 8,
               interlace: bool = False) -> bytes:
    """pixel array -> real PNG bytes (ISO/IEC 15948), 8- or 16-bit depth.

    ctype 2: (h, w, 3) RGB.  ctype 6: (h, w, 4) RGBA.  ctype 0: (h, w)
    gray.  ctype 4: (h, w, 2) gray+alpha.  ctype 3: (h, w) palette
    indices + `palette` (n, 3).  `filters` picks the per-scanline filter
    type (0-4; default cycles through all five so Sub/Up/Average/Paeth
    unfiltering is exercised, not just None).  `split_idat` emits two
    IDAT chunks (decoders must concatenate before inflating).
    `depth=16` widens each uint8 sample to v*257 (high byte == v, the
    exact inverse of the decoder's high-byte reduction).  `interlace`
    emits Adam7: seven independently-filtered pass sub-images."""
    import binascii
    import struct
    import zlib

    import numpy as np

    h, w = data.shape[:2]
    ch = 1 if data.ndim == 2 else data.shape[2]
    bpp = ch * depth // 8

    def byte_rows(pix) -> "np.ndarray":
        hh, ww = pix.shape[:2]
        if depth == 16:
            wide = np.ascontiguousarray(
                (pix.astype(np.uint16) * 257).astype(">u2"))
            return wide.view(np.uint8).reshape(hh, ww * bpp)
        return pix.reshape(hh, ww * ch)

    def filter_pass(rows_u8, fts) -> bytes:
        hh, stride = rows_u8.shape
        rows = rows_u8.astype(np.int32)
        out = bytearray()
        prev = np.zeros(stride, np.int32)
        for r in range(hh):
            cur = rows[r]
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, np.int32),
                                     prev[:-bpp]])
            f = fts[r]
            if f == 0:
                raw = cur
            elif f == 1:
                raw = cur - left
            elif f == 2:
                raw = cur - prev
            elif f == 3:
                raw = cur - ((left + prev) >> 1)
            else:
                p = left + prev - upleft
                pa, pb, pc = (np.abs(p - left), np.abs(p - prev),
                              np.abs(p - upleft))
                pred = np.where((pa <= pb) & (pa <= pc), left,
                                np.where(pb <= pc, prev, upleft))
                raw = cur - pred
            out += bytes([f]) + (raw % 256).astype(np.uint8).tobytes()
            prev = cur
        return bytes(out)

    if interlace:
        out = bytearray()
        for x0, y0, xs, ys in _PNG_ADAM7:
            sub = data[y0::ys, x0::xs]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            fts = filters if filters is not None \
                else [(r % 5) for r in range(sub.shape[0])]
            out += filter_pass(byte_rows(sub), fts)
        out = bytes(out)
    else:
        fts = filters if filters is not None \
            else [(r % 5) for r in range(h)]
        out = filter_pass(byte_rows(data), fts)

    def chunk(t: bytes, b: bytes) -> bytes:
        return (struct.pack(">I", len(b)) + t + b
                + struct.pack(">I", binascii.crc32(t + b)))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0,
                       1 if interlace else 0)
    comp = zlib.compress(out)
    png = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        png += chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
    if split_idat and len(comp) > 2:
        mid = len(comp) // 2
        png += chunk(b"IDAT", comp[:mid]) + chunk(b"IDAT", comp[mid:])
    else:
        png += chunk(b"IDAT", comp)
    return png + chunk(b"IEND", b"")


def encode_jpeg(data, q_dc: int = 8, q_ac: int = 16,
                subsample: bool = False,
                restart_interval: int | None = None) -> bytes:
    """pixel array -> real baseline-sequential JPEG bytes (ITU-T T.81):
    JFIF YCbCr conversion, optional 4:2:0 chroma subsampling (2x2 block
    mean), orthonormal forward DCT, flat quantization table (q_dc DC /
    q_ac AC — any table is valid JPEG; it ships in DQT), zigzag + DC
    differencing, and CANONICAL Huffman tables built over the full
    symbol alphabets (DC categories 0-11 at 4 bits, the 162 AC run/size
    symbols at 8 bits) shipped in DHT — a decoder must read the carried
    tables, not assume Annex K's.  (h, w) input -> grayscale
    single-component JPEG; (h, w, 3) -> YCbCr.

    `restart_interval=N` emits a DRI segment and an RSTn marker every N
    MCUs (byte-aligned, DC predictors reset — T.81 F.2).

    Exactness property used by the gate fixture: an image of constant
    8x8 tiles with R==G==B and q_dc=8 round-trips EXACTLY (AC
    coefficients are 0; the orthonormal DCT's DC path divides out)."""
    import struct

    import numpy as np

    from distributed_lsh_spark.functions.multimodal import (
        _JPEG_ZIGZAG, _jpeg_dct_matrix,
    )

    gray = data.ndim == 2
    h, w = data.shape[:2]
    if gray:
        planes = [data.astype(np.float64)]
        samp = [(1, 1)]
    else:
        r, g, b = (data[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

        def down2(p):
            hh = -(-p.shape[0] // 2) * 2
            ww = -(-p.shape[1] // 2) * 2
            q = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])),
                       mode="edge")
            return q.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))

        if subsample:
            planes = [y, down2(cb), down2(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1)] * 3

    qtab = np.full(64, q_ac, np.int64)
    qtab[0] = q_dc                                   # zigzag order: [0]=DC
    dct = _jpeg_dct_matrix()
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    dc_vals = list(range(12))
    ac_vals = [0x00] + [(r_ << 4) | s_ for r_ in range(16)
                        for s_ in range(1, 11)] + [0xF0]
    dc_code = {v: (i, 4) for i, v in enumerate(dc_vals)}
    ac_code = {v: (i, 8) for i, v in enumerate(ac_vals)}

    class BW:
        def __init__(self):
            self.buf, self.acc, self.n = bytearray(), 0, 0

        def put(self, val, nbits):
            for i in range(nbits - 1, -1, -1):
                self.acc = (self.acc << 1) | ((val >> i) & 1)
                self.n += 1
                if self.n == 8:
                    self.buf.append(self.acc)
                    if self.acc == 0xFF:
                        self.buf.append(0x00)       # byte stuffing
                    self.acc, self.n = 0, 0

        def flush(self):
            if self.n:
                self.put((1 << (8 - self.n)) - 1, 8 - self.n)

        def restart(self, m):
            self.flush()
            self.buf += bytes([0xFF, 0xD0 + (m % 8)])

    def put_val(bw, v):
        s = int(abs(v)).bit_length()
        return s, (v + (1 << s) - 1 if v < 0 else v)

    bw = BW()
    pred = [0] * len(planes)
    n_mcu, n_rst = 0, 0
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        padded.append(np.pad(p, ((0, th - p.shape[0]),
                                 (0, tw - p.shape[1])), mode="edge"))
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                bw.restart(n_rst)
                n_rst += 1
                pred = [0] * len(planes)
            n_mcu += 1
            for ci, (p, (sh, sv)) in enumerate(zip(padded, samp)):
                for by in range(sv):
                    for bx in range(sh):
                        y0, x0 = (my * sv + by) * 8, (mx * sh + bx) * 8
                        blk = p[y0:y0 + 8, x0:x0 + 8] - 128.0
                        coeff = dct @ blk @ dct.T
                        zz = np.rint(coeff.ravel()[_JPEG_ZIGZAG]
                                     / qtab).astype(np.int64)
                        diff = int(zz[0]) - pred[ci]
                        pred[ci] = int(zz[0])
                        s, bits_ = put_val(bw, diff)
                        bw.put(*dc_code[s])
                        if s:
                            bw.put(bits_, s)
                        run = 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                bw.put(*ac_code[0xF0])
                                run -= 16
                            s, bits_ = put_val(bw, v)
                            bw.put(*ac_code[(run << 4) | s])
                            bw.put(bits_, s)
                            run = 0
                        if run:
                            bw.put(*ac_code[0x00])   # EOB
    bw.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
            + body

    def dht(tc, th, vals, length):
        bits = [0] * 16
        bits[length - 1] = len(vals)
        return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))

    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    sos = bytes([ncomp])
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
        sos += bytes([ci + 1, 0x00])                 # dc table 0, ac table 0
    sos += bytes([0, 63, 0])                         # Ss, Se, Ah/Al
    out = (b"\xff\xd8"
           + seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
           + seg(0xDB, bytes([0x00])
                 + bytes(int(v) for v in qtab))
           + (seg(0xDD, struct.pack(">H", restart_interval))
              if restart_interval else b"")
           + seg(0xC0, sof)
           + dht(0, 0, dc_vals, 4) + dht(1, 0, ac_vals, 8)
           + seg(0xDA, sos) + bytes(bw.buf) + b"\xff\xd9")
    return out


def encode_wav(pcm, bits: int = 16, rate: int = 8000) -> bytes:
    """(n,) or (n, channels) integer PCM -> RIFF/WAVE.  16-bit signed or
    8-bit unsigned, interleaved channels, with a junk chunk BEFORE fmt to
    exercise the chunk walk in functions/multimodal.decode_wav."""
    import numpy as np

    a = np.asarray(pcm)
    ch = 1 if a.ndim == 1 else a.shape[1]
    if bits == 16:
        data = a.astype("<i2").tobytes()
    else:
        data = a.astype(np.uint8).tobytes()
    block = ch * bits // 8
    fmt = ((1).to_bytes(2, "little") + ch.to_bytes(2, "little")
           + rate.to_bytes(4, "little")
           + (rate * block).to_bytes(4, "little")
           + block.to_bytes(2, "little") + bits.to_bytes(2, "little"))
    junk = b"JUNK" + (3).to_bytes(4, "little") + b"pad\x00"  # odd size, padded
    chunks = junk + b"fmt " + len(fmt).to_bytes(4, "little") + fmt \
        + b"data" + len(data).to_bytes(4, "little") + data \
        + (b"\x00" if len(data) % 2 else b"")
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def encode_y4m(frames, fps: tuple[int, int] = (4, 1)) -> bytes:
    """[(h, w) uint8 luminance planes] -> YUV4MPEG2 C420 stream (neutral
    chroma)."""
    import numpy as np

    h, w = frames[0].shape
    chroma = b"\x80" * (2 * ((w // 2) * (h // 2)))
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420\n" % (w, h, *fps)]
    for f in frames:
        out.append(b"FRAME\n" + np.asarray(f, np.uint8).tobytes() + chroma)
    return b"".join(out)


def make_media_gate_fixture(seed: int = 42) -> list[dict]:
    """Deterministic multimodal gate fixture: known pixel/sample arrays,
    ENCODED to real PPM/BMP/PNG/JPEG/WAV/y4m payloads.  The ground truth is the
    planted arrays (never produced by the decoders), so a driver-gate
    oracle can replay the feature math in SQL over the raw values while
    the engine must DECODE the bytes to reproduce them — decode + feature
    are both value-checked.

    Rows: media_id, kind, mime, width, height, duration_ms, payload,
    plus truth arrays (`pixels` (h,w,3) / `plane` (h,w) / `pcm` ints with
    `pcm_bits`/`pcm_channels`)."""
    import numpy as np

    rng = np.random.default_rng(seed + 77)
    media: list[dict] = []

    def img(mid, h, w, enc, mime, **kw):
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        media.append(dict(media_id=mid, kind="image", mime=mime, width=w,
                          height=h, duration_ms=None, payload=enc(px, **kw),
                          pixels=px))

    img(0, 11, 7, encode_ppm, "image/x-portable-pixmap")
    img(1, 16, 16, encode_ppm, "image/x-portable-pixmap")
    img(2, 10, 6, encode_bmp, "image/bmp")                  # bottom-up
    img(3, 9, 13, encode_bmp, "image/bmp", top_down=True)   # negative height

    # REAL PNGs (stdlib-zlib + scanline-filter decode path): an
    # Adam7-INTERLACED RGB one cycling all five filter types per pass
    # with the IDAT split in two, and an RGBA one (decoder drops alpha
    # -> truth pixels are the RGB planes)
    img(9, 12, 9, encode_png, "image/png", split_idat=True,
        interlace=True)
    rgba = rng.integers(0, 256, size=(8, 14, 4), dtype=np.uint8)
    media.append(dict(media_id=10, kind="image", mime="image/png",
                      width=14, height=8, duration_ms=None,
                      payload=encode_png(rgba, ctype=6),
                      pixels=rgba[:, :, :3].copy()))
    # 16-BIT grayscale PNG (samples widened v*257; decoder reduces via
    # the high byte — exact): decoder replicates the plane to 3
    # channels, so the Rec.601 weighting degenerates to the gray value
    gray = rng.integers(0, 256, size=(7, 11), dtype=np.uint8)
    media.append(dict(media_id=11, kind="image", mime="image/png",
                      width=11, height=7, duration_ms=None,
                      payload=encode_png(gray, ctype=0, depth=16),
                      pixels=np.repeat(gray[:, :, None], 3, axis=2)))
    # palette PNG: indices resolve through PLTE
    plte = rng.integers(0, 256, size=(6, 3), dtype=np.uint8)
    idx = rng.integers(0, 6, size=(9, 5), dtype=np.uint8)
    media.append(dict(media_id=12, kind="image", mime="image/png",
                      width=5, height=9, duration_ms=None,
                      payload=encode_png(idx, ctype=3, palette=plte),
                      pixels=plte[idx].copy()))
    # REAL baseline JPEG: constant 8x8 tiles with R==G==B round-trip
    # EXACTLY through the lossy pipeline (AC coefficients are all zero
    # and the orthonormal DCT's DC path divides out against q_dc=8), so
    # the planted-array oracle contract holds for a DCT codec too
    jt = rng.integers(10, 246, size=(2, 3), dtype=np.uint8)
    jg = np.repeat(np.repeat(jt, 8, axis=0), 8, axis=1)
    jrgb = np.repeat(jg[:, :, None], 3, axis=2)
    media.append(dict(media_id=13, kind="image", mime="image/jpeg",
                      width=24, height=16, duration_ms=None,
                      payload=encode_jpeg(jrgb), pixels=jrgb.copy()))

    def wav(mid, n, bits, channels, rate=8000):
        if bits == 16:
            pcm = rng.integers(-32768, 32768, size=(n, channels)
                               if channels > 1 else n).astype(np.int64)
        else:
            pcm = rng.integers(0, 256, size=n).astype(np.int64)
        media.append(dict(media_id=mid, kind="audio", mime="audio/wav",
                          width=None, height=None,
                          duration_ms=int(n * 1000 / rate),
                          payload=encode_wav(pcm, bits=bits, rate=rate),
                          pcm=pcm, pcm_bits=bits, pcm_channels=channels))

    wav(4, 320, 16, 1)
    wav(5, 300, 16, 2)      # stereo -> mono mean
    wav(6, 200, 8, 1)
    wav(8, 50, 16, 1)       # shorter than FEATURE_DIM: empty RMS windows
                            # must yield 0.0 rows, not dropped rows

    frames = [rng.integers(0, 256, size=(8, 12), dtype=np.uint8)
              for _ in range(5)]
    media.append(dict(media_id=7, kind="video", mime="video/x-y4m",
                      width=12, height=8, duration_ms=1250,
                      payload=encode_y4m(frames), plane=frames[0]))
    return media


def pages_spark_df(spark, corpus: PagesCorpus):
    """Corpus -> Spark DataFrame with the authoritative pages schema +
    doc_id = row index (tests join on it; production uses xxhash64(url))."""
    data = [(i, r["url"], r["warc_ts"], bytearray(r["html"]), r["text"], r["lang"])
            for i, r in enumerate(corpus.rows)]
    return spark.createDataFrame(
        data, "doc_id long, url string, warc_ts timestamp, html binary, "
              "text string, lang string")
