"""Multimodal columns: image/audio/video as opaque `binary` with typed
metadata; decode/feature-extract/resize/frame-sample as Arrow-vectorized
UDFs over mapInPandas.

Decode support, no external libs:
  * REAL pure-NumPy decoders for the formats a lib-free container can
    honestly parse: PPM (P6) and BMP (24-bit BI_RGB) -> (h, w, 3) uint8
    pixels; PNG (8/16-bit gray/palette/RGB/GA/RGBA, non-interlaced AND
    Adam7-interlaced) via stdlib zlib + per-scanline NumPy unfiltering
    — the full public ISO/IEC 15948 pipeline; baseline sequential JPEG (ITU-T T.81:
    marker walk, carried-DHT Huffman entropy decode, dezigzag +
    dequantize, orthonormal 8x8 IDCT, 4:4:4/4:2:0/4:2:2/grayscale
    sampling, JFIF YCbCr->RGB); then a real resize + feature step (8x8
    nearest-neighbor luminance thumbnail = FEATURE_DIM floats);
    RIFF/WAVE PCM (8/16-bit) -> mono float samples, then a real RMS
    loudness-envelope feature (FEATURE_DIM time windows); and
    YUV4MPEG2 (y4m) raw video -> per-frame luminance planes + frame
    rate, so frame sampling is a REAL decode too.
  * formats that genuinely need a codec lib (webp/avif, progressive or
    arithmetic or 12-bit jpeg, packed 1/2/4-bit png, mp3/aac, mp4/mkv
    containers)
    raise NotImplementedError at the same seam — libwebp/ffmpeg would
    plug in there on a real deployment.
  * `fake=True` keeps the original byte-histogram pseudo-features for
    plumbing tests with arbitrary payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
])

FEATURE_DIM = 64


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8.  Full header grammar: tokens
    separated by whitespace, '#' comments to end-of-line, single whitespace
    byte after maxval, then raw RGB rows."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 ppm")
    pos, toks = 2, []
    while len(toks) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        toks.append(int(payload[start:pos]))
    w, h, maxval = toks
    if maxval != 255:
        raise NotImplementedError("only maxval=255 ppm supported")
    pos += 1                                  # single whitespace after maxval
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3).copy()


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed (BI_RGB) BMP -> (h, w, 3) uint8 RGB.  Handles
    4-byte row padding and bottom-up (h > 0) / top-down (h < 0) rows."""
    if payload[:2] != b"BM":
        raise ValueError("not a bmp")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit BI_RGB bmp supported")
    stride = (w * 3 + 3) & ~3
    rows = abs(h)
    raw = np.frombuffer(payload, dtype=np.uint8, count=stride * rows,
                        offset=off).reshape(rows, stride)
    img = raw[:, : w * 3].reshape(rows, w, 3)[:, :, ::-1]      # BGR -> RGB
    if h > 0:
        img = img[::-1]                                         # bottom-up
    return img.copy()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


#: Adam7 pass grid (ISO/IEC 15948 §4.5.2): (x_start, y_start, x_step,
#: y_step) per pass; each pass is an independently-filtered sub-image.
_PNG_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_unfilter(raw: np.ndarray, off: int, hh: int, ww: int,
                  bpp: int) -> tuple[np.ndarray, int]:
    """Unfilter `hh` scanlines of `ww`-pixel rows (`bpp` bytes/pixel)
    starting at byte `off` of the inflated stream -> ((hh, ww*bpp)
    uint8, next offset).  Sub/Up rows are vector ops (uint8 accumulate
    wraps mod 256 per the spec); Average/Paeth are inherently
    left-dependent and walk bytes within the row."""
    stride = ww * bpp
    need = hh * (stride + 1)
    if off + need > len(raw):
        raise ValueError("png pixel data size mismatch")
    rows = raw[off:off + need].reshape(hh, stride + 1)
    out = np.empty((hh, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for r in range(hh):
        ft, cur = rows[r, 0], rows[r, 1:].copy()
        if ft == 0:
            pass
        elif ft == 1:                                # Sub
            for c in range(bpp):
                np.add.accumulate(cur[c::bpp], out=cur[c::bpp],
                                  dtype=np.uint8)
        elif ft == 2:                                # Up
            cur += prev
        elif ft == 3:                                # Average
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(cur[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:                                # Paeth
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[i] = (int(cur[i]) + pr) & 0xFF
        else:
            raise ValueError(f"bad png filter type {ft}")
        out[r] = cur
        prev = cur
    return out, off + need


def decode_png(payload: bytes) -> np.ndarray:
    """PNG (ISO/IEC 15948) -> (h, w, 3) uint8 RGB, pure stdlib-zlib +
    NumPy: chunk walk -> concatenated-IDAT inflate -> per-scanline
    unfiltering (filters 0-4: None/Sub/Up/Average/Paeth).  8-bit AND
    16-bit depths (16-bit samples keep their high byte — the standard
    8-bit reduction), color types 0 (gray), 2 (RGB), 3 (palette via
    PLTE, 8-bit), 4 (gray+alpha) and 6 (RGBA), both non-interlaced and
    Adam7-interlaced (7 independently-filtered sub-images scattered on
    the pass grid); alpha is dropped, gray replicated.  Packed 1/2/4-bit
    depths stay behind the NotImplementedError seam."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a png")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        typ = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + ln]
        if typ == b"IHDR":
            ihdr = body
        elif typ == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln                              # len + type + crc
    if ihdr is None or not idat:
        raise ValueError("png missing IHDR/IDAT")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, _comp, _filt, interlace = ihdr[8:13]
    if depth not in (8, 16):
        raise NotImplementedError(
            "packed 1/2/4-bit png depths are the documented seam")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None or (ctype == 3 and plte is None) \
            or (ctype == 3 and depth == 16):
        raise ValueError(f"bad png color type {ctype}")
    sample_bytes = depth // 8
    bpp = channels * sample_bytes
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if interlace == 0:
        out, used = _png_unfilter(raw, 0, h, w, bpp)
        if used != len(raw):
            raise ValueError("png pixel data size mismatch")
        px = out.reshape(h, w, bpp)
    elif interlace == 1:                            # Adam7
        px = np.zeros((h, w, bpp), np.uint8)
        off = 0
        for x0, y0, xs, ys in _PNG_ADAM7:
            wp = -(-(w - x0) // xs) if w > x0 else 0
            hp = -(-(h - y0) // ys) if h > y0 else 0
            if wp <= 0 or hp <= 0:
                continue                            # empty pass: no bytes
            sub, off = _png_unfilter(raw, off, hp, wp, bpp)
            px[y0::ys, x0::xs, :] = sub.reshape(hp, wp, bpp)
        if off != len(raw):
            raise ValueError("png pixel data size mismatch")
    else:
        raise ValueError(f"bad png interlace method {interlace}")
    if sample_bytes == 2:                           # keep the high byte
        px = px.reshape(h, w, channels, 2)[:, :, :, 0]
    if ctype == 3:
        return plte[px[:, :, 0]].copy()
    if channels == 1:
        return np.repeat(px, 3, axis=2).copy()
    if channels == 2:                                # gray+alpha: drop alpha
        return np.repeat(px[:, :, :1], 3, axis=2).copy()
    return px[:, :, :3].copy()


#: zig-zag scan order (ITU-T T.81 Figure 5): index = zigzag position,
#: value = row-major position inside the 8x8 block.
_JPEG_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _jpeg_dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis C: spatial = C.T @ coeffs @ C."""
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    c[0] *= 1 / np.sqrt(2)
    return c * 0.5


class _JpegBitReader:
    """MSB-first bit reader over an entropy-coded segment with the
    0xFF00 byte stuffing removed by the caller."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _jpeg_extend(v: int, t: int) -> int:
    """DIFF/coefficient sign extension (T.81 F.2.2.1 EXTEND)."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


def _jpeg_huff_decode(reader: _JpegBitReader, table: dict) -> int:
    code, length = 0, 0
    while True:
        code = (code << 1) | reader.read_bit()
        length += 1
        if (length, code) in table:
            return table[(length, code)]
        if length > 16:
            raise ValueError("invalid jpeg huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG (ITU-T T.81 / JFIF) -> (h, w, 3) uint8
    RGB, pure stdlib + NumPy: marker walk (DQT/DHT/SOF0/SOS), Huffman
    entropy decode with byte unstuffing, dequantize + dezigzag,
    orthonormal 8x8 IDCT, chroma upsampling for any (h_i, v_i) sampling
    (4:4:4 / 4:2:0 / 4:2:2 / grayscale), JFIF YCbCr -> RGB; restart
    intervals (DRI/RSTn — common in real crawled images) split the
    entropy stream into independently-aligned segments with DC
    predictors reset.  Progressive (SOF2), arithmetic coding, and
    12-bit precision stay behind the NotImplementedError seam."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a jpeg")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}        # (class, id) -> code table
    frame = None
    ri = 0                                        # restart interval (MCUs)
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad jpeg marker stream")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:                          # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                                # parameterless
        ln = int.from_bytes(payload[pos:pos + 2], "big")
        body = payload[pos + 2:pos + ln]
        pos += ln
        if marker == 0xDB:                          # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                if pq != 0:
                    raise NotImplementedError("16-bit jpeg quant tables")
                qt[tq] = np.frombuffer(body[p + 1:p + 65],
                                       np.uint8).astype(np.int64)
                p += 65
        elif marker == 0xC4:                        # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1:p + 17])
                vals = body[p + 17:p + 17 + sum(bits)]
                table, code, vi = {}, 0, 0
                for length in range(1, 17):
                    for _ in range(bits[length - 1]):
                        table[(length, code)] = vals[vi]
                        code += 1
                        vi += 1
                    code <<= 1
                huff[(tc, th)] = table
                p += 17 + sum(bits)
        elif marker == 0xC0:                        # SOF0 baseline
            prec, h, w = body[0], int.from_bytes(body[1:3], "big"), \
                int.from_bytes(body[3:5], "big")
            if prec != 8:
                raise NotImplementedError("12-bit jpeg precision")
            comps = []
            for i in range(body[5]):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential jpeg (SOF0) supported")
        elif marker == 0xDD:                        # DRI
            ri = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:                        # SOS
            if frame is None:
                raise ValueError("jpeg SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tdta = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append({**comp, "dc": tdta >> 4, "ac": tdta & 15})
            # entropy stream: strip stuffed zero bytes; RSTn markers
            # close one restart segment and open the next; any other
            # marker ends the scan
            segments, raw = [], bytearray()
            p = pos
            while p < len(payload):
                b = payload[p]
                if b == 0xFF:
                    nxt = payload[p + 1]
                    if nxt == 0x00:
                        raw.append(0xFF)
                        p += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        segments.append(bytes(raw))
                        raw = bytearray()
                        p += 2
                        continue
                    break
                raw.append(b)
                p += 1
            segments.append(bytes(raw))
            return _jpeg_decode_scan(frame, scan, qt, huff, segments, ri)
    raise ValueError("jpeg missing SOS scan")


def _jpeg_decode_scan(frame, scan, qt, huff, segments: list,
                      ri: int) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {i: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8))
              for i, c in enumerate(scan)}
    dct = _jpeg_dct_matrix()
    seg_iter = iter(segments)
    reader = _JpegBitReader(next(seg_iter))
    pred = [0] * len(scan)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if ri and n_mcu and n_mcu % ri == 0:
                # restart boundary: next segment, byte-aligned fresh
                # reader, DC predictors reset (T.81 F.2.1.3.1)
                reader = _JpegBitReader(next(seg_iter))
                pred = [0] * len(scan)
            n_mcu += 1
            for ci, c in enumerate(scan):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, np.int64)
                        t = _jpeg_huff_decode(reader, huff[(0, c["dc"])])
                        diff = _jpeg_extend(reader.receive(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _jpeg_huff_decode(reader,
                                                   huff[(1, c["ac"])])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:       # ZRL
                                    k += 16
                                    continue
                                break             # EOB
                            k += r
                            zz[k] = _jpeg_extend(reader.receive(s), s)
                            k += 1
                        # DQT tables are stored in zigzag order (T.81
                        # B.2.4.1): dequantize in the zigzag domain,
                        # then scatter to natural order
                        block = np.zeros(64)
                        block[_JPEG_ZIGZAG] = zz * qt[c["tq"]]
                        px = dct.T @ block.reshape(8, 8) @ dct
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px + 128.0
    # upsample every component to full (h, w)
    full = []
    for ci, c in enumerate(scan):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                      hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:                              # grayscale
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes -> (h, w, 3) uint8.  Compressed formats
    without a pure-spec decoder are the documented NotImplementedError
    seam (libwebp/ffmpeg on a real deployment)."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        return decode_jpeg(payload)
    raise NotImplementedError(
        "image decoding beyond PPM(P6)/BMP(24-bit)/PNG(8-bit)/"
        "baseline JPEG (e.g. webp/avif) requires a codec lib — not in "
        "this container")


def image_feature(img: np.ndarray) -> np.ndarray:
    """Real resize + feature step: nearest-neighbor 8x8 luminance thumbnail
    (Rec.601 weights; (h, w) inputs are already luminance), FEATURE_DIM
    float32 in [0, 1]."""
    h, w = img.shape[:2]
    yi = np.minimum((np.arange(8) + 0.5) * h / 8, h - 1).astype(np.int64)
    xi = np.minimum((np.arange(8) + 0.5) * w / 8, w - 1).astype(np.int64)
    thumb = img[yi][:, xi].astype(np.float64)
    lum = thumb if img.ndim == 2 else thumb @ np.array([0.299, 0.587, 0.114])
    return (lum / 255.0).ravel().astype(np.float32)


def decode_y4m(payload: bytes) -> tuple[list[np.ndarray], float]:
    """YUV4MPEG2 raw video -> ([per-frame (h, w) uint8 luminance planes],
    fps).  Full stream grammar: 'YUV4MPEG2' + space-separated W/H/F/I/A/C
    parameters to newline, then per frame 'FRAME[params]\\n' + planar YUV
    bytes.  Chroma planes are sized per the C colourspace tag and skipped —
    the feature step uses luminance only (image_feature's 2-D path)."""
    nl = payload.index(b"\n")
    header = payload[:nl].split(b" ")
    if header[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    num, den, cs = 30, 1, b"420"
    for tok in header[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = (int(x) for x in tok[1:].split(b":"))
        elif tok[:1] == b"C":
            cs = tok[1:]
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    # EXACT 8-bit tag set — prefix matching would parse high-bit-depth
    # tags (C420p10, C422p12, ...) as 8-bit and compute frame_bytes at
    # half the real size, yielding garbage luminance; those must hit the
    # NotImplementedError seam instead.
    if cs in (b"420", b"420jpeg", b"420mpeg2", b"420paldv"):
        frame_bytes = w * h + 2 * ((w // 2) * (h // 2))
    elif cs == b"422":
        frame_bytes = w * h + 2 * ((w // 2) * h)
    elif cs == b"444":
        frame_bytes = 3 * w * h
    elif cs == b"mono":
        frame_bytes = w * h
    else:
        raise NotImplementedError(f"y4m colourspace {cs!r} not supported")
    frames, pos = [], nl + 1
    while pos < len(payload):
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("bad y4m FRAME marker")
        pos = payload.index(b"\n", pos) + 1
        y = np.frombuffer(payload, np.uint8, count=w * h, offset=pos)
        frames.append(y.reshape(h, w).copy())
        pos += frame_bytes
    return frames, num / den


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM -> (mono float64 samples in [-1, 1], sample_rate).
    Full chunk walk (fmt may not be the first chunk; chunks are 2-byte
    aligned).  8-bit unsigned and 16-bit signed PCM; multi-channel is
    averaged to mono."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)                  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("wav missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1:
        raise NotImplementedError(
            "compressed audio (mp3/aac/...) requires ffmpeg — not in this "
            "container; PCM wav decodes natively")
    if bits == 16:
        s = np.frombuffer(data, dtype="<i2",
                          count=len(data) // 2).astype(np.float64) / 32768.0
    elif bits == 8:
        s = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError("only 8/16-bit PCM wav supported")
    if n_channels > 1:
        s = s[: len(s) - len(s) % n_channels].reshape(-1, n_channels).mean(axis=1)
    return s, sample_rate


def audio_feature(samples: np.ndarray, _rate: int | None = None) -> np.ndarray:
    """Real audio feature step: RMS loudness envelope over FEATURE_DIM
    equal-width time windows, float32 in [0, 1]."""
    n = len(samples)
    if n == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    edges = (np.arange(FEATURE_DIM + 1) * n) // FEATURE_DIM
    sq = np.concatenate(([0.0], np.cumsum(samples * samples)))
    counts = np.maximum(np.diff(edges), 1)
    rms = np.sqrt(np.diff(sq[edges]) / counts)
    return rms.astype(np.float32)


def _decode_image(payload: bytes, fake: bool = True) -> np.ndarray:
    """payload -> FEATURE_DIM float32 features.

    fake=False: REAL decode (PPM/BMP) + 8x8 luminance thumbnail.
    fake=True: deterministic pseudo-features from the byte histogram, so
    plumbing tests can use arbitrary payload bytes."""
    if not fake:
        return image_feature(decode_image(payload))
    hist = np.bincount(np.frombuffer(payload or b"\x00", dtype=np.uint8),
                       minlength=256).astype(np.float64)
    hist /= max(hist.sum(), 1.0)
    # fixed random projection (seeded) of the byte histogram
    rng = np.random.RandomState(1234)
    proj = rng.standard_normal((FEATURE_DIM, 256))
    return (proj @ hist).astype(np.float32)


def media_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """(media_id, payload, ...) -> (media_id, kind, feature array<float>).

    mapInPandas: batch-iterating Arrow frames keeps peak memory bounded by
    batch size even when payloads are MBs each — at scale, pair with
    spark.sql.execution.arrow.maxRecordsPerBatch to cap batch bytes.
    """
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ])

    def one(kind: str, payload: bytes) -> list[float]:
        if not fake and kind == "audio":
            return audio_feature(*decode_wav(payload)).tolist()
        if not fake and kind == "video":
            frames, _ = decode_y4m(payload)
            return image_feature(frames[0]).tolist()
        return _decode_image(payload, fake=fake).tolist()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [one(k, p) for k, p in zip(pdf["kind"], pdf["payload"])]
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"], "feature": feats})

    return df.mapInPandas(batches, schema=out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """video rows -> one row per sampled frame (media_id, frame_ts_ms,
    feature).

    fake=False: REAL y4m decode — one sample per `every_ms` of stream time
    (duration = n_frames / fps from the stream itself), feature = 8x8
    luminance thumbnail of the frame nearest each sample instant.
    fake=True: plumbing stub — features derived deterministically from
    (payload bytes, frame index), duration taken from the metadata column."""
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_ts_ms", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_ts_ms": [], "feature": []}
            for mid, dur, payload in zip(pdf["media_id"], pdf["duration_ms"],
                                         pdf["payload"]):
                if fake:
                    n = max(1, int(dur or 0) // every_ms)
                    base = _decode_image(payload, fake=True)
                    samples = []
                    for j in range(n):
                        f = base.copy()
                        f[j % FEATURE_DIM] += float(j + 1)  # per-frame twist
                        samples.append((j * every_ms, f))
                else:
                    frames, fps = decode_y4m(payload)
                    dur_ms = int(len(frames) / fps * 1000)
                    n = max(1, dur_ms // every_ms)
                    samples = []
                    for j in range(n):
                        ts = j * every_ms
                        idx = min(int(ts * fps / 1000), len(frames) - 1)
                        samples.append((ts, image_feature(frames[idx])))
                for ts, f in samples:
                    rows["media_id"].append(mid)
                    rows["frame_ts_ms"].append(ts)
                    rows["feature"].append(f.tolist())
            yield pd.DataFrame(rows)

    return df.where(F.col("kind") == "video").mapInPandas(batches, schema=out_schema)
