"""Multimodal columns: opaque binary payloads + typed metadata (⊕ J11).

The reference stores media as URL columns (og_image_url,
migrations-atlas/migrations/20260301000000_add_og_image_url_to_feeds.sql;
fetcher alt-backend/app/shared/driver/alt_db/ogp_image_driver.go). The
north-star generalization treats image/audio/video as first-class
`binary` columns with a typed metadata struct, and runs decode /
feature-extract / resize / frame-sample as Arrow-batched kernels.

Spark-side plumbing here is real and tested: pinned schema, Arrow batch
shape (mapInPandas over record batches), partition-friendly layout
(payloads stay with their rows; kernels are narrow maps — no shuffle).
REAL codecs implemented with the stdlib + numpy: uncompressed 24-bit
BMP (`_decode_bmp`), zlib-compressed PNG with full scanline
unfiltering (`_decode_png`), and PCM WAV (`_decode_wav`). Other MIME
types (JPEG, compressed audio, video) fall back to `_decode_stub`, a
deterministic fake — those codecs are not in this container. Swapping
the stub for PIL/ffmpeg changes no plan, schema, or partitioning; the
three real kernels are the proof of that claim.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "media_table",
    "decode_features",
    "resize_plan",
    "frame_sample_plan",
    "image_ahash",
    "image_near_dup_pairs",
    "audio_bandhash",
]

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def media_table(df: DataFrame) -> DataFrame:
    """Validate/coerce an arbitrary frame into the pinned media schema."""
    return df.select(
        F.col("media_id").cast("long"),
        F.col("payload").cast("binary"),
        F.col("meta").cast(MEDIA_SCHEMA["meta"].dataType),
    )


def _bmp_luma(payload: bytes | None):
    """REAL decode of an uncompressed 24-bit BMP (stdlib struct + numpy,
    no external codec) to its 2-D BT.601 luminance matrix (float64,
    0..255), CANONICALIZED top-down; None when the payload is not a
    decodable BMP. Orientation is a per-file property (positive height
    = bottom-up, negative = top-down), so consumers with 2-D structure
    (the aHash grid) would silently miss a true duplicate stored with
    the other sign — or the same image saved as PNG (always top-down) —
    if rows were left as stored; column-band pooling never noticed."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    try:
        (offset,) = struct.unpack_from("<I", payload, 10)
        (hdr_size,) = struct.unpack_from("<I", payload, 14)
        if hdr_size < 40:
            return None
        w, h = struct.unpack_from("<ii", payload, 18)
        _planes, bpp = struct.unpack_from("<HH", payload, 26)
        (compression,) = struct.unpack_from("<I", payload, 30)
    except struct.error:
        return None
    if compression != 0 or bpp != 24 or w <= 0 or h == 0:
        return None
    h_abs = abs(h)
    row_size = ((w * 3 + 3) // 4) * 4
    if len(payload) < offset + row_size * h_abs:
        return None
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h_abs, offset=offset
    ).reshape(h_abs, row_size)
    pix = rows[:, : w * 3].reshape(h_abs, w, 3).astype(np.float64)
    # BGR byte order: BT.601 luma = 0.114 B + 0.587 G + 0.299 R.
    lum = pix[:, :, 0] * 0.114 + pix[:, :, 1] * 0.587 + pix[:, :, 2] * 0.299
    # Positive height = bottom-up storage: flip to top-down canonical.
    return lum[::-1] if h > 0 else lum


def _band_pool(lum, dim: int) -> list[float]:
    """Mean luminance over `dim` vertical column bands, scaled [0,1]."""
    import numpy as np

    band = (np.arange(lum.shape[1]) * dim) // lum.shape[1]
    return [
        float(lum[:, band == i].mean()) / 255.0 if (band == i).any() else 0.0
        for i in range(dim)
    ]


def _decode_bmp(payload: bytes | None, dim: int) -> list[float] | None:
    lum = _bmp_luma(payload)
    return None if lum is None else _band_pool(lum, dim)


def _png_luma(payload: bytes | None):
    """REAL decode of a PNG (stdlib zlib + struct + numpy, no external
    codec) to its 2-D BT.601 luminance matrix: chunk walk, IDAT
    inflate, full scanline unfilter (filter types 0-4:
    None/Sub/Up/Average/Paeth per the PNG spec §9). Supports 8-bit
    greyscale (color type 0), RGB (2) and RGBA (6), non-interlaced.
    Returns None for anything else (palette, 16-bit, Adam7) — callers
    fall back to the stub.
    """
    import struct
    import zlib

    import numpy as np

    sig = b"\x89PNG\r\n\x1a\n"
    if payload is None or len(payload) < len(sig) + 25 or payload[: len(sig)] != sig:
        return None
    pos = len(sig)
    ihdr = None
    idat = bytearray()
    try:
        while pos + 8 <= len(payload):
            (clen,) = struct.unpack_from(">I", payload, pos)
            ctype = payload[pos + 4 : pos + 8]
            body = payload[pos + 8 : pos + 8 + clen]
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", body)
            elif ctype == b"IDAT":
                idat.extend(body)
            elif ctype == b"IEND":
                break
            pos += 12 + clen  # len + type + data + crc
        if ihdr is None or not idat:
            return None
        w, h, depth, color, _comp, _filt, interlace = ihdr
        channels = {0: 1, 2: 3, 6: 4}.get(color)
        if channels is None or depth != 8 or interlace != 0 or w == 0 or h == 0:
            return None
        raw = zlib.decompress(bytes(idat))
    except (struct.error, zlib.error):
        return None
    stride = w * channels
    if len(raw) < h * (stride + 1):
        return None
    lines = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    filters, data = lines[:, 0], lines[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(h):
        f = filters[y]
        cur = data[y].astype(np.int32)
        prior = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if f == 0:  # None
            rec = cur
        elif f == 2:  # Up
            rec = cur + prior
        elif f in (1, 3, 4):  # Sub/Average/Paeth need left-to-right recurrence
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                # rec holds already-unfiltered (masked) bytes: the spec's
                # Raw(x-bpp) operand is the reconstructed byte, so mask
                # BEFORE it is read back as `left`.
                left = rec[x - bpp] if x >= bpp else 0
                if f == 1:
                    rec[x] = (cur[x] + left) & 0xFF
                elif f == 3:
                    rec[x] = (cur[x] + ((left + prior[x]) >> 1)) & 0xFF
                else:
                    ul = prior[x - bpp] if x >= bpp else 0
                    p = left + prior[x] - ul
                    pa, pb, pc = abs(p - left), abs(p - prior[x]), abs(p - ul)
                    pred = left if pa <= pb and pa <= pc else (prior[x] if pb <= pc else ul)
                    rec[x] = (cur[x] + pred) & 0xFF
        else:
            return None
        out[y] = rec & 0xFF
    pix = out.reshape(h, w, channels).astype(np.float64)
    if channels == 1:
        return pix[:, :, 0]
    # RGB(A) byte order: BT.601 luma = 0.299 R + 0.587 G + 0.114 B
    return pix[:, :, 0] * 0.299 + pix[:, :, 1] * 0.587 + pix[:, :, 2] * 0.114


def _decode_png(payload: bytes | None, dim: int) -> list[float] | None:
    lum = _png_luma(payload)
    return None if lum is None else _band_pool(lum, dim)


def _decode_wav(payload: bytes | None, dim: int) -> list[float] | None:
    """REAL decode of a PCM WAV (RIFF header walk, stdlib struct + numpy,
    no external codec): accept format 1 (integer PCM) at 8/16/32 bits,
    mono or multi-channel (channels are averaged), then pool RMS
    amplitude over `dim` time bands, scaled to [0,1]. Returns None when
    the payload is not a decodable PCM WAV (caller falls back to the
    stub). The chunk walk honors chunk sizes + word alignment, so extra
    chunks (LIST, fact, ...) in any order are fine.
    """
    import struct

    import numpy as np

    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    fmt = None
    data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_format, channels, _rate, _byte_rate, _block, bits = fmt
    if audio_format != 1 or channels < 1 or bits not in (8, 16, 32):
        return None
    dtype, full = {8: (np.uint8, 128.0), 16: (np.int16, 32768.0), 32: (np.int32, 2147483648.0)}[bits]
    n = len(data) // (bits // 8) // channels * channels
    if n == 0:
        return None
    samples = np.frombuffer(data, dtype=dtype, count=n).astype(np.float64)
    if bits == 8:
        samples -= 128.0  # 8-bit WAV is unsigned, centered at 128
    mono = samples.reshape(-1, channels).mean(axis=1) / full
    if len(mono) % dim == 0:
        # Exact-divisibility fast path (identical band mapping: with
        # len = dim*s the band index (idx*dim)//len assigns s
        # consecutive samples per band): one vectorized reshape-RMS
        # instead of dim masked selects — the _ahash64 device on the
        # time axis (measured ~3x on the q134 synthesis, where every
        # band is a single sample).
        seg = mono.reshape(dim, -1)
        return [float(x) for x in np.sqrt((seg * seg).mean(axis=1))]
    band = (np.arange(len(mono)) * dim) // len(mono)
    out = []
    for i in range(dim):
        seg = mono[band == i]
        out.append(float(np.sqrt(np.mean(seg * seg))) if seg.size else 0.0)
    return out


def _decode_stub(payload: bytes | None, mime: str | None, dim: int) -> list[float]:
    """Deterministic fake decoder for MIME types without a real kernel
    here (compressed image/audio codecs are not in this container). A
    real kernel replaces only this function — see `_decode_bmp` for the
    in-tree proof; everything around it (Arrow batching, schema,
    partitioning) is production shape. The fake hashes payload bytes
    into a stable unit-scale vector so tests can assert exact values.
    """
    if payload is None:
        return [0.0] * dim
    acc = 2166136261
    out = []
    for i in range(dim):
        for b in payload[i::dim] or b"\x00":
            acc = (acc ^ b) * 16777619 % (1 << 32)
        out.append(((acc % 2048) / 1024.0) - 1.0)
    return out


def _decode(payload: bytes | None, mime: str | None, dim: int) -> list[float]:
    """Codec dispatch: real BMP/PNG/WAV kernels, stub elsewhere."""
    if mime == "image/bmp":
        real = _decode_bmp(payload, dim)
        if real is not None:
            return real
    elif mime == "image/png":
        real = _decode_png(payload, dim)
        if real is not None:
            return real
    elif mime in ("audio/wav", "audio/x-wav", "audio/wave"):
        real = _decode_wav(payload, dim)
        if real is not None:
            return real
    return _decode_stub(payload, mime, dim)


def decode_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """binary payload → feature vector, Arrow-batched (mapInPandas).

    The kernel sees pandas DataFrames of whole Arrow record batches
    (spark.sql.execution.arrow.maxRecordsPerBatch rows each), not Python
    rows — the §2.L surface for external-model/codec UDFs (I14-style).
    Narrow map: runs inside the scan stage, preserves partitioning.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["meta"].map(
                        lambda m: None if m is None else m["mime"]
                    ),
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ).astype("int64"),
                    "feature": [
                        _decode(p, None if m is None else m["mime"], dim)
                        for p, m in zip(pdf["payload"], pdf["meta"])
                    ],
                }
            )

    return media.mapInPandas(kernel, schema=_FEATURE_SCHEMA)


def resize_plan(media: DataFrame, max_px: int = 512) -> DataFrame:
    """Resize planning is pure metadata math — it never decodes: the
    scale factor and target dims come from the typed meta struct
    (JVM-side), so the expensive kernel runs only on rows that need it.
    """
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        F.greatest(w, h) > max_px, max_px / F.greatest(w, h).cast("double")
    ).otherwise(F.lit(1.0))
    return media.select(
        "media_id",
        "payload",
        "meta",
        scale.alias("scale"),
        F.ceil(w * scale).cast("int").alias("target_w"),
        F.ceil(h * scale).cast("int").alias("target_h"),
        (scale < 1.0).alias("needs_resize"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling as a lateral explode of timestamps derived
    from meta.duration_ms — the decode of each sampled frame is the
    stubbed kernel's job; the sampling plan itself is columnar."""
    n = (F.col("meta.duration_ms") / every_ms).cast("int")
    return media.filter(F.col("meta.duration_ms").isNotNull()).select(
        "media_id",
        F.explode(
            F.transform(F.sequence(F.lit(0), n), lambda i: i * every_ms)
        ).alias("frame_ts_ms"),
    )


def _ahash64(lum, grid: int = 8) -> int:
    """Average-hash of a luminance matrix: pool to a grid x grid block-
    mean thumbnail (same integer band mapping as the feature pooling),
    threshold each block at the thumbnail mean (>= -> 1), pack row-major
    into a SIGNED 64-bit int (grid=8). The standard perceptual aHash
    (Krawetz's average hash, the cheapest of the pHash family;
    reference analog: the og-image payloads of
    alt-backend/app/shared/driver/alt_db/ogp_image_driver.go are the
    rows this dedups): brightness/contrast shifts move
    every block AND the mean together, so the bit pattern survives them;
    content changes flip bits roughly in proportion to changed area.
    """
    import numpy as np

    h, w = lum.shape
    if h % grid == 0 and w % grid == 0:
        # Exact-divisibility fast path (identical block mapping: with
        # h = grid*s the band index (r*grid)//h assigns s consecutive
        # rows per band): one vectorized reshape-mean instead of
        # grid*grid masked means — measured ~4x on the q126 synthesis
        # (8x8 inputs make the generic loop pure Python overhead).
        blocks = lum.reshape(grid, h // grid, grid, w // grid).mean(
            axis=(1, 3)
        )
    else:
        rb = (np.arange(h) * grid) // h
        cb = (np.arange(w) * grid) // w
        blocks = np.zeros((grid, grid), dtype=np.float64)
        for r in range(grid):
            rows = lum[rb == r]
            if rows.size == 0:
                continue
            for c in range(grid):
                cell = rows[:, cb == c]
                blocks[r, c] = cell.mean() if cell.size else 0.0
    mean = blocks.mean()
    bits = 0
    for r in range(grid):
        for c in range(grid):
            if blocks[r, c] >= mean:
                bits |= 1 << (r * grid + c)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


_AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("ahash", T.LongType()),
    ]
)


def image_ahash(media: DataFrame, grid: int = 8) -> DataFrame:
    """(media_id, ahash) — 64-bit perceptual average-hash per image,
    NULL for payloads the real kernels cannot decode (JPEG/video stay
    declared stubs; hashing a stub vector would manufacture fake
    near-dups between unrelated files). Arrow-batched mapInPandas,
    narrow (runs inside the scan stage) — the image sibling of
    ``simhash_bits``."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                mime = None if m is None else m["mime"]
                lum = None
                if mime == "image/bmp":
                    lum = _bmp_luma(p)
                elif mime == "image/png":
                    lum = _png_luma(p)
                out.append(None if lum is None else _ahash64(lum, grid))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "ahash": pd.array(out, dtype="Int64")}
            )

    return media.mapInPandas(kernel, schema=_AHASH_SCHEMA)


def image_near_dup_pairs(
    media: DataFrame, max_hamming: int = 3, bands: int = 4, grid: int = 8
) -> DataFrame:
    """(id1, id2, hamming) image near-duplicate candidates — perceptual
    dedup for a multimodal training corpus (the image-side sibling of
    the MinHash/SimHash text family): aHash fingerprints, then the
    SAME pigeonhole block equi-join + popcount verify the SimHash
    pipeline uses (``dedup.hamming_blocked_pairs``) — never all-pairs,
    candidates bounded by 16-bit block agreement. Undecodable payloads
    (NULL hash) never pair."""
    from alt_spark.operators.dedup import hamming_blocked_pairs

    h = image_ahash(media, grid).filter(F.col("ahash").isNotNull())
    return hamming_blocked_pairs(
        h, "ahash", "media_id", max_hamming=max_hamming, bands=bands
    )


_BANDHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("bandhash", T.LongType()),
    ]
)


def audio_bandhash(media: DataFrame, dim: int = 64) -> DataFrame:
    """(media_id, bandhash) — 64-bit perceptual audio fingerprint per
    PCM WAV payload: the REAL decode kernel's per-band RMS energies
    (``_decode_wav``: RIFF walk, channel average, time-band RMS)
    thresholded at their mean and packed row-major into a signed long —
    the audio sibling of ``image_ahash`` (an energy-envelope average
    hash: a global GAIN change scales every band AND the mean together,
    so the bit pattern survives it, exactly as aHash survives
    brightness). NULL for payloads the real kernel cannot decode
    (compressed audio stays a declared stub; hashing a stub vector
    would manufacture fake near-dups). Arrow-batched mapInPandas,
    narrow — runs inside the scan stage."""
    if not 1 <= dim <= 64:
        raise ValueError(f"dim must be in [1, 64] (got {dim})")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_rows: list[int | None]
        for pdf in batches:
            out_rows = []
            for p, m in zip(pdf["payload"], pdf["meta"]):
                mime = None if m is None else m["mime"]
                vals = None
                if mime in ("audio/wav", "audio/x-wav", "audio/wave"):
                    vals = _decode_wav(p, dim)
                if vals is None:
                    out_rows.append(None)
                    continue
                mean = sum(vals) / len(vals)
                bits = 0
                for i, v in enumerate(vals):
                    if v >= mean:
                        bits |= 1 << i
                if bits >= 1 << 63:
                    bits -= 1 << 64
                out_rows.append(bits)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "bandhash": pd.array(out_rows, dtype="Int64"),
                }
            )

    return media.mapInPandas(kernel, schema=_BANDHASH_SCHEMA)
