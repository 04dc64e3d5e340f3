"""Multimodal column handling: image/audio/video as opaque binary + typed
metadata, with decode / feature-extraction as Arrow-batched ``mapInPandas``
stages.

Decode support (no imaging libraries in this environment):

- 24-bit uncompressed BMP is decoded/encoded/resized FOR REAL by the
  dependency-free pure-Python codec below (``decode_bmp``/``encode_bmp``) —
  so the bytes->pixels path is exercised end-to-end without ``fake=True``.
- RIFF/WAVE 16-bit PCM audio is decoded FOR REAL the same way
  (``decode_wav``/``encode_wav`` + ``audio_features``).
- YUV4MPEG2 (.y4m) raw video decodes FOR REAL too
  (``decode_y4m``/``encode_y4m`` + ``sample_frames(fake=False)``).
- every other format raises NotImplementedError unless ``fake=True``, in
  which case a deterministic fake decoder derives "pixels" from the payload
  bytes. Swap in PIL/opencv/ffmpeg for production coverage.

The Spark-side plumbing — binary columns, metadata structs, Arrow batch
shapes, partition-friendly mapInPandas signatures — is identical for both
paths and fully tested.

Scale notes: binary payloads ride in parquet as-is; mapInPandas streams
Arrow batches (bounded memory per task); metadata-only queries never touch
the payload column thanks to parquet column pruning.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --------------------------------------------------------------- BMP codec
def encode_bmp(pixels: list[list[tuple[int, int, int]]]) -> bytes:
    """Encode top-down rows of (r, g, b) pixels as a 24-bit uncompressed BMP
    (BITMAPINFOHEADER, bottom-up storage, rows padded to 4 bytes)."""
    height = len(pixels)
    width = len(pixels[0]) if height else 0
    row_size = (width * 3 + 3) & ~3
    img_size = row_size * height
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = []
    for y in range(height - 1, -1, -1):
        row = bytearray()
        for r, g, b in pixels[y]:
            row += bytes((b, g, r))
        row += b"\x00" * (row_size - len(row))
        rows.append(bytes(row))
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes):
    """Decode a 24-bit uncompressed BMP to ``(width, height, pixels)`` with
    top-down rows of (r, g, b) tuples. Handles bottom-up (positive height)
    and top-down (negative height) storage and 4-byte row padding."""
    payload = bytes(payload)
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (off,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMP variant not supported")
    width, height = struct.unpack_from("<ii", payload, 18)
    _planes, bpp = struct.unpack_from("<HH", payload, 26)
    (comp,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp}, compression={comp})")
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    pixels = []
    for i in range(height):
        y = (height - 1 - i) if bottom_up else i
        base = off + y * row_size
        row = payload[base:base + width * 3]
        if len(row) < width * 3:
            raise ValueError("truncated BMP pixel data")
        pixels.append([(row[x * 3 + 2], row[x * 3 + 1], row[x * 3]) for x in range(width)])
    return width, height, pixels


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Testdata adapter: treat document text bytes as an opaque media payload
    with typed metadata (shape a real image table would have)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(payload).alias("n_bytes"),
            (F.octet_length(payload) % 640).alias("width"),
            (F.octet_length(payload) % 480).alias("height"),
        ).alias("meta"),
    )


def decode_image_stub(payload: bytes, fake: bool = False) -> list[int]:
    """Decode an image payload to a 16-bin pixel-intensity histogram.

    REAL path: 24-bit uncompressed BMP decodes via the pure-Python codec
    (bin = channel_value // 16 over every RGB channel byte). Other formats
    need an imaging library not present in this environment and raise
    unless ``fake=True`` (deterministic byte-derived fake)."""
    if fake:
        # deterministic fake: 16-bin histogram of byte values
        hist = [0] * 16
        for b in payload:
            hist[b % 16] += 1
        return hist
    if bytes(payload[:2]) == b"BM":
        _w, _h, pixels = decode_bmp(payload)
        hist = [0] * 16
        for row in pixels:
            for r, g, b in row:
                hist[r >> 4] += 1
                hist[g >> 4] += 1
                hist[b >> 4] += 1
        return hist
    raise NotImplementedError(
        "only 24-bit BMP decodes without an imaging library (PIL/opencv); "
        "run with fake=True for the deterministic test decoder"
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("histogram", T.ArrayType(T.LongType())),
    ]
)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "histogram": pdf["payload"].map(
                        lambda p: decode_image_stub(bytes(p), fake=fake)
                    ),
                }
            )
            yield out

    return df.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def media_metadata(df: DataFrame) -> DataFrame:
    """Metadata-only projection — payload column pruned at the parquet scan."""
    return df.select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("thumb", T.BinaryType()),
    ]
)


def resize_stub(payload: bytes, w: int, h: int, fake: bool = False) -> bytes:
    """Resize an image payload to w x h.

    REAL path: 24-bit BMP in -> nearest-neighbor sample -> 24-bit BMP out,
    all via the pure-Python codec. Other formats raise unless ``fake=True``
    (deterministic fake keeps every (len//(w*h))-th byte)."""
    if fake:
        stride = max(1, len(payload) // (w * h))
        return payload[::stride][: w * h]
    if bytes(payload[:2]) == b"BM":
        src_w, src_h, px = decode_bmp(payload)
        out = [
            [px[y * src_h // h][x * src_w // w] for x in range(w)]
            for y in range(h)
        ]
        return encode_bmp(out)
    raise NotImplementedError(
        "only 24-bit BMP resizes without an imaging library (PIL/opencv); "
        "run with fake=True for the deterministic test resizer"
    )


def resize_images(df: DataFrame, width: int = 8, height: int = 8,
                  fake: bool = True) -> DataFrame:
    """Arrow-batched thumbnailing over binary payloads (mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "thumb": pdf["payload"].map(
                        lambda p: resize_stub(bytes(p), width, height, fake=fake)
                    ),
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


# --------------------------------------------------------------- Y4M codec
def encode_y4m(frames: list[bytes], width: int, height: int,
               fps: int = 25) -> bytes:
    """Encode raw 4:2:0 YUV frames as a YUV4MPEG2 (.y4m) payload — the
    plain-text-header raw-video container ffmpeg reads/writes. Each frame
    must be w*h + 2*(w//2)*(h//2) bytes (Y plane + quarter-size U and V)."""
    expect = width * height + 2 * (width // 2) * (height // 2)
    for f in frames:
        if len(f) != expect:
            raise ValueError(f"frame must be {expect} bytes for {width}x{height} 4:2:0")
    head = f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 C420\n".encode()
    return head + b"".join(b"FRAME\n" + f for f in frames)


def decode_y4m(payload: bytes):
    """Decode a YUV4MPEG2 payload to ``(width, height, fps, frames)`` with
    each frame the raw 4:2:0 plane bytes. Parses the parameter header and
    walks FRAME markers (per-frame parameters after FRAME are skipped)."""
    payload = bytes(payload)
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    width = height = None
    fps = 25
    for tok in payload[9:nl].split():
        if tok[:1] == b"W":
            width = int(tok[1:])
        elif tok[:1] == b"H":
            height = int(tok[1:])
        elif tok[:1] == b"F":
            num, _, den = tok[1:].partition(b":")
            fps = int(num) // max(1, int(den or b"1"))
        elif tok[:1] == b"C" and tok not in (b"C420", b"C420jpeg", b"C420mpeg2", b"C420paldv"):
            raise ValueError(f"only 4:2:0 Y4M supported (got {tok.decode()})")
    if width is None or height is None:
        raise ValueError("Y4M header missing W/H")
    fsz = width * height + 2 * (width // 2) * (height // 2)
    frames, pos = [], nl + 1
    while pos < len(payload):
        if payload[pos:pos + 5] != b"FRAME":
            raise ValueError("corrupt Y4M: missing FRAME marker")
        fnl = payload.index(b"\n", pos)
        frames.append(payload[fnl + 1:fnl + 1 + fsz])
        if len(frames[-1]) != fsz:
            raise ValueError("truncated Y4M frame")
        pos = fnl + 1 + fsz
    return width, height, fps, frames


def sample_frames(df: DataFrame, every_n: int = 4, frame_bytes: int = 64,
                  fake: bool = True) -> DataFrame:
    """Sample every n-th frame from a video payload — the one-row-in /
    many-rows-out mapInPandas shape.

    REAL path (``fake=False``): YUV4MPEG2 (.y4m) raw video decodes via the
    pure-Python codec — frames are the actual 4:2:0 planes and
    ``frame_bytes`` is ignored. Other containers need ffmpeg and raise.
    Deterministic fake (default): frames are consecutive ``frame_bytes``
    slices of the payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload)
                if fake:
                    n_frames = max(1, len(p) // frame_bytes)
                    fs = [p[i * frame_bytes:(i + 1) * frame_bytes]
                          for i in range(n_frames)]
                elif p.startswith(b"YUV4MPEG2"):
                    _w, _h, _fps, fs = decode_y4m(p)
                else:
                    raise NotImplementedError(
                        "only YUV4MPEG2 decodes without ffmpeg; run with "
                        "fake=True for the deterministic test sampler"
                    )
                for fno in range(0, len(fs), every_n):
                    ids.append(mid)
                    nos.append(fno)
                    frames.append(fs[fno])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return df.select("media_id", "payload").mapInPandas(run, FRAME_SCHEMA)

# --------------------------------------------------------------- WAV codec
def encode_wav(samples: list[int], sample_rate: int = 16_000) -> bytes:
    """Encode 16-bit mono PCM samples as a canonical RIFF/WAVE payload."""
    import array

    data = array.array("h", samples).tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes):
    """Decode a RIFF/WAVE payload to ``(sample_rate, n_channels, samples)``
    (16-bit PCM only; chunk-walks the RIFF structure so extra chunks — LIST,
    fact — are skipped like a real parser)."""
    import array

    payload = bytes(payload)
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"only 16-bit PCM WAV supported (format={audio_format}, bits={bits})"
        )
    samples = array.array("h")
    samples.frombytes(data[: len(data) - len(data) % 2])
    return sample_rate, n_channels, samples.tolist()


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched audio feature extraction over binary payloads
    (mapInPandas): sample rate, duration, RMS, peak amplitude.

    REAL path: RIFF/WAVE 16-bit PCM decodes via the pure-Python codec.
    ``fake=True`` derives deterministic pseudo-samples from the payload
    bytes (the stub contract the image/video stages use) so non-audio
    test payloads can exercise the plumbing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        def feats(p):
            p = bytes(p)
            if fake:
                sr, samples = 16_000, [b - 128 for b in p[:4096]]
            else:
                sr, _ch, samples = decode_wav(p)
            n = len(samples)
            rms = math.sqrt(sum(s * s for s in samples) / n) if n else 0.0
            peak = max((abs(s) for s in samples), default=0)
            return sr, n, (n / sr if sr else 0.0), round(rms, 6), peak

        for pdf in batches:
            cols = [feats(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": [c[0] for c in cols],
                    "n_samples": [c[1] for c in cols],
                    "duration_s": [c[2] for c in cols],
                    "rms": [c[3] for c in cols],
                    "peak": [c[4] for c in cols],
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, AUDIO_SCHEMA)


# ------------------------------------------------- image near-dup (aHash)
def _word_pixels(text: str, side: int) -> list[list[tuple[int, int, int]]]:
    """Deterministic side x side RGB thumbnail for a document: pixel i
    (row-major) takes its channels from the first three md5 bytes of word
    ``i mod n_words`` of the lowercased text — words WRAP rather than pad,
    so every pixel carries document content (constant padding would render
    all short docs as near-identical mostly-flat images and hub them into
    one spurious near-dup cluster). Near-identical docs therefore render
    near-identical images — the dedup testbed a real image corpus would
    provide natively."""
    import hashlib

    words = (text or "").lower().split(" ")
    rgb = {}  # words wrap, so hash each distinct word once, not per pixel
    px = []
    for y in range(side):
        row = []
        for x in range(side):
            w = words[(y * side + x) % len(words)]
            c = rgb.get(w)
            if c is None:
                d = hashlib.md5(w.encode("utf-8")).digest()
                c = rgb[w] = (d[0], d[1], d[2])
            row.append(c)
        px.append(row)
    return px


def text_to_bmp(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", side: int = 8
) -> DataFrame:
    """Render each document as a REAL 24-bit BMP payload (``encode_bmp``) —
    the adapter that turns the text testdata into an image corpus whose
    bytes round-trip through the actual codec. Arrow-batched mapInPandas;
    output (media_id, payload)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "payload": [
                        encode_bmp(_word_pixels(t, side)) for t in pdf[text_col]
                    ],
                }
            )

    from .dedup import _spread

    # _spread before the per-row codec pass (round 10, guide §2.5): a
    # single-split scan otherwise runs encode (and the downstream decode/
    # ahash passes, which inherit the partitioning) on one task
    return _spread(df.select(id_col, text_col)).mapInPandas(run, schema)


def image_ahash(
    df: DataFrame,
    bands: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
    keep_cols: tuple = (),
) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprints over REAL decoded BMP
    pixels: bit_i = (pixel i's channel sum x n_pixels > corpus-of-the-image
    total) — integer-exact, no float mean — packed into ``bands`` equal
    bit-groups (array<int>) ready for pigeonhole banding. The whole decode
    -> grayscale -> threshold path runs on the actual codec output, so a
    corrupted payload fails loudly here, not downstream. ``keep_cols``
    pass through unchanged (e.g. an event-time column for the streaming
    dedup — a stateless mapInPandas works on streaming inputs, but a
    post-hoc join to recover them would not)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def ahash(p):
            _w, _h, pixels = decode_bmp(bytes(p))
            gs = [r + g + b for row in pixels for (r, g, b) in row]
            n = len(gs)
            if n % bands:
                raise ValueError(f"{n} pixels do not split into {bands} bands")
            per = n // bands
            if per > 63:
                raise ValueError(
                    f"{per} bits per band overflow a 64-bit band value — "
                    f"raise bands (got {bands} for {n} pixels)"
                )
            total = sum(gs)
            bits = [1 if g * n > total else 0 for g in gs]
            return [
                sum(bits[b * per + j] << j for j in range(per))
                for b in range(bands)
            ]

        for pdf in batches:
            out = {
                "media_id": pdf[id_col],
                "ahash": [ahash(p) for p in pdf[payload_col]],
            }
            for c in keep_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    # LongType bands: at bands=8 a 16x16 image packs 32 bits per band,
    # which overflows int32 (bit 31 set -> Arrow conversion crash)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("ahash", T.ArrayType(T.LongType())),
        ]
        + [df.schema[c] for c in keep_cols]
    )
    return df.select(id_col, payload_col, *keep_cols).mapInPandas(run, schema)


def image_neardup_pairs(
    images: DataFrame,
    max_hamming: int = 7,
    bands: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_bucket: int | None = None,
    auto_cap: bool = True,
) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash Hamming distance:
    (id_a, id_b, hamming) for every pair whose aHash fingerprints differ in
    at most ``max_hamming`` of the 64 bits. LOSSLESS by pigeonhole as long
    as ``max_hamming < bands``: a pair within the budget must agree on at
    least one whole band, so the banded equi-join misses nothing — enforced
    here rather than documented.

    Scale shape: fingerprints are ``bands`` small ints per image — the
    payload column never enters the join. Candidates come from a banded
    self-EQUI-join (same shape as ``dedup.simhash_hamming_pairs``).
    Hamming is one codegen'd zip_with/bit_count fold; duplicate candidates
    collapse AFTER scoring so the distinct runs on the final narrow rows.

    ``max_bucket``: the pair OUTPUT is quadratic in duplicate-group size
    by contract (a 100-copy image group alone is 4,950 pairs — the 100x
    probe measured 21.2M output pairs / 230s on the uniformly-amplified
    corpus, SCALE.md). Buckets larger than ``max_bucket`` instead emit
    only star pairs (min-id member, other) — O(m) — which
    ``dedup.dedup_clusters`` recovers transitively, the same treatment
    ``minhash_lsh_pairs`` applies. Default None keeps the exact all-pairs
    contract (the oracle-gated mode) — except above
    ``dedup.DENSE_PAIR_AUTOCAP_LIMIT`` corpus rows, where ``auto_cap``
    applies ``dedup.LSH_AUTOCAP_BUCKET`` with a warning (the round-5 100x
    probe measured 21.2M pairs / 230s exact vs 17.6s star-capped on the
    same corpus; ``auto_cap=False`` opts out). The probe runs on the
    checkpointed fingerprint table, so the count that triggers it is the
    same action that materializes the checkpoint — the decode/encode
    mapInPandas still runs exactly once."""
    from .dedup import LSH_AUTOCAP_BUCKET, _autocap_triggered

    if not 0 <= max_hamming < bands:
        raise ValueError(
            f"max_hamming must be in [0, bands) for lossless banding "
            f"(got max_hamming={max_hamming}, bands={bands})"
        )
    # both join arms read the fingerprints — materialize ONCE so the
    # encode/decode mapInPandas pass doesn't run twice (same pattern as
    # the LSH signature checkpoint in llm.dedup)
    ah = image_ahash(images, bands, payload_col, id_col).localCheckpoint(
        eager=False
    )
    if (
        auto_cap
        and max_bucket is None
        and _autocap_triggered(
            ah.select("media_id"),
            "image_neardup_pairs",
            caps={"max_bucket": LSH_AUTOCAP_BUCKET},
        )
    ):
        max_bucket = LSH_AUTOCAP_BUCKET
    ex = ah.select(
        F.col("media_id"),
        F.col("ahash"),
        F.posexplode("ahash").alias("band", "val"),
    )
    if max_bucket is not None:
        stats = ex.groupBy("band", "val").agg(
            F.count(F.lit(1)).alias("__bn"), F.min("media_id").alias("__bmin")
        )
        ex = ex.join(stats, ["band", "val"])
    a = ex.select(
        F.col("media_id").alias("id_a"),
        F.col("ahash").alias("__ha"),
        "band",
        "val",
        *([F.col("__bn"), F.col("__bmin")] if max_bucket is not None else []),
    )
    b = ex.select(
        F.col("media_id").alias("id_b"),
        F.col("ahash").alias("__hb"),
        "band",
        "val",
    )
    ham = F.aggregate(
        F.zip_with("__ha", "__hb", lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("int")
    joined = a.join(b, ["band", "val"]).filter(F.col("id_a") < F.col("id_b"))
    if max_bucket is not None:
        # oversize buckets: only the min-id anchor emits pairs — O(m)
        joined = joined.filter(
            (F.col("__bn") <= max_bucket) | (F.col("id_a") == F.col("__bmin"))
        )
    return (
        joined.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .dropDuplicates(["id_a", "id_b"])
    )


def streaming_image_dedup(
    df: DataFrame,
    ts_col: str | None = None,
    within: str = "10 minutes",
    bands: int = 8,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Perceptual image dedup for CONTINUOUS ingest: only the first image
    per aHash fingerprint survives — so re-ENCODED byte-identical-pixel
    copies dedup too, which a payload-md5 key would miss. The multimodal
    twin of ``dedup.streaming_exact_dedup`` and the same state story:
    with ``ts_col`` the stream is watermarked and state is one fingerprint
    string per unique image inside the ``within`` horizon
    (``dropDuplicatesWithinWatermark``), evicted after it; without a
    timestamp the state is the full fingerprint set (bounded backfills).

    The decode -> fingerprint stage is a STATELESS Arrow mapInPandas, so
    it runs per micro-batch with no state of its own; the only stateful
    op is the keyed dedup. Batch mode keeps the min-``id_col`` image per
    fingerprint (deterministic canonical pick — batch has no arrival
    order), matching the batch dedup family's survivor rule.

    Output: (media_id[, ts_col], ahash) for the surviving images."""
    from .dedup import keyed_streaming_dedup

    keep = (ts_col,) if ts_col is not None else ()
    ah = image_ahash(df, bands, payload_col, id_col, keep_cols=keep)
    fp = F.concat_ws(",", *[F.col("ahash")[i] for i in range(bands)])
    out = keyed_streaming_dedup(
        ah.withColumn("__fp", fp),
        key_col="__fp", ts_col=ts_col, within=within, order_col="media_id",
    )
    return out.drop("__fp")
