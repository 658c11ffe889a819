"""Multimodal column plumbing (SURVEY §2.2 north-star extension).

Convention: media travels as an opaque BINARY column plus a typed
metadata struct (modality, mime, width/height/duration…). Decoding and
feature extraction run as Arrow-batched pandas iterators (mapInPandas) so
the JVM⇄Python boundary is crossed per-BATCH, never per-row.

Two decode paths:

- ``fake=True``: deterministic byte-stat features exercising the full
  Spark plumbing — schema, partitioning, Arrow batch shape. The fake
  features are pure byte arithmetic, so a DuckDB oracle can replay them
  and the mapInPandas plumbing earns a hash-exact driver row.
- ``fake=False``: a REAL decoder for the formats decodable without
  external codecs — netpbm P5/P6 images (header + raw raster, parsed
  with numpy), baseline 8-bit PNG (stdlib ``zlib`` inflate + spec
  de-filtering in numpy), baseline JPEG (vendored T.81 Huffman+IDCT
  decoder, jpegcodec.py), PCM WAV audio (stdlib ``wave``), and
  YUV4MPEG2 video (text header + raw planes, demuxed frame-by-frame)
  — with a Pillow fallback for image formats outside those subsets
  (progressive JPEG, palette PNG) when PIL is importable, and
  NotImplementedError only for formats nothing present can decode
  (compressed video without pyav — the one remaining plug point,
  declared permanent-unsupported-here in COVERAGE.md).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.registry import load_table

#: metadata struct carried next to every media column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("modality", T.StringType()),   # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feat", T.ArrayType(T.DoubleType())),
    ]
)


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapter: treat each document's UTF-8 bytes as an opaque media blob
    with metadata — the fixture tables carry no real media, so this is
    the standing demo input for the media pipeline."""
    d = load_table(spark, "documents", sf_dir)
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("media"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def media_byte_stats(spark, sf_dir):
    """Expression-only byte features over the binary column: size and
    SHA-256 — real (no stub), oracle-checkable."""
    m = documents_as_media(spark, sf_dir)
    return m.select(
        "doc_id",
        F.length(F.col("media")).cast("long").alias("n_bytes"),
        F.sha2(F.col("media"), 256).alias("sha256"),
    )


def _netpbm_raster(blob: bytes):
    """Parse a binary netpbm blob (P5 grayscale / P6 RGB) to
    (width, height, maxval, channels, raster) — the shared REAL codec
    under both the feature decoder and the perceptual hash. Raises
    ValueError on a malformed raster (caller converts per policy)."""
    import numpy as np

    # header tokens: magic, width, height, maxval — '#' comments legal
    tokens: list[bytes] = []
    i = 2  # past magic
    while len(tokens) < 3:
        while i < len(blob) and blob[i : i + 1].isspace():
            i += 1
        if i < len(blob) and blob[i : i + 1] == b"#":
            while i < len(blob) and blob[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(blob) and not blob[j : j + 1].isspace():
            j += 1
        tokens.append(blob[i:j])
        i = j
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = (int(t) for t in tokens)
    ch = 3 if blob[:2] == b"P6" else 1
    raster = np.frombuffer(blob, dtype=np.uint8, count=w * h * ch, offset=i)
    if raster.size != w * h * ch:
        raise ValueError("truncated netpbm raster")
    return w, h, maxval, ch, raster


def _decode_netpbm(blob: bytes) -> list[float]:
    """REAL netpbm decode (binary P5 grayscale / P6 RGB): header via
    _netpbm_raster, features [width, height, maxval, mean_pixel]."""
    w, h, maxval, _ch, raster = _netpbm_raster(blob)
    return [float(w), float(h), float(maxval), float(raster.mean())]


def _decode_wav(blob: bytes) -> list[float]:
    """REAL PCM WAV decode via the stdlib ``wave`` module. Features:
    [n_channels, sample_rate, n_frames, rms] over the 16-bit samples."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(blob)) as wv:
        nch, sw, rate, nframes = (
            wv.getnchannels(), wv.getsampwidth(), wv.getframerate(),
            wv.getnframes(),
        )
        pcm = wv.readframes(nframes)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width {sw}")
    x = np.frombuffer(pcm, dtype=dtype).astype(np.float64)
    rms = float(np.sqrt((x * x).mean())) if x.size else 0.0
    return [float(nch), float(rate), float(nframes), rms]


_Y4M_MAGIC = b"YUV4MPEG2"


def _y4m_parse(blob: bytes):
    """REAL YUV4MPEG2 demux — the uncompressed video container every
    ffmpeg ships (`ffmpeg -f yuv4mpeg`), parseable codec-free: a plain
    text header (`YUV4MPEG2 W.. H.. F<num>:<den> .. C<fmt>\\n`), then
    frames of `FRAME[params]\\n` + raw planes. Supports C420 family
    (Y + quarter U + quarter V) and Cmono (Y only). Returns (width,
    height, fps_num, fps_den, [y_plane bytes per frame]). Raises
    ValueError on malformed input (caller converts per policy)."""
    if blob[: len(_Y4M_MAGIC)] != _Y4M_MAGIC:
        raise ValueError("not a YUV4MPEG2 stream")
    nl = blob.find(b"\n")
    if nl < 0:
        raise ValueError("Y4M missing header terminator")
    w = h = num = den = None
    chroma = "420"
    for tok in blob[len(_Y4M_MAGIC): nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = (int(x) for x in val.split(b":"))
        elif tag == b"C":
            chroma = val.decode("ascii")
    if not w or not h or not num or not den:
        raise ValueError("Y4M header missing W/H/F")
    if chroma.startswith("420"):
        c_size = (w // 2) * (h // 2) * 2
    elif chroma == "mono":
        c_size = 0
    else:
        raise ValueError(f"unsupported Y4M chroma {chroma!r}")
    y_size, pos, frames = w * h, nl + 1, []
    while pos < len(blob):
        if blob[pos : pos + 5] != b"FRAME":
            raise ValueError("Y4M frame marker missing")
        fnl = blob.find(b"\n", pos)
        if fnl < 0 or fnl + 1 + y_size + c_size > len(blob):
            raise ValueError("truncated Y4M frame")
        frames.append(blob[fnl + 1 : fnl + 1 + y_size])
        pos = fnl + 1 + y_size + c_size
    return w, h, num, den, frames


def _decode_y4m(blob: bytes) -> list[float]:
    """Feature form of the Y4M demux, matching the other decoders'
    arity: [width, height, n_frames, mean luma over all frames]."""
    import numpy as np

    w, h, _num, _den, frames = _y4m_parse(blob)
    luma = (
        np.frombuffer(b"".join(frames), dtype=np.uint8).mean()
        if frames else 0.0
    )
    return [float(w), float(h), float(len(frames)), float(luma)]


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_png(blob: bytes) -> list[float]:
    """REAL codec-free PNG decode (stdlib ``zlib`` + numpy unfiltering):
    8-bit non-interlaced grayscale / gray+alpha / RGB / RGBA — the PNG
    baseline every encoder emits by default. Chunks are walked for IHDR
    and the IDAT stream; scanlines are de-filtered per the spec (None /
    Sub / Up / Average / Paeth; Up vectorizes, the left-dependent
    filters run a per-byte loop — fine for feature extraction).
    Features match the other image decoders: [width, height, 255.0,
    mean of the ITU-R 601 luma (exact (299R+587G+114B)/1000, alpha
    ignored)]. Raises ValueError on malformed/16-bit/interlaced input
    (caller converts per policy)."""
    import struct
    import zlib

    import numpy as np

    if blob[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or interlace or channels is None:
        raise ValueError(
            f"unsupported PNG variant (depth={depth}, color={color}, "
            f"interlace={interlace}) — baseline 8-bit only"
        )
    raw = zlib.decompress(b"".join(idat))
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    img = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        f = raw[off]
        line = np.frombuffer(raw, np.uint8, stride, off + 1).copy()
        if f == 0:
            pass
        elif f == 2:  # Up — uint8 addition wraps mod 256 per spec
            line += prev
        elif f in (1, 3, 4):  # Sub / Average / Paeth: left-dependent
            cur = line.astype(np.int32)
            out = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = int(out[x - channels]) if x >= channels else 0
                up = int(prev[x])
                ul = int(prev[x - channels]) if x >= channels else 0
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = (
                        left if pa <= pb and pa <= pc
                        else up if pb <= pc else ul
                    )
                out[x] = (int(cur[x]) + pred) & 0xFF
            line = out.astype(np.uint8)
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        img[y] = line
        prev = line
    px = img.reshape(h, w, channels).astype(np.float64)
    if channels >= 3:  # RGB(A) → ITU-R 601 luma; alpha ignored
        gray = (
            px[..., 0] * 299 + px[..., 1] * 587 + px[..., 2] * 114
        ) / 1000.0
    else:  # gray or gray+alpha → the gray channel
        gray = px[..., 0]
    return [float(w), float(h), 255.0, float(gray.mean())]


def _decode_real(blob: bytes) -> list[float]:
    """Dispatch on magic bytes: netpbm, baseline PNG, baseline JPEG
    (vendored jpegcodec.py), WAV and Y4M decode codec-free;
    non-baseline PNGs (palette/16-bit/interlaced) and non-baseline
    JPEGs (progressive/arithmetic) fall back to Pillow when importable;
    compressed video is the remaining real-codec plug point."""
    if blob[:2] in (b"P5", b"P6"):
        return _decode_netpbm(blob)
    if blob[:8] == _PNG_MAGIC:
        try:
            return _decode_png(blob)
        except ValueError:
            # palette/16-bit/interlaced — let Pillow take it below
            # rather than failing a variant it decoded before round 6
            pass
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        return _decode_wav(blob)
    if blob[: len(_Y4M_MAGIC)] == _Y4M_MAGIC:
        return _decode_y4m(blob)
    if blob[:2] == b"\xff\xd8":
        # baseline JPEG decodes codec-free via the vendored T.81
        # decoder (round-12: closes the three-round Pillow-plug carry);
        # JPEG's Y channel IS BT.601 luma, the same formula the PNG
        # path computes from RGB. Progressive/arithmetic fall through
        # to the Pillow guard below.
        from .jpegcodec import UnsupportedJpegError, decode_gray

        try:
            w, h, luma = decode_gray(blob)
            return [float(w), float(h), 255.0, float(luma.mean())]
        except UnsupportedJpegError:
            pass
    try:
        import io

        from PIL import Image  # optional; absent in this container

        import numpy as np

        img = Image.open(io.BytesIO(blob))
        arr = np.asarray(img.convert("L"), dtype=np.float64)
        return [float(img.width), float(img.height), 255.0, float(arr.mean())]
    except ImportError:
        raise NotImplementedError(
            "media format not decodable codec-free (netpbm/PNG/WAV are; "
            "for progressive JPEG install Pillow, for video plug in "
            "pyav here; baseline JPEG decodes via jpegcodec.py)"
        ) from None


def decode_media(
    df: DataFrame,
    fake: bool = True,
    feat_dim: int = 4,
) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    fake=True: deterministic stand-in features = [n_bytes, first_byte,
    last_byte, byte_sum mod 997] — exercises identical plumbing to a real
    decoder, and pure byte arithmetic means the DuckDB oracle replays it
    (driver gate media_decode_features). fake=False: REAL decode —
    netpbm images → [w, h, maxval, mean_pixel], PCM WAV →
    [channels, rate, frames, rms]; see _decode_real for the dispatch
    and the remaining codec plug point.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            media = pdf["media"]
            n = media.map(len)
            if fake:
                first = media.map(lambda b: float(b[0]) if len(b) else 0.0)
                last = media.map(lambda b: float(b[-1]) if len(b) else 0.0)
                csum = media.map(lambda b: float(sum(b) % 997))
                feats = [
                    [float(a), b, c, d]
                    for a, b, c, d in zip(n, first, last, csum)
                ]
            else:
                feats = [_decode_real(bytes(b)) for b in media]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("int64"),
                    "feat": feats,
                }
            )

    return df.mapInPandas(batches, DECODE_SCHEMA)


def media_decode_features(spark, sf_dir):
    """Driver gate for the mapInPandas decode plumbing: fake-decode the
    media blobs and expose the scalar features. The fake features are
    byte arithmetic (first/last byte, byte-sum mod 997), which DuckDB
    replays via per-char ord() — exact because the documents fixture is
    pure ASCII (octet_length == length for every row, asserted in
    tests/test_sources_sinks.py), so char code points ARE the bytes."""
    m = documents_as_media(spark, sf_dir)
    dec = decode_media(m, fake=True)
    return dec.select(
        "doc_id", "n_bytes",
        F.element_at("feat", 2).alias("first_byte"),
        F.element_at("feat", 3).alias("last_byte"),
        F.round(F.element_at("feat", 4), 1).alias("byte_sum_mod"),
    )


#: 8×8 25fps 4:2:0 — the synthesis shape for the video gate
_Y4M_DEMO_HEADER = b"YUV4MPEG2 W8 H8 F25:1 Ip A1:1 C420\n"


def encode_y4m_demo(df: DataFrame) -> DataFrame:
    """Synthesis half of the video gate: build a REAL (tiny) YUV4MPEG2
    stream per document — 1 + doc_id%3 frames of 8×8 4:2:0, the Y plane
    carrying the document's own bytes cycled (frame k starts at byte
    k·64 mod len), chroma flat 0x80. The blobs are valid Y4M (ffmpeg
    would play them); the deterministic Y-plane construction is what
    lets the DuckDB oracle rebuild each frame's bytes and hash them."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            blobs = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                data = text.encode("utf-8")
                if not data:
                    # the Y plane IS the document's bytes — an empty doc
                    # has no defined frame (and the oracle's modulo
                    # would divide by zero); fail loud, not truncated
                    raise ValueError(
                        "encode_y4m_demo requires non-empty text"
                    )
                if len(data) != len(text):
                    # the DuckDB oracles (scene_cuts, video_frames)
                    # rebuild the plane by CHARACTER position and the
                    # Spark reduce sums ascii() of string-cast bytes —
                    # both only equal the byte stream while text is
                    # pure ASCII (1 byte per char). A non-ASCII fixture
                    # must fail loud, never silently diverge (r9 ADVICE)
                    raise ValueError(
                        "encode_y4m_demo requires ASCII text: the "
                        "char-indexed oracle replay assumes 1 byte/char"
                    )
                # enough copies that start+64 fits for ANY len ≥ 1:
                # reps·len > len + 64 ≥ start + 64 (start ≤ len-1)
                cyc = data * (2 + 64 // len(data))
                parts = [_Y4M_DEMO_HEADER]
                for k in range(1 + int(doc_id) % 3):
                    start = (k * 64) % len(data)
                    parts.append(
                        b"FRAME\n" + cyc[start : start + 64] + b"\x80" * 32
                    )
                blobs.append(b"".join(parts))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": blobs})

    return df.mapInPandas(batches, "doc_id long, media binary")


def media_video_frames(spark, sf_dir):
    """Driver gate for the REAL video path: synthesize valid Y4M per
    document (encode_y4m_demo), demux it with the REAL parser
    (sample_frames fake=False → _y4m_parse — no fakes anywhere on this
    path), and expose each sampled frame's true timestamp (from the
    stream's 25:1 rate) and the sha-256 of its raw luma plane. The
    oracle rebuilds the identical 64 bytes via repeat+substr cycling
    and hashes them — a hash match proves the demux byte-exact. The
    1→N frame fan-out happens inside the Arrow batch; no shuffle in
    the whole gate."""
    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    frames = sample_frames(encode_y4m_demo(d), n_frames=4, fake=False)
    return frames.select(
        "doc_id", "frame_idx", "frame_ts_ms",
        F.length("frame").cast("long").alias("n_bytes"),
        F.sha2(F.col("frame"), 256).alias("frame_sha"),
    )


def encode_netpbm_demo(df: DataFrame) -> DataFrame:
    """Synthesis half of the image-dedup gate: build a REAL binary P5
    netpbm (8×8 grayscale) per document, pixels = the document's own
    bytes cycled to 64 — valid images any netpbm tool opens, and a
    deterministic construction the DuckDB oracle replays per-char
    (the fixture is pure ASCII, so code points ARE bytes)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            blobs = []
            for text in pdf["text"]:
                data = text.encode("utf-8")
                if not data:
                    raise ValueError(
                        "encode_netpbm_demo requires non-empty text"
                    )
                if len(data) != len(text):
                    # same contract as encode_y4m_demo: the ahash/tile
                    # oracles index pixels by CHARACTER, valid only
                    # while 1 byte == 1 char (r9 ADVICE — fail loud)
                    raise ValueError(
                        "encode_netpbm_demo requires ASCII text: the "
                        "char-indexed oracle replay assumes 1 byte/char"
                    )
                cyc = data * (1 + 64 // len(data))
                blobs.append(b"P5\n8 8\n255\n" + cyc[:64])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": blobs})

    return df.mapInPandas(batches, "doc_id long, media binary")


def ahash_media(df: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) over the binary image column —
    the image-dedup primitive: decode via the REAL netpbm codec
    (_netpbm_raster), luma-collapse RGB with the ITU-R 601 integer
    weights, then bit i = 64·p_i > Σp (an EXACT integer comparison, no
    float mean) emitted as a 64-char row-major bitstring. Identical
    images hash identically; near-identical ones differ in few bits, so
    the production dedup is a group-by on the hash (exact twins) or a
    banded Hamming join on its 16-bit lanes (near-twins — the SimHash
    machinery in dedup.py applies unchanged).

    Scale shape: map-only (Arrow-batched mapInPandas), no shuffle; the
    downstream group-by shuffles 8-byte hashes, never pixels."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("ahash_bits", T.StringType()),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                blob = bytes(blob)
                if blob[:2] not in (b"P5", b"P6"):
                    raise ValueError("ahash_media expects netpbm input")
                _w, _h, _mx, ch, raster = _netpbm_raster(blob)
                if ch == 3:  # integer 601 luma ×1000 (exact)
                    px = raster.reshape(-1, 3).astype("int64")
                    luma = px[:, 0] * 299 + px[:, 1] * 587 + px[:, 2] * 114
                else:
                    luma = raster.astype("int64") * 1000
                total = int(luma.sum())
                bits = "".join(
                    "1" if int(p) * luma.size > total else "0"
                    for p in luma
                )
                out.append((int(doc_id), bits))
            yield pd.DataFrame(out, columns=["doc_id", "ahash_bits"])

    return df.mapInPandas(batches, schema)


def media_ahash_groups(spark, sf_dir):
    """Driver gate for the image-dedup path: synthesize real 8×8 P5
    images from document bytes (encode_netpbm_demo), average-hash them
    through the REAL netpbm codec (ahash_media — no fakes on this
    path), and collapse to per-hash duplicate groups. The oracle
    rebuilds every pixel via repeat+substr ASCII cycling and replays
    the exact 64·p > Σp bit rule — a hash match proves decode and
    hash byte-exact end-to-end."""
    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    hashed = ahash_media(encode_netpbm_demo(d))
    return hashed.groupBy("ahash_bits").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("min_doc"),
    )


MULTIMODAL_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "media_byte_stats": media_byte_stats,
    "media_decode_features": media_decode_features,
    "media_video_frames": media_video_frames,
    "media_ahash_groups": media_ahash_groups,
}

MULTIMODAL_ORACLE: dict[str, str] = {
    "media_byte_stats":
        # DuckDB sha256 takes VARCHAR and hashes its UTF-8 bytes — same
        # bytes Spark's sha2(encode(text,'UTF-8'), 256) hashes
        "SELECT doc_id, octet_length(encode(text))::BIGINT n_bytes, "
        "sha256(text) sha256 FROM documents",
    # replay of the fake decoder: ASCII fixture ⇒ ord(char) == byte
    "media_decode_features":
        "SELECT doc_id, octet_length(encode(text))::BIGINT AS n_bytes, "
        "ord(left(text, 1))::DOUBLE AS first_byte, "
        "ord(right(text, 1))::DOUBLE AS last_byte, "
        "ROUND((list_sum(list_transform(string_split(text, ''), "
        "c -> ord(c))) % 997)::DOUBLE, 1) AS byte_sum_mod "
        "FROM documents",
    # rebuild each frame's luma bytes by cycling the ASCII text (the
    # fixture is pure ASCII, so chars ARE bytes) and hash — equality
    # proves the Spark-side Y4M demux byte-exact
    "media_video_frames":
        "SELECT doc_id, CAST(k AS INT) AS frame_idx, "
        "  CAST(k * 40 AS BIGINT) AS frame_ts_ms, "
        "  CAST(64 AS BIGINT) AS n_bytes, "
        "  sha256(substr(repeat(text, CAST(2 + 64 // length(text) AS INT)), "
        "    CAST((k * 64) % length(text) AS INT) + 1, 64)) AS frame_sha "
        "FROM documents, UNNEST(generate_series(0, doc_id % 3)) AS t(k)",
    # rebuild every pixel via repeat+substr ASCII cycling (chars ARE
    # bytes) and replay the exact 64·p > Σp bit rule, then group —
    # P5 grayscale means the ×1000 luma scaling cancels from both sides
    "media_ahash_groups":
        "WITH px AS ("
        "  SELECT doc_id, k, "
        "    ord(substr(repeat(text, CAST(1 + 64 // length(text) AS INT)), "
        "      CAST(k + 1 AS INT), 1)) AS p "
        "  FROM documents, UNNEST(range(64)) AS t(k)), "
        "s AS (SELECT doc_id, SUM(p) AS tot FROM px GROUP BY 1), "
        "b AS ("
        "  SELECT px.doc_id, string_agg("
        "    CASE WHEN 64 * p > tot THEN '1' ELSE '0' END, '' ORDER BY k) "
        "    AS ahash_bits "
        "  FROM px JOIN s ON px.doc_id = s.doc_id GROUP BY 1) "
        "SELECT ahash_bits, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "  CAST(MIN(doc_id) AS BIGINT) AS min_doc "
        "FROM b GROUP BY 1",
}


def read_media_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    modality: str = "image",
    mime: str = "application/octet-stream",
) -> DataFrame:
    """Ingest a directory of media files as (media_path, media, meta)
    via Spark's built-in ``binaryFile`` source — the canonical blob
    ingest path: distributed file listing, per-file content as one
    BINARY cell, pushdown-able path/mtime/length filters. Feeds the same
    decode/feature pipeline as documents_as_media.

    At 100 TB: binaryFile caps per-task bytes via
    spark.sql.files.maxPartitionBytes; millions-of-tiny-files corpora
    should be compacted into parquet with a binary column first (one
    pass through THIS reader, written with write_partitioned)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    return raw.select(
        F.col("path").alias("media_path"),
        F.col("length").alias("n_bytes"),
        F.col("content").alias("media"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("raster", T.BinaryType()),
    ]
)


def resize_media(
    df: DataFrame, width: int = 8, height: int = 8, fake: bool = True
) -> DataFrame:
    """Resize via mapInPandas — same Arrow-batch plumbing a real
    PIL/torchvision resize would use (binary in → fixed-size binary out).

    fake=True emits a deterministic width×height pseudo-raster (the
    media bytes cycled/truncated to exactly w·h bytes) so shape, schema
    and batch behavior are pinned by tests; fake=False REALLY resizes
    netpbm (P5/P6) inputs — nearest-neighbor resampling of the decoded
    raster in numpy, grayscale output — and raises at the codec plug-in
    point for formats needing PIL/torchvision."""

    def _resize_netpbm(blob: bytes) -> bytes:
        import numpy as np

        w0, h0, maxval, _ = _decode_netpbm(blob)
        w0, h0 = int(w0), int(h0)
        ch = 3 if blob[:2] == b"P6" else 1
        # re-locate the raster: total pixel bytes from the tail
        raster = np.frombuffer(blob[len(blob) - w0 * h0 * ch:], dtype=np.uint8)
        img = raster.reshape(h0, w0, ch).mean(axis=2)  # grayscale
        ys = (np.arange(height) * h0 // height)
        xs = (np.arange(width) * w0 // width)
        return bytes(img[np.ix_(ys, xs)].astype(np.uint8).tobytes())

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        size = width * height
        for pdf in it:
            if fake:
                rasters = [
                    bytes((b * ((size // max(len(b), 1)) + 1))[:size])
                    for b in pdf["media"]
                ]
            else:
                rasters = []
                for b in pdf["media"]:
                    b = bytes(b)
                    if b[:2] not in (b"P5", b"P6"):
                        raise NotImplementedError(
                            "real resize of non-netpbm formats requires an "
                            "image codec (PIL/torchvision); plug it in here"
                        )
                    rasters.append(_resize_netpbm(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "raster": rasters,
                }
            )

    return df.mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame, n_frames: int = 4, duration_ms: int = 1000, fake: bool = True
) -> DataFrame:
    """Frame-sampling: one media row in → n_frames rows out (the 1→N
    generator shape of a video pipeline), via mapInPandas so the fan-out
    happens inside the Arrow batch, never per-row.

    fake=True slices the blob into n_frames contiguous segments with
    evenly spaced fake timestamps; fake=False REALLY samples (a)
    YUV4MPEG2 video — up to n_frames evenly spaced frames demuxed
    codec-free, each row carrying the frame's raw luma plane and its
    true timestamp from the stream's own F<num>:<den> rate — and (b)
    PCM WAV audio — n_frames evenly spaced windows of decoded samples
    with true timestamps from the file's own sample rate — and raises
    at the demuxer plug-in point (pyav/ffmpeg) only for COMPRESSED
    video containers (mp4/mkv). Frames inherit the row's partition —
    no shuffle; at 100 TB follow with write_partitioned, not a
    groupBy."""

    def _y4m_sampled(blob: bytes):
        _w, _h, num, den, frames = _y4m_parse(blob)
        total = len(frames)
        if total == 0:  # header-only stream: valid, zero rows out
            return
        picks = sorted({i * total // n_frames for i in range(n_frames)})
        for idx in picks:
            yield idx, idx * 1000 * den // num, frames[idx]

    def _wav_frames(blob: bytes):
        import io
        import wave

        with wave.open(io.BytesIO(blob)) as wv:
            rate, nf = wv.getframerate(), wv.getnframes()
            fw = wv.getsampwidth() * wv.getnchannels()
            pcm = wv.readframes(nf)
        step = max(nf // n_frames, 1)
        for i in range(n_frames):
            lo = min(i * step, nf)
            hi = min((i + 1) * step, nf)
            yield i, lo * 1000 // max(rate, 1), pcm[lo * fw : hi * fw]

    def _av_sampled(blob: bytes):
        # optional pyav demuxer for COMPRESSED containers (mp4/mkv/...),
        # the same import-guard pattern as the Pillow JPEG fallback
        # (_decode_real): absent in this container, real wherever the
        # dependency exists; the guarded golden lives in
        # tests/test_sources_sinks.py. Decodes the clip inside the Arrow
        # batch (clips are per-doc bounded by ingest; a long-form
        # pipeline would stream-seek instead — documented plug).
        import io

        import av  # noqa: F401 — raises ImportError where absent

        with av.open(io.BytesIO(blob)) as container:
            stream = container.streams.video[0]
            tb = float(stream.time_base) if stream.time_base else 0.0
            decoded = [
                (f.pts, f.to_ndarray(format="gray").tobytes())
                for f in container.decode(stream)
            ]
        total = len(decoded)
        if total == 0:
            return
        picks = sorted({i * total // n_frames for i in range(n_frames)})
        for idx in picks:
            pts, luma = decoded[idx]
            ts = (
                int(pts * tb * 1000)
                if pts is not None and tb
                else idx * duration_ms // max(total, 1)
            )
            yield idx, ts, luma

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_ts_ms": [], "frame": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                blob = bytes(blob)
                if not fake:
                    if blob[: len(_Y4M_MAGIC)] == _Y4M_MAGIC:
                        frames = _y4m_sampled(blob)
                    elif blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
                        frames = _wav_frames(blob)
                    else:
                        # eager import check: _av_sampled is a generator,
                        # so its own import would only fire at first
                        # iteration, past this except
                        try:
                            import av  # noqa: F401
                        except ImportError:
                            raise NotImplementedError(
                                "real frame sampling of compressed video "
                                "containers needs a demuxer — pyav is "
                                "wired in _av_sampled but not installed "
                                "in this container; Y4M video and PCM "
                                "WAV sample codec-free"
                            ) from None
                        frames = _av_sampled(blob)
                else:
                    step = max(len(blob) // n_frames, 1)
                    frames = (
                        (i, i * duration_ms // n_frames,
                         blob[i * step:(i + 1) * step])
                        for i in range(n_frames)
                    )
                for i, ts, fr in frames:
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(ts)
                    out["frame"].append(bytes(fr))
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, FRAME_SCHEMA)


def encode_wav_demo(df: DataFrame) -> DataFrame:
    """Synthesis half of the audio-energy gate: build a REAL PCM16 mono
    WAV per document — 64 samples at 8 kHz, sample k = (byte_k − 128)
    · 256 over the document's bytes cycled (the netpbm/Y4M synthesis
    discipline: valid files any audio tool opens, constructed so the
    DuckDB oracle can rebuild every sample from the ASCII text)."""

    def batches(it: Iterator) -> Iterator:
        import io
        import struct
        import wave

        import pandas as pd

        for pdf in it:
            blobs = []
            for text in pdf["text"]:
                data = text.encode("utf-8")
                if not data:
                    raise ValueError("encode_wav_demo requires non-empty text")
                cyc = (data * (1 + 64 // len(data)))[:64]
                pcm = struct.pack("<64h", *((b - 128) * 256 for b in cyc))
                buf = io.BytesIO()
                with wave.open(buf, "wb") as wv:
                    wv.setnchannels(1)
                    wv.setsampwidth(2)
                    wv.setframerate(8000)
                    wv.writeframes(pcm)
                blobs.append(buf.getvalue())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": blobs})

    return df.mapInPandas(batches, "doc_id long, media binary")


def wav_window_energy(df: DataFrame, window: int = 16) -> DataFrame:
    """Windowed audio energy — the segmentation primitive under VAD,
    silence trimming, and audio near-dup: decode PCM via the REAL
    stdlib codec, split into fixed windows, emit each window's EXACT
    integer sum of squared samples (no float RMS — the sqrt adds
    nothing for thresholding and costs engine exactness). 1→N window
    fan-out stays inside the Arrow batch; no shuffle."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("win_idx", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("energy", T.LongType()),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                with wave.open(io.BytesIO(bytes(blob))) as wv:
                    if wv.getsampwidth() != 2 or wv.getnchannels() != 1:
                        raise ValueError("energy gate expects PCM16 mono")
                    pcm = wv.readframes(wv.getnframes())
                x = np.frombuffer(pcm, dtype=np.int16).astype(np.int64)
                for w in range(0, len(x), window):
                    seg = x[w : w + window]
                    rows.append(
                        (
                            int(doc_id),
                            w // window,
                            len(seg),
                            int((seg * seg).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "win_idx", "n_samples", "energy"]
            )

    return df.mapInPandas(batches, schema)


def media_wav_energy(spark, sf_dir):
    """Driver gate for the REAL audio path: synthesize valid PCM16 WAV
    per document (encode_wav_demo), decode with the stdlib codec and
    window the samples (wav_window_energy — no fakes on this path).
    The oracle rebuilds each sample as (ord(char) − 128)·256 via ASCII
    cycling and sums squares per 16-sample window — equality proves the
    encode → decode → window chain byte-exact."""
    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return wav_window_energy(encode_wav_demo(d))


MULTIMODAL_QUERIES["media_wav_energy"] = media_wav_energy
MULTIMODAL_ORACLE["media_wav_energy"] = (
    "WITH px AS ("
    "  SELECT doc_id, k, "
    "    (ord(substr(repeat(text, CAST(1 + 64 // length(text) AS INT)), "
    "      CAST(k + 1 AS INT), 1)) - 128) * 256 AS s "
    "  FROM documents, UNNEST(range(64)) AS t(k)) "
    "SELECT doc_id, CAST(k // 16 AS INT) AS win_idx, "
    "  CAST(16 AS BIGINT) AS n_samples, "
    "  CAST(SUM(CAST(s AS BIGINT) * s) AS BIGINT) AS energy "
    "FROM px GROUP BY doc_id, k // 16"
)


def tile_hash_media(df: DataFrame) -> DataFrame:
    """Quadrant tile hashes — the crop-robust extension of ahash_media:
    split the decoded 8×8 luma raster into four 4×4 quadrants and
    average-hash each independently (same exact 16·p > Σp integer bit
    rule per tile). A cropped or quadrant-overlaid near-dup still
    matches on the untouched tiles, so the dedup join is per-TILE (doc
    pairs sharing ≥k tile hashes), which plain aHash's whole-image bit
    flip misses. Map-only; the downstream join shuffles 16-bit strings
    per tile, never pixels."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("tile", T.IntegerType()),
            T.StructField("tile_bits", T.StringType()),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                blob = bytes(blob)
                w, h, _mx, ch, raster = _netpbm_raster(blob)
                if (w, h, ch) != (8, 8, 1):
                    raise ValueError("tile_hash_media expects 8x8 P5 input")
                px = raster.reshape(8, 8).astype("int64")
                for t in range(4):
                    q = px[(t // 2) * 4:(t // 2) * 4 + 4,
                           (t % 2) * 4:(t % 2) * 4 + 4].ravel()
                    tot = int(q.sum())
                    bits = "".join(
                        "1" if int(p) * 16 > tot else "0" for p in q
                    )
                    rows.append((int(doc_id), t, bits))
            yield pd.DataFrame(rows, columns=["doc_id", "tile", "tile_bits"])

    return df.mapInPandas(batches, schema)


def media_tile_hashes(spark, sf_dir):
    """Driver gate for the crop-robust tile-hash path: the same real
    P5 synthesis as media_ahash_groups, quadrant-hashed. The oracle
    rebuilds each quadrant's pixels from the row-major cycled ASCII
    layout (pixel (r,c) = char at 8r+c) and replays the exact
    16·p > Σp rule per tile."""
    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return tile_hash_media(encode_netpbm_demo(d))


MULTIMODAL_QUERIES["media_tile_hashes"] = media_tile_hashes
MULTIMODAL_ORACLE["media_tile_hashes"] = (
    "WITH px AS ("
    "  SELECT doc_id, t, r, c, "
    "    ord(substr(repeat(text, CAST(1 + 64 // length(text) AS INT)), "
    "      CAST(((t // 2) * 4 + r) * 8 + (t % 2) * 4 + c + 1 AS INT), 1)) "
    "      AS p "
    "  FROM documents, UNNEST(range(4)) t1(t), UNNEST(range(4)) t2(r), "
    "    UNNEST(range(4)) t3(c)), "
    "s AS (SELECT doc_id, t, SUM(p) AS tot FROM px GROUP BY 1, 2) "
    "SELECT px.doc_id, CAST(px.t AS INT) AS tile, "
    "  string_agg(CASE WHEN 16 * p > tot THEN '1' ELSE '0' END, '' "
    "    ORDER BY r, c) AS tile_bits "
    "FROM px JOIN s ON px.doc_id = s.doc_id AND px.t = s.t "
    "GROUP BY 1, 2"
)


#: scene-cut threshold on the |Δ frame-luma-sum| of 64-byte planes:
#: ~2.3 luma levels per pixel. Sits at ~p75 of the fixture's jump
#: distribution (median 89, p90 210, max 517 at sf0.01), so the gate's
#: n_cuts column actually DISCRIMINATES at every sf — the zero-row
#: degeneracy lesson applied to a constant-column output
SCENE_CUT_THRESHOLD = 150


def media_scene_cuts(spark, sf_dir):
    """Scene-cut detection over the REAL Y4M demux path — the canonical
    video-curation primitive (shot boundaries = luma jumps between
    consecutive frames): per document, demux the synthesized Y4M with
    the real parser (sample_frames fake=False), reduce each raw luma
    plane to its EXACT integer byte sum (the fixture is ASCII, so
    casting the plane to string and summing code points IS the byte
    sum — the media_ahash oracle trick, kept expression-level: no
    second Python pass after the demux), then a per-doc LAG over
    frame_idx scores each transition; a cut is a jump past the
    threshold. Emits per doc: frames, cuts, and the largest jump.

    Scale shape: the 1→N demux fan-out stays inside the Arrow batch,
    the luma reduce is whole-stage codegen, and the only shuffle is the
    per-doc window + rollup (doc-keyed, map-combinable)."""
    from pyspark.sql import Window

    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    frames = sample_frames(encode_y4m_demo(d), n_frames=4, fake=False)
    s = F.col("frame").cast("string")
    luma = frames.select(
        "doc_id", "frame_idx",
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda i: F.ascii(s.substr(i, F.lit(1))),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("luma_sum"),
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    jumps = luma.select(
        "doc_id",
        F.abs(
            F.col("luma_sum") - F.lag("luma_sum", 1).over(w)
        ).alias("jump"),
    )
    return (
        jumps.groupBy("doc_id")
        .agg(
            (F.count(F.lit(1))).cast("long").alias("n_frames"),
            F.sum(
                F.when(F.col("jump") > SCENE_CUT_THRESHOLD, 1).otherwise(0)
            ).cast("long").alias("n_cuts"),
            F.coalesce(F.max("jump"), F.lit(0)).cast("long")
            .alias("max_jump"),
        )
    )


MULTIMODAL_QUERIES["media_scene_cuts"] = media_scene_cuts
MULTIMODAL_ORACLE["media_scene_cuts"] = (
    "WITH luma AS ("
    "  SELECT doc_id, k, SUM(ord(substr("
    "    repeat(text, CAST(2 + 64 // length(text) AS INT)), "
    "    CAST((k * 64) % length(text) AS INT) + CAST(j + 1 AS INT), 1))) "
    "    AS luma_sum "
    "  FROM documents, UNNEST(generate_series(0, doc_id % 3)) AS t(k), "
    "    UNNEST(range(64)) AS u(j) "
    "  GROUP BY 1, 2), "
    "jumps AS ("
    "  SELECT doc_id, ABS(luma_sum - LAG(luma_sum) OVER ("
    "    PARTITION BY doc_id ORDER BY k)) AS jump "
    "  FROM luma) "
    "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames, "
    "  CAST(SUM(CASE WHEN jump > {thr} THEN 1 ELSE 0 END) AS BIGINT) "
    "    AS n_cuts, "
    "  CAST(COALESCE(MAX(jump), 0) AS BIGINT) AS max_jump "
    "FROM jumps GROUP BY 1"
).format(thr=SCENE_CUT_THRESHOLD)


# --------------------------------------------------------------------------
# quiet-run detection over decoded audio (VAD islands)
# --------------------------------------------------------------------------

def quiet_runs(energies: DataFrame) -> DataFrame:
    """Silence/quiet-segment detection over windowed audio energy — the
    islands step of voice-activity detection and silence trimming: a
    window is QUIET iff its energy is below the document's mean window
    energy (the relative threshold is exact integer arithmetic —
    energy·n_windows < total_energy — where an absolute dB cut would
    need a per-corpus calibration pass), and consecutive quiet windows
    merge into runs via the win_idx − row_number islands identity (the
    q70 SCD2 construction applied to audio frames).

    Emits per doc: window/quiet counts, number of quiet runs, and the
    longest run — the trim decision's inputs.

    Scale shape: ONE linear chain over ONE decode — the first cut
    branched the energy frame into a dims groupBy AND a windowed
    islands path joined back, which re-ran the mapInPandas decode per
    branch and smoked 18× at 10× data; this form keeps every row (the
    non-quiet rows collapse into one NULL-island group per doc) so
    window counts, quiet counts, and runs all fall out of one
    two-level aggregate. Both window passes and both groupBys share
    the doc_id partitioning — ONE shuffle, no join, frame payloads
    never move."""
    from pyspark.sql import Window

    g = Window.partitionBy("doc_id")
    wq = Window.partitionBy("doc_id").orderBy("win_idx")
    e = (
        energies.withColumn("n_wins", F.count(F.lit(1)).over(g))
        .withColumn("tot", F.sum("energy").over(g))
        .withColumn(
            "quiet",
            F.col("energy") * F.col("n_wins") < F.col("tot"),
        )
        .withColumn(
            "rq", F.sum(F.col("quiet").cast("int")).over(wq)
        )
        .select(
            "doc_id", "quiet",
            # islands id among quiet rows; NULL collapses every
            # non-quiet row into one throwaway group per doc
            F.when(F.col("quiet"), F.col("win_idx") - F.col("rq"))
            .alias("grp"),
        )
    )
    runs = e.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.col("quiet").cast("int")).alias("is_run"),
    )
    return runs.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("n_windows"),
        F.coalesce(
            F.sum(F.when(F.col("is_run") == 1, F.col("n"))), F.lit(0)
        ).cast("long").alias("n_quiet"),
        F.sum(F.col("is_run")).cast("long").alias("n_runs"),
        F.coalesce(
            F.max(F.when(F.col("is_run") == 1, F.col("n"))), F.lit(0)
        ).cast("long").alias("longest_run"),
    )


def media_quiet_runs(spark, sf_dir):
    """Gate: quiet-run islands over the REAL WAV chain (synthesize →
    stdlib decode → 16-sample integer energies → below-mean islands).
    The oracle rebuilds every sample from the ASCII text and replays
    the threshold and islands identically."""
    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return quiet_runs(wav_window_energy(encode_wav_demo(d)))


MULTIMODAL_QUERIES["media_quiet_runs"] = media_quiet_runs
MULTIMODAL_ORACLE["media_quiet_runs"] = (
    "WITH px AS ("
    "  SELECT doc_id, k, "
    "    (ord(substr(repeat(text, CAST(1 + 64 // length(text) AS INT)), "
    "      CAST(k + 1 AS INT), 1)) - 128) * 256 AS s "
    "  FROM documents, UNNEST(range(64)) AS t(k)), "
    "e AS ("
    "  SELECT doc_id, CAST(k // 16 AS INT) AS win_idx, "
    "    CAST(SUM(CAST(s AS BIGINT) * s) AS BIGINT) AS energy "
    "  FROM px GROUP BY 1, 2), "
    "stats AS ("
    "  SELECT doc_id, win_idx, energy, "
    "    COUNT(*) OVER (PARTITION BY doc_id) AS n_wins, "
    "    SUM(energy) OVER (PARTITION BY doc_id) AS tot "
    "  FROM e), "
    "isl AS ("
    "  SELECT doc_id, win_idx - ROW_NUMBER() OVER ("
    "    PARTITION BY doc_id ORDER BY win_idx) AS grp "
    "  FROM stats WHERE energy * n_wins < tot), "
    "runs AS ("
    "  SELECT doc_id, grp, COUNT(*) AS run_len "
    "  FROM isl GROUP BY 1, 2), "
    "per_doc AS ("
    "  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_runs, "
    "    CAST(MAX(run_len) AS BIGINT) AS longest_run, "
    "    CAST(SUM(run_len) AS BIGINT) AS n_quiet "
    "  FROM runs GROUP BY 1) "
    "SELECT e2.doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows, "
    "  COALESCE(ANY_VALUE(p.n_quiet), 0) AS n_quiet, "
    "  COALESCE(ANY_VALUE(p.n_runs), 0) AS n_runs, "
    "  COALESCE(ANY_VALUE(p.longest_run), 0) AS longest_run "
    "FROM e e2 LEFT JOIN per_doc p ON e2.doc_id = p.doc_id "
    "GROUP BY e2.doc_id"
)


def luma_histogram(df: DataFrame) -> DataFrame:
    """4-bin luma histogram per image over the REAL netpbm decode —
    the exposure/contrast profile an image-curation pass reads before
    filtering too-dark/too-flat assets (the numeric sibling of aHash:
    aHash answers "which images repeat", this answers "what do they
    look like"). Bins are maxval quartiles (p >> 6 for 8-bit): exact
    integer bucketing, no float anywhere. P6 RGB collapses to the
    ITU-R 601 integer luma ×1000 first (the ahash_media rule), then
    buckets against 64·1000-wide bins so P5 and P6 share the bin
    geometry.

    Scale shape: map-only Arrow-batched decode (one pass, no shuffle);
    the output is 4 longs per image."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("b0", T.LongType()),
            T.StructField("b1", T.LongType()),
            T.StructField("b2", T.LongType()),
            T.StructField("b3", T.LongType()),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                blob = bytes(blob)
                if blob[:2] not in (b"P5", b"P6"):
                    raise ValueError("luma_histogram expects netpbm input")
                _w, _h, _mx, ch, raster = _netpbm_raster(blob)
                if ch == 3:
                    px = raster.reshape(-1, 3).astype("int64")
                    luma = px[:, 0] * 299 + px[:, 1] * 587 + px[:, 2] * 114
                else:
                    luma = raster.astype("int64") * 1000
                counts = np.bincount(
                    np.minimum(luma // 64000, 3), minlength=4
                )
                rows.append(
                    (int(doc_id), int(counts[0]), int(counts[1]),
                     int(counts[2]), int(counts[3]))
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "b0", "b1", "b2", "b3"]
            )

    return df.mapInPandas(batches, schema)


def media_luma_histogram(spark, sf_dir):
    """Gate: per-image 4-bin luma histograms over the synthesized REAL
    P5 corpus (encode_netpbm_demo) — DuckDB replays every pixel via
    ASCII repeat+substr cycling and the same integer bucketing."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return luma_histogram(encode_netpbm_demo(docs))


MULTIMODAL_QUERIES["media_luma_histogram"] = media_luma_histogram
MULTIMODAL_ORACLE["media_luma_histogram"] = (
    "WITH px AS ("
    "  SELECT doc_id, "
    "    ord(substr(repeat(text, CAST(1 + 64 // length(text) AS INT)), "
    "      CAST(k + 1 AS INT), 1)) * 1000 AS luma "
    "  FROM documents, UNNEST(range(64)) AS t(k)) "
    "SELECT doc_id, "
    "  CAST(SUM(CASE WHEN luma // 64000 = 0 THEN 1 ELSE 0 END) AS BIGINT) "
    "    AS b0, "
    "  CAST(SUM(CASE WHEN luma // 64000 = 1 THEN 1 ELSE 0 END) AS BIGINT) "
    "    AS b1, "
    "  CAST(SUM(CASE WHEN luma // 64000 = 2 THEN 1 ELSE 0 END) AS BIGINT) "
    "    AS b2, "
    "  CAST(SUM(CASE WHEN LEAST(luma // 64000, 3) = 3 THEN 1 ELSE 0 END) "
    "    AS BIGINT) AS b3 "
    "FROM px GROUP BY doc_id"
)


# --------------------------------------------------------------------------
# baseline-JPEG round-trip gate (round 12)
# --------------------------------------------------------------------------


def encode_jpeg_demo(docs: DataFrame) -> DataFrame:
    """Synthesis half of the JPEG gate: per document, a REAL baseline
    JPEG (vendored T.81 encoder, jpegcodec.py — SOI/DQT/SOF0/DHT/SOS,
    Annex-K tables, Huffman entropy coding) of a 16×16 grayscale image
    made of four FLAT 8×8 blocks whose values derive from doc_id:
    block b = (26·(4·doc_id + b)) mod 256. Flat EVEN-valued blocks are
    the construction that makes a lossy codec hash-oracle-able: each
    block is DC-only and its quantized DC ((v−128)/2 with the Annex-K
    q=16) is integer-exact, so decode returns every pixel EXACTLY and
    DuckDB can replay the luma sum arithmetically — the same trick the
    netpbm/Y4M gates use, extended through a real DCT codec.
    (26·x mod 256 is always even; exactness golden-tested in
    test_sources_sinks.py's flat round trip.)"""

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from .jpegcodec import encode_gray

        for pdf in it:
            blobs = []
            for d in pdf["doc_id"]:
                v = [(26 * (4 * int(d) + b)) % 256 for b in range(4)]
                img = np.empty((16, 16), dtype=np.uint8)
                img[:8, :8] = v[0]
                img[:8, 8:] = v[1]
                img[8:, :8] = v[2]
                img[8:, 8:] = v[3]
                blobs.append(encode_gray(img))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": blobs,
                    "meta": ["image/jpeg"] * len(blobs),
                }
            )

    return docs.select("doc_id").mapInPandas(
        batches, "doc_id long, media binary, meta string"
    )


#: JPEG gate corpus thinning: one image per JPEG_STRIDE documents keeps
#: the per-row Python codec work a bounded fraction of the bench run
#: while still exercising every doc-id residue class of block values.
JPEG_STRIDE = 7


def media_jpeg_roundtrip(spark, sf_dir):
    """Gate: REAL JPEG encode → REAL JPEG decode → exact luma ledger.
    The full vendored codec runs inside the plan (two mapInPandas
    passes, one Arrow batch per task, map-only — no shuffle anywhere);
    the oracle never sees a JPEG byte, it recomputes the flat-block
    construction arithmetically, which only matches because the
    round trip is pixel-exact."""
    docs = load_table(spark, "documents", sf_dir).where(
        F.col("doc_id") % JPEG_STRIDE == 0
    )
    dec = decode_media(encode_jpeg_demo(docs), fake=False)
    return dec.select(
        "doc_id",
        F.element_at("feat", 1).cast("long").alias("w"),
        F.element_at("feat", 2).cast("long").alias("h"),
        F.round(F.element_at("feat", 4) * 256).cast("long").alias(
            "lum_sum"
        ),
    )


MULTIMODAL_QUERIES["media_jpeg_roundtrip"] = media_jpeg_roundtrip
MULTIMODAL_ORACLE["media_jpeg_roundtrip"] = (
    "SELECT doc_id, CAST(16 AS BIGINT) AS w, CAST(16 AS BIGINT) AS h, "
    "  CAST(64 * ("
    "    (26 * (4 * doc_id + 0)) % 256 + (26 * (4 * doc_id + 1)) % 256 "
    "    + (26 * (4 * doc_id + 2)) % 256 + (26 * (4 * doc_id + 3)) % 256"
    "  ) AS BIGINT) AS lum_sum "
    f"FROM documents WHERE doc_id % {JPEG_STRIDE} = 0"
)


# --------------------------------------------------------------------------
# round 13: mean-crossing rate over the real WAV path
# --------------------------------------------------------------------------


def wav_mean_crossings(df: DataFrame) -> DataFrame:
    """Per-clip mean-crossing rate — the DC-robust zero-crossing-rate
    variant (audio's cheapest pitch/voicedness proxy; plain ZCR is
    useless on a signal with DC offset, and the ASCII-derived demo
    samples are all-negative by construction). Decodes the REAL PCM16
    WAV via the stdlib codec (no fakes on this path — the
    media_wav_energy discipline), then counts sign changes of the
    mean-removed signal in EXACT integers: with S = Σs over the n
    samples, sample k crosses iff (n·s_k − S)·(n·s_{k+1} − S) < 0 —
    scaling by n instead of dividing by it keeps everything integral
    (|n·s| ≤ 64·2¹⁵ so the product fits int64 with 10⁶× headroom).
    Emits min/max sample alongside — the clip's exact dynamic range.

    Map-only (one Arrow batch per task, no shuffle); the per-clip
    reduce happens inside numpy."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("mcr", T.LongType()),
            T.StructField("s_min", T.LongType()),
            T.StructField("s_max", T.LongType()),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                with wave.open(io.BytesIO(bytes(blob))) as wv:
                    if wv.getsampwidth() != 2 or wv.getnchannels() != 1:
                        raise ValueError("mean-crossing gate expects PCM16 mono")
                    pcm = wv.readframes(wv.getnframes())
                x = np.frombuffer(pcm, dtype=np.int16).astype(np.int64)
                n = len(x)
                c = n * x - int(x.sum())
                rows.append(
                    (
                        int(doc_id),
                        int(((c[:-1] * c[1:]) < 0).sum()),
                        int(x.min()),
                        int(x.max()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "mcr", "s_min", "s_max"]
            )

    return df.mapInPandas(batches, schema)


def media_wav_crossings(spark, sf_dir):
    """Gate: synthesize the PCM16 demo WAV per document and measure
    mean-crossing rate + dynamic range through the real codec; the
    oracle rebuilds every sample from the ASCII text as (ord(char) −
    128)·256 and replays the integer crossing product over a lag
    window — equality proves encode → decode → crossing-count
    byte-exact."""
    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return wav_mean_crossings(encode_wav_demo(d))


MULTIMODAL_QUERIES["media_wav_crossings"] = media_wav_crossings
MULTIMODAL_ORACLE["media_wav_crossings"] = (
    "WITH px AS ("
    "  SELECT doc_id, k, "
    "    (ord(substr(repeat(text, CAST(1 + 64 // length(text) AS INT)), "
    "      CAST(k + 1 AS INT), 1)) - 128) * 256 AS s "
    "  FROM documents, UNNEST(range(64)) AS t(k)), "
    "tot AS (SELECT doc_id, SUM(s)::BIGINT AS sm FROM px GROUP BY doc_id), "
    "c AS ("
    "  SELECT px.doc_id, px.k, 64 * px.s - tot.sm AS cv, "
    "    LEAD(64 * px.s - tot.sm) OVER ("
    "      PARTITION BY px.doc_id ORDER BY px.k) AS cn, "
    "    px.s "
    "  FROM px JOIN tot ON px.doc_id = tot.doc_id) "
    "SELECT doc_id, "
    "  CAST(SUM(CASE WHEN cv * cn < 0 THEN 1 ELSE 0 END) AS BIGINT) AS mcr, "
    "  CAST(MIN(s) AS BIGINT) AS s_min, CAST(MAX(s) AS BIGINT) AS s_max "
    "FROM c GROUP BY doc_id"
)
