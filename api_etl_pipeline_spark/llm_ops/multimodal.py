"""Multimodal column plumbing (BASELINE.json north-star).

Media assets are opaque `binary` columns with a typed metadata struct —
the blob-store pattern (SURVEY §1.1 #4) lifted into the row: at 100 TB
bytes live in the blob table / object storage partitioned by hash prefix
and the metadata struct travels with the row; decode/feature-extract run
as Arrow-batched Pandas UDFs over mapInPandas (the only Python in the
engine, batched so the interpreter cost amortizes per ~10k rows).

Codec libraries (PIL/libvips/ffmpeg) are NOT available in this
environment, so `decode_image` implements the formats a pure header
parse can serve — binary PPM/PGM and uncompressed 24-bit BMP — and the
`decode_image_features` mapInPandas stage runs that REAL decode
end-to-end (tests/test_multimodal.py decodes actual fixtures through
Spark). Compressed formats route to the per-row `decode_error`
quarantine column until a codec is swapped in at deploy time. The
synthetic corpus queries (mm01-mm04) use `fake_decode_features` — a
deterministic byte-level featurizer — because testdata payloads are
text bytes, not images; the plumbing (schema, batching, partitioning)
is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from api_etl_pipeline_spark.registry import query
from api_etl_pipeline_spark.tables import load_table

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "byte_mean double, byte_mode int, header_hex string"
)


def decode_image(content: bytes) -> tuple[int, int, bytes]:
    """Dependency-free image decoder for the uncompressed formats a
    header parse can serve: binary PPM (P6), binary PGM (P5, expanded to
    RGB), and 24-bit uncompressed BMP. Returns (width, height, rgb) with
    `rgb` as height*width*3 bytes in row-major top-down order.

    Compressed formats (PNG/JPEG) still need a codec library at deploy
    time — swap this hook; everything downstream only sees (w, h, rgb).
    Raises ValueError on anything it cannot decode, which mm-pipeline
    stages route to a quarantine column exactly like corrupt JSON (F10).
    """
    if content[:2] in (b"P6", b"P5"):
        return _decode_pnm(content)
    if content[:2] == b"BM":
        return _decode_bmp(content)
    raise ValueError(f"undecodable image header {content[:4]!r}")


def _decode_pnm(content: bytes) -> tuple[int, int, bytes]:
    """Netpbm binary: 'P6'/'P5', whitespace/comment-separated width,
    height, maxval, single whitespace, then raw samples (spec:
    netpbm.sourceforge.net/doc/ppm.html)."""
    magic = content[:2]
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment to end-of-line
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(content) and content[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            raise ValueError("malformed PNM header")
        fields.append(int(content[start:pos]))
    pos += 1  # exactly one whitespace byte before raster data
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    if maxval < 1:
        raise ValueError("malformed PNM maxval")
    n = w * h * (3 if magic == b"P6" else 1)
    raster = content[pos : pos + n]
    if len(raster) < n:
        raise ValueError("truncated PNM raster")
    if maxval != 255:
        # spec-legal low-maxval images store samples in [0, maxval];
        # rescale to 8-bit (round-half-up) or stats come out dark
        table = bytes(min(255, (v * 255 + maxval // 2) // maxval) for v in range(256))
        raster = raster.translate(table)
    if magic == b"P5":  # grey → RGB triplets
        raster = bytes(b for g in raster for b in (g, g, g))
    return w, h, raster


def _decode_bmp(content: bytes) -> tuple[int, int, bytes]:
    """BMP, BITMAPINFOHEADER, 24bpp, BI_RGB (uncompressed): little-endian
    header fields, BGR pixel order, rows padded to 4 bytes, bottom-up
    unless height is negative (spec: Windows BITMAPINFOHEADER docs)."""
    import struct

    if len(content) < 54:
        raise ValueError("truncated BMP header")
    data_offset = struct.unpack_from("<I", content, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", content, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", content, 26)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    stride = ((w * 3 + 3) // 4) * 4
    if len(content) < data_offset + stride * h:
        raise ValueError("truncated BMP raster")
    import numpy as np

    rows = np.frombuffer(
        content, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return w, h, rows[:, :, ::-1].tobytes()  # BGR → RGB


def _make_fake_decoder():
    """Build the stand-in decoder as a *closure* so cloudpickle serializes
    it by value — a module-level function would pickle by reference and
    fail on executors that don't have this repo on sys.path (e.g. a
    driver harness running from another cwd)."""
    import pandas as _pd

    def fake_decode_features(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            contents = pdf["content"]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": contents.map(len).astype("int64"),
                    "byte_mean": contents.map(
                        lambda b: (sum(b) / len(b)) if len(b) else 0.0
                    ).astype("float64"),
                    "byte_mode": contents.map(
                        lambda b: max(set(b), key=lambda x: (b.count(x), -x)) if len(b) else 0
                    ).astype("int32"),
                    "header_hex": contents.map(lambda b: b[:4].hex()),
                }
            )

    return fake_decode_features


# deterministic stand-in decoder: byte-level statistics per Arrow batch,
# shape-identical to a real decoder stage
fake_decode_features = _make_fake_decoder()


DECODE_SCHEMA = (
    "doc_id bigint, width int, height int, n_pixels bigint, "
    "mean_r double, mean_g double, mean_b double, decode_error string"
)


def _make_image_decoder():
    """Arrow-batched REAL decode stage over (doc_id, content): parses
    PPM/PGM/BMP payloads with `decode_image` and emits per-image pixel
    statistics; rows that fail to decode carry the error in
    `decode_error` instead of killing the job (the F10 quarantine
    pattern applied to media). Closure for the same cloudpickle-by-value
    reason as the fake decoder."""
    import numpy as np
    import pandas as _pd

    def decode_features(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "n_pixels",
                "mean_r", "mean_g", "mean_b", "decode_error",
            )}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                try:
                    w, h, rgb = decode_image(bytes(content))
                    px = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3)
                    means = px.mean(axis=0) if len(px) else np.zeros(3)
                    vals = (w, h, w * h, *map(float, means), None)
                except ValueError as exc:
                    vals = (0, 0, 0, 0.0, 0.0, 0.0, str(exc))
                for k, v in zip(
                    ("width", "height", "n_pixels", "mean_r", "mean_g", "mean_b",
                     "decode_error"),
                    vals,
                ):
                    rows[k].append(v)
                rows["doc_id"].append(doc_id)
            out = _pd.DataFrame(rows)
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            out["n_pixels"] = out["n_pixels"].astype("int64")
            yield out

    return decode_features


decode_image_features = _make_image_decoder()


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a multimodal table from documents: text bytes stand in
    for media payloads; the metadata struct is the real contract
    (media_type, declared size, content address)."""
    d = load_table(spark, sf_dir, "documents")
    content = F.encode(F.col("text"), "utf-8")
    media_type = (
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
    )
    return d.select(
        "doc_id",
        media_type.alias("media_type"),
        content.alias("content"),
        F.struct(
            F.sha2(content, 256).alias("sha256"),
            F.length(content).cast("bigint").alias("declared_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


@query(
    "mm01_multimodal_features",
    oracle="""
    WITH media AS (
        SELECT doc_id, text,
               CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS media_type,
               length(text)::BIGINT AS n_bytes
        FROM documents
    ),
    chars AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, length(text)),
                                     i -> ascii(text[i]))) AS b
        FROM media
    ),
    mode AS (
        SELECT doc_id, b AS byte_mode FROM (
            SELECT doc_id, b,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY COUNT(*) DESC, b ASC
                   ) AS rn
            FROM chars GROUP BY doc_id, b
        ) WHERE rn = 1
    ),
    mean AS (
        SELECT doc_id, list_sum(list_transform(generate_series(1, length(text)),
                                               i -> ascii(text[i]))) / length(text)
                       AS byte_mean
        FROM media
    )
    SELECT m.doc_id, m.media_type, m.n_bytes,
           mn.byte_mean, md.byte_mode::INT AS byte_mode,
           lower(hex(encode(substring(m.text, 1, 4)))) AS header_hex,
           sha256(m.text) AS sha256,
           m.n_bytes AS declared_bytes,
           TRUE AS size_matches
    FROM media m JOIN mode md USING (doc_id) JOIN mean mn USING (doc_id)
    """,
)
def mm01_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract over binary media columns via mapInPandas —
    the Arrow-batched slow-path pattern (SURVEY §2.10 U-rows).

    Oracle promotion (round-5; rows-only through round 4): because the
    synthetic payloads are the documents' ASCII bytes, every feature the
    Arrow stage computes (byte sum/mean as one int/int division, modal
    byte with count-desc/value-asc tie-break, first-4-bytes hex, sha256)
    has an exact SQL twin — so the driver now differentially verifies
    the ACTUAL mapInPandas Python stage end-to-end against DuckDB, the
    strongest check a Pandas-UDF stage can get. (The real-image decode
    leg is exercised separately via decode_image_features on PPM/BMP
    fixtures.)"""
    media = media_table(spark, sf_dir)
    feats = media.select("doc_id", "media_type", "content").mapInPandas(
        fake_decode_features, schema=FEATURE_SCHEMA
    )
    return feats.join(
        media.select("doc_id", F.col("meta.sha256").alias("sha256"),
                     F.col("meta.declared_bytes").alias("declared_bytes")),
        "doc_id",
    ).withColumn("size_matches", F.col("n_bytes") == F.col("declared_bytes"))


FRAME_SCHEMA = (
    "doc_id bigint, frame_no int, frame_offset bigint, frame_bytes bigint, "
    "frame_sha256 string"
)


def sample_frames(media: DataFrame, frame_size: int = 32, every_n: int = 4) -> DataFrame:
    """Frame sampling over binary media (the video path): each payload is
    cut into fixed-size windows and every n-th window is kept — the Spark
    plumbing (offset arithmetic with a JVM-side sequence transform, byte
    slicing, per-frame hashing) is real; a production decoder would
    replace the byte windows with actual decoded frames at the same
    schema. Narrow (explode only), no shuffle."""
    n_frames = F.floor(F.length("content") / frame_size).cast("int")
    frame_idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
    sampled = F.filter(frame_idx, lambda i: i % every_n == F.lit(0))
    exploded = media.select(
        "doc_id", "content", F.explode(sampled).alias("frame_no")
    ).filter(F.length("content") >= frame_size)
    frame = F.substring(
        F.col("content"), (F.col("frame_no") * frame_size + 1).cast("int"), frame_size
    )
    return exploded.select(
        "doc_id",
        F.col("frame_no").cast("int").alias("frame_no"),
        (F.col("frame_no").cast("bigint") * frame_size).alias("frame_offset"),
        F.length(frame).cast("bigint").alias("frame_bytes"),
        F.sha2(frame, 256).alias("frame_sha256"),
    )


@query(
    "mm02_frame_sampling",
    oracle="""
    WITH sized AS (
        SELECT doc_id, text AS content,
               (octet_length(encode(text)) // 32)::INT AS n_frames
        FROM documents
        WHERE doc_id % 3 = 2 AND octet_length(encode(text)) >= 32
    ),
    frames AS (
        SELECT doc_id, content, unnest(range(0, n_frames, 4))::INT AS frame_no
        FROM sized
    )
    SELECT doc_id, frame_no,
           (frame_no::BIGINT * 32) AS frame_offset,
           octet_length(encode(substring(content, frame_no * 32 + 1, 32)))::BIGINT
               AS frame_bytes,
           sha256(substring(content, frame_no * 32 + 1, 32)) AS frame_sha256
    FROM frames
    """,
)
def mm02_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample the synthetic video rows (every 4th 32-byte window) —
    the decode-free half of a video ingestion pipeline; per-frame hashes
    feed frame-level dedup exactly like document hashes feed text dedup.

    Oracle promotion (round-5; was rows-only): the whole stage is JVM
    byte arithmetic — no Pandas UDF — so DuckDB can state it exactly.
    DuckDB lacks BLOB substring/sha256, so the oracle slices the VARCHAR
    and hashes that; byte slicing ≡ char slicing because the synthetic
    corpus is pure ASCII (octet_length(encode(text)) = length(text) for
    every row — would surface as an oracle mismatch if the generator
    ever changed)."""
    media = media_table(spark, sf_dir).filter(F.col("media_type") == "video/mp4")
    return sample_frames(media)


RESIZE_SCHEMA = (
    "doc_id bigint, src_w int, src_h int, dst_w int, dst_h int, "
    "resized binary, resized_sha256 string"
)


def _make_fake_resizer(dst_w: int, dst_h: int):
    """Nearest-neighbor resize over the byte payload viewed as a src_w×src_h
    single-channel image (the deterministic stand-in for a real decoder +
    resampler; same closure-serialization rationale as the decoder).

    numpy fancy-indexing does the whole batch's pixel gather vectorized —
    the exact code shape a real resampler (PIL.thumbnail / cv2.resize)
    would occupy, at the same RESIZE_SCHEMA contract."""
    import hashlib

    import numpy as np
    import pandas as _pd

    def resize(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # index maps are shared across the batch: dst pixel -> src pixel
        for pdf in it:
            rows = {k: [] for k in (
                "doc_id", "src_w", "src_h", "dst_w", "dst_h", "resized", "resized_sha256"
            )}
            for doc_id, content, src_w, src_h in zip(
                pdf["doc_id"], pdf["content"], pdf["src_w"], pdf["src_h"]
            ):
                img = np.frombuffer(content, dtype=np.uint8)[: src_w * src_h]
                if len(img) < src_w * src_h:  # payload shorter than declared
                    img = np.pad(img, (0, src_w * src_h - len(img)))
                img = img.reshape(src_h, src_w)
                ys = (np.arange(dst_h) * src_h) // dst_h
                xs = (np.arange(dst_w) * src_w) // dst_w
                out = img[np.ix_(ys, xs)].tobytes()
                rows["doc_id"].append(doc_id)
                rows["src_w"].append(src_w)
                rows["src_h"].append(src_h)
                rows["dst_w"].append(dst_w)
                rows["dst_h"].append(dst_h)
                rows["resized"].append(out)
                rows["resized_sha256"].append(hashlib.sha256(out).hexdigest())
            out_pdf = _pd.DataFrame(rows)
            out_pdf["src_w"] = out_pdf["src_w"].astype("int32")
            out_pdf["src_h"] = out_pdf["src_h"].astype("int32")
            out_pdf["dst_w"] = out_pdf["dst_w"].astype("int32")
            out_pdf["dst_h"] = out_pdf["dst_h"].astype("int32")
            yield out_pdf

    return resize


def _mm03_oracle() -> str:
    """mm03 oracle: the same floor nearest-neighbor gather, spelled out
    as 256 per-cell char lookups (dst (dy,dx) ← src byte at row
    (dy·src_h)//16, col (dx·32)//16), concatenated in dst row-major
    order and sha256'd — generated from one Python loop, like mm06."""
    cells = ", ".join(
        f"text[(({dy} * src_h) // 16) * 32 + {(dx * 32) // 16} + 1]"
        for dy in range(16)
        for dx in range(16)
    )
    return f"""
    WITH media AS (
        SELECT doc_id, text, 32 AS src_w, (length(text) // 32)::INT AS src_h
        FROM documents
        WHERE doc_id % 3 = 0 AND length(text) >= 32
    )
    SELECT doc_id, src_w::INT AS src_w, src_h,
           16 AS dst_w, 16 AS dst_h,
           sha256(concat({cells})) AS resized_sha256
    FROM media
    """


def image_resize_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full resize stage including the raw `resized` thumbnail bytes
    (RESIZE_SCHEMA); mm03 registers the hash-bearing projection so the
    gather is oracle-checkable (binary columns don't hash cross-engine,
    their sha256 does)."""
    media = media_table(spark, sf_dir).filter(
        (F.col("media_type") == "image/png") & (F.length("content") >= 32)
    )
    src = media.select(
        "doc_id",
        "content",
        F.lit(32).cast("int").alias("src_w"),
        F.floor(F.length("content") / 32).cast("int").alias("src_h"),
    )
    return src.mapInPandas(_make_fake_resizer(16, 16), schema=RESIZE_SCHEMA)


@query("mm03_image_resize", oracle=_mm03_oracle())
def mm03_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch image resize to a 16×16 thumbnail (the resize leg of the
    decode / feature-extract / resize / frame-sample quartet). Source
    dimensions are derived from the payload (width 32, height = len/32),
    carried as metadata exactly as a decoded image's shape would be; the
    resample itself is an Arrow-batched mapInPandas stage whose
    nearest-neighbor gather is vectorized per image. Narrow plan — no
    shuffle; thumbnails feed perceptual dedup like frame hashes feed
    frame dedup.

    Oracle promotion (round-5; rows-only through round 4): the
    registered output carries the thumbnail's sha256 instead of its raw
    bytes, and DuckDB reproduces the identical 256-cell floor gather
    over the ASCII payload and hashes the same 256-char string — the
    driver differentially verifies the numpy fancy-indexing gather
    inside the Arrow UDF. Rows shorter than 32 bytes are excluded on
    both sides (the zero-padding path has no SQL twin; no shipped sf
    has such rows — min length 44); the full binary output remains
    available via image_resize_full and its pytest."""
    return image_resize_full(spark, sf_dir).select(
        "doc_id", "src_w", "src_h", "dst_w", "dst_h", "resized_sha256"
    )


AUDIO_SCHEMA = (
    "doc_id bigint, n_samples bigint, n_frames int, "
    "peak_frame int, peak_energy bigint, mean_energy double"
)


def _make_audio_profiler(frame_samples: int = 256):
    """Frame-energy profiler over the payload viewed as int16 PCM — the
    audio leg of the multimodal quartet (decode stays stubbed; the
    energy math is what a VAD/silence-trim stage runs after decoding).
    Integer sum-of-squares per frame keeps every reported number exact
    (no float accumulation), so results are bit-stable at any
    partitioning; same closure-serialization rationale as the decoder."""
    import numpy as np
    import pandas as _pd

    def profile(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "doc_id", "n_samples", "n_frames", "peak_frame",
                "peak_energy", "mean_energy",
            )}
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                buf = content[: (len(content) // 2) * 2]
                samples = np.frombuffer(buf, dtype="<i2").astype(np.int64)
                n_frames = len(samples) // frame_samples
                if n_frames == 0:
                    continue
                frames = samples[: n_frames * frame_samples].reshape(
                    n_frames, frame_samples
                )
                energy = (frames * frames).sum(axis=1)  # exact int64
                peak = int(np.argmax(energy))  # first max = deterministic
                rows["doc_id"].append(doc_id)
                rows["n_samples"].append(len(samples))
                rows["n_frames"].append(n_frames)
                rows["peak_frame"].append(peak)
                rows["peak_energy"].append(int(energy[peak]))
                rows["mean_energy"].append(float(int(energy.sum())) / n_frames)
            out = _pd.DataFrame(rows)
            out["n_frames"] = out["n_frames"].astype("int32")
            out["peak_frame"] = out["peak_frame"].astype("int32")
            yield out

    return profile


@query(
    "mm04_audio_frame_energy",
    oracle="""
    WITH sized AS (
        SELECT doc_id, text,
               (length(text) // 2)::BIGINT AS n_samples,
               ((length(text) // 2) // 256)::INT AS n_frames
        FROM documents
        WHERE doc_id % 3 = 1 AND (length(text) // 2) // 256 >= 1
    ),
    frames AS (
        SELECT doc_id, n_samples, n_frames, f,
               list_sum(list_transform(
                   generate_series(f * 256 + 1, f * 256 + 256),
                   k -> (
                       CASE WHEN ascii(text[2*k-1]) + 256 * ascii(text[2*k]) >= 32768
                            THEN ascii(text[2*k-1]) + 256 * ascii(text[2*k]) - 65536
                            ELSE ascii(text[2*k-1]) + 256 * ascii(text[2*k]) END
                   )::BIGINT * (
                       CASE WHEN ascii(text[2*k-1]) + 256 * ascii(text[2*k]) >= 32768
                            THEN ascii(text[2*k-1]) + 256 * ascii(text[2*k]) - 65536
                            ELSE ascii(text[2*k-1]) + 256 * ascii(text[2*k]) END
                   )::BIGINT
               ))::BIGINT AS energy
        FROM sized, UNNEST(generate_series(0, n_frames - 1)) AS t(f)
    ),
    peak AS (
        SELECT doc_id, f AS peak_frame, energy AS peak_energy FROM (
            SELECT doc_id, f, energy,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY energy DESC, f ASC
                   ) AS rn
            FROM frames
        ) WHERE rn = 1
    )
    SELECT s.doc_id, s.n_samples, s.n_frames,
           p.peak_frame::INT AS peak_frame, p.peak_energy,
           (SELECT SUM(energy) FROM frames fr WHERE fr.doc_id = s.doc_id)
               / s.n_frames AS mean_energy
    FROM sized s JOIN peak p USING (doc_id)
    """,
)
def mm04_audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio frame-energy profile (256-sample frames over int16 PCM):
    per-clip sample/frame counts, the deterministic peak frame, and
    exact-integer energy stats — the silence-trim / VAD precursor. All
    arithmetic is int64; only the final mean is one division.

    Oracle promotion (round-5; rows-only through round 4): the int16
    little-endian view of the ASCII payload is exact integer
    arithmetic — sample k = b[2k] + 256·b[2k+1], signed via the 32768
    wrap — so DuckDB reproduces the frame energies (BIGINT squares),
    the first-max peak, and the single int/int mean division
    bit-for-bit. The driver therefore differentially verifies the numpy
    `<i2` reinterpret + reshape + square-sum inside the Arrow UDF.
    Clips shorter than one frame are dropped identically on both
    sides."""
    media = media_table(spark, sf_dir).filter(F.col("media_type") == "audio/wav")
    return media.select("doc_id", "content").mapInPandas(
        _make_audio_profiler(), schema=AUDIO_SCHEMA
    )


@query(
    "mm05_caption_pairs",
    oracle="""
    WITH media AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS media_type,
               sha256(text) AS media_sha,
               octet_length(encode(text))::BIGINT AS media_bytes
        FROM documents
    ),
    captions AS (
        SELECT doc_id AS cap_id, text AS caption, lang
        FROM documents WHERE n_chars < 160
    )
    SELECT m.doc_id, c.cap_id, m.media_type, m.media_sha, m.media_bytes,
           c.lang, length(c.caption)::BIGINT AS caption_chars
    FROM media m
    JOIN captions c ON c.cap_id = m.doc_id + 1
    WHERE m.media_type = 'image/png'
    """,
)
def mm05_caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-caption pair builder — the contrastive-training (CLIP-style)
    dataset stage: pair each image asset with its caption text (here the
    adjacent document standing in for the crawl's alt-text, filtered to
    caption-length), carrying the media content address so pairs
    de-duplicate by (media_sha, caption) downstream.

    Oracle-checked end-to-end because the pairing itself is pure
    relational work over the media metadata — the binary column never
    needs decoding to build pairs (sha256/length compute engine-side on
    both engines). Plan: the caption side projects two string columns
    and equi-joins on the id arithmetic; at 100 TB both sides partition
    by doc_id so the join co-locates, and the decode stage (mm01) runs
    AFTER pairing on the surviving rows only — decode-late is the core
    multimodal cost rule."""
    m = media_table(spark, sf_dir)
    media = m.filter(F.col("media_type") == "image/png").select(
        "doc_id",
        "media_type",
        F.col("meta")["sha256"].alias("media_sha"),
        F.col("meta")["declared_bytes"].alias("media_bytes"),
    )
    d = load_table(spark, sf_dir, "documents")
    captions = d.filter(F.col("n_chars") < 160).select(
        F.col("doc_id").alias("cap_id"), F.col("text").alias("caption"), "lang"
    )
    return (
        media.join(captions, captions.cap_id == media.doc_id + 1)
        .select(
            "doc_id",
            "cap_id",
            "media_type",
            "media_sha",
            "media_bytes",
            "lang",
            F.length("caption").cast("bigint").alias("caption_chars"),
        )
    )


def _ahash_oracle() -> str:
    """Generate the mm06 oracle with the 64 grid-sample expressions
    spelled out from the SAME Python loop that builds the Spark side, so
    the sampling positions cannot drift between engines."""
    samples = [
        f"ascii(substring(text, ({gy} * src_h) // 8 * 32 + {(gx * 32) // 8} + 1, 1))"
        for gy in range(8)
        for gx in range(8)
    ]
    total = " + ".join(f"s[{i + 1}]" for i in range(64))
    bits = ", ".join(
        f"CASE WHEN s[{i + 1}] * 64 > tot THEN '1' ELSE '0' END" for i in range(64)
    )
    return f"""
    WITH media AS (
        SELECT doc_id, text, (length(text) // 32)::INT AS src_h
        FROM documents
        WHERE doc_id % 3 = 0 AND length(text) >= 32
    ),
    sampled AS (
        SELECT doc_id, [{", ".join(samples)}] AS s FROM media
    ),
    hashed AS (
        SELECT doc_id, concat({bits}) AS ahash
        FROM (SELECT doc_id, s, ({total}) AS tot FROM sampled)
    )
    SELECT ahash,
           substring(ahash, 1, 16) AS band16,
           COUNT(*)::BIGINT AS n_docs,
           MIN(doc_id) AS keeper_doc_id
    FROM hashed GROUP BY ahash
    """


@query("mm06_perceptual_hash_groups", oracle=_ahash_oracle())
def mm06_perceptual_hash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash (aHash) bucketing over image payloads —
    the multimodal twin of dd01's content-hash dedup: two images whose
    8×8 luma downsample brightens/darkens the same way collide on the
    64-bit hash even when their bytes differ (re-encodes, metadata
    edits), and the 16-bit band prefix is the LSH-style coarse key for
    Hamming-near candidate pairing. Payloads follow mm03's convention —
    the byte stream viewed as a 32-wide single-channel image — so the
    grid sample is plain JVM integer arithmetic: pixel value at grid
    cell (gy, gx) = byte at row (gy·src_h)//8, col (gx·32)//8; bit =
    sample·64 > Σsamples (integer-only mean comparison, no float
    anywhere, hence hash-exact cross-engine). Both engines' 64 sample
    expressions are generated by the same Python loop.

    Scale shape: narrow per-row projection (64 substring/ascii ops,
    whole-stage codegen) then ONE hash shuffle on the 64-bit key —
    dd01's linear-dedup cost model applied to media. A real deployment
    swaps the byte view for decode_image output at the same schema; the
    grouping/banding plumbing is unchanged."""
    d = load_table(spark, sf_dir, "documents")
    media = d.filter((F.col("doc_id") % 3 == 0) & (F.length("text") >= 32)).select(
        "doc_id", "text", F.floor(F.length("text") / 32).cast("int").alias("src_h")
    )
    # the 64 sample expressions and 64 bit cases ride through ONE
    # F.expr parse each (r14): the F.ascii/F.substring/F.when Column
    # builds cost one py4j round trip per node (~1.9 s of driver time
    # per construction for ~600 nodes); the SQL strings parse to the
    # identical expression trees in two calls
    samples_sql = ",".join(
        f"ascii(substring(text, cast(floor({gy} * src_h / 8) * 32 "
        f"+ {(gx * 32) // 8 + 1} as int), 1))"
        for gy in range(8)
        for gx in range(8)
    )
    sampled = media.select(
        "doc_id", F.expr(f"array({samples_sql})").alias("s")
    ).withColumn("tot", F.aggregate(F.col("s"), F.lit(0), lambda a, b: a + b))
    bits_sql = ",".join(
        f"CASE WHEN element_at(s, {i + 1}) * 64 > tot THEN '1' ELSE '0' END"
        for i in range(64)
    )
    hashed = sampled.select("doc_id", F.expr(f"concat({bits_sql})").alias("ahash"))
    return hashed.groupBy("ahash").agg(
        F.substring("ahash", 1, 16).alias("band16"),
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("keeper_doc_id"),
    )
