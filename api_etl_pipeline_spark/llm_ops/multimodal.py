"""Multimodal column plumbing (BASELINE.json north-star).

Media assets are opaque `binary` columns with a typed metadata struct —
the blob-store pattern (SURVEY §1.1 #4) lifted into the row: at 100 TB
bytes live in the blob table / object storage partitioned by hash prefix
and the metadata struct travels with the row; decode/feature-extract run
as Arrow-batched Pandas UDFs over mapInPandas (the only Python in the
engine, batched so the interpreter cost amortizes per ~10k rows).

The actual image/audio decoders are NOT available in this environment —
`decode_image` raises NotImplementedError by design, and the pipeline is
exercised with `fake_decode_features` (a deterministic byte-level
featurizer) so the Spark-side plumbing — schema, batching, partition
behavior — is real and tested (tests/test_multimodal.py).
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


def decode_image(content: bytes):  # pragma: no cover - stub by design
    """Real decoder hook (PIL/libvips/ffmpeg are not in this container).

    Swap in an actual implementation where available; everything
    downstream only sees the feature schema.
    """
    raise NotImplementedError("image decoding requires an image library at deploy time")


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


@query("mm01_multimodal_features", oracle=None)  # not SQL-expressible: Pandas-UDF stage
def mm01_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract over binary media columns via mapInPandas —
    the Arrow-batched slow-path pattern (SURVEY §2.10 U-rows). Driver
    records a rows-only check; tests/test_multimodal.py pins values."""
    media = media_table(spark, sf_dir)
    feats = media.select("doc_id", "media_type", "content").mapInPandas(
        fake_decode_features, schema=FEATURE_SCHEMA
    )
    return feats.join(
        media.select("doc_id", F.col("meta.sha256").alias("sha256"),
                     F.col("meta.declared_bytes").alias("declared_bytes")),
        "doc_id",
    ).withColumn("size_matches", F.col("n_bytes") == F.col("declared_bytes"))
