"""Multimodal plumbing: the mapInPandas decode stage is exercised with the
deterministic fake decoder; values are pinned against a driver-side
recomputation so the Arrow batch path is verified end-to-end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from api_etl_pipeline_spark.llm_ops.multimodal import (
    decode_image,
    media_table,
    mm01_multimodal_features,
)
from tests.conftest import SF_SMOKE


def _ppm_fixture(w=4, h=2):
    """P6 with a comment line; pixel (x,y) = (x*60, y*100, 7)."""
    header = f"P6\n# test fixture\n{w} {h}\n255\n".encode()
    raster = bytes(
        b for y in range(h) for x in range(w) for b in (x * 60, y * 100, 7)
    )
    return header + raster, [(x * 60, y * 100, 7) for y in range(h) for x in range(w)]


def _bmp_fixture(w=3, h=2):
    """24bpp BI_RGB bottom-up BMP, rows padded to 4 bytes; same pixel rule."""
    import struct

    stride = ((w * 3 + 3) // 4) * 4
    raster = bytearray()
    for y in reversed(range(h)):  # bottom-up storage
        row = bytearray()
        for x in range(w):
            r, g, b = x * 60, y * 100, 7
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * (stride - len(row))
        raster += row
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    header += struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return bytes(header + raster), [
        (x * 60, y * 100, 7) for y in range(h) for x in range(w)
    ]


def test_decode_image_ppm_and_bmp_exact_pixels():
    for blob, pixels in (_ppm_fixture(), _bmp_fixture()):
        w, h, rgb = decode_image(blob)
        got = [tuple(rgb[i : i + 3]) for i in range(0, len(rgb), 3)]
        assert (w * h) == len(pixels) and got == pixels


def test_decode_image_pgm_expands_grey():
    blob = b"P5\n2 1\n255\n" + bytes((10, 200))
    w, h, rgb = decode_image(blob)
    assert (w, h) == (2, 1) and rgb == bytes((10, 10, 10, 200, 200, 200))


def test_decode_image_low_maxval_rescales():
    """Spec-legal maxval<255 samples must rescale to 8-bit, not pass
    through dark (review finding): maxval=15 full-white == 255."""
    blob = b"P6\n2 1\n15\n" + bytes((15, 0, 7, 3, 15, 15))
    w, h, rgb = decode_image(blob)
    assert (w, h) == (2, 1)
    assert tuple(rgb) == (255, 0, 119, 51, 255, 255)  # (v*255+7)//15


def test_decode_image_rejects_compressed_and_truncated():
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n...")
    with pytest.raises(ValueError):
        decode_image(b"P6\n4 4\n255\n\x00\x00")  # truncated raster


def test_decode_stage_end_to_end_through_spark(spark):
    """The REAL decode leg: actual PPM/BMP fixtures flow through the
    Arrow mapInPandas stage; a corrupt payload lands in decode_error
    instead of failing the job."""
    from api_etl_pipeline_spark.llm_ops.multimodal import (
        DECODE_SCHEMA,
        decode_image_features,
    )

    ppm, ppm_px = _ppm_fixture()
    bmp, bmp_px = _bmp_fixture()
    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(bmp)), (3, bytearray(b"\xffJUNK"))],
        "doc_id bigint, content binary",
    ).repartition(3)
    out = {
        r.doc_id: r
        for r in df.mapInPandas(decode_image_features, DECODE_SCHEMA).collect()
    }
    assert (out[1].width, out[1].height) == (4, 2)
    assert (out[2].width, out[2].height) == (3, 2)
    mean_r = sum(p[0] for p in ppm_px) / len(ppm_px)
    assert abs(out[1].mean_r - mean_r) < 1e-12
    assert out[1].decode_error is None and out[2].decode_error is None
    assert out[3].decode_error and out[3].n_pixels == 0


def test_media_table_schema(spark):
    m = media_table(spark, SF_SMOKE)
    assert dict(m.dtypes)["content"] == "binary"
    assert dict(m.dtypes)["meta"].startswith("struct<sha256:string,declared_bytes:bigint")
    kinds = {r.media_type for r in m.select("media_type").distinct().collect()}
    assert kinds == {"image/png", "audio/wav", "video/mp4"}


def test_features_match_python_recompute(spark):
    feats = mm01_multimodal_features(spark, SF_SMOKE)
    rows = {r.doc_id: r for r in feats.collect()}
    assert len(rows) == 500
    # every row: size from the UDF equals the metadata-declared size
    assert all(r.size_matches for r in rows.values())

    # pin a few docs against a pure-python recompute of the same features
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(F.col("doc_id") < 5)
        .collect()
    }
    for doc_id, text in docs.items():
        b = text.encode()
        r = rows[doc_id]
        assert r.n_bytes == len(b)
        assert abs(r.byte_mean - sum(b) / len(b)) < 1e-12
        assert r.byte_mode == max(set(b), key=lambda x: (b.count(x), -x))
        assert r.header_hex == b[:4].hex()


def test_feature_stage_partition_invariant(spark):
    """Arrow batching must not change results: 1 partition vs many."""
    media = media_table(spark, SF_SMOKE)
    from api_etl_pipeline_spark.llm_ops.multimodal import FEATURE_SCHEMA, fake_decode_features

    base = media.select("doc_id", "media_type", "content")
    one = base.coalesce(1).mapInPandas(fake_decode_features, FEATURE_SCHEMA)
    many = base.repartition(16).mapInPandas(fake_decode_features, FEATURE_SCHEMA)
    assert sorted(map(tuple, one.collect())) == sorted(map(tuple, many.collect()))


def test_frame_sampling_matches_python_slicing(spark):
    from api_etl_pipeline_spark.llm_ops.multimodal import mm02_frame_sampling

    frames = mm02_frame_sampling(spark, SF_SMOKE)
    got = {(r.doc_id, r.frame_no): (r.frame_offset, r.frame_bytes, r.frame_sha256)
           for r in frames.collect()}
    assert got, "no frames sampled"

    import hashlib

    docs = {
        r.doc_id: r.text.encode()
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
        if r.doc_id % 3 == 2  # the video/mp4 rows per media_table
    }
    want = {}
    for doc_id, b in docs.items():
        if len(b) < 32:
            continue
        n = len(b) // 32
        for fno in range(0, max(n - 1, 0) + 1):
            if fno % 4 == 0:
                frame = b[fno * 32:(fno + 1) * 32]
                want[(doc_id, fno)] = (fno * 32, len(frame), hashlib.sha256(frame).hexdigest())
    assert got == want


def test_mm03_resize_shapes_and_determinism(spark):
    from api_etl_pipeline_spark.registry import all_queries
    from tests.conftest import SF_SMOKE

    from api_etl_pipeline_spark.llm_ops.multimodal import image_resize_full

    rows = image_resize_full(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.dst_w == 16 and r.dst_h == 16
        assert len(r.resized) == 16 * 16
    # registered (oracle-checkable) projection: same hashes, no binary
    q = all_queries()["mm03_image_resize"]
    reg = {r.doc_id: r.resized_sha256 for r in q.fn(spark, SF_SMOKE).collect()}
    assert {r.doc_id: r.resized_sha256 for r in rows} == reg
    assert "resized" not in q.fn(spark, SF_SMOKE).columns


def test_mm03_nearest_neighbor_gather_is_exact(spark):
    """One hand-computed example: resizing a 4x4 ramp to 2x2 picks pixels
    (0,0),(0,2),(2,0),(2,2) under the floor nearest-neighbor map."""
    import numpy as np

    from api_etl_pipeline_spark.llm_ops.multimodal import _make_fake_resizer
    import pandas as pd

    img = np.arange(16, dtype=np.uint8)  # 4x4 ramp row-major
    pdf = pd.DataFrame(
        {"doc_id": [1], "content": [img.tobytes()], "src_w": [4], "src_h": [4]}
    )
    out = next(_make_fake_resizer(2, 2)(iter([pdf])))
    got = np.frombuffer(out["resized"][0], dtype=np.uint8).reshape(2, 2)
    assert got.tolist() == [[0, 2], [8, 10]]


def test_mm04_audio_energy_exact_on_known_signal(spark):
    """A hand-built two-frame int16 signal: frame0 all zeros, frame1 all
    ±4 — peak must be frame 1 with energy 256*16, mean exactly half."""
    import numpy as np

    from api_etl_pipeline_spark.llm_ops.multimodal import _make_audio_profiler
    import pandas as pd

    sig = np.concatenate(
        [np.zeros(256, dtype="<i2"), np.full(256, 4, dtype="<i2")]
    )
    pdf = pd.DataFrame({"doc_id": [7], "content": [sig.tobytes()]})
    out = next(_make_audio_profiler()(iter([pdf])))
    r = out.iloc[0]
    assert r.n_samples == 512 and r.n_frames == 2
    assert r.peak_frame == 1 and r.peak_energy == 256 * 16
    assert r.mean_energy == (256 * 16) / 2


def test_mm04_runs_on_corpus_and_is_deterministic(spark):
    from api_etl_pipeline_spark.registry import all_queries
    from tests.conftest import SF_SMOKE

    q = all_queries()["mm04_audio_frame_energy"]
    a = {r.doc_id: (r.peak_frame, r.peak_energy) for r in q.fn(spark, SF_SMOKE).collect()}
    assert a
    b = {r.doc_id: (r.peak_frame, r.peak_energy) for r in q.fn(spark, SF_SMOKE).collect()}
    assert a == b
