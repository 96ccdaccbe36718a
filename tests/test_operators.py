"""Unit tests for pipeline operators not fully covered by the oracle gate:
multimodal plumbing, simhash pair blocking, embedding near-dup, planted
duplicates through minhash/ngram dedup."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from valentine_spark.operators import (
    cosine_topk,
    embedding_neardup_pairs,
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_pairs,
)
from valentine_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synth_media_table,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("today", "tonight")),  # near dup
        (3, "completely different content about spark query engines and shuffles"),
        (4, "completely different content about spark query engines and shuffles"),
        (5, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    out = {r["doc_id"]: r.asDict() for r in exact_duplicates(docs).collect()}
    assert out[0]["group_size"] == 2 and out[1]["is_dup"] and not out[0]["is_dup"]
    assert out[3]["group_size"] == 2 and out[4]["is_dup"]
    assert out[5]["group_size"] == 1 and not out[5]["is_dup"]


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] >= 0.5
    assert (0, 3) not in pairs


def test_minhash_lsh_candidates(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, k=8, bands=4).collect()}
    assert (0, 1) in pairs and (3, 4) in pairs
    assert (0, 3) not in pairs and (0, 5) not in pairs


def test_simhash_identical_and_near(docs):
    fp = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    assert fp[0] == fp[1]
    assert 0 <= fp[0] < (1 << 16)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=4).collect()}
    assert pairs.get((0, 1)) == 0


def test_cosine_topk_self_similarity(spark):
    vecs = [(i, [float(i == j) for j in range(8)]) for i in range(6)]
    vecs.append((6, [1.0, 0.01, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]))  # near vec 0
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    top = cosine_topk(df, k=1, n_queries=1).collect()
    assert top[0]["vec_id"] == 6 and top[0]["score"] > 0.99


def test_embedding_neardup(spark):
    vecs = [
        (0, [1.0, 2.0, 3.0, 4.0]),
        (1, [1.0, 2.0, 3.0, 4.001]),  # near dup
        (2, [-1.0, 5.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"]) for r in embedding_neardup_pairs(df, threshold=0.99, bits=2).collect()}
    assert (0, 1) in pairs and (0, 2) not in pairs


def test_multimodal_feature_plumbing(spark):
    media = synth_media_table(spark, 64)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 64
    assert all(len(r["feature"]) == 8 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["feature"])
    # deterministic across runs
    again = extract_features(synth_media_table(spark, 64)).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_bmp_roundtrip():
    """Pure-Python BMP codec: encode->decode identity, incl. odd widths
    (4-byte row padding) and the top-down (negative height) variant."""
    import struct

    import numpy as np

    from valentine_spark.functions.bmp import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    for h, w in [(1, 1), (3, 5), (7, 2), (16, 16)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), (h, w)
    # top-down: flip the height sign in the DIB header and the row order
    img = rng.integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(img[::-1]))
    struct.pack_into("<i", data, 14 + 8, -4)
    assert np.array_equal(decode_bmp(bytes(data)), img)


def test_image_features_real_decode(spark):
    """End-to-end REAL image path: a BMP payload flows through the Arrow
    mapInPandas stage, is decoded by the bundled codec, and yields channel
    statistics matching a direct numpy computation."""
    import numpy as np

    from valentine_spark.functions.bmp import encode_bmp
    from valentine_spark.operators.multimodal import extract_features, image_features

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    payload = encode_bmp(img)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), 9, 6, 0),
         (2, "audio", bytearray(b"not-a-bmp"), 0, 0, 1000)],
        "media_id long, kind string, payload binary, width int, height int, duration_ms int",
    )
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    got = np.array(rows[1]["feature"], dtype=np.float32)
    assert np.allclose(got, image_features(img), atol=1e-6)
    assert rows[1]["n_bytes"] == len(payload)
    # non-BMP media still flows through the documented stub path
    assert len(rows[2]["feature"]) == 8


def _raw_png(w, h, color_type, samples, extra_chunks=(), depth=8, interlace=0):
    """Hand-built PNG bytes (independent of encode_png): filter-0 rows of
    raw ``samples`` (H, W, ch) — lets tests cover color types / error
    variants the fixture encoder doesn't emit."""
    import struct
    import zlib

    import numpy as np

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + samples[y].tobytes() for y in range(h))
    out = b"\x89PNG\r\n\x1a\n" + chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    )
    for ct, body in extra_chunks:
        out += chunk(ct, body)
    # split IDAT in two to exercise multi-chunk concatenation
    z = zlib.compress(raw)
    return out + chunk(b"IDAT", z[:7]) + chunk(b"IDAT", z[7:]) + chunk(b"IEND", b"")


def test_png_roundtrip_all_filters():
    """encode (vectorized filter) -> decode (sequential unfilter) identity
    for every scanline filter type 0-4 — two independent formulations of
    the spec, so agreement is evidence of correctness, not shared bugs."""
    import numpy as np

    from valentine_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(5)
    for ftype in range(5):
        for h, w in [(1, 1), (3, 5), (7, 2), (16, 16), (5, 1)]:
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            assert np.array_equal(decode_png(encode_png(img, filter_type=ftype)), img), (
                ftype,
                h,
                w,
            )


def test_png_color_types():
    """Gray/palette/alpha normalization to RGB, on hand-built PNGs."""
    import numpy as np

    from valentine_spark.functions.png import decode_png

    rng = np.random.default_rng(6)
    # type 0 gray -> channels replicated
    g = rng.integers(0, 256, size=(3, 4, 1), dtype=np.uint8)
    assert np.array_equal(decode_png(_raw_png(4, 3, 0, g)), np.repeat(g, 3, axis=2))
    # type 6 RGBA -> alpha dropped
    rgba = rng.integers(0, 256, size=(2, 5, 4), dtype=np.uint8)
    assert np.array_equal(decode_png(_raw_png(5, 2, 6, rgba)), rgba[:, :, :3])
    # type 4 gray+alpha -> gray replicated, alpha dropped
    ga = rng.integers(0, 256, size=(4, 2, 2), dtype=np.uint8)
    assert np.array_equal(decode_png(_raw_png(2, 4, 4, ga)), np.repeat(ga[:, :, :1], 3, axis=2))
    # type 3 palette -> PLTE lookup
    plte = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(3, 3, 1), dtype=np.uint8)
    got = decode_png(_raw_png(3, 3, 3, idx, extra_chunks=[(b"PLTE", plte.tobytes())]))
    assert np.array_equal(got, plte[idx[:, :, 0]])


def test_png_rejects_unsupported_variants():
    import numpy as np
    import pytest

    from valentine_spark.functions.png import decode_png, encode_png

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError):
        decode_png(good[:20])  # truncated
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        decode_png(_raw_png(2, 2, 2, img, depth=16))  # 16-bit
    with pytest.raises(ValueError):
        decode_png(_raw_png(2, 2, 2, img, interlace=1))  # Adam7
    with pytest.raises(ValueError):  # palette without PLTE
        decode_png(_raw_png(2, 2, 3, np.zeros((2, 2, 1), dtype=np.uint8)))


def test_image_features_real_png_decode(spark):
    """End-to-end REAL PNG path through the Arrow mapInPandas stage —
    Paeth-filtered payload decoded by the bundled codec, features match a
    direct numpy computation (the BMP twin: test_image_features_real_decode)."""
    import numpy as np

    from valentine_spark.functions.png import encode_png
    from valentine_spark.operators.multimodal import extract_features, image_features

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(8, 5, 3), dtype=np.uint8)
    payload = encode_png(img, filter_type=4)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), 5, 8, 0)],
        "media_id long, kind string, payload binary, width int, height int, duration_ms int",
    )
    rows = extract_features(media).collect()
    got = np.array(rows[0]["feature"], dtype=np.float32)
    assert np.allclose(got, image_features(img), atol=1e-6)


def test_frame_sample_plan(spark):
    media = synth_media_table(spark, 64)
    plan = frame_sample_plan(media, every_ms=5000)
    videos = media.where(F.col("kind") == "video").count()
    assert plan.count() >= videos  # at least frame 0 per video
    assert plan.select("media_id").distinct().count() == videos


def test_asof_join_semantics(spark):
    from valentine_spark.operators import asof_join

    left = spark.createDataFrame(
        [(1, 100, "p1"), (1, 205, "p2"), (2, 50, "p3"), (3, 10, "p4")],
        "k long, t long, name string",
    )
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 100, "b"), (1, 200, "c"), (2, 60, "d")],
        "k long, t long, tag string",
    )
    out = {
        r["name"]: (r["t_matched"], r["tag_matched"])
        for r in asof_join(left, right, on=["k"], left_on="t").collect()
    }
    assert out["p1"] == (100, "b")  # equal timestamp counts (inclusive)
    assert out["p2"] == (200, "c")  # latest at-or-before
    assert out["p3"] == (None, None)  # right row is AFTER the left row
    assert out["p4"] == (None, None)  # key has no right rows at all


def test_asof_join_duplicate_ts_deterministic(spark):
    from valentine_spark.operators import asof_join

    left = spark.createDataFrame([(1, 100)], "k long, t long")
    right = spark.createDataFrame(
        [(1, 90, "x"), (1, 90, "z"), (1, 90, "y")], "k long, t long, tag string"
    )
    rows = asof_join(left, right, on=["k"], left_on="t").collect()
    assert rows[0]["tag_matched"] == "z"  # max payload struct wins the tie


def test_asof_join_tolerance(spark):
    from valentine_spark.operators import asof_join

    left = spark.createDataFrame([(1, 100), (1, 500)], "k long, t long")
    right = spark.createDataFrame([(1, 90, "a")], "k long, t long, tag string")
    out = {
        r["t"]: r["tag_matched"]
        for r in asof_join(
            left, right, on=["k"], left_on="t", tolerance_seconds=50
        ).collect()
    }
    assert out[100] == "a"  # within 50s lookback
    assert out[500] is None  # match exists but is too old


def _blob_vectors(spark):
    import random

    rng = random.Random(7)
    centers = [[10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0], [0.0, 0.0, 10.0, 0.0]]
    rows = []
    for i in range(90):
        c = centers[i % 3]
        rows.append((i, [x + rng.uniform(-0.5, 0.5) for x in c]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), centers


def test_kmeans_recovers_blobs(spark):
    from valentine_spark.operators import kmeans_assign, kmeans_fit

    df, centers = _blob_vectors(spark)
    centroids, iters = kmeans_fit(df, k=3, max_iter=10)
    assert iters <= 10
    # each true center has a learned centroid within noise distance
    for c in centers:
        best = min(sum((a - b) ** 2 for a, b in zip(c, cc)) for cc in centroids)
        assert best < 1.0, (c, centroids)
    # assignment is pure: all members of a blob land in one cluster
    assigned = kmeans_assign(df, centroids).collect()
    by_blob = {}
    for r in assigned:
        by_blob.setdefault(r["vec_id"] % 3, set()).add(r["cluster"])
    assert all(len(s) == 1 for s in by_blob.values())


def test_kmeans_partitioning_invariant(spark):
    from valentine_spark.operators import kmeans_fit

    df, _ = _blob_vectors(spark)
    c1, _ = kmeans_fit(df, k=3, max_iter=5)
    c2, _ = kmeans_fit(df.repartition(7), k=3, max_iter=5)
    flat1 = [round(x, 6) for c in c1 for x in c]
    flat2 = [round(x, 6) for c in c2 for x in c]
    assert flat1 == flat2  # seeded init + rounded means: layout-independent


def test_ivf_kmeans_topk(spark):
    from valentine_spark.operators import ivf_kmeans_topk

    df, _ = _blob_vectors(spark)
    out = ivf_kmeans_topk(df, k=2, n_cells=3, max_iter=5).collect()
    assert out and all(r["rank"] <= 2 for r in out)
    # nearest neighbor of each query is from the same blob (cosine-separable)
    for r in out:
        if r["rank"] == 1:
            assert r["vec_id"] % 3 == r["query_id"] % 3


def test_ivf_multiprobe_full_probe_equals_exact(spark):
    """nprobe = n_cells degenerates to exact search: probing EVERY cell must
    reproduce the brute-force cosine top-k exactly (the recall dial's
    endpoint), and nprobe=1 must match the default single-probe path."""
    import numpy as np

    from valentine_spark.operators import cosine_topk, ivf_kmeans_topk

    rng = np.random.default_rng(5)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {(r["query_id"], r["rank"]): r["vec_id"]
             for r in cosine_topk(df, k=3, n_queries=5).collect()}
    full = {(r["query_id"], r["rank"]): r["vec_id"]
            for r in ivf_kmeans_topk(df, k=3, n_cells=4, nprobe=4, tol=0.0).collect()}
    assert full == exact and exact
    single_a = {(r["query_id"], r["rank"]): r["vec_id"]
                for r in ivf_kmeans_topk(df, k=3, n_cells=4, tol=0.0).collect()}
    single_b = {(r["query_id"], r["rank"]): r["vec_id"]
                for r in ivf_kmeans_topk(df, k=3, n_cells=4, nprobe=1, tol=0.0).collect()}
    assert single_a == single_b


def test_interval_join_semantics(spark):
    from valentine_spark.operators import interval_join

    pts = spark.createDataFrame([(1, 5.0), (2, 10.0), (3, 99.0)], "pid long, v double")
    ivs = spark.createDataFrame(
        [(100, 0.0, 7.0), (200, 4.0, 12.0), (300, 50.0, 60.0)], "iid long, lo double, hi double"
    )
    rows = interval_join(pts, ivs, "v", bucket_width=5.0).collect()
    got = sorted((r["pid"], r["iid"]) for r in rows)
    assert got == [(1, 100), (1, 200), (2, 200)]  # overlapping bands, bounds inclusive
    # left join keeps unmatched points exactly once
    left = interval_join(pts, ivs, "v", bucket_width=5.0, how="left").collect()
    unmatched = [r for r in left if r["iid"] is None]
    assert [r["pid"] for r in unmatched] == [3]
    # no duplicate pairs even when an interval spans many buckets
    wide = spark.createDataFrame([(900, 0.0, 1000.0)], "iid long, lo double, hi double")
    dup = interval_join(pts, wide, "v", bucket_width=5.0).collect()
    assert sorted(r["pid"] for r in dup) == [1, 2, 3]


def test_interval_join_no_nested_loop(spark):
    """The banded form must plan as a hash join, not BroadcastNestedLoop."""
    from valentine_spark.operators import interval_join
    from valentine_spark.plans import explain_str

    pts = spark.range(100).select(F.col("id").alias("pid"), (F.col("id") * 1.0).alias("v"))
    ivs = spark.range(10).select(
        F.col("id").alias("iid"), (F.col("id") * 10.0).alias("lo"), (F.col("id") * 10.0 + 15.0).alias("hi")
    )
    text = explain_str(interval_join(pts, ivs, "v", bucket_width=10.0))
    assert "BroadcastNestedLoop" not in text, text


def test_asof_join_randomized_vs_pandas(spark):
    """Seeded randomized property check: asof_join == pandas merge_asof
    (backward, inclusive) over many keys/timestamps incl. collisions."""
    import random

    import pandas as pd

    rng = random.Random(123)
    left_rows = [
        (i, rng.randint(0, 12), float(rng.randint(0, 50))) for i in range(300)
    ]
    right_rows = [
        (1000 + i, rng.randint(0, 12), float(rng.randint(0, 50))) for i in range(200)
    ]
    # dedupe right per (key, ts) like real callers (deterministic oracle)
    rd = {}
    for rid, k, t in right_rows:
        rd[(k, t)] = max(rd.get((k, t), -1), rid)
    right_rows = [(rid, k, t) for (k, t), rid in rd.items()]

    left = spark.createDataFrame(left_rows, "lid long, k long, t double")
    right = spark.createDataFrame(right_rows, "rid long, k long, t double")
    got = {
        r["lid"]: (r["t_m"], r["rid_m"])
        for r in __import__("valentine_spark.operators", fromlist=["asof_join"])
        .asof_join(left, right, on=["k"], left_on="t", suffix="_m")
        .collect()
    }

    lp = pd.DataFrame(left_rows, columns=["lid", "k", "t"]).sort_values("t", kind="stable")
    rp = pd.DataFrame(right_rows, columns=["rid", "k", "t"]).sort_values("t", kind="stable")
    exp = pd.merge_asof(lp, rp, on="t", by="k", direction="backward", suffixes=("", "_m"))
    for _, row in exp.iterrows():
        want = (
            None if pd.isna(row.get("rid")) else row["t"],
            None if pd.isna(row.get("rid")) else int(row["rid"]),
        )
        # pandas keeps the matched right ts only implicitly (same as t when
        # exact); recompute matched ts from the rid row
        if want[1] is not None:
            want = (dict((r[0], r[2]) for r in right_rows)[want[1]], want[1])
        assert got[int(row["lid"])] == want, (row["lid"], got[int(row["lid"])], want)


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
def test_asof_join_directions_vs_pandas(spark, direction):
    """Seeded randomized property check for ALL merge_asof directions,
    with and without tolerance, incl. ts collisions and unmatched keys."""
    import random

    import pandas as pd

    from valentine_spark.operators import asof_join

    rng = random.Random(777)
    left_rows = [(i, rng.randint(0, 9), float(rng.randint(0, 40))) for i in range(250)]
    right_rows = [(1000 + i, rng.randint(0, 9), float(rng.randint(0, 40))) for i in range(150)]
    rd = {}
    for rid, k, t in right_rows:
        rd[(k, t)] = max(rd.get((k, t), -1), rid)
    right_rows = [(rid, k, t) for (k, t), rid in rd.items()]
    # NOTE on duplicate-(key, ts) conventions: backward resolves to the MAX
    # payload struct, forward to the MIN — right_rows are deduped per
    # (k, t) above so both agree with pandas' single-row choice.
    right_ts = {r[0]: r[2] for r in right_rows}

    left = spark.createDataFrame(left_rows, "lid long, k long, t double")
    right = spark.createDataFrame(right_rows, "rid long, k long, t double")
    lp = pd.DataFrame(left_rows, columns=["lid", "k", "t"]).sort_values("t", kind="stable")
    rp = pd.DataFrame(right_rows, columns=["rid", "k", "t"]).sort_values("t", kind="stable")

    for tol in (None, 5.0):
        got = {
            r["lid"]: (r["t_m"], r["rid_m"])
            for r in asof_join(left, right, on=["k"], left_on="t", suffix="_m",
                               direction=direction, tolerance_seconds=tol).collect()
        }
        exp = pd.merge_asof(lp, rp, on="t", by="k", direction=direction,
                            suffixes=("", "_m"),
                            tolerance=None if tol is None else tol)
        assert len(got) == len(left_rows)
        for _, row in exp.iterrows():
            if pd.isna(row.get("rid")):
                want = (None, None)
            else:
                rid = int(row["rid"])
                want = (right_ts[rid], rid)
            assert got[int(row["lid"])] == want, (
                direction, tol, row["lid"], got[int(row["lid"])], want)


def test_asof_join_null_left_ts_never_matches_any_direction(spark):
    """A NULL left timestamp matches nothing in ANY direction (SQL
    comparison semantics) — the forward frame would otherwise see every
    right row because NULLs sort first."""
    from valentine_spark.operators import asof_join

    left = spark.createDataFrame([(1, 7, None), (2, 7, 100)], "lid long, k long, t long")
    right = spark.createDataFrame([(20, 7, 90)], "rid long, k long, t long")
    for direction in ("backward", "forward", "nearest"):
        out = {r["lid"]: r["rid_m"] for r in
               asof_join(left, right, on=["k"], left_on="t", suffix="_m",
                         direction=direction).collect()}
        assert out[1] is None, direction
        assert out[2] == (20 if direction != "forward" else None), direction


def test_asof_join_null_keys_never_match(spark):
    """SQL equality semantics: NULL join keys match nothing on either side."""
    from valentine_spark.operators import asof_join

    left = spark.createDataFrame([(1, None, 100), (2, 7, 100)], "lid long, k long, t long")
    right = spark.createDataFrame([(10, None, 90), (20, 7, 90)], "rid long, k long, t long")
    out = {r["lid"]: r["rid_m"] for r in
           asof_join(left, right, on=["k"], left_on="t", suffix="_m").collect()}
    assert out == {1: None, 2: 20}


def test_ngram_prefix_filter_equals_exhaustive(spark):
    """The prefix-filtered set-similarity join must return EXACTLY the same
    pairs/scores as the exhaustive formulation (lossless filtering)."""
    import random

    from valentine_spark.operators import ngram_jaccard_pairs, ngram_jaccard_pairs_prefix

    rng = random.Random(99)
    base = "the quick brown fox jumps over the lazy dog while rain falls on tin roofs"
    docs = []
    for i in range(60):
        if i % 3 == 0:
            # near-dup of base with small edits
            s = list(base)
            for _ in range(rng.randrange(0, 4)):
                s[rng.randrange(len(s))] = rng.choice("abcdefgh ")
            docs.append((i, "".join(s)))
        else:
            docs.append((i, "".join(rng.choice("abcdefghijklmnop ") for _ in range(rng.randrange(30, 90)))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for t in (0.5, 0.8):
        exact = {(r["id_a"], r["id_b"]): r["jaccard"]
                 for r in ngram_jaccard_pairs(df, n=5, threshold=t).collect()}
        fast = {(r["id_a"], r["id_b"]): r["jaccard"]
                for r in ngram_jaccard_pairs_prefix(df, n=5, threshold=t).collect()}
        assert fast == exact and exact  # identical, and non-trivial


def test_simhash_pairs_equals_brute_force(spark):
    """Pigeonhole guarantee: the multi-band simhash join must return EXACTLY
    the brute-force Hamming-distance pairs — all of them, at every
    max_hamming (the old 1-band block missed pairs whose differing bits fell
    in the blocked half)."""
    import random

    from pyspark.sql import functions as F

    from valentine_spark.operators import simhash_fingerprints, simhash_pairs

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron"]
    docs = []
    for i in range(50):
        if i % 4 == 1:
            base = docs[i - 1][1].split()
            j = rng.randrange(len(base))
            base[j] = rng.choice(vocab)  # near-dup: one token swapped
            docs.append((i, " ".join(base)))
        else:
            docs.append((i, " ".join(rng.choice(vocab) for _ in range(12))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fp = simhash_fingerprints(df, bits=16)
    a = fp.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = fp.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b"))
    brute = (
        a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
    )
    for k in (0, 1, 3, 5):
        expect = {(r["id_a"], r["id_b"], r["hamming"])
                  for r in brute.where(F.col("hamming") <= k).collect()}
        got = {(r["id_a"], r["id_b"], r["hamming"])
               for r in simhash_pairs(df, bits=16, max_hamming=k).collect()}
        assert got == expect, f"max_hamming={k}: {len(got)} vs {len(expect)}"
    assert expect  # non-trivial at k=5


def test_connected_components_chains_and_cliques(spark):
    from valentine_spark.operators import connected_components

    edges = spark.createDataFrame(
        # chain 1-2-3-4, clique 10-11-12, isolated edge 20-21
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    comp = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_long_chain_converges(spark):
    """A path graph far longer than max_iter: pointer jumping must collapse
    it in O(log diameter) rounds (plain min-label propagation would need
    diameter rounds and previously exited silently with WRONG labels)."""
    from valentine_spark.operators import connected_components

    n = 200
    edges = spark.createDataFrame([(i, i + 1) for i in range(n)], "id_a long, id_b long")
    comp = {r["node"]: r["component"] for r in connected_components(edges, max_iter=20).collect()}
    assert comp == {i: 0 for i in range(n + 1)}


def test_asof_join_null_right_ts_never_matches(spark):
    """SQL `r.ts <= l.ts` never matches a NULL right timestamp — the window
    formulation must not carry a null-ts payload onto left rows."""
    from valentine_spark.operators import asof_join

    left = spark.createDataFrame([(1, 7, 100)], "lid long, k long, t long")
    right = spark.createDataFrame([(10, 7, None), (20, 7, 90)], "rid long, k long, t long")
    rows = asof_join(left, right, on=["k"], left_on="t", suffix="_m").collect()
    assert len(rows) == 1 and rows[0]["rid_m"] == 20 and rows[0]["t_m"] == 90
    # with ONLY a null-ts right row, the left row must stay unmatched
    right2 = spark.createDataFrame([(10, 7, None)], "rid long, k long, t long")
    rows2 = asof_join(left, right2, on=["k"], left_on="t", suffix="_m").collect()
    assert len(rows2) == 1 and rows2[0]["rid_m"] is None and rows2[0]["t_m"] is None


def test_asof_join_keyless(spark):
    """on=[] is a global (keyless) as-of join, like pandas merge_asof
    without `by` — previously raised a confusing TypeError."""
    from valentine_spark.operators import asof_join

    left = spark.createDataFrame([(1, 100), (2, 50)], "lid long, t long")
    right = spark.createDataFrame([(10, 90), (20, 40)], "rid long, t long")
    out = {r["lid"]: r["rid_m"] for r in
           asof_join(left, right, on=[], left_on="t", suffix="_m").collect()}
    assert out == {1: 10, 2: 20}


def test_duplicate_groups_with_singletons(spark):
    from valentine_spark.operators import duplicate_groups

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    got = {r["doc_id"]: r["canonical_id"] for r in duplicate_groups(docs, pairs).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 0, 4: 4, 5: 0}


def test_exact_duplicates_normalized(spark):
    """Case/punctuation/whitespace variants collapse to one group; raw
    exact dedup does not see them."""
    from valentine_spark.operators import exact_duplicates, exact_duplicates_normalized

    df = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello   world"), (3, "different")],
        "doc_id long, text string",
    )
    norm = {r["doc_id"]: (r["group_size"], r["is_dup"])
            for r in exact_duplicates_normalized(df).collect()}
    assert norm == {1: (2, False), 2: (2, True), 3: (1, False)}
    raw = {r["doc_id"]: r["is_dup"] for r in exact_duplicates(df).collect()}
    assert raw == {1: False, 2: False, 3: False}


def _wav_via_stdlib(samples_f32, rate, sampwidth):
    """Cross-check writer: encode float samples (n, ch) through CPython's
    wave module (an independent RIFF implementation) at the given PCM
    width."""
    import io
    import wave

    import numpy as np

    n, ch = samples_f32.shape
    if sampwidth == 1:
        raw = ((np.clip(samples_f32, -1, 1) * 127) + 128).astype(np.uint8).tobytes()
    elif sampwidth == 2:
        raw = (np.clip(samples_f32, -1, 1) * 32767).astype("<i2").tobytes()
    elif sampwidth == 3:
        i32 = (np.clip(samples_f32, -1, 1) * 8388607).astype("<i4")
        raw = i32.astype("<i4").tobytes()
        raw = b"".join(raw[i:i + 3] for i in range(0, len(raw), 4))
    else:
        raise AssertionError(sampwidth)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(raw)
    return buf.getvalue()


def test_wav_decode_pcm_widths_vs_stdlib_writer():
    """decode_wav vs the stdlib wave writer: 8/16/24-bit, mono and stereo,
    values equal to the quantized originals within one quantization step."""
    import numpy as np

    from valentine_spark.functions.wav import decode_wav

    rng = np.random.default_rng(5)
    # tolerances: one quantization step + the writer/decoder scale asymmetry
    # (8-bit encodes at scale 127 but decodes at the spec's 128)
    for ch in (1, 2):
        sig = rng.uniform(-0.9, 0.9, size=(480, ch)).astype(np.float32)
        for width, tol in ((1, 2 / 127), (2, 1e-4), (3, 5e-7)):
            got, rate = decode_wav(_wav_via_stdlib(sig, 8_000, width))
            assert rate == 8_000 and got.shape == (480, ch), (ch, width)
            assert np.abs(got - sig).max() <= tol, (ch, width)


def test_wav_decode_float_and_extensible():
    """Hand-built float32 WAV round-trips exactly; a WAVE_FORMAT_EXTENSIBLE
    header (tag 0xFFFE + GUID) resolves to the wrapped PCM tag; extra RIFF
    chunks (LIST) are skipped including the odd-length alignment pad."""
    import struct

    import numpy as np

    from valentine_spark.functions.wav import WavError, decode_wav

    sig = np.linspace(-1, 1, 33, dtype=np.float32).reshape(-1, 1)

    def riff(chunks):
        body = b"WAVE" + b"".join(
            cid + struct.pack("<I", len(c)) + c + (b"\0" if len(c) & 1 else b"")
            for cid, c in chunks
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    fmt_f32 = struct.pack("<HHIIHH", 3, 1, 16_000, 64_000, 4, 32)
    wav = riff([(b"fmt ", fmt_f32), (b"LIST", b"INFOodd"),
                (b"data", sig.tobytes())])
    got, rate = decode_wav(wav)
    assert rate == 16_000
    assert np.array_equal(got, sig)

    guid = struct.pack("<H", 1) + b"\0" * 14  # sub-format = PCM
    # WAVEFORMATEXTENSIBLE: cbSize(22) + Samples(H) + ChannelMask(I) + GUID
    fmt_ext = struct.pack(
        "<HHIIHHHHI", 0xFFFE, 1, 8_000, 16_000, 2, 16, 22, 16, 0
    ) + guid
    pcm = (sig * 32767).astype("<i2").tobytes()
    got2, rate2 = decode_wav(riff([(b"fmt ", fmt_ext), (b"data", pcm)]))
    assert rate2 == 8_000 and got2.shape == sig.shape

    import pytest as _pytest

    with _pytest.raises(WavError):  # ADPCM (tag 2) is not supported
        decode_wav(riff([
            (b"fmt ", struct.pack("<HHIIHH", 2, 1, 8_000, 4_000, 1, 4)),
            (b"data", b"\0\0\0\0"),
        ]))
    with _pytest.raises(WavError):
        decode_wav(b"RIFFxxxxNOPE")


def test_wav_ima_adpcm_roundtrip():
    """IMA/DVI ADPCM (tag 0x11): encode -> decode tracks the original to
    4-bit-codec fidelity, mono and stereo, including a short padded final
    block trimmed back via the fact chunk."""
    import numpy as np

    from valentine_spark.functions.wav import (
        WavError,
        decode_wav,
        encode_wav_ima_adpcm,
    )

    t = np.arange(2000) / 8_000.0
    mono = (0.6 * np.sin(2 * np.pi * 440 * t)).astype(np.float32).reshape(-1, 1)
    got, rate = decode_wav(encode_wav_ima_adpcm(mono, 8_000))
    assert rate == 8_000 and got.shape[1] == 1
    # 2000 frames over 505-frame blocks: final 485-frame chunk keeps
    # 1 + floor(484/8)*8 = 481 -> fact = 3*505 + 481
    assert got.shape[0] == 3 * 505 + 481
    n = got.shape[0]
    err = np.abs(got[:, 0] - mono[:n, 0])
    assert err.mean() < 0.02 and err.max() < 0.2, (err.mean(), err.max())

    stereo = np.stack(
        [0.5 * np.sin(2 * np.pi * 300 * t), 0.4 * np.sin(2 * np.pi * 700 * t)],
        axis=1,
    ).astype(np.float32)
    got2, _ = decode_wav(encode_wav_ima_adpcm(stereo, 8_000))
    assert got2.shape[1] == 2
    for c in range(2):
        err = np.abs(got2[:, c] - stereo[: len(got2), c])
        assert err.mean() < 0.02, (c, err.mean())

    with _py_raises(WavError):
        encode_wav_ima_adpcm(mono, 8_000, block_frames=10)  # not 1 + 8k


def _py_raises(exc):
    import pytest as _pytest

    return _pytest.raises(exc)


def test_audio_features_real_decode(spark):
    """End-to-end REAL audio path: a WAV payload flows through the Arrow
    mapInPandas stage and yields signal statistics matching the direct
    computation; a sine wave's rms/zcr land on the analytic values."""
    import numpy as np

    from valentine_spark.functions.wav import audio_features, decode_wav
    from valentine_spark.operators.multimodal import extract_features

    rate, freq, amp, sec = 8_000, 440.0, 0.5, 0.5
    t = np.arange(int(rate * sec)) / rate
    sig = (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32).reshape(-1, 1)
    payload = _wav_via_stdlib(sig, rate, 2)

    media = spark.createDataFrame(
        [(1, "audio", bytearray(payload), 0, 0, 500),
         (2, "audio", bytearray(b"RIFFnotawave"), 0, 0, 10)],
        "media_id long, kind string, payload binary, width int, height int, duration_ms int",
    )
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    got = np.array(rows[1]["feature"], dtype=np.float32)
    want = audio_features(*decode_wav(payload))
    assert np.allclose(got, want, atol=1e-6)
    # analytic checks: rms = A/sqrt(2), zcr = 2 f / rate, peak ~= A
    assert abs(got[2] - amp / np.sqrt(2)) < 0.01
    assert abs(got[4] - 2 * freq / rate) < 0.005
    assert abs(got[3] - amp) < 0.01
    assert abs(got[0] - sec / 60.0) < 1e-3
    # malformed RIFF falls back to the stub, never kills the job
    assert len(rows[2]["feature"]) == 8


def _mini_avi(w=320, h=240, frames=90, us_per_frame=33333, codec=b"h264"):
    """Hand-built minimal AVI: RIFF('AVI ') > LIST(hdrl) > avih + LIST(strl)
    > strh — independent byte layout per the public RIFF/AVI spec."""
    import struct

    avih = struct.pack("<IIIII", us_per_frame, 0, 0, 0, frames)
    avih += struct.pack("<III", 0, 0, 0)  # initialFrames, streams, bufSize
    avih += struct.pack("<II", w, h) + b"\0" * 16

    strh = b"vids" + codec + b"\0" * 48

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (b"\0" if len(body) & 1 else b"")

    strl = chunk(b"strh", strh)
    hdrl = chunk(b"avih", avih) + chunk(b"LIST", b"strl" + strl)
    body = b"AVI " + chunk(b"LIST", b"hdrl" + hdrl)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _mini_mp4(w=1280, h=720, timescale=1000, duration=5000, n_frames=150,
              codec=b"avc1"):
    """Hand-built minimal MP4: ftyp + moov(mvhd + trak(tkhd + mdia(minf(
    stbl(stsd + stsz))))) per ISO/IEC 14496-12 box layout."""
    import struct

    def box(btype, body):
        return struct.pack(">I", len(body) + 8) + btype + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = box(b"mvhd", b"\0\0\0\0" + struct.pack(">III", 0, 0, timescale)
               + struct.pack(">I", duration) + b"\0" * 80)
    # spec layout (v0): 4 ver/flags + 20 times/id/rsv/dur + 8 reserved +
    # 8 layer/alt/volume/rsv + 36 matrix = width at body+76
    tkhd = box(b"tkhd", b"\0\0\0\0" + b"\0" * 72
               + struct.pack(">II", w << 16, h << 16))
    stsd = box(b"stsd", b"\0\0\0\0" + struct.pack(">I", 1)
               + box(codec, b"\0" * 16))
    stsz = box(b"stsz", b"\0\0\0\0" + struct.pack(">II", 0, n_frames))
    stbl = box(b"stbl", stsd + stsz)
    trak = box(b"trak", tkhd + box(b"mdia", box(b"minf", stbl)))
    return ftyp + box(b"moov", mvhd + trak)


def test_probe_video_avi_and_mp4():
    from valentine_spark.functions.video_meta import probe_video, try_probe_video

    avi = probe_video(_mini_avi())
    assert avi == {
        "container": "avi", "width": 320, "height": 240,
        "duration_ms": 2999, "n_frames": 90, "fps": 30.0, "codec": "h264",
    }
    mp4 = probe_video(_mini_mp4())
    assert mp4 == {
        "container": "mp4", "width": 1280, "height": 720,
        "duration_ms": 5000, "n_frames": 150, "fps": 30.0, "codec": "avc1",
    }
    # 64-bit mvhd (version 1): creation/modification are 8 bytes each,
    # duration is a u64
    import struct

    def box(btype, body):
        return struct.pack(">I", len(body) + 8) + btype + body

    mvhd_v1 = box(
        b"mvhd",
        b"\x01\0\0\0" + b"\0" * 16 + struct.pack(">IQ", 1000, 7000) + b"\0" * 80,
    )
    mp4_v1 = box(b"ftyp", b"isom") + box(b"moov", mvhd_v1)
    assert probe_video(mp4_v1)["duration_ms"] == 7000

    assert try_probe_video(b"garbage") is None
    assert try_probe_video(None) is None


def test_probe_metadata_mapinpandas(spark):
    """Arrow probe stage: AVI/MP4 metadata lands in columns; non-container
    payloads produce null metadata, never a failed job."""
    from valentine_spark.operators.multimodal import probe_metadata

    media = spark.createDataFrame(
        [
            (1, "video", bytearray(_mini_avi()), 0, 0, 0),
            (2, "video", bytearray(_mini_mp4()), 0, 0, 0),
            (3, "video", bytearray(b"\x00\x01junk"), 0, 0, 0),
        ],
        "media_id long, kind string, payload binary, width int, height int, duration_ms int",
    )
    rows = {r["media_id"]: r for r in probe_metadata(media).collect()}
    assert rows[1]["container"] == "avi" and rows[1]["fps"] == 30.0
    assert rows[2]["container"] == "mp4" and (rows[2]["width"], rows[2]["height"]) == (1280, 720)
    assert rows[3]["container"] is None and rows[3]["codec"] is None


def test_pq_encode_shape_and_determinism(spark):
    """Codes: one int per subspace, in [0, k); identical vectors get
    identical codes; two runs agree bit-for-bit (md5-seeded training)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    from valentine_spark.operators import pq_encode, pq_train

    books = pq_train(emb, dim=64, m=4, k=4, max_iter=2)
    assert len(books) == 4 and all(len(b) == 4 and len(b[0]) == 16 for b in books)
    codes = {r["vec_id"]: r["pq_codes"]
             for r in pq_encode(emb, books).select("vec_id", "pq_codes").collect()}
    assert all(len(c) == 4 and all(0 <= x < 4 for x in c) for c in codes.values())
    books2 = pq_train(emb, dim=64, m=4, k=4, max_iter=2)
    assert books == books2


def test_pq_adc_exact_on_codebook_vectors(spark):
    """When every vector IS a codebook centroid (k distinct subvector
    values per subspace), reconstruction is lossless and ADC equals the
    exact squared L2 distance."""
    import itertools

    import numpy as np

    from valentine_spark.operators import pq_topk

    # 8 vectors of dim 4, m=2 subspaces, each subvector one of 2 values
    blocks = {0: [0.0, 0.0], 1: [10.0, 10.0]}
    rows = []
    for i, (a, b) in enumerate(itertools.product([0, 1], repeat=2)):
        for dup in (0, 1):  # duplicates so every centroid has >= 2 members
            rows.append((i * 2 + dup, blocks[a] + blocks[b]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = pq_topk(df, k=7, m=2, k_sub=2, max_iter=3)
    vecs = dict(rows)
    for r in got.collect():
        q, v = np.array(vecs[r["query_id"]]), np.array(vecs[r["vec_id"]])
        assert abs(r["adc_dist"] - float(((q - v) ** 2).sum())) < 1e-6


def test_pq_topk_recall_on_separable_clusters(spark):
    """On well-separated clusters, ADC top-k stays within the query's
    cluster — the rank-preservation property PQ is used for."""
    import numpy as np

    rng = np.random.default_rng(17)
    centers = rng.uniform(-1, 1, size=(3, 32)) * 10
    rows = []
    for i in range(60):
        c = i % 3
        rows.append((i, (centers[c] + rng.normal(0, 0.05, 32)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from valentine_spark.operators import pq_topk

    got = pq_topk(df, queries=df.where(F.col("vec_id") < 3), k=5, m=4,
                  k_sub=3, max_iter=4)
    for r in got.collect():
        assert r["vec_id"] % 3 == r["query_id"] % 3, r


def test_ivfpq_full_probe_equals_pq(spark):
    """nprobe = n_cells degenerates IVF-PQ to plain PQ-ADC over the whole
    corpus — the recall dial's exactness anchor, bit-for-bit."""
    from valentine_spark.operators import ivfpq_topk, pq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    full = ivfpq_topk(emb, k=3, n_cells=4, nprobe=4, m=2, k_sub=4, max_iter=2,
                      cells_max_iter=2)
    plain = pq_topk(emb, k=3, m=2, k_sub=4, max_iter=2)
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b


def test_ivfpq_single_probe_subsets_full_probe(spark):
    """nprobe=1 results are drawn from the probed cell only: every returned
    candidate shares the query's nearest cell."""
    from valentine_spark.operators import ivfpq_topk
    from valentine_spark.operators.kmeans import kmeans_assign, kmeans_fit

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = ivfpq_topk(emb, k=3, n_cells=4, nprobe=1, m=2, k_sub=4, max_iter=2,
                     cells_max_iter=2)
    cells, _ = kmeans_fit(emb, k=4, max_iter=2)
    cell_of = {r["vec_id"]: r["cluster"]
               for r in kmeans_assign(emb, cells).select("vec_id", "cluster").collect()}
    for r in got.collect():
        assert cell_of[r["vec_id"]] == cell_of[r["query_id"]], r


# ---------------------------------------------------------------------------
# JPEG codec (functions/jpeg.py)
# ---------------------------------------------------------------------------

def test_jpeg_roundtrip_near_lossless_q100():
    """Quality 100 makes every quant step 1, so round-trip error is bounded
    by FDCT/IDCT float rounding + coefficient rounding alone — a few gray
    levels on arbitrary random content."""
    import numpy as np

    from valentine_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=100, subsampling="444"))
    assert out.shape == img.shape and out.dtype == np.uint8
    diff = np.abs(out.astype(int) - img.astype(int))
    # RGB->YCbCr->RGB is float-exact; quantization rounding costs <=0.5 per
    # coefficient, a few levels after the inverse transform
    assert diff.max() <= 6 and diff.mean() < 2.0, (diff.max(), diff.mean())


def test_jpeg_420_subsampling_and_odd_dims():
    """4:2:0: chroma is 2x2 box-averaged; on a chroma-flat (gray-content)
    image subsampling is exact, so quality-100 error stays at transform
    rounding even with non-MCU-aligned dimensions (21x13 vs 16-px MCUs)."""
    import numpy as np

    from valentine_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(8)
    gray = rng.integers(0, 256, size=(21, 13, 1), dtype=np.uint8)
    img = np.repeat(gray, 3, axis=2)  # R=G=B -> Cb=Cr=128 everywhere
    out = decode_jpeg(encode_jpeg(img, quality=100, subsampling="420"))
    assert out.shape == img.shape
    diff = np.abs(out.astype(int) - img.astype(int))
    assert diff.max() <= 6 and diff.mean() < 2.0, (diff.max(), diff.mean())


def test_jpeg_restart_intervals():
    """DRI/RSTn: an image spanning several MCUs encoded with restart
    markers every 2 MCUs decodes identically to the unrestarted encoding
    (resync + DC-predictor reset both exercised)."""
    import numpy as np

    from valentine_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)  # 15 MCUs
    plain = decode_jpeg(encode_jpeg(img, quality=85, subsampling="444"))
    restarted = decode_jpeg(
        encode_jpeg(img, quality=85, subsampling="444", restart_interval=2)
    )
    assert np.array_equal(plain, restarted)


def test_jpeg_quality_tradeoff_and_determinism():
    """Lower quality -> smaller payload, bounded degradation; encode is
    bit-deterministic."""
    import numpy as np

    from valentine_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(10)
    # smooth gradient content (JPEG's design regime, unlike white noise)
    x = np.linspace(0, 255, 32)
    img = np.clip(
        np.dstack([np.add.outer(x, x / 2), np.add.outer(x / 3, x), np.tile(x, (32, 1))]),
        0, 255,
    ).astype(np.uint8)
    hi = encode_jpeg(img, quality=95)
    lo = encode_jpeg(img, quality=30)
    assert len(lo) < len(hi)
    assert hi == encode_jpeg(img, quality=95)  # deterministic bytes
    err_hi = np.abs(decode_jpeg(hi).astype(int) - img.astype(int)).mean()
    err_lo = np.abs(decode_jpeg(lo).astype(int) - img.astype(int)).mean()
    assert err_hi <= err_lo and err_lo < 20.0, (err_hi, err_lo)


def test_jpeg_rejects_unsupported_variants():
    """Progressive/truncated/garbage payloads raise ValueError (the
    decode_media contract: fall through to the stub, never kill the job)."""
    import pytest as _pytest

    from valentine_spark.functions.jpeg import decode_jpeg, encode_jpeg
    import numpy as np

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    good = encode_jpeg(img)
    with _pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    with _pytest.raises(ValueError):
        decode_jpeg(good[: len(good) // 2])  # truncated entropy stream
    with _pytest.raises(ValueError):
        # flipping SOF0 to SOF2 leaves a baseline scan header (Se=63) on
        # what now claims to be a progressive DC scan — malformed, rejected
        decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with _pytest.raises(ValueError):
        # SOF1 (extended sequential) stays unsupported
        decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc1", 1))


def test_jpeg_progressive_equals_baseline_exactly():
    """Progressive (SOF2) round-trip: the successive-approximation chains
    (DC arithmetic-shift + bit refinement, AC magnitude truncation + ±1
    insertions and correction bits) reconstruct the quantized coefficients
    EXACTLY, so progressive decode must equal baseline decode bit-for-bit
    at every quality/subsampling — and the flat fixture drives multi-block
    EOB runs through the decoder."""
    import numpy as np

    from valentine_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(21, 29, 3), dtype=np.uint8)
    for subs in ("444", "420"):
        for q in (90, 50):
            base = decode_jpeg(encode_jpeg(img, quality=q, subsampling=subs))
            prog = decode_jpeg(encode_jpeg_progressive(img, quality=q, subsampling=subs))
            assert np.array_equal(base, prog), (subs, q)

    flat = np.full((64, 64, 3), 77, dtype=np.uint8)  # long EOB runs
    flat[40:44, 8:12] = 200
    assert np.array_equal(
        decode_jpeg(encode_jpeg(flat, quality=85)),
        decode_jpeg(encode_jpeg_progressive(flat, quality=85)),
    )
    # deeper successive-approximation chain: two DC + two AC refine scans
    assert np.array_equal(
        decode_jpeg(encode_jpeg(img, quality=80)),
        decode_jpeg(encode_jpeg_progressive(img, quality=80, dc_al=2, ac_al=2)),
    )


def test_jpeg_progressive_through_decode_media():
    """A progressive payload sniffs as JPEG and takes the real decode path
    in the multimodal stage (no stub fallback)."""
    import numpy as np

    from valentine_spark.functions.jpeg import decode_jpeg, encode_jpeg_progressive
    from valentine_spark.operators.multimodal import decode_media, image_features

    rng = np.random.default_rng(22)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    payload = encode_jpeg_progressive(img, quality=95)
    got = decode_media(payload, "image")
    expect = image_features(decode_jpeg(payload))
    assert np.array_equal(got, expect)
    assert abs(got[0] - 16 / 4096) < 1e-6  # real dimensions, not stub hash


def test_image_features_real_jpeg_decode(spark):
    """End-to-end REAL JPEG path through the Arrow mapInPandas stage — the
    PNG/BMP twin: the extracted features equal a direct numpy computation
    on the decoded (lossy) pixels."""
    import numpy as np

    from valentine_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from valentine_spark.operators.multimodal import extract_features, image_features

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(9, 6, 3), dtype=np.uint8)
    payload = encode_jpeg(img, quality=90, subsampling="420")
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), 6, 9, 0)],
        "media_id long, kind string, payload binary, width int, height int, duration_ms int",
    )
    rows = extract_features(media).collect()
    got = np.array(rows[0]["feature"], dtype=np.float32)
    assert np.allclose(got, image_features(decode_jpeg(payload)), atol=1e-6)


def test_pq_encode_arrow_matches_expression_encode(spark):
    """The Arrow-vectorized encode (production path, k_sub=256-class) must
    assign the same codes as the oracle-replayable expression encode, same
    tie-break (first minimal index), on a separable clustered fixture.
    Also covers kmeans_fit(init='hash'): one seeding job instead of k-1
    sequential scans."""
    from pyspark.sql import functions as F

    from valentine_spark.operators.pq import pq_encode, pq_encode_arrow, pq_train

    dim, n = 16, 800
    cl = F.pmod(F.col("id"), F.lit(8))
    u = lambda s, d: F.pmod(F.xxhash64(F.lit(d), s), 10_000) / 5_000.0 - 1.0
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[(u(cl, d) + 0.1 * u(F.col("id"), d + dim)).cast("float")
                  for d in range(dim)]).alias("embedding"),
    )
    books = pq_train(vecs, dim, m=4, k=8, max_iter=2, init="hash")
    expr = {r["vec_id"]: list(r["pq_codes"])
            for r in pq_encode(vecs, books).select("vec_id", "pq_codes").collect()}
    arrow = {r["vec_id"]: list(r["pq_codes"])
             for r in pq_encode_arrow(vecs, books).select("vec_id", "pq_codes").collect()}
    assert expr == arrow
    assert len({tuple(c) for c in expr.values()}) > 1  # codes actually vary


def test_repetition_stats_hand_computed(spark):
    from valentine_spark.operators import repetition_stats

    rows = [
        (1, "a a a b"),          # top word 'a' x3, run 3, bigram 'a a' x2/3
        (2, "x y x y x"),        # no adjacent repeats; bigram 'x y' 2/4
        (3, "unique words only here"),
        (4, "solo"),             # single word: bigram frac defined as 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}

    assert got[1] == {
        "doc_id": 1, "n_words": 4, "dup_word_frac": 0.5,
        "top_word_frac": 0.75, "top_bigram_frac": round(2 / 3, 6),
        "max_word_run": 3,
    }
    assert got[2]["top_word_frac"] == 0.6          # 'x' 3/5
    assert got[2]["top_bigram_frac"] == 0.5        # 'x y' 2/4
    assert got[2]["max_word_run"] == 1             # alternating
    assert got[2]["dup_word_frac"] == 0.6          # 5 words, 2 distinct
    assert got[3]["dup_word_frac"] == 0.0
    assert got[3]["max_word_run"] == 1
    assert got[4] == {
        "doc_id": 4, "n_words": 1, "dup_word_frac": 0.0,
        "top_word_frac": 1.0, "top_bigram_frac": 0.0, "max_word_run": 1,
    }


def test_repetition_stats_plan_is_shuffle_free(spark):
    from valentine_spark.operators import repetition_stats

    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_curation_funnel_stages_and_dedup(spark):
    from valentine_spark.operators import curation_funnel

    long_en = ("the data " * 25).strip()          # 224 chars, stopword-rich
    rows = [
        (1, long_en),                             # survives all gates
        (2, long_en + "!!"),                      # normalized-dup of doc 1
        (3, "the " + "x y z w v u t s r q " * 16),  # long, en, low repetition
        (4, "short the and of"),                  # fails min length
        (5, "der und das ist " * 16),             # long but German
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["stage"]: r["n_docs"]
        for r in curation_funnel(
            df, min_chars=100, min_quality=0.3,
            max_dup_word_frac=0.99, max_top_bigram_frac=0.99,
        ).collect()
    }
    assert got["total"] == 5
    assert got["pass_min_length"] == 4          # doc 4 out
    assert got["pass_language"] == 3            # doc 5 out
    assert got["pass_quality"] == 3
    assert got["pass_repetition"] == 3
    assert got["kept_after_exact_dedup"] == 2   # docs 1+2 normalize equal


def test_curation_funnel_single_scan_no_join(spark):
    from valentine_spark.operators import curation_funnel

    df = spark.createDataFrame([(1, "the a b")], "doc_id long, text string")
    plan = curation_funnel(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan              # gates compose in one projection


def test_wav_g711_tables_match_cpython_reference():
    """The μ-law/A-law expansion tables must equal CPython's audioop
    (the G.711 reference implementation) on all 256 codes."""
    audioop = pytest.importorskip("audioop")  # removed in Python 3.13
    import numpy as np

    from valentine_spark.functions.wav import _ALAW_TABLE, _ULAW_TABLE

    ul = np.frombuffer(audioop.ulaw2lin(bytes(range(256)), 2), dtype="<i2")
    al = np.frombuffer(audioop.alaw2lin(bytes(range(256)), 2), dtype="<i2")
    assert np.array_equal(_ULAW_TABLE, ul)
    assert np.array_equal(_ALAW_TABLE, al)


@pytest.mark.parametrize("law", ["ulaw", "alaw"])
def test_wav_g711_roundtrip(law):
    import numpy as np

    from valentine_spark.functions.wav import decode_wav, encode_wav_g711

    t = np.linspace(0, 1, 4000, endpoint=False)
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    dec, rate = decode_wav(encode_wav_g711(sig, 8000, law=law))
    assert rate == 8000 and dec.shape == (4000, 1)
    # companding is log-quantized: ~1% worst-case error at half scale
    assert np.abs(dec[:, 0] - sig).max() < 0.02
    stereo = np.stack([sig, -sig], axis=1)
    dec2, _ = decode_wav(encode_wav_g711(stereo, 16000, law=law))
    assert dec2.shape == (4000, 2)
    assert np.abs(dec2[:, 1] + sig).max() < 0.02


def test_wav_g711_rejects_wrong_bits():
    import struct

    from valentine_spark.functions.wav import WavError, decode_wav

    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 16000, 2, 16)  # 16-bit mu-law: invalid
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(WavError, match="G.711"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_pii_redact_counts_and_chain_order(spark):
    from valentine_spark.operators import pii_redact

    rows = [
        (1, "mail a.b+c@ex-ample.org and d@e.io now"),          # 2 emails
        (2, "ssn 123-45-6789 then ip 10.0.3.45 end"),            # 1 ssn, 1 ip
        (3, "call +1 415 555 0123 or (020) 7946-0958 now"),      # 2 phones
        (4, "clean text with no identifiers at all"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in pii_redact(df).collect()}

    assert (got[1]["n_emails"], got[1]["n_ssns"], got[1]["n_ipv4s"], got[1]["n_phones"]) == (2, 0, 0, 0)
    assert got[1]["redacted_text"] == "mail <EMAIL> and <EMAIL> now"
    # ORDER IS SEMANTICS: the ssn and the ip must NOT also count as phones
    # (they are redacted to digit-free tokens before the phone pass runs)
    assert (got[2]["n_ssns"], got[2]["n_ipv4s"], got[2]["n_phones"]) == (1, 1, 0)
    assert got[2]["redacted_text"] == "ssn <ID> then ip <IP> end"
    assert got[3]["n_phones"] == 2
    assert got[3]["redacted_text"] == "call <PHONE> or <PHONE> now"
    assert got[4]["redacted_text"] == rows[3][1]
    assert sum(v for k, v in got[4].items() if k.startswith("n_")) == 0
    assert got[5]["redacted_text"] is None


def test_pii_redact_plan_is_shuffle_free(spark):
    from valentine_spark.operators import pii_redact

    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("a@b.co t").alias("text")
    )
    plan = pii_redact(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_decontaminate_flags_shingle_overlap(spark):
    from valentine_spark.operators import decontaminate

    eight = "one two three four five six seven eight"
    corpus = spark.createDataFrame(
        [
            (1, f"prefix words {eight} suffix words here"),  # contains the 8-gram
            (2, "totally unrelated text with its own words going on and on"),
            (3, f"{eight.upper()} exact but uppercased"),     # normalization catches it
            (4, "one two three four five six seven"),         # only 7 words of it
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, f"the eval item says {eight} verbatim")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in decontaminate(corpus, bench, n=8).collect()}
    assert set(got) == {1, 3}
    assert got[1]["n_benchmark_docs"] == 1
    assert got[1]["n_hit_shingles"] >= 1


def test_decontaminate_short_docs_and_clean_corpus(spark):
    from valentine_spark.operators import decontaminate

    corpus = spark.createDataFrame(
        [(1, "a b c"), (2, "x y z w v u t s r q")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(9, "completely disjoint benchmark content with many distinct words")],
        "doc_id long, text string",
    )
    assert decontaminate(corpus, bench, n=8).count() == 0


def test_decontaminate_benchmark_side_broadcasts(spark):
    from valentine_spark.operators import decontaminate

    corpus = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.lit("one two three four five six seven eight nine ten").alias("text"),
    )
    bench = corpus.limit(2)
    plan = (
        decontaminate(corpus, bench, n=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan, plan
