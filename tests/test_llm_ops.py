"""Tests for the training-data pipeline operators (dedup, similarity,
text analysis, multimodal plumbing) on synthetic rows + real testdata."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from gnocchi_spark import tables
from gnocchi_spark.operators.dedup import (
    char_shingles,
    exact_dedup,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from gnocchi_spark.operators.multimodal import attach_payload, decode_image_features
from gnocchi_spark.operators.similarity import cosine_topk, lsh_cosine_topk
from gnocchi_spark.operators.textstats import document_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="the quick brown fox jumps over the lazy dog"),  # exact dup
        Row(doc_id=3, text="The  Quick Brown   Fox jumps over the lazy dog"),  # norm dup
        Row(doc_id=4, text="the quick brown fox leaps over the lazy dog"),  # near dup
        Row(doc_id=5, text="completely unrelated text about spark engines"),
        Row(doc_id=6, text=""),
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup(docs):
    out = {r["representative"]: r["n_dups"] for r in exact_dedup(docs).collect()}
    # 1,2,3 collapse after normalization; 4, 5, 6 are singletons
    assert out[1] == 3
    assert out[4] == 1
    assert out[5] == 1
    assert out[6] == 1


def test_shingles(spark):
    df = spark.createDataFrame([Row(text="abcd")]).select(
        char_shingles(F.col("text"), 3).alias("s")
    )
    assert df.collect()[0]["s"] == ["abc", "bcd"]
    empty = spark.createDataFrame([Row(text="ab")]).select(
        char_shingles(F.col("text"), 3).alias("s")
    )
    assert empty.collect()[0]["s"] == []


def test_ngram_jaccard(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0  # identical
    assert (1, 4) in pairs and pairs[(1, 4)] > 0.65  # near dup (j=0.696 at k=5)
    assert not any(5 in p for p in pairs)  # unrelated stays out


def test_minhash_lsh_finds_near_dups(docs):
    # r=2 banding on the tiny corpus: catching the j=0.696 pair (1,4)
    # is ~66% per draw under the production r=4 banding (tuned for
    # background-similarity suppression at scale), ~100% at r=2
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_near_duplicates(docs, num_hashes=16, band_size=2).collect()
    }
    assert (1, 2) in pairs
    assert (1, 4) in pairs
    assert not any(5 in p for p in pairs)


def test_autotune_minhash_params_schedule():
    # rows-per-band must grow ~log(N) (the background-collision term
    # b*N^2*j_bg^r is quadratic under fixed r — measured 25.4x
    # candidates at a 10x corpus in BENCH_r03) while the band count
    # keeps recall at the 0.9-Jaccard design point above 0.95
    from gnocchi_spark.operators.dedup import autotune_minhash_params

    prev_r = 0
    for n in [100, 1000, 10_000, 100_000, 1_000_000, 1_000_000_000]:
        nh, r = autotune_minhash_params(n)
        assert r >= prev_r, "band size must be monotone in corpus size"
        prev_r = r
        b = nh // r
        assert nh == b * r
        assert nh <= 144, "signature width must stay bounded"
        # OR-construction recall at the j=0.9 design threshold
        p1 = 0.9 ** r
        recall = 1.0 - (1.0 - p1) ** b
        assert recall >= 0.95, (n, nh, r, recall)
        # expected background collisions per doc stay bounded:
        # b * N * j_bg^r <= ~2 (the linear-candidates invariant),
        # modulo the r cap at huge N
        if r < 12:
            assert b * n * 0.15 ** r <= 2.5, (n, nh, r)
    n4, r4 = autotune_minhash_params(100)
    n6, r6 = autotune_minhash_params(1_000_000)
    assert r6 > r4, "schedule must actually move across 4 decades"


def test_simhash(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_duplicates(docs, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0  # identical text, identical signature
    assert all(h <= 3 for h in pairs.values())
    assert not any(5 in p for p in pairs)


def test_document_stats(docs):
    stats = {r["doc_id"]: r for r in document_stats(docs).collect()}
    assert stats[1]["n_tokens"] == 9
    assert stats[1]["detected_lang"] == "en"
    assert stats[1]["fingerprint"] == stats[2]["fingerprint"] == stats[3]["fingerprint"]
    assert 0.0 <= stats[1]["quality"] <= 1.0


def test_cosine_topk_exact(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    out = cosine_topk(emb, emb.where(F.col("vec_id") < 3), k=5)
    rows = out.collect()
    per_query = {}
    for r in rows:
        per_query.setdefault(r["query_id"], []).append(r)
    for q, rs in per_query.items():
        assert [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]
        sims = [r["cosine"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)
        assert all(r["neighbor_id"] != q for r in rs)


def test_lsh_recall_against_exact(spark, sf_dir):
    emb = tables.load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5).collect()
    approx = lsh_cosine_topk(
        emb, queries, k=5, n_planes=4, probe_hamming=2
    ).collect()
    exact_top1 = {r["query_id"]: r["neighbor_id"] for r in exact if r["rank"] == 1}
    approx_by_q = {}
    for r in approx:
        approx_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # top-1 cosines in this corpus are ~0.35 (~70 deg), so per-plane
    # agreement is ~0.61; probing Hamming radius 2 of 4 planes gives
    # ~0.8 expected top-1 recall — assert a safe margin below that
    hits = sum(1 for q, n in exact_top1.items() if n in approx_by_q.get(q, set()))
    assert hits >= len(exact_top1) / 2


def test_embedding_neardup_banded_lsh(spark, sf_dir):
    """The banded-LSH near-dup pairs must be a PERFECT-precision subset
    of the exact all-pairs truth (the retired all-pairs query, kept here
    as the recall oracle), with no Cross join anywhere in the plan."""
    from gnocchi_spark.operators.similarity import cosine, embedding_near_duplicates

    emb = tables.load(spark, sf_dir, "embeddings")
    out = embedding_near_duplicates(emb, threshold=0.35)

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Cross" not in plan, "banded LSH must not materialize the pair space"

    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    truth = (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", F.round(cosine(F.col("ea"), F.col("eb")), 5))
        .where(F.col("cosine") >= 0.35)
    )
    got = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in out.collect()}
    want = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in truth.collect()}
    assert set(got) <= set(want), "precision must be 1.0"
    for k in got:
        assert got[k] == want[k]
    # this corpus's "near-dups" top out at cos~0.5 (nearly orthogonal —
    # the hard LSH regime): expected per-pair collision at cos 0.35-0.5
    # is 1-(1-(1-theta/pi)^6)^4 ~ 0.2-0.3; assert a safe floor so a
    # banding regression (e.g. broken band keys -> zero candidates)
    # fails loudly without making the test flaky.
    assert len(got) >= max(2, int(0.10 * len(want))), (len(got), len(want))


def test_multimodal_plumbing(docs):
    media = attach_payload(docs)
    out = {r["doc_id"]: r for r in decode_image_features(media, fake=True).collect()}
    assert out[1]["n_bytes"] == len("the quick brown fox jumps over the lazy dog")
    assert len(out[1]["features"]) == 4
    assert out[1]["features"][0] == out[1]["n_bytes"]
    assert out[6]["features"] == [0.0, 0.0, 0.0, 0.0]
    # fake=False is import-guarded, not an error: non-image payloads
    # fall back to the stand-in per payload, so the auto path matches
    # the forced-fake path byte-for-byte whether or not PIL exists
    auto = {
        r["doc_id"]: r for r in decode_image_features(media, fake=False).collect()
    }
    assert {k: v["features"] for k, v in auto.items()} == {
        k: v["features"] for k, v in out.items()
    }


def test_multimodal_real_decode():
    # the real-decode branch executes WITHOUT PIL via the pure-Python
    # BMP codec shim (operators/_bmp_shim.py): known pixels must yield
    # pixel moments, not byte moments
    import io as _io

    from gnocchi_spark.operators import _bmp_shim
    from gnocchi_spark.operators.multimodal import _fake_features, _real_features

    pixels = [(0, 0, 0), (85, 85, 85), (170, 170, 170), (255, 255, 255)]
    bmp = _bmp_shim.encode(pixels, 2, 2)
    # codec round trip: decode returns exactly the encoded pixels
    assert _bmp_shim.open(_io.BytesIO(bmp))._pixels == pixels
    feats = _real_features(_bmp_shim, bmp)
    assert feats is not None
    assert feats[1:] == [127.5, 255.0, 0.0]  # mean/max/min of pixels
    assert feats != _fake_features(bmp), "must be the real branch"
    # an undecodable payload falls back per-payload (returns None)
    assert _real_features(_bmp_shim, b"not a bmp") is None
    # if real PIL ever appears in this container, the shim's codec and
    # luma must agree with it on the same BMP bytes
    try:
        from PIL import Image as PIL_Image
    except ImportError:
        pass
    else:
        assert _real_features(PIL_Image, bmp) == feats


def test_multimodal_real_decode_distributed(spark):
    # real branch through the Arrow-batched executor path: the decoder
    # module is imported BY THE PYTHON WORKER (a driver-side monkeypatch
    # could never prove this), BMP payloads decode, corrupt ones fall
    # back per-payload
    from gnocchi_spark.operators import _bmp_shim
    from gnocchi_spark.operators.multimodal import (
        _fake_features,
        decode_image_features,
        resize_images,
        sample_frames,
    )

    shim = "gnocchi_spark.operators._bmp_shim"

    def flat_bmp(val, w=4, h=2):
        return _bmp_shim.encode([(val, val, val)] * (w * h), w, h)

    media = spark.createDataFrame(
        [
            Row(doc_id=1, payload=bytearray(flat_bmp(10)),
                meta=Row(mime="image/bmp", n_bytes=0)),
            Row(doc_id=2, payload=bytearray(flat_bmp(200)),
                meta=Row(mime="image/bmp", n_bytes=0)),
            Row(doc_id=3, payload=bytearray(b"corrupt"),
                meta=Row(mime="image/bmp", n_bytes=0)),
        ]
    )
    feats = {
        r["doc_id"]: r["features"]
        for r in decode_image_features(media, decoder=shim).collect()
    }
    n = len(flat_bmp(10))
    assert feats[1] == [float(n), 10.0, 10.0, 10.0]  # pixel moments
    assert feats[2] == [float(n), 200.0, 200.0, 200.0]
    assert feats[3] == _fake_features(b"corrupt")  # per-payload fallback

    resized = {
        r["doc_id"]: bytes(r["payload"])
        for r in resize_images(media, 2, 1, decoder=shim).collect()
    }
    assert resized[1] == bytes([10, 10])  # real nearest-neighbor resize
    assert len(resized[3]) == 2  # fallback stride keeps target size

    frames = [
        r
        for r in sample_frames(media, decoder=shim).collect()
        if r["doc_id"] == 1
    ]
    assert len(frames) == 1 and frames[0]["n_frames"] == 1
    assert bytes(frames[0]["frame"]) == bytes([10] * 8)  # 4x2 luma plane


def test_multimodal_resize(docs):
    from gnocchi_spark.operators.multimodal import resize_images

    media = attach_payload(docs)
    out = {r["doc_id"]: r for r in resize_images(media, 4, 3, fake=True).collect()}
    text1 = b"the quick brown fox jumps over the lazy dog"
    # source longer than 12 bytes: strided downsample
    step = len(text1) // 12
    assert bytes(out[1]["payload"]) == text1[::step][:12]
    assert (out[1]["width"], out[1]["height"], out[1]["n_bytes"]) == (4, 3, 12)
    # empty payload: zero-filled target
    assert bytes(out[6]["payload"]) == b"\x00" * 12
    # import-guarded auto path: undecodable payloads stride-resize
    # identically to the forced-fake path in any environment
    auto = {r["doc_id"]: r for r in resize_images(media, 4, 3, fake=False).collect()}
    assert {k: bytes(v["payload"]) for k, v in auto.items()} == {
        k: bytes(v["payload"]) for k, v in out.items()
    }


def test_multimodal_frame_sample_bytes(spark):
    from gnocchi_spark.operators.multimodal import attach_payload, sample_frames

    # 1100-byte payload -> 2 frames of 550; frames reassemble the source
    text = "ab" * 550
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    rows = sorted(
        sample_frames(attach_payload(df), fake=True).collect(),
        key=lambda r: r["frame_idx"],
    )
    assert [r["n_frames"] for r in rows] == [2, 2]
    assert [r["frame_bytes"] for r in rows] == [550, 550]
    assert b"".join(bytes(r["frame"]) for r in rows) == text.encode()


def test_ivf_recall_vs_exact(spark):
    from gnocchi_spark import tables
    from gnocchi_spark.operators.similarity import cosine_topk, ivf_cosine_topk
    from pyspark.sql import functions as F

    emb = tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, q, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_cosine_topk(emb, q, k=5, n_centroids=8, n_probe=2).collect()
    }
    # probing 2/8 clusters must retain a reasonable fraction of the
    # exact top-5 sets (deterministic given fixed centroids)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, recall
    # every approx hit is a real corpus pair with rank <= 5
    assert all(qid != nid for qid, nid in approx)


def test_ivf_kmeans_training_improves_assignment(spark):
    from gnocchi_spark.operators.similarity import (
        cosine,
        ivf_assign,
        ivf_train_kmeans,
    )

    emb = tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    trained = ivf_train_kmeans(emb, k=4, iterations=3)
    rows = trained.collect()
    assert len(rows) == 4
    assert all(len(r["centroid"]) == 64 for r in rows)

    # mean assignment similarity with trained centroids beats the raw
    # seed centroids (k-means ascent property on its own objective)
    def mean_sim(cents):
        a = ivf_assign(emb, cents, n_probe=1)
        joined = a.join(cents, "centroid_id").select(
            cosine(F.col("embedding"), F.col("centroid")).alias("s")
        )
        return joined.agg(F.avg("s")).collect()[0][0]

    seeds = emb.orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )
    assert mean_sim(trained) > mean_sim(seeds)


def test_connected_components_star_convergence(spark):
    # two components (one a 5-chain — multiple star rounds needed), one
    # isolated pair, plus a doc with no pairs at all
    from gnocchi_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [Row(doc_a=a, doc_b=b) for a, b in [(5, 4), (4, 3), (3, 2), (2, 1), (9, 8)]]
    )
    got = {
        r["node"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 8: 8, 9: 8}


def test_near_dup_clusters_singletons_and_canonicals(spark):
    from gnocchi_spark.operators.dedup import near_dup_clusters

    docs = spark.createDataFrame([Row(doc_id=i) for i in [1, 2, 3, 7, 8]])
    pairs = spark.createDataFrame([Row(doc_a=1, doc_b=2), Row(doc_a=2, doc_b=3)])
    rows = {r["doc_id"]: r for r in near_dup_clusters(docs, pairs).collect()}
    assert [rows[i]["cluster_id"] for i in [1, 2, 3]] == [1, 1, 1]
    assert rows[1]["cluster_size"] == 3 and rows[1]["is_canonical"]
    assert not rows[2]["is_canonical"]
    assert rows[7]["cluster_id"] == 7 and rows[7]["cluster_size"] == 1
    assert rows[7]["is_canonical"] and rows[8]["is_canonical"]


def test_autotune_lsh_params_scale_law():
    from gnocchi_spark.operators.similarity import autotune_lsh_params

    b1, r1 = autotune_lsh_params(500)
    b2, r2 = autotune_lsh_params(5000)
    b3, r3 = autotune_lsh_params(5_000_000)
    # bits grow with log2(N) so background candidates stay ~linear
    assert r1 < r2 < r3
    assert r2 == 21  # ceil(1.6 * log2 5000) + 1 (r07 schedule: slope
    # 1.35 compounded to 1.69x linear at the 100x deep-stress probe)
    # recall is bought back with more bands as keys get longer
    assert b1 <= b2 <= b3


def test_banded_keys_matches_per_band_lsh_bucket(spark, sf_dir):
    from gnocchi_spark.operators.similarity import (
        banded_keys,
        hyperplanes,
        lsh_bucket,
    )

    emb = tables.load(spark, sf_dir, "embeddings").limit(50)
    n_bands, band_planes = 4, 6
    planes = hyperplanes(n_bands * band_planes, 64)
    both = emb.select(
        banded_keys(F.col("embedding"), planes, n_bands, band_planes).alias("fast"),
        F.array(
            *[
                lsh_bucket(
                    F.col("embedding"),
                    planes[b * band_planes : (b + 1) * band_planes],
                )
                for b in range(n_bands)
            ]
        ).alias("ref"),
    )
    assert both.where(F.col("fast") != F.col("ref")).count() == 0


def test_winnowing_shared_substring_guarantee(spark):
    from gnocchi_spark.operators.textstats import winnowing_fingerprints

    shared = "identical phrase here"  # >= window+k-1 = 8 chars shared
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"left context AAA {shared} right tail one"),
            Row(doc_id=2, text=f"other opening ZZ {shared} different end"),
            Row(doc_id=3, text="nothing in common with the others at all"),
            Row(doc_id=4, text="tinydoc"),  # k <= len < k+window-1: fallback
            Row(doc_id=5, text="abc"),  # shorter than k: no fingerprint
        ]
    )
    out = winnowing_fingerprints(docs, k=5, window=4)
    fp = {
        i: {r["fingerprint"] for r in out.where(F.col("doc_id") == i).collect()}
        for i in [1, 2, 3, 4, 5]
    }
    assert fp[1] & fp[2]  # shared substring -> shared fingerprint
    assert not (fp[1] & fp[3]) and not (fp[2] & fp[3])
    assert len(fp[4]) == 1
    assert len(fp[5]) == 0


# ---------------------------------------------------------------------------
# label-centroid outliers + product quantization
# ---------------------------------------------------------------------------

def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_label_centroid_outliers_finds_planted_outlier(spark):
    from gnocchi_spark.operators.similarity import label_centroid_outliers

    # label 0: three near-identical vectors + one opposite-direction
    # outlier; the outlier must rank first (least similar to centroid)
    base = [1.0, 0.5] + [0.0] * 62
    rows = [
        (0, [v + 0.01 * i for i, v in enumerate(base)], 0),
        (1, [v + 0.02 for v in base], 0),
        (2, base, 0),
        (3, [-v for v in base], 0),
    ]
    out = label_centroid_outliers(_vecs(spark, rows), k=2).collect()
    assert [r["vec_id"] for r in out if r["rank"] == 1] == [3]


def test_pq_encode_codebook_vectors_self_code(spark):
    from gnocchi_spark.operators.similarity import (
        pq_deterministic_codebooks,
        pq_encode,
    )

    # deterministic corpus: 16 distinct vectors -> codebooks ARE their
    # subvectors, so vector j must encode to code j in every subspace
    rows = [
        (i, [float((i * 7 + j * 3) % 23) - 11.0 for j in range(64)], 0)
        for i in range(16)
    ]
    df = _vecs(spark, rows)
    cbs = pq_deterministic_codebooks(df, m=8, k=16, dim=64)
    enc = {r["vec_id"]: r["codes"] for r in pq_encode(df, cbs).collect()}
    for i in range(16):
        assert enc[i] == [i] * 8, f"vector {i} encoded as {enc[i]}"


def test_pq_adc_ranks_exact_duplicate_first(spark):
    from gnocchi_spark.operators.similarity import (
        pq_adc_topk,
        pq_deterministic_codebooks,
    )

    # 20 spread-out vectors; vector 17 duplicates vector 3 -> ADC
    # distance 0 between them, so each must rank the other first
    rows = [
        (i, [float((i * 11 + j * 5) % 17) - 8.0 for j in range(64)], 0)
        for i in range(17)
    ]
    rows.append((17, rows[3][1], 0))
    df = _vecs(spark, rows)
    cbs = pq_deterministic_codebooks(df, m=8, k=16, dim=64)
    out = pq_adc_topk(df, df.where(F.col("vec_id") == 17), cbs, k=3).collect()
    top = [r for r in out if r["rank"] == 1][0]
    assert top["neighbor_id"] == 3 and top["adc_dist"] == 0.0


def test_kmeans_cluster_profile_partitions_separable_data(spark):
    from gnocchi_spark.operators.similarity import kmeans_cluster_profile

    # two well-separated directions: ids 0-2 along +x, ids 3-5 along +y
    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [1.0, 0.05]),
        (3, [0.0, 1.0]), (4, [0.1, 0.9]), (5, [0.05, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_cluster_profile(df, k=2, iterations=2).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == 6
    a = {i for i in by_id if by_id[i]["cluster_id"] == by_id[0]["cluster_id"]}
    assert a == {0, 1, 2}
    assert all(by_id[i]["n_members"] == 3 for i in by_id)
    # cohesion: every member is closer to its own centroid than 0.9
    assert all(r["cosine"] > 0.9 for r in out)


def test_containment_detects_quote_inside_long_doc(spark):
    from gnocchi_spark.operators.dedup import containment_pairs

    quote = "the quick brown fox jumps over the lazy dog again and again"
    long_doc = (
        "completely unrelated preamble material here " + quote +
        " and then a very long unrelated tail that keeps going with more words"
    )
    other = "nothing in common with either document at all whatsoever truly"
    docs = spark.createDataFrame(
        [(1, quote), (2, long_doc), (3, other)], "doc_id long, text string"
    )
    out = containment_pairs(docs, max_df=10, min_fps=3, threshold=0.8).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in out}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    # the quote's fingerprints are (nearly) all inside the long doc
    assert r["containment"] >= 0.8
    assert r["n_a"] <= r["n_b"]
    assert not any(3 in p for p in pairs)


def test_dedup_tuners_pinned_param_coherence(spark, docs):
    # pinning exactly ONE parameter must never produce a degenerate
    # configuration (zero bands / over-budget signature) — the derived
    # parameter follows the pinned one
    from gnocchi_spark.operators.dedup import (
        autotune_simhash_params,
        minhash_near_duplicates,
        simhash_band_candidates,
    )

    # minhash: pinned short signature -> band width clamps to fit
    out = minhash_near_duplicates(docs, num_hashes=8).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in out} >= {(1, 2)}  # exact dup pair
    # minhash: pinned band width -> band count preserved via num_hashes
    out = minhash_near_duplicates(docs, band_size=3).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in out} >= {(1, 2)}
    # simhash: pinned band_bits survives; pinned n_bands clamps width
    got = simhash_band_candidates(docs, band_bits=12).collect()
    assert any(r["doc_a"] == 1 and r["doc_b"] == 2 for r in got)
    b, w = autotune_simhash_params(10**9, max_hamming=3, n_bands=5)
    assert b == 5 and b * w <= 128


def test_canonical_pick_keeps_best_quality_min_id(spark):
    # keep = highest quality, ties -> smallest doc id; every member of
    # the cluster points at the same kept_id
    from gnocchi_spark.operators.dedup import canonical_pick

    assigned = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 8), (9, 8)],
        "doc_id long, cluster_id long",
    )
    quality = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (7, 5), (8, 4), (9, 4)],
        "doc_id long, quality long",
    )
    out = {
        r["doc_id"]: (r["kept_id"], r["keep"])
        for r in canonical_pick(assigned, quality).collect()
    }
    assert out[1] == (2, False)   # 2 and 3 tie on quality; min id wins
    assert out[2] == (2, True)
    assert out[3] == (2, False)
    assert out[7] == (7, True)    # singleton keeps itself
    assert out[8] == (8, True)    # tie within cluster 8 -> min id
    assert out[9] == (8, False)


def test_benchmark_decontamination_flags_13gram_overlap(spark):
    """A corpus doc sharing exactly 13 consecutive tokens with the
    benchmark is flagged; 12 shared tokens is below the shingle width
    and passes clean; sub-13-token docs emit no shingles at all."""
    from gnocchi_spark.operators.dedup import (
        benchmark_decontamination,
        token_shingle_hashes,
    )

    bench_text = " ".join(f"b{i}" for i in range(20))
    run13 = " ".join(f"b{i}" for i in range(13))          # tokens b0..b12
    run12 = " ".join(f"b{i}" for i in range(12))          # tokens b0..b11
    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"x0 x1 x2 {run13} y0 y1 y2"),
            Row(doc_id=2, text=f"x0 x1 x2 {run12} y0 y1 y2 y3"),
            Row(doc_id=3, text="z0 z1 z2"),
        ]
    )
    benchmark = spark.createDataFrame([Row(doc_id=100, text=bench_text)])
    got = {
        r["doc_id"]: r
        for r in benchmark_decontamination(corpus, benchmark).collect()
    }
    assert set(got) == {1}
    assert got[1]["n_hit"] == 1  # exactly the b0..b12 shingle
    # doc 1 has 19 tokens -> 7 shingles
    assert got[1]["n_shingles"] == 7
    # short docs produce zero shingles (the descending-sequence guard)
    n = token_shingle_hashes(
        spark.createDataFrame([Row(doc_id=9, text="a b c")])
    ).count()
    assert n == 0


def test_assignment_memo_eviction_staleness_and_clear(spark, tmp_path):
    """The dedup stage memo (r08): bounded LRU that unpersists evicted
    entries' checkpoint blocks, keyed by an input-file fingerprint so a
    rewritten corpus misses instead of serving stale assignments, and
    clearable."""
    from gnocchi_spark.operators import dedup as D

    def n_persisted():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    def write_corpus(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "c"))
        return spark.read.parquet(str(tmp_path / "c"))

    D.clear_assignment_cache()
    base_entries = len(D._ASSIGNMENT_CACHE)
    assert base_entries == 0

    text_a = "alpha beta gamma delta epsilon zeta eta theta"
    v1 = write_corpus([(i, text_a) for i in range(1, 5)] + [(9, "unrelated words only here")])
    key = str(tmp_path / "c")
    a1 = D.cluster_assignments(
        v1, num_hashes=8, band_size=4, threshold=0.6, cache_key=key
    )
    # all four identical docs land in one cluster rooted at min id
    got1 = {r["doc_id"]: r["cluster_id"] for r in a1.collect()}
    assert got1 == {1: 1, 2: 1, 3: 1, 4: 1, 9: 9}
    assert len(D._ASSIGNMENT_CACHE) == 2  # pair set + assignment

    # memo hit returns the same materialized frame
    a1b = D.cluster_assignments(
        v1, num_hashes=8, band_size=4, threshold=0.6, cache_key=key
    )
    assert a1b is a1

    # STALENESS: rewrite the parquet at the same path -> the fingerprint
    # changes, the memo misses, and the NEW corpus's clusters come back
    import time

    time.sleep(0.05)  # mtime_ns granularity guard
    v2 = write_corpus([(i, text_a) for i in (7, 8)] + [(5, "different words entirely now")])
    a2 = D.cluster_assignments(
        v2, num_hashes=8, band_size=4, threshold=0.6, cache_key=key
    )
    got2 = {r["doc_id"]: r["cluster_id"] for r in a2.collect()}
    assert got2 == {7: 7, 8: 7, 5: 5}

    # EVICTION: sweeping parameters stays within the LRU bound and the
    # evicted entries' checkpoint blocks are unpersisted (the persisted
    # count plateaus at the bound + build leftovers, not one per sweep)
    before = n_persisted()
    for th in (0.3, 0.4, 0.5, 0.7, 0.8):
        D.cluster_assignments(
            v2, num_hashes=8, band_size=4, threshold=th, cache_key=key
        ).count()
    assert len(D._ASSIGNMENT_CACHE) <= D._ASSIGNMENT_CACHE.max_entries
    # 5 sweeps x 2 stages each = 10 checkpoints created; without
    # eviction persisted would grow by ~10
    assert n_persisted() - before <= D._ASSIGNMENT_CACHE.max_entries + 2

    # CLEAR: everything the memo owns is dropped and unpersisted
    owned = D._ASSIGNMENT_CACHE.owned_ids()
    assert owned
    D.clear_assignment_cache()
    assert len(D._ASSIGNMENT_CACHE) == 0
    live = {
        rid
        for rid in spark.sparkContext._jsc.getPersistentRDDs()
        .keySet()
        .toArray()
    }
    assert not (owned & live)


def test_registered_local_checkpoint_reuse_and_bounding(spark, tmp_path):
    """registered_local_checkpoint (r09, ADVICE): materialization
    boundaries inside query builders register their blocks with the
    bounded memo — file-backed inputs are reused on repeat calls,
    non-file inputs register reclaim-only, and the LRU sweep bounds
    the live block count instead of leaking one RDD per call."""
    from pyspark.sql import functions as F

    from gnocchi_spark.operators import dedup as D

    D.clear_assignment_cache()
    df = spark.createDataFrame([(i, i * 2) for i in range(100)], "a long, b long")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "t"))
    filebacked = spark.read.parquet(str(tmp_path / "t")).withColumn(
        "c", F.col("a") + F.col("b")
    )

    c1 = D.registered_local_checkpoint(filebacked, "k1")
    assert c1.count() == 100
    # same file-backed input + key -> the SAME materialized frame
    c2 = D.registered_local_checkpoint(filebacked, "k1")
    assert c2 is c1
    # different key -> a distinct entry
    c3 = D.registered_local_checkpoint(filebacked, "k2")
    assert c3 is not c1
    assert len(D._ASSIGNMENT_CACHE) == 2

    # non-file-backed input: never reused (unique key), but registered
    mem = spark.range(50).select(F.col("id").alias("a"))
    m1 = D.registered_local_checkpoint(mem, "k1")
    m2 = D.registered_local_checkpoint(mem, "k1")
    assert m1 is not m2
    assert len(D._ASSIGNMENT_CACHE) == 4

    # bounding: a sweep of registrations stays within the LRU bound
    for i in range(D._ASSIGNMENT_CACHE.max_entries + 4):
        D.registered_local_checkpoint(mem, "sweep", i).count()
    assert len(D._ASSIGNMENT_CACHE) <= D._ASSIGNMENT_CACHE.max_entries
    D.clear_assignment_cache()


def test_lazy_unmaterialized_entry_survives_capacity_eviction(spark):
    """Capacity eviction must NOT unpersist a lazy checkpoint that was
    never acted on (r11 ADVICE): an unmaterialized
    localCheckpoint(eager=False) holds zero blocks, so unpersisting it
    only clears the storage-level mark and the frame can never
    materialize — a user lazily composing a dozen operator results
    then hit an action-time 'checkpoint block not found'.  The lazy
    entry is parked (r12: tracked in the exemption side list, counted
    by exempted_count(), visible to owned_ids(), and force-released by
    clear()) so the frame stays actionable after an arbitrary
    registration flood and the memo's bound is recoverable."""
    from pyspark.sql import functions as F

    from gnocchi_spark.operators import dedup as D

    D.clear_assignment_cache()
    assert D._ASSIGNMENT_CACHE.exempted_count() == 0
    mem = spark.range(200).select(
        F.col("id").alias("a"), (F.col("id") * 3).alias("b")
    )
    # register a LAZY checkpoint and do NOT act on it
    held = D.registered_local_checkpoint(mem, "held_lazy")
    # flood the memo well past max_entries with materialized entries
    for i in range(D._ASSIGNMENT_CACHE.max_entries + 6):
        D.registered_local_checkpoint(mem, "flood", i).count()
    assert len(D._ASSIGNMENT_CACHE) <= D._ASSIGNMENT_CACHE.max_entries
    # the evicted-unmaterialized entry is COUNTED (r12 telemetry) and
    # its handle stays protected from intermediate sweeps
    assert D._ASSIGNMENT_CACHE.exempted_count() >= 1
    held_rid = held._jdf.queryExecution().analyzed().rdd().id()
    assert held_rid in D._ASSIGNMENT_CACHE.owned_ids()
    # the held frame's entry was evicted, but the frame must still be
    # actionable — pre-r11 this raised at action time
    assert held.count() == 200
    assert held.agg(F.sum("b")).collect()[0][0] == 3 * sum(range(200))
    # clear() force-releases the parked handles too (r12: the bounded
    # leak is recoverable, not until-application-end)
    D.clear_assignment_cache()
    assert D._ASSIGNMENT_CACHE.exempted_count() == 0
    live = {
        rid
        for rid in spark.sparkContext._jsc.getPersistentRDDs()
        .keySet()
        .toArray()
    }
    assert held_rid not in live


def test_connected_components_isolates_session_conf(spark):
    """The CC loop's narrow shuffle width is a plan property (r09 —
    explicit repartition on the loop's join inputs, no session conf
    reads or writes): the caller's spark.sql.shuffle.partitions never
    changes, and the returned frame joins caller-side tables."""
    from gnocchi_spark.operators.dedup import connected_components

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    cc = connected_components(pairs)
    assert spark.conf.get("spark.sql.shuffle.partitions") == saved
    # caller-session usability: join against a caller-session frame
    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 4, 10, 11, 99)], "doc_id long")
    joined = docs.join(cc, docs.doc_id == cc.node, "left").select(
        "doc_id", "component"
    )
    got = {r["doc_id"]: r["component"] for r in joined.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: None}
    assert spark.conf.get("spark.sql.shuffle.partitions") == saved


def test_lsh_ivf_recall_handoff(spark, sf_dir_mid):
    """The r08 recall gate (VERDICT r07 next #1): measured recall
    against brute-force ground truth for the banded-LSH -> IVF
    hand-off, via planted near-dup pairs at controlled cosine
    (tools/recall_profile.py machinery; fixed xxhash seeds, fully
    deterministic).

    Live at N ~ 5.5k: the autotuned LSH holds the 0.9-recall design
    point and IVF partner-retrieval is ~1.  The committed 55k curve
    (RECALL_r9.json) must show the documented decay with the band cap
    binding while IVF holds >= 0.9 — the SCALE.md hand-off claim as
    evidence, not prose.
    """
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.recall_profile import (
        ivf_partner_recall,
        lsh_pair_recall,
        planted_corpus,
    )

    corpus, truth = planted_corpus(spark, sf_dir_mid, 10)
    lsh = lsh_pair_recall(spark, corpus, truth)
    ivf = ivf_partner_recall(spark, corpus, truth)
    assert lsh["n_true_pairs"] > 400
    # design point holds at small N (band count below the cap)
    assert lsh["n_bands"] < 64
    assert lsh["recall"] >= 0.9, lsh
    assert ivf["partner_recall"] >= 0.9, ivf

    # the committed large-N curve: LSH decays (cap binds), IVF holds
    path = os.path.join(os.path.dirname(__file__), "..", "RECALL_r9.json")
    with open(path) as fh:
        curve = json.load(fh)
    big = [p for p in curve["points"] if p["lsh"]["n_items"] >= 50_000]
    assert big, "RECALL_r9.json must carry the 50k+ point"
    p = big[0]
    assert p["lsh"]["n_bands"] == 64  # the cap binds
    at_threshold = p["lsh"]["recall_by_cosine_band"]["[0.90,0.92)"]
    assert at_threshold < 0.85  # the documented decay, measured
    assert p["ivf"]["partner_recall"] >= 0.9  # the hand-off holds


def test_ivf_clustered_recall_gate_and_probe_autotune(spark):
    """The r09 serving gate (VERDICT r08 next #1): on a corpus with
    REAL cluster structure (planted mixture-of-Gaussians — the uniform
    synthetic corpus is the pathological structureless case), IVF
    top-k at the AUTOTUNED probe depth reaches recall@10 >= 0.9, and
    PQ with exact shortlist refinement reaches it too.

    Live at N=5.5k; the committed RECALL_r9.json must carry the 55k
    point with the same gates — note the autotuned probe FRACTION
    falls with N (4.1% -> 1.7%), which is the IVF scaling story.
    """
    import json
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from tools.recall_profile import clustered_ivf_pq_point

    row = clustered_ivf_pq_point(spark, 5_500)
    assert row["ivf_recall_at_k"] >= 0.9, row
    assert row["pq_recall_at_k"] >= 0.9, row
    # the autotuner picks a SMALL probe depth from the measured
    # coverage curve — the whole point over a fixed 15% rule
    assert row["autotuned_n_probe"] <= 8, row
    assert row["probe_fraction"] <= 0.12, row
    # code-only PQ is honestly bad within clusters; refinement is load-
    # bearing and its depth stays a small corpus fraction
    assert row["pq_code_only_recall_at_k"] < 0.5, row
    assert row["pq_refine_fraction"] <= 0.05, row

    path = os.path.join(os.path.dirname(__file__), "..", "RECALL_r9.json")
    with open(path) as fh:
        committed = json.load(fh)
    big = [p for p in committed["clustered"] if p["n_items"] >= 50_000]
    assert big, "RECALL_r9.json must carry the 55k clustered point"
    p = big[0]
    assert p["ivf_recall_at_k"] >= 0.9, p
    assert p["pq_recall_at_k"] >= 0.9, p
    assert p["probe_fraction"] <= 0.05, p


def test_connected_components_concurrent_queries_unaffected(spark):
    """The r08 ADVICE concern, tested directly and extended for r09:
    the CC loop's narrow shuffle width is now a PLAN property
    (explicit repartition on the loop's join inputs) rather than any
    session conf, so (a) a query running CONCURRENTLY with the loop
    must see the caller session's own shuffle width and produce exact
    results, and (b) TWO CC loops running concurrently on the SAME
    session must each converge correctly — the r08 cloned-session
    design let concurrent loops observe each other's width."""
    import threading

    from pyspark.sql import functions as F

    from gnocchi_spark.operators.dedup import connected_components

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    chains = [(i * 10 + j, i * 10 + j + 1) for i in range(200) for j in range(4)]
    pairs = spark.createDataFrame(chains, "doc_a long, doc_b long")
    # a second, differently-shaped graph for the concurrent loop: 50
    # stars of 9 leaves each (converges in fewer rounds than the
    # chains, so the two loops genuinely interleave mid-iteration)
    stars = [
        (100_000 + i * 100, 100_000 + i * 100 + j)
        for i in range(50)
        for j in range(1, 10)
    ]
    pairs2 = spark.createDataFrame(stars, "doc_a long, doc_b long")

    results = {}

    def run_cc(name, p):
        cc = connected_components(p)
        results[name] = cc.count()

    t = threading.Thread(target=run_cc, args=("cc", pairs))
    t2 = threading.Thread(target=run_cc, args=("cc2", pairs2))
    t.start()
    t2.start()
    # concurrent aggregation on the MAIN session while the loops run:
    # its shuffle must use the session width, its result must be exact.
    # Do-while shape (r09 ADVICE): run at least one aggregate
    # unconditionally so `widths` is never empty when the loop
    # finishes before the first poll on a fast machine.
    widths, sums = [], []
    df = spark.range(100_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("v")
    )
    while True:
        agg = df.groupBy("k").agg(F.sum("v").alias("s"))
        widths.append(agg.rdd.getNumPartitions())
        sums.append(agg.agg(F.sum("s")).collect()[0][0])
        if not (t.is_alive() or t2.is_alive()):
            break
    t.join()
    t2.join()
    assert results["cc"] == 1000  # 200 chains x 5 nodes
    assert results["cc2"] == 500  # 50 stars x 10 nodes
    assert spark.conf.get("spark.sql.shuffle.partitions") == saved
    expected = 100_000 * 99_999 // 2
    assert all(s == expected for s in sums), sums[:3]
    # every concurrent aggregate ran at the session width, never the
    # loops' narrowed width (1 partition for these tiny edge sets);
    # with the old conf flip, runs interleaved at width 1 were the
    # failure signature.
    assert widths, "no concurrent query completed during the CC loop"


def test_repeated_span_report_planted_spans(spark):
    """ExactSubstr span semantics on a planted corpus: a 10-token run
    shared by two docs becomes one maximal span in each (start/end
    exact), a within-doc self-repeat counts, and a doc with no
    recurring window emits nothing."""
    from gnocchi_spark.operators.pipeline import repeated_span_report

    shared = "q w e r t y u i o p"  # 10 tokens, n=4 windows 1..7
    docs = spark.createDataFrame(
        [
            # doc 1: shared run at positions 3..12
            (1, "a1 b1 " + shared + " c1 d1"),
            # doc 2: shared run at positions 1..10
            (2, shared + " e2 f2 g2"),
            # doc 3: self-repeat of a 4-token window at 1..4 and 8..11
            (3, "m n o p x3 y3 z3 m n o p"),
            # doc 4: all-unique tokens, no repeats
            (4, "u1 u2 u3 u4 u5 u6 u7 u8 u9"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in repeated_span_report(docs, n=4).collect()
    }
    assert set(out) == {1, 2, 3}
    assert (out[1]["span_start"], out[1]["span_end"]) == (3, 12)
    assert (out[2]["span_start"], out[2]["span_end"]) == (1, 10)
    assert out[1]["span_tokens"] == 10 and out[1]["n_anchors"] == 7
    # doc 3: anchors at 1 and 8 (gap 7 > n=4 would split; here the
    # two window starts differ by 7 > 4, so TWO spans of 4 tokens)
    rows3 = [
        r
        for r in repeated_span_report(docs, n=4).collect()
        if r["doc_id"] == 3
    ]
    assert sorted((r["span_start"], r["span_end"]) for r in rows3) == [
        (1, 4),
        (8, 11),
    ]


def test_repeated_span_report_merges_adjacent_windows(spark):
    """Two recurring windows whose starts differ by exactly n are
    contiguous token ranges and merge into one maximal span."""
    from gnocchi_spark.operators.pipeline import repeated_span_report

    # doc 1 repeats doc 2's tokens in two back-to-back 3-token runs
    # separated by tokens that themselves recur, so anchors are dense
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c d e f"),
        ],
        "doc_id long, text string",
    )
    rows = repeated_span_report(docs, n=3).collect()
    assert len(rows) == 2
    for r in rows:
        assert (r["span_start"], r["span_end"], r["span_tokens"]) == (1, 6, 6)


def test_nb_domain_classifier_learns_separable_vocab(spark):
    """Closed-form NB training must recover a vocabulary-separable
    domain: positives draw from one word set, negatives from another,
    and every doc must be classified correctly (weights are pure
    class-evidence log-ratios, so disjoint vocabularies separate)."""
    from pyspark.sql import functions as F

    from gnocchi_spark.operators.pipeline import nb_domain_classifier

    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "alpha bravo charlie alpha delta", 1))
        else:
            rows.append((i, "xray yankee zulu xray whiskey", 0))
    docs = spark.createDataFrame(rows, "doc_id long, text string, t int")
    out = nb_domain_classifier(docs, F.col("t") == 1)
    got = out.collect()
    assert len(got) == 40
    assert all(r["correct"] == 1 for r in got)
    # margins carry class sign
    assert all(
        (r["score"] > 0) == (r["label"] == 1) for r in got
    )


def test_nb_domain_classifier_prior_breaks_empty_docs(spark):
    """A document whose tokens give zero net evidence falls back to
    the class prior: with a 3:1 positive corpus the prior is positive,
    so the neutral doc predicts +1."""
    from pyspark.sql import functions as F

    from gnocchi_spark.operators.pipeline import nb_domain_classifier

    rows = [
        (1, "p p p", 1),
        (2, "p p", 1),
        (3, "p", 1),
        (4, "n n n", 0),
        # shared-evidence doc: one p and one n occurrence each — token
        # evidence nearly cancels, prior ln(4/2) > 0 dominates
        (5, "p n", 1),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, t int")
    out = {r["doc_id"]: r for r in nb_domain_classifier(docs, F.col("t") == 1).collect()}
    assert out[5]["predicted"] == 1


def test_ivf_probe_curve_invariants(spark):
    """The probe-coverage curve is a valid CDF of the exact top-k hit
    ranks: cum_hits monotone, every row shares one total, and the
    deepest observed rank covers ALL pairs (every true neighbour's
    cell has some rank, so the curve ends at recall 1.0)."""
    from pyspark.sql import functions as F

    from gnocchi_spark.operators.similarity import ivf_probe_curve

    corpus = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(7)),
            lambda d: (
                F.pmod(F.xxhash64(F.col("id"), d, F.lit("v")), F.lit(1000))
                / 500.0
                - 1.0
            ).cast("float"),
        ).alias("embedding"),
    )
    centroids = corpus.limit(6).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid"),
    )
    sample = corpus.where(F.col("vec_id") % 7 == 1)
    rows = (
        ivf_probe_curve(corpus, sample, centroids, k=3)
        .orderBy("probe_rank")
        .collect()
    )
    assert rows, "curve must not be empty"
    totals = {r["total_pairs"] for r in rows}
    assert len(totals) == 1
    cums = [r["cum_hits"] for r in rows]
    assert cums == sorted(cums)
    assert sum(r["n_hits"] for r in rows) == rows[-1]["cum_hits"]
    assert rows[-1]["cum_hits"] == rows[-1]["total_pairs"]
    assert rows[-1]["recall"] == 1.0


def test_nb_domain_classifier_memo_keys_on_predicate(spark, tmp_path):
    """Two NB trainings over the SAME parquet input but different
    target predicates must not share the memoized labeled feature
    table (the input-file fingerprint is identical; only the label
    predicate distinguishes them)."""
    from pyspark.sql import functions as F

    from gnocchi_spark.operators.pipeline import nb_domain_classifier

    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, "alpha beta" if i % 2 == 0 else "gamma delta", i % 2)
         for i in range(20)],
        "doc_id long, text string, t int",
    ).write.parquet(p)
    docs = spark.read.parquet(p)
    a = {r["doc_id"]: r["label"]
         for r in nb_domain_classifier(docs, F.col("t") == 0).collect()}
    b = {r["doc_id"]: r["label"]
         for r in nb_domain_classifier(docs, F.col("t") == 1).collect()}
    # opposite predicates -> opposite labels on every doc; a shared
    # memo entry would make them identical instead
    assert all(a[d] == -b[d] for d in a)


def test_nb_domain_classifier_memo_keys_on_text_col(spark, tmp_path):
    """Two NB trainings over the SAME parquet input and predicate but
    different TEXT columns must not share the memoized feature table
    (r10 ADVICE: the memo key carried n_buckets + predicate only, so
    the column choice was invisible to it)."""
    from pyspark.sql import functions as F

    from gnocchi_spark.operators.pipeline import nb_domain_classifier

    p = str(tmp_path / "docs2.parquet")
    # t1 separates the classes perfectly; t2 is one shared token, so
    # its margins differ from t1's on every doc
    spark.createDataFrame(
        [(i, "alpha beta" if i % 2 == 0 else "gamma delta", "same tok", i % 2)
         for i in range(20)],
        "doc_id long, t1 string, t2 string, t int",
    ).write.parquet(p)
    docs = spark.read.parquet(p)
    a = {r["doc_id"]: r["score"]
         for r in nb_domain_classifier(
             docs, F.col("t") == 0, text_col="t1").collect()}
    b = {r["doc_id"]: r["score"]
         for r in nb_domain_classifier(
             docs, F.col("t") == 0, text_col="t2").collect()}
    # a stale shared feature table would replay t1's scores for t2
    assert any(a[d] != b[d] for d in a)
    # t2 carries no class evidence: every margin collapses to the prior
    assert len({b[d] for d in b}) == 1


def test_nb_threshold_curve_invariants(spark):
    """Confusion-matrix identities on the operating-point curve: at
    every threshold tp+fn = P and fp+tn = N; tp/fp are non-decreasing
    as the threshold drops; the loosest threshold admits everything
    (recall 1.0); and a hand-computable two-bin case is exact."""
    from gnocchi_spark.operators.pipeline import nb_threshold_curve

    scored = spark.createDataFrame(
        [(1, 100), (1, 90), (1, 10), (-1, 95), (-1, 20), (-1, 15)],
        "label int, score long",
    )
    rows = sorted(
        nb_threshold_curve(scored, n_bins=4).collect(),
        key=lambda r: -r["bin"],
    )
    P = sum(1 for _ in range(3))
    for r in rows:
        assert r["tp"] + r["fn"] == 3
        assert r["fp"] + r["tn"] == 3
    tps = [r["tp"] for r in rows]
    fps = [r["fp"] for r in rows]
    assert tps == sorted(tps) and fps == sorted(fps)
    last = rows[-1]
    assert last["tp"] == 3 and last["fp"] == 3 and last["recall"] == 1.0
    # bins over [10, 100], width 91, 4 bins: scores 100,95,90 -> bin 3,
    # 10,15,20 -> bin 0; top bin: tp=2 (100,90), fp=1 (95)
    top = rows[0]
    assert (top["tp"], top["fp"]) == (2, 1)
    assert top["threshold"] == 90
    assert abs(top["precision"] - round(2 / 3, 6)) < 1e-9
    assert abs(top["f1"] - round(4 / (2 + 1 + 3), 6)) < 1e-9


def test_repeated_span_apply_keep_first_cut(spark):
    """ExactSubstr apply semantics: the corpus-first occurrence of a
    repeated window survives, every later occurrence's tokens are cut,
    and untouched docs rebuild to their normalized text verbatim."""
    from gnocchi_spark.operators.pipeline import repeated_span_apply

    shared = "q w e r t y u i o p"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (1, "a1 b1 " + shared + " c1 d1"),  # owner (lowest doc_id)
            (2, shared + " e2 f2 g2"),          # later occurrence: cut
            (3, "u1 u2 u3 u4 u5"),              # no repeats: untouched
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repeated_span_apply(docs, n=4).collect()}
    assert out[1]["n_removed"] == 0
    assert out[1]["text_clean"] == "a1 b1 " + shared + " c1 d1"
    # doc 2 loses exactly the 10 shared tokens, keeps its tail
    assert out[2]["n_removed"] == 10
    assert out[2]["text_clean"] == "e2 f2 g2"
    assert out[3]["n_removed"] == 0
    assert out[3]["text_clean"] == "u1 u2 u3 u4 u5"


def test_repeated_span_apply_owner_survives_64bit_doc_ids(spark):
    """The keep-first owner must be the true corpus-first (doc_id, p)
    for the FULL 64-bit doc-id range (r10 fix; VERDICT r09 wrong #1):
    the r09 packed key ``doc_id * 2^20 + p`` wrapped for hashed ids
    >= 2^43 — ``(2^43 - 1) * 2^20`` is a huge positive while
    ``(2^62 + 5) * 2^20`` wraps to a SMALL positive, so the packed min
    handed ownership to the larger doc_id.  The struct min is
    lexicographic and overflow-free."""
    from gnocchi_spark.operators.pipeline import repeated_span_apply

    owner_id = (1 << 43) - 1        # packed key ~2^63: near-max positive
    later_id = (1 << 62) + 5        # packed key wraps to ~5 * 2^20
    shared = "q w e r t y u i o p"  # 10 tokens
    docs = spark.createDataFrame(
        [
            (owner_id, shared + " a1 b1"),  # corpus-first: survives
            (later_id, "e2 " + shared),     # later occurrence: cut
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repeated_span_apply(docs, n=4).collect()}
    assert out[owner_id]["n_removed"] == 0
    assert out[owner_id]["text_clean"] == shared + " a1 b1"
    assert out[later_id]["n_removed"] == 10
    assert out[later_id]["text_clean"] == "e2"


def test_dedup_threshold_curve_invariants(spark, tmp_path):
    """The jaccard-threshold curve's cumulative equals the exact
    'jaccard >= threshold' pair count at every reported threshold, and
    the loosest threshold admits every intersecting candidate."""
    from gnocchi_spark.operators.dedup import minhash_near_duplicates
    from gnocchi_spark.queries import QUERIES

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again"),
        (2, "the quick brown fox jumps over the lazy dog again"),
        (3, "the quick brown fox jumps over a sleepy dog today"),
        (4, "completely different content with no shared shingles"),
        (5, "another unrelated document about spark and streams"),
    ]
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(p)
    curve = sorted(
        QUERIES["dedup_threshold_curve"](spark, str(tmp_path)).collect(),
        key=lambda r: -r["bin"],
    )
    assert curve, "identical docs must produce at least one pair"
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_near_duplicates(
            spark.read.parquet(p),
            num_hashes=16,
            band_size=4,
            threshold=0.0,
            cache_key=None,
        ).collect()
        if r["jaccard"] > 0
    }
    for r in curve:
        t = r["threshold"]
        exact = sum(
            1 for j in pairs.values() if round(j * 1e6 + 0.5) // 1 >= 0
            and (int(j * 1e6 + 0.5) / 1e6) >= t
        )
        assert r["cum_pairs"] == exact, (t, r, pairs)
    # the exact-duplicate pair (docs 1, 2) sits in the top bin at j = 1
    top = curve[0]
    assert top["bin"] == 19 and top["threshold"] == 1.0
    assert curve[-1]["cum_pairs"] == len(pairs)
