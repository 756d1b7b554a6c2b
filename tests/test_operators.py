"""Operator unit/property tests beyond the oracle gate: LSH recall,
exact-dedup on planted duplicates, as-of edge cases, partition-count
invariance (the algebraic property the reference's reduction tree
relies on — SURVEY.md §5 property tests), multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lambda_refarch_mapreduce_spark.operators import dedup, multimodal, similarity
from lambda_refarch_mapreduce_spark.operators.relational import asof_join
from lambda_refarch_mapreduce_spark.sources.readers import load_table
from tests.conftest import SF_CORRECT, SF_SMOKE


def test_partition_count_invariance(spark):
    """Merge associativity/commutativity: the reference's recursive
    tree (reducerCoordinator.py) requires sums independent of merge
    order; in Spark, the same result must come out at any partition
    count (float tolerance)."""
    df = load_table(spark, SF_CORRECT, "events")
    results = []
    for n in (1, 7, 32):
        r = {
            row.user_id: row.total
            for row in df.repartition(n)
            .groupBy("user_id")
            .agg(F.sum("value").alias("total"))
            .collect()
        }
        results.append(r)
    for r in results[1:]:
        assert r.keys() == results[0].keys()
        for k, v in r.items():
            assert v == pytest.approx(results[0][k], rel=1e-9)


def test_exact_duplicates_on_planted_dups(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(10)
    dup = docs.withColumn("doc_id", F.col("doc_id") + 100000)
    both = docs.unionByName(dup)
    out = dedup.exact_duplicates(both, "doc_id", "text").collect()
    assert all(r.n_copies == 2 for r in out)
    # survivor is always the min id (the original)
    assert all(r.keep_id < 100000 for r in out)


def test_minhash_lsh_finds_planted_near_dups(spark):
    """A doc with one word changed out of ~100 must be caught."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    mutated = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzzmutation")).alias("text"),
    )
    both = docs.select("doc_id", "text").unionByName(mutated)
    pairs = dedup.minhash_lsh_pairs(both, "doc_id", "text", threshold=0.5).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    for i in [r.doc_id for r in docs.select("doc_id").collect()]:
        assert (i, i + 100000) in found, f"planted near-dup {i} missed"


def test_simhash_stable_under_token_reorder(spark):
    """SimHash is a bag-of-tokens signature: exact reversal of token
    order must not change it."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(10).select("doc_id", "text")
    reordered = docs.select(
        "doc_id",
        F.array_join(F.reverse(F.split(F.col("text"), r"\s+")), " ").alias("text"),
    )
    a = {r.id: r.simhash for r in dedup.simhash(docs, "doc_id", "text").collect()}
    b = {r.id: r.simhash for r in dedup.simhash(reordered, "doc_id", "text").collect()}
    assert a == b


def test_simhash_arrow_kernel_matches_codegen(spark):
    """Focused guard for the r14 kernel change (VERDICT r13 next-round
    #6): the arrow popcount kernel must produce BIT-IDENTICAL
    fingerprints to the codegen form — including the edges the
    codegen semantics define: NULL text packs 0 (NULL comparisons
    fall through every when/otherwise), empty/short text packs all
    ``bits`` ones (0 >= 0 majority on every bit), and docs shorter
    than one token behave like empty."""
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    edges = spark.createDataFrame(
        [(100001, None), (100002, ""), (100003, "   "), (100004, "one")],
        "doc_id bigint, text string",
    )
    both = docs.unionByName(edges)
    a = {
        r.id: r.simhash
        for r in dedup.simhash(both, "doc_id", "text", kernel="codegen").collect()
    }
    b = {
        r.id: r.simhash
        for r in dedup.simhash(both, "doc_id", "text", kernel="arrow").collect()
    }
    assert a == b and len(a) == docs.count() + 4
    assert b[100001] == 0  # NULL text
    assert b[100002] == (1 << 60) - 1  # empty: all bits majority at n=0


def test_contamination_overlap_planted_leak(spark):
    """A training doc that contains a benchmark doc verbatim must be
    flagged; docs sharing nothing with the benchmark must score 0."""
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], ["bid", "btext"]
    )
    docs = spark.createDataFrame(
        [
            # full verbatim inclusion of the benchmark text
            (10, "intro words alpha beta gamma delta epsilon zeta outro"),
            # disjoint vocabulary — zero overlap
            (11, "one two three four five six seven eight"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.id: r
        for r in dedup.contamination_overlap(
            docs, bench, "doc_id", "text", "bid", "btext", n=3, threshold=0.05
        ).collect()
    }
    assert out[10].n_overlap == 4  # the 4 trigrams inside the quoted span
    assert out[10].is_contaminated
    assert out[11].n_overlap == 0 and out[11].contamination == 0.0
    assert not out[11].is_contaminated


def test_contamination_overlap_broadcasts_benchmark(spark):
    """The benchmark side must broadcast: the corpus is never shuffled
    for the overlap join (scale posture for 100 TB corpora)."""
    docs = load_table(spark, SF_SMOKE, "documents")
    bench = docs.filter(F.col("doc_id") % 10 == 0)
    out = dedup.contamination_overlap(
        docs, bench, "doc_id", "text", "doc_id", "text"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quality_quantile_filter_modes_agree(spark):
    """The approx sketch (scale default) must keep nearly the same set
    as the exact percentile, and both trim ~q of the corpus."""
    from lambda_refarch_mapreduce_spark.operators import text as text_ops

    docs = load_table(spark, SF_CORRECT, "documents")
    n = docs.count()
    exact = text_ops.quality_quantile_filter(
        docs, "doc_id", "text", q=0.1, exact=True
    )
    approx = text_ops.quality_quantile_filter(
        docs, "doc_id", "text", q=0.1, exact=False
    )
    ne, na = exact.count(), approx.count()
    assert 0.85 * n <= ne <= 0.92 * n  # ~90% survive
    # sketch cutoff within one band of the exact survivor count
    assert abs(na - ne) <= 0.03 * n
    # every row carries the corpus-wide threshold and respects it
    bad = exact.filter(F.col("quality") < F.col("q_threshold")).count()
    assert bad == 0


def test_mixture_token_sample_budget_and_nesting(spark):
    """Kept tokens per domain approximate the target share; unlisted
    domains vanish; a smaller budget's sample nests in a larger one."""
    from lambda_refarch_mapreduce_spark.operators import text as text_ops

    docs = load_table(spark, SF_CORRECT, "documents")
    weights = {"en": 0.5, "de": 0.5}
    big = text_ops.mixture_token_sample(docs, "doc_id", "text", "lang", weights, 6000)
    small = text_ops.mixture_token_sample(docs, "doc_id", "text", "lang", weights, 3000)
    got = {r.domain: r.tok for r in big.groupBy("domain").agg(F.sum("n_tokens").alias("tok")).collect()}
    assert set(got) <= {"en", "de"}  # zh/es/fr dropped
    for d in got:
        # expected 3000 tokens per domain; hash sampling variance is
        # real at ~70-200 docs per domain, so allow a wide band
        assert 0.5 * 3000 <= got[d] <= 1.6 * 3000, (d, got[d])
    big_ids = {r.id for r in big.select("id").collect()}
    small_ids = {r.id for r in small.select("id").collect()}
    assert small_ids <= big_ids  # nested samples


def test_dedup_against_index_planted(spark):
    """A batch doc byte-identical to a corpus doc → exact dup; a
    one-word mutation → near dup (band collision); a fresh doc →
    keep."""
    corpus = load_table(spark, SF_SMOKE, "documents").limit(20).select("doc_id", "text")
    first = corpus.orderBy("doc_id").limit(1).collect()[0]
    batch = spark.createDataFrame(
        [
            (100001, first.text),  # exact copy
            (100002, first.text + " zzzmutation"),  # near dup
            (100003, "totally disjoint vocabulary nothing shared here at all"),
        ],
        ["doc_id", "text"],
    )
    dig, bandtab = dedup.build_dedup_index(corpus, "doc_id", "text")
    out = {
        r.id: r
        for r in dedup.dedup_against_index(
            batch, dig, bandtab, "doc_id", "text"
        ).collect()
    }
    assert out[100001].is_exact_dup and not out[100001].keep
    assert out[100002].is_near_dup and not out[100002].is_exact_dup
    assert out[100003].keep and not out[100003].is_near_dup


def test_dedup_against_index_streams_index_map_side(spark):
    """Scale posture: every join in the incremental probe broadcasts
    the (small) batch side — the corpus index must never be the
    shuffled side of a SortMergeJoin."""
    corpus = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    batch = corpus.limit(5)
    dig, bandtab = dedup.build_dedup_index(corpus, "doc_id", "text")
    out = dedup.dedup_against_index(batch, dig, bandtab, "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4  # 2 probes + 2 flag joins


def test_lsh_topk_recall_vs_brute_force(spark):
    """Approximate ANN must keep reasonable recall@5 against the
    exact baseline on the test embeddings."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    q = emb.filter(F.col("vec_id") < 30)
    exact = similarity.brute_force_topk(emb, q, k=5).collect()
    approx = similarity.lsh_topk(emb, q, k=5, n_planes=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 4 hyperplanes → 16 buckets over 500 vecs; recall is approximate
    # by design — this guards against the bucketing being broken, not
    # against LSH being LSH.
    assert recall > 0.3, f"recall {recall}"


def test_lsh_topk_multi_probe_monotone_recall(spark):
    """Probe sets are nested in multi_probe (all buckets within j bit
    flips), so recall must be monotonically non-decreasing — and 2-bit
    probing must genuinely beat 1-bit on this corpus (measured 0.12 /
    0.52 / 0.85 at multi_probe = 0/1/2; deterministic hyperplanes)."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    q = emb.filter(F.col("vec_id") < 30)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb, q, k=5).collect()
    }
    recalls = []
    for mp in (0, 1, 2):
        approx = {
            (r.query_id, r.neighbor_id)
            for r in similarity.lsh_topk(
                emb, q, k=5, n_planes=4, multi_probe=mp
            ).collect()
        }
        recalls.append(len(exact & approx) / len(exact))
    assert recalls == sorted(recalls), f"recall not monotone: {recalls}"
    assert recalls[2] > recalls[1] > recalls[0], f"probing not additive: {recalls}"
    assert recalls[2] >= 0.8, f"2-bit probe recall {recalls[2]}"
    with pytest.raises(ValueError):
        similarity.lsh_topk(emb, q, n_planes=4, multi_probe=5)


def test_pq_encode_properties(spark):
    """Codes are m values in [0, n_codes); with UNREFINED codebooks
    the seed vectors (lowest 16 ids) quantize to themselves with zero
    error; one Lloyd pass must not increase total quantization error."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    seeded = similarity.pq_codebooks(
        emb, "vec_id", "embedding", m=8, n_codes=16, refine_iters=0
    )
    coded = similarity.pq_encode(
        emb, "vec_id", "embedding", m=8, n_codes=16, codebooks=seeded
    )
    rows = coded.collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)
        assert r.recon_err >= 0.0
    seed_ids = [r.vec_id for r in emb.select("vec_id").orderBy("vec_id").limit(16).collect()]
    by_id = {r.vec_id: r for r in rows}
    for i, vid in enumerate(seed_ids):
        assert by_id[vid].recon_err == 0.0
        assert by_id[vid].codes == [i] * 8

    # Lloyd refinement is a descent step: total error must not grow
    err0 = sum(r.recon_err for r in rows)
    err1 = sum(
        r.recon_err
        for r in similarity.pq_encode(
            emb, "vec_id", "embedding", m=8, n_codes=16
        ).collect()
    )
    assert err1 <= err0 + 1e-6, (err0, err1)

    with pytest.raises(ValueError):
        similarity.pq_codebooks(emb, "vec_id", "embedding", m=7)


def test_pq_topk_adc_recall_vs_brute_force(spark):
    """ADC distances are approximations, but the quantizer must stay
    informative: recall@5 against the exact tier above a coarse floor,
    ranks contiguous from 1 with ascending distances."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    q = emb.filter(F.col("vec_id") < 30)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb, q, k=5).collect()
    }
    approx = similarity.pq_topk(emb, q, k=5, m=8, n_codes=16).collect()
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact & approx_set) / len(exact)
    # 16 sample-seeded codes x 8 subspaces on 500 vecs — guards that
    # ADC is computing real distances, not that PQ beats brute force
    assert recall > 0.2, f"recall {recall}"
    per_q: dict[int, list] = {}
    for r in approx:
        per_q.setdefault(r.query_id, []).append(r)
    for rows in per_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        dists = [r.dist2 for r in rows]
        assert dists == sorted(dists)


def test_ivfadc_topk_prunes_and_ranks(spark):
    """IVFADC result is a subset of what full-scan ADC would score
    (list pruning), ranks contiguous, distances ascending, and recall
    vs the exact tier stays above the coarse floor."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    q = emb.filter(F.col("vec_id") < 30)
    rows = similarity.ivfadc_topk(emb, q, k=5, n_centroids=16, n_probe=4).collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) == {r.vec_id for r in q.select("vec_id").collect()}
    for qrows in per_q.values():
        qrows.sort(key=lambda r: r.rank)
        assert [r.rank for r in qrows] == list(range(1, len(qrows) + 1))
        dists = [r.dist2 for r in qrows]
        assert dists == sorted(dists)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb, q, k=5).collect()
    }
    got = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(exact & got) / len(exact)
    assert recall > 0.15, f"recall {recall}"  # PQ error + IVF pruning stack


def test_lsh_bucket_is_deterministic(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = {r.vec_id: r.bucket for r in similarity.lsh_bucket(emb).collect()}
    b = {r.vec_id: r.bucket for r in similarity.lsh_bucket(emb).collect()}
    assert a == b


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-10"), (1, "2024-01-20"), (2, "2024-01-05")],
        "k int, t string",
    )
    right = spark.createDataFrame(
        [(1, "2024-01-01", 10.0), (1, "2024-01-15", 20.0), (2, "2024-02-01", 99.0)],
        "k int, t string, v double",
    )
    out = asof_join(
        left, right, on_left="k", left_time="t", right_time="t", right_values=["v"]
    )
    got = {(r.k, r.t): r.asof_v for r in out.collect()}
    assert got == {
        (1, "2024-01-10"): 10.0,  # latest right <= t
        (1, "2024-01-20"): 20.0,
        (2, "2024-01-05"): None,  # right row is in the future
    }


def test_asof_join_forward(spark):
    left = spark.createDataFrame([(1, "2024-01-10")], "k int, t string")
    right = spark.createDataFrame(
        [(1, "2024-01-05", 1.0), (1, "2024-01-12", 2.0)], "k int, t string, v double"
    )
    out = asof_join(
        left,
        right,
        on_left="k",
        left_time="t",
        right_time="t",
        right_values=["v"],
        direction="forward",
    )
    assert out.collect()[0].asof_v == 2.0  # earliest right >= t


def test_multimodal_feature_extraction(spark):
    media = multimodal.attach_media(
        load_table(spark, SF_SMOKE, "documents"), "doc_id", "text"
    )
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == media.count()
    for r in feats[:10]:
        assert 1 <= r.fake_width <= 1920
        assert 1 <= r.fake_height <= 1080
        assert len(r.content_sha16) == 16


def test_multimodal_frame_sampling_fanout(spark):
    media = multimodal.attach_media(
        load_table(spark, SF_SMOKE, "documents").limit(5), "doc_id", "text"
    )
    frames = multimodal.sample_frames(media, every_n_bytes=32, max_frames=4)
    rows = frames.collect()
    assert len(rows) > 5  # 1 → n fan-out happened
    per_media = {}
    for r in rows:
        per_media.setdefault(r.media_id, []).append(r.frame_idx)
    for idxs in per_media.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense frame idx


def test_decode_image_is_explicit_stub():
    # compressed formats still need PIL → explicit NotImplementedError
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG fake")


def test_decode_image_ppm_pgm_real_pixels():
    img = multimodal.decode_image(b"P6\n# c\n4 2\n255\n" + bytes(range(24)))
    assert img.shape == (2, 4, 3)
    assert img.flatten().tolist() == list(range(24))
    gray = multimodal.decode_image(b"P5 3 2 255 " + bytes([10, 20, 30, 40, 50, 60]))
    assert gray.shape == (2, 3)
    assert gray.flatten().tolist() == [10, 20, 30, 40, 50, 60]
    with pytest.raises(ValueError):
        multimodal.decode_image(b"P6\n2 2\n65535\n" + bytes(24))  # 16-bit


def test_decode_image_bmp_bottom_up_bgr():
    import struct

    # 2x2 24bpp bottom-up: stride padded 6→8; storage is BGR
    pixdata = (
        bytes([255, 0, 0, 0, 255, 0, 0, 0])  # bottom row: blue, green + pad
        + bytes([0, 0, 255, 255, 255, 255, 0, 0])  # top row: red, white + pad
    )
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixdata), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixdata), 2835, 2835, 0, 0
    )
    img = multimodal.decode_image(header + dib + pixdata)
    assert img.shape == (2, 2, 3)
    assert img[0, 0].tolist() == [255, 0, 0]  # top-left red (flipped, RGB)
    assert img[0, 1].tolist() == [255, 255, 255]
    assert img[1, 0].tolist() == [0, 0, 255]
    assert img[1, 1].tolist() == [0, 255, 0]


def test_decode_audio_wav_pcm16():
    import struct

    import numpy as np

    samples = np.arange(-16, 16, dtype="<i2")
    data = samples.tobytes()
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    s, rate = multimodal.decode_audio(wav)
    assert rate == 8000 and s.shape == (32, 1)
    assert s.flatten().tolist() == samples.tolist()
    # stereo, with an odd-sized LIST chunk that must be skipped + padded
    d2 = np.array([1, -1, 100, -100], dtype="<i2").tobytes()
    wav2 = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"LIST" + struct.pack("<I", 3) + b"abc\x00"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
        + b"data" + struct.pack("<I", len(d2)) + d2
    )
    s2, r2 = multimodal.decode_audio(wav2)
    assert r2 == 44100 and s2.tolist() == [[1, -1], [100, -100]]
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"ID3 compressed mp3")
    with pytest.raises(ValueError):
        # float32 WAV (format 3) is not PCM16
        multimodal.decode_audio(
            b"RIFF" + struct.pack("<I", 0) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
            + b"data" + struct.pack("<I", 0)
        )


def test_extract_audio_features_real_decode(spark):
    import struct

    import numpy as np

    samples = np.array([0, 100, -100, 32767], dtype="<i2")
    data = samples.tobytes()
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    rows = [
        (1, "audio", wav, "wav", len(wav)),
        (2, "audio", b"OggS not decodable", "ogg", 18),  # dropped
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.extract_audio_features(media).collect()}
    assert set(out) == {1}
    r = out[1]
    x = samples.astype(np.float64)
    assert (r.sample_rate, r.n_channels, r.n_frames) == (16000, 1, 4)
    assert r.duration_s == round(4 / 16000, 6)
    assert r.rms == round(float(np.sqrt((x * x).mean())), 6)
    assert r.peak == 32767

    # the int16 FULL-SCALE negative sample: np.abs on the narrow dtype
    # wraps abs(-32768) back to -32768 and the max() skips the true
    # peak (caught by the r12 sf0.1 gate sweep) — the kernel must abs
    # the widened copy and report 32768
    s3 = np.array([0, 5, -32768, 7], dtype="<i2")
    d3 = s3.tobytes()
    wav3 = (
        b"RIFF" + struct.pack("<I", 36 + len(d3)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
        + b"data" + struct.pack("<I", len(d3)) + d3
    )
    media3 = spark.createDataFrame(
        [(3, "audio", wav3, "wav", len(wav3))],
        schema=multimodal.MEDIA_SCHEMA,
    )
    r3 = multimodal.extract_audio_features(media3).collect()[0]
    assert r3.peak == 32768
    x3 = s3.astype(np.float64)
    assert r3.rms == round(float(np.sqrt((x3 * x3).mean())), 6)


def test_extract_image_features_real_decode(spark):
    import numpy as np

    raster = bytes(range(48))
    rows = [
        (1, "image", b"P6\n4 4\n255\n" + raster, "ppm", 59),
        (2, "image", b"\x89PNG not decodable", "png", 18),  # dropped
        (3, "image", None, "ppm", None),  # dropped
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    out = {r.media_id: r for r in multimodal.extract_image_features(media).collect()}
    assert set(out) == {1}
    r = out[1]
    arr = np.arange(48, dtype=np.uint8)
    assert (r.width, r.height, r.channels) == (4, 4, 3)
    assert r.mean_pixel == round(float(arr.mean()), 6)
    assert (r.min_pixel, r.max_pixel) == (0, 47)


def test_ivf_topk_recall_vs_brute_force(spark):
    """IVF probe of 4/16 lists must retain solid recall@5 on the test
    embeddings, and every returned neighbor's cosine must be exact.
    With the default one k-means refinement pass the measured recall is
    0.74 (0.72 unrefined); everything is deterministic, so pin well
    above the old 0.3 floor."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    q = emb.filter(F.col("vec_id") < 30)
    exact = similarity.brute_force_topk(emb, q, k=5).collect()
    approx = similarity.ivf_topk(emb, q, k=5, n_centroids=16, n_probe=4).collect()
    exact_scores = {(r.query_id, r.neighbor_id): r.cosine for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(set(exact_scores) & approx_set) / len(exact_scores)
    assert recall >= 0.7, f"recall {recall}"
    # refinement must not hurt: refined recall >= unrefined recall
    unrefined = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(
            emb, q, k=5, n_centroids=16, n_probe=4, refine_iters=0
        ).collect()
    }
    recall0 = len(set(exact_scores) & unrefined) / len(exact_scores)
    assert recall >= recall0, f"refinement regressed recall: {recall0} -> {recall}"
    # scores for true positives are exact, not approximated
    for r in approx:
        key = (r.query_id, r.neighbor_id)
        if key in exact_scores:
            assert abs(r.cosine - exact_scores[key]) < 1e-9


def test_ivf_centroids_deterministic(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = similarity.ivf_centroids(emb, n_centroids=8)
    b = similarity.ivf_centroids(emb, n_centroids=8)
    assert a == b and len(a) == 8


def test_dedup_operators_on_empty_and_short_docs(spark):
    """Edge inputs: empty corpus and docs shorter than the shingle
    width must flow through every dedup tier without errors."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert dedup.minhash_lsh_pairs(empty, "doc_id", "text").count() == 0
    assert dedup.ngram_jaccard_pairs(empty, "doc_id", "text").count() == 0
    assert dedup.exact_duplicates(empty, "doc_id", "text").count() == 0

    short = spark.createDataFrame(
        [(1, "a"), (2, "a b"), (3, ""), (4, "x y z w")],
        "doc_id long, text string",
    )
    # docs with < n tokens produce no shingles -> no signature rows;
    # must not crash (sequence(1,0) guard in word_ngrams)
    assert dedup.minhash_lsh_pairs(short, "doc_id", "text", n=3).count() == 0
    sim = dedup.simhash(short, "doc_id", "text").collect()
    assert len(sim) == 4  # simhash defined for every doc, even empty


def test_similarity_empty_queries(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    none = emb.filter(F.col("vec_id") < 0)
    assert similarity.brute_force_topk(emb, none, k=3).count() == 0
    assert similarity.ivf_topk(emb, none, k=3, n_centroids=4, n_probe=2).count() == 0


def test_blocked_cosine_pairs_recall_and_plan(spark):
    """The scale path for embedding near-dup: LSH-bucket blocking turns
    the pair join into an equi-join (no cartesian in the plan) while
    keeping recall against the exact all-pairs tier."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.cosine_pairs(emb, threshold=0.4).collect()
    }
    blocked_df = similarity.lsh_blocked_pairs(
        emb, threshold=0.4, n_planes=3, bands=6
    )
    plan = blocked_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    blocked = {(r.id_a, r.id_b) for r in blocked_df.collect()}
    assert blocked <= exact  # blocking can only drop pairs, never invent
    recall = len(blocked) / max(len(exact), 1)
    assert recall > 0.5, f"recall {recall} ({len(blocked)}/{len(exact)})"


def test_auto_planes_integer_rule_boundaries():
    """auto_planes is the integer-exact corpus-size rule the oracle
    replays in SQL (round 13 — the sf1 spot gate found fixed 3-bit
    banding emits O(n^2/8) candidate pairs): smallest r in [3, 16]
    with 2^r * 8 >= n. Boundary sweep including exact powers of two,
    where a float log2 derivation could round differently per engine."""
    from lambda_refarch_mapreduce_spark.operators.similarity import auto_planes

    assert auto_planes(0) == 3
    assert auto_planes(1) == 3
    assert auto_planes(64) == 3  # 2^3 * 8 == 64: boundary stays at 3
    assert auto_planes(65) == 4
    assert auto_planes(500) == 6  # sf0.01 corpus
    assert auto_planes(2000) == 8  # sf0.1 corpus
    assert auto_planes(2048) == 8  # exact power: 2^8 * 8 == 2048
    assert auto_planes(2049) == 9
    assert auto_planes(20000) == 12  # sf1 spot corpus
    assert auto_planes(10**12) == 16  # clamped at the literal table


def test_lsh_blocked_auto_equals_explicit(spark):
    """n_planes="auto" (the registered entry's configuration) must be
    exactly the explicit plane count auto_planes derives for the
    corpus — same candidate set, same verified pairs."""
    from lambda_refarch_mapreduce_spark.operators.similarity import auto_planes

    emb = load_table(spark, SF_CORRECT, "embeddings")
    n = emb.count()
    r = auto_planes(n)
    assert (n, r) == (500, 6)
    auto_pairs = {
        (x.id_a, x.id_b, x.cosine)
        for x in similarity.lsh_blocked_pairs(emb, threshold=0.4).collect()
    }
    explicit = {
        (x.id_a, x.id_b, x.cosine)
        for x in similarity.lsh_blocked_pairs(
            emb, threshold=0.4, n_planes=r
        ).collect()
    }
    assert auto_pairs == explicit
    assert auto_pairs  # non-degenerate: the sf0.01 corpus has near-dups


def test_grid_cosine_pairs_exact_no_bnlj(spark):
    """The unblocked exact all-pairs must execute as a grid theta-join
    (equi-join on chunk-pair), never a BroadcastNestedLoopJoin — the
    corpus is never broadcast, task memory is bounded by 2 chunks."""
    emb = load_table(spark, SF_CORRECT, "embeddings")
    df = similarity.cosine_pairs(emb, threshold=0.4, grid_blocks=7)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    got = {(r.id_a, r.id_b) for r in df.collect()}
    # independent exact reference via a tiny driver-side computation
    import itertools
    import math

    rows = emb.select("vec_id", "embedding").collect()
    vecs = {r.vec_id: r.embedding for r in rows}

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    want = {
        (i, j)
        for i, j in itertools.combinations(sorted(vecs), 2)
        if cos(vecs[i], vecs[j]) >= 0.4
    }
    assert got == want
    # each unordered pair lands under exactly one grid cell: no dupes
    assert df.count() == df.dropDuplicates(["id_a", "id_b"]).count()


def test_connected_components_chain_and_islands(spark):
    """Min-label propagation must cross a long chain (multiple
    iterations: label 1 walks the diameter) and keep islands apart."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (10, 11), (12, 11)],
        "id_a bigint, id_b bigint",
    )
    got = {
        (r.node, r.comp)
        for r in dedup.connected_components(edges).collect()
    }
    want = {(n, 1) for n in range(1, 7)} | {(n, 10) for n in (10, 11, 12)}
    assert got == want


def test_connected_components_empty(spark):
    edges = spark.createDataFrame([], "id_a bigint, id_b bigint")
    assert dedup.connected_components(edges).count() == 0


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    """reliable_checkpoint=True routes every round through
    checkpoint() into the configured reliable store (the cluster
    profile where executor loss must not drop the only copy of the
    labels) and still converges to the same components."""
    ckpt_dir = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt_dir)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a bigint, id_b bigint"
    )
    got = {
        (r.node, r.comp)
        for r in dedup.connected_components(
            edges, reliable_checkpoint=True
        ).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    import os

    # the reliable store was actually written (RDD checkpoint files)
    assert any(os.scandir(ckpt_dir))


def test_hll_sketch_rollup_accuracy(spark):
    """Daily HLL sketches and their union must track exact distinct
    counts within the entry's own ±5% gate (within_tol column), and
    the exact columns must independently match a recomputation."""
    from lambda_refarch_mapreduce_spark.plans.catalog import REGISTRY

    rows = {
        r.day: (r.exact_users, r.within_tol)
        for r in REGISTRY["hll_sketch_rollup_users"].spark(spark, SF_CORRECT).collect()
    }
    ev = load_table(spark, SF_CORRECT, "events")
    import pyspark.sql.functions as F

    exact = {
        r.day: r.n
        for r in ev.groupBy(
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = ev.select("user_id").distinct().count()
    assert set(rows) == set(exact)
    for day, (got_exact, within) in rows.items():
        assert got_exact == exact[day], (day, got_exact, exact[day])
        assert within, f"HLL estimate outside ±5% for {day}"


def test_pack_sequences_two_phase_scan(spark):
    """Packing must equal the sequential concat-and-chunk definition
    while never collapsing to a single-partition global window."""
    from lambda_refarch_mapreduce_spark.operators import text as T

    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate([4, 3, 5, 2, 6, 1])]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = T.pack_sequences(df, "doc_id", "text", budget=10)
    got = {r.doc_id: (r.n_tokens, r.bin_id) for r in out.collect()}
    # offsets: 0,4,7,12,14,20 -> bins 0,0,0,1,1,2
    assert got == {0: (4, 0), 1: (3, 0), 2: (5, 0), 3: (2, 1), 4: (6, 1), 5: (1, 2)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_stratified_sample_nested_and_shuffle_free(spark):
    """Samples at increasing rates must nest (5% ⊂ 25% ⊂ 100%) and the
    predicate must stay a row-local filter — no exchange in the plan."""
    from lambda_refarch_mapreduce_spark.operators.relational import (
        stratified_hash_sample,
    )

    docs = load_table(spark, SF_CORRECT, "documents")
    s5 = stratified_hash_sample(docs, "doc_id", "lang", {"en": 5})
    s25 = stratified_hash_sample(docs, "doc_id", "lang", {"en": 25})
    ids5 = {r.doc_id for r in s5.select("doc_id").collect()}
    ids25 = {r.doc_id for r in s25.select("doc_id").collect()}
    assert ids5 <= ids25
    n_en = docs.filter("lang = 'en'").count()
    n_en25 = s25.filter("lang = 'en'").count()
    assert abs(n_en25 / n_en - 0.25) < 0.15  # hash buckets ≈ uniform
    plan = s25._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_simhash_near_pairs_rejects_unsound_banding(spark):
    """max_hamming > bands-1 voids the pigeonhole guarantee — must
    raise instead of silently missing pairs."""
    docs = spark.createDataFrame([(1, "a b c"), (2, "a b d")], "doc_id long, text string")
    with pytest.raises(ValueError, match="bands"):
        dedup.simhash_near_pairs(docs, "doc_id", "text", bands=4, max_hamming=8)
    # sound combination still works
    dedup.simhash_near_pairs(docs, "doc_id", "text", bands=6, max_hamming=5).count()


def test_simhash_probe_schemes_identical_results(spark):
    """Banding is purely a performance knob: single-band probing,
    auto-sized probing, and the forced Manku block-combination tables
    (n_docs hint far past the single-band bucket space) must all
    return exactly the same near-dup pairs — recall is pigeonhole-
    exact in every scheme and the verify step strips false positives."""
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    fixed = {
        tuple(r)
        for r in dedup.simhash_near_pairs(
            docs, "doc_id", "text", bands=6
        ).collect()
    }
    auto = {
        tuple(r)
        for r in dedup.simhash_near_pairs(docs, "doc_id", "text").collect()
    }
    forced_multi = {
        tuple(r)
        for r in dedup.simhash_near_pairs(
            docs, "doc_id", "text", n_docs=10_000_000
        ).collect()
    }
    assert fixed == auto == forced_multi
    assert len(fixed) > 0


def test_with_salt_range(spark):
    """Salt always lands in [0, n_salts) — pmod, not abs(hash)%n which
    overflows negative at hash == Integer.MIN_VALUE."""
    from lambda_refarch_mapreduce_spark.partitioning import with_salt

    df = load_table(spark, SF_CORRECT, "orders").select("o_orderkey", "o_orderstatus")
    mn, mx = with_salt(df, 16).agg(
        F.min("__salt"), F.max("__salt")
    ).first()
    assert 0 <= mn and mx <= 15


def test_repetition_stats_planted(spark):
    """dup/top fractions on hand-computed docs, incl. empty/short."""
    from lambda_refarch_mapreduce_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            # 4 bigrams: "a b","b a","a b","b c" -> dup=(4-3)/4, top=2/4
            (1, "a b a b c"),
            (2, "x y z"),  # 2 distinct bigrams -> 0.0, 0.5
            (3, "w"),  # no bigrams
            (4, ""),  # empty
            (5, "q q q q"),  # 3 identical bigrams -> 2/3, 1.0
        ],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: (r.n_ngrams, r.dup_ngram_frac, r.top_ngram_frac)
        for r in text_ops.repetition_stats(df, "doc_id", "text", 2).collect()
    }
    assert got[1] == (4, 0.25, 0.5)
    assert got[2] == (2, 0.0, 0.5)
    assert got[3] == (0, 0.0, 0.0)
    assert got[4] == (0, 0.0, 0.0)
    assert got[5] == (3, pytest.approx(0.666667), 1.0)

    kept = {
        r.doc_id
        for r in text_ops.repetition_filter(
            df, "doc_id", "text", 2, max_dup_frac=0.5
        ).collect()
    }
    assert kept == {1, 2, 3, 4}


def test_pii_stats_redaction(spark):
    from lambda_refarch_mapreduce_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@example.co.uk now"),
            (2, "from 10.0.255.1 call +14155550123"),
            (3, "clean text, no pii here"),
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r for r in text_ops.pii_stats(df, "doc_id", "text").collect()}
    assert (got[1].n_emails, got[1].n_ips, got[1].n_phones) == (1, 0, 0)
    assert got[1].redacted == "mail <EMAIL> now"
    assert (got[2].n_emails, got[2].n_ips, got[2].n_phones) == (0, 1, 1)
    assert got[2].redacted == "from <IP> call <PHONE>"
    assert got[3].redacted == got[3].redacted == "clean text, no pii here"


def test_classifier_score_linear_model(spark):
    """Hand-computed sigmoid(mean token weight): known words, unknown
    words (weight 0), empty doc (sits at sigmoid(bias))."""
    from lambda_refarch_mapreduce_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(1, "fast fast"), (2, "slow"), (3, "unseen words only"), (4, "")],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: r
        for r in text_ops.classifier_score(
            df, "doc_id", "text", {"fast": 1.2, "slow": -1.5}
        ).collect()
    }
    assert got[1].score == pytest.approx(0.768525, abs=1e-6) and got[1].label
    assert got[2].score == pytest.approx(0.182426, abs=1e-6) and not got[2].label
    # no vocab hits and the empty doc both sit exactly at sigmoid(0)=0.5
    assert got[3].score == 0.5 and got[3].label
    assert got[4].n_tokens == 0 and got[4].score == 0.5

    # bias shifts every score; threshold moves the label boundary
    biased = {
        r.doc_id: r
        for r in text_ops.classifier_score(
            df, "doc_id", "text", {"fast": 1.2}, bias=-1.2, threshold=0.4
        ).collect()
    }
    assert biased[1].score == 0.5 and biased[1].label  # mean 1.2 cancels bias
    assert biased[3].score == pytest.approx(0.231475, abs=1e-6)
    assert not biased[3].label


def test_c4_line_clean_rules(spark):
    """Each C4 rule on hand-built docs: terminal punctuation, min
    words, bad line word, bad doc substring, min kept lines."""
    from lambda_refarch_mapreduce_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [
            # line 1 keepable; line 2 no terminal punct; line 3 short;
            # line 4 contains the bad word
            (1, "one two three four five.\nno punct here at all\nshort.\nenable javascript to view this page."),
            (2, "lorem ipsum dolor sit amet."),  # doc-level drop
            (3, "braces { everywhere in this doc. }"),  # doc-level drop
            (4, "tiny."),  # no line survives -> dropped
            (5, 'he said "stop right there now!"\nanother good line ends here?'),
        ],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: r
        for r in text_ops.c4_line_clean(df, "doc_id", "text").collect()
    }
    assert set(got) == {1, 5}
    assert got[1].n_lines == 4
    assert got[1].n_lines_kept == 1
    assert got[1].text_clean == "one two three four five."
    # '"' and '?' count as terminal punctuation
    assert got[5].n_lines_kept == 2

    # min_kept_lines promotes the partial doc 1 to a drop
    strict = text_ops.c4_line_clean(df, "doc_id", "text", min_kept_lines=2)
    assert {r.doc_id for r in strict.collect()} == {5}

    # literal separator with a regex metacharacter must not explode
    dotted = spark.createDataFrame(
        [(9, "alpha beta gamma delta five six|seven eight nine ten eleven p")],
        "doc_id int, text string",
    )
    out = text_ops.c4_line_clean(
        dotted, "doc_id", "text", sep="|", require_terminal_punct=False
    ).collect()
    assert out[0].n_lines == 2 and out[0].n_lines_kept == 2


def test_barrier_filter_blocks_pushdown(spark):
    """barrier_filter keeps the survivors predicate ABOVE the staged
    projection (values identical to a plain .filter; the optimized
    plan's Filter tests attributes, not a re-derived expression
    chain) — the c4_line_clean 4x re-evaluation fix."""
    import pyspark.sql.functions as F

    from lambda_refarch_mapreduce_spark.operators.relational import (
        barrier_filter,
    )
    from tests.conftest import formatted_plan

    df = spark.createDataFrame(
        [(i, "a b c " * (i % 5)) for i in range(20)], "id int, text string"
    )
    staged = df.select(
        "id",
        F.filter(
            F.split("text", r"\s+"), lambda t: t != F.lit("")
        ).alias("__toks"),
    )
    cond = F.size("__toks") >= 6
    plain = staged.filter(cond).select("id", F.size("__toks").alias("n"))
    guarded = barrier_filter(staged, cond).select(
        "id", F.size("__toks").alias("n")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, guarded.collect())
    )
    # the plain filter is pushed below the projection: its Condition
    # re-derives the split/filter chain from the scan column. The
    # guarded one references only computed attributes.
    plan = formatted_plan(guarded)
    cond_lines = [
        ln for ln in plan.splitlines() if "Condition :" in ln
    ]
    assert cond_lines, plan
    assert any("__no_pushdown" in ln for ln in cond_lines), plan
    assert all("split(" not in ln for ln in cond_lines), plan
    # output schema carries no trace of the stamp
    assert "__no_pushdown" not in guarded.columns


def test_paragraph_dedup_keep_first(spark):
    from lambda_refarch_mapreduce_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [
            (1, "alpha beta\ncommon line\ngamma"),
            (2, "common line\ndelta"),  # loses "common line" to doc 1
            (3, "common line"),  # fully deduped
            (4, "   \n  "),  # only blank paragraphs
        ],
        "doc_id int, text string",
    )
    got = {r.doc_id: r for r in paragraph_dedup(df, "doc_id", "text").collect()}
    assert got[1].text_deduped == "alpha beta\ncommon line\ngamma"
    assert (got[1].n_paras, got[1].n_kept) == (3, 3)
    assert got[2].text_deduped == "delta"
    assert (got[2].n_paras, got[2].n_kept) == (2, 1)
    assert got[3].text_deduped == ""
    assert (got[3].n_paras, got[3].n_kept) == (1, 0)
    assert (got[4].n_paras, got[4].n_kept, got[4].text_deduped) == (0, 0, "")


def test_paragraph_dedup_sep_literal_vs_split_pattern(spark):
    """sep is a literal (regex metachars must not explode the split)
    and split_pattern lets a regex split coexist with a literal
    rejoin — a regex sep reused as the rejoin string would corrupt
    rebuilt text."""
    from lambda_refarch_mapreduce_spark.operators.dedup import paragraph_dedup

    df = spark.createDataFrame(
        [(1, "a.b\n\nc\nb"), (2, "a.b\nz")], "doc_id int, text string"
    )
    # '.' as literal separator: doc 1 has exactly 2 paragraphs
    lit = {r.doc_id: r for r in paragraph_dedup(df, "doc_id", "text", sep=".").collect()}
    assert lit[1].n_paras == 2
    assert lit[1].text_deduped == "a.b\n\nc\nb"
    # regex split on '\n+', literal rejoin with single '\n'
    rx = {
        r.doc_id: r
        for r in paragraph_dedup(
            df, "doc_id", "text", sep="\n", split_pattern=r"\n+"
        ).collect()
    }
    assert rx[1].text_deduped == "a.b\nc\nb"  # blank run collapsed by split
    assert (rx[2].n_paras, rx[2].n_kept, rx[2].text_deduped) == (2, 1, "z")


def test_quantize_embeddings_roundtrip_bound(spark):
    from lambda_refarch_mapreduce_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id int, embedding array<double>",
    )
    got = {r.vec_id: r for r in quantize_embeddings(df, "vec_id", "embedding").collect()}
    assert got[1].q == [127, -63, 32]  # half-up: floor(-63.5 + 0.5) = -63
    assert got[1].scale == pytest.approx(1.0 / 127, abs=1e-6)
    # dequant error bounded by half a quantization step
    assert got[1].max_abs_err <= got[1].scale / 2 + 1e-9
    assert got[2].q == [0, 0, 0]
    assert (got[2].scale, got[2].max_abs_err) == (0.0, 0.0)


def test_semdedup_drops_planted_near_dups(spark):
    from lambda_refarch_mapreduce_spark.operators.similarity import semdedup

    base = load_table(spark, SF_SMOKE, "embeddings").limit(30)
    # plant an exact duplicate of vec 0 with a high id
    dup = base.filter(F.col("vec_id") == base.agg(F.min("vec_id")).first()[0]).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    df = base.unionByName(dup)
    survivors = {r.vec_id for r in semdedup(df, "vec_id", "embedding", 0.99, 4).collect()}
    planted = dup.first().vec_id
    assert planted not in survivors  # higher-id twin dropped
    assert len(survivors) <= df.count() - 1
    # the low-id original survives
    assert (planted - 100000) in survivors


def test_bm25_ranks_planted_doc_first(spark):
    from lambda_refarch_mapreduce_spark.operators.text import bm25_search, tfidf_terms

    df = spark.createDataFrame(
        [
            (1, "spark query spark query spark window join"),  # dense in query terms
            (2, "spark appears once among many many other other words words here"),
            (3, "nothing relevant at all in this document body"),
            (4, "window window"),  # short doc, one query term
        ],
        "doc_id bigint, text string",
    )
    top = bm25_search(df, "doc_id", "text", ["spark", "query", "window"], topk=3)
    rows = top.collect()
    assert rows[0].doc_id == 1  # densest match wins
    assert {r.doc_id for r in rows} <= {1, 2, 4}  # doc 3 never scores

    tw = tfidf_terms(df, "doc_id", "text")
    got = {(r.doc_id, r.token): r for r in tw.collect()}
    assert got[(1, "spark")].tf == 3
    assert got[(1, "spark")].df == 2  # docs 1 and 2
    # a corpus-unique term outweighs a common one at equal tf
    assert got[(3, "nothing")].tfidf > got[(2, "spark")].tfidf


def test_normalize_truncate_unit_norm(spark):
    from lambda_refarch_mapreduce_spark.operators.similarity import (
        normalize_embeddings,
    )

    df = spark.createDataFrame(
        [(1, [3.0, 4.0, 100.0, 100.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id int, embedding array<double>",
    )
    got = {
        r.vec_id: r
        for r in normalize_embeddings(df, "vec_id", "embedding", 2).collect()
    }
    assert got[1].norm == pytest.approx(5.0)  # truncation BEFORE norm
    assert got[1].unit == [pytest.approx(0.6), pytest.approx(0.8)]
    assert got[2].norm == 0.0 and got[2].unit == [0.0, 0.0]


def test_with_salt_random_mode_spreads_identical_rows(spark):
    """deterministic=False must spread byte-identical rows across
    salts (the documented limitation of the content-hash mode)."""
    from lambda_refarch_mapreduce_spark.partitioning import with_salt

    df = spark.range(1).select(F.lit("samekey").alias("k")).crossJoin(
        spark.range(2000).drop("id")
    )
    det = with_salt(df, 16).select("__salt").distinct().count()
    rnd = with_salt(df, 16, deterministic=False).select("__salt").distinct().count()
    assert det == 1  # all identical rows -> one salt (the limitation)
    assert rnd >= 12  # random mode spreads them
    vals = with_salt(df, 16, deterministic=False).select("__salt").collect()
    assert all(0 <= r["__salt"] < 16 for r in vals)


def test_new_ops_on_empty_input(spark):
    """Empty-corpus behavior of the round-2 operators: no crashes, no
    phantom rows (driver edge case when a filter upstream drops
    everything)."""
    from lambda_refarch_mapreduce_spark.operators import text as text_ops
    from lambda_refarch_mapreduce_spark.operators.dedup import (
        chunk_tokens,
        paragraph_dedup,
    )
    from lambda_refarch_mapreduce_spark.operators.similarity import (
        normalize_embeddings,
        quantize_embeddings,
        semdedup,
    )

    docs = spark.createDataFrame([], "doc_id bigint, text string")
    vecs = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    assert paragraph_dedup(docs, "doc_id", "text").count() == 0
    assert chunk_tokens(docs, "doc_id", "text").count() == 0
    assert dedup.duplicate_span_excise(docs, "doc_id", "text").count() == 0
    assert text_ops.repetition_stats(docs, "doc_id", "text").count() == 0
    assert text_ops.pii_stats(docs, "doc_id", "text").count() == 0
    assert text_ops.unigram_logprob(docs, "doc_id", "text").count() == 0
    assert text_ops.tfidf_terms(docs, "doc_id", "text").count() == 0
    assert text_ops.bm25_search(docs, "doc_id", "text", ["x"]).count() == 0
    assert quantize_embeddings(vecs, "vec_id", "embedding").count() == 0
    assert normalize_embeddings(vecs, "vec_id", "embedding", 4).count() == 0
    assert semdedup(vecs, "vec_id", "embedding").count() == 0


def test_bm25_no_matching_terms(spark):
    from lambda_refarch_mapreduce_spark.operators.text import bm25_search

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon")],
        "doc_id bigint, text string",
    )
    assert bm25_search(df, "doc_id", "text", ["zzz", "qqq"]).count() == 0


def test_duplicate_span_excise_cross_doc(spark):
    """A k-token span shared with an earlier doc is excised from the
    later one; the first occurrence survives; short docs untouched."""
    from lambda_refarch_mapreduce_spark.operators.dedup import duplicate_span_excise

    span = "one two three four"  # k=4 tokens
    df = spark.createDataFrame(
        [
            (1, f"intro {span} outro"),
            (2, f"{span} trailing words here"),  # loses the span to doc 1
            (3, "tiny doc"),  # shorter than k: never touched
        ],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: r
        for r in duplicate_span_excise(df, "doc_id", "text", k=4).collect()
    }
    assert got[1].text_cleaned == f"intro {span} outro"
    assert (got[1].n_tokens, got[1].n_removed) == (6, 0)
    assert got[2].text_cleaned == "trailing words here"
    assert (got[2].n_tokens, got[2].n_removed) == (7, 4)
    assert got[3].text_cleaned == "tiny doc"
    assert (got[3].n_tokens, got[3].n_removed) == (2, 0)


def test_duplicate_span_excise_within_doc_and_overlap(spark):
    """Repeats WITHIN one doc are excised too, and overlapping
    duplicate windows union their covered positions instead of
    double-counting."""
    from lambda_refarch_mapreduce_spark.operators.dedup import duplicate_span_excise

    # doc 1: "a b c a b c" with k=3 -> windows: (a b c)@0, (b c a)@1,
    # (c a b)@2, (a b c)@3. "a b c"@3 is a repeat -> covers 3,4,5.
    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c d e f")],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: r
        for r in duplicate_span_excise(df, "doc_id", "text", k=3).collect()
    }
    assert got[1].text_cleaned == "a b c"
    assert (got[1].n_tokens, got[1].n_removed) == (6, 3)
    # doc 2 shares window "a b c"@0 with doc 1's first occurrence ->
    # doc 1 is first globally (id order), doc 2 loses tokens 0..2
    assert got[2].text_cleaned == "d e f"
    assert (got[2].n_tokens, got[2].n_removed) == (6, 3)


def test_duplicate_span_excise_fully_covered(spark):
    from lambda_refarch_mapreduce_spark.operators.dedup import duplicate_span_excise

    df = spark.createDataFrame(
        [(1, "x y z w"), (2, "x y z w")], "doc_id int, text string"
    )
    got = {
        r.doc_id: r
        for r in duplicate_span_excise(df, "doc_id", "text", k=4).collect()
    }
    assert got[1].text_cleaned == "x y z w"
    assert (got[2].n_removed, got[2].text_cleaned) == (4, "")


def test_bigram_logprob_hand_computed(spark):
    """add-k bigram conditional against hand-computed corpus counts."""
    import math

    from lambda_refarch_mapreduce_spark.operators.text import bigram_logprob

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b a"), (3, "solo")],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: r for r in bigram_logprob(df, "doc_id", "text", 0.5).collect()
    }
    # corpus: c(a)=3, c(b)=2, c(solo)=1, V=3; c("a b")=1, c("b a")=2
    p_ab = (1 + 0.5) / (3 + 0.5 * 3)  # p(b|a)
    p_ba = (2 + 0.5) / (2 + 0.5 * 3)  # p(a|b)
    assert got[1].n_bigrams == 2
    assert got[1].avg_logprob == round((math.log(p_ab) + math.log(p_ba)) / 2, 6)
    assert got[2].n_bigrams == 1
    assert got[2].avg_logprob == round(math.log(p_ba), 6)
    assert (got[3].n_bigrams, got[3].avg_logprob) == (0, 0.0)


def test_url_canonicalize_edge_cases(spark):
    from lambda_refarch_mapreduce_spark.functions.scalar import (
        url_canonicalize,
        url_domain,
    )

    cases = [
        ("HTTP://WWW.Example.COM:80/Path/?#frag", "example.com/Path"),
        ("https://example.com:443/a/b#x", "example.com/a/b"),
        ("https://Example.com", "example.com"),
        ("example.com/x/", "example.com/x"),
        ("https://sub.Example.com:8080/y", "sub.example.com:8080/y"),
        ("  https://example.com/  ", "example.com"),
        ("www.example.com", "example.com"),
    ]
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(cases)], "i int, url string"
    )
    got = {
        r.i: (r.canon, r.dom)
        for r in df.select(
            "i",
            url_canonicalize("url").alias("canon"),
            url_domain(url_canonicalize("url")).alias("dom"),
        ).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i][0] == want, (cases[i][0], got[i][0], want)
    assert got[4][1] == "sub.example.com"  # port stripped from domain


def test_domain_cap_semantics_and_plan(spark):
    from lambda_refarch_mapreduce_spark.operators.text import domain_cap

    df = spark.createDataFrame(
        [(i, f"d{i % 3}") for i in range(30)], "doc_id int, domain string"
    )
    out = domain_cap(df, "doc_id", "domain", 4)
    rows = out.collect()
    assert len(rows) == 12
    by_dom = {}
    for r in rows:
        by_dom.setdefault(r.domain, []).append(r.doc_id)
    for dom, ids in by_dom.items():
        assert len(ids) == 4
        lo = int(dom[1])
        assert sorted(ids) == [lo, lo + 3, lo + 6, lo + 9]  # lowest ids kept
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # cap pushed into the sort


def test_pq_rerank_improves_recall_and_is_exact(spark):
    """Two-stage ADC shortlist -> exact rerank: recall@k vs numpy
    exact-L2 ground truth must be >= raw PQ's, and every returned
    distance must equal the exact squared L2 (approximation confined
    to shortlist membership)."""
    import numpy as np

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    k = 5

    def exact_topk(qid):
        d = sorted(
            (float(np.sum((vecs[qid] - v) ** 2)), nid)
            for nid, v in vecs.items()
            if nid != qid
        )
        return {nid for _, nid in d[:k]}

    truth = {qid: exact_topk(qid) for qid in vecs if qid < 10}
    pq = similarity.pq_topk(emb, q, k=k).collect()
    rr = similarity.pq_rerank_topk(emb, q, k=k, shortlist=20).collect()

    def recall(rows):
        got: dict[int, set] = {}
        for r in rows:
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        return sum(len(got.get(qid, set()) & t) for qid, t in truth.items()) / (
            k * len(truth)
        )

    assert recall(rr) >= recall(pq)
    for r in rr:  # distances are exact, not ADC approximations
        want = float(np.sum((vecs[r.query_id] - vecs[r.neighbor_id]) ** 2))
        assert abs(r.dist2 - want) < 1e-4, (r, want)


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    """Pure-Python reference BPE (Sennrich et al. 2016): greedy
    leftmost merge, most-frequent pair first, ties to the
    lexicographically smallest pair."""
    vocab: dict[tuple, int] = {}
    for w, c in word_counts.items():
        key = tuple(w)
        vocab[key] = vocab.get(key, 0) + c
    merges = []
    for _ in range(n_merges):
        pc: dict[tuple, int] = {}
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, cnt))
        nv: dict[tuple, int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            key = tuple(out)
            nv[key] = nv.get(key, 0) + c
        vocab = nv
    return merges, vocab


def test_bpe_train_matches_reference(spark):
    from lambda_refarch_mapreduce_spark.operators.text import bpe_train_merges

    docs = [
        (1, "low low low lower lower newest newest newest newest widest"),
        (2, "widest widest newest low lowest"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    wc: dict[str, int] = {}
    for _, t in docs:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    want_merges, want_vocab = _ref_bpe(wc, 6)
    got_merges, vocab_df = bpe_train_merges(df, "doc_id", "text", 6)
    assert got_merges == want_merges
    got_vocab = {
        tuple(r.symbols): r.wc
        for r in vocab_df.groupBy("symbols")
        .agg(F.sum("wc").alias("wc"))
        .collect()
    }
    assert got_vocab == want_vocab


def test_bpe_train_overlapping_runs(spark):
    """'aaaa' with merge (a,a) must become ['aa','aa'] (greedy
    leftmost, no re-merge of a just-produced symbol in-round)."""
    from lambda_refarch_mapreduce_spark.operators.text import bpe_train_merges

    df = spark.createDataFrame([(1, "aaaa aaaa aa")], "doc_id int, text string")
    merges, vocab_df = bpe_train_merges(df, "doc_id", "text", 1)
    assert merges[0][:2] == ("a", "a") and merges[0][2] == 7  # 3+3+1 pairs
    syms = {r.word: list(r.symbols) for r in vocab_df.collect()}
    assert syms["aaaa"] == ["aa", "aa"]
    assert syms["aa"] == ["aa"]


def test_corpus_stats_report_dup_attribution(spark):
    """Exact dups are counted corpus-wide but attributed to the group
    of the LATER occurrence; token_share sums to 1."""
    from lambda_refarch_mapreduce_spark.operators.text import corpus_stats_report

    df = spark.createDataFrame(
        [
            (1, "same text here", "en"),
            (2, "same text here", "de"),  # dup of doc 1, counted under de
            (3, "unique german words", "de"),
        ],
        "doc_id int, text string, lang string",
    )
    got = {
        r.group: r
        for r in corpus_stats_report(df, "doc_id", "text", "lang").collect()
    }
    assert got["en"].n_dup_docs == 0
    assert got["de"].n_dup_docs == 1
    assert got["en"].n_docs == 1 and got["de"].n_docs == 2
    assert abs(sum(r.token_share for r in got.values()) - 1.0) < 1e-5


def test_curriculum_order_balanced_stages(spark):
    """Stages are equal-size (±1), quality-monotone across stage
    boundaries, and the shuffle key is deterministic across runs."""
    from lambda_refarch_mapreduce_spark.operators.text import curriculum_order

    docs = load_table(spark, SF_CORRECT, "documents")
    out = curriculum_order(docs, "doc_id", "text", n_stages=4).collect()
    by_stage: dict[int, list] = {}
    for r in out:
        by_stage.setdefault(r.stage, []).append(r)
    assert set(by_stage) == {1, 2, 3, 4}
    sizes = [len(v) for _, v in sorted(by_stage.items())]
    assert max(sizes) - min(sizes) <= 1
    for s in (1, 2, 3):
        assert min(r.quality for r in by_stage[s]) >= max(
            r.quality for r in by_stage[s + 1]
        )
    again = curriculum_order(docs, "doc_id", "text", n_stages=4).collect()
    assert {(r.doc_id, r.shuffle_key) for r in again} == {
        (r.doc_id, r.shuffle_key) for r in out
    }


def test_corpus_diff_statuses(spark):
    from lambda_refarch_mapreduce_spark.operators.text import corpus_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        "doc_id int, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed now"), (4, "brand new")],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.status for r in corpus_diff(old, new, "doc_id", "text").collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}  # 1 unchanged, dropped


def test_corpus_top_ngrams_counts_occurrences(spark):
    """Counts every occurrence (not distinct-per-doc) with a
    deterministic tie-break."""
    from lambda_refarch_mapreduce_spark.operators.text import corpus_top_ngrams

    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c d")], "doc_id int, text string"
    )
    rows = corpus_top_ngrams(df, "doc_id", "text", n=3, k=3).collect()
    assert (rows[0].ngram, rows[0].cnt) == ("a b c", 3)  # 2 in doc1 + 1 in doc2
    assert rows[1].cnt == 1 and rows[2].cnt == 1
    assert rows[1].ngram < rows[2].ngram  # tie-break ascending


def test_group_centroids_matches_numpy(spark):
    import numpy as np

    emb = load_table(spark, SF_SMOKE, "embeddings")
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    got = similarity.group_centroids(emb, docs).collect()
    vecs = {r.vec_id: np.array(r.embedding, float) for r in emb.collect()}
    langs = {r.doc_id: r.lang for r in docs.collect()}
    by_lang: dict[str, list] = {}
    for vid, v in vecs.items():
        by_lang.setdefault(langs[vid], []).append(v)
    want = {g: np.mean(np.stack(vs), axis=0) for g, vs in by_lang.items()}
    assert {r.group for r in got} == set(want)
    for r in got:
        assert r.n_vectors == len(by_lang[r.group])
        assert abs(r.centroid_val - want[r.group][r.dim]) < 1e-6


def test_bpe_encode_matches_reference(spark):
    """Train merges, then encode a NEW text with them — pieces must
    match the pure-Python greedy-apply reference."""
    from lambda_refarch_mapreduce_spark.operators.text import (
        bpe_encode,
        bpe_train_merges,
    )

    train = spark.createDataFrame(
        [(1, "low low low lower lowest newest newest widest")],
        "doc_id int, text string",
    )
    merges, _ = bpe_train_merges(train, "doc_id", "text", 5)

    def ref_apply(word):
        syms = list(word)
        for l, r, _ in merges:
            out = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            syms = out
        return syms

    test_df = spark.createDataFrame(
        [(9, "lowest slower new"), (10, "")], "doc_id int, text string"
    )
    got = {r.doc_id: r for r in bpe_encode(test_df, "doc_id", "text", merges).collect()}
    want = [p for w in "lowest slower new".split() for p in ref_apply(w)]
    assert got[9].pieces.split(" ") == want
    assert got[9].n_tokens == 3 and got[9].n_pieces == len(want)
    assert (got[10].n_tokens, got[10].n_pieces, got[10].pieces) == (0, 0, "")


def test_video_decode_and_sampling(spark):
    """RAWV demux: header parsed, frames shaped, sampling keeps every
    nth frame with real per-frame stats; non-RAWV payloads drop."""
    import struct

    import numpy as np

    header = b"RAWV" + struct.pack("<HHHH", 2, 2, 24, 3)
    f0 = bytes(range(12))            # mean 5.5, max 11
    f1 = bytes([100] * 12)           # mean 100, max 100
    f2 = bytes([0] * 11 + [255])     # mean 255/12, max 255
    clip = header + f0 + f1 + f2
    w, h, fps, frames = multimodal.decode_video(clip)
    assert (w, h, fps) == (2, 2, 24) and frames.shape == (3, 2, 2, 3)
    assert frames.dtype == np.uint8

    media = spark.createDataFrame(
        [(1, "video", bytearray(clip), "rawv", len(clip)),
         (2, "video", bytearray(b"NOPE" + bytes(20)), "mp4", 24)],
        "media_id long, media_type string, content binary, format string, n_bytes long",
    )
    rows = sorted(
        multimodal.extract_video_features(media, sample_every=2).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.media_id for r in rows] == [1, 1]  # mp4 payload dropped
    assert [r.frame_idx for r in rows] == [0, 2]
    assert rows[0].mean_pixel == 5.5 and rows[0].max_pixel == 11
    assert rows[1].max_pixel == 255 and rows[1].n_frames == 3
    assert (rows[0].width, rows[0].height, rows[0].fps) == (2, 2, 24)


def test_normalize_text_options(spark):
    from lambda_refarch_mapreduce_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [(1, "  Hello,   WORLD!  \n twice ")], "doc_id int, text string"
    )
    base = normalize_text(df, "doc_id", "text").collect()[0]
    assert base.text_norm == "hello, world! twice"
    punct = normalize_text(df, "doc_id", "text", strip_punct=True).collect()[0]
    assert punct.text_norm == "hello world twice"
    raw = normalize_text(
        df, "doc_id", "text", lowercase=False, collapse_whitespace=False
    ).collect()[0]
    assert "Hello" in raw.text_norm and raw.n_chars_norm == len(raw.text_norm)


def test_domain_best_vs_domain_cap(spark):
    """domain_best keeps the highest-QUALITY docs; domain_cap keeps
    the lowest IDS — on a corpus where late ids have better text, the
    two must disagree."""
    from lambda_refarch_mapreduce_spark.operators.text import (
        domain_best_docs,
        domain_cap,
    )

    rich = (
        "the quick brown fox jumps over the lazy dog with many of "
        "the finest words in a long and fluent sentence that is for on"
    )
    df = spark.createDataFrame(
        [(i, "x y" if i < 3 else rich, "d0") for i in range(6)],
        "doc_id int, text string, source string",
    )
    best = {r.doc_id for r in domain_best_docs(df, "doc_id", "text", "source", 3).collect()}
    cap = {r.doc_id for r in domain_cap(df, "doc_id", "source", 3).collect()}
    assert best == {3, 4, 5}  # the fluent docs
    assert cap == {0, 1, 2}  # the early ids
    ranks = {
        r.doc_id: r.quality_rank
        for r in domain_best_docs(df, "doc_id", "text", "source", 3).collect()
    }
    assert ranks == {3: 1, 4: 2, 5: 3}  # quality tie -> lower id first


def test_negative_samples_deterministic_and_spread(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = similarity.negative_samples(emb, "vec_id", k=4).collect()
    b = similarity.negative_samples(emb.repartition(7), "vec_id", k=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # partition-invariant
    n = emb.count()
    per_anchor: dict[int, set] = {}
    for r in a:
        assert r.negative_id != r.vec_id  # no self-pairs
        per_anchor.setdefault(r.vec_id, set()).add(r.slot)
    assert set(per_anchor) == {r.vec_id for r in emb.select("vec_id").collect()}
    assert all(len(s) >= 3 for s in per_anchor.values())  # k or k-1 slots
    distinct_negs = len({r.negative_id for r in a})
    assert distinct_negs > n * 0.3  # negatives spread across the corpus


def test_tokens_to_ids_rank_and_oov(spark):
    from lambda_refarch_mapreduce_spark.operators.text import tokens_to_ids

    df = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a rare b"), (3, "")],
        "doc_id int, text string",
    )
    # counts: b=4, a=3, c=1, rare=1; vocab_size=3 -> b:1, a:2, c:3
    # (count desc, token asc tie-break: c before rare)
    got = {r.doc_id: r for r in tokens_to_ids(df, "doc_id", "text", 3).collect()}
    assert got[1].ids_csv == "1,1,1,2,2,3"
    assert (got[1].n_tokens, got[1].oov_count) == (6, 0)
    assert got[2].ids_csv == "2,0,1"  # 'rare' is OOV -> 0
    assert got[2].oov_count == 1
    assert (got[3].n_tokens, got[3].ids_csv) == (0, "")


def test_interval_self_join_exact_once(spark):
    """Pairs straddling a bucket boundary appear exactly once; gaps
    beyond the bound are excluded; orientation by (time, id)."""
    from datetime import datetime, timedelta

    from lambda_refarch_mapreduce_spark.operators.relational import (
        interval_self_join,
    )

    def t(s, us=0):
        return datetime(2024, 1, 1) + timedelta(seconds=s, microseconds=us)

    df = spark.createDataFrame(
        [
            (1, 1, t(55)),   # bucket 0 (gap=60)
            (2, 1, t(59)),   # same bucket, 4s apart
            (3, 1, t(61)),   # next bucket: 6s from id1 (cross-boundary)
            (4, 1, t(130)),  # 69s from id3 -> excluded
            (5, 2, t(56)),   # other key: never pairs with key 1
            (6, 1, t(55)),   # exact tie with id1 -> (t, id) orders it
        ],
        "event_id int, user_id int, ts timestamp",
    )
    rows = interval_self_join(df, "user_id", "event_id", "ts", 60).collect()
    pairs = {(r.id_a, r.id_b): r.micros_apart for r in rows}
    assert pairs == {
        (1, 2): 4_000_000,
        (1, 3): 6_000_000,
        (2, 3): 2_000_000,
        (1, 6): 0,       # tie: lower id is id_a
        (6, 2): 4_000_000,
        (6, 3): 6_000_000,
    }


def test_char_entropy_hand_computed(spark):
    import math

    from lambda_refarch_mapreduce_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, ""), (4, "abcd")],
        "doc_id int, text string",
    )
    got = {r.doc_id: r for r in char_entropy(df, "doc_id", "text").collect()}
    assert got[1].char_entropy == 0.0  # single symbol: zero entropy
    assert got[2].char_entropy == round(math.log(2), 6)  # two equiprobable
    assert (got[3].n_chars, got[3].char_entropy) == (0, 0.0)
    assert got[4].char_entropy == round(math.log(4), 6)  # uniform over 4
    assert got[4].n_distinct_chars == 4


def test_containment_catches_excerpt_jaccard_misses(spark):
    """A short doc quoted inside a much larger one: containment ~1
    while Jaccard stays under any useful threshold."""
    from lambda_refarch_mapreduce_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"w{i}" for i in range(200))
    df = spark.createDataFrame(
        [(1, quote), (2, f"{filler} {quote} {filler}")],
        "doc_id int, text string",
    )
    cont = ngram_containment_pairs(df, "doc_id", "text", 3, 0.9).collect()
    assert len(cont) == 1
    assert cont[0].containment >= 0.99 and cont[0].contained == "a"
    jac = ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.3).collect()
    assert jac == []  # symmetric measure misses the inclusion


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """Winnowing guarantee: two docs sharing a run of >= window+n-1
    tokens must share at least one fingerprint; disjoint docs share
    none. Density lands near the 2/(w+1) theory value."""
    from lambda_refarch_mapreduce_spark.operators.dedup import winnow_fingerprints

    n, w = 3, 4
    shared = " ".join(f"s{i}" for i in range(w + n - 1))  # exactly w+n-1 tokens
    df = spark.createDataFrame(
        [
            (1, f"a1 a2 a3 a4 {shared} a5 a6 a7 a8"),
            (2, f"b1 b2 b3 {shared} b4 b5 b6 b7 b8 b9"),
            (3, " ".join(f"c{i}" for i in range(30))),  # disjoint
        ],
        "doc_id int, text string",
    )
    fps = winnow_fingerprints(df, "doc_id", "text", n, w).collect()
    by_doc: dict[int, set] = {}
    for r in fps:
        by_doc.setdefault(r.id, set()).add(r.fingerprint)
    assert by_doc[1] & by_doc[2], "shared run must share a fingerprint"
    assert not (by_doc[1] & by_doc[3]) and not (by_doc[2] & by_doc[3])
    # density: doc 3 has 28 grams, expect ~2/(w+1)=0.4 selected (loose)
    assert 0.15 <= len(by_doc[3]) / 28 <= 0.8


def test_winnow_pairs_finds_local_overlap(spark):
    from lambda_refarch_mapreduce_spark.operators.dedup import winnow_overlap_pairs

    shared = " ".join(f"s{i}" for i in range(20))  # long shared passage
    df = spark.createDataFrame(
        [
            (1, f"a1 a2 a3 {shared} a4 a5"),
            (2, f"b1 b2 {shared} b3 b4 b5 b6"),
            (3, " ".join(f"c{i}" for i in range(30))),
        ],
        "doc_id int, text string",
    )
    pairs = winnow_overlap_pairs(df, "doc_id", "text").collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}
    assert pairs[0].shared_fingerprints >= 2


def test_simhash_auto_falls_back_when_no_capped_scheme(spark):
    """Large max_hamming relative to bits leaves no block-combination
    scheme under the table cap — auto must fall back to single-band
    probing (with a warning) instead of crashing, and stay exact."""
    import warnings as _w

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "x y z")],
        "doc_id long, text string",
    )
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        out = dedup.simhash_near_pairs(
            docs, "doc_id", "text", bits=60, max_hamming=22,
            n_docs=10_000_000,
        ).collect()
    assert any("no capped multi-table scheme" in str(x.message) for x in rec)
    # still exact: brute-force hamming over the signatures
    sig = {r.id: r.simhash for r in dedup.simhash(
        docs, "doc_id", "text", 60
    ).selectExpr("id", "simhash").collect()}
    want = {
        (a, b)
        for a in sig for b in sig
        if a < b and bin(sig[a] ^ sig[b]).count("1") <= 22
    }
    assert {(r.id_a, r.id_b) for r in out} == want


def test_image_ahash_hand_computed(spark):
    """2x2 grid over a 2x2 PPM (blocks = pixels): bit i set iff pixel
    brightness > image mean. Gray sums 90/600/30/300, total 1020 ->
    bits at p01 (600*4>1020) and p11 (300*4>1020): hash 0b1010 = 10.
    A uniform +20 brightness shift must not change the hash (the
    whole point of average-hash)."""
    raster = bytes([30] * 3 + [200] * 3 + [10] * 3 + [100] * 3)
    shifted = bytes(b + 20 for b in raster)
    rows = [
        (1, "image", b"P6\n2 2\n255\n" + raster, "ppm", 23),
        (2, "image", b"P6\n2 2\n255\n" + shifted, "ppm", 23),
        (3, "image", b"P3\nbad", "ppm", 7),  # undecodable -> dropped
    ]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, content binary, format string, n_bytes long"
    )
    got = {
        r.media_id: r.ahash
        for r in multimodal.image_ahash(media, grid=(2, 2)).collect()
    }
    assert got == {1: 10, 2: 10}


def test_audio_activity_windows_hand_computed(spark):
    """window=2 over four known samples [0, 0, 100, 100]: energies
    [0, 20000]; threshold 10000 -> exactly the second frame voiced.
    A trailing odd sample must be dropped, not padded."""
    import struct

    samples = struct.pack("<5h", 0, 0, 100, 100, 7)  # 5th sample: partial frame
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(samples)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(samples))
    )
    media = spark.createDataFrame(
        [(1, "audio", hdr + samples, "wav", len(samples) + 44)],
        "media_id long, media_type string, content binary, format string, n_bytes long",
    )
    rows = multimodal.audio_activity_windows(
        media, window=2, energy_threshold=10_000
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_windows, r.n_voiced, r.voiced_ratio, r.max_energy) == (2, 1, 0.5, 20000)


def test_video_scene_cuts_hand_computed(spark):
    """2 frames of 1x1 RGB: (10,10,10) -> (10,60,10); |diff| = 50.
    Threshold 49 -> one cut, two scenes; threshold 50 -> no cut
    (strictly-greater gate). Single-frame clip -> 1 scene, 0 cuts."""
    import struct

    hdr2 = b"RAWV" + struct.pack("<HHHH", 1, 1, 8, 2)
    clip2 = hdr2 + bytes([10, 10, 10]) + bytes([10, 60, 10])
    hdr1 = b"RAWV" + struct.pack("<HHHH", 1, 1, 8, 1)
    clip1 = hdr1 + bytes([5, 5, 5])
    media = spark.createDataFrame(
        [(1, "video", clip2, "rawv", len(clip2)),
         (2, "video", clip1, "rawv", len(clip1))],
        "media_id long, media_type string, content binary, format string, n_bytes long",
    )
    got = {
        r.media_id: (r.n_frames, r.n_cuts, r.n_scenes, r.max_diff)
        for r in multimodal.video_scene_cuts(media, diff_threshold=49).collect()
    }
    assert got == {1: (2, 1, 2, 50), 2: (1, 0, 1, 0)}
    got50 = {
        r.media_id: r.n_cuts
        for r in multimodal.video_scene_cuts(media, diff_threshold=50).collect()
    }
    assert got50 == {1: 0, 2: 0}


# ---------------------------------------------------------------------------
# Round 13: narrow-dtype BOUNDARY sweep for every numpy decoder
# statistic (VERDICT r12 next-round #4). The r12 int16 peak wrap
# (np.abs(-32768) -> -32768 on the narrow array) is a CLASS, not an
# instance: every statistic computed from a uint8/int16 decode buffer
# gets a full-scale / boundary fixture asserting the widened-dtype
# path produces the exact value a wrapped narrow computation could
# not. Fixtures: all--32768 PCM16, 0/255 saturated pixels,
# single-frame clips, empty payload bodies.
# ---------------------------------------------------------------------------


def _wav_bytes(samples_i2: bytes, n_channels: int = 1, rate: int = 8000) -> bytes:
    import struct

    return (
        b"RIFF" + struct.pack("<I", 36 + len(samples_i2)) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack(
            "<HHIIHH", 1, n_channels, rate, rate * 2 * n_channels,
            2 * n_channels, 16,
        )
        + b"data" + struct.pack("<I", len(samples_i2)) + samples_i2
    )


_MEDIA_DDL = (
    "media_id long, media_type string, content binary, "
    "format string, n_bytes long"
)


def test_boundary_audio_features_full_scale_and_empty(spark):
    """extract_audio_features at the int16 boundary: a clip of ALL
    full-scale negative samples — peak must be 32768 (the widened
    float64 abs; the narrow np.abs wraps every sample and would
    report -32768) and RMS exactly 32768.0 (each square is 2^30,
    which also overflows int32 accumulation). Empty data chunk ->
    the documented zero row, no division by zero."""
    import numpy as np

    full = np.full(8, -32768, dtype="<i2")
    rows = [
        (1, "audio", _wav_bytes(full.tobytes()), "wav", 60),
        (2, "audio", _wav_bytes(b""), "wav", 44),
    ]
    media = spark.createDataFrame(rows, _MEDIA_DDL)
    got = {
        r.media_id: r
        for r in multimodal.extract_audio_features(media).collect()
    }
    assert got[1].peak == 32768
    assert got[1].rms == 32768.0
    assert (got[2].n_frames, got[2].rms, got[2].peak) == (0, 0.0, 0)


def test_boundary_vad_full_scale_energy_and_short_clip(spark):
    """audio_activity_windows at the int16 boundary: one window of 4
    full-scale samples has energy 4 * 32768^2 = 4_294_967_296 —
    bigger than both int32 AND the wrapped int16 square (-32768^2
    wraps to 0 in int16), so the exact max_energy proves the int64
    widening. A clip shorter than one window reports the zero row."""
    import numpy as np

    full = np.full(4, -32768, dtype="<i2")
    rows = [
        (1, "audio", _wav_bytes(full.tobytes()), "wav", 52),
        (2, "audio", _wav_bytes(np.full(3, 5, dtype="<i2").tobytes()),
         "wav", 50),
    ]
    media = spark.createDataFrame(rows, _MEDIA_DDL)
    got = {
        r.media_id: r
        for r in multimodal.audio_activity_windows(
            media, window=4, energy_threshold=4_000_000_000
        ).collect()
    }
    assert got[1].max_energy == 4 * 32768 ** 2
    assert (got[1].n_windows, got[1].n_voiced) == (1, 1)
    assert (got[2].n_windows, got[2].n_voiced, got[2].voiced_ratio,
            got[2].max_energy) == (0, 0, 0.0, 0)


def test_boundary_image_features_saturated_pixels(spark):
    """extract_image_features at the uint8 boundary: all-0 and
    all-255 rasters must report exact mean/min/max (a narrow uint8
    sum of 255s wraps at the 257th pixel; the mean must come out
    255.0 exactly, not a wrapped fraction)."""
    black = b"P5\n20 20\n255\n" + bytes([0] * 400)
    white = b"P5\n20 20\n255\n" + bytes([255] * 400)
    media = spark.createDataFrame(
        [(1, "image", black, "pgm", len(black)),
         (2, "image", white, "pgm", len(white))],
        _MEDIA_DDL,
    )
    got = {
        r.media_id: (r.mean_pixel, r.min_pixel, r.max_pixel)
        for r in multimodal.extract_image_features(media).collect()
    }
    assert got == {1: (0.0, 0, 0), 2: (255.0, 255, 255)}


def test_boundary_ahash_uniform_and_saturated(spark):
    """image_ahash at the threshold boundary: a UNIFORM image (every
    block sum equals the mean — including all-255 saturation) must
    hash to 0 under the strictly-greater integer gate; one brighter
    block sets exactly its own bit. The block sums of an all-255
    8x8x3 image (8*8*3*255 = 48_960 per 2x2 grid block) also exceed
    uint8/int16 — exactness proves the int64 accumulation."""
    uniform = b"P6\n8 8\n255\n" + bytes([255] * 192)
    raster = bytearray([10] * 192)
    # brighten the top-left 4x4 block (rows 0-3, cols 0-3, 3 subpx)
    for r in range(4):
        for c in range(4):
            for ch in range(3):
                raster[(r * 8 + c) * 3 + ch] = 250
    media = spark.createDataFrame(
        [(1, "image", uniform, "ppm", 207),
         (2, "image", b"P6\n8 8\n255\n" + bytes(raster), "ppm", 207)],
        _MEDIA_DDL,
    )
    got = {
        r.media_id: r.ahash
        for r in multimodal.image_ahash(media, grid=(2, 2)).collect()
    }
    assert got == {1: 0, 2: 1}  # bit 0 = row 0, col 0


def test_boundary_scene_cuts_saturated_diff_and_video_means(spark):
    """video_scene_cuts at the uint8 boundary: a 4x4 clip cutting
    from all-0 to all-255 has per-pair diff 255 * 48 subpixels =
    12_240 (> int8/uint8; |0 - 255| in uint8 arithmetic would wrap
    to 1) — the exact max_diff proves the int64 widening.
    extract_video_features on the same frames must report exact
    0.0 / 255.0 frame means."""
    import struct

    hdr = b"RAWV" + struct.pack("<HHHH", 4, 4, 8, 2)
    clip = hdr + bytes([0] * 48) + bytes([255] * 48)
    media = spark.createDataFrame(
        [(1, "video", clip, "rawv", len(clip))], _MEDIA_DDL
    )
    r = multimodal.video_scene_cuts(media, diff_threshold=100).collect()[0]
    assert (r.n_frames, r.n_cuts, r.n_scenes) == (2, 1, 2)
    assert r.max_diff == 255 * 48
    means = sorted(
        row.mean_pixel
        for row in multimodal.extract_video_features(
            media, sample_every=1
        ).collect()
    )
    assert means == [0.0, 255.0]


# ---------------------------------------------------------------------------
# exact-duplicate collapse (round 13): the mega-cluster explosion fix
# ---------------------------------------------------------------------------


def _cluster_corpus(spark, copies=30):
    """Corpus with every shape the collapse/expand path must preserve:
    a planted exact-duplicate mega-cluster, near-dups of the cluster
    content, unrelated singletons, a duplicated EMPTY group and a
    duplicated sub-shingle-width group (both must yield no minhash
    pairs: zero-shingle docs never enter the banding pipeline)."""
    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .limit(12)
    )
    seed = docs.orderBy("doc_id").limit(1)
    cluster = seed.crossJoin(
        spark.range(copies).select((F.col("id") + 50_000).alias("__c"))
    ).select(F.col("__c").alias("doc_id"), "text")
    near = seed.select(
        F.lit(60_000).cast("long").alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzztail")).alias("text"),
    )
    degenerate = spark.createDataFrame(
        [(70_000, ""), (70_001, ""), (70_002, "a b"), (70_003, "a b")],
        "doc_id long, text string",
    )
    return docs.unionByName(cluster).unionByName(near).unionByName(degenerate)


def _pair_set(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize(
    "fn,kwargs",
    [
        (dedup.minhash_lsh_pairs, {"threshold": 0.3}),
        (dedup.ngram_jaccard_pairs, {"threshold": 0.3}),
        (dedup.simhash_near_pairs, {"max_hamming": 6}),
        (dedup.ngram_containment_pairs, {"threshold": 0.3}),
        (dedup.winnow_overlap_pairs, {"min_shared": 1}),
    ],
)
def test_collapse_exact_pair_parity(spark, fn, kwargs):
    """collapse_exact=True must return EXACTLY the uncollapsed pair
    set — same ids, same similarity values — on a corpus with a
    planted 30-copy cluster, near-dups, and degenerate dup groups."""
    corpus = _cluster_corpus(spark)
    collapsed = _pair_set(fn(corpus, "doc_id", "text", **kwargs))
    naive = _pair_set(fn(corpus, "doc_id", "text", collapse_exact=False, **kwargs))
    assert collapsed == naive
    # the cluster itself must be fully paired: C(30,2) within + seed
    within = {p for p in collapsed if p[0] >= 50_000 and p[1] < 60_000}
    assert len(within) == 30 * 29 // 2


def test_collapse_candidate_volume_is_cluster_size_free(spark):
    """The plan-shape guarantee: with an m-copy exact cluster, the
    banded candidate join sees ONE representative — candidate pairs
    must not grow with m (the C(m,2)-per-band explosion the skew tier
    caught; SCALING.md round 13)."""
    corpus = _cluster_corpus(spark, copies=40)
    non_rep, _multi = dedup._exact_groups(corpus, "doc_id", "text")
    banded = dedup._rep_only(
        dedup.minhash_bands(corpus, "doc_id", "text"), non_rep
    )
    a, b = banded.alias("a"), banded.alias("b")
    candidates = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col("a.id") < F.col("b.id")),
    )
    # reps: 12 base + 1 near + "" + "a b" = 15 distinct contents; the
    # 40-copy cluster contributes ZERO extra candidates. Bound: the
    # seed<->near collision across <=4 bands plus any base-corpus
    # collisions — far under one C(40,2) band's 780.
    assert candidates.count() < 100
