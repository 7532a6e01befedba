"""Training-data pipeline operators: dedup, similarity, textstats,
multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from content_rw_elasticsearch_spark.operators import (
    dedup,
    multimodal,
    similarity,
    textstats,
)


@pytest.fixture(scope="module")
def docs_df(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/documents.parquet").persist()


@pytest.fixture(scope="module")
def emb_df(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/embeddings.parquet").persist()


def test_exact_dup_groups(spark):
    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "cc dd"), (3, "aa bb"), (4, "aa bb"), (5, "ee")],
        "doc_id long, text string",
    )
    rows = dedup.exact_dup_groups(df, "text", "doc_id").collect()
    assert len(rows) == 1
    assert rows[0]["n"] == 3 and rows[0]["keep_doc_id"] == 1


def test_jaccard_matches_python_oracle(spark):
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over the lazy cat",
        3: "completely different words entirely here now",
        4: "the quick brown fox jumps over the lazy dog",  # exact dup of 1
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {(r["d1"], r["d2"]): r["jaccard"]
           for r in dedup.ngram_jaccard_pairs(df, "text", "doc_id", 3, 0.5).collect()}

    def sh(t):
        toks = t.split()
        m = max(len(toks) - 2, 1)
        return {" ".join(toks[i:i + 3]) for i in range(m)}

    expect = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh(texts[a]) & sh(texts[b]))
            if inter:
                j = round(inter / len(sh(texts[a]) | sh(texts[b])), 4)
                if j >= 0.5:
                    expect[(a, b)] = j
    assert got == expect
    assert got[(1, 4)] == 1.0


def test_minhash_lsh_equals_exact(docs_df):
    exact = {(r["d1"], r["d2"], r["jaccard"]) for r in
             dedup.ngram_jaccard_pairs(docs_df, "text", "doc_id", 3, 0.8).collect()}
    lsh = {(r["d1"], r["d2"], r["jaccard"]) for r in
           dedup.minhash_lsh_dedup(docs_df, "text", "doc_id", 3, 0.8).collect()}
    assert lsh == exact and len(exact) > 0


def test_simhash_properties(spark, docs_df):
    pairs = dedup.simhash_pairs(docs_df, "text", "doc_id", max_hamming=3).collect()
    assert all(r["d1"] < r["d2"] and r["hamming"] <= 3 for r in pairs)
    # identical texts → identical fingerprint → hamming 0
    df = spark.createDataFrame(
        [(1, "same words here exactly"), (2, "same words here exactly")],
        "doc_id long, text string",
    )
    r = dedup.simhash_pairs(df, "text", "doc_id", 0).collect()
    assert [(r[0]["d1"], r[0]["d2"], r[0]["hamming"])] == [(1, 2, 0)]


def test_simhash_fingerprints_match_python_replay(docs_df):
    """The JVM xxhash64 bit-vote plan must equal the independent
    pure-Python replay (the driver oracle) fingerprint-for-fingerprint."""
    got = {r["doc_id"]: r["fp"] for r in
           dedup.simhash_fingerprints(docs_df, "text", "doc_id").collect()}
    src = {r["doc_id"]: r["text"] for r in docs_df.collect()}
    assert got == {d: dedup.simhash64_py(t or "") for d, t in src.items()}
    # zero-token docs fingerprint to 0 via the left join
    assert dedup.simhash64_py("") == 0


def test_cosine_topk_vs_numpy(spark, emb_df):
    qids = [0, 7]
    got = similarity.cosine_topk(spark, emb_df, qids, k=5).collect()
    rows = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb_df.collect()}
    for qid in qids:
        qv = rows[qid]
        scored = []
        for vid, v in rows.items():
            if vid == qid:
                continue
            cos = round(float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), 4)
            scored.append((vid, cos))
        scored.sort(key=lambda x: (-x[1], x[0]))
        expect = scored[:5]
        mine = [(r["neighbor_id"], r["cos"]) for r in got if r["query_id"] == qid]
        assert mine == expect


def test_ann_lsh_subset_of_bruteforce_bucket(spark, emb_df):
    """ANN results are exact within the bucket: every returned neighbor's
    cos matches brute force, ranks are bucket-local."""
    qids = [0, 7, 42]
    ann = similarity.ann_lsh_topk(spark, emb_df, qids, k=5).collect()
    brute = {(r["query_id"], r["neighbor_id"]): r["cos"]
             for r in similarity.cosine_topk(spark, emb_df, qids, k=500).collect()}
    assert len(ann) > 0
    for r in ann:
        assert brute[(r["query_id"], r["neighbor_id"])] == r["cos"]


def test_ann_multiprobe_improves_recall(spark, emb_df):
    """Hamming-1 multi-probe must (a) stay exact on cos values, (b) never
    lose a neighbor the single-bucket probe found, and (c) recover at
    least as many true top-k neighbors overall."""
    qids = [0, 7, 42, 99, 123]
    k = 5
    single = {(r["query_id"], r["neighbor_id"])
              for r in similarity.ann_lsh_topk(spark, emb_df, qids, k=k).collect()}
    multi_rows = similarity.ann_multiprobe_topk(spark, emb_df, qids, k=k).collect()
    multi = {(r["query_id"], r["neighbor_id"]) for r in multi_rows}
    exact_rows = similarity.cosine_topk(spark, emb_df, qids, k=k).collect()
    exact = {(r["query_id"], r["neighbor_id"]) for r in exact_rows}
    brute = {(r["query_id"], r["neighbor_id"]): r["cos"]
             for r in similarity.cosine_topk(spark, emb_df, qids, k=500).collect()}
    for r in multi_rows:
        assert brute[(r["query_id"], r["neighbor_id"])] == r["cos"]
    # per query, the multi-probe candidate set contains the single-probe
    # one, so each query's top-k cos floor can only rise
    assert len(multi & exact) >= len(single & exact)


def test_language_id_deterministic(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and of course"),
            (2, "el perro de la casa y los gatos que se"),
            (3, "der hund und die katze ist von dem haus mit den"),
            (4, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in
           textstats.language_id(df, "text", "doc_id").collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "und"}


def test_language_id_ngram(spark):
    df = spark.createDataFrame(
        [
            (1, "the thing of the morning is the finding"),
            (2, "la acción de la nación que el mundo"),
            (3, "die Verbindung der Geschichte und die Einrichtung"),
            (4, "qqq"),
            # subword evidence: zero whole stopwords, still classifiable
            (5, "kings sing bringing things"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang_ng"] for r in
           textstats.language_id_ngram(df, "text", "doc_id").collect()}
    assert got[1] == "en" and got[2] == "es" and got[3] == "de"
    assert got[4] == "und" and got[5] == "en"
    # the word-level heuristic returns 'und' on doc 5 — the trigram
    # profiles are strictly more capable on short/subword-only input
    word = {r["doc_id"]: r["pred_lang"] for r in
            textstats.language_id(df, "text", "doc_id").collect()}
    assert word[5] == "und"


def test_token_counts_and_fingerprints(spark):
    df = spark.createDataFrame([(1, "Hello, world! hello")], "doc_id long, text string")
    tc = textstats.token_counts(df, "text", "doc_id").collect()[0]
    assert tc["ws_tokens"] == 3 and tc["simple_tokens"] == 3
    assert tc["bpe_tokens"] == 5  # hello , world ! hello
    fp1 = textstats.fingerprints(df, "text", "doc_id").collect()[0]
    df2 = spark.createDataFrame([(1, "world hello HELLO!")], "doc_id long, text string")
    fp2 = textstats.fingerprints(df2, "text", "doc_id").collect()[0]
    assert fp1["sorted_token_fp"] == fp2["sorted_token_fp"]  # bag-of-words identity


def test_multimodal_plumbing(docs_df):
    media = multimodal.media_from_documents(docs_df)
    feats = multimodal.extract_features(media, deterministic_fake=True)
    rows = feats.limit(5).collect()
    assert feats.schema == multimodal.FEATURE_SCHEMA
    for r in rows:
        assert 1 <= r["width"] <= 640 and 1 <= r["height"] <= 480
        assert r["media_type"] in ("image", "audio", "video")
    # the non-fake path must fail loudly, not silently fake
    with pytest.raises(Exception, match="NotImplementedError|media decode"):
        multimodal.extract_features(media, deterministic_fake=False).collect()


def test_multimodal_payload_sha_invariant(docs_df):
    """Binary payloads survive the columnar path byte-identically."""
    media = multimodal.media_from_documents(docs_df).limit(20)
    import hashlib
    for r in media.collect():
        assert hashlib.sha256(bytes(r["payload"])).hexdigest() == r["payload_sha"]


def test_embedding_near_dup_identical_pair_found(spark):
    """An identical vector pair (cos 1.0) collides in every LSH table, so
    the candidate join MUST surface it — recall 1.0 for exact dups."""
    import random

    rng = random.Random(9)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    rows.append((100, list(rows[3][1])))  # exact dup of vec 3
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = dedup.embedding_near_dup_pairs(
        df, tau=0.999, n_tables=2, n_planes=4, dim=8).collect()
    assert (3, 100) in {(r["id_a"], r["id_b"]) for r in got}
    byp = {(r["id_a"], r["id_b"]): r["cos"] for r in got}
    assert byp[(3, 100)] == pytest.approx(1.0, abs=1e-4)


def test_embedding_near_dup_precision_exact(spark, emb_df):
    """Every emitted pair really has cosine >= tau (candidates are
    verified by true cosine — LSH affects recall only, never precision)."""
    got = dedup.embedding_near_dup_pairs(emb_df, tau=0.9, dim=64).collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb_df.collect()}
    for r in got:
        a, b = vecs[r["id_a"]], vecs[r["id_b"]]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert round(cos, 4) >= 0.9
        assert r["cos"] == pytest.approx(cos, abs=1e-3)
    # and the LSH result is a subset of the brute-force truth
    ids = sorted(vecs)
    brute = {(ids[i], ids[j]) for i in range(len(ids))
             for j in range(i + 1, len(ids))
             if round(float(vecs[ids[i]] @ vecs[ids[j]]
                            / (np.linalg.norm(vecs[ids[i]])
                               * np.linalg.norm(vecs[ids[j]]))), 4) >= 0.9}
    assert {(r["id_a"], r["id_b"]) for r in got} <= brute


def test_ivf_centroids_match_numpy_replay(spark, emb_df):
    """The Spark Lloyd loop (ivf_centroids) and the independent numpy
    trainer (_ivf_replay_py — the oracle's centroid source) must agree
    bit-for-bit: both quantize centroids to CENTROID_ROUND and assignment
    scores to ASSIGN_ROUND each iteration, so float sum-order differences
    cannot diverge the training."""
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb_df.collect()}
    got = similarity.ivf_centroids(spark, emb_df, k_clusters=4, iters=2, dim=64)
    want = similarity._ivf_replay_py(vecs, k_clusters=4, iters=2)
    assert got == want


def test_ivf_full_probe_equals_bruteforce(spark, emb_df):
    """With n_probe == k_clusters every bucket is probed, so IVF must be
    EXACTLY exhaustive brute force — the recall loss is the probe subset,
    never the bucketing itself."""
    qids = [0, 7, 42]
    ivf = similarity.ann_ivf_topk(
        spark, emb_df, qids, k=5, k_clusters=4, n_probe=4, iters=2,
        dim=64).collect()
    brute = similarity.cosine_topk(spark, emb_df, qids, k=5).collect()
    assert [tuple(r) for r in ivf] == [tuple(r) for r in brute]


def test_ivf_precision_exact(spark, emb_df):
    """Default-probe IVF: every returned cos is the true cosine (verify
    by numpy) — IVF affects recall only, never precision."""
    qids = [0, 7]
    got = similarity.ann_ivf_topk(spark, emb_df, qids, k=5, dim=64).collect()
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb_df.collect()}
    assert len(got) > 0
    for r in got:
        qv, v = vecs[r["query_id"]], vecs[r["neighbor_id"]]
        cos = round(float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), 4)
        assert r["cos"] == cos


def test_resize_images_deterministic(spark, docs_df):
    """Resize plumbing: exact w*h output bytes per row, sha pinned to the
    pure function of (payload, w, h) — re-running yields identical rows."""
    import hashlib

    from content_rw_elasticsearch_spark.operators import multimodal as mm

    media = mm.media_from_documents(docs_df.limit(20))
    out = mm.resize_images(media, w=8, h=4).collect()
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert len(out) == 20
    for r in out:
        assert (r["width"], r["height"]) == (8, 4)
        b = bytes(r["payload"])
        assert len(b) == 32
        assert b == mm.resize_images_stub(src[r["media_id"]], 8, 4, True)
        assert hashlib.sha256(b).hexdigest() == r["payload_sha"]


def test_sample_frames_cardinality_and_shas(spark, docs_df):
    """Frame sampling fans ONE video row out to len(payload)//every_ms
    frame rows (>=1) with pinned shas — the mapInPandas cardinality-change
    shape a plain pandas_udf cannot express."""
    import hashlib

    from content_rw_elasticsearch_spark.operators import multimodal as mm

    media = mm.media_from_documents(docs_df.limit(30))
    vids = {r["media_id"]: bytes(r["payload"])
            for r in media.filter("media_type = 'video'").collect()}
    assert vids, "limit(30) must contain doc_id % 3 == 2 rows"
    out = mm.sample_frames(media, every_ms=500, frame_bytes=16).collect()
    by_vid: dict = {}
    for r in out:
        by_vid.setdefault(r["media_id"], []).append(r)
    assert set(by_vid) == set(vids)
    for mid, rows in by_vid.items():
        assert len(rows) == max(1, len(vids[mid]) // 500)
        rows.sort(key=lambda r: r["frame_idx"])
        for i, r in enumerate(rows):
            assert r["frame_idx"] == i and r["ts_ms"] == i * 500
            assert len(bytes(r["frame"])) == 16
            assert hashlib.sha256(bytes(r["frame"])).hexdigest() == r["frame_sha"]


def test_round_half_up_matches_decimal():
    """_round_half_up must implement Spark ROUND (HALF_UP away from zero)
    exactly — the IVF oracle's numpy replay rounds with it, so a single
    banker's-rounding slip would diverge training between engines.
    Property-checked against decimal.Decimal ROUND_HALF_UP, including
    exact .5 boundaries where python round() disagrees."""
    import decimal

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def dec_half_up(x: float, nd: int) -> float:
        q = decimal.Decimal(1).scaleb(-nd)
        return float(decimal.Decimal(repr(x)).quantize(
            q, rounding=decimal.ROUND_HALF_UP))

    # exact decimal-boundary cases, incl. ones where the BINARY value sits
    # below the .5 (0.15 = 0.1499... in binary: a floor-based impl says
    # 0.1; Spark reads the shortest repr "0.15" and HALF_UPs to 0.2)
    for x, nd, want in [(0.5, 0, 1.0), (-0.5, 0, -1.0), (2.5, 0, 3.0),
                        (0.000005, 5, 1e-05), (-0.000005, 5, -1e-05),
                        (1.25, 1, 1.3), (-1.25, 1, -1.3),
                        (0.15, 1, 0.2), (-0.15, 1, -0.2),
                        (2.675, 2, 2.68)]:
        assert similarity._round_half_up(x, nd) == want == dec_half_up(x, nd)

    @settings(max_examples=300, deadline=None)
    @given(st.floats(min_value=-1e6, max_value=1e6,
                     allow_nan=False, allow_infinity=False),
           st.integers(min_value=0, max_value=9))
    def prop(x, nd):
        assert similarity._round_half_up(x, nd) == dec_half_up(x, nd)

    prop()


def test_round_half_up_matches_spark_round(spark):
    """_round_half_up vs Spark's F.round on adversarial doubles — the
    exact parity the IVF replay depends on, including shortest-repr .5
    boundaries binary floats sit below (0.15, 2.675) and random values."""
    import random

    rng = random.Random(11)
    vals = [0.15, -0.15, 2.675, 0.5, -0.5, 2.5, 1.25, -1.25, 0.000005,
            1e-7, -1e-7, 123456.789115] + [rng.uniform(-2, 2) for _ in range(200)]
    rows = [(i, v, nd) for i, v in enumerate(vals) for nd in (0, 1, 4, 6, 9)]
    df = spark.createDataFrame(rows, "i int, x double, nd int")
    got = {(r["i"], r["nd"]): r["r"] for r in df.select(
        "i", "nd",
        F.when(F.col("nd") == 0, F.round("x", 0))
         .when(F.col("nd") == 1, F.round("x", 1))
         .when(F.col("nd") == 4, F.round("x", 4))
         .when(F.col("nd") == 6, F.round("x", 6))
         .otherwise(F.round("x", 9)).alias("r"),
    ).collect()}
    for i, v, nd in rows:
        assert got[(i, nd)] == similarity._round_half_up(v, nd), (v, nd)
