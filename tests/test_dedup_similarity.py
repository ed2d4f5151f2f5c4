"""Dedup / similarity / text-analysis operator tests (small synthetic +
driver documents/embeddings tables)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from quickwit_spark.functions.text import (
    fingerprint_col,
    lang_id_udf,
    quality_features,
    quality_score_col,
    token_count_col,
)
from quickwit_spark.operators.dedup import (
    dedup_exact,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_col,
    simhash_near_dup_pairs,
)
from quickwit_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog"),  # near dup
        (3, "completely different text about spark engines"),
        (4, "another unrelated document mentioning parquet files"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"]).cache()


def test_dedup_exact(docs):
    kept = sorted(r["doc_id"] for r in dedup_exact(docs).collect())
    assert kept == [0, 2, 3, 4]


def test_minhash_near_dup(docs):
    # docs 0 vs 2 differ in 1 of 9 words → true shingle-Jaccard = 0.4;
    # 32 bands of 2 rows catch J=0.4 pairs w.p. ~1-(1-0.16)^32 ≈ 0.996
    pairs = {
        (r["a"], r["b"])
        for r in minhash_dedup_pairs(docs, threshold=0.3, num_bands=32).collect()
    }
    assert (0, 1) in pairs  # exact dups always collide
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup found
    assert (0, 3) not in pairs and (3, 4) not in pairs


def test_minhash_signature_deterministic(docs):
    s1 = minhash_signatures(docs).orderBy("doc_id").collect()
    s2 = minhash_signatures(docs).orderBy("doc_id").collect()
    assert [r["signature"] for r in s1] == [r["signature"] for r in s2]
    assert s1[0]["signature"] == s1[1]["signature"]  # identical docs


def test_minhash_short_docs_no_ansi_crash(spark):
    """Docs shorter than the shingle size must not crash under ANSI mode
    (element_at past the array end raises in Spark 4): the forced single
    shingle is the join of the available tokens — the same value the
    DuckDB oracle's bounds-clamped slice produces — and exact-verify
    pairs still come out right."""
    from pyspark.sql import functions as F

    from quickwit_spark.operators.dedup import (
        _shingle_sets,
        minhash_dedup_pairs,
    )

    rows = [(1, "a"), (2, "a"), (3, "a b"), (4, "a b"), (5, "x y z w")]
    short = spark.createDataFrame(rows, "doc_id long, text string")
    sh = {r["doc_id"]: sorted(r["sh"]) for r in _shingle_sets(short, "text", "doc_id", 3).collect()}
    assert sh[1] == ["a"] and sh[3] == ["a b"]
    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in minhash_dedup_pairs(
            short, threshold=0.9, num_perm=64, num_bands=16, verify="exact"
        ).collect()
    }
    assert pairs.get((1, 2)) == 1.0 and pairs.get((3, 4)) == 1.0
    assert (1, 3) not in pairs


def test_minhash_arrow_path_matches_pandas_reference(docs):
    """The zero-copy mapInArrow signature path must be bit-identical to the
    retained pandas-UDF reference (_sig_udf) — same permutation params,
    same segmented-min arithmetic, only the serde differs."""
    from pyspark.sql import functions as F

    from quickwit_spark.operators.dedup import _shingles_expr, _sig_udf

    tok = docs.select(
        F.col("doc_id"), F.split(F.lower(F.col("text")), r"\s+").alias("_toks")
    )
    hashed = F.transform(_shingles_expr(3), lambda s: F.xxhash64(s))
    ref = {
        r["doc_id"]: r["sig"]
        for r in tok.select(
            "doc_id", _sig_udf(64, 1)(hashed).alias("sig")
        ).collect()
    }
    arrow = {
        r["doc_id"]: r["signature"]
        for r in minhash_signatures(docs, num_perm=64).collect()
    }
    assert ref == arrow


def test_ngram_jaccard(docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0
    assert 0.3 <= pairs[(0, 2)] < 1.0


def test_simhash(docs):
    vals = {r["doc_id"]: r["s"] for r in docs.select("doc_id", simhash_col().alias("s")).collect()}
    assert vals[0] == vals[1]
    pairs = {(r["a"], r["b"]) for r in simhash_near_dup_pairs(docs, max_hamming=8).collect()}
    assert (0, 1) in pairs


def test_cosine_topk_self_is_nearest(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    top = cosine_topk(emb, list(q), k=5).collect()
    assert top[0]["vec_id"] == 0 and abs(top[0]["cosine"] - 1.0) < 1e-5
    assert all(top[i]["cosine"] >= top[i + 1]["cosine"] for i in range(len(top) - 1))


def test_lsh_topk_recall(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()
    q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    exact = [r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()]
    approx = [r["vec_id"] for r in lsh_topk(emb, q, k=10, bits=6, multiprobe_hamming=2).collect()]
    # LSH with multiprobe should recover most of the true top-10
    assert len(set(exact) & set(approx)) >= 5
    assert approx[0] == 0


def test_ivf_topk(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()
    q = list(emb.filter(F.col("vec_id") == 0).first()["embedding"])
    dim = len(q)
    rng = np.random.default_rng(3)
    centroids = rng.standard_normal((4, dim)) * 0.1
    got = ivf_topk(emb, q, centroids, k=5, n_probe=4).collect()
    # probing all cells == exact
    exact = cosine_topk(emb, q, k=5).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]


def test_embedding_near_dup_exact_vs_lsh(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((20, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        if i < 3:  # 3 near-dups: tiny perturbation
            rows.append((100 + i, [float(x) for x in v + rng.standard_normal(16) * 0.01]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = {(r["a"], r["b"]) for r in embedding_near_dup_pairs(df, 0.99).collect()}
    assert {(0, 100), (1, 101), (2, 102)} <= exact


def test_token_count_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat with a hat"), (2, "x"), (3, "!!! ??? ***")],
        ["id", "text"],
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            token_count_col(F.col("text")).alias("n"),
            quality_score_col(F.col("text")).alias("q"),
            *quality_features(F.col("text")),
        ).collect()
    }
    assert rows[1]["n"] == 9
    assert rows[1]["q"] > rows[3]["q"]  # punctuation soup scores lower
    assert rows[1]["stopword_ratio"] > 0.3


def test_fingerprint_stability(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "PREFIX alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (3, "totally different words everywhere in this line here now ok"),
        ],
        ["id", "text"],
    )
    vals = {r["id"]: r["f"] for r in df.select("id", fingerprint_col(F.col("text")).alias("f")).collect()}
    assert vals[1] == vals[2]  # shared min-window survives a prefix edit
    assert vals[1] != vals[3]


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox and the lazy dog went to the market"),
            (2, "der schnelle braune fuchs springt über die faule katze im schnee"),
            (3, "le renard brun rapide saute par dessus le chien paresseux de la ville"),
        ],
        ["id", "text"],
    )
    got = {r["id"]: r["lang"] for r in df.select("id", lang_id_udf(F.col("text")).alias("lang")).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr"


def test_multimodal_plumbing(spark):
    from quickwit_spark.operators.multimodal import frame_sample, image_features

    rows = [
        (1, "image", "image/png", bytearray(b"fakepng1"), 64, 64, None),
        (2, "image", "image/png", bytearray(b"fakepng2"), 32, 32, None),
        (3, "video", "video/mp4", bytearray(b"fakemp4"), None, None, 3500),
    ]
    from quickwit_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = image_features(media.filter(F.col("kind") == "image"), deterministic_fake=True).collect()
    assert len(feats) == 2 and len(feats[0]["feat"]) == 64
    # deterministic: same payload → same features
    feats2 = image_features(media.filter(F.col("kind") == "image"), deterministic_fake=True).collect()
    assert [list(f["feat"]) for f in feats] == [list(f["feat"]) for f in feats2]
    frames = frame_sample(media, every_ms=1000, deterministic_fake=True).collect()
    assert len(frames) == 4  # 0,1000,2000,3000

    with pytest.raises(Exception):
        image_features(media.filter(F.col("kind") == "image")).collect()


# ---------------------------------------------------------------------------
# round 2: vectorized SimHash parity, stop-shingle cap, blocked exact pairs
# ---------------------------------------------------------------------------


def test_simhash_vectorized_matches_sql(docs):
    """The Arrow pandas-UDF SimHash must be bit-for-bit the old all-SQL one."""
    from quickwit_spark.operators.dedup import _simhash_col_sql

    rows = docs.select(
        "doc_id", simhash_col().alias("fast"), _simhash_col_sql().alias("ref")
    ).collect()
    assert rows, "fixture empty"
    for r in rows:
        assert r["fast"] == r["ref"], r["doc_id"]


def test_simhash_arrow_frame_matches_column(docs):
    """The zero-copy mapInArrow frame used by simhash_near_dup_pairs must
    produce the same hashes as the simhash_col column UDF (shared kernel),
    and carry the same sorted-token multiset for the exact verify."""
    from pyspark.sql import functions as F

    from quickwit_spark.operators.dedup import _simhash_frame

    frame = {
        r["doc_id"]: (r["sim"], tuple(r["_ms"]))
        for r in _simhash_frame(docs, "text", "doc_id", True).collect()
    }
    col = {
        r["doc_id"]: (
            r["sim"],
            tuple(r["ms"]),
        )
        for r in docs.select(
            "doc_id",
            simhash_col().alias("sim"),
            F.array_sort(F.split(F.lower(F.col("text")), r"\s+")).alias("ms"),
        ).collect()
    }
    assert frame == col


def test_ngram_stop_shingle_cap(spark, docs):
    """A shingle shared by EVERY doc must not blow up the candidate join, and
    capping it must not change the output pairs (Jaccard is computed from the
    full shingle sets, not the pruned index)."""
    # every doc starts with the same 3-gram → df = n_docs for that shingle
    common = spark.createDataFrame(
        [(i, "zz yy xx unique%d stuff%d tail%d" % (i, i, i)) for i in range(30)]
        + [(100, "zz yy xx alpha beta gamma"), (101, "zz yy xx alpha beta gamma")],
        ["doc_id", "text"],
    )
    # cap excludes the universal shingle (df=32 > 10); the (100,101) exact-dup
    # pair still surfaces through its rare shingles, with the TRUE jaccard
    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(common, threshold=0.5, max_shingle_df=10).collect()
    }
    assert pairs == {(100, 101): 1.0}
    # uncapped on the original fixture == capped with a high cap
    base = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.3, max_shingle_df=10**6).collect()
    }
    capped = {
        (r["a"], r["b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert base == capped


def test_blocked_exact_pairs_match_naive(spark):
    from quickwit_spark.operators.similarity import (
        cosine_col,
        embedding_exact_pairs_blocked,
    )

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(rng.standard_normal((60, 8)))]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()
    naive = df.alias("l").join(
        df.alias("r"), F.col("l.vec_id") < F.col("r.vec_id")
    ).select(
        F.col("l.vec_id").alias("a"),
        F.col("r.vec_id").alias("b"),
        F.round(cosine_col(F.col("l.embedding"), F.col("r.embedding")), 6).alias("cosine"),
    ).filter(F.col("cosine") >= 0.3)
    got = {
        (r["a"], r["b"]) for r in embedding_exact_pairs_blocked(df, 0.3, num_blocks=4).collect()
    }
    want = {(r["a"], r["b"]) for r in naive.collect()}
    assert got == want and len(want) > 0


def test_lsh_near_dup_recall_and_no_false_positives(spark):
    """OR-amplified LSH: all true near-dups found (verified exact), nothing
    below threshold survives the exact verify."""
    rng = np.random.default_rng(5)
    base = rng.standard_normal((40, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        rows.append((100 + i, [float(x) for x in v + rng.standard_normal(16) * 0.01]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {(r["a"], r["b"]) for r in embedding_near_dup_pairs(df, 0.99).collect()}
    assert {(i, 100 + i) for i in range(40)} <= got
    from quickwit_spark.operators.similarity import embedding_exact_pairs_blocked

    exact = {(r["a"], r["b"]) for r in embedding_exact_pairs_blocked(df, 0.99).collect()}
    assert got <= exact  # exact verify kills every sub-threshold candidate


def test_multimodal_audio_and_text_extract(spark):
    from quickwit_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
        extract_text,
    )

    rows = [
        (1, "audio", "audio/wav", bytearray(b"fakewav1"), None, None, 2000),
        (2, "audio", "audio/wav", bytearray(b"fakewav2"), None, None, 1000),
        (3, "doc", "application/pdf", bytearray(b"\x00\x01Hello binary world\x02\xffpdf-tail"), None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    feats = {r["media_id"]: r for r in audio_features(
        media.filter(F.col("kind") == "audio"), deterministic_fake=True
    ).collect()}
    assert set(feats) == {1, 2}
    assert feats[1]["n_samples"] == 1024 and feats[1]["rms"] > 0
    # deterministic: same payload → same features
    feats2 = {r["media_id"]: r for r in audio_features(
        media.filter(F.col("kind") == "audio"), deterministic_fake=True
    ).collect()}
    assert feats[1]["rms"] == feats2[1]["rms"]
    with pytest.raises(Exception):
        audio_features(media.filter(F.col("kind") == "audio")).collect()

    # text extraction is REAL: printable runs survive, binary noise doesn't
    txt = {r["media_id"]: r["extracted_text"] for r in extract_text(
        media.filter(F.col("kind") == "doc")
    ).collect()}
    assert txt[3] == "Hello binary world pdf-tail"


def test_near_dup_clusters_connected_components(spark):
    from quickwit_spark.operators.dedup import near_dup_clusters

    # two components: a 4-chain (1-2-3-4) and a pair (10,11); singleton 99
    # never appears in pairs so it isn't a member
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "a long, b long"
    )
    got = {
        r["member"]: r["cluster"] for r in near_dup_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_near_dup_clusters_fast_path_matches_contraction_loop(spark):
    """The small-graph single-partition fast path and the general two-level
    contraction loop must produce identical (member, cluster) labels —
    exercised on a graph mixing a long chain (stresses multi-round
    label propagation designs), a star, and reversed/duplicate edges.
    ``small_graph_edges=0`` forces the loop, the default takes the fast
    path; the loop would otherwise be untested below 200k edges."""
    from quickwit_spark.operators.dedup import near_dup_clusters

    edges = (
        [(i + 1, i) for i in range(1, 40)]          # chain 1..40 (reversed)
        + [(100, 100 + k) for k in range(1, 8)]      # star at 100
        + [(500, 501), (501, 500), (500, 501)]       # dupes both ways
    )
    pairs = spark.createDataFrame(edges, "a long, b long")
    fast = {
        r["member"]: r["cluster"] for r in near_dup_clusters(pairs).collect()
    }
    loop = {
        r["member"]: r["cluster"]
        for r in near_dup_clusters(pairs, small_graph_edges=0).collect()
    }
    assert fast == loop
    assert fast[40] == 1 and fast[107] == 100 and fast[501] == 500


def test_lang_id_more_languages(spark):
    from quickwit_spark.functions.text import lang_id_udf

    rows = [
        (1, "el rápido zorro marrón salta sobre el perro perezoso que duerme"),
        (2, "la volpe veloce salta sopra il cane pigro che dorme al sole"),
        (3, "a raposa rápida salta sobre o cão preguiçoso que dorme ao sol"),
        (4, "de snelle bruine vos springt over de luie hond van het erf"),
        (5, "быстрая коричневая лиса прыгает через ленивую собаку"),
        (6, "敏捷的棕色狐狸跳过了那只懒惰的狗然后跑进了森林里面"),
        (7, "すばやい茶色のキツネは怠け者の犬を飛び越えました"),
        (8, "الثعلب البني السريع يقفز فوق الكلب الكسول في الحديقة"),
        (9, "hızlı kahverengi tilki tembel köpeğin üzerinden atlar ve kaçar"),
    ]
    got = {
        r["id"]: r["lang"]
        for r in spark.createDataFrame(rows, ["id", "text"])
        .select("id", lang_id_udf(F.col("text")).alias("lang"))
        .collect()
    }
    assert got[1] == "es" and got[2] == "it" and got[3] == "pt"
    assert got[4] == "nl" and got[5] == "ru" and got[6] == "zh"
    assert got[7] == "ja" and got[8] == "ar" and got[9] == "tr"


def test_lang_id_vectorized_parity_with_scalar(sf_dir):
    """The vectorized lang_id_udf must agree with the row-at-a-time scalar
    reference on real corpus text + multilingual/edge fixtures (the batch
    codepoint/bincount path vs the plain str scan)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from quickwit_spark.functions.text import _lang_id_scalar, lang_id_udf

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()
    edge = [
        None, "", "short", " e e e e e e ", "the the the",
        "1234567890 !!! ???", "aaaa bbbb cccc dddd",
        "Der Hund und die Katze spielen in dem schönen Garten",
        "Le chat est sur la table et le chien dort dans la maison",
        "犬と猫は家で遊んでいます、とても楽しいです",
        "Собака и кошка играют в доме моей бабушки сегодня",
        "mixed English text avec un peu de français dedans aussi",
    ]
    texts = pd.Series(list(docs["text"]) + edge, dtype=object)
    got = list(lang_id_udf.func(texts))
    want = _lang_id_scalar(texts)
    assert got == want


def test_bmp_and_wav_real_decode(spark):
    """BMP and WAV payloads decode for REAL (pure numpy, no libs): gradient
    image features through image_features, PCM features through
    audio_features — exact expected values, no deterministic_fake."""
    import numpy as np

    from quickwit_spark.operators.multimodal import (
        _decode_bmp,
        _decode_wav,
        audio_features,
        encode_bmp,
        encode_wav_pcm16,
        image_features,
    )

    # byte-exact round-trip incl. stride padding (width 17 ≠ 4k)
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
    assert np.array_equal(_decode_bmp(encode_bmp(img)), img)

    # top-down BMP (negative height) decodes to the same pixels
    td = bytearray(encode_bmp(img))
    flipped = encode_bmp(img[::-1])
    td2 = bytearray(flipped)
    td2[22:26] = (-13).to_bytes(4, "little", signed=True)
    assert np.array_equal(_decode_bmp(bytes(td2)), img[::-1][::-1])

    # constant 16x16 gray 102 → every 8x8 feature is exactly 0.4
    gray = np.full((16, 16, 3), 102, dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, bytearray(encode_bmp(gray)))], "media_id long, payload binary"
    )
    row = image_features(media, target=(8, 8)).collect()[0]
    assert row["out_width"] == 8 and row["out_height"] == 8
    assert np.allclose(row["feat"], 0.4) and len(row["feat"]) == 64

    # WAV: a constant-amplitude square wave has RMS = amplitude and one
    # zero crossing per half period
    amp = 0.5
    wave = np.tile(np.array([amp] * 4 + [-amp] * 4, dtype=np.float32), 100)
    payload = encode_wav_pcm16(wave)
    assert np.abs(_decode_wav(payload) - wave).max() < 1e-4
    arow = audio_features(
        spark.createDataFrame([(2, bytearray(payload))], "media_id long, payload binary")
    ).collect()[0]
    assert abs(arow["rms"] - amp) < 1e-3
    assert arow["n_samples"] == 800
    assert abs(arow["zero_crossings"] - 199) <= 1

    # stereo downmix: L = -R cancels to silence
    stereo = np.zeros(400, dtype=np.float32)
    stereo[0::2], stereo[1::2] = 0.25, -0.25
    assert np.abs(_decode_wav(encode_wav_pcm16(stereo, n_channels=2))).max() < 1e-3


def test_dedup_substrings_window_semantics(spark):
    """First global occurrence of a repeated 3-token window is not a dup;
    every later occurrence (same doc or later doc) is."""
    from quickwit_spark.operators.dedup import dedup_substrings

    docs = spark.createDataFrame(
        [
            (0, "a b c d e"),        # windows: "a b c", "b c d", "c d e"
            (1, "a b c d x"),        # "a b c" dup, "b c d" dup, "c d x" new
            (2, "z z"),              # shorter than window → no rows? n<3 → 0 windows
            (3, "q q q q"),          # "q q q" ×2: second is an in-doc dup
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"])
        for r in dedup_substrings(docs, window=3).collect()
    }
    assert got[0] == (3, 0)
    assert got[1] == (3, 2)
    assert got[3] == (2, 1)
    assert 2 not in got  # too short for any window


def test_semantic_dedup_prunes_within_cluster_only(spark):
    """Planted near-identical vectors in the same cluster are dropped
    (keep-min-id); an identical-direction vector in ANOTHER cluster's cell
    is untouched — pruning is strictly intra-cluster."""
    import numpy as np

    from quickwit_spark.operators.similarity import semantic_dedup

    e1, e2 = [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]
    rows = [
        (0, e1),                    # cluster 0, kept (lowest id)
        (1, [0.999, 0.01, 0.0]),    # cluster 0, cosine≈1 to id 0 → dropped
        (2, e2),                    # cluster 1, kept
        (3, [0.01, 0.999, 0.0]),    # cluster 1, dropped vs id 2
        (4, [0.8, 0.6, 0.0]),       # cluster 0 (closer to e1), far from both → kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: (r["cluster"], r["kept"])
           for r in semantic_dedup(df, np.array([e1, e2]), threshold=0.98).collect()}
    assert out[0] == (0, True)
    assert out[1] == (0, False)
    assert out[2] == (1, True)
    assert out[3] == (1, False)
    assert out[4] == (0, True)


def test_jpeg_codec_roundtrip_and_real_files():
    """Baseline JPEG codec (operators/jpeg.py): encode→decode round-trips
    within quantization error on smooth images; flat color is exact; 4:2:0
    exercises the chroma up/downsample path; real-world baseline files from
    the box (written by real encoders with optimized Huffman tables) decode
    to their SOF dimensions without entropy-stream errors."""
    import numpy as np

    from quickwit_spark.operators.jpeg import decode_jpeg, encode_jpeg

    h, w = 40, 56
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [xx * 255 // (w - 1), yy * 255 // (h - 1), (xx + yy) * 255 // (w + h - 2)],
        axis=2,
    ).astype(np.uint8)
    for sub, tol in (("444", 3), ("420", 8)):
        dec = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub))
        assert dec.shape == (h, w, 3)
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= tol

    flat = np.full((16, 16, 3), 128, np.uint8)
    assert (decode_jpeg(encode_jpeg(flat, 90)) == 128).all()

    g = (yy * 255 // (h - 1)).astype(np.uint8)
    dg = decode_jpeg(encode_jpeg(g, quality=90))
    assert dg.shape == (h, w, 3)
    assert np.abs(dg[:, :, 0].astype(int) - g.astype(int)).max() <= 2

    import glob as _glob

    real = [
        p
        for pat in (
            "/root/.pyenv/versions/3.1*/lib/python3.1*/test/test_email/data/python.jpg",
        )
        for p in _glob.glob(pat)
    ][:1]
    for p in real:
        out = decode_jpeg(open(p, "rb").read())
        assert out.shape == (16, 16, 3)


def test_jpeg_dispatch_in_decode_image_batch():
    import numpy as np
    import pandas as pd

    from quickwit_spark.operators.jpeg import encode_jpeg
    from quickwit_spark.operators.multimodal import decode_image_batch

    img = np.full((8, 8, 3), 200, np.uint8)
    out = decode_image_batch(pd.Series([encode_jpeg(img, 90)]))
    assert out[0].shape == (8, 8, 3) and (out[0] == 200).all()


def _encode_progressive_gray(img, quality=85):
    """Test-only progressive (SOF2) grayscale emitter: spectral selection
    without successive approximation (DC scan + AC bands 1-5 and 6-63,
    Al=0). Quantized coefficients are identical to the baseline encoder's,
    so the progressive decode must produce EXACTLY the baseline-decoded
    image."""
    import struct

    import numpy as np

    from quickwit_spark.operators import jpeg as J

    ql = J._scaled_quant(J.QUANT_LUMA, quality)
    dc_bits, dc_codes, ac_bits, ac_codes = J._fixed_tables()
    P, nby, nbx = J._blocks_of(img.astype(np.float64))
    h, w = img.shape

    out = bytearray(b"\xff\xd8")
    z = ql.reshape(64)[J.ZIGZAG].astype(np.uint8)
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + z.tobytes()
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytes([0x00]) + bytes(dc_bits) + bytes(J._DC_SYMS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    dht = bytes([0x10]) + bytes(ac_bits) + bytes(J._AC_SYMS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht

    # quantized zigzag coefficients per block
    zz_blocks = []
    for by in range(nby):
        for bx in range(nbx):
            blk = P[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
            coef = np.round(J._dct2(blk - 128.0) / ql).astype(np.int64)
            zz_blocks.append(coef.reshape(64)[J.ZIGZAG])

    def cat(v):
        return 0 if v == 0 else int(abs(v)).bit_length()

    def sos(comps_spec, ss, se):
        body = bytes([1, 1, 0x00, ss, se, 0x00])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    # scan 1: DC
    out += sos(1, 0, 0)
    bw = J._BitWriter()
    pred = 0
    for zzb in zz_blocks:
        diff = int(zzb[0]) - pred
        pred = int(zzb[0])
        t = cat(diff)
        ln, code = dc_codes[t]
        bw.write(code, ln)
        if t:
            bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    bw.flush()
    out += bw.out
    # scans 2-3: AC bands (EOB per block, run=0 → EOBRUN=1)
    for ss, se in ((1, 5), (6, 63)):
        out += sos(1, ss, se)
        bw = J._BitWriter()
        for zzb in zz_blocks:
            k = ss
            last_nz = max([i for i in range(ss, se + 1) if zzb[i] != 0], default=ss - 1)
            while k <= last_nz:
                run = 0
                while zzb[k] == 0:
                    run += 1
                    k += 1
                while run > 15:
                    ln, code = ac_codes[0xF0]
                    bw.write(code, ln)
                    run -= 16
                v = int(zzb[k])
                t = cat(v)
                ln, code = ac_codes[(run << 4) | t]
                bw.write(code, ln)
                bw.write(v if v >= 0 else v + (1 << t) - 1, t)
                k += 1
            if last_nz < se:
                ln, code = ac_codes[0x00]  # EOB (EOBRUN = 1)
                bw.write(code, ln)
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def test_progressive_jpeg_exact_vs_baseline():
    """Progressive (SOF2) spectral-selection decode must reproduce the
    baseline decode EXACTLY — same quantized coefficients, two different
    entropy layouts. Also: real-world progressive files (written by real
    encoders with successive approximation + EOB runs) decode through all
    scans without entropy desync."""
    import numpy as np

    from quickwit_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=85))
    prog = decode_jpeg(_encode_progressive_gray(img, quality=85))
    assert (base == prog).all()

    import os

    real = "/root/reference/docs/assets/images/screenshot-indexer-grafana-dashboard.jpeg"
    if os.path.exists(real):
        out = decode_jpeg(open(real, "rb").read())
        assert out.shape == (280, 900, 3)
        assert 10 < out.mean() < 120  # plausible dark dashboard, not garbage


def _encode_gray_with_dri(img, quality=85, dri=1):
    """Test-only baseline grayscale emitter with restart markers every
    ``dri`` MCUs — our encoder never emits DRI, so this exercises the
    decoder's restart path (byte-align + RSTn + predictor reset)."""
    import struct

    import numpy as np

    from quickwit_spark.operators import jpeg as J

    ql = J._scaled_quant(J.QUANT_LUMA, quality)
    dc_bits, dc_codes, ac_bits, ac_codes = J._fixed_tables()
    P, nby, nbx = J._blocks_of(img.astype(np.float64))
    h, w = img.shape
    out = bytearray(b"\xff\xd8")
    z = ql.reshape(64)[J.ZIGZAG].astype(np.uint8)
    out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([0]) + z.tobytes()
    out += b"\xff\xdd" + struct.pack(">HH", 4, dri)  # DRI
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dht = bytes([0x00]) + bytes(dc_bits) + bytes(J._DC_SYMS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    dht = bytes([0x10]) + bytes(ac_bits) + bytes(J._AC_SYMS)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    blocks = [P[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
              for by in range(nby) for bx in range(nbx)]
    pred = 0
    rst = 0
    bw = J._BitWriter()
    for i, blk in enumerate(blocks):
        if i and i % dri == 0:
            bw.flush()
            out += bw.out  # byte-align the interval, then the marker
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            pred = 0
            bw = J._BitWriter()
        pred = J._encode_component(bw, [blk], ql, pred, dc_codes, ac_codes)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_restart_markers_exact():
    """Restart intervals must decode identically to the no-DRI stream for
    EVERY interval length — including lengths that land exactly on the bit
    reader's 4-byte fill boundary (the case where the RST marker is not yet
    buffered when the decoder realigns)."""
    import numpy as np

    from quickwit_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    for trial in range(12):
        img = rng.integers(0, 256, (16, 32), dtype=np.uint8)
        want = decode_jpeg(encode_jpeg(img, quality=85))
        for dri in (1, 2, 3):
            got = decode_jpeg(_encode_gray_with_dri(img, quality=85, dri=dri))
            assert (got == want).all(), f"trial {trial} dri {dri}"


def test_jpeg_noninterleaved_baseline_scans():
    """Spec-legal baseline with one scan per component (SOF0 + three SOS)
    must decode like the interleaved stream — exercised by transcoding our
    interleaved 4:4:4 encoder output into per-component scans."""
    import struct

    import numpy as np

    from quickwit_spark.operators import jpeg as J

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    want = J.decode_jpeg(J.encode_jpeg(img, quality=85, subsampling="444"))

    # rebuild the same stream with three non-interleaved scans
    ql = J._scaled_quant(J.QUANT_LUMA, 85)
    qc = J._scaled_quant(J.QUANT_CHROMA, 85)
    dc_bits, dc_codes, ac_bits, ac_codes = J._fixed_tables()
    R, G, B = (img[..., c].astype(np.float64) for c in range(3))
    Y = 0.299 * R + 0.587 * G + 0.114 * B
    Cb = -0.168736 * R - 0.331264 * G + 0.5 * B + 128
    Cr = 0.5 * R - 0.418688 * G - 0.081312 * B + 128
    out = bytearray(b"\xff\xd8")
    for tid, q in ((0, ql), (1, qc)):
        z = q.reshape(64)[J.ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + z.tobytes()
    sof = struct.pack(">BHHB", 8, 16, 16, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, tid in ((0, 0), (1, 0), (0, 1), (1, 1)):
        syms = J._DC_SYMS if cls == 0 else J._AC_SYMS
        bits = dc_bits if cls == 0 else ac_bits
        dht = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    for cid, plane, q in ((1, Y, ql), (2, Cb, qc), (3, Cr, qc)):
        out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, cid, 0x00, 0, 63, 0])
        P, nby, nbx = J._blocks_of(plane)
        bw = J._BitWriter()
        pred = 0
        for by in range(nby):
            for bx in range(nbx):
                pred = J._encode_component(
                    bw, [P[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]], q, pred,
                    dc_codes, ac_codes,
                )
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
    got = J.decode_jpeg(bytes(out))
    assert (got == want).all()


def test_jpeg_malformed_payload_fake_fallback():
    import numpy as np
    import pandas as pd

    from quickwit_spark.operators.multimodal import decode_image_batch

    truncated = b"\xff\xd8\xff\xe0" + b"\x00" * 8  # JPEG magic, cut off
    out = decode_image_batch(pd.Series([truncated]), deterministic_fake=True)
    assert out[0].shape == (16, 16, 3)  # seeded stand-in, batch survives
    import pytest as _pytest

    with _pytest.raises(Exception):
        decode_image_batch(pd.Series([truncated]))


def test_jpeg_fuzz_mutations_never_hang_or_crash_unbounded():
    """Byte-mutation fuzz over a valid stream: every mutation either decodes
    or raises a normal exception quickly — no infinite marker-walk loops
    (zero-length segments), no unbounded allocations (corrupt SOF dims)."""
    import numpy as np

    from quickwit_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(21)
    base = bytearray(encode_jpeg(
        rng.integers(0, 256, (16, 16, 3), dtype=np.uint8), quality=85))
    for _ in range(300):
        b = bytearray(base)
        for _ in range(rng.integers(1, 4)):
            b[rng.integers(2, len(b))] = rng.integers(0, 256)
        try:
            out = decode_jpeg(bytes(b))
            assert out.nbytes < 16 << 20
        except (ValueError, NotImplementedError, IndexError, KeyError) as _:
            pass
        except Exception as e:  # struct.error etc. — fine, just typed
            assert type(e).__name__ in ("error",), e


def test_gif_codec_roundtrip_and_real_files():
    """GIF LZW decode: exact round-trip via the fixture encoder (clear-code
    literal stream) AND real-world files with genuine variable-width LZW
    (CPython test icons incl. an interlace-free multi-block stream)."""
    import os

    import numpy as np
    import pandas as pd

    from quickwit_spark.operators.multimodal import (
        _decode_gif,
        decode_image_batch,
        encode_gif,
    )

    rng = np.random.default_rng(9)
    img = rng.integers(0, 4, (20, 30, 3), dtype=np.uint8) * 80
    assert (_decode_gif(encode_gif(img)) == img).all()

    real = "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/data/python.gif"
    if os.path.exists(real):
        out = _decode_gif(open(real, "rb").read())
        assert out.shape == (16, 16, 3)

    # dispatch through the batch decoder
    got = decode_image_batch(pd.Series([encode_gif(img)]))
    assert (got[0] == img).all()


def test_semantic_dedup_hot_cluster_tiled_exact(spark):
    """VERDICT r3 item 4: a viral cluster must not become one O(m²) task.
    The tiled path (max_cluster_rows exceeded) must return EXACTLY the
    single-task result, and its tile groups must stay bounded."""
    import numpy as np

    from quickwit_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(42)
    dim = 8
    # viral cluster: 300 vectors all near e0 (many mutual near-dups), plus a
    # handful of cold-cluster rows
    e0 = np.eye(dim)[0]
    e1 = np.eye(dim)[1]
    rows = []
    for i in range(300):
        v = e0 + rng.standard_normal(dim) * (0.001 if i % 3 == 0 else 0.3)
        rows.append((i, [float(x) for x in v]))
    for i in range(300, 310):
        v = e1 + rng.standard_normal(dim) * 0.2
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    centroids = np.stack([e0, e1])

    uncapped = {
        (r["vec_id"], r["cluster"], r["kept"])
        for r in semantic_dedup(df, centroids, threshold=0.95,
                                max_cluster_rows=100_000).collect()
    }
    capped = {
        (r["vec_id"], r["cluster"], r["kept"])
        for r in semantic_dedup(df, centroids, threshold=0.95,
                                max_cluster_rows=50).collect()
    }
    assert capped == uncapped
    assert len(capped) == 310

    # bounded per-tile group size: replicate the block assignment (same
    # formula as _semantic_dedup_tiled) and assert no tile gathers more
    # than ~2 blocks' worth of rows
    nb = -(-300 // 50)  # ceil
    viral = df.filter(F.col("vec_id") < 300).withColumn(
        "_blk", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(nb))
    )
    blk_counts = [r["count"] for r in viral.groupBy("_blk").count().collect()]
    max_tile = 2 * max(blk_counts)
    assert max_tile < 300, "tiling must cap per-task rows below cluster size"


def test_ivf_assignment_plan_shape_large_codebook(spark, sf_dir):
    """VERDICT r3 item 6: IVF centroid assignment must be a single
    Arrow-batched UDF (matmul), not an O(c)-deep CASE chain — with 1k
    centroids the plan contains one ArrowEvalPython and zero CaseWhen over
    centroid literals."""
    import numpy as np

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()[0])
    rng = np.random.default_rng(9)
    centroids = rng.standard_normal((1000, dim))
    q = [float(x) for x in rng.standard_normal(dim)]
    out = ivf_topk(emb, q, centroids, k=3, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "CASE WHEN" not in plan
    assert out.count() <= 3  # and it actually runs at c=1000


def test_ivf_matmul_assignment_matches_exact(spark, sf_dir):
    """Probing every cell of the matmul-assigned IVF equals brute force —
    assignment cannot lose vectors."""
    import numpy as np

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()
    q = list(emb.filter(F.col("vec_id") == 1).first()["embedding"])
    dim = len(q)
    rng = np.random.default_rng(17)
    centroids = rng.standard_normal((16, dim)) * 0.1
    got = ivf_topk(emb, q, centroids, k=5, n_probe=16).collect()
    exact = cosine_topk(emb, q, k=5).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]


def test_all_codecs_malformed_payload_fake_fallback():
    """ADVICE r3: corrupt-payload handling is uniform across codecs — a
    truncated GIF/PNG/BMP behaves exactly like a truncated JPEG: seeded
    stand-in with deterministic_fake=True, raised error without."""
    import pandas as pd
    import pytest as _pytest

    from quickwit_spark.operators.multimodal import decode_image_batch

    corrupt = [
        b"GIF89a" + b"\x01\x00\x01\x00" + b"\x00" * 3,     # truncated GIF
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 12,               # truncated PNG
        b"BM" + b"\x00" * 10,                              # truncated BMP
        b"\x89PNG\r\n\x1a\n" + bytes(range(40)),           # garbage chunks
    ]
    out = decode_image_batch(pd.Series(corrupt), deterministic_fake=True)
    for arr in out:
        assert arr.shape == (16, 16, 3)  # every payload got a stand-in
    for p in corrupt:
        with _pytest.raises(Exception):
            decode_image_batch(pd.Series([p]))


def test_pq_encode_and_adc_topk(spark, sf_dir):
    """PQ/ADC: codes are the per-subspace argmin; ADC distance of an
    EXACTLY-representable vector (one of the codebook rows) is 0; the
    codegen (pre-encoded) and encode-on-the-fly paths agree; recall vs
    exact brute force is sane for a quantizer this coarse."""
    import numpy as np

    from quickwit_spark.operators.similarity import (
        cosine_topk,
        pq_codebooks_from_rows,
        pq_encode,
        pq_topk,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")).cache()
    sample = np.stack([
        np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.limit(64).collect()
    ])
    books = pq_codebooks_from_rows(sample, m=8, ksub=16)
    assert books.shape == (8, 16, 8)

    q = [float(x) for x in sample[0]]
    encoded = pq_encode(emb, books).cache()
    # codes are valid indices
    row = encoded.first()
    assert len(row["codes"]) == 8 and all(0 <= c < 16 for c in row["codes"])

    fly = pq_topk(emb, q, books, k=10).collect()
    pre = pq_topk(encoded, q, books, k=10, codes_col="codes").collect()
    assert [tuple(r) for r in fly] == [tuple(r) for r in pre]

    # the pre-encoded path is pure codegen: encode once at ingest (write
    # codes to parquet), query forever with no Python in the plan
    import tempfile

    pq_dir = tempfile.mkdtemp(prefix="qs_pq_")
    encoded.write.mode("overwrite").parquet(pq_dir)
    stored = spark.read.parquet(pq_dir)
    plan = pq_topk(stored, q, books, k=10, codes_col="codes") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    stored_top = pq_topk(stored, q, books, k=10, codes_col="codes").collect()
    assert [tuple(r) for r in stored_top] == [tuple(r) for r in pre]

    # recall@10 against exact cosine top-10 (loose: PQ is approximate)
    exact_ids = {r["vec_id"] for r in cosine_topk(emb, q, k=10).collect()}
    pq_ids = {r["vec_id"] for r in pre}
    assert len(exact_ids & pq_ids) >= 3

    # exactness check on a frame OF centroid combinations: a database
    # vector assembled from codebook centroids quantizes losslessly, so
    # its ADC equals the true squared distance, computed by hand
    rows = []
    for i in range(4):
        v = np.concatenate([books[j][(i * 3 + j) % 16] for j in range(8)])
        rows.append((i, [float(x) for x in v]))
    toy = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["adc"]
           for r in pq_topk(toy, q, books, k=4).collect()}
    qv = np.asarray(q)
    for i, v in rows:
        expected = round(float(((np.asarray(v) - qv) ** 2).sum()), 6)
        assert abs(got[i] - expected) < 1e-4


class TestKnnRecall:
    """knn_recall — the measured recall@k harness over exact ground truth."""

    def test_hand_computed(self, spark):
        from quickwit_spark.operators.similarity import (
            knn_recall, knn_recall_per_query,
        )

        truth = spark.createDataFrame(
            [("q1", 1), ("q1", 2), ("q1", 3), ("q2", 7), ("q2", 8), ("q2", 9)],
            ["qid", "vec_id"],
        )
        approx = spark.createDataFrame(
            # q1: 2/3 right; q2: nothing returned
            [("q1", 1), ("q1", 3), ("q1", 99)], ["qid", "vec_id"],
        )
        per = {r["qid"]: r for r in knn_recall_per_query(truth, approx, k=3).collect()}
        assert per["q1"]["n_hits"] == 2 and per["q1"]["recall"] == pytest.approx(2 / 3)
        assert per["q2"]["n_hits"] == 0 and per["q2"]["recall"] == 0.0
        summary = knn_recall(truth, approx, k=3).collect()[0]
        assert summary["n_queries"] == 2
        assert summary["mean_recall"] == pytest.approx(1 / 3, abs=1e-6)
        assert summary["min_recall"] == 0.0

    def test_ivf_recall_measured_against_brute_force(self, spark, sf_dir):
        import os

        import numpy as np

        from quickwit_spark.operators.similarity import (
            cosine_topk, ivf_topk, knn_recall,
        )

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        rows = emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
        centroids = np.array([r["embedding"] for r in rows], dtype=np.float64)
        qrow = emb.filter(F.col("vec_id") == 3).collect()[0]
        q = list(qrow["embedding"])

        truth = cosine_topk(emb, q, k=10).select(
            F.lit("q").alias("qid"), "vec_id"
        )
        # probing EVERY cell must reproduce the exact result (recall 1)
        full = ivf_topk(emb, q, centroids, k=10, n_probe=len(centroids)).select(
            F.lit("q").alias("qid"), "vec_id"
        )
        assert knn_recall(truth, full, k=10).collect()[0]["mean_recall"] == 1.0
        # a 2-cell probe is lossy-but-useful: strictly positive recall
        part = ivf_topk(emb, q, centroids, k=10, n_probe=2).select(
            F.lit("q").alias("qid"), "vec_id"
        )
        r = knn_recall(truth, part, k=10).collect()[0]["mean_recall"]
        assert 0.0 < r <= 1.0
