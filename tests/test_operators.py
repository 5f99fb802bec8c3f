"""LLM-pipeline operators over the driver testdata (sf0.001)."""

import pytest
from pyspark.sql import functions as F

from psweep_spark.operators import (
    brute_force_topk,
    embedding_near_dup_pairs,
    exact_dedup,
    jaccard_pairs,
    lsh_topk,
    minhash_dedup,
    minhash_signatures,
    quality_score,
    simhash,
    text_stats,
    word_shingles,
)
from psweep_spark.operators.multimodal import (
    attach_fake_media,
    audio_features,
    decode_images,
    resize_images,
    sample_frames,
)
from psweep_spark.operators.text import doc_fingerprint, lang_id


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_text_stats(docs):
    out = text_stats(docs).limit(50).collect()
    for r in out:
        assert r["n_tokens"] > 0
        assert r["n_chars_calc"] == len(r["text"])
        assert 0 <= r["stopword_ratio"] <= 1
        assert 0 <= r["punct_ratio"] <= 1


def test_quality_score_bounds(docs):
    out = quality_score(docs)
    lo, hi = out.agg(F.min("quality_score"), F.max("quality_score")).first()
    assert 0.0 <= lo <= hi <= 1.0


def test_lang_id_deterministic(docs):
    out = lang_id(docs).select("doc_id", "lang_pred").limit(20).collect()
    assert all(r["lang_pred"] in ("en", "de", "es", "fr") for r in out)
    again = lang_id(docs).select("doc_id", "lang_pred").limit(20).collect()
    assert out == again


def test_fingerprints(docs):
    out = doc_fingerprint(docs).select("doc_id", "fp_exact", "fp_min3gram")
    rows = out.collect()
    assert all(len(r["fp_exact"]) == 32 for r in rows)
    # identical texts share fp_exact; our corpus texts are all distinct
    assert out.select("fp_exact").distinct().count() == out.count()


def test_exact_dedup_with_injected_dups(spark, docs):
    # inject exact duplicates with new ids
    dup = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
    both = docs.unionByName(dup)
    out = exact_dedup(both)
    assert out.count() == docs.count()  # 5 dups collapsed
    assert out.filter(F.col("dup_count") == 2).count() == 5
    # winner is always the smaller id (original)
    assert out.filter(
        (F.col("dup_count") == 2) & (F.col("keep_id") >= 100000)
    ).count() == 0


def test_jaccard_pairs_self_similarity(spark, docs):
    d5 = docs.limit(5)
    dup = d5.withColumn("doc_id", F.col("doc_id") + 100000)
    pairs = jaccard_pairs(d5.unionByName(dup), threshold=0.99)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    exp = {(r["doc_id"], r["doc_id"] + 100000) for r in d5.collect()}
    assert exp <= got


def test_minhash_matches_exact_jaccard_on_dups(spark, docs):
    d = docs.limit(30)
    dup = d.limit(6).withColumn("doc_id", F.col("doc_id") + 100000)
    both = d.unionByName(dup)
    near = minhash_dedup(both, num_hashes=12, bands=4, threshold=0.9)
    got = {(r["id_a"], r["id_b"]) for r in near.collect()}
    exp = {(r["doc_id"], r["doc_id"] + 100000) for r in d.limit(6).collect()}
    assert exp <= got
    # verified jaccard values are exact
    for r in near.collect():
        if (r["id_a"], r["id_b"]) in exp:
            assert r["jaccard"] == 1.0


def test_minhash_hot_bucket_cap_bounds_degenerate_corpus(spark):
    """VERDICT r01 #4: 10^4 identical docs share every band bucket — the
    cap must bound the in-bucket expansion (completes fast, candidate
    count = C(cap, 2), not C(10^4, 2) ≈ 5·10^7) and still report the
    duplicate pairs among the kept ids, all exact-verified at 1.0."""
    n, cap = 10_000, 64
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated in every document").alias(
            "text"
        ),
    )
    pairs = minhash_dedup(
        docs, num_hashes=12, bands=4, threshold=0.9,
        max_bucket_size=cap, log_dropped=True,
    )
    rows = pairs.collect()
    # identical signatures → every band keeps the SAME first `cap` ids →
    # exactly C(cap,2) distinct pairs
    assert len(rows) == cap * (cap - 1) // 2
    assert all(r["jaccard"] == 1.0 for r in rows)
    assert all(r["id_a"] < cap and r["id_b"] < cap for r in rows)


def test_minhash_cap_does_not_change_normal_results(spark, docs):
    """On a non-degenerate corpus the cap is a no-op: same pairs with
    and without it."""
    d = docs.limit(30)
    dup = d.limit(6).withColumn("doc_id", F.col("doc_id") + 100000)
    both = d.unionByName(dup)
    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup(
            both, num_hashes=12, bands=4, threshold=0.9, max_bucket_size=512
        ).collect()
    }
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup(
            both, num_hashes=12, bands=4, threshold=0.9, max_bucket_size=None
        ).collect()
    }
    assert capped == uncapped


def test_minhash_incremental_new_vs_corpus_only(spark, docs):
    """Incremental dedup returns only (new, corpus) pairs: a dup pair
    inside the new batch is NOT reported; a new doc duplicating a
    corpus doc is."""
    from psweep_spark.operators.dedup import minhash_dedup_incremental

    corpus = docs.limit(20)
    # new batch: one dup of corpus doc, plus two identical new docs
    dup_of_corpus = corpus.limit(1).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    twin_a = corpus.limit(1).withColumn("doc_id", F.col("doc_id") + 200000)
    twin_b = corpus.limit(1).withColumn("doc_id", F.col("doc_id") + 300000)
    new = dup_of_corpus.unionByName(twin_a).unionByName(twin_b)
    out = minhash_dedup_incremental(new, corpus, threshold=0.9)
    rows = out.collect()
    new_ids = {r["id_new"] for r in rows}
    old_ids = {r["id_old"] for r in rows}
    assert all(i >= 100000 for i in new_ids)
    assert all(i < 100000 for i in old_ids)  # never new×new
    # every new doc (all three duplicate corpus doc 0) matches it
    base = corpus.limit(1).collect()[0]["doc_id"]
    assert {(i, base) for i in (base + 100000, base + 200000, base + 300000)} <= {
        (r["id_new"], r["id_old"]) for r in rows
    }


def test_banding_expr_memoized_builds_identical(spark, docs):
    """r11: the shingle/signature/banding Column trees are lru_cache-
    memoized (an unresolved Column is immutable — the analyzer resolves
    a copy per plan), cutting ~340 ms of py4j round-trips per build in
    the per-micro-batch paths.  Two independent builds must hit the
    cache AND produce identical relations."""
    from psweep_spark.operators import dedup as D

    a = D._stacked_buckets(docs, 12, 4, 3, "doc_id", "text")
    hits0 = D._banded_expr.cache_info().hits
    b = D._stacked_buckets(docs, 12, 4, 3, "doc_id", "text")
    assert D._banded_expr.cache_info().hits > hits0
    ra = sorted(map(tuple, a.collect()))
    assert ra == sorted(map(tuple, b.collect())) and len(ra) > 0


def test_jaccard_pairs_hashed_join_matches_string_join(spark, docs):
    """r11: jaccard_pairs runs its shingle self-join in 64-bit hash
    space (xxhash64 of the shingle instead of the raw string — ~3x
    fewer shuffle bytes).  Pair set AND jaccard values must be
    identical to the string-shingle formulation — the hash only
    relabels the join key; counts change only on a 64-bit collision
    inside one pair's union (~1e-16/pair, absent here)."""
    from psweep_spark.operators.dedup import (
        jaccard_pairs,
        shingled,
        word_shingles,
    )

    d = docs.limit(40)
    dup = d.limit(8).withColumn("doc_id", F.col("doc_id") + 100000)
    both = d.unionByName(dup)

    got = sorted(map(tuple, jaccard_pairs(both, threshold=0.3).collect()))

    # reference: the pre-r11 string-key formulation, inlined
    sh = word_shingles(both).repartition("shingle")
    sizes = shingled(both).select(
        "id", F.coalesce(F.size("__sh"), F.lit(-1)).alias("sz")
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    ref = (
        inter.join(
            sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"),
            "id_a",
        )
        .join(
            sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= 0.3)
        .select("id_a", "id_b", "jaccard")
    )
    exp = sorted(map(tuple, ref.collect()))
    assert got == exp and len(got) > 0


def test_jaccard_shingle_df_cap_lower_bounds(spark, docs):
    """With a df cap, reported jaccard is a lower bound of the exact
    value and exact-duplicate pairs (sharing rare shingles too)
    survive."""
    from psweep_spark.operators.dedup import jaccard_pairs

    d5 = docs.limit(5)
    dup = d5.withColumn("doc_id", F.col("doc_id") + 100000)
    both = d5.unionByName(dup)
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(both, threshold=0.3).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(both, threshold=0.3, max_shingle_df=4).collect()
    }
    for k, v in capped.items():
        assert v <= exact[k] + 1e-9
    # exact dups still found (their rare shingles are below any df cap
    # shared by only the pair)
    exp = {(r["doc_id"], r["doc_id"] + 100000) for r in d5.collect()}
    assert exp <= set(capped)


def test_minhash_signatures_shape(docs):
    sig = minhash_signatures(docs.limit(10), num_hashes=8)
    assert sig.count() == 10
    assert sum(c.startswith("mh_") for c in sig.columns) == 8


def test_minhash_signatures_known_answer(spark):
    """Pin signatures against an independent Python recomputation.

    Regression for the round-5 sf0.1 recall bug: a TWO-parameter
    transform lambda gets (element, array_index) from pyspark, so a
    `lambda h, i=i:` family closure had its family index shadowed by
    the shingle position — all k families collapsed to one
    position-mixed hash (identical mh_0..mh_{k-1} per doc, ~4% of
    true pairs lost at sf0.1).  The Python reference computes each
    family with explicit indices, so any arity/capture slip diverges.

    The expected values use :func:`minhash_family_constants` (the
    shared engine/oracle definition), plus an independent inline
    recomputation of the splitmix64 finalizer for family 0 so a
    drifting shared helper can't silently re-pin the test.
    """
    import hashlib

    from psweep_spark.operators.dedup import minhash_family_constants

    # independent recomputation of family 0's constants (splitmix64)
    x = 0x9E3779B97F4A7C15
    x ^= x >> 30
    x = x * 0xBF58476D1CE4E5B9 % 2**64
    x ^= x >> 27
    x = x * 0x94D049BB133111EB % 2**64
    x ^= x >> 31
    assert minhash_family_constants(0) == (
        1 + x % 2147483646,
        (x >> 33) % 2147483647,
    )
    # families must be pairwise distinct and multipliers LARGE —
    # tiny multipliers are the r11 correlated-family recall bug
    consts = [minhash_family_constants(i) for i in range(12)]
    assert len(set(consts)) == 12
    assert min(a for a, _ in consts) > 1_000_000

    texts = [
        (1, "small join join merge scan group a big join key"),
        (2, "the quick brown fox jumps over the lazy dog today ok"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["id"]: [int(r[f"mh_{i}"]) for i in range(12)]
        for r in minhash_signatures(df, num_hashes=12, n=3).collect()
    }
    for doc_id, text in texts:
        toks = text.split()
        shingles = sorted({" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)})
        h30 = [
            int(hashlib.md5(s.encode()).hexdigest()[:15], 16) & ((1 << 30) - 1)
            for s in shingles
        ]
        exp = [
            min(
                (consts[i][0] * h + consts[i][1]) % 2147483647
                for h in h30
            )
            for i in range(12)
        ]
        assert got[doc_id] == exp, doc_id
    # the degenerate failure mode: all families equal — must not happen
    assert len(set(got[1])) > 1 and len(set(got[2])) > 1


def test_simhash_identical_for_dups(spark, docs):
    d = docs.limit(8)
    dup = d.withColumn("doc_id", F.col("doc_id") + 100000)
    fp = simhash(d.unionByName(dup))
    rows = {r["id"]: r["simhash"] for r in fp.collect()}
    for r in d.collect():
        assert rows[r["doc_id"]] == rows[r["doc_id"] + 100000]


def test_embedding_near_dup(spark, emb):
    dup = emb.limit(4).withColumn("vec_id", F.col("vec_id") + 100000)
    pairs = embedding_near_dup_pairs(emb.unionByName(dup), threshold=0.999999)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    exp = {(r["vec_id"], r["vec_id"] + 100000) for r in emb.limit(4).collect()}
    assert exp <= got


def test_brute_force_topk(spark, emb):
    queries = emb.filter(F.col("vec_id") < 3).withColumnRenamed(
        "vec_id", "query_id"
    )
    out = brute_force_topk(emb, queries, k=5)
    rows = out.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = [r["rank"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert ranks == [1, 2, 3, 4, 5]
        cosines = [r["cosine"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r["vec_id"] != q for r in rs)


def test_lsh_finds_near_duplicates(spark, emb):
    # LSH's job: retrieve genuinely high-cosine neighbors.  A scaled
    # copy has cosine 1.0 and the identical sign pattern -> same bucket.
    dup = emb.limit(10).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
        "label",
    )
    corpus = emb.unionByName(dup)
    queries = emb.limit(10).withColumnRenamed("vec_id", "query_id")
    out = lsh_topk(corpus, queries, k=1, num_planes=8)
    got = {(r["query_id"], r["vec_id"]): r["cosine"] for r in out.collect()}
    for q in [r["query_id"] for r in queries.select("query_id").collect()]:
        assert got.get((q, q + 100000)) == 1.0, f"near-dup of {q} not found"


def test_lsh_multiprobe_beats_single_probe(spark, emb):
    queries = emb.filter(F.col("vec_id") < 20).withColumnRenamed(
        "vec_id", "query_id"
    )
    exact = brute_force_topk(emb, queries, k=3)
    single = lsh_topk(emb, queries, k=3, num_planes=4, multiprobe=0)
    multi = lsh_topk(emb, queries, k=3, num_planes=4, multiprobe=1)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    s = {(r["query_id"], r["vec_id"]) for r in single.collect()}
    m = {(r["query_id"], r["vec_id"]) for r in multi.collect()}
    assert len(e & m) >= len(e & s)


def test_multimodal_plumbing(spark, docs):
    media = attach_fake_media(docs.limit(20))
    feats = decode_images(media)
    rows = feats.collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r["feature"]) == 8
        assert all(0 <= x <= 1 for x in r["feature"])
        assert r["width"] >= 32
    # determinism
    again = decode_images(media).collect()
    assert sorted(r["doc_id"] for r in again) == sorted(r["doc_id"] for r in rows)
    frames = sample_frames(media, every_n=4)
    f = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] >= 1 for r in f)
    with pytest.raises(NotImplementedError):
        decode_images(media, fake=False)


def test_multimodal_resize(spark, docs):
    import hashlib

    media = attach_fake_media(docs.limit(20))
    out = {r["doc_id"]: r for r in resize_images(media, scale=0.5).collect()}
    src = {r["doc_id"]: r for r in media.collect()}
    assert set(out) == set(src)
    for did, r in out.items():
        m = src[did]["media_meta"]
        assert r["media_meta"]["width"] == max(m["width"] // 2, 1)
        assert r["media_meta"]["height"] == max(m["height"] // 2, 1)
        # payload is opaque binary derived deterministically from input
        want = hashlib.sha256(
            bytes(src[did]["media"])
            + f'{r["media_meta"]["width"]}x{r["media_meta"]["height"]}'.encode()
        ).hexdigest().encode()
        assert bytes(r["media"]) == want
    # chains: resized output still decodes (binary column stays opaque)
    assert decode_images(resize_images(media)).count() == 20
    with pytest.raises(NotImplementedError):
        resize_images(media, fake=False)


def test_multimodal_audio_features(spark, docs):
    media = attach_fake_media(docs.limit(20))
    out = audio_features(media, frame_size=16).collect()
    src = {r["doc_id"]: bytes(r["media"]) for r in media.collect()}
    assert len(out) == 20
    for r in out:
        payload = src[r["doc_id"]]
        # sha256-hex payload = 64 bytes -> 4 full frames of 16
        assert r["n_frames"] == 4
        assert len(r["frame_energy"]) == 4
        want0 = sum(payload[:16]) / 16.0
        assert abs(r["frame_energy"][0] - want0) < 1e-9
    with pytest.raises(NotImplementedError):
        audio_features(media, fake=False)


def test_asof_join_semantics(spark):
    from datetime import datetime as dt

    from psweep_spark.operators.asof import asof_join

    L = spark.createDataFrame(
        [(1, "u", dt(2024, 1, 1, 0, 0, 10)), (2, "u", dt(2024, 1, 1, 0, 0, 20)),
         (3, "v", dt(2024, 1, 1, 0, 0, 5)), (4, "w", dt(2024, 1, 1, 0, 0, 30))],
        "id long, user string, ts timestamp",
    )
    R = spark.createDataFrame(
        [("u", dt(2024, 1, 1, 0, 0, 8), 1.0),
         ("u", dt(2024, 1, 1, 0, 0, 20), 2.0),   # exact match for id=2
         ("u", dt(2024, 1, 1, 0, 0, 25), 9.0),   # after both L(u) rows
         ("v", dt(2024, 1, 1, 0, 0, 6), 3.0)],   # after L(v) row
        "user string, ts timestamp, val double",
    )
    out = {r["id"]: r for r in asof_join(L, R, on="ts", by="user").collect()}
    assert out[1]["val_r"] == 1.0              # nearest preceding
    assert out[2]["val_r"] == 2.0              # exact ts matches
    assert out[3]["val_r"] is None             # no preceding right row
    assert out[4]["val_r"] is None             # key with no right rows
    # forward direction: nearest following
    fwd = {r["id"]: r for r in
           asof_join(L, R, on="ts", by="user", direction="forward").collect()}
    assert fwd[1]["val_r"] == 2.0              # 0:20 is next after 0:10
    assert fwd[2]["val_r"] == 2.0              # exact match still wins
    assert fwd[3]["val_r"] == 3.0
    # tolerance: id=1 match is 2s away; 1s tolerance nulls it
    tol = {r["id"]: r for r in
           asof_join(L, R, on="ts", by="user", tolerance_us=1_000_000).collect()}
    assert tol[1]["val_r"] is None
    assert tol[2]["val_r"] == 2.0              # distance 0 survives


def test_asof_join_single_shuffle(spark):
    import os

    from psweep_spark import plans
    from psweep_spark.queries_catalog import QUERIES

    sf = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    j = QUERIES["events_asof_join"](spark, sf)
    assert plans.count_exchanges(j) == 1


def test_range_join_bucketed_semantics(spark):
    from datetime import datetime as dt

    from psweep_spark.operators.rangejoin import range_join_bucketed

    pts = spark.createDataFrame(
        [(1, "u", dt(2024, 1, 1, 0, 5)), (2, "u", dt(2024, 1, 1, 1, 0)),
         (3, "v", dt(2024, 1, 1, 0, 5)), (4, "u", dt(2024, 1, 1, 0, 10))],
        "pid long, user string, pts timestamp",
    )
    iv = spark.createDataFrame(
        # [0:00, 0:10] inclusive bounds; a long interval spanning many buckets
        [("u", dt(2024, 1, 1, 0, 0), dt(2024, 1, 1, 0, 10), 100),
         ("u", dt(2024, 1, 1, 0, 50), dt(2024, 1, 1, 2, 0), 200),
         ("v", dt(2024, 1, 1, 0, 4), dt(2024, 1, 1, 0, 6), 300)],
        "user string, s timestamp, e timestamp, iid long",
    )
    out = range_join_bucketed(
        pts, iv, point_col="pts", start_col="s", end_col="e", by="user",
        bucket_width_us=60_000_000,  # 1 min buckets: intervals replicate
    ).collect()
    got = {(r["pid"], r["iid"]) for r in out}
    assert got == {(1, 100), (2, 200), (3, 300), (4, 100)}
    # no duplicate pairs despite interval replication across buckets
    assert len(out) == len(got)
    # inclusive end bound: pid=4 at exactly 0:10
    # key isolation: pid=3 (user v) never matches user-u intervals


def test_salted_join_matches_plain_join(spark):
    """salted_join must be salt-invariant: identical multiset result to
    the unsalted join, under every supported join type."""
    from psweep_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d"), (3, "e"), (4, "f")],
        "k int, lv string",
    )
    right = spark.createDataFrame(
        [(1, "X"), (2, "Y"), (2, "Z"), (5, "W")], "k int, rv string"
    )
    for how in ("inner", "left", "left_semi"):
        got = sorted(map(tuple, salted_join(left, right, "k", how=how,
                                            salt_factor=4).collect()))
        want = sorted(map(tuple, left.join(right, "k", how).collect()))
        assert got == want, how


def test_salted_join_spreads_hot_key(spark):
    """A hot key must land in multiple salt groups (the whole point)."""
    from pyspark.sql import functions as F

    from psweep_spark.operators.skew import SALT_COL, salted_join

    hot = spark.range(2000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    dim = spark.createDataFrame([(7, "hot")], "k int, name string")
    j = salted_join(hot, dim, "k", salt_factor=16)
    assert j.count() == 2000
    # inspect the salted probe side directly
    from pyspark.sql import functions as F2
    probe_salts = (
        hot.withColumn(
            SALT_COL,
            F2.pmod(F2.xxhash64(*[F2.col(c) for c in hot.columns]), F2.lit(16)),
        )
        .select(SALT_COL).distinct().count()
    )
    assert probe_salts == 16


def test_salted_join_rejects_right_outer(spark):
    import pytest as _pytest

    from psweep_spark.operators.skew import salted_join

    left = spark.range(2).withColumnRenamed("id", "k")
    with _pytest.raises(ValueError):
        salted_join(left, left, "k", how="right")


def test_hash_sampling_invariants(spark):
    """Determinism, repartition-proofness, and nesting of hash samples."""
    from pyspark.sql import functions as F

    from psweep_spark.operators.sampling import sample_by_hash

    df = spark.range(5000).select(F.col("id").alias("k"))
    s10 = {r["k"] for r in sample_by_hash(df, "k", 0.10).collect()}
    s30 = {r["k"] for r in sample_by_hash(df, "k", 0.30).collect()}
    # same decision under different partitioning
    s10b = {r["k"] for r in sample_by_hash(df.repartition(17), "k", 0.10).collect()}
    assert s10 == s10b
    # nested: the 10% sample is a strict subset of the 30% sample
    assert s10 < s30
    # roughly calibrated (±40% tolerance at n=5000)
    assert 300 <= len(s10) <= 700
    # independent under a different salt
    s10c = {r["k"] for r in sample_by_hash(df, "k", 0.10, salt="x").collect()}
    assert s10 != s10c


def test_connected_components_chain_and_clique(spark):
    """Transitive closure: a 4-chain collapses to one cluster labeled by
    its min id even though the endpoints were never paired directly."""
    from psweep_spark.operators.cluster import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain: all → 1
         (10, 11), (11, 12), (10, 12),  # triangle: all → 10
         (20, 21)],                   # lone pair → 20
        "id_a long, id_b long",
    )
    got = {
        (r["node"], r["cluster_id"])
        for r in connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }


def test_connected_components_long_chain_with_checkpoint(spark):
    """A diameter-9 chain forces many propagation rounds across the
    localCheckpoint lineage cut; every node must still resolve to the
    chain minimum, and separate components must stay separate."""
    from psweep_spark.operators.cluster import connected_components

    chain = [(i, i + 1) for i in range(9)]            # 0-1-2-...-9
    other = [(100, 101), (101, 102)]
    pairs = spark.createDataFrame(chain + other, "id_a long, id_b long")
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(
            pairs, max_iter=20, checkpoint_every=2
        ).collect()
    }
    assert got == {**{i: 0 for i in range(10)},
                   **{i: 100 for i in (100, 101, 102)}}


def test_connected_components_star_path_small_graphs(spark):
    """The large-star/small-star contraction (forced via
    driver_threshold=0) must produce exactly the same clusters as the
    driver union-find on mixed chain/triangle/pair graphs."""
    from psweep_spark.operators.cluster import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),
         (10, 11), (11, 12), (10, 12),
         (20, 21), (30, 30)],          # self-pair → isolated node
        "id_a long, id_b long",
    )
    got = {
        (r["node"], r["cluster_id"])
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20), (30, 30),
    }


def test_connected_components_star_string_ids(spark):
    """Star contraction must work on non-numeric node ids (doc ids are
    often strings/uuids): greatest/least, xxhash64 and the min-label
    semantics all operate on the natural string ordering."""
    from psweep_spark.operators.cluster import connected_components

    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("x", "y")],
        "id_a string, id_b string",
    )
    got = {
        (r["node"], r["cluster_id"])
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert got == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x"),
    }


def test_scrub_pii_counts_and_redaction(spark):
    """scrub_pii: per-pattern counts reflect pre-redaction matches and
    text_clean masks every span with its typed placeholder."""
    from psweep_spark.operators.text import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b@x.io or op@sub.dom.org call 555-123-4567 end"),
            (2, "ip 10.0.0.1 and 192.168.001.255 clean text"),
            (3, "nothing sensitive here"),
        ],
        "id long, text string",
    )
    rows = {r["id"]: r for r in scrub_pii(df).collect()}
    assert (rows[1]["n_email"], rows[1]["n_phone"], rows[1]["n_ipv4"]) == (2, 1, 0)
    assert rows[1]["text_clean"] == "mail <EMAIL> or <EMAIL> call <PHONE> end"
    assert (rows[2]["n_email"], rows[2]["n_ipv4"]) == (0, 2)
    assert rows[2]["text_clean"] == "ip <IP> and <IP> clean text"
    assert rows[3]["text_clean"] == "nothing sensitive here"


def test_connected_components_star_equals_union_find_random(spark):
    """Equivalence property on seeded random graphs: the distributed
    star contraction must produce exactly the driver union-find's
    clustering — mixed component shapes (isolated nodes, chains,
    merged blobs) in one composite graph per seed."""
    import random

    from psweep_spark.operators.cluster import connected_components

    for seed in (7, 21):
        rng = random.Random(seed)
        n = 60
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(70)]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        want = {
            (r["node"], r["cluster_id"])
            for r in connected_components(pairs).collect()  # driver path
        }
        got = {
            (r["node"], r["cluster_id"])
            for r in connected_components(pairs, driver_threshold=0).collect()
        }
        assert got == want, f"seed {seed}"


def test_connected_components_star_million_edge_chain(spark):
    """The scale contract from Kiveris et al.: a single 10⁶-edge PATH
    graph — the worst case for min-label propagation (10⁶ rounds) —
    must converge in O(log² n) star-contraction alternations.  21
    alternations observed (+1 fixpoint-detection round); the assert
    leaves headroom at 26 while staying 4 orders of magnitude under
    the diameter."""
    from pyspark.sql import functions as F

    from psweep_spark.operators import cluster

    n = 1_000_000
    edges = spark.range(n).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    out = cluster.connected_components(
        edges, driver_threshold=0, max_iter=40
    )
    assert out.where(F.col("cluster_id") != 0).count() == 0
    assert out.count() == n + 1
    assert cluster.LAST_STAR_ROUNDS <= 26


def test_assign_nearest_centroid_broadcast_path_at_large_k(spark):
    """Above literal_max_k the codebook must become a broadcast-join
    plan (BroadcastExchange present, no k·d-literal expression tree),
    and both physical strategies must produce identical assignments."""
    import random

    from psweep_spark import plans
    from psweep_spark.operators.similarity import assign_nearest_centroid

    rng = random.Random(7)
    dim, k, n = 16, 1024, 300
    cents = [(c, [rng.randrange(-1000, 1000) for _ in range(dim)])
             for c in range(k)]
    rows = [(i, [rng.randrange(-1000, 1000) for _ in range(dim)])
            for i in range(n)]
    v = spark.createDataFrame(rows, "vec_id long, q array<bigint>")

    big = assign_nearest_centroid(v, cents, q_col="q", out_col="cid")
    assert plans.broadcast_join_count(big) >= 1, plans.formatted_plan(big)[:500]
    # the plan must NOT inline the codebook: a 1024×16 literal array
    # would appear as a giant named_struct/array expression
    assert "named_struct" not in plans.formatted_plan(big)[:2000]

    lit = assign_nearest_centroid(
        v, cents, q_col="q", out_col="cid", literal_max_k=k
    )
    got_big = {r["vec_id"]: r["cid"] for r in big.collect()}
    got_lit = {r["vec_id"]: r["cid"] for r in lit.collect()}
    assert got_big == got_lit and len(got_big) == n


def test_assign_nearest_centroid_blas_identity(spark):
    """The BLAS assignment (one float64 matmul per Arrow batch — the
    k≈√N SemDeDup scale path) is bit-identical to the expression
    paths: same argmin, same tie → lowest-cid rule.  Includes a
    CONSTRUCTED exact tie (a vector equidistant from two centroids)
    and multi-partition input."""
    import random

    from psweep_spark.operators.similarity import (
        assign_nearest_centroid,
        assign_nearest_centroid_blas,
    )

    rng = random.Random(11)
    dim, k, n = 16, 96, 400
    cents = [(c, [rng.randrange(-3000, 3000) for _ in range(dim)])
             for c in range(k)]
    rows = [(i, [rng.randrange(-3000, 3000) for _ in range(dim)])
            for i in range(n)]
    # exact tie: centroids k and k+1 mirror each other around row n —
    # dist(row, c_k) == dist(row, c_{k+1}), so BOTH paths must pick c_k
    base = [rng.randrange(-3000, 3000) for _ in range(dim)]
    cents.append((k, [b + 7 for b in base]))
    cents.append((k + 1, [b - 7 for b in base]))
    rows.append((n, base))
    v = spark.createDataFrame(
        rows, "vec_id long, q array<bigint>"
    ).repartition(8)

    expr = assign_nearest_centroid(v, cents, q_col="q", out_col="cid")
    blas = assign_nearest_centroid_blas(v, cents, q_col="q", out_col="cid")
    got_expr = {r["vec_id"]: r["cid"] for r in expr.collect()}
    got_blas = {r["vec_id"]: r["cid"] for r in blas.collect()}
    assert got_blas == got_expr and len(got_blas) == n + 1
    # the tie row resolved to the LOWER cid on both paths
    assert got_blas[n] == k
    """Misra-Gries survival contract (operators/sketch.py): any item
    with global count > N/(k+1) appears in the candidate union — under
    REAL eviction pressure (k=16 counters, 210 distinct items, Zipfian
    head, 8 partitions), and heavy_hitters_topk is exact whenever the
    true k-th count clears that threshold (here: 5th count 400 >
    N/17 ≈ 356)."""
    from psweep_spark.operators.sketch import heavy_hitters_topk, mg_candidates

    # Zipfian-ish: item_i has count ~ 2000/i for the head, plus a long
    # uniform tail of singletons spread across partitions.
    rows = []
    for i in range(1, 11):
        rows += [f"hot_{i:02d}"] * (2000 // i)
    rows += [f"tail_{j:04d}" for j in range(200)]
    n = len(rows)
    k = 16
    df = spark.createDataFrame([(r,) for r in rows], "item string").repartition(8)
    cands = {r["item"] for r in mg_candidates(df, "item", k).collect()}
    thresh = n / (k + 1)
    exact = {
        r["item"]: r["cnt"]
        for r in df.groupBy("item").agg(F.count("*").alias("cnt")).collect()
    }
    must_survive = {it for it, c in exact.items() if c > thresh}
    assert must_survive, "test data must have items above the MG threshold"
    assert must_survive <= cands, must_survive - cands
    # eviction actually happened: candidates ≪ distinct items
    assert len(cands) < len(exact)

    topk = 5
    kth = sorted(exact.values(), reverse=True)[topk - 1]
    assert kth > thresh  # guarantee holds → result must be EXACT
    got = [
        (r["item"], r["cnt"], r["rank"])
        for r in heavy_hitters_topk(df, "item", k, topk).collect()
    ]
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
    assert got == [(it, c, i + 1) for i, (it, c) in enumerate(want)]


def test_weighted_sample_topk_guards(spark):
    """Efraimidis-Spirakis sampling (operators/sampling.py, ADVICE r5):
    weight ≤ 0 / NULL rows can never win (NaN ordering trap), the
    internal scoring key does not leak into the schema, and the draw is
    repartition-invariant."""
    from psweep_spark.operators.sampling import weighted_sample_topk

    rows = [(i, float(i % 7) - 1.0) for i in range(1, 200)]  # some ≤ 0
    rows += [(1000, 0.0), (1001, -5.0), (1002, None)]
    df = spark.createDataFrame(rows, "k long, w double")
    out = weighted_sample_topk(df, "k", "w", k=10)
    assert out.columns == ["k", "w"]  # no es_key leak
    got = out.collect()
    assert len(got) == 10
    assert all(r["w"] is not None and r["w"] > 0 for r in got)
    # deterministic under repartitioning
    got2 = weighted_sample_topk(df.repartition(13), "k", "w", k=10).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, got2))
    # weight-proportional in aggregate: with one dominant weight the
    # heavy key is effectively always drawn first across salts
    heavy = spark.createDataFrame(
        [(i, 1.0) for i in range(100)] + [(999, 1e6)], "k long, w double"
    )
    firsts = [
        weighted_sample_topk(heavy, "k", "w", k=1, salt=f"s{t}").collect()[0]["k"]
        for t in range(5)
    ]
    assert firsts.count(999) >= 4


def test_stacked_buckets_matches_two_step(spark, docs):
    """The r6 single-projection banding (signature array bound once via
    transform(array(sig), ...)) must produce bit-identical
    (id, band_idx, bucket) rows to the two-step
    minhash_signatures → _bands_of_sig form — same md5 bucket strings,
    so indexes built by either form interoperate."""
    from psweep_spark.operators.dedup import (
        _bands_of_sig,
        _stacked_buckets,
        minhash_signatures,
    )

    sample = docs.limit(200)
    fast = _stacked_buckets(
        sample, num_hashes=12, bands=4, n=3, id_col="doc_id", text_col="text"
    )
    slow = _bands_of_sig(
        minhash_signatures(sample, num_hashes=12, n=3), 12, 4
    )
    a = sorted(map(tuple, fast.collect()))
    b = sorted(map(tuple, slow.collect()))
    assert a == b and len(a) == 200 * 4


def test_ols_fit_exact_and_mergeable(spark):
    """OLS via sufficient statistics (operators/stats.py): the fitted
    slope/intercept/R² match the closed-form computed in plain Python
    on integer data EXACTLY (not approximately — both are the same
    IEEE754 expression over exact bigint sums), degenerate groups
    (zero x-variance) yield NULLs instead of ±inf, and the statistics
    MERGE: fitting from the sum of two disjoint halves' stats equals
    fitting the whole."""
    from pyspark.sql import functions as F

    from psweep_spark.operators.stats import (
        ols_fit,
        ols_fit_from_stats,
        ols_sufficient_stats,
    )

    rows = []
    # group 'a': y = 3x + 7 with deterministic residuals
    for i in range(1, 50):
        rows.append(("a", i, 3 * i + 7 + (i % 5) - 2))
    # group 'b': constant x -> degenerate (varx = 0)
    for i in range(10):
        rows.append(("b", 4, 10 + i))
    df = spark.createDataFrame(rows, "g string, x long, y long")

    got = {r["g"]: r for r in ols_fit(df, "x", "y", ["g"]).collect()}

    # independent closed form on exact ints
    xs = [r[1] for r in rows if r[0] == "a"]
    ys = [r[2] for r in rows if r[0] == "a"]
    n, sx, sy = len(xs), sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    cov, varx, vary = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    slope = float(cov) / float(varx)
    intercept = (float(sy) - slope * float(sx)) / float(n)
    r2 = (float(cov) * float(cov)) / (float(varx) * float(vary))
    a = got["a"]
    assert (a["slope"], a["intercept"], a["r2"]) == (slope, intercept, r2)
    assert got["b"]["slope"] is None and got["b"]["r2"] is None

    # mergeability: stats(half1) + stats(half2) -> identical fit
    h1 = df.filter(F.col("y") % 2 == 0)
    h2 = df.filter(F.col("y") % 2 != 0)
    merged = (
        ols_sufficient_stats(h1, "x", "y", ["g"])
        .unionAll(ols_sufficient_stats(h2, "x", "y", ["g"]))
        .groupBy("g")
        .agg(*[
            F.sum(c).alias(c) for c in ["n", "sx", "sy", "sxy", "sxx", "syy"]
        ])
    )
    got_m = {r["g"]: r for r in ols_fit_from_stats(merged, ["g"]).collect()}
    assert (got_m["a"]["slope"], got_m["a"]["intercept"], got_m["a"]["r2"]) \
        == (slope, intercept, r2)


def test_weighted_sample_per_group_matches_naive_window(spark):
    """The bounded per-partition pre-reduction in
    weighted_sample_topk_per_group is LOSSLESS: its result equals the
    naive full window over the corpus, under adversarial partitioning,
    and invalid weights are dropped (operators/sampling.py)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from psweep_spark.operators.sampling import (
        hash_uniform,
        weighted_sample_topk_per_group,
    )

    rows = [(i, f"g{i % 7}", float(1 + (i * 37) % 100)) for i in range(500)]
    rows += [(9000, "g0", 0.0), (9001, "g1", -2.0), (9002, "g2", None)]
    # a NULL group is a group: must survive the pandas pre-reduction
    rows += [(700 + i, None, float(1 + i)) for i in range(8)]
    df = spark.createDataFrame(rows, "k long, g string, w double")

    out = weighted_sample_topk_per_group(
        df.repartition(17), "k", "w", "g", k=5, salt="t"
    )
    assert out.columns == ["k", "g", "w", "sample_rank"]
    got = sorted(
        ((r["g"] or "", r["sample_rank"], r["k"]) for r in out.collect())
    )

    es = F.log(hash_uniform(F.col("k"), "t")) / F.col("w")
    naive = (
        df.filter(F.col("w") > 0)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("g").orderBy(F.desc(es), F.asc("k"))
            ),
        )
        .filter(F.col("rk") <= 5)
    )
    want = sorted((r["g"] or "", r["rk"], r["k"]) for r in naive.collect())
    assert got == want and len(got) == 40  # 7 groups x 5 + NULL group x 5
    # no invalid-weight winners
    assert all(k < 9000 for _, _, k in got)


def test_cms_contracts(spark):
    """Count-Min sketch (operators/sketch.py): estimates are NEVER
    below the true count (one-sided error), exact for collision-free
    items, the sketch is repartition-invariant, and two disjoint
    halves' sketches MERGE by cell-wise addition into the whole-corpus
    sketch."""
    from pyspark.sql import functions as F

    from psweep_spark.operators.sketch import cms_cells, cms_estimate

    rows = [(f"item_{i % 50:03d}",) for i in range(3000)]
    df = spark.createDataFrame(rows, "token string")
    probes = df.distinct()

    cells = cms_cells(df, "token", depth=4, width=64, salt="t")
    est = {
        r["token"]: r["est_cnt"]
        for r in cms_estimate(cells, probes, "token", 4, 64, "t").collect()
    }
    true = {
        r["token"]: r["cnt"]
        for r in df.groupBy("token").agg(F.count("*").alias("cnt")).collect()
    }
    assert est.keys() == true.keys()
    assert all(est[t] >= true[t] for t in true), "CMS must overestimate"
    # width 64 vs 50 items: most items see no collision -> exact
    assert sum(est[t] == true[t] for t in true) >= 25

    # repartition invariance
    cells2 = cms_cells(df.repartition(13), "token", depth=4, width=64, salt="t")
    c1 = sorted(map(tuple, cells.collect()))
    c2 = sorted(map(tuple, cells2.collect()))
    assert c1 == c2

    # mergeability: sketch(h1) + sketch(h2) == sketch(all), cell-wise,
    # on a deterministic hash-parity split
    h1 = df.filter(F.crc32(F.col("token")) % 2 == 0)
    h2 = df.filter(F.crc32(F.col("token")) % 2 != 0)
    merged = (
        cms_cells(h1, "token", 4, 64, "t")
        .unionAll(cms_cells(h2, "token", 4, 64, "t"))
        .groupBy("i", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    m = sorted(map(tuple, merged.collect()))
    assert m == c1


def test_global_shuffle_assign_contracts(spark):
    """Deterministic training shuffle (operators/sampling.py): the
    (shard, pos) assignment is a pure function of the key — identical
    under adversarial repartitioning — positions are dense 1..n per
    shard, and the within-shard order is uncorrelated with key order
    (it follows the md5 bucket, not the key)."""
    from pyspark.sql import functions as F

    from psweep_spark.operators.sampling import global_shuffle_assign

    df = spark.range(2000).select(F.col("id").alias("k"))
    a = {r["k"]: (r["shard"], r["pos"])
         for r in global_shuffle_assign(df, "k", 8, "s").collect()}
    b = {r["k"]: (r["shard"], r["pos"])
         for r in global_shuffle_assign(
             df.repartition(17), "k", 8, "s").collect()}
    assert a == b and len(a) == 2000
    # dense ranks per shard
    by_shard: dict[int, list[int]] = {}
    for sh, pos in a.values():
        by_shard.setdefault(sh, []).append(pos)
    assert set(by_shard) == set(range(8))
    for sh, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), sh
    # order decorrelated from key order: the first few positions of a
    # shard are not simply the smallest keys
    sh0 = sorted((pos, k) for k, (sh, pos) in a.items() if sh == 0)
    first_keys = [k for _, k in sh0[:20]]
    assert first_keys != sorted(first_keys)


def test_sampling_nan_weights_and_reserved_columns(spark):
    """ADVICE r6: NaN weights pass a bare ``> 0`` filter (Spark orders
    NaN above all doubles) and would corrupt both sampling paths — the
    top-k sort ranks a NaN E-S key first while the pandas pre-reduce
    ranks it last, so the bounded fold could drop the window's #1 row.
    Both operators must DROP NaN weights; and all three operators must
    raise, not silently overwrite, when the input already carries a
    reserved output/internal column name."""
    import pytest

    from psweep_spark.operators.sampling import (
        global_shuffle_assign,
        weighted_sample_topk,
        weighted_sample_topk_per_group,
    )

    rows = [(i, "g", 1.0) for i in range(50)]
    rows += [(900, "g", float("nan")), (901, "h", float("nan"))]
    df = spark.createDataFrame(rows, "k long, g string, w double")

    top = weighted_sample_topk(df, "k", "w", k=5).collect()
    assert all(r["k"] < 900 for r in top) and len(top) == 5

    per = weighted_sample_topk_per_group(df, "k", "w", "g", k=5)
    got = per.collect()
    assert all(r["k"] < 900 for r in got)
    # group "h" had ONLY the NaN row → no output rows for it at all
    assert {r["g"] for r in got} == {"g"}
    # and the kept set is identical under adversarial partitioning
    # (the pandas-fold vs window NaN ordering split would break this)
    got2 = weighted_sample_topk_per_group(
        df.repartition(7), "k", "w", "g", k=5
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, got2))

    clash_rank = df.withColumnRenamed("g", "sample_rank")
    with pytest.raises(ValueError, match="sample_rank"):
        weighted_sample_topk_per_group(clash_rank, "k", "w", "sample_rank", 5)
    clash_es = df.withColumnRenamed("g", "__es_key")
    with pytest.raises(ValueError, match="__es_key"):
        weighted_sample_topk(clash_es, "k", "w", k=5)
    clash_shard = df.withColumnRenamed("g", "shard")
    with pytest.raises(ValueError, match="shard"):
        global_shuffle_assign(clash_shard, "k", 8)


def test_ols_fit_no_bigint_wraparound(spark):
    """ADVICE r6 (medium): the covariance/variance cross terms must not
    overflow at 2^63 when the six SUMS honor the caller contract (each
    fits BIGINT).  Here Σxy ≈ 1.9e18 < 2^63 but n·Σxy ≈ 1.9e21 ≫ 2^63 —
    BIGINT cross terms would wrap (ANSI off → silent wrong slope) or
    raise (Spark 4 ANSI default); the DECIMAL(38,0) terms stay exact.
    Verified against the closed form in exact Python ints."""
    from fractions import Fraction

    from psweep_spark.operators.stats import ols_fit

    # y = 3x + 7 exactly, x ≈ 2.5e7, n = 1000: all six sums fit BIGINT
    # (Σyy ≈ 5.6e18 is the largest) but every cross term exceeds 2^63
    n, x0 = 1000, 25_000_000
    rows = [(x0 + i, 3 * (x0 + i) + 7) for i in range(n)]
    got = ols_fit(
        spark.createDataFrame(rows, "x long, y long"), "x", "y"
    ).collect()[0]

    xs = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    cov, varx = n * sxy - sx * sy, n * sxx - sx * sx
    assert Fraction(cov, varx) == 3  # exact slope in unbounded ints
    assert got["slope"] == float(cov) / float(varx) == 3.0
    assert got["intercept"] == (float(sy) - 3.0 * float(sx)) / float(n) == 7.0
    assert got["r2"] == 1.0


def test_heavy_hitters_runtime_exactness(spark):
    """VERDICT r6 weak #2: the MG guarantee must be runtime-verified.
    With an undersized k_counters, surviving mid-tier candidates whose
    exact recount does not clear N/(k_counters+1) must come back
    is_exact=false (exactness='column') or fail the job in-plan
    (exactness='raise'); entries above the threshold stay certified —
    and a certified entry's (item, cnt, rank) is provably exact."""
    import pytest

    from psweep_spark.operators.sketch import heavy_hitters_topk

    # hot: 500, 20 warm at 30 each, 900 distinct cold singles; N = 2000.
    # k=16 -> threshold N div 17 = 117: hot certifies, warm cannot —
    # yet warm items survive per-partition eviction (counts ~4 vs 1).
    rows = [("hot",)] * 500
    rows += [(f"w{i:02d}",) for i in range(20) for _ in range(30)]
    rows += [(f"c{i}",) for i in range(900)]
    df = spark.createDataFrame(rows, "item string").repartition(8)

    out = heavy_hitters_topk(df, "item", 16, 5, exactness="column").collect()
    flags = {r["item"]: r["is_exact"] for r in out}
    assert flags["hot"] is True
    warm_flags = [v for k, v in flags.items() if k.startswith("w")]
    assert warm_flags and all(v is False for v in warm_flags)
    # certified row is genuinely exact
    top1 = out[0]
    assert (top1["item"], top1["cnt"], top1["rank"]) == ("hot", 500, 1)

    with pytest.raises(Exception, match="MG guarantee not met"):
        heavy_hitters_topk(df, "item", 16, 5, exactness="raise").collect()

    # well-sized k certifies everything and equals the exact groupBy
    ok = heavy_hitters_topk(df, "item", 4096, 5, exactness="raise")
    got = [(r["item"], r["cnt"], r["rank"]) for r in ok.collect()]
    exact = sorted(
        ((i, df.filter(F.col("item") == i).count()) for i in
         ["hot"] + [f"w{i:02d}" for i in range(20)]),
        key=lambda kv: (-kv[1], kv[0]),
    )[:5]
    assert got == [(i, c, r + 1) for r, (i, c) in enumerate(exact)]


def test_kmv_sketch_contracts(spark):
    """KMV bottom-k sketches (operators/sketch.py, r7): sketch is a
    pure function of (salt, item) — repartition-invariant; distinct
    estimate is EXACT (and flagged) below k and within the ~1/sqrt(k)
    error band above it; sketches MERGE (bottom-k of the union of two
    sketches equals the sketch of the union); overlap estimates hit
    the exact endpoints (identical -> 1.0, disjoint -> 0.0) and track
    a constructed half-overlap."""
    from psweep_spark.operators.sketch import (
        kmv_distinct_estimate,
        kmv_overlap_estimate,
        kmv_sketch,
    )

    k = 256
    small = spark.createDataFrame(
        [(f"x{i % 100}",) for i in range(5000)], "item string"
    ).repartition(8)
    sk_small = kmv_sketch(small, "item", k)
    est = kmv_distinct_estimate(sk_small, k).collect()[0]
    assert est["is_exact"] and est["n_seen"] == 100
    assert est["est_distinct"] == 100.0

    big = spark.createDataFrame(
        [(f"y{i}",) for i in range(20000)], "item string"
    ).repartition(16)
    sk_big = kmv_sketch(big, "item", k)
    rows = sk_big.collect()
    assert len(rows) == k
    est = kmv_distinct_estimate(sk_big, k).collect()[0]
    assert not est["is_exact"]
    assert abs(est["est_distinct"] - 20000) / 20000 < 4 / (k ** 0.5)
    # repartition invariance: the sketch is a SET equal under any layout
    again = {r["hv"] for r in kmv_sketch(big.repartition(3), "item", k)
             .collect()}
    assert again == {r["hv"] for r in rows}

    # mergeability: bottom-k of (sketch(A) ∪ sketch(B)) == sketch(A ∪ B)
    a = spark.createDataFrame([(f"a{i}",) for i in range(3000)], "item string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(3000)], "item string")
    merged_sketches = (
        kmv_sketch(a, "item", k).unionAll(kmv_sketch(b, "item", k))
        .dropDuplicates(["hv"]).orderBy("hv").limit(k)
    )
    direct = kmv_sketch(a.unionAll(b), "item", k)
    assert {r["hv"] for r in merged_sketches.collect()} == {
        r["hv"] for r in direct.collect()
    }

    # overlap endpoints + a constructed half overlap
    ov_same = kmv_overlap_estimate(
        kmv_sketch(big, "item", k), kmv_sketch(big, "item", k), k
    ).collect()[0]
    assert ov_same["est_jaccard"] == 1.0
    ov_disj = kmv_overlap_estimate(
        kmv_sketch(a, "item", k), kmv_sketch(b, "item", k), k
    ).collect()[0]
    assert ov_disj["est_jaccard"] == 0.0
    # A = 0..5999, B = 3000..8999 -> true J = 3000/9000 = 1/3
    xa = spark.createDataFrame([(f"z{i}",) for i in range(6000)],
                               "item string")
    xb = spark.createDataFrame([(f"z{i}",) for i in range(3000, 9000)],
                               "item string")
    ov = kmv_overlap_estimate(
        kmv_sketch(xa, "item", k), kmv_sketch(xb, "item", k), k
    ).collect()[0]
    assert abs(ov["est_jaccard"] - 1 / 3) < 4 / (k ** 0.5)
    assert abs(ov["est_union"] - 9000) / 9000 < 4 / (k ** 0.5)


def test_kmv_per_group_matrix(spark):
    """Per-group KMV sketches + overlap matrix: the bounded per-(group,
    partition) fold is lossless (sketches equal the per-group global
    bottom-k under adversarial partitioning), and the matrix hits exact
    endpoints for constructed group vocabularies."""
    from psweep_spark.operators.sketch import (
        kmv_overlap_matrix,
        kmv_sketch,
        kmv_sketch_per_group,
    )

    k = 128
    rows = [(f"w{i}", "g1") for i in range(2000)]
    rows += [(f"w{i}", "g2") for i in range(1000, 3000)]   # J(g1,g2)=1/3
    rows += [(f"q{i}", "g3") for i in range(500)]          # disjoint
    df = spark.createDataFrame(rows, "item string, g string").repartition(7)

    sk = kmv_sketch_per_group(df, "item", "g", k)
    for g in ("g1", "g2", "g3"):
        got = {r["hv"] for r in sk.filter(F.col("g") == g).collect()}
        want = {
            r["hv"]
            for r in kmv_sketch(
                df.filter(F.col("g") == g), "item", k
            ).collect()
        }
        assert got == want, g

    m = {(r["g_a"], r["g_b"]): r for r in
         kmv_overlap_matrix(sk, "g", k).collect()}
    assert set(m) == {("g1", "g2"), ("g1", "g3"), ("g2", "g3")}
    assert m[("g1", "g3")]["est_jaccard"] == 0.0
    assert m[("g2", "g3")]["est_jaccard"] == 0.0
    assert abs(m[("g1", "g2")]["est_jaccard"] - 1 / 3) < 4 / (k ** 0.5)
    # union estimates track the true union sizes within the error band
    assert abs(m[("g1", "g3")]["est_union"] - 2500) / 2500 < 4 / (k ** 0.5)
    assert abs(m[("g1", "g2")]["est_union"] - 3000) / 3000 < 4 / (k ** 0.5)


def test_kmv_null_handling(spark):
    """ADVICE r7 #2/#3: NULL items never enter a sketch (a NULL hash
    would inflate ``n_seen`` and break the below-k exact count), and
    NULL GROUPS — preserved by kmv_sketch_per_group — are explicitly
    excluded from the pairwise matrix (documented contract)."""
    from psweep_spark.operators.sketch import (
        kmv_distinct_estimate,
        kmv_overlap_matrix,
        kmv_sketch,
        kmv_sketch_per_group,
    )

    k = 64
    rows = [(f"x{i % 10}",) for i in range(100)] + [(None,)] * 30
    df = spark.createDataFrame(rows, "item string").repartition(5)
    est = kmv_distinct_estimate(kmv_sketch(df, "item", k), k).collect()[0]
    assert est["n_seen"] == 10 and est["is_exact"]
    assert est["est_distinct"] == 10.0

    grows = [(f"w{i}", "g1") for i in range(50)]
    grows += [(f"w{i}", None) for i in range(25, 75)]  # NULL group
    grows += [(None, "g1")] * 10                        # NULL item
    grows += [(f"w{i}", "g2") for i in range(50)]
    gdf = spark.createDataFrame(grows, "item string, g string").repartition(4)
    sk = kmv_sketch_per_group(gdf, "item", "g", k)
    # the NULL group IS a group in the sketch relation...
    by_g = {r["g"]: 1 for r in sk.select("g").distinct().collect()}
    assert set(by_g) == {"g1", "g2", None}
    # ...and NULL items contributed no hashes anywhere
    assert sk.filter(F.col("hv").isNull()).count() == 0
    assert sk.filter(F.col("g") == "g1").count() == 50
    # the matrix covers only non-NULL group pairs
    m = kmv_overlap_matrix(sk, "g", k)
    pairs = {(r["g_a"], r["g_b"]) for r in m.collect()}
    assert pairs == {("g1", "g2")}


def test_kmv_merge_incremental(spark):
    """kmv_merge: incremental multi-shard rollup (fold shard sketches
    in arbitrary order/grouping) is BIT-FOR-BIT the from-scratch sketch
    of the concatenated corpus — the mergeable-summary identity that
    lets a 100 TB deployment roll up per-day sketches without ever
    rescanning history."""
    from psweep_spark.operators.sketch import kmv_merge, kmv_sketch

    k = 128
    shards = [
        spark.createDataFrame(
            [(f"t{(7 * i + s) % 9000}",) for i in range(4000)],
            "item string",
        )
        for s in range(3)
    ]
    sks = [kmv_sketch(sh, "item", k) for sh in shards]
    # incremental left fold
    inc = kmv_merge(kmv_merge(sks[0], sks[1], k=k), sks[2], k=k)
    # one-shot fold, different grouping
    oneshot = kmv_merge(*sks, k=k)
    scratch = kmv_sketch(
        shards[0].unionAll(shards[1]).unionAll(shards[2]), "item", k
    )
    want = [r["hv"] for r in scratch.collect()]
    assert [r["hv"] for r in inc.collect()] == want
    assert [r["hv"] for r in oneshot.collect()] == want


def test_session_cache_policy(spark):
    """caching.py (VERDICT r7 item 6): builder-side session-lifetime
    persists are REGISTERED and a single clear_query_caches() drains
    them all — including the heavy-hitters candidate persist that
    operators/sketch.py registers internally."""
    from psweep_spark.caching import (
        clear_query_caches,
        persisted_for_session,
        registered_caches,
    )
    from psweep_spark.operators.sketch import heavy_hitters_topk

    clear_query_caches(spark)
    df = persisted_for_session(
        spark.range(100).select((F.col("id") % 7).alias("v")), "t_policy"
    )
    assert df.count() == 100
    assert df.storageLevel.useMemory
    assert "t_policy" in registered_caches()

    hh_in = spark.createDataFrame(
        [(f"i{i % 5}",) for i in range(200)], "item string"
    )
    heavy_hitters_topk(hh_in, "item", 16, 3, exactness="column").collect()
    assert "heavy_hitters_candidates" in registered_caches()

    n = clear_query_caches(spark)
    assert n >= 2
    assert registered_caches() == []
    assert not df.storageLevel.useMemory


def test_materialized_for_reuse_paths(spark):
    """caching.materialized_for_reuse (VERDICT r9 #1/#2): below the
    threshold the relation comes back as a lineage-free LocalRelation;
    above it (forced with threshold=0) as a localCheckpoint scan —
    both value-identical to the input, with the temporary upstream
    persist deregistered either way so the between-queries drain has
    nothing extra to hold."""
    from psweep_spark.caching import (
        materialized_for_reuse,
        registered_caches,
    )

    src = spark.range(50).select(
        F.col("id").alias("id_a"), (F.col("id") * 2).alias("id_b")
    )
    want = sorted((r.id_a, r.id_b) for r in src.collect())

    landed = materialized_for_reuse(src, "t_reuse_small")
    assert "t_reuse_small" not in registered_caches()
    assert sorted((r.id_a, r.id_b) for r in landed.collect()) == want
    plan = landed._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan, plan[:400]

    chk = materialized_for_reuse(src, "t_reuse_big", driver_threshold=0)
    assert "t_reuse_big" not in registered_caches()
    # the checkpointed relation is registered for the between-queries
    # drain (the leaked-RDD sweep skips checkpoints — ADVICE r10 #2)
    assert "t_reuse_big:ckpt" in registered_caches()
    assert sorted((r.id_a, r.id_b) for r in chk.collect()) == want
    plan = chk._jdf.queryExecution().executedPlan().toString()
    # checkpointed RDD scan — no Range lineage left to re-execute
    assert "ExistingRDD" in plan and "Range" not in plan, plan[:400]


def test_cache_sweep_spares_checkpoints(spark):
    """ADVICE r10 #2: clear_query_caches' context-wide leaked-RDD sweep
    must NOT unpersist checkpointed RDDs — a dropped checkpoint block
    cannot recompute (lineage is truncated), so the old blanket sweep
    turned a sibling session's recompute-on-miss into a hard
    'checkpoint block not found' failure.  A checkpointed relation NOT
    owned by the registry must survive a drain and still serve."""
    from psweep_spark.caching import clear_query_caches

    clear_query_caches(spark)
    ck = spark.range(1000).selectExpr("id", "id * 3 as v").localCheckpoint(
        eager=True
    )
    leaked = spark.range(100).rdd.persist()
    leaked.count()
    clear_query_caches(spark)
    # the plain leaked RDD was swept, the checkpoint was spared
    assert ck.count() == 1000
    assert ck.agg(F.sum("v")).first()[0] == 3 * 999 * 1000 // 2
    ck.unpersist(blocking=True)


def test_cluster_cosine_pairs_blocked_identity(spark):
    """The r8 row-blocked pair stage (bounded per-task memory) emits
    EXACTLY the pairs of a naive full-matrix reference — same ids, same
    6-dp cosines — across block boundaries (cluster sizes chosen above
    and below the min block size of 256)."""
    import numpy as np

    from psweep_spark.operators.dedup import cluster_cosine_pairs

    rng = np.random.default_rng(42)
    rows = []
    for cl, sz in ((0, 700), (1, 30), (2, 2), (3, 1)):
        base = rng.normal(size=8)
        for i in range(sz):
            # near-dups of a base vector + noise → a mix above/below τ
            v = base + rng.normal(scale=rng.choice([0.05, 1.0]), size=8)
            rows.append((cl, cl * 10_000 + i, [float(x) for x in v]))
    df = spark.createDataFrame(
        rows, "cluster_id int, vec_id long, e array<double>"
    ).repartition(7)
    tau = 0.8
    got = {
        (r["cluster_id"], r["id_a"], r["id_b"]): r["cosine"]
        for r in cluster_cosine_pairs(df, tau, block_rows=100).collect()
    }
    # default (single-block at these sizes) must agree with forced
    # multi-block — block boundaries cannot change values
    got_default = {
        (r["cluster_id"], r["id_a"], r["id_b"]): r["cosine"]
        for r in cluster_cosine_pairs(df, tau).collect()
    }
    assert got == got_default
    # naive reference
    want = {}
    by_cl = {}
    for cl, vid, v in rows:
        by_cl.setdefault(cl, []).append((vid, np.array(v)))
    for cl, members in by_cl.items():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                (ia, va), (ib, vb) = members[i], members[j]
                c = round(
                    float(
                        va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
                    ),
                    6,
                )
                if c >= tau:
                    want[(cl, ia, ib)] = c
    assert got == want
    assert len(want) > 100  # the fixture genuinely exercises pairs
