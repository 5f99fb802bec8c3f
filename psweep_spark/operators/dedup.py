"""Deduplication operators over a documents table.

Family (BASELINE north star, "training-data pipeline" ops):

* exact        — hash-groupBy on normalized text
* n-gram Jaccard — exact set-similarity self-join (the correctness
                   oracle for the approximate methods)
* MinHash + LSH — shingle → minhash signature → banded bucket join;
                   the 100 TB path (candidates only where buckets
                   collide, no all-pairs shuffle)
* SimHash      — 32-bit sign-fingerprint; near-dups share fingerprint
                   (hamming-0) or differ in few bits
* embedding near-dup — cosine ≥ τ pairs over an embedding column

Determinism: every hash is md5 over explicit strings, and MinHash
minimizes over the **hex string** (fixed width ⇒ lexicographic ==
numeric order), so identical SQL in DuckDB reproduces results exactly —
the approximate operators are oracle-checkable, not just the exact one.

Scale notes inline per operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "exact_dedup",
    "word_shingles",
    "jaccard_pairs",
    "minhash_signatures",
    "minhash_dedup",
    "simhash",
    "embedding_near_dup_pairs",
]

_WS = r"\s+"


def _norm(t: Column) -> Column:
    return F.lower(F.regexp_replace(F.trim(t), _WS, " "))


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup: one row per distinct normalized text, keeping the
    smallest id (deterministic winner).  Output: (keep_id, text_hash,
    dup_count).

    Scale: single hash-aggregate — map-side partial aggregation makes
    the shuffle proportional to *distinct* texts, not rows.  To avoid
    shuffling full text bodies, we group on md5(text), not text.
    """
    return (
        df.select(
            F.col(id_col), F.md5(_norm(F.col(text_col))).alias("text_hash")
        )
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


def word_shingles(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Pure expression (split → sequence → transform → explode); short
    docs (< n tokens) contribute their whole normalized text as the
    single shingle.
    """
    toks = F.split(_norm(F.col(text_col)), " ")
    cnt = F.size(toks)
    sh = F.when(
        cnt >= n,
        F.transform(
            F.sequence(F.lit(0), cnt - F.lit(n)),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array(_norm(F.col(text_col))))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (id_a < id_b, jaccard ≥ τ).

    jaccard = |A ∩ B| / (|A| + |B| − |A ∩ B|) over distinct shingle
    sets.  This is the *correctness oracle* for MinHash; the self-join
    on shingle is quadratic in docs-per-shingle, so at 100 TB use
    :func:`minhash_dedup` (banded LSH) and reserve this for candidate
    verification or small corpora.  Skew guard: very common shingles
    (df > huge) should be dropped before the join at scale — they only
    add candidates that exact verification would keep anyway.
    """
    sh = word_shingles(df, n=n, id_col=id_col, text_col=text_col)
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 12,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash signature per doc: columns mh_0..mh_{k-1}.

    Hash family i = md5('<i>|' || shingle); the signature entry is the
    *minimum hex string* — fixed-width hex compares identically as
    string or number, which keeps the whole operator expressible in
    ANSI SQL (oracle parity) and JVM-side in Spark.

    Scale: one groupBy(doc) with k min-aggregates — map-side combine
    reduces the shuffle to one row per doc.
    """
    sh = word_shingles(df, n=n, id_col=id_col, text_col=text_col)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle")))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_dedup(
    df: DataFrame,
    num_hashes: int = 12,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-verified.

    signature → ``bands`` bands of ``num_hashes/bands`` rows → band
    bucket = md5(concat of the band's rows) → docs sharing any bucket
    are candidates → candidates verified with exact n-gram Jaccard ≥ τ.

    Scale: the only shuffles are (1) groupBy doc for signatures,
    (2) groupBy band-bucket (bounded fan-out), (3) the verification
    join over *candidates only* — no all-pairs stage.  Returns
    (id_a, id_b, jaccard).
    """
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(
        df, num_hashes=num_hashes, n=n, id_col=id_col, text_col=text_col
    )
    band_cols = [
        F.md5(
            F.concat_ws(
                "|", *[F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
            )
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select("id", *band_cols)
    stacked = banded.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), F.col(f"band_{b}").alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band_idx").alias("band_idx"), F.col("bb.bucket").alias("bucket"))
    a = stacked.alias("a")
    b = stacked.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    exact = jaccard_pairs(
        df, n=n, threshold=0.0, id_col=id_col, text_col=text_col
    ).withColumnRenamed("jaccard", "jaccard_exact")
    return (
        cands.join(exact, ["id_a", "id_b"])
        .filter(F.col("jaccard_exact") >= threshold)
        .select("id_a", "id_b", F.col("jaccard_exact").alias("jaccard"))
    )


def simhash(
    df: DataFrame,
    bits: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """32-bit SimHash fingerprint per document.

    Token weight-vector trick: token hash = low 60 bits of md5; bit b
    of the fingerprint is set iff Σ_tokens (bit_b(hash) ? +1 : −1) > 0.
    Whole computation is one aggregate over distinct tokens — bitwise
    ops only, identical semantics in DuckDB (& >> CASE SUM).
    """
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(F.split(_norm(F.col(text_col)), " "))
            ).alias("tok"),
        )
        .withColumn(
            "h",
            F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long"),
        )
    )
    bit_sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s_{b}")
            for b in range(bits)
        ]
    )
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"s_{b}") > 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else fp + term
    return bit_sums.select("id", fp.alias("simhash"))


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ τ).

    Brute-force all-pairs — the *verification* path.  At 100 TB,
    pre-bucket with sign-LSH (`similarity.random_hyperplanes`) and run
    this only within buckets.  Cosine is rounded to 6 dp so the result
    is stable under summation-order differences between engines.
    """
    v = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate(F.col("v"), F.lit(0.0), lambda a, x: a + x * x)),
    )
    a = v.alias("a")
    b = v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", F.round(dot / (F.col("a.norm") * F.col("b.norm")), 6))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine"
        )
    )
