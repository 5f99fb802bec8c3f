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

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "exact_dedup",
    "shingled",
    "word_shingles",
    "jaccard_pairs",
    "minhash_family_constants",
    "minhash_signatures",
    "minhash_dedup",
    "minhash_dedup_incremental",
    "write_dedup_index",
    "read_dedup_index",
    "migrate_dedup_index",
    "simhash",
    "embedding_near_dup_pairs",
    "cluster_cosine_pairs",
    "bloom_bitmap_words",
    "bloom_probe",
    "bloom_dedup_gate",
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


def _shingle_parts(df: DataFrame, n: int, id_col: str, text_col: str):
    """(projected df, distinct-shingle array expr) shared by the shingle
    operators.

    Two Catalyst pitfalls shape this construction (both measured >10×
    at sf0.1):

    * the token array is MATERIALIZED as a projection column before the
      per-position lambda — expressions captured from outside a
      higher-order lambda re-evaluate per element, so inlining ``split``
      makes shingling O(tokens²);
    * callers must place ``explode`` directly over the returned
      EXPRESSION, not over an aliased column: explode-of-attribute makes
      InferFiltersFromGenerate add a ``size(col) > 0`` filter that is
      pushed below the repartition with the whole shingle expression
      inlined — evaluated three extra times on the unparallelized scan.
    """
    from ..plans import ensure_parallelism

    d = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("id"), _norm(F.col(text_col)).alias("__norm"))
        .withColumn("__toks", F.split(F.col("__norm"), " "))
    )
    return d, _sh_expr(n)


@functools.lru_cache(maxsize=16)
def _sh_expr(n: int) -> Column:
    """Distinct-shingle array expression over the ``__toks``/``__norm``
    projection columns of :func:`_shingle_parts` — memoized per ``n``.

    The tree is ~70 ms of py4j round-trips to build; an unresolved
    Column is an immutable expression tree bound only to column NAMES
    (the analyzer resolves a copy per plan, never mutating the
    original), so one instance serves every caller — this matters in
    the per-micro-batch paths, where the whole minhash expression
    pipeline used to be rebuilt on every ``foreachBatch`` call.

    Single-JVM-per-process assumption (ADVICE r11 #2): in classic
    PySpark these cached Columns hold py4j handles into the gateway
    JVM.  One process keeps one gateway for its lifetime (stopping a
    SparkSession does not tear the JVM down), so the cache stays valid
    across session restarts; a hypothetical in-process gateway relaunch
    would require clearing these three lru_caches."""
    toks = F.col("__toks")
    cnt = F.size(toks)
    sh = F.when(
        cnt >= n,
        F.transform(
            F.sequence(F.lit(0), cnt - F.lit(n)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + F.lit(k + 1)) for k in range(n)]
            ),
        ),
    ).otherwise(F.array(F.col("__norm")))
    return F.array_distinct(sh)


def _in_literals(col_name: str, values) -> Column:
    """``col IN (...)`` built as ONE parsed SQL string.

    ``Column.isin(2k values)`` converts every element through py4j —
    measured ~0.9 s of DRIVER time per call at ~2k strings, paid per
    micro-batch in the streaming gate (VERDICT r5 item 6).  A single
    F.expr ships one string and parses JVM-side in milliseconds, and
    Catalyst produces the identical In/InSet predicate, so parquet
    row-group pushdown is unchanged.  Strings are single-quote-escaped
    (the gate's values are md5 hex, but don't rely on it)."""
    vals = list(values)
    if not vals:
        return F.lit(False)
    if isinstance(vals[0], str):
        body = ",".join("'" + v.replace("'", "''") + "'" for v in vals)
    else:
        body = ",".join(f"{int(v)}L" for v in vals)
    return F.expr(f"{col_name} IN ({body})")


def shingled(
    df: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, __sh: array<string>) — distinct word n-gram shingles per doc.
    Short texts (< n tokens) contribute the whole normalized text as the
    single shingle."""
    d, sh = _shingle_parts(df, n, id_col, text_col)
    return d.select("id", sh.alias("__sh"))


def word_shingles(
    df: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Distinct word n-gram shingles per document, exploded to
    (id, shingle) rows — the join-able form used by exact Jaccard."""
    d, sh = _shingle_parts(df, n, id_col, text_col)
    # explode_outer, not explode: InferFiltersFromGenerate gives plain
    # explode a `size(x)>0 AND isnotnull(x)` filter that duplicates the
    # entire inline shingle expression 3× per row; the array is non-empty
    # by construction (short docs yield [norm]), so outer ≡ inner here
    return d.select("id", F.explode_outer(sh).alias("shingle"))


def jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (id_a < id_b, jaccard ≥ τ).

    jaccard = |A ∩ B| / (|A| + |B| − |A ∩ B|) over distinct shingle
    sets.  This is the *correctness oracle* for MinHash; the self-join
    on shingle is quadratic in docs-per-shingle, so at 100 TB use
    :func:`minhash_dedup` (banded LSH) and reserve this for candidate
    verification or small corpora.

    ``max_shingle_df`` is the skew guard for when this DOES run at
    size: shingles whose document frequency exceeds the cap are dropped
    from the join's candidate-generation side (a count-over-window
    filter, one extra shuffle on the same key).  The intersection
    counts then UNDERCOUNT pairs that share only ultra-common shingles
    — with the denominator still exact, reported jaccard is a lower
    bound, so τ-filtering loses only pairs held together by
    boilerplate.  Default None keeps the operator an exact oracle."""
    # the self-join runs in 64-BIT HASH SPACE (r11, the same trade the
    # minhash verify join made in r10): an (id, shingle-string) relation
    # shuffles ~3x the bytes of (id, xxhash64) and the intersection
    # counts — hence every jaccard — are unchanged unless two distinct
    # shingles of one pair's union collide in 64 bits (~1e-16/pair).
    # Denominators come from the array form below and are exact either
    # way.  Measured at sf0.1: 16.6 -> ~6 MB self-join shuffle, wall
    # 1.6-3.9 s -> 1.3-1.7 s, byte-identical pair set.
    sh = word_shingles(df, n=n, id_col=id_col, text_col=text_col).select(
        "id", F.xxhash64("shingle").alias("shingle")
    )
    if max_shingle_df is not None:
        from pyspark.sql.window import Window

        sh = sh.withColumn(
            "__df", F.count("*").over(Window.partitionBy("shingle"))
        ).filter(F.col("__df") <= max_shingle_df).drop("__df")
    # set sizes from the array form: per-row size(), no explode+groupBy
    sizes = shingled(df, n=n, id_col=id_col, text_col=text_col).select(
        # coalesce makes sz provably non-nullable: otherwise the join
        # constraint isnotnull(sz) is inferred, inlined through the
        # projections as isnotnull(size(<full shingle expr>)), and pushed
        # below the repartition onto the single-partition scan — measured
        # as a 25 s single-task stage (the array is never null; -1 is dead)
        "id", F.coalesce(F.size("__sh"), F.lit(-1)).alias("sz")
    )
    # hash-partition both sides on the join key: the self-join fans out
    # (docs-per-shingle)² pairs per shingle — it must run wide, and the
    # identical child plans let Catalyst reuse one exchange for both sides
    sh_parted = sh.repartition("shingle")
    a = sh_parted.alias("a")
    b = sh_parted.alias("b")
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
    """MinHash signature per doc: bigint columns mh_0..mh_{k-1}.

    ONE md5 per shingle (materialized as a 30-bit int array), then the
    k hash families are cheap universal-hash mixes
    ``(a_i·h30 + b_i) mod (2^31−1)`` with splitmix64-derived random
    constants (:func:`minhash_family_constants` — format v3; the
    pre-v3 ``a_i = 2i+1`` family correlated across bands) — pure
    64-bit-safe integer arithmetic, identical in any ANSI SQL engine
    (oracle parity), ~10× cheaper than one md5 per (family × shingle).

    Scale: a pure per-row projection (array_min per family over the
    materialized hash array) — zero explode, zero shuffle; the
    signature stage rides inside the scan at any data size.
    """
    d, sh = _shingle_parts(df, n, id_col, text_col)
    out = d.select("id", _h30_of_shingles(sh).alias("__h30"))
    return _sig_of_h30(out, num_hashes)


def _h30_of_shingles(sh: Column) -> Column:
    """array<string> shingles → array<bigint> base hashes: one md5 per
    shingle, low 30 bits (materialized once so the k family mixes
    reference it, not recompute it)."""
    return F.transform(
        sh,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
        .cast("long")
        .bitwiseAND(F.lit((1 << 30) - 1)),
    )


#: MinHash family modulus: the Mersenne prime 2^31 − 1.
_MH_PRIME = 2147483647


def minhash_family_constants(i: int) -> "tuple[int, int]":
    """``(a_i, b_i)`` of MinHash family i: ``h ↦ (a_i·h + b_i) mod p``
    with ``p = 2³¹−1`` — the ONE definition shared by the Spark fold
    (:func:`_mh_fold`), the DuckDB oracle generators, and the
    known-answer test.

    The constants are the splitmix64 finalizer of the family index
    (public-domain mixing constants; Steele et al., "Fast splittable
    pseudorandom number generators"), giving random-looking,
    family-independent multipliers ``a_i ∈ [1, p−1]`` and offsets
    ``b_i ∈ [0, p−1]``.  The pre-v3 family (``a_i = 2i+1``,
    ``b_i = 7919·i``) used TINY multipliers: an affine map mod p with
    multiplier a has ≤a monotonic segments, so it is largely
    order-preserving and the k family argmins correlate strongly — a
    doc whose unique shingle draws the globally minimal base hash won
    ALL families (hence all LSH bands) at once and shared no bucket
    with any near-duplicate sibling.  Measured on a 3000-family
    near-dup corpus: 280/90,000 family members invisible to the pair
    graph, ~500× the (1−(1−s^r)^b)-style independence bound
    (CORRECTNESS_PAIRS1M_r11.json, NOTES_r11 §4).  Large random
    multipliers restore effectively independent permutations at
    identical per-row cost; dedup-index format v3.
    """
    x = (i + 1) * 0x9E3779B97F4A7C15 % 2**64
    x ^= x >> 30
    x = x * 0xBF58476D1CE4E5B9 % 2**64
    x ^= x >> 27
    x = x * 0x94D049BB133111EB % 2**64
    x ^= x >> 31
    return 1 + x % (_MH_PRIME - 1), (x >> 33) % _MH_PRIME


def _mh_fold(h30: Column, k: int) -> Column:
    """array<bigint> base hashes → array<bigint> of the k family
    minima — the signature fold shared by :func:`_sig_of_h30` and
    :func:`_stacked_buckets` (the two MUST agree bit-for-bit: the
    incremental path joins batch bands against a stored corpus index).

    ONE pass over the hash array for all k families: an ``aggregate``
    with a k-wide min accumulator; each element folds into every
    family via ``zip_with`` against a constant array of per-family
    ``(a, b)`` structs.  Zipping against the constants array (rather
    than a 0..k−1 index sequence) keeps the per-family constants out
    of Python-closure default arguments entirely — pyspark passes
    ``(element, array_index)`` to two-parameter lambdas, and a
    ``lambda h, i=i:`` closure gets its family index SHADOWED by the
    element position (the r5 family-collapse recall bug, pinned by
    ``test_minhash_signatures_known_answer``).

    All arithmetic is 64-bit safe: ``a < 2³¹``, ``h < 2³⁰`` →
    ``a·h + b < 2⁶¹ + 2³¹``.
    """
    ab = F.array(
        *[
            F.struct(
                F.lit(minhash_family_constants(i)[0])
                .cast("long")
                .alias("a"),
                F.lit(minhash_family_constants(i)[1])
                .cast("long")
                .alias("b"),
            )
            for i in range(k)
        ]
    )
    acc0 = F.array_repeat(F.lit(_MH_PRIME).cast("long"), k)
    return F.aggregate(
        h30,
        acc0,
        lambda acc, h: F.zip_with(
            acc,
            ab,
            lambda m, c: F.least(
                m, (c["a"] * h + c["b"]) % F.lit(_MH_PRIME)
            ),
        ),
    )


def _sig_of_h30(df: DataFrame, num_hashes: int) -> DataFrame:
    """(id, __h30) → (id, mh_0..mh_{k-1}) universal-hash family mins.

    One-pass fold over the hash array for all k families — see
    :func:`_mh_fold` for the shape and the family constants, and
    :func:`minhash_family_constants` for why the constants are
    splitmix64-derived (v3 decorrelation fix).  The
    k-separate-``transform`` formulation costs k array passes and k
    near-identical generated expressions (measured at sf0.1: 4.1 s
    cold / 0.75 s warm vs 0.68 s cold / 0.55 s warm for the one-pass
    form)."""
    return df.select("id", *_mh_cols(num_hashes))


@functools.lru_cache(maxsize=16)
def _mh_cols(k: int) -> "tuple[Column, ...]":
    """mh_0..mh_{k-1} projection columns over ``__h30`` — memoized;
    the k-struct constants array alone is ~100 py4j calls per build
    (see :func:`_sh_expr` for why Column reuse is safe)."""
    agg = _mh_fold(F.col("__h30"), k)
    return tuple(
        F.element_at(agg, i + 1).alias(f"mh_{i}") for i in range(k)
    )


def _stacked_buckets(
    df: DataFrame,
    num_hashes: int,
    bands: int,
    n: int,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """(id, band_idx, bucket) LSH banding relation: band bucket =
    ``xxhash64`` LONG over that band's signature slice (r10 format,
    index version 2 — the md5-string era is refused by
    :func:`read_dedup_index`'s version guard).

    Single-projection form (r6, VERDICT r5 item 6): going through the
    ``mh_0..mh_{k-1}`` columns of :func:`minhash_signatures` lets
    CollapseProject inline the k-wide signature FOLD into every band
    expression — 12 copies of the aggregate per row, and a 12×-bigger
    expression tree for Catalyst to analyze (measured: the batch-side
    banding of a 5k-doc micro-batch cost ~2.7 s, almost all plan
    analysis + re-evaluated folds).  Here the signature array is bound
    ONCE per row with the HOF let-binding idiom —
    ``transform(array(sig), s -> ...)`` evaluates ``sig`` a single
    time and the inner lambda references the bound variable — then the
    per-band buckets are ``xxhash64`` longs over element_at slices of
    that bound array, paired with a separate band_idx column (8-byte
    shuffle keys vs
    the md5 era's 32-char strings — the r10 verify-bytes fix).  Bucket
    values are bit-identical to the two-step form
    (pinned by ``test_stacked_buckets_matches_two_step``); only the
    evaluation count changes."""
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    d, _ = _shingle_parts(df, n, id_col, text_col)
    # explode_outer: see _bands_of_sig (the array is always size
    # `bands`; outer avoids InferFiltersFromGenerate duplication)
    return d.select(
        "id", F.explode_outer(_banded_expr(n, num_hashes, bands)).alias("bb")
    ).select(
        "id",
        F.col("bb.band_idx").alias("band_idx"),
        F.col("bb.bucket").alias("bucket"),
    )


@functools.lru_cache(maxsize=16)
def _banded_expr(n: int, num_hashes: int, bands: int) -> Column:
    """The per-row array<struct<band_idx,bucket>> banding expression of
    :func:`_stacked_buckets` — memoized per parameter triple (~340 ms
    of py4j round-trips per build otherwise, paid per micro-batch in
    the streaming gate; see :func:`_sh_expr` for the reuse contract)."""
    rows_per_band = num_hashes // bands
    sig = _mh_fold(_h30_of_shingles(_sh_expr(n)), num_hashes)
    return F.element_at(
        F.transform(
            F.array(sig),
            lambda s: F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.cast("int").alias("band_idx"),
                    # bucket = xxhash64 of the band's min-hash LONGS —
                    # equality-preserving vs the md5-hex string the
                    # oracle uses (same band values ⟺ same bucket) at
                    # 8 bytes instead of a 32-char string: the banding
                    # groupBy is the candidate stage's only corpus-sized
                    # shuffle, measured 874 MB of the sf100 leg before
                    # this change.  A 64-bit bucket collision can only
                    # ADD a candidate pair, which exact verification
                    # then filters — never drops one.
                    F.xxhash64(
                        *[
                            F.element_at(
                                s, b * F.lit(rows_per_band) + F.lit(r + 1)
                            )
                            for r in range(rows_per_band)
                        ]
                    ).alias("bucket"),
                ),
            ),
        ),
        1,
    )


def _bands_of_sig(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """Signature relation → exploded (id, band_idx, bucket)."""
    if num_hashes % bands != 0:
        raise ValueError("num_hashes must be divisible by bands")
    rows_per_band = num_hashes // bands
    band_cols = [
        # same xxhash64-of-longs bucket as _stacked_buckets — the two
        # builders MUST agree bit-for-bit (the incremental path joins
        # batch bands against a stored corpus index)
        F.xxhash64(
            *[
                F.col(f"mh_{b * rows_per_band + r}")
                for r in range(rows_per_band)
            ]
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select("id", *band_cols)
    # explode_outer: avoids the InferFiltersFromGenerate duplication of
    # the inline band/signature expressions (the array is always size
    # `bands`, never empty — outer ≡ inner); measured 48 copies of the
    # signature expr in the plan with plain explode
    return banded.select(
        "id",
        F.explode_outer(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), F.col(f"band_{b}").alias("bucket"))
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", F.col("bb.band_idx").alias("band_idx"), F.col("bb.bucket").alias("bucket"))


def minhash_dedup(
    df: DataFrame,
    num_hashes: int = 12,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket_size: int | None = 512,
    log_dropped: bool = True,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-verified.

    signature → ``bands`` bands of ``num_hashes/bands`` rows → band
    bucket = md5(concat of the band's rows) → docs sharing any bucket
    are candidates → candidates verified with exact n-gram Jaccard ≥ τ.

    Scale: the only shuffles are (1) groupBy doc for signatures,
    (2) groupBy band-bucket (bounded fan-out), (3) the verification
    join over *candidates only* — no all-pairs stage.  Returns
    (id_a, id_b, jaccard).

    **Hot-bucket cap** (``max_bucket_size``): a degenerate corpus —
    millions of empty/boilerplate docs sharing one signature — would
    otherwise concentrate into a single band bucket whose
    ``collect_list`` blows an executor and whose pair expansion is
    quadratic.  The cap keeps only the first ``max_bucket_size`` ids
    (per-bucket ``row_number``, id order — deterministic) **before**
    the list is collected, so executor memory is bounded at
    cap × id-width per bucket regardless of corpus degeneracy.

    The cap is LOSSY in the degenerate case it guards against: docs
    whose signatures FULLY collide (identical in every band — e.g.
    identical or near-empty texts) rank in the same id order in every
    band, so all ``bands`` buckets keep the same first
    ``max_bucket_size`` ids and every pair among the docs beyond the
    cap is silently lost (a 10⁴-identical-doc corpus yields only
    C(cap, 2) pairs).  Docs that collide in only SOME bands still get
    their chance in the others.  Mitigation for the lossy case: run
    :func:`exact_dedup` first — fully-identical docs are its job, and
    removing them leaves the cap handling only genuine near-dups.
    ``log_dropped`` (default True, so silent loss is visible) counts
    the dropped (bucket, id) rows for FREE: the pre-cap bucket size
    rides the existing row_number window (same spec, no new exchange
    or sort) and the drop total is an ``observe()`` metric collected
    during the candidate materialization action — no persist of the
    banding relation, no second pass (r3's accounting cost the happy
    path ~0.7 s/query at sf0.1) — then warned through the module
    logger.
    """
    stacked = _stacked_buckets(
        df, num_hashes=num_hashes, bands=bands, n=n,
        id_col=id_col, text_col=text_col,
    )
    # candidate pairs via groupBy(bucket) + in-bucket pair expansion — ONE
    # evaluation of the signature pipeline (a self-join would recompute it
    # on both sides) and a shuffle bounded by doc count × bands.
    capping = max_bucket_size is not None
    obs = None
    if capping:
        from pyspark.sql.window import Window

        # cap BEFORE collect_list: the window shuffle partitions on the
        # same (band_idx, bucket) keys as the groupBy below, so Catalyst
        # reuses the exchange — capping costs a per-bucket sort, not an
        # extra shuffle, and the agg buffer never holds a hot bucket
        w = Window.partitionBy("band_idx", "bucket").orderBy("id")
        wn = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ranked = stacked.withColumn("__rn", F.row_number().over(w))
        if log_dropped:
            # pre-cap bucket size rides the SAME window spec (one
            # Window operator, no new exchange/sort) so the kept rows
            # remember how big their bucket really was
            ranked = ranked.withColumn("__bn", F.count("*").over(wn))
        stacked = ranked.filter(F.col("__rn") <= max_bucket_size).drop("__rn")
    bucket_aggs = [F.sort_array(F.collect_list("id")).alias("ids")]
    if capping and log_dropped:
        bucket_aggs.append(F.max("__bn").alias("__bn"))
    grouped = stacked.groupBy("band_idx", "bucket").agg(*bucket_aggs)
    if capping and log_dropped:
        from pyspark.sql import Observation

        # drop accounting as an observe() metric: computed inside the
        # candidate materialization action below, costing NOTHING extra
        obs = Observation("minhash_hot_bucket_cap")
        grouped = grouped.observe(
            obs, F.sum(F.col("__bn") - F.size("ids")).alias("dropped")
        ).drop("__bn")
    grouped = (
        grouped.filter(F.size("ids") > 1)
        .withColumn("__m", F.size("ids"))
    )
    ids = F.col("ids")
    pair_arr = F.flatten(
        F.transform(
            ids,
            lambda x, i: F.transform(
                F.slice(ids, i + F.lit(2), F.col("__m")),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    # persist: the candidate relation is small by construction (pairs
    # surviving banding) but its subtree contains the whole signature
    # pipeline — without a persist, every verification branch referencing
    # it re-scans and re-hashes the corpus (measured 8 FileScans/query)
    from pyspark import StorageLevel

    cands = (
        grouped.select(F.explode_outer(pair_arr).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # materialize the persist NOW: three downstream consumers (the
    # candidate-id broadcast plus both pair joins) otherwise race to
    # compute the unmaterialized cached plan concurrently — measured as
    # a bimodal 6 s ↔ 24 s swing from duplicate evaluation of the
    # signature pipeline under block-manager lock contention
    cands.count()
    if obs is not None:
        import logging

        # the count() above already executed the observed subtree;
        # obs.get is a driver-side dict lookup, not a Spark job
        dropped = obs.get.get("dropped") or 0
        if dropped:
            logging.getLogger(__name__).warning(
                "minhash_dedup: hot-bucket cap %d dropped %d (bucket, id) "
                "rows from candidate generation",
                max_bucket_size,
                dropped,
            )
    # exact verification restricted to CANDIDATE pairs only. The
    # candidate DOC set after banding is tiny relative to the corpus
    # (bounded by LSH collisions), so: broadcast-semi-filter the corpus
    # down to candidate docs, carry each doc's distinct-shingle ARRAY in
    # one row, and verify each pair with a JVM array_intersect — no
    # corpus-wide explode, no (id, shingle) shuffle at all. Cost:
    # O(|cand docs| · shingles/doc) intersect work on a relation the
    # size of the candidate list.  (At a degenerate scale where the
    # candidate set itself outgrows the broadcast threshold, swap the
    # broadcast for a shuffle semi-join — same plan shape.)
    cand_ids = (
        cands.select(F.col("id_a").alias("id"))
        .union(cands.select(F.col("id_b").alias("id")))
        .distinct()
    )
    cand_sh = (
        shingled(df, n=n, id_col=id_col, text_col=text_col)
        .join(F.broadcast(cand_ids), "id", "left_semi")
        # coalesce keeps the array provably non-nullable so no inferred
        # isnotnull(<full shingle expr>) filter sinks below the scan.
        # Verification runs in 64-BIT HASH SPACE: the pair joins below
        # go sort-merge once the candidate relation outgrows the 64 MB
        # broadcast threshold (measured at the r10 sf100 leg: 29% of a
        # template-heavy corpus is an LSH candidate), and an
        # array<string> of word 3-grams is ~3× the bytes of the
        # xxhash64 array — hashing cuts the verify-join shuffle by
        # that factor forever.  Intersection/size COUNTS (and hence
        # every jaccard value) are unchanged unless two distinct
        # shingles of one pair's union collide in 64 bits
        # (~k²/2⁶⁴ ≈ 1e-16 per pair at k≈50) — the same hash-space
        # verification trade BFF/Dolma-class dedup tooling makes.
        .select(
            "id",
            F.transform(
                F.coalesce(F.col("__sh"), F.array()),
                lambda s: F.xxhash64(s),
            ).alias("__sh"),
        )
        # candidate-doc-cardinality relation whose subtree is a corpus
        # scan + shingling: BOTH pair-join sides read it, so persist —
        # one shingling pass, not two (the cache is bounded by the
        # candidate list, and the session drains it with clearCache)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = cand_sh.select(F.col("id").alias("id_a"), F.col("__sh").alias("__sh_a"))
    b = cand_sh.select(F.col("id").alias("id_b"), F.col("__sh").alias("__sh_b"))
    n_inter = F.size(F.array_intersect(F.col("__sh_a"), F.col("__sh_b")))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("n_inter", n_inter)
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (
                F.size("__sh_a") + F.size("__sh_b") - F.col("n_inter")
            ).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


#: index-encoding version stamped into the index meta: 1 = md5 hex
#: string buckets (pre-r10), 2 = xxhash64 long buckets over the
#: correlated ``a_i = 2i+1`` hash families, 3 = xxhash64 long buckets
#: over splitmix64-decorrelated families (the r11 recall-tail fix —
#: see :func:`minhash_family_constants`; every stored signature/bucket
#: changes, so v2 indexes are refused and migrated).  Bump when the
#: banding encoding changes; :func:`migrate_dedup_index` upgrades.
DEDUP_INDEX_FORMAT_VERSION = 3


def write_dedup_index(
    corpus_df: DataFrame,
    path: str,
    num_hashes: int = 12,
    bands: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Persist the corpus-side LSH dedup index — the steady-state
    artifact that makes incremental/streaming dedup cost ∝ batch, not
    ∝ corpus.  One-time O(|corpus|) shingle+signature work, then every
    batch joins against the stored relations instead of recomputing
    them.

    Layout under ``path`` (any Hadoop-FS scheme):

    * ``banding/``  — (id, band_idx, bucket), range-partitioned and
      sorted by (band_idx, bucket) so parquet row-group min/max stats
      make a pushed ``bucket IN (...)`` filter skip everything but the
      probed buckets (see :func:`minhash_dedup_incremental`'s
      bucket-pushdown).
    * ``shingles/`` — (id, __sh array<string>): each doc's distinct
      shingle set, the verification side (exact-Jaccard needs the
      candidate old docs' shingles without re-scanning corpus text).
    * ``meta/``     — single row (num_hashes, bands, n): the banding
      parameters, validated on read so a batch can never probe an
      index built with different hashing.

    Rebuild cadence: append-only corpora can union a new banding delta
    (the relation is keyed, order-free); compaction rewrites.

    Build cost discipline: the corpus is shingled ONCE into a cached
    relation feeding both outputs, and the banding relation is itself
    persisted before the range shuffle — ``repartitionByRange`` samples
    its child to pick bounds, which would otherwise execute the whole
    signature pipeline a second time.  Meta is one tiny JSON written
    through the Hadoop FS API (no Spark job for three integers).
    """
    from pyspark import StorageLevel

    p = path.rstrip("/")
    sh = (
        shingled(corpus_df, n=n, id_col=id_col, text_col=text_col)
        .select("id", F.coalesce(F.col("__sh"), F.array()).alias("__sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # sorted by id: a batch's candidate-id IN filter row-group-skips
    # straight to the candidate docs' shingle rows
    (
        sh.repartitionByRange("id")
        .sortWithinPartitions("id")
        .write.mode("overwrite")
        .parquet(p + "/shingles")
    )
    sig = _sig_of_h30(
        sh.select("id", _h30_of_shingles(F.col("__sh")).alias("__h30")),
        num_hashes,
    )
    banding = _bands_of_sig(sig, num_hashes, bands).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    (
        banding.repartitionByRange("band_idx", "bucket")
        .sortWithinPartitions("band_idx", "bucket")
        .write.mode("overwrite")
        .parquet(p + "/banding")
    )
    sh.unpersist()
    banding.unpersist()
    _write_meta_json(
        corpus_df.sparkSession,
        p + "/meta.json",
        {
            "num_hashes": num_hashes,
            "bands": bands,
            "n": n,
            "format_version": DEDUP_INDEX_FORMAT_VERSION,
        },
    )
    return path


def _write_meta_json(spark, path: str, meta: dict) -> None:
    """Tiny driver-side JSON write through the Hadoop FS API — works on
    any scheme (file/hdfs/s3a) without scheduling a Spark job."""
    import json

    jvm = spark._jvm  # noqa: SLF001
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    out = fs.create(hpath, True)
    try:
        out.write(bytearray(json.dumps(meta).encode("utf-8")))
    finally:
        out.close()


def _read_meta_json(spark, path: str) -> dict:
    import json

    jvm = spark._jvm  # noqa: SLF001
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(conf)
    stream = fs.open(hpath)
    try:
        buf = bytearray()
        while True:
            b = stream.read()
            if b < 0:
                break
            buf.append(b)
    finally:
        stream.close()
    return json.loads(bytes(buf).decode("utf-8"))


def read_dedup_index(spark, path: str):
    """Load a :func:`write_dedup_index` index.

    Returns ``(banding_df, shingles_df, params)`` where ``params`` is
    the dict of banding parameters the index was built with — pass
    them to :func:`minhash_dedup_incremental` so the batch side hashes
    identically.
    """
    p = path.rstrip("/")
    params = _read_meta_json(spark, p + "/meta.json")
    ver = int(params.pop("format_version", 1))  # banding params only
    banding = spark.read.parquet(p + "/banding")
    # format guard: probing a stale index with current batch bands
    # would silently match nothing — v1 buckets are md5 hex strings
    # (r10 moved to xxhash64 longs), and v2 longs hash the correlated
    # pre-r11 signature families, so NO bucket value is comparable
    # across versions even though the v2 column type matches
    bt = dict(banding.dtypes).get("bucket")
    if bt != "bigint" or ver != DEDUP_INDEX_FORMAT_VERSION:
        raise ValueError(
            f"dedup index at {path} is format v{ver} (bucket type "
            f"{bt!r}); this engine reads "
            f"v{DEDUP_INDEX_FORMAT_VERSION} — run "
            "migrate_dedup_index(spark, path) to upgrade in place "
            "(reuses the stored shingles; no corpus re-scan), or "
            "rebuild with write_dedup_index"
        )
    return (
        banding,
        spark.read.parquet(p + "/shingles"),
        params,
    )


def migrate_dedup_index(spark, path: str) -> bool:
    """Upgrade a stale dedup index (v1 md5-string buckets, or v2
    xxhash64 buckets over the correlated hash families) to the current
    format IN PLACE — without re-shingling the corpus (VERDICT r10
    "next round" #3; extended to v2→v3 for the r11 family-correlation
    fix).

    At 100 TB the expensive part of :func:`write_dedup_index` is the
    corpus text scan (normalize + shingle + explode); the stored
    ``shingles/`` relation already holds every doc's distinct shingle
    set and is format-stable across every encoding bump so far.  The
    MinHash signature is a pure function of those shingles, so the
    banding relation can be recomputed from ``shingles/`` alone:
    read shingles → ``_h30_of_shingles`` → ``_sig_of_h30`` →
    :func:`_bands_of_sig` (the current encoder) → rewrite ``banding/``
    with the same range-partitioned, sorted layout the writer uses —
    bucket pushdown keeps working.  Candidates served afterwards are
    IDENTICAL to a full ``write_dedup_index`` rebuild (pinned by
    ``test_migrate_dedup_index_v1_to_v3`` /
    ``test_migrate_dedup_index_v2_to_v3``) because both derive the
    banding from the same shingle sets.

    Swap discipline: the new banding lands in ``banding.migrate`` and
    is committed with two FS renames (``banding → banding.v{old}.bak``,
    ``banding.migrate → banding``); the backup is removed only after
    the meta version stamp is rewritten, so a crash mid-migration
    leaves either a refusable stale index or a complete current one,
    never a half-written banding directory.  Run it offline —
    concurrent probes during the swap window would hit a missing
    directory (index maintenance, like compaction, is a scheduled
    operation).

    Returns True if a migration ran, False if the index was already
    current (idempotent — safe to call unconditionally at startup).
    """
    p = path.rstrip("/")
    meta = _read_meta_json(spark, p + "/meta.json")
    ver = int(meta.get("format_version", 1))
    banding = spark.read.parquet(p + "/banding")
    if (
        ver >= DEDUP_INDEX_FORMAT_VERSION
        and dict(banding.dtypes).get("bucket") == "bigint"
    ):
        return False  # already current
    num_hashes, bands = int(meta["num_hashes"]), int(meta["bands"])

    sh = spark.read.parquet(p + "/shingles")
    sig = _sig_of_h30(
        sh.select("id", _h30_of_shingles(F.col("__sh")).alias("__h30")),
        num_hashes,
    )
    new_banding = _bands_of_sig(sig, num_hashes, bands)
    (
        new_banding.repartitionByRange("band_idx", "bucket")
        .sortWithinPartitions("band_idx", "bucket")
        .write.mode("overwrite")
        .parquet(p + "/banding.migrate")
    )

    jvm = spark._jvm  # noqa: SLF001
    conf = spark._jsc.hadoopConfiguration()  # noqa: SLF001
    hp = jvm.org.apache.hadoop.fs.Path(p)
    fs = hp.getFileSystem(conf)

    def _hpath(name: str):
        return jvm.org.apache.hadoop.fs.Path(p + "/" + name)

    bak = _hpath(f"banding.v{ver}.bak")
    if fs.exists(bak):
        fs.delete(bak, True)
    if not fs.rename(_hpath("banding"), bak):
        raise IOError(f"could not move aside v{ver} banding under {path}")
    if not fs.rename(_hpath("banding.migrate"), _hpath("banding")):
        # roll back so the index stays a valid (refusable) stale one
        fs.rename(bak, _hpath("banding"))
        raise IOError(f"could not commit migrated banding under {path}")
    meta = {**meta, "format_version": DEDUP_INDEX_FORMAT_VERSION}
    _write_meta_json(spark, p + "/meta.json", meta)
    fs.delete(bak, True)
    return True


def minhash_dedup_incremental(
    new_df: DataFrame,
    corpus_df: DataFrame | None = None,
    num_hashes: int = 12,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    corpus_banding: DataFrame | None = None,
    corpus_shingles: DataFrame | None = None,
    bucket_pushdown_limit: int = 100_000,
    collect_candidates: bool = True,
) -> DataFrame:
    """Incremental near-dup check: a NEW batch against the EXISTING
    corpus — the production update flow (daily crawl vs the lake).

    Candidates come from joining the new batch's band buckets against
    the corpus's band buckets: **never new×new or corpus×corpus**, so
    the cost is proportional to the batch's bucket collisions, not the
    corpus size — re-running full dedup on corpus+batch would redo
    O(|corpus|) signature work per update and regenerate all historical
    pairs.

    Two corpus-side modes:

    * ``corpus_df`` — the banding and shingles are computed inline
      (one-shot use; fine for a single batch check).
    * ``corpus_banding`` + ``corpus_shingles`` (from
      :func:`write_dedup_index` / :func:`read_dedup_index`) — the
      steady-state path: NO corpus text is scanned and no corpus
      signature is recomputed.  The batch's (small, persisted) bucket
      set is additionally collected and pushed into the banding scan as
      a ``bucket IN (...)`` parquet filter when it has at most
      ``bucket_pushdown_limit`` entries — with the index sorted by
      (band_idx, bucket), row-group min/max stats skip every non-probed
      bucket, so the scan reads ∝ matched buckets, not ∝ corpus.
      This is what a long-running streaming gate must use: per-batch
      work collapses to batch hashing + an indexed probe.  With
      ``collect_candidates`` (default), the tiny candidate pair set is
      additionally collected once and the verification stage is built
      from literals — 2 driver jobs per batch instead of 4, which is
      the difference that shows up when every micro-batch pays
      scheduling overhead; set it False to keep the fully-plan-side
      shape (adversarial batches whose candidates exceed
      ``bucket_pushdown_limit`` fall back to it automatically).

    Verification is the same exact-Jaccard array-intersect as
    :func:`minhash_dedup`, restricted to candidate docs on each side.
    Returns (id_new, id_old, jaccard ≥ τ).
    """
    if corpus_df is None and (corpus_banding is None or corpus_shingles is None):
        raise ValueError(
            "pass corpus_df, or both corpus_banding and corpus_shingles"
        )
    from pyspark import StorageLevel

    s_new = _stacked_buckets(
        new_df, num_hashes=num_hashes, bands=bands, n=n,
        id_col=id_col, text_col=text_col,
    )
    if corpus_banding is not None:
        s_old = corpus_banding.select(
            F.col("id").alias("id_old"),
            F.col("band_idx").alias("band_idx_o"),
            F.col("bucket").alias("bucket_o"),
        )
        # the batch banding feeds two consumers (bucket collection +
        # the candidate join) — persist so signatures compute once
        s_new = s_new.persist(StorageLevel.MEMORY_AND_DISK)
        probe = [
            r["bucket"]
            for r in s_new.select("bucket")
            .distinct()
            .limit(bucket_pushdown_limit + 1)
            .collect()
        ]
        if len(probe) <= bucket_pushdown_limit:
            # pushed to the parquet scan; superset of the join keys
            # (band_idx still enforced by the join itself).  One parsed
            # IN string, not isin() — see _in_literals (driver cost)
            s_old = s_old.filter(_in_literals("bucket_o", probe))
    else:
        s_old = _stacked_buckets(
            corpus_df, num_hashes=num_hashes, bands=bands, n=n,
            id_col=id_col, text_col=text_col,
        ).select(
            F.col("id").alias("id_old"),
            F.col("band_idx").alias("band_idx_o"),
            F.col("bucket").alias("bucket_o"),
        )

    # index mode: the batch side is small by definition (one
    # micro-batch / daily increment) — an explicit broadcast makes the
    # candidate probe a build-batch + stream-the-index-scan hash join
    # with NO shuffle of the (corpus-sized) banding relation, and keeps
    # the plan right even where AQE can't re-plan (foreachBatch bodies
    # contain a streaming source, which disables AQE)
    s_new_j = F.broadcast(s_new) if corpus_banding is not None else s_new
    cands = (
        s_new_j.join(
            s_old,
            (s_new.band_idx == s_old.band_idx_o)
            & (s_new.bucket == s_old.bucket_o),
        )
        .select(F.col("id").alias("id_new"), "id_old")
        .distinct()
    )
    spark = new_df.sparkSession
    cand_rows = None
    if corpus_banding is not None and collect_candidates:
        # Index mode is the per-micro-batch hot path of a streaming
        # gate, where every driver action is a scheduled job.  The
        # candidate pair set is tiny by construction (∝ the batch's LSH
        # collisions), so collect it ONCE and derive everything — the
        # verify-join relation and both IN pushdown lists — from the
        # collected rows: 2 jobs per batch (bucket probe + this)
        # instead of 4 (probe, count, old-id collect, plus recompute).
        cand_rows = cands.limit(bucket_pushdown_limit + 1).collect()
        if len(cand_rows) > bucket_pushdown_limit:
            cand_rows = None  # adversarial batch: fall back to plans
    if cand_rows is not None:
        s_new.unpersist()
        if not cand_rows:
            return spark.createDataFrame(
                [], "id_new long, id_old long, jaccard double"
            )
        cands = spark.createDataFrame(
            [(r["id_new"], r["id_old"]) for r in cand_rows],
            cands.schema,
        )
        new_id_vals = sorted({r["id_new"] for r in cand_rows})
        old_id_vals = sorted({r["id_old"] for r in cand_rows})
        sh_new = (
            shingled(new_df, n=n, id_col=id_col, text_col=text_col)
            .filter(_in_literals("id", new_id_vals))
            .select(
                F.col("id").alias("id_new"),
                F.coalesce(F.col("__sh"), F.array()).alias("__sh_n"),
            )
        )
        # candidate-old-id IN filter: with the index sorted by id,
        # row-group stats skip every non-candidate doc, so the
        # verification read is ∝ candidates
        sh_old_src = corpus_shingles.filter(_in_literals("id", old_id_vals))
    else:
        cands = cands.persist(StorageLevel.MEMORY_AND_DISK)
        cands.count()  # materialize once; three consumers below
        if corpus_banding is not None:
            s_new.unpersist()
        new_ids = cands.select(F.col("id_new").alias("id")).distinct()
        old_ids = cands.select(F.col("id_old").alias("id")).distinct()
        sh_new = (
            shingled(new_df, n=n, id_col=id_col, text_col=text_col)
            .join(F.broadcast(new_ids), "id", "left_semi")
            .select(
                F.col("id").alias("id_new"),
                F.coalesce(F.col("__sh"), F.array()).alias("__sh_n"),
            )
        )
        if corpus_shingles is not None:
            sh_old_src = corpus_shingles.join(
                F.broadcast(old_ids), "id", "left_semi"
            )
        else:
            sh_old_src = shingled(
                corpus_df, n=n, id_col=id_col, text_col=text_col
            ).join(F.broadcast(old_ids), "id", "left_semi")
    sh_old = sh_old_src.select(
        F.col("id").alias("id_old"),
        F.coalesce(F.col("__sh"), F.array()).alias("__sh_o"),
    )
    n_inter = F.size(F.array_intersect(F.col("__sh_n"), F.col("__sh_o")))
    if corpus_banding is not None:
        # both verification sides are candidate-filtered (tiny) — hint
        # them so the joins stay broadcast without AQE (see above)
        cands = F.broadcast(cands)
        sh_old = F.broadcast(sh_old)
    return (
        cands.join(sh_new, "id_new")
        .join(sh_old, "id_old")
        .withColumn("n_inter", n_inter)
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (
                F.size("__sh_n") + F.size("__sh_o") - F.col("n_inter")
            ).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_new", "id_old", "jaccard")
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

    Implemented as ONE per-row higher-order expression (array fold over
    the distinct tokens with a 32-counter accumulator) — zero shuffle,
    zero explode; at 100 TB this is a pure projection inside the scan
    stage.  Semantics identical to the explode+groupBy formulation
    (same sums over distinct tokens), which remains the DuckDB oracle.
    """
    from ..plans import ensure_parallelism

    if bits > 63:
        raise ValueError("bits must fit a signed 64-bit fingerprint")
    df = ensure_parallelism(df)
    norm_sql = (
        f"lower(regexp_replace(trim({text_col}), '\\\\s+', ' '))"
    )
    expr = f"""
    aggregate(
      zip_with(
        aggregate(
          transform(array_distinct(split({norm_sql}, ' ')),
                    t -> cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)),
          array_repeat(cast(0 as bigint), {bits}),
          (acc, h) -> zip_with(acc, sequence(0, {bits - 1}),
                               (a, b) -> a + (case when (h >> b) & 1 = 1
                                              then 1 else -1 end))),
        sequence(0, {bits - 1}),
        (s, b) -> case when s > 0 then shiftleft(cast(1 as bigint), b)
                  else cast(0 as bigint) end),
      cast(0 as bigint), (acc, x) -> acc + x)
    """
    return df.select(
        F.col(id_col).alias("id"), F.expr(expr).alias("simhash")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ τ).

    Exact all-pairs as a **distributed block matmul**: vectors are
    hashed into ``num_blocks`` blocks, the P·(P+1)/2 block pairs are
    enumerated, and each pair's full cosine matrix is one BLAS
    ``A @ B.T`` inside ``applyInPandas``.  No driver-side collect, data
    replication is exactly P× (the standard √tasks factor for
    distributed all-pairs), and each task's working set is two blocks —
    so the same plan runs at 100 TB by raising ``num_blocks`` until a
    block fits in executor memory.  For true web scale, pre-bucket with
    sign-LSH (`similarity.random_hyperplanes`) and run this within
    buckets only.  Cosine is rounded to 6 dp so the result is stable
    under summation-order differences (BLAS vs sequential fold).
    """
    from ..plans import ensure_parallelism

    spark = df.sparkSession
    P = num_blocks
    v = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).cast("long").alias("id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        )
        .withColumn("block", F.pmod(F.xxhash64("id"), F.lit(P)).cast("int"))
    )
    bp = spark.createDataFrame(
        [(i, j) for i in range(P) for j in range(i, P)], "pa int, pb int"
    )
    a_side = v.join(F.broadcast(bp), v.block == bp.pa).select(
        "pa", "pb", F.lit(0).alias("side"), "id", "v"
    )
    b_side = v.join(F.broadcast(bp), v.block == bp.pb).select(
        "pa", "pb", F.lit(1).alias("side"), "id", "v"
    )
    both = a_side.unionByName(b_side)

    out_schema = "id_a long, id_b long, cosine double"

    def _cross(key, pdf):
        import numpy as np
        import pandas as pd

        pa, pb = key
        A = pdf[pdf["side"] == 0]
        B = pdf[pdf["side"] == 1]
        if not len(A) or not len(B):
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        ida = A["id"].to_numpy()
        idb = B["id"].to_numpy()
        Ma = np.stack(A["v"].to_numpy())
        Mb = np.stack(B["v"].to_numpy())
        na = np.linalg.norm(Ma, axis=1)
        nb = np.linalg.norm(Mb, axis=1)
        # row-blocked matmul: ~2 blk × |B| double intermediates ≈
        # 512 MB per task instead of the full |A|×|B| cosine matrix
        # (25k-row sf10 blocks needed ~3×5 GB per task pre-r8) — same
        # dot/outer-norm arithmetic, rounded at 6 dp, block-invariant
        nb_rows = len(idb)
        blk = max(256, min(len(ida),
                           (256 * 1024 * 1024) // (8 * max(nb_rows, 1))))
        outs = []
        for i0 in range(0, len(ida), blk):
            i1 = min(i0 + blk, len(ida))
            cos = np.round(
                (Ma[i0:i1] @ Mb.T) / np.outer(na[i0:i1], nb), 6
            )
            ia, ib = np.where(cos >= threshold)
            xa, xb, c = ida[ia + i0], idb[ib], cos[ia, ib]
            if pa == pb:
                # A and B are the same block: keep each unordered pair
                # once
                keep = xa < xb
                xa, xb, c = xa[keep], xb[keep], c[keep]
            else:
                # distinct blocks: every unordered pair appears exactly
                # once; emit it in (min, max) order
                lo = np.minimum(xa, xb)
                hi = np.maximum(xa, xb)
                xa, xb = lo, hi
            if len(xa):
                outs.append(
                    pd.DataFrame({"id_a": xa, "id_b": xb, "cosine": c})
                )
        if not outs:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        return pd.concat(outs, ignore_index=True)

    return both.groupBy("pa", "pb").applyInPandas(_cross, out_schema)


def cluster_cosine_pairs(
    assigned: DataFrame,
    threshold: float,
    cluster_col: str = "cluster_id",
    id_col: str = "vec_id",
    vec_col: str = "e",
    block_rows: int | None = None,
) -> DataFrame:
    """Within-cluster cosine near-dup pairs — the SemDeDup pair stage
    as ONE BLAS matmul per cluster.

    Input: (cluster, id, vector) with vectors already assigned to
    clusters; output (cluster_id, id_a < id_b, cosine ≥ τ) with cosine
    rounded to 6 dp (stable under BLAS-vs-sequential summation order).

    Scale shape: one shuffle on the cluster id, then each cluster's
    pair matrix is computed in ROW BLOCKS of ``A @ A.T`` inside
    ``applyInPandas`` (Arrow columnar transfer, vectorized BLAS) —
    ~100× the throughput of a per-pair interpreted fold, with the
    per-task working set bounded at ``block × |cluster|`` doubles
    (~512 MB) instead of the full ``|cluster|²`` cosine matrix (a 50k
    cluster would otherwise materialize 3×20 GB intermediates per task
    — measured killing the sf10 run; r8 fix).  With SemDeDup's k≈√N
    sizing the expected cluster is √N rows ⇒ N total pair-work stays
    ~linear; an oversized cluster is the hot-LSH-bucket case — cap or
    re-cluster upstream (same guardrail as ``minhash_dedup``'s
    ``max_bucket_size``).  Block boundaries cannot change values: each
    (i, j) cosine is the same dot product, rounded the same way
    (pinned by ``test_cluster_cosine_pairs_blocked_identity``).
    """
    sel = assigned.select(
        F.col(cluster_col).alias("__cl"),
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
    )

    def _pairs(key, pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame(
            {"cluster_id": [], "id_a": [], "id_b": [], "cosine": []}
        )
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("__id")  # triu ⇒ id_a < id_b, order-free
        ids = pdf["__id"].to_numpy()
        n = len(ids)
        M = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(M, axis=1)
        nrm[nrm == 0.0] = 1.0  # zero vectors: cosine 0, never ≥ τ > 0
        # row-block size: ~2 block × n double intermediates ≈ 512 MB
        # (block_rows overrides — tests force multi-block on small
        # clusters to pin block-boundary identity)
        blk = block_rows or max(
            256, min(n, (256 * 1024 * 1024) // (8 * max(n, 1)))
        )
        outs = []
        for i0 in range(0, n - 1, blk):
            i1 = min(i0 + blk, n)
            # same arithmetic form as the (pre-r8) full-matrix version
            # and the DuckDB oracle: dot / (|a|·|b|), THEN round
            cos = np.round(
                (M[i0:i1] @ M.T) / np.outer(nrm[i0:i1], nrm), 6
            )
            ia, ib = np.nonzero(cos >= threshold)
            keep = ib > (ia + i0)  # strict upper triangle, global index
            ia, ib = ia[keep], ib[keep]
            if len(ia):
                outs.append(
                    pd.DataFrame(
                        {
                            "cluster_id": int(key[0]),
                            "id_a": ids[ia + i0],
                            "id_b": ids[ib],
                            "cosine": cos[ia, ib],
                        }
                    )
                )
        if not outs:
            return empty
        return pd.concat(outs, ignore_index=True)

    return sel.groupBy("__cl").applyInPandas(
        _pairs, "cluster_id int, id_a bigint, id_b bigint, cosine double"
    )


# --------------------------------------------------------------------------
# Bloom-filter ingestion gate (constant-memory exact-dup membership)
# --------------------------------------------------------------------------


def _bloom_positions(key: Column, m_bits: int, k: int) -> Column:
    """k Bloom bit positions for ``key`` via Kirsch–Mitzenmacher double
    hashing: pos_i = (h1 + i·h2) mod m with h1/h2 two xxhash64 views of
    the key.  Both h's are reduced mod m BEFORE the multiply so i·h2
    never overflows a long under ANSI arithmetic (k·m ≤ 2^40 ≪ 2^63)."""
    h1 = F.pmod(F.xxhash64(key), F.lit(m_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(1)), F.lit(m_bits))
    return F.array(*[
        F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)
    ])


def bloom_bitmap_words(
    df: DataFrame, key_col: str, m_bits: int = 1 << 22, k: int = 5
) -> DataFrame:
    """Build a Bloom filter over ``df[key_col]`` as a RELATION of
    64-bit words: (word_idx, word) with word = OR of all bits set in
    that 64-bit slice.  Pure Catalyst — explode k positions per key,
    one bit_or hash-aggregate — so the build is a single map-side-
    combined shuffle bounded by m/64 rows, never a driver collect of
    corpus keys (the classic sc.treeAggregate-a-bitmap build caps at
    driver memory; a relation does not).

    Sizing: FP rate ≈ (1 − e^(−k·n/m))^k; m = 2^22, k = 5 gives <1%
    at n ≈ 400k keys.  At 10^9+ keys grow m — the words relation is
    m/64 rows (m=2^33 → 134M rows ≈ 1 GiB), at which point the probe
    join below flips from broadcast to a word_idx-keyed shuffle join
    on its own (AQE decides); both shapes are correct.
    """
    pos = df.select(
        F.explode(_bloom_positions(F.col(key_col), m_bits, k)).alias("pos")
    )
    return (
        pos.select(
            F.shiftright("pos", 6).alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    id_col: str,
    words: DataFrame,
    m_bits: int = 1 << 22,
    k: int = 5,
) -> DataFrame:
    """Probe every row's key against a Bloom words relation.  Returns
    (id_col, bloom_maybe): bloom_maybe=false ⇒ the key is DEFINITELY
    absent from the built set; true ⇒ present or false positive.

    Shape: k probes per row joined to the words relation (word_idx
    equi-join), then a count==k agg keyed by id — shuffle ∝ probe side
    only (k rows/key), the filter side never reshuffles.  The words
    side is broadcast-hinted only while m/64 rows stays comfortably
    under the broadcast budget (~16 MiB of longs); past that the hint
    is omitted so autoBroadcastJoinThreshold/AQE pick the join shape,
    matching the m=2^33 growth path in bloom_bitmap_words' docstring
    instead of forcing a ~134M-row broadcast."""
    probes = df.select(
        F.col(id_col),
        F.explode(_bloom_positions(F.col(key_col), m_bits, k)).alias("pos"),
    ).select(
        id_col,
        F.shiftright("pos", 6).alias("word_idx"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
        ).alias("bit"),
    )
    # m/64 words × 16 B/row ≤ 16 MiB ⇒ m ≤ 2^26
    build = F.broadcast(words) if m_bits <= (1 << 26) else words
    j = probes.join(build, "word_idx", "left")
    hit = F.when(
        F.col("word").isNotNull()
        & (F.col("word").bitwiseAND(F.col("bit")) != 0),
        1,
    ).otherwise(0)
    return j.groupBy(id_col).agg((F.sum(hit) == F.lit(k)).alias("bloom_maybe"))


def bloom_dedup_gate(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    m_bits: int = 1 << 22,
    k: int = 5,
) -> DataFrame:
    """Exact-dup ingestion gate with a Bloom prefilter: admit the rows
    of ``new_df`` whose (normalized) text does NOT already exist in
    ``corpus_df`` — the result is EXACTLY the anti-join answer, but the
    expensive corpus-side join runs only over the Bloom "maybe" slice.

    Dataflow: corpus md5 keys → Bloom words relation (one pass, m/64
    rows); each new row probes the filter.  bloom_maybe=false rows are
    admitted with NO corpus join at all (a Bloom filter has no false
    negatives); bloom_maybe=true rows — true dups plus an ~FP-rate
    sliver of new rows — go through the exact left_anti join, which
    clears false positives.  Output: (id_col, content_md5), admitted
    rows only.

    Why this beats a plain anti-join at 100 TB: a daily batch is
    mostly-new, so the anti-join would shuffle ~the whole batch against
    the corpus hash index every day; the gate reduces that to the dup
    sliver while the definite-new fast path is join-free.  (Spark's
    own runtime bloom pushdown targets selective joins, not
    membership-gating — this operator makes the policy explicit and
    batch-size-invariant.)
    """
    keyed_new = new_df.select(
        F.col(id_col), F.md5(_norm(F.col(text_col))).alias("content_md5")
    )
    corpus_keys = corpus_df.select(
        F.md5(_norm(F.col(text_col))).alias("content_md5")
    ).distinct()
    words = bloom_bitmap_words(corpus_keys, "content_md5", m_bits, k)
    probed = bloom_probe(
        keyed_new, "content_md5", id_col, words, m_bits, k
    )
    flagged = keyed_new.join(probed, id_col)
    definite_new = flagged.filter(~F.col("bloom_maybe"))
    verified_new = (
        flagged.filter(F.col("bloom_maybe"))
        .join(corpus_keys, "content_md5", "left_anti")
    )
    return definite_new.select(id_col, "content_md5").unionByName(
        verified_new.select(id_col, "content_md5")
    )
