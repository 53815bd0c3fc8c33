"""Text-corpus operators: shingling, MinHash, SimHash, fingerprints, quality.

The reference's cosine-similarity stage (pipeline.py:506-557) generalizes to
corpus-scale near-duplicate detection; these operators provide the standard
large-training-corpus toolkit (exact / MinHash-LSH / SimHash / n-gram-Jaccard
dedup, winnowing fingerprints, quality + token statistics, n-gram language
ID) as pure DataFrame plans.

Design notes (100 TB scale):
- All hashing uses md5 hex strings compared lexicographically — a portable
  hash family that is identical in Spark, DuckDB and Python, so every
  operator here is oracle-checkable bit-for-bit.
- Everything is expressed with built-in `pyspark.sql.functions` (JVM-side,
  whole-stage-codegen); there are NO Python UDFs in any of these paths.
- Shapes are explode -> hash-aggregate: shingling fans out ~L rows per doc,
  then every aggregate groups on (doc_id, ...) — Spark's map-side partial
  aggregation collapses the fan-out before the shuffle, so shuffle volume is
  O(docs x signature width), not O(docs x length).
- Pair generation NEVER does an all-pairs cross join: candidates come from
  an inverted index (shared shingle / LSH band bucket / SimHash band), which
  is the standard linear-ish-scale route.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def _nibble_val(ch: Column) -> Column:
    """Hex char -> 0..15, portable (strpos/instr semantics match DuckDB)."""
    return F.instr(F.lit(HEX), ch) - F.lit(1)


def tokens_col(text: Column) -> Column:
    return F.split(text, " ")


def md5_prefix_long(col: Column, n_nibbles: int = 12, start: int = 0) -> Column:
    """md5 nibbles [start, start+n) as a non-negative bigint (keep the
    total under 16 nibbles = 64 bits; 12 nibbles = 48 bits is the safe
    signed default).

    The portable hex->int bridge: one md5 per value, then cheap integer
    arithmetic derives whole hash FAMILIES (MinHash permutations, SimHash
    bits) instead of one md5 per (value, seed) — the difference between
    O(shingles) and O(shingles x seeds) crypto-hash calls.
    """
    # conv(hex-substring) == the nibble-weighted sum (what the DuckDB
    # oracle computes digit by digit) in ONE builtin instead of n_nibbles
    # substring+instr chains — ~2x cheaper md5-hashing stages
    return F.conv(
        F.substring(F.md5(col), start + 1, n_nibbles), 16, 10
    ).cast("long")


#: affine MinHash permutation modulus (2^31 - 1, prime)
MINHASH_MOD = 2147483647
MINHASH_MULT = 2654435761  # Knuth multiplicative constant


def word_shingles(df: DataFrame, n: int = 3, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Explode word n-gram shingles: one row per (doc_id, shingle).

    Docs with fewer than `n` tokens produce no rows (same as the oracle's
    `WHERE len(t) >= n`).

    The token array is materialized behind a Generate boundary
    (`explode(array(split(..)))`): projection collapse would otherwise
    inline the `split` into every `element_at` inside the shingle lambda
    (lambda bodies get no common-subexpression elimination), re-splitting
    the text once per shingle per gram — O(len^2) per document.
    """
    toks_df = df.select(
        F.col(id_col),
        F.explode(F.array(tokens_col(F.col(text_col)))).alias("_toks"),
    )
    toks = F.col("_toks")
    shingle = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + F.lit(k + 1)) for k in range(n)]
    )
    return (
        toks_df.where(F.size(toks) >= n)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(F.sequence(F.lit(0), F.size(toks) - n), shingle)
            ).alias("shingle"),
        )
    )


def _minhash_perm(seed: int) -> "Column":
    """Affine permutation #seed applied to the 48-bit shingle hash `h`:
    (a_s*h + b_s) mod 2^31-1 with a_s, b_s derived from the seed by
    integer arithmetic (constant-folded per seed at plan time)."""
    a = 1 + (seed * MINHASH_MULT) % (MINHASH_MOD - 1)
    b = (seed * 40503 + 12345) % MINHASH_MOD
    return (F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_MOD)


def minhash_wide(shingles: DataFrame, num_hashes: int = 32,
                 id_col: str = "doc_id") -> DataFrame:
    """MinHash signature as ONE hash aggregation: (doc_id, m_0..m_{n-1}).

    ONE md5 per shingle -> 48-bit int, then ``num_hashes`` affine
    permutations (a_s*h + b_s mod 2^31-1) — the standard universal-hash
    family, crypto-hash count O(shingles) not O(shingles x seeds).

    All permutations are aggregated as ``num_hashes`` min() columns over
    the SAME shingle rows — no seed explode, so the aggregate input stays
    at |shingles| rows instead of |shingles| x num_hashes, and the
    (map-side combined) shuffle is one row per doc. min over the shingle
    multiset == min over the set, so no distinct is needed either.
    """
    hashed = shingles.select(
        id_col,
        (md5_prefix_long(F.col("shingle")) % MINHASH_MOD).alias("h"),
    )
    return hashed.groupBy(id_col).agg(
        *[F.min(_minhash_perm(s)).alias(f"m_{s}") for s in range(num_hashes)]
    )


def minhash_signatures(shingles: DataFrame, num_hashes: int = 32,
                       id_col: str = "doc_id") -> DataFrame:
    """Row-form MinHash signature: (doc_id, seed, minhash) — the wide
    aggregate unpivoted (posexplode of the signature array)."""
    wide = minhash_wide(shingles, num_hashes, id_col)
    return wide.select(
        id_col,
        F.posexplode(
            F.array(*[F.col(f"m_{s}") for s in range(num_hashes)])
        ).alias("seed", "minhash"),
    )


def minhash_band_buckets(signatures: DataFrame, rows_per_band: int = 4,
                         id_col: str = "doc_id") -> DataFrame:
    """LSH banding from row-form signatures: bucket key = md5 of the
    band's minhashes in seed order."""
    banded = signatures.withColumn(
        "band", (F.col("seed") / rows_per_band).cast("int")
    )
    ordered_concat = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("seed", "minhash"))),
            lambda s: s["minhash"].cast("string"),
        ),
        "_",
    )
    return (
        banded.groupBy(id_col, "band")
        .agg(F.md5(ordered_concat).alias("bucket"))
    )


def minhash_buckets(shingles: DataFrame, num_hashes: int = 32,
                    rows_per_band: int = 4,
                    id_col: str = "doc_id") -> DataFrame:
    """LSH band buckets straight from shingles: (doc_id, band, bucket).

    Wide signature aggregate, then the band buckets are a plain
    projection (md5 over the band's minhashes concatenated in seed
    order) — no second groupBy/shuffle, unlike banding the row form.
    """
    wide = minhash_wide(shingles, num_hashes, id_col)
    n_bands = num_hashes // rows_per_band
    bucket = lambda band: F.md5(F.concat_ws("_", *[  # noqa: E731
        F.col(f"m_{band * rows_per_band + r}").cast("string")
        for r in range(rows_per_band)
    ]))
    return wide.select(
        id_col,
        F.posexplode(
            F.array(*[bucket(band) for band in range(n_bands)])
        ).alias("band", "bucket"),
    )


def lsh_candidate_pairs(buckets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing at least one band bucket.

    Equi-join on (band, bucket) — the inverted-index path; never all-pairs.
    """
    a = buckets.select(
        F.col(id_col).alias("doc_a"), "band", "bucket"
    )
    b = buckets.select(
        F.col(id_col).alias("doc_b"), "band", "bucket"
    )
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def shingle_jaccard(shingles: DataFrame, pairs: DataFrame | None = None,
                    id_col: str = "doc_id") -> DataFrame:
    """Exact Jaccard over distinct shingle sets via inverted-index join.

    If `pairs` is given, restrict to those candidate pairs (verification
    step after LSH); else all pairs sharing >= 1 shingle.
    """
    # the distinct shingle set (the inverted index) feeds BOTH self-join
    # sides and the size table; without a persist each consumer re-runs
    # tokenize -> shingle -> distinct from the raw docs (no exchange reuse
    # across the branches — measured ~3x the whole query)
    ds = shingles.distinct().persist()
    sizes = ds.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    if pairs is not None:
        # restrict the inverted index to docs that appear in a candidate
        # pair BEFORE the self-join: the candidate doc set is tiny compared
        # to the corpus, so this turns an all-docs inverted join into one
        # over just the near-dup suspects (broadcast semi-join)
        cand_docs = (
            pairs.select(F.col("doc_a").alias(id_col))
            .union(pairs.select(F.col("doc_b").alias(id_col)))
            .distinct()
        )
        ds = ds.join(F.broadcast(cand_docs), id_col, "left_semi")
    inter = (
        ds.alias("a")
        .join(ds.alias("b"), "shingle")
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    if pairs is not None:
        inter = inter.join(pairs, ["doc_a", "doc_b"])
    return (
        inter.join(sizes.withColumnRenamed(id_col, "doc_a")
                   .withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b")
              .withColumnRenamed("n_sh", "n_b"), "doc_b")
        .select(
            "doc_a", "doc_b", "n_inter",
            (F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
             ).alias("jaccard"),
        )
    )


def simhash64(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash as a '0'/'1' string (bit p = sign of the tf-weighted
    vote over token-md5 bit p). Output: (doc_id, simhash).

    The token's 64 md5 bits are packed into two 32-bit ints once
    (16 nibble lookups), so the per-(token, p) work is a shift+mask on a
    long instead of substring+strpos on the hex string — same bits, ~10x
    cheaper inner loop at corpus scale.

    Measured and rejected (round 9): pre-collapsing duplicate tokens via
    a (doc_id, tok) count agg before the 64-sum vote is ~15% faster
    locally (dup factor 2.33 at sf0.1) but introduces a NEW exchange of
    ~|distinct tokens| rows where this plan's only shuffle is one
    64-column row per doc (the vote agg map-side-combines all of a doc's
    occurrences — documents are co-partitioned with their tokens by
    construction). At cluster scale that extra exchange dwarfs the
    vote-expression savings, so the single-agg form stays.
    """
    toks = df.select(
        id_col, F.explode(tokens_col(F.col(text_col))).alias("tok")
    ).select(
        id_col,
        md5_prefix_long(F.col("tok"), 8, start=0).alias("h_hi"),
        md5_prefix_long(F.col("tok"), 8, start=8).alias("h_lo"),
    )

    def bit(p: int) -> "Column":
        src, sh = ("h_hi", 31 - p) if p < 32 else ("h_lo", 63 - p)
        return F.shiftright(F.col(src), sh).bitwiseAND(F.lit(1))

    # all 64 votes in ONE hash aggregation over the token rows (64 sum
    # columns) instead of exploding 64 bit-rows per token — the aggregate
    # input stays at |tokens| rows and the shuffle is one row per doc
    votes = toks.groupBy(id_col).agg(
        *[F.sum(2 * bit(p) - 1).alias(f"v_{p}") for p in range(64)]
    )
    return votes.select(
        id_col,
        F.concat(*[
            F.when(F.col(f"v_{p}") > 0, "1").otherwise("0") for p in range(64)
        ]).alias("simhash"),
    )


def simhash_near_pairs(sim: DataFrame, max_hamming: int = 8,
                       id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash: candidates share one of 4 16-bit bands
    (pigeonhole: hamming <= 3 guarantees a shared band; larger radii are
    best-effort, standard practice), then exact Hamming filter."""
    bands = sim.select(
        id_col,
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
    ).withColumn("chunk", F.substring("simhash", F.col("band") * 16 + 1, 16))
    a = bands.select(F.col(id_col).alias("doc_a"),
                     F.col("simhash").alias("sim_a"), "band", "chunk")
    b = bands.select(F.col(id_col).alias("doc_b"),
                     F.col("simhash").alias("sim_b"), "band", "chunk")
    cand = (
        a.join(b, ["band", "chunk"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
    )
    hamming = F.expr(
        "aggregate(sequence(1, 64), 0, (acc, i) -> "
        "acc + IF(substring(sim_a, i, 1) = substring(sim_b, i, 1), 0, 1))"
    )
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def winnow_fingerprints(df: DataFrame, k: int = 8, w: int = 8,
                        text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003): md5 of each
    char k-gram, keep the window-min over every w consecutive k-grams.
    Output: (doc_id, n_fingerprints, min_fp, max_fp)."""
    # Shuffle-free formulation: every step (k-gram md5 array, sliding
    # window-min over w full windows, distinct, count/min/max) is per-doc,
    # so it's all array expressions in a single scan — the sort-window /
    # distinct / groupBy alternative shuffles |docs| x |text| gram rows
    # three times. Each lambda-computed array is materialized behind a
    # Generate boundary (explode of a 1-element array) because projection
    # collapse would otherwise inline it into every downstream reference
    # (lambda expressions get no CSE) — O(L^2) md5s instead of O(L).
    t = F.col(text_col)
    n_g = F.length(text_col) - (k - 1)  # k-gram count (<=0: no grams)
    hs_expr = F.transform(
        F.sequence(F.lit(1), n_g),
        lambda i: F.md5(t.substr(i, F.lit(k))),
    )
    with_hs = (
        df.where(n_g - (w - 1) >= 1)  # docs with >=1 FULL window
        .select(id_col, F.explode(F.array(hs_expr)).alias("hs"))
    )
    wmins_expr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("hs") - (w - 1)),
            lambda i: F.array_min(F.slice("hs", i, w)),
        )
    )
    with_wm = with_hs.select(id_col, F.explode(F.array(wmins_expr)).alias("wm"))
    return with_wm.select(
        id_col,
        F.size("wm").alias("n_fingerprints"),
        F.array_min("wm").alias("min_fp"),
        F.array_max("wm").alias("max_fp"),
    )


def char_bigrams(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", extra_cols: tuple[str, ...] = ()) -> DataFrame:
    cols = [id_col, *extra_cols]
    return df.select(
        *cols,
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length(text_col) - 1, F.lit(0)))
        ).alias("i"),
        F.col(text_col),
    ).select(*cols, F.expr("substring(text, i, 2)").alias("bg"))


def repetition_scores(df: DataFrame, n: int = 3, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Intra-document repetition: the fraction of word n-grams that are
    duplicates of an earlier n-gram in the SAME document (the
    Gopher/MassiveText repetitive-content quality filter).

    Pure per-row array math over the materialized token array — zero
    shuffles, embarrassingly parallel over the corpus. Docs with fewer
    than `n` tokens score 0 over 0 grams (dup_frac null)."""
    toks_df = df.select(
        F.col(id_col),
        F.explode(F.array(tokens_col(F.col(text_col)))).alias("_toks"),
    )
    grams = F.when(
        F.size("_toks") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at("_toks", (i + k).cast("int"))
                       for k in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # Generate boundary: `_grams` feeds three expressions below, and
    # projection collapse would inline the lambda-bearing transform into
    # each one (no CSE inside lambdas) — explode(array(..)) pins it
    g = toks_df.select(
        id_col, F.explode(F.array(grams)).alias("_grams")
    )
    n_grams = F.size("_grams").cast("long")
    n_distinct = F.size(F.array_distinct("_grams")).cast("long")
    return g.select(
        id_col,
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct"),
        F.when(n_grams > 0, (n_grams - n_distinct) / n_grams)
        .alias("dup_frac"),
    )


def span_hashes(df: DataFrame, width: int = 8, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Fixed-width token-span content hashes: one row per non-overlapping
    `width`-token chunk — (doc_id, span_idx, span_hash). The unit of
    span-level dedup (C4-style repeated-boilerplate removal operates on
    spans/lines, not whole documents). Trailing partial chunks count when
    non-empty."""
    toks_df = df.select(
        F.col(id_col),
        F.explode(F.array(tokens_col(F.col(text_col)))).alias("_toks"),
    )
    n_spans = F.ceil(F.size("_toks") / F.lit(width)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda s: F.struct(
            s.cast("int").alias("span_idx"),
            F.md5(
                F.concat_ws(" ", F.slice("_toks", s * width + 1, width))
            ).alias("span_hash"),
        ),
    )
    return toks_df.select(
        id_col, F.explode(spans).alias("_s")
    ).select(id_col, "_s.span_idx", "_s.span_hash")


def duplicated_spans(df: DataFrame, width: int = 8, min_copies: int = 2,
                     text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Spans repeated across (or within) documents: hash-groupBy over
    `span_hashes` — (span_hash, n_copies, n_docs, canonical doc/span).
    One shuffle on a high-entropy key; the output is the boilerplate
    removal list."""
    s = span_hashes(df, width, text_col, id_col)
    return (
        s.groupBy("span_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.count_distinct(F.col(id_col)).alias("n_docs"),
            F.min(F.col(id_col)).alias("first_doc"),
            F.min(F.struct(F.col(id_col), F.col("span_idx")))["span_idx"]
            .alias("first_span"),
        )
        .where(F.col("n_copies") >= min_copies)
    )
