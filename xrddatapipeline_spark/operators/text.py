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
    """MinHash signature: (doc_id, m_0..m_{n-1}).

    ONE md5 per shingle -> 48-bit int, then ``num_hashes`` affine
    permutations (a_s*h + b_s mod 2^31-1) — the standard universal-hash
    family, crypto-hash count O(shingles) not O(shingles x seeds).
    min over the shingle multiset == min over the set, so no distinct
    is needed.

    Round-14 formulation: a mapInPandas pass computes PER-PARTITION
    partial minima (hashlib md5 at C speed — identical bytes to Spark's
    md5 — and the permutations as one numpy (shingles x seeds) matrix,
    pandas groupby-min), then the same ``num_hashes`` min() aggregation
    runs over the partials — at most one row per (partition, doc), so
    the shuffle stays one row per doc and the wide aggregation (whose
    ``num_hashes`` expression trees ran interpreted under any realistic
    codegen method budget — profiled as the top CPU stage of the minhash
    queries) now sees ~|docs| rows instead of |shingles| (guide §4.2).
    Exact for ANY partitioning of the shingle rows: min of per-partition
    minima == global min.
    """
    import numpy as np
    import pandas as pd

    id_type = shingles.schema[id_col].dataType.simpleString()
    a = np.array(
        [1 + (s * MINHASH_MULT) % (MINHASH_MOD - 1) for s in range(num_hashes)],
        dtype=np.int64,
    )
    b = np.array(
        [(s * 40503 + 12345) % MINHASH_MOD for s in range(num_hashes)],
        dtype=np.int64,
    )
    cols = [f"m_{s}" for s in range(num_hashes)]

    def _partials(batches):
        import hashlib

        for pdf in batches:
            if not len(pdf):
                continue
            # h < 2^31 and a < 2^31, so h*a + b < 2^62 + 2^31 — exact int64
            hs = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.md5(s.encode("utf-8")).digest()[:6], "big"
                    ) % MINHASH_MOD
                    for s in pdf["shingle"]
                ),
                dtype=np.int64,
                count=len(pdf),
            )
            perms = (hs[:, None] * a[None, :] + b[None, :]) % MINHASH_MOD
            out = pd.DataFrame(perms, columns=cols)
            out[id_col] = pdf[id_col].to_numpy()
            res = out.groupby(id_col, sort=False, as_index=False).min()
            yield res[[id_col, *cols]]

    schema = ", ".join(
        [f"{id_col} {id_type}"] + [f"{c} long" for c in cols]
    )
    partial = shingles.select(id_col, "shingle").mapInPandas(
        _partials, schema=schema
    )
    return partial.groupBy(id_col).agg(
        *[F.min(c).alias(c) for c in cols]
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
                    id_col: str = "doc_id",
                    assume_distinct: bool = False) -> DataFrame:
    """Exact Jaccard over distinct shingle sets via inverted-index join.

    If `pairs` is given, restrict to those candidate pairs (verification
    step after LSH); else all pairs sharing >= 1 shingle.

    `assume_distinct=True` declares that `shingles` is already the distinct
    (id, shingle) set (e.g. a shared cached frame) and skips the dedup
    shuffle here — Jaccard is a set measure, so the result is identical.
    """
    cand_docs = None
    if pairs is not None:
        # restrict the inverted index to docs that appear in a candidate
        # pair: the candidate doc set is tiny compared to the corpus, so
        # this turns an all-docs inverted join into one over just the
        # near-dup suspects (broadcast semi-join)
        cand_docs = (
            pairs.select(F.col("doc_a").alias(id_col))
            .union(pairs.select(F.col("doc_b").alias(id_col)))
            .distinct()
        )
    if assume_distinct:
        ds = shingles
    elif cand_docs is not None:
        # restrict BEFORE the dedup shuffle (round 14, guide §2.3/§2.4):
        # deduping the FULL corpus's shingle multiset was the largest
        # exchange of the minhash-pair queries, but only the candidate
        # docs' distinct sets are ever read — the semi-join prunes the
        # multiset map-side, so the distinct shuffles candidate docs
        # only. Set semantics: restrict-then-dedup == dedup-then-restrict,
        # and per-doc sizes are per-doc, so the jaccard values are
        # identical. Persisted (tiny) — it still feeds the size table and
        # both self-join sides.
        ds = shingles.join(
            F.broadcast(cand_docs), id_col, "left_semi"
        ).distinct().persist()
    else:
        # the distinct shingle set (the inverted index) feeds BOTH
        # self-join sides and the size table; without a persist each
        # consumer re-runs tokenize -> shingle -> distinct from the raw
        # docs (no exchange reuse across the branches — measured ~3x the
        # whole query)
        ds = shingles.distinct().persist()
    sizes = ds.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    if cand_docs is not None and assume_distinct:
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

    Round-14 formulation: ONE mapInPandas pass — per document, md5 every
    whitespace token (hashlib's md5 == Spark's md5 on the same UTF-8
    bytes), take the first 64 digest bits MSB-first (bit p here ==
    bit p of the previous conv(md5-hex)+shift expression form — pinned by
    the dedup_simhash oracle hash), count set bits per position with one
    vectorized ``np.unpackbits(...).sum(axis=0)``, and vote
    v_p = 2*cnt_p - n_tokens. Zero shuffles (the previous explode ->
    64-sum-column hash aggregation carried one exchange), and the 64
    shift/mask/sum expression trees — which exceeded any sane codegen
    method budget and ran INTERPRETED, profiled at ~250 CPU core-s on the
    sf0.1 corpus — become C-speed hashing plus one numpy reduction
    (~0.3 CPU core-s; guide §4.2: batch opaque per-row math into
    vectorized native code). Per-doc map work only, so the 100 TB shape
    is embarrassingly parallel.

    Tokenization parity: ``text.split(' ')`` in Python == ``F.split(text,
    ' ')`` (single-space regex, empty tokens kept, ``"" -> [""]``); NULL
    text produces no output row, exactly like the explode it replaces.
    """
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()

    def _simhash(batches):
        import hashlib

        for pdf in batches:
            ids, hashes = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    continue
                toks = t.split(" ")
                raw = np.empty((len(toks), 8), dtype=np.uint8)
                for j, tok in enumerate(toks):
                    raw[j] = np.frombuffer(
                        hashlib.md5(tok.encode("utf-8")).digest(), np.uint8,
                        count=8,
                    )
                cnt = np.unpackbits(raw, axis=1).sum(axis=0, dtype=np.int64)
                votes = 2 * cnt - len(toks)
                ids.append(i)
                hashes.append("".join(np.where(votes > 0, "1", "0")))
            if ids:
                yield pd.DataFrame({id_col: ids, "simhash": hashes})

    return df.select(id_col, text_col).mapInPandas(
        _simhash, schema=f"{id_col} {id_type}, simhash string"
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
    Output: (doc_id, n_fingerprints, min_fp, max_fp).

    Round-14 formulation: ONE mapInPandas pass, still shuffle-free and
    per-doc. The previous all-array-expression form (md5-per-gram inside
    ``transform`` lambdas + per-window ``array_min(slice(...))``) ran
    interpreted — higher-order array functions are CodegenFallback — and
    profiled at ~100 CPU core-s on the sf0.1 corpus; here the grams are
    hashed with C-speed hashlib (== Spark's md5 on the same UTF-8 bytes)
    and the window-min is ``w`` vectorized ``np.minimum`` passes over the
    hex-string array (~1 CPU core-s; guide §4.2). Lexicographic parity:
    numpy ``<U32`` comparison == UTF8String binary comparison on
    lowercase-hex ASCII. Docs with no full window (len(text) < k+w-1)
    emit nothing, like the filter they replace; char indexing is
    code-point based on both sides.
    """
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()

    def _winnow(batches):
        import hashlib

        for pdf in batches:
            ids, n_fp, lo, hi = [], [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    continue
                n_g = len(t) - (k - 1)  # k-gram count
                n_w = n_g - (w - 1)     # full-window count
                if n_w < 1:
                    continue
                hs = np.array(
                    [hashlib.md5(t[j:j + k].encode("utf-8")).hexdigest()
                     for j in range(n_g)]
                )
                wm = hs[:n_w]
                for off in range(1, w):  # np.minimum lacks a str loop (<2.0)
                    nxt = hs[off:off + n_w]
                    wm = np.where(nxt < wm, nxt, wm)
                uniq = np.unique(wm)
                ids.append(i)
                n_fp.append(np.int32(uniq.size))
                lo.append(uniq[0])
                hi.append(uniq[-1])
            if ids:
                yield pd.DataFrame(
                    {id_col: ids, "n_fingerprints": np.asarray(n_fp, np.int32),
                     "min_fp": lo, "max_fp": hi}
                )

    return df.select(id_col, text_col).mapInPandas(
        _winnow,
        schema=f"{id_col} {id_type}, n_fingerprints int, "
               "min_fp string, max_fp string",
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
