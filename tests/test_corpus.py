"""Property tests for the corpus operators (dedup / similarity / multimodal).

The oracle harness (test_oracle_parity) checks value-level parity with
DuckDB; these tests check the *semantics* the oracles can't express:
invariances (identical docs hash identically), metric properties (cosine
self-similarity, hamming identity), and the mapInPandas decode contract.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from xrddatapipeline_spark.operators import similarity as sim
from xrddatapipeline_spark.operators import text as tx
from xrddatapipeline_spark.operators.multimodal import (
    _fake_decode,
    binary_assets,
    decode_features,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en"),
        (1, "the quick brown fox jumps over the lazy dog", "en"),  # exact dup
        (2, "the quick brown fox jumps over the lazy cat", "en"),  # near dup
        (3, "completely different words entirely here now folks", "en"),
        (4, "a b", "en"),  # shorter than one 3-shingle
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_shingles_skip_short_docs(docs):
    sh = tx.word_shingles(docs).toPandas()
    assert 4 not in set(sh.doc_id)
    # doc 0: 9 tokens -> 7 shingles
    assert (sh.doc_id == 0).sum() == 7


def test_minhash_identical_docs_identical_signatures(docs):
    sh = tx.word_shingles(docs)
    sigs = tx.minhash_signatures(sh, 16).toPandas()
    s0 = sigs[sigs.doc_id == 0].sort_values("seed").minhash.tolist()
    s1 = sigs[sigs.doc_id == 1].sort_values("seed").minhash.tolist()
    s3 = sigs[sigs.doc_id == 3].sort_values("seed").minhash.tolist()
    assert s0 == s1
    assert s0 != s3
    assert len(s0) == 16


def test_lsh_pairs_catch_exact_dup(docs):
    sh = tx.word_shingles(docs)
    buckets = tx.minhash_band_buckets(tx.minhash_signatures(sh, 16), 4)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in tx.lsh_candidate_pairs(buckets).collect()
    }
    assert (0, 1) in pairs  # identical docs share every band
    assert (0, 3) not in pairs


def test_minhash_buckets_matches_banded_signatures(docs):
    # the shuffle-free projection path must emit the exact same
    # (doc_id, band, bucket) rows as banding the row-form signatures
    sh = tx.word_shingles(docs)
    fast = {
        (r.doc_id, r.band, r.bucket)
        for r in tx.minhash_buckets(sh, 16, 4).collect()
    }
    generic = {
        (r.doc_id, r.band, r.bucket)
        for r in tx.minhash_band_buckets(tx.minhash_signatures(sh, 16), 4).collect()
    }
    assert fast == generic and len(fast) > 0


def test_jaccard_values(docs):
    sh = tx.word_shingles(docs)
    jac = {
        (r.doc_a, r.doc_b): r.jaccard for r in tx.shingle_jaccard(sh).collect()
    }
    assert jac[(0, 1)] == 1.0
    # docs 0 vs 2 differ in last word: shingles 7 each, 6 shared
    np.testing.assert_allclose(jac[(0, 2)], 6 / 8)


def test_simhash_identity_and_locality(docs):
    simdf = tx.simhash64(docs).toPandas().set_index("doc_id").simhash
    assert len(simdf[0]) == 64 and set(simdf[0]) <= {"0", "1"}
    assert simdf[0] == simdf[1]
    ham = lambda a, b: sum(x != y for x, y in zip(a, b))  # noqa: E731
    assert ham(simdf[0], simdf[2]) < ham(simdf[0], simdf[3])


def test_simhash_pairs_hamming_zero_for_dup(docs):
    pairs = tx.simhash_near_pairs(tx.simhash64(docs), max_hamming=8).toPandas()
    row = pairs[(pairs.doc_a == 0) & (pairs.doc_b == 1)]
    assert len(row) == 1 and row.hamming.iloc[0] == 0


def test_quantized_cosine_self_is_one(spark):
    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.normal(size=16).astype(np.float32)])
            for i in range(20)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = df.select(
        sim.quantized_cosine(F.col("embedding"), F.col("embedding")).alias("c")
    ).toPandas()
    np.testing.assert_allclose(out.c, 1.0, atol=1e-9)


def test_brute_force_topk_finds_planted_neighbor(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(size=(30, 16)).astype(np.float32)
    base[5] = base[0] + rng.normal(scale=1e-3, size=16).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    top = sim.brute_force_topk(df, df.where("vec_id = 0"), k=3).toPandas()
    assert top.neighbor_id.iloc[0] == 5
    assert top.cos.iloc[0] > 0.999
    assert list(top["rank"]) == [1, 2, 3]


def test_lsh_topk_subset_of_bucket(spark):
    rng = np.random.default_rng(13)
    base = rng.normal(size=(60, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    buckets = sim.lsh_buckets(df, num_planes=4).toPandas().set_index("vec_id").bucket
    top = sim.lsh_topk(df, df.where("vec_id < 5"), k=3, num_planes=4).toPandas()
    for r in top.itertuples():
        assert buckets[r.query_id] == buckets[r.neighbor_id]
        assert r.query_id != r.neighbor_id


def test_winnow_fingerprints_shared_for_dup_docs(docs):
    fp = tx.winnow_fingerprints(docs, k=8, w=4).toPandas().set_index("doc_id")
    assert fp.loc[0].equals(fp.loc[1])
    assert (fp.n_fingerprints > 0).all()


def test_decode_features_matches_fake_decode(docs):
    assets = binary_assets(docs)
    out = decode_features(assets).toPandas().set_index("doc_id")
    for r in docs.collect():
        mt = ["image", "audio", "video"][r.doc_id % 3]
        w, h, nf, mv = _fake_decode(r.text.encode(), mt)
        got = out.loc[r.doc_id]
        assert (got.media_type, got.width, got.height, got.n_frames) == (mt, w, h, nf)
        np.testing.assert_allclose(got.mean_val, mv)
    # image modality is always single-frame
    assert (out[out.media_type == "image"].n_frames == 1).all()


def test_fake_decode_deterministic():
    a = _fake_decode(b"payload", "video")
    b = _fake_decode(b"payload", "video")
    assert a == b
    w, h, nf, mv = a
    assert 64 <= w < 2048 and 64 <= h < 2048 and 1 <= nf <= 241 and 0 <= mv < 1
    digest = hashlib.md5(b"payload").hexdigest()
    assert w == 64 + int(digest[0:4], 16) % 1984


def test_connected_components_known_graph(spark):
    from xrddatapipeline_spark.operators.graph import connected_components

    # two chains and one triangle; a chain exercises multi-round propagation
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "src long, dst long",
    )
    got = {
        (r.node, r.cluster_id)
        for r in connected_components(edges).collect()
    }
    want = {(n, 1) for n in (1, 2, 3, 4, 5)}
    want |= {(n, 10) for n in (10, 11, 12)}
    want |= {(20, 20), (21, 20)}
    assert got == want


def test_ivf_topk_candidates_share_cell(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [(i, [float(v) for v in rng.normal(size=8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = sim.ivf_centroids(df, 4)
    assert len(cents) == 4 and [c for c, _ in cents] == [0, 1, 2, 3]
    cells = {
        r.vec_id: r.cell
        for r in df.select(
            "vec_id", sim.ivf_cell_expr(F.col("embedding"), cents).alias("cell")
        ).collect()
    }
    assert set(cells.values()) > {0}  # more than one cell actually populated

    top = sim.ivf_topk(df, df.where("vec_id < 5"), k=3, num_cells=4).toPandas()
    assert (top.groupby("query_id")["rank"].apply(
        lambda s: sorted(s) == list(range(1, len(s) + 1))
    )).all()
    for row in top.itertuples():
        assert cells[row.query_id] == cells[row.neighbor_id]
        assert row.neighbor_id != row.query_id


def test_pq_adc_topk_empty_queries(spark):
    """An empty query frame must return an empty result with the contract
    schema, not fail analysis on a zero-element F.array() (round-2 ADVICE:
    topk_bruteforce's few-queries contract is easy to violate)."""
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(i, [float(v) for v in rng.normal(size=8)]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sim.pq_adc_topk(df, df.where("vec_id < 0"), k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "rank", "neighbor_id", "adist"]


def test_asof_join_known_values(spark):
    from xrddatapipeline_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 5, "a"), (1, 10, "b"), (1, 20, "c"), (2, 7, "d")],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 12, 200.0), (3, 1, 999.0)],
        "k long, t long, v double",
    )
    got = {
        (r.tag, r.t_asof, r.v_asof)
        for r in asof_join(left, right, by=["k"], on="t",
                           payload=["t", "v"]).collect()
    }
    assert got == {
        ("a", 5, 100.0),     # tie: right row at same t matches (>=)
        ("b", 5, 100.0),     # t=12 is later, only t=5 precedes
        ("c", 12, 200.0),    # most recent prior wins
        ("d", None, None),   # no right rows for k=2
    }


def test_graph_and_asof_empty_inputs(spark):
    from xrddatapipeline_spark.operators.graph import connected_components
    from xrddatapipeline_spark.operators.temporal import asof_join

    empty_edges = spark.createDataFrame([], "src long, dst long")
    assert connected_components(empty_edges).count() == 0

    left = spark.createDataFrame([(1, 5, "a")], "k long, t long, tag string")
    empty_right = spark.createDataFrame([], "k long, t long, v double")
    row = asof_join(left, empty_right, by=["k"], on="t",
                    payload=["t", "v"]).collect()[0]
    assert (row.tag, row.t_asof, row.v_asof) == ("a", None, None)


def test_multimodal_resize_and_frames_binary_plumbing(spark):
    import hashlib

    from xrddatapipeline_spark.operators.multimodal import (
        binary_assets,
        resize_images,
        sample_frames,
    )

    docs = spark.createDataFrame(
        [(i, f"payload number {i} with some text") for i in range(6)],
        "doc_id long, text string",
    )
    assets = binary_assets(docs)

    rs = resize_images(assets, box=256).collect()
    assert len(rs) == 6
    for r in rs:
        assert isinstance(r.content, (bytes, bytearray)) and len(r.content) == 16
        assert max(r.new_width, r.new_height) == 256  # box fit, aspect kept
        want = hashlib.md5(
            f"payload number {r.doc_id} with some text".encode()
            + f"_{r.new_width}x{r.new_height}".encode()
        ).digest()
        assert bytes(r.content) == want

    fr = sample_frames(assets, every_n=7).toPandas()
    # images contribute exactly one frame 0; video/audio stride by 7
    img_ids = {r.doc_id for r in rs if r.media_type == "image"}
    assert (fr[fr.doc_id.isin(img_ids)].frame_idx == 0).all()
    assert (fr.frame_idx % 7 == 0).all()
    assert fr.frame_id.str.len().eq(32).all()


def test_range_join_matches_bruteforce(spark):
    import numpy as np

    from xrddatapipeline_spark.operators.temporal import range_join

    rng = np.random.default_rng(5)
    left = [(int(k), int(t)) for k, t in
            zip(rng.integers(0, 4, 80), rng.integers(0, 300, 80))]
    right = [(int(k), int(t)) for k, t in
             zip(rng.integers(0, 4, 80), rng.integers(0, 300, 80))]
    ldf = spark.createDataFrame(left, "k long, t long")
    rdf = spark.createDataFrame(right, "k long, t long")
    LOW, HIGH = 3, 17

    got = {
        (r.l_k, r.l_t, r.r_t)
        for r in range_join(ldf, rdf, by=["k"], on="t",
                            low=LOW, high=HIGH).collect()
    }
    want = {
        (lk, lt, rt)
        for lk, lt in left for rk, rt in right
        if lk == rk and LOW <= rt - lt <= HIGH
    }
    assert got == want and len(want) > 50
