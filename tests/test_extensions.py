"""Extension operators: dedup / similarity / text analysis.

Oracle-checked where deterministic SQL exists; hash-based ops (MinHash,
SimHash, hyperplane LSH) are verified by recall against the bounded
brute-force oracles.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_table_spark.operators.dedup import (  # noqa: E402
    DEDUP_ORACLE,
    DEDUP_QUERIES,
    PAIR_BOUND,
)
from data_table_spark.operators.similarity import (  # noqa: E402
    SIMILARITY_ORACLE,
    SIMILARITY_QUERIES,
)
from data_table_spark.operators.textstats import (  # noqa: E402
    TEXTSTATS_ORACLE,
    TEXTSTATS_QUERIES,
)
from data_table_spark.streaming.stateful import (  # noqa: E402
    STATEFUL_ORACLE,
    STATEFUL_QUERIES,
)
from data_table_spark.streaming.windows import (  # noqa: E402
    STREAMJOIN_ORACLE,
    STREAMJOIN_QUERIES,
)
from tests.oracle_util import compare_to_oracle, duck_connection  # noqa: E402

ALL_QUERIES = {
    **DEDUP_QUERIES, **SIMILARITY_QUERIES, **TEXTSTATS_QUERIES,
    **STATEFUL_QUERIES, **STREAMJOIN_QUERIES,
}
ALL_ORACLE = {
    **DEDUP_ORACLE, **SIMILARITY_ORACLE, **TEXTSTATS_ORACLE,
    **STATEFUL_ORACLE, **STREAMJOIN_ORACLE,
}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ALL_ORACLE))
def test_extension_oracle(name, spark, sf_dir, duck):
    df = ALL_QUERIES[name](spark, sf_dir)
    ok, msg = compare_to_oracle(df, duck, ALL_ORACLE[name])
    assert ok, f"{name}: {msg}"


def test_minhash_recall(spark, sf_dir):
    """MinHash-LSH (verified) must recover every brute-force pair in the
    bounded range — exact verification means precision is 1.0 by
    construction; banding must deliver high recall."""
    truth = {
        (r["a"], r["b"])
        for r in DEDUP_QUERIES["dedup_ngram_jaccard_pairs"](spark, sf_dir).collect()
    }
    got_full = DEDUP_QUERIES["dedup_minhash_lsh_pairs"](spark, sf_dir).collect()
    got = {(r["a"], r["b"]) for r in got_full if r["a"] < PAIR_BOUND and r["b"] < PAIR_BOUND}
    assert truth, "oracle found no near-dup pairs — fixture assumption broken"
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, (recall, truth - got)


def test_minhash_bounded_recall_exact(spark, sf_dir):
    """dedup_minhash_pairs_bounded's EXACT oracle rests on banding recall
    being 1.0 on the bounded slice (deterministic xxhash ⇒ stable for a
    fixed fixture). Pin it: every brute-force pair must appear among the
    band candidates — if a fixture regrow breaks this, this test points
    at the cause while the driver row only says hash-mismatch."""
    from pyspark.sql import functions as F

    from data_table_spark.operators.dedup import minhash_band_candidates
    from data_table_spark.sources.registry import load_table

    truth = {
        (r["a"], r["b"])
        for r in DEDUP_QUERIES["dedup_ngram_jaccard_pairs"](spark, sf_dir).collect()
    }
    d = (
        load_table(spark, "documents", sf_dir)
        .where(F.col("doc_id") < PAIR_BOUND)
        .select("doc_id", "text")
    )
    cand = {(r["a"], r["b"]) for r in minhash_band_candidates(d).collect()}
    assert truth, "oracle found no near-dup pairs — fixture assumption broken"
    assert truth <= cand, truth - cand


def test_embedding_fixture_has_no_natural_dups(spark, sf_dir):
    """dedup_embedding_pairs' oracle (exactly one planted twin pair per
    vector) additionally relies on NO random fixture pair reaching the
    0.95 threshold. Assert the property itself over the full sf0.01
    corpus (brute force, ~125k pairs) instead of trusting fixture luck —
    ADVICE r2 #5."""
    from pyspark.sql import functions as F

    from data_table_spark.operators.dedup import EMBED_DUP_THRESHOLD
    from data_table_spark.operators.similarity import cosine
    from data_table_spark.sources.registry import load_table

    e = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    a = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    mx = (
        a.join(b, F.col("a") < F.col("b"))
        .select(cosine(F.col("va"), F.col("vb")).alias("c"))
        .agg(F.max("c").alias("mx"))
        .collect()[0]["mx"]
    )
    assert mx < EMBED_DUP_THRESHOLD, mx


def test_simhash_hot_bucket_guard(spark):
    """simhash_pairs_df must survive k identical boilerplate docs without
    a k² candidate blowup (round-2 review flagged the unguarded band
    join), while near-dup pairs in normal buckets still come through."""
    from data_table_spark.operators.dedup import simhash_pairs_df

    boiler = "all rights reserved this document is provided as is without warranty"
    near_a = "the quick brown fox jumps over the lazy dog near the river bank"
    rows = [(i, boiler) for i in range(5000)]
    # identical pair in a NORMAL-size bucket: hamming 0, must survive
    rows += [(9001, near_a), (9002, near_a)]
    rows += [(9100 + i, f"unique filler text number {i} with distinct words {i*7}")
             for i in range(20)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = simhash_pairs_df(docs, max_hamming=3).collect()
    # the 5000-copy clique (12.5M pairs unguarded) must be capped away
    assert len(got) < 1000, len(got)
    assert (9001, 9002) in {(r["a"], r["b"]) for r in got}


def test_minhash_hot_bucket_guard(spark):
    """A planted 5000-copy boilerplate doc must NOT explode the candidate
    join (without the guard its band buckets alone would emit ~12.5M
    pairs per band). Genuine near-dups in normal-size buckets must still
    come through; the dropped exact copies are dedup_exact's job."""
    from data_table_spark.operators.dedup import minhash_band_candidates

    boiler = "all rights reserved this document is provided as is without warranty"
    near_a = "the quick brown fox jumps over the lazy dog near the river bank"
    near_b = "the quick brown fox jumps over the lazy dog near the river bend"
    rows = [(i, boiler) for i in range(5000)]
    rows += [(9001, near_a), (9002, near_b)]
    rows += [(9100 + i, f"unique filler text number {i} with distinct words {i*7}")
             for i in range(20)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    cand = minhash_band_candidates(docs).collect()
    assert len(cand) < 1000, len(cand)
    assert (9001, 9002) in {(r["a"], r["b"]) for r in cand}


def test_embedding_near_pairs_recall(spark):
    """Semantic near-dup: planted high-cosine pairs must be found by the
    LSH-bucketed path, verified pairs must actually clear the threshold,
    and unrelated random vectors must not flood the output."""
    import random

    from data_table_spark.operators.dedup import embedding_near_pairs

    rng = random.Random(23)
    rows = []
    planted = set()
    for q in range(10):
        base = [rng.uniform(-1, 1) for _ in range(64)]
        rows.append((q, base))
        # ~1% perturbation keeps cosine ≈ 0.999 — a true semantic dup
        rows.append((1000 + q, [v * (1 + rng.uniform(-0.02, 0.02)) for v in base]))
        planted.add((q, 1000 + q))
    for i in range(100, 500):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(64)]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = embedding_near_pairs(df, threshold=0.95).collect()
    pairs = {(r["a"], r["b"]) for r in got}
    hits = len(planted & pairs)
    assert hits >= 9, (hits, planted - pairs)
    assert all(r["cos_sim"] >= 0.95 for r in got)
    # 64-dim random vectors essentially never reach cos 0.95 — the output
    # should be (close to) exactly the planted pairs, not a candidate dump
    assert len(pairs) <= len(planted) + 2, len(pairs)


def test_quantize_int8_roundtrip_fidelity(spark, sf_dir):
    """Dequantized int8 vectors must preserve cosine similarity to ~3
    decimals (the fidelity claim in quantize_int8's docstring): compare
    cosine(q0, v) exact vs dequantized for 50 vectors."""
    from pyspark.sql import functions as F

    from data_table_spark.operators.similarity import cosine, quantize_int8
    from data_table_spark.sources.registry import load_table

    e = load_table(spark, "embeddings", sf_dir).where(F.col("vec_id") < 50)
    q = quantize_int8(e)
    deq = q.select(
        "vec_id",
        F.transform(
            "qvec", lambda x: (x.cast("double") + 0.5) * F.col("scale_t")
        ).alias("dv"),
    )
    j = (
        e.select("vec_id", "embedding").join(deq, "vec_id")
        .crossJoin(
            F.broadcast(
                e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
            )
        )
        .where(F.col("vec_id") != 0)
        .select(
            (F.abs(
                cosine(F.col("embedding"), F.col("qv"))
                - cosine(F.col("dv"), F.col("qv"))
            )).alias("err"),
        )
        .agg(F.max("err").alias("mx"))
        .collect()
    )
    assert j[0]["mx"] < 0.01, j[0]["mx"]


def test_simhash_identical_text_same_hash(spark, sf_dir):
    sig = DEDUP_QUERIES["dedup_simhash"](spark, sf_dir)
    rows = sig.limit(5).collect()
    assert all(isinstance(r["simhash"], int) for r in rows)
    assert all(r["simhash"] >= 0 for r in rows)  # 63-bit pack stays non-negative


def test_lsh_signature_recall_on_planted_neighbors(spark):
    """Hyperplane-LSH signatures must place near-duplicate vectors within
    small hamming distance of the original, and random vectors far away.
    The sf fixtures have no planted embedding near-dups, so plant our own:
    a base vector, 3 slight perturbations, and 60 random vectors."""
    import random

    from pyspark.sql import functions as F

    from data_table_spark.operators.similarity import lsh_signature

    rng = random.Random(7)
    base = [rng.uniform(-1, 1) for _ in range(64)]
    rows = [(0, base)]
    for i in range(1, 4):  # near-dups: tiny perturbation
        rows.append((i, [v + rng.uniform(-0.02, 0.02) for v in base]))
    for i in range(4, 64):  # unrelated noise
        rows.append((i, [rng.uniform(-1, 1) for _ in range(64)]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    sig = df.select(
        "vec_id", lsh_signature(F.col("embedding")).alias("sig")
    ).collect()
    sigs = {r["vec_id"]: r["sig"] for r in sig}
    ham = lambda a, b: bin(a ^ b).count("1")
    near = [ham(sigs[0], sigs[i]) for i in range(1, 4)]
    far = [ham(sigs[0], sigs[i]) for i in range(4, 64)]
    assert max(near) <= 6, near
    assert sum(f > 6 for f in far) >= 0.9 * len(far), sorted(far)[:10]


def test_lsh_topk_is_subset_semantics(spark, sf_dir):
    """sim_lsh_topk returns cosine-ordered results drawn from the
    signature-pruned candidate set (smoke on the sf fixture)."""
    rows = SIMILARITY_QUERIES["sim_lsh_topk"](spark, sf_dir).collect()
    sims = [r["cos_sim"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_ivf_topk_exact_within_probed_partitions(spark, sf_dir):
    """IVF result must EQUAL brute force restricted to the probed labels
    (the approximation is the partition pruning, nothing else)."""
    from pyspark.sql import functions as F

    from data_table_spark.operators.similarity import (
        QUERY_VEC_ID,
        TOP_K,
        _centroids,
        cosine,
        sim_ivf_topk,
    )
    from data_table_spark.sources.registry import load_table

    e = load_table(spark, "embeddings", sf_dir)
    got = [(r["vec_id"], r["cos_sim"]) for r in sim_ivf_topk(spark, sf_dir).collect()]
    cents = _centroids(e)
    q = e.where(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("qv"))
    probed = [
        r["label"]
        for r in cents.crossJoin(F.broadcast(q))
        .select("label", cosine(F.col("centroid"), F.col("qv")).alias("cs"))
        .orderBy(F.col("cs").desc(), F.col("label")).limit(2).collect()
    ]
    expected = [
        (r["vec_id"], r["cos_sim"])
        for r in e.where(F.col("label").isin(probed))
        .where(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(TOP_K).collect()
    ]
    assert got == expected


def test_duplicate_clusters_transitive(spark):
    """Connected components: chains collapse to one cluster labeled with
    the min id; disjoint components stay apart."""
    from data_table_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain → cluster 1
         (10, 11),                    # pair → cluster 10
         (20, 21), (21, 22)],         # chain → cluster 20
        ["a", "b"],
    )
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_vocab_and_oov_invariants(spark, sf_dir):
    """The vocab cut is real on the fixture (corpus distinct terms >
    VOCAB_SIZE): exactly VOCAB_SIZE contiguous ranks, and the resulting
    OOV shares are nonzero somewhere and bounded in [0, 1]."""
    from data_table_spark.operators.textstats import (
        VOCAB_SIZE,
        text_oov_rate,
        text_vocab,
    )

    v = text_vocab(spark, sf_dir).collect()
    assert len(v) == VOCAB_SIZE
    assert sorted(r["rank"] for r in v) == list(range(1, VOCAB_SIZE + 1))
    oov = text_oov_rate(spark, sf_dir).collect()
    assert all(0.0 <= r["oov_rate"] <= 1.0 for r in oov)
    assert sum(r["n_oov"] for r in oov) > 0, "vocab cut excluded nothing"


def test_star_clusters_match_label_propagation(spark):
    """Star contraction computes the identical fixed point as label
    propagation on the mixed chain/pair fixture."""
    from data_table_spark.operators.dedup import duplicate_clusters_star

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)], ["a", "b"]
    )
    got = {r["doc_id"]: r["cluster_id"]
           for r in duplicate_clusters_star(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_star_clusters_long_chain(spark):
    """A 100-node chain (diameter 99) — the adversarial case for label
    propagation (would need 99 rounds) — resolves in ≤ max_rounds star
    rounds to the single min-rooted component."""
    from data_table_spark.operators.dedup import duplicate_clusters_star

    pairs = spark.createDataFrame([(i, i + 1) for i in range(100)], ["a", "b"])
    got = {r["doc_id"]: r["cluster_id"]
           for r in duplicate_clusters_star(pairs, max_rounds=10).collect()}
    assert got == {i: 0 for i in range(101)}


def test_star_clusters_match_on_fixture(spark, sf_dir):
    """Both CC algorithms agree on the real bounded MinHash pair set."""
    from data_table_spark.operators.dedup import (
        dedup_clusters_bounded,
        dedup_clusters_star_bounded,
    )

    lp = {(r["doc_id"], r["cluster_id"])
          for r in dedup_clusters_bounded(spark, sf_dir).collect()}
    star = {(r["doc_id"], r["cluster_id"])
            for r in dedup_clusters_star_bounded(spark, sf_dir).collect()}
    assert lp == star and lp


def test_dedup_clusters_on_fixture(spark, sf_dir):
    from data_table_spark.operators.dedup import dedup_clusters

    rows = dedup_clusters(spark, sf_dir).collect()
    assert rows, "expected near-dup clusters in the fixture"
    for r in rows:
        assert r["cluster_id"] <= r["doc_id"]


def test_ivf_kmeans_exact_within_probed_clusters(spark, sf_dir):
    """Learned-codebook IVF must EQUAL brute force restricted to the
    probed k-means clusters, and rerunning must be deterministic."""
    from pyspark.sql import functions as F

    from data_table_spark.operators.similarity import (
        QUERY_VEC_ID,
        TOP_K,
        cosine,
        kmeans_codebook,
        sim_ivf_kmeans_topk,
    )
    from data_table_spark.sources.registry import load_table

    e = load_table(spark, "embeddings", sf_dir)
    got = [
        (r["vec_id"], r["cos_sim"])
        for r in sim_ivf_kmeans_topk(spark, sf_dir).collect()
    ]
    assert got == [
        (r["vec_id"], r["cos_sim"])
        for r in sim_ivf_kmeans_topk(spark, sf_dir).collect()
    ], "codebook training is not deterministic"

    assign, cents = kmeans_codebook(e)
    q = e.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    probed = [
        r["cluster"]
        for r in cents.crossJoin(F.broadcast(q))
        .select("cluster", cosine(F.col("centroid"), F.col("qv")).alias("cs"))
        .orderBy(F.col("cs").desc(), F.col("cluster")).limit(2).collect()
    ]
    expected = [
        (r["vec_id"], r["cos_sim"])
        for r in e.join(assign, "vec_id")
        .where(F.col("cluster").isin(probed))
        .where(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(TOP_K).collect()
    ]
    assert got == expected
    # the quantizer actually partitions: >1 non-empty cluster
    assert assign.select("cluster").distinct().count() > 1


def test_pinned_codebook_argmin_separation(sf_dir):
    """The pinned-codebook gates' hash-exactness rests on nearest-
    centroid argmin being decided far above fp summation noise: assert
    every fixture vector's best-vs-second-best distance gap clears 1e-9
    (measured 1.15e-3 at sf0.01 — ~7 orders of margin), and that the
    codebook actually spreads (pairwise centroid |cosine| < 0.7 —
    measured max 0.57; no two centroids near-collinear)."""
    import numpy as np
    import pyarrow.parquet as pq

    from data_table_spark.operators.similarity import pinned_codebook

    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    X = np.vstack(t["embedding"].map(np.asarray)).astype(np.float64)
    C = pinned_codebook(dim=X.shape[1])
    D = (C * C).sum(1)[None, :] - 2.0 * (X @ C.T)
    Ds = np.sort(D, axis=1)
    assert (Ds[:, 1] - Ds[:, 0]).min() > 1e-9
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    cc = Cn @ Cn.T
    np.fill_diagonal(cc, 0.0)
    assert np.abs(cc).max() < 0.7


def test_pinned_topk_equals_kmeans_machinery(spark, sf_dir):
    """sim_ivf_pinned_topk must EQUAL brute force restricted to the
    pinned-probed clusters — the same exactness contract the learned
    path proves, through the same shared serving code."""
    from data_table_spark.operators.similarity import (
        QUERY_VEC_ID,
        TOP_K,
        _pinned_cents_df,
        codebook_assign,
        cosine,
        pinned_codebook,
        sim_ivf_pinned_topk,
    )
    from data_table_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, "embeddings", sf_dir)
    centers = pinned_codebook()
    assign = codebook_assign(e, centers)
    q = e.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qv")
    )
    cents = _pinned_cents_df(spark, centers)
    probed = [
        r["cluster"]
        for r in cents.crossJoin(F.broadcast(q))
        .select("cluster", cosine(F.col("centroid"), F.col("qv")).alias("cs"))
        .orderBy(F.col("cs").desc(), F.col("cluster")).limit(2).collect()
    ]
    expected = [
        (r["vec_id"], r["cos_sim"])
        for r in e.join(assign, "vec_id")
        .where(F.col("cluster").isin(probed))
        .where(F.col("vec_id") != QUERY_VEC_ID)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(TOP_K).collect()
    ]
    got = [
        (r["vec_id"], r["cos_sim"])
        for r in sim_ivf_pinned_topk(spark, sf_dir).collect()
    ]
    assert got == expected


def test_quantized_topk_fidelity(spark, sf_dir):
    """int8-quantized ranking must closely track full-precision ranking:
    ≥8 of the top-10 overlap, and every quantized cosine is within 0.02
    of the full-precision score for the same vector."""
    from data_table_spark.operators.similarity import SIMILARITY_QUERIES

    full = {
        r["vec_id"]: r["cos_sim"]
        for r in SIMILARITY_QUERIES["sim_bruteforce_topk"](spark, sf_dir).collect()
    }
    quant = {
        r["vec_id"]: r["q_cos_sim"]
        for r in SIMILARITY_QUERIES["sim_quantized_topk"](spark, sf_dir).collect()
    }
    assert len(set(full) & set(quant)) >= 8, (full, quant)
    for vid in set(full) & set(quant):
        assert abs(full[vid] - quant[vid]) < 0.02, (vid, full[vid], quant[vid])


def test_pq_argmin_separation_and_fidelity(sf_dir):
    """The PQ gates' hash-exactness rests on each SUBSPACE argmin being
    decided far above fp noise: assert every (vector, subspace)
    best-vs-runner-up gap clears 1e-9, and that ADC actually ranks:
    the integer distance tables are non-degenerate (no all-equal
    subspace) and the top-10 ADC neighbors of the pinned query overlap
    the EXACT top-10 by true squared distance (compression loses
    precision, not the neighborhood wholesale)."""
    import numpy as np
    import pyarrow.parquet as pq_  # noqa: N813

    from data_table_spark.operators.similarity import (
        PQ_M,
        PQ_SUBDIM,
        _pq_dist64,
        pq_codebooks,
        pq_query,
    )

    t = pq_.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    X = np.vstack(t["embedding"].map(np.asarray)).astype(np.float64)
    ids = t["vec_id"].to_numpy()
    books = pq_codebooks()
    codes = np.empty((X.shape[0], PQ_M), dtype=int)
    for m in range(PQ_M):
        Xm = X[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
        D = (books[m] * books[m]).sum(1)[None, :] - 2.0 * (Xm @ books[m].T)
        Ds = np.sort(D, axis=1)
        assert (Ds[:, 1] - Ds[:, 0]).min() > 1e-9, f"subspace {m} tie"
        codes[:, m] = D.argmin(axis=1)
    dt = np.array(_pq_dist64())
    assert all(len(set(row)) > 1 for row in dt)
    adc = sum(dt[m][codes[:, m]] for m in range(PQ_M))
    q = pq_query()
    true_d = ((X - q[None, :]) ** 2).sum(axis=1)
    adc_top = np.lexsort((ids, adc))[:10]
    top_adc = set(ids[adc_top])
    top_true = set(ids[np.lexsort((ids, true_d))][:10])
    # 48-bit codes are lossy: require the neighborhood to survive, not
    # the exact set — ≥2/10 overlap with the exact top-10 (measured 4)
    # and the picks' mean TRUE rank in the top third of the corpus
    # (measured 79 of 500; random would be ~250)
    assert len(top_adc & top_true) >= 2, (top_adc, top_true)
    order_true = np.argsort(true_d)
    rank_of = np.empty(len(ids))
    rank_of[order_true] = np.arange(len(ids))
    assert rank_of[adc_top].mean() < len(ids) / 3


def test_compression_ratio_golden(spark, sf_dir):
    """text_compression_ratio == Python zlib computed directly on the
    same parquet — full-output equality (the gate's oracle substitute;
    zlib at a fixed level is deterministic for the container's zlib
    build)."""
    import zlib

    import duckdb

    from data_table_spark.operators.textstats import TEXTSTATS_QUERIES

    got = sorted(
        (r["doc_id"], r["n_bytes"], r["n_compressed"], r["ratio_e6"])
        for r in TEXTSTATS_QUERIES["text_compression_ratio"](
            spark, sf_dir
        ).collect()
    )
    import os
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{os.path.join(sf_dir, 'documents.parquet')}'"
    ).fetchall()
    want = []
    for doc_id, text in rows:
        b = (text or "").encode("utf-8")
        c = len(zlib.compress(b, 6))
        want.append(
            (doc_id, len(b), c, (1_000_000 * c) // len(b) if b else None)
        )
    assert got == sorted(want)
