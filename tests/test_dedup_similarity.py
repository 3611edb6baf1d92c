"""Dedup + similarity-search tests against independent pure-Python
(hashlib/numpy) oracles."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from arion_spark.functions import dedup, similarity
from arion_spark.functions import text as txt

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox jumps over a sleepy dog"),  # near dup
    (3, "completely different content about spark plans"),
    (4, ""),
    (5, "one"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_tokens(t):
    t = t.strip().lower()
    return t.split() if t else []


def _py_shingles(t, k=2):
    toks = _py_tokens(t)
    n = len(toks)
    out = []
    for i in range(max(n - k + 1, 1)):
        out.append(" ".join(toks[i : i + k]))
    return list(dict.fromkeys(out))


def _py_minhash(t, perms=8):
    sh = _py_shingles(t)
    hs = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in sh]
    return [
        min((a * h + b) % dedup.MINHASH_P for h in hs)
        for a, b in dedup.MINHASH_AB[:perms]
    ]


def test_exact_dedup(spark, docs_df):
    out = {r.text_md5: r for r in dedup.exact_dedup(docs_df).collect()}
    h = hashlib.md5(DOCS[0][1].encode()).hexdigest()
    assert out[h].n_dups == 2 and out[h].keep_id == 0
    assert len(out) == 5  # 6 docs, one dup pair


def test_minhash_signature_matches_python(spark, docs_df):
    got = {
        r.doc_id: list(r.minhash) for r in dedup.with_minhash(docs_df).collect()
    }
    for doc_id, text in DOCS:
        if text:
            assert got[doc_id] == _py_minhash(text), doc_id


def test_lsh_finds_exact_and_near_dups(spark, docs_df):
    pairs = {(r.id_a, r.id_b) for r in dedup.lsh_candidate_pairs(docs_df).collect()}
    assert (0, 1) in pairs  # identical docs always collide on every band
    assert all(a < b for a, b in pairs)


def test_jaccard_values(spark, docs_df):
    pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "id_a long, id_b long")
    j = {(r.id_a, r.id_b): r.jaccard for r in dedup.jaccard_pairs(docs_df, pairs).collect()}
    assert j[(0, 1)] == 1.0
    s0, s2, s3 = map(set, (_py_shingles(DOCS[0][1]), _py_shingles(DOCS[2][1]), _py_shingles(DOCS[3][1])))
    assert j[(0, 2)] == round(len(s0 & s2) / len(s0 | s2), 4)
    assert j[(0, 3)] == round(len(s0 & s3) / len(s0 | s3), 4)


def _py_simhash16(t):
    toks = _py_tokens(t)
    out = 0
    for b in range(16):
        votes = 0
        for tok in toks:
            h16 = int(hashlib.md5(tok.encode()).hexdigest()[:4], 16)
            votes += 1 if (h16 >> b) & 1 else -1
        if votes > 0:
            out |= 1 << b
    return out


def test_simhash_matches_python(spark, docs_df):
    got = {
        r.doc_id: r.sh
        for r in docs_df.select("doc_id", dedup.simhash16(F.col("text")).alias("sh")).collect()
    }
    for doc_id, text in DOCS:
        assert got[doc_id] == _py_simhash16(text), (doc_id, text)


def test_simhash_near_dups_closer_than_unrelated(spark):
    a, b, c = _py_simhash16(DOCS[0][1]), _py_simhash16(DOCS[2][1]), _py_simhash16(DOCS[3][1])
    assert bin(a ^ b).count("1") <= bin(a ^ c).count("1")


VECS = [(i, [float(np.sin(i * 17 + d)) for d in range(8)]) for i in range(30)]


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<double>")


def test_brute_force_topk_matches_numpy(spark, vec_df):
    M = np.array([v for _, v in VECS])
    sims = (M @ M.T) / (np.linalg.norm(M, axis=1)[:, None] * np.linalg.norm(M, axis=1)[None, :])
    got = (
        similarity.brute_force_topk(vec_df, vec_df.where("vec_id < 3"), k=4)
        .orderBy("query_id", "rank")
        .collect()
    )
    for q in range(3):
        scores = [(round(sims[q, n], 3), n) for n in range(30) if n != q]
        scores.sort(key=lambda x: (-x[0], x[1]))
        want = [n for _, n in scores[:4]]
        have = [r.neighbor_id for r in got if r.query_id == q]
        assert have == want, q


def test_srp_ann_subset_of_brute_force_space(spark, vec_df):
    out = similarity.lsh_topk(vec_df, vec_df.where("vec_id < 3"), dim=8, k=4).collect()
    # approximate: every returned neighbor must at least be a valid id ≠ query
    assert all(r.neighbor_id != r.query_id for r in out)
    # bucketing is deterministic: same call twice → same rows
    out2 = similarity.lsh_topk(vec_df, vec_df.where("vec_id < 3"), dim=8, k=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_quality_and_lang(spark, docs_df):
    r = {
        x.doc_id: x
        for x in docs_df.select(
            "doc_id",
            txt.lang_id_col(F.col("text")).alias("lang"),
            txt.bpe_ish_token_count(F.col("text")).alias("bpe"),
        ).collect()
    }
    assert r[0].lang == "en"  # 'the' markers
    assert r[4].lang == "unk" and r[4].bpe == 0
    assert r[0].bpe == len(DOCS[0][1].split())  # plain words → one piece each


def test_ivf_ann_matches_brute_force_within_cell(spark, vec_df):
    """IVF returns the exact within-cell top-k: every (query, neighbor)
    must share the query's best centroid, ranked by cosine."""
    M = np.array([v for _, v in VECS])
    norm = np.linalg.norm(M, axis=1)
    sims = (M @ M.T) / (norm[:, None] * norm[None, :])
    cells = {}
    for i in range(30):
        cs = [(round(-sims[i, c], 12), c) for c in range(4)]
        cells[i] = min(cs)[1]
    got = (
        similarity.ivf_topk(vec_df, vec_df.where("vec_id < 3"), n_cells=4, k=4)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert got, "ivf returned nothing"
    for q in range(3):
        cands = [n for n in range(30) if n != q and cells[n] == cells[q]]
        scores = [(round(sims[q, n], 3), n) for n in cands]
        scores.sort(key=lambda x: (-x[0], x[1]))
        want = [n for _, n in scores[:4]]
        have = [r.neighbor_id for r in got if r.query_id == q]
        assert have == want, q


def test_connected_components_labels(spark):
    """Chain, triangle-free pair, singleton: every vertex labeled with
    the min reachable id; canonical = cluster representative."""
    from arion_spark.functions import dedup

    verts = spark.createDataFrame([(i,) for i in range(7)], "doc_id long")
    # components: {0,1,2,3} (chain), {4,5}, {6} singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    got = {
        r.doc_id: (r.cluster_id, r.is_canonical)
        for r in dedup.connected_components(verts, pairs).collect()
    }
    assert got == {
        0: (0, True), 1: (0, False), 2: (0, False), 3: (0, False),
        4: (4, True), 5: (4, False), 6: (6, True),
    }


def test_kmeans_centroids_matches_numpy_lloyd(spark, vec_df):
    """2 deterministic Lloyd iterations equal an independent numpy
    implementation with the same init/rounding, and re-running gives
    identical centroids (cross-run determinism)."""
    got = {
        r.cell_id: list(r.cent)
        for r in similarity.kmeans_centroids(vec_df, k=3, iters=2).collect()
    }
    got2 = {
        r.cell_id: list(r.cent)
        for r in similarity.kmeans_centroids(vec_df, k=3, iters=2).collect()
    }
    assert got == got2

    M = np.array([v for _, v in VECS])
    cents = M[:3].copy()  # init: first k by id
    for _ in range(2):
        cn = cents / np.linalg.norm(cents, axis=1)[:, None]
        vn = M / np.linalg.norm(M, axis=1)[:, None]
        sims = vn @ cn.T
        # ties → lowest cell: argmax picks first max
        assign = sims.argmax(axis=1)
        for c in range(3):
            if (assign == c).any():
                cents[c] = np.round(M[assign == c].mean(axis=0), 6)
    for c in range(3):
        assert np.allclose(got[c + 1], cents[c], atol=1e-9), c


def test_banded_srp_buckets_udf_empty_batch(spark):
    """An empty Arrow batch must not crash the bucket UDF (np.asarray of
    an empty list is 1-D and V[:, d] would raise IndexError)."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = similarity.cosine_near_dup_pairs(empty, dim=8, threshold=0.9)
    assert out.collect() == []


def test_cosine_near_dup_pairs(spark, vec_df):
    """Planted duplicate (vector 100 = vector 0) is found; threshold
    excludes unrelated pairs exactly as numpy says.  The banded-SRP
    candidate path must (a) equal the exact all-pairs result on this
    corpus and (b) contain no BroadcastNestedLoopJoin in its plan."""
    dup = spark.createDataFrame(
        [(100, VECS[0][1])], "vec_id long, embedding array<double>"
    )
    corpus = vec_df.unionByName(dup)
    banded = similarity.cosine_near_dup_pairs(corpus, dim=8, threshold=0.95)
    assert "BroadcastNestedLoopJoin" not in banded._jdf.queryExecution().executedPlan().toString()
    got = {(r.id_a, r.id_b): r.cos_sim for r in banded.collect()}
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in similarity.cosine_near_dup_pairs_exact(
            corpus, threshold=0.95
        ).collect()
    }
    assert got == exact  # LSH recall = 1.0 on this corpus
    assert got[(0, 100)] == 1.0
    M = np.array([v for _, v in VECS] + [VECS[0][1]])
    ids = [i for i, _ in VECS] + [100]
    norm = np.linalg.norm(M, axis=1)
    sims = (M @ M.T) / (norm[:, None] * norm[None, :])
    want = {
        (ids[a], ids[b])
        for a in range(31)
        for b in range(31)
        if ids[a] < ids[b] and round(sims[a, b], 4) >= 0.95
    }
    assert set(got) == want


def test_simhash_near_dups_banded_is_exact(spark):
    """Pigeonhole: the banded-half candidate join must find EXACTLY the
    pairs an all-pairs hamming scan finds (d < bands ⇒ recall 1.0)."""
    from itertools import combinations

    rows = [(i, f"alpha beta gamma delta {w}") for i, w in enumerate(
        ["one", "two", "three", "one", "five", "six seven eight nine"]
    )]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_near_dups(df, max_hamming=1, n_bands=2).collect()
    }
    sk = {r.doc_id: r.sh for r in df.select(
        "doc_id", dedup.simhash16(F.col("text")).alias("sh")).collect()}
    want = {
        (a, b): bin(sk[a] ^ sk[b]).count("1")
        for a, b in combinations(sorted(sk), 2)
        if bin(sk[a] ^ sk[b]).count("1") <= 1
    }
    assert got == want
    assert (0, 3) in got and got[(0, 3)] == 0  # identical texts


def test_simhash_near_dups_rejects_inexact_params(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="exact"):
        dedup.simhash_near_dups(df, max_hamming=2, n_bands=2)


def test_pq_quality_and_compression(spark):
    """PQ sanity beyond the oracle: codes are bounded (compression is
    real), training moves centroids off the seed, and ADC top-k recall
    vs exact cosine beats a random baseline on clustered data."""
    import random

    from pyspark.sql import functions as F

    from arion_spark.functions import similarity as sim

    # clustered corpus: 4 well-separated centers + small deterministic
    # jitter, 64-dim (no RNG state shared with other tests)
    rnd = random.Random(7)
    centers = [[rnd.uniform(-1, 1) for _ in range(64)] for _ in range(4)]
    rows = []
    for i in range(200):
        c = centers[i % 4]
        rows.append((i, [v + rnd.uniform(-0.05, 0.05) for v in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = sim.pq_train(df, dim=64, n_sub=8, k=16, iters=1)
    assert len(cents) == 8 and all(len(cm) == 16 for cm in cents)

    codes = sim.pq_encode(df, cents)
    stats = codes.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.countDistinct("codes").alias("n_distinct"),
    ).head()
    assert 0 <= stats["lo"] and stats["hi"] < 16  # 8 codes in [0,16): 8 bytes/vector
    assert stats["n_distinct"] > 1

    queries = df.where("vec_id < 8")
    got = sim.pq_topk(df, queries, cents, k=5)
    exact = sim.brute_force_topk(df, queries, k=5) if hasattr(sim, "brute_force_topk") else None
    # exact cosine top-k as ground truth
    a = df.selectExpr("vec_id as neighbor_id", "embedding as cv")
    q = queries.selectExpr("vec_id as query_id", "embedding as qv")
    from pyspark.sql import Window as W

    sc = (
        a.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            sim.cosine(F.col("qv"), F.col("cv")).alias("s"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("s"), F.asc("neighbor_id"))
    truth = {
        (r.query_id, r.neighbor_id)
        for r in sc.withColumn("rk", F.row_number().over(w))
        .where("rk <= 5").collect()
    }
    pq_pairs = {(r.query_id, r.neighbor_id) for r in got.collect()}
    recall = len(pq_pairs & truth) / len(truth)
    # exact-rank recall INSIDE a tight 50-member cluster is intrinsically
    # low for 8-byte codes (reconstruction error >> intra-cluster
    # distances) — but far above the ~0.03 random baseline
    assert recall >= 0.1, recall
    # what 32× compression honestly promises: cluster-level
    # discrimination — retrieved neighbors come from the query's cluster
    same_cluster = sum(
        1 for qid, nid in pq_pairs if qid % 4 == nid % 4
    ) / len(pq_pairs)
    assert same_cluster >= 0.9, same_cluster


def test_ivf_pq_composed_prunes_and_recalls(spark):
    """IVF×PQ composition (similarity.ivf_pq_topk): the coarse quantizer
    must genuinely PRUNE (per-query candidates < corpus at n_probes=1 on
    clustered data), recall vs exact cosine must rise with n_probes (the
    IVF recall dial), and at full probe fan-out it must equal exhaustive
    pq_topk (cell pruning is the only difference between them)."""
    import random

    from pyspark.sql import functions as F

    from arion_spark.functions import similarity as sim

    rnd = random.Random(11)
    centers = [[rnd.uniform(-1, 1) for _ in range(64)] for _ in range(4)]
    rows = []
    for i in range(200):
        c = centers[i % 4]
        rows.append((i, [v + rnd.uniform(-0.05, 0.05) for v in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.where("vec_id < 8")

    coarse = sim.kmeans_centroids(df, k=4, iters=1)
    pq = sim.pq_train(df, dim=64, n_sub=8, k=16, iters=1)

    truth = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(df, queries, k=5).collect()
    }

    def pairs(n_probes):
        got = sim.ivf_pq_topk(
            df, queries, coarse, pq, k=5, n_probes=n_probes
        ).collect()
        return {(r.query_id, r.neighbor_id) for r in got}

    one, all_cells = pairs(1), pairs(4)
    recall_1 = len(one & truth) / len(truth)
    recall_all = len(all_cells & truth) / len(truth)
    # the recall dial: widening the probe fan-out never hurts.  (Exact
    # top-5 recall INSIDE a tight 50-member cluster is intrinsically low
    # for 8-byte codes — see test_pq_quality_and_compression — so the
    # honest per-rank floor is cluster-level discrimination, below.)
    assert recall_all >= recall_1, (recall_1, recall_all)
    same_cluster = sum(1 for qid, nid in one if qid % 4 == nid % 4) / len(one)
    assert same_cluster >= 0.9, same_cluster

    # full fan-out == exhaustive PQ: pruning is the ONLY delta
    exhaustive = {
        (r.query_id, r.neighbor_id, r.score)
        for r in sim.pq_topk(df, queries, pq, k=5).collect()
    }
    full = {
        (r.query_id, r.neighbor_id, r.score)
        for r in sim.ivf_pq_topk(
            df, queries, coarse, pq, k=5, n_probes=4
        ).collect()
    }
    assert full == exhaustive

    # pruning is real: the single-probe candidate set is about a cell's
    # worth of the corpus, not all of it (cluster i%4 → ~50 vectors)
    index = sim._assign_cells(df, coarse, "vec_id", "embedding")
    sizes = {r.cell_id: r.n for r in index.groupBy("cell_id").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert max(sizes.values()) < 200  # no cell swallowed the corpus
