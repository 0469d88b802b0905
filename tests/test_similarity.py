"""Similarity-search tests: exact correctness of brute-force top-k on a
hand-computable corpus, and IVF recall@k against brute force — on
clustered synthetic data (IVF's design case) and on the driver's
isotropic sf0.01 embeddings fixture (IVF's worst case, the
configuration q30 ships with).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from efiche_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    cosine_neardup_pairs,
    ivf_topk,
    train_centroids,
)
from efiche_data_pipeline_spark.sources.catalog import load_table

from .conftest import SF_DIR


def test_brute_force_topk_exact_ordering(spark):
    """2-d corpus with analytically known cosine ordering against the
    single query (1, 0)."""
    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.1]),   # cos ≈ 0.995
            (3, [1.0, 1.0]),   # cos ≈ 0.7071
            (4, [0.0, 1.0]),   # cos = 0
            (5, [-1.0, 0.1]),  # cos ≈ -0.995
        ],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.filter(F.col("vec_id") == 1)
    out = brute_force_topk(corpus, queries, "vec_id", "embedding", k=3).collect()
    assert [(r.neighbor_id, r.rank) for r in out] == [(2, 1), (3, 2), (4, 3)]
    sims = {r.neighbor_id: r.sim for r in out}
    assert sims[2] == round(1.0 / math.sqrt(1.01), 4)
    assert sims[3] == round(1.0 / math.sqrt(2.0), 4)
    assert sims[4] == 0.0


@pytest.fixture(scope="module")
def clustered(spark):
    """20 well-separated clusters × 25 members in 8-d: cluster c lives
    on axis-pair (c%8, (c+3)%8) with small deterministic jitter."""
    import numpy as np

    rng = np.random.default_rng(42)
    rows = []
    vid = 0
    for c in range(20):
        base = np.zeros(8)
        base[c % 8] = 1.0
        base[(c + 3) % 8] = 0.5 if c < 8 else -0.5
        for _ in range(25):
            v = base + rng.normal(0, 0.05, 8)
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<double>"
    )


def test_ivf_recall_on_clustered_data(clustered):
    """On clustered data (IVF's design case) a small nprobe already
    recovers ≥0.9 of brute-force top-5."""
    queries = clustered.filter(F.col("vec_id") % 25 == 0)  # one per cluster
    bf = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(clustered, queries, k=5).collect()
    }
    cents = train_centroids(clustered, k=20, iters=2)
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(clustered, queries, cents, k=5, nprobe=2).collect()
    }
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.9, f"clustered-data recall {recall}"


def test_ivf_multiprobe_improves_recall(clustered):
    """nprobe is a monotone recall lever: more probed cells can only
    add candidates."""
    queries = clustered.filter(F.col("vec_id") % 125 == 0)
    bf = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(clustered, queries, k=5).collect()
    }
    cents = train_centroids(clustered, k=20, iters=2)

    def recall(nprobe: int) -> float:
        ivf = {
            (r.query_id, r.neighbor_id)
            for r in ivf_topk(clustered, queries, cents, k=5, nprobe=nprobe).collect()
        }
        return len(bf & ivf) / len(bf)

    r1, r4 = recall(1), recall(4)
    assert r4 >= r1
    assert r4 >= 0.9


def test_cosine_neardup_blocked_recall(clustered):
    """Cell-blocked near-dup pairs recover ≥0.9 of the exact pairs on
    clustered data (near-dups are intra-cluster by construction), at a
    fraction of the n² candidate count."""
    exact = {
        (r.id_a, r.id_b)
        for r in cosine_neardup_pairs(clustered, threshold=0.9).collect()
    }
    assert exact  # jittered cluster members are near-dups of each other
    cents = train_centroids(clustered, k=20, iters=2)
    blocked = {
        (r.id_a, r.id_b)
        for r in cosine_neardup_pairs(
            clustered, threshold=0.9, centroids=cents, nprobe=2
        ).collect()
    }
    assert blocked <= exact  # blocking only removes candidates
    recall = len(blocked & exact) / len(exact)
    assert recall >= 0.9, f"blocked near-dup recall {recall}"


def test_ivf_recall_on_fixture_embeddings(spark):
    """The q30 shipping configuration (k=16, iters=3, nprobe=8) clears
    recall@5 ≥ 0.8 against brute force on the sf0.01 embeddings — the
    isotropic worst case, hence the large nprobe."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    bf = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    cents = train_centroids(emb, k=16, iters=3)
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, queries, cents, k=5, nprobe=8).collect()
    }
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.8, f"fixture recall@5 {recall}"


def test_incremental_ivf_equals_oneshot_and_replays_safely(spark, tmp_path):
    """Appending in two batches under frozen centroids must yield the
    EXACT q30 one-shot result; replaying a batch adds nothing; the
    centroid version never moves after the first append."""
    from efiche_data_pipeline_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_query,
    )
    from efiche_data_pipeline_spark.pipeline.store import Store
    from efiche_data_pipeline_spark.plans.registry import QUERIES

    from .conftest import SMOKE_SF_DIR

    emb = load_table(spark, SMOKE_SF_DIR, "embeddings")
    lo, hi = emb.agg(F.min("vec_id"), F.max("vec_id")).first()
    split = (int(lo) + int(hi)) // 2
    pinned = emb.filter(F.col("vec_id") < 16).select(
        (F.col("vec_id") + 1).alias("cell_id"), "embedding"
    )
    store = Store(spark, str(tmp_path / "ivf"))
    b1 = emb.filter(F.col("vec_id") <= split)
    r1 = ivf_index_append(b1, store, centroids=pinned)
    r2 = ivf_index_append(emb.filter(F.col("vec_id") > split), store)
    assert r1.n_new + r2.n_new == emb.count()
    assert r2.centroid_version == r1.centroid_version
    replay = ivf_index_append(b1, store)
    assert replay.n_new == 0
    assert store.read("ivf_cells").count() == emb.count()

    got = sorted(
        map(
            tuple,
            ivf_index_query(
                store, emb.filter(F.col("vec_id") < 10), k=5, nprobe=8
            ).collect(),
        )
    )
    want = sorted(
        map(tuple, QUERIES["q30_knn_ivf"](spark, SMOKE_SF_DIR).collect())
    )
    assert got == want


def test_ivf_index_query_prunes_partitions(spark, tmp_path):
    """The probed cell_id IN (...) literal must reach the cell store
    as a PARTITION filter (directory-level pruning — the on-disk
    1/K-of-corpus promise), not a post-scan row filter."""
    from efiche_data_pipeline_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_query,
    )
    from efiche_data_pipeline_spark.pipeline.store import Store

    from .conftest import SMOKE_SF_DIR

    emb = load_table(spark, SMOKE_SF_DIR, "embeddings")
    pinned = emb.filter(F.col("vec_id") < 16).select(
        (F.col("vec_id") + 1).alias("cell_id"), "embedding"
    )
    store = Store(spark, str(tmp_path / "ivf"))
    ivf_index_append(emb, store, centroids=pinned)
    df = ivf_index_query(store, emb.filter(F.col("vec_id") < 3), k=5, nprobe=2)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the cell store is the only partitioned scan in the plan; its
    # FileScan must carry the probed cells as a PARTITION filter
    # (plan paths are truncated, so match the filter text itself)
    assert "PartitionFilters: [cell_id" in plan, plan


def test_ivf_index_retrain_migrates_and_queries_match_fresh_build(spark, tmp_path):
    """After retrain: centroid version bumps, every vector survives the
    migration, and querying the migrated index equals a from-scratch
    ivf_topk under the NEW centroids."""
    from efiche_data_pipeline_spark.operators.similarity import (
        ivf_index_append,
        ivf_index_query,
        ivf_index_retrain,
    )
    from efiche_data_pipeline_spark.pipeline.store import Store

    from .conftest import SMOKE_SF_DIR

    emb = load_table(spark, SMOKE_SF_DIR, "embeddings")
    pinned = emb.filter(F.col("vec_id") < 16).select(
        (F.col("vec_id") + 1).alias("cell_id"), "embedding"
    )
    store = Store(spark, str(tmp_path / "ivf"))
    r1 = ivf_index_append(emb, store, centroids=pinned)
    v2 = ivf_index_retrain(store, k=8)
    assert v2 > r1.centroid_version
    cells = store.read("ivf_cells")
    assert cells.count() == emb.count()
    assert cells.select("cell_id").distinct().count() <= 8
    queries = emb.filter(F.col("vec_id") < 5)
    got = sorted(
        map(tuple, ivf_index_query(store, queries, k=5, nprobe=3).collect())
    )
    want = sorted(
        map(
            tuple,
            ivf_topk(
                emb,
                queries,
                store.read_version("ivf_centroids"),
                k=5,
                nprobe=3,
            ).collect(),
        )
    )
    assert got == want
    # post-retrain appends keep working against the NEW centroids
    assert ivf_index_append(emb, store).n_new == 0  # replay: all indexed


def test_ivf_empty_first_batch_rejected(spark, tmp_path):
    """An empty first batch must raise instead of committing EMPTY
    frozen centroids that would silently index nothing forever."""
    from efiche_data_pipeline_spark.operators.similarity import ivf_index_append
    from efiche_data_pipeline_spark.pipeline.store import Store

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    store = Store(spark, str(tmp_path / "ivf"))
    with pytest.raises(ValueError, match="no centroids"):
        ivf_index_append(empty, store)
    assert store.current_version("ivf_centroids") is None
    # but an empty batch AFTER a healthy seed is a clean no-op
    seeded = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    r1 = ivf_index_append(seeded, store, train_k=4)
    r2 = ivf_index_append(empty, store)
    assert r1.n_new == 20 and r2.n_new == 0
    assert r2.centroid_version == r1.centroid_version
