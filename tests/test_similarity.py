"""ANN: brute-force exactness + IVF recall vs the exact baseline."""

import pytest
from pyspark.sql import functions as F

from data_quality_monitoring_spark.operators import similarity as S

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_brute_force_topk_shape(spark, emb):
    q = emb.filter(F.col("vec_id") < 5)
    out = S.brute_force_topk(emb, q, "vec_id", "embedding", k=3).toPandas()
    assert len(out) == 15
    assert set(out["qid"]) == {0, 1, 2, 3, 4}
    assert (out.groupby("qid")["rank"].max() == 3).all()
    # ranks ordered by descending cosine within each query
    for _, g in out.groupby("qid"):
        s = g.sort_values("rank")["cos"].values
        assert all(s[i] >= s[i + 1] for i in range(len(s) - 1))


def test_ivf_recall_vs_exact(spark, emb):
    q = emb.filter(F.col("vec_id") < 20)
    exact = S.brute_force_topk(emb, q, "vec_id", "embedding", k=5)
    approx = S.ivf_topk(emb, q, "vec_id", "embedding", k=5, n_cells=8, n_probe=4)
    recall = S.ann_recall(exact, approx)
    assert recall >= 0.5, recall  # random embeddings are a worst case; probing half the cells
    # full probe == exhaustive search → recall 1.0
    full = S.ivf_topk(emb, q, "vec_id", "embedding", k=5, n_cells=8, n_probe=8)
    assert S.ann_recall(exact, full) == 1.0


def test_centroids_deterministic(spark, emb):
    import numpy as np

    c1 = S.train_centroids(emb, "embedding", n_cells=4)
    c2 = S.train_centroids(emb, "embedding", n_cells=4)
    assert np.allclose(c1, c2)


def test_ivf_mllib_kmeans_path(spark, emb):
    """Distributed MLlib-KMeans coarse quantizer: same contract as the
    driver-sample trainer — normalized centroids, recall-pinned IVF."""
    import numpy as np

    cents = S.train_centroids_mllib(emb, "embedding", n_cells=8)
    assert cents.shape == (8, 64)
    assert np.allclose(np.linalg.norm(cents, axis=1), 1.0)
    q = emb.filter(F.col("vec_id") < 20)
    exact = S.brute_force_topk(emb, q, "vec_id", "embedding", k=5)
    full = S.ivf_topk(emb, q, "vec_id", "embedding", k=5, n_cells=8, n_probe=8, centroids=cents)
    assert S.ann_recall(exact, full) == 1.0  # full probe == exhaustive
