"""Sequence packing: determinism, budget bounds, contiguity."""

import pandas as pd
from pyspark.sql import functions as F

from data_quality_monitoring_spark.datagen import generate_pages
from data_quality_monitoring_spark.operators.packing import pack_documents, pack_stats

BUDGET = 256


def _packed(spark, partitions):
    pages = generate_pages(spark, 400, partitions=partitions)
    return pack_documents(pages, "url", BUDGET, group_cols=("lang",), n_shards=4)


def test_packing_deterministic_under_partitioning(spark):
    a = _packed(spark, 2).select("url", "shard", "pack_id").toPandas().sort_values("url")
    b = _packed(spark, 16).select("url", "shard", "pack_id").toPandas().sort_values("url")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_packing_budget_bound_and_contiguity(spark):
    packed = _packed(spark, 4).persist()
    stats = pack_stats(packed, ("lang",)).toPandas()
    docs = packed.toPandas()
    # offset packing bound: a pack holds docs whose START offsets lie in one
    # budget window, so its total is < budget + its largest document
    m = stats.merge(
        docs.groupby(["lang", "shard", "pack_id"]).n_tokens.max().rename("max_doc_tokens"),
        on=["lang", "shard", "pack_id"],
    )
    assert (m.total_tokens < BUDGET + m.max_doc_tokens).all()
    # every pack except a shard's last is filled past the budget boundary:
    # ids are contiguous from 0 per (lang, shard)
    for (_, _), grp in stats.groupby(["lang", "shard"]):
        ids = sorted(grp.pack_id)
        assert ids == list(range(len(ids)))
    # empty/null docs are excluded, everything else packed exactly once
    n_live = len(docs)
    assert n_live > 300 and docs.url.is_unique
    assert stats.n_docs.sum() == n_live
    packed.unpersist()


def test_packing_precomputed_tokens_column(spark):
    pdf = pd.DataFrame({"k": ["a", "b", "c"], "text": ["x", "y", "z"], "nt": [100, 200, 300]})
    df = spark.createDataFrame(pdf)
    out = (
        pack_documents(df, "k", 250, tokens_col="nt", n_shards=1)
        .select("k", "pack_id")
        .toPandas()
        .set_index("k")
        .pack_id
    )
    # order by key: a(100)@0, b(200)@100, c(300)@300 → packs 0,0,1
    assert list(out.loc[["a", "b", "c"]]) == [0, 0, 1]
