"""End-to-end corpus build: filter → exact dedup → near-dup clusters → sample."""

import pandas as pd
from pyspark.sql import functions as F

from data_quality_monitoring_spark.datagen import generate_pages, generate_pages_pandas
from data_quality_monitoring_spark.plans.corpus import build_corpus
from data_quality_monitoring_spark.plans.pipeline import quality_filter


def test_build_corpus_dedups_and_counts(spark):
    base_pdf = generate_pages_pandas(300)
    base = generate_pages(spark, 300)
    kept_urls = {
        r["url"]
        for r in quality_filter(spark, base).filter("keep").select("url").collect()
    }
    # two kept source docs with long texts → plant one exact dup and one
    # near dup (last word dropped keeps Jaccard >= ~0.9 on 3-word shingles)
    donors = (
        base_pdf[base_pdf.url.isin(kept_urls)]
        .assign(nw=lambda d: d.text.str.split().str.len())
        .sort_values("nw", ascending=False)
        .head(2)
    )
    assert len(donors) == 2 and (donors.nw > 30).all()
    d1, d2 = donors.iloc[0], donors.iloc[1]
    crafted = pd.DataFrame(
        [
            {**d1.drop("nw").to_dict(), "url": "https://zzz.example/exact-dup"},
            {
                **d2.drop("nw").to_dict(),
                "url": "https://zzz.example/near-dup",
                "text": d2.text.rsplit(" ", 1)[0],
            },
        ]
    )
    pages = base.unionByName(spark.createDataFrame(crafted[base.columns]))

    corpus, stats = build_corpus(spark, pages, jaccard_threshold=0.7)
    urls = {r["url"] for r in corpus.select("url").collect()}

    assert stats["docs_in"] == 302
    # the exact dup lost to its donor (min url is canonical)
    assert "https://zzz.example/exact-dup" not in urls and d1.url in urls
    # the near dup clustered with its donor and lost
    assert "https://zzz.example/near-dup" not in urls and d2.url in urls
    assert stats["final"] <= stats["after_exact_dedup"] <= stats["kept"]
    assert stats["after_exact_dedup"] == stats["kept"] - 1  # one exact dup planted
    assert stats["final"] == stats["after_exact_dedup"] - 1  # one near dup planted


def test_build_corpus_sampling_gate(spark):
    pages = generate_pages(spark, 200)
    full, s_full = build_corpus(spark, pages)
    sampled, s_samp = build_corpus(
        spark, pages, sample_rates={"en": 0.4}, default_rate=0.5
    )
    assert s_samp["final"] < s_full["final"]
    # sampled corpus is a subset of the full one (nested determinism)
    full_urls = {r["url"] for r in full.select("url").collect()}
    samp_urls = {r["url"] for r in sampled.select("url").collect()}
    assert samp_urls < full_urls
