"""Langid + perplexity model behavior and determinism."""

import pandas as pd

from data_quality_monitoring_spark.artifacts import get_bigram_models, get_langid_model, training_texts
from data_quality_monitoring_spark.datagen import LANGS


def test_langid_separates_languages():
    model = get_langid_model()
    texts, claims = [], []
    for lang in LANGS:
        for t in training_texts(lang, 10):
            texts.append(t)
            claims.append(lang)
    out = model.score_batch(pd.Series(texts), pd.Series(claims))
    assert (out["pred_lang"] == pd.Series(claims)).all()
    assert (out["claimed_score"] > 0.9).all()


def test_langid_flags_mismatch():
    model = get_langid_model()
    fr = training_texts("fr", 5)
    out = model.score_batch(pd.Series(fr), pd.Series(["en"] * 5))
    assert (out["claimed_score"] < 0.1).all()


def test_langid_null_and_empty():
    model = get_langid_model()
    out = model.score_batch(pd.Series([None, "", "   "]), pd.Series(["en"] * 3))
    assert out["pred_lang"].isna().all()


def test_perplexity_clean_vs_gibberish():
    lms = get_bigram_models()
    clean = training_texts("en", 5)
    clean_scores = [lms["en"].nll(t) for t in clean]
    gibberish = "qzxv jkwpf mnbvt yhgrd xswqa zplmk" * 10
    assert max(clean_scores) < 6.0 < lms["en"].nll(gibberish)


def test_perplexity_cross_language():
    lms = get_bigram_models()
    de = training_texts("de", 3)
    # German scored by its own LM: fine; by the English LM: anomalous
    assert all(lms["de"].nll(t) < 6.0 for t in de)
    assert all(lms["en"].nll(t) > 6.0 for t in de)


def test_models_deterministic():
    a, b = get_langid_model(), get_langid_model()
    assert a is b  # cached
    t = training_texts("en", 1)[0]
    s1 = a.score_batch(pd.Series([t]), pd.Series(["en"]))["claimed_score"][0]
    s2 = a.score_batch(pd.Series([t]), pd.Series(["en"]))["claimed_score"][0]
    assert s1 == s2
    lm = get_bigram_models()["en"]
    assert lm.nll(t) == lm.nll(t)
