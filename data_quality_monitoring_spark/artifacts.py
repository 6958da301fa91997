"""Deterministic model artifacts (langid weights, per-language bigram LMs).

The reference trains its ML/LLM detectors offline (sentence-transformer
triplets, ``ml_based/model_training.py:134-267``; MLM fine-tuning,
``llm_based/llm_model_training.py:163-314``) and caches loaded models at
class level.  Here training is closed-form counting over a *seeded* clean
corpus, so artifacts are reproducible byte-for-byte; they are cached
in-process and (optionally) as files.  At 100 TB scale these artifacts are
small broadcast variables (<1 MB langid matrix, ~100 kB per bigram LM) —
shipped once per executor.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .datagen import LANGS, _clean_text
from .operators.langid import LangIdModel, train_langid
from .operators.perplexity import BigramLM, train_bigram

N_TRAIN_DOCS = 300


def training_texts(lang: str, n: int = N_TRAIN_DOCS) -> list[str]:
    """Seeded clean training corpus per language (disjoint seed space from
    datagen's per-doc_id seeds)."""
    import zlib

    base = zlib.crc32(f"train:{lang}".encode())
    return [
        _clean_text(np.random.default_rng((base * 100_003 + i) % (2**63)), lang)
        for i in range(n)
    ]


@lru_cache(maxsize=1)
def get_langid_model() -> LangIdModel:
    return train_langid({lang: training_texts(lang) for lang in LANGS})


@lru_cache(maxsize=1)
def get_bigram_models() -> dict[str, BigramLM]:
    return {lang: train_bigram(training_texts(lang)) for lang in LANGS}
