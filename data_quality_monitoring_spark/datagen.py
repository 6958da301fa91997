"""Deterministic synthetic Common-Crawl-style page corpus.

Schema matches the pipeline input contract:
``url:string, warc_ts:timestamp, html:binary, text:string, lang:string``.

Every row is a pure function of ``doc_id`` (numpy RNG seeded per row), so the
corpus is byte-identical no matter how Spark partitions the generating range
— the property the reference lacks (it used unseeded ``random.random()``
throughout, e.g. its sample generator and error-injection driver), and the
property that makes the F1/scrub parity tests meaningful.

Corpus mix is keyed on ``doc_id % 16`` (documented per bucket in
``BUCKETS``) so ground-truth expectations are reproducible.  Hosts are drawn
from a Zipf-skewed pool: a few hot hosts own most of the pages, which is what
makes salted repartitioning in plans/pipeline.py testable.

Scale note: generation is ``spark.range(n)`` + ``mapInPandas`` — embarrassingly
parallel, no shuffle, linear in executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .operators.extract import wrap_html

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# ~40 high-frequency words per language; enough signal for the hashed-n-gram
# langid and the word-bigram perplexity model to separate them decisively.
WORDS = {
    "en": (
        "the of and to in is was for that it with as his on be at by this had "
        "not are but from or have an they which one you were her all she there "
        "would their we him been has when who will more no if out so said what"
    ).split(),
    "de": (
        "der die und in den von zu das mit sich des auf für ist im dem nicht "
        "ein eine als auch es an werden aus er hat dass sie nach wird bei einer "
        "um am sind noch wie einem über einen so zum war haben nur oder"
    ).split(),
    "nl": (
        "de van het een en in is dat op te zijn met voor niet aan er om ook als "
        "dan maar bij uit nog naar heeft worden wordt door over ze zich hij had "
        "wat hun meer kan deze werd tot geen toch al waren veel"
    ).split(),
    "fr": (
        "de la le et les des en un du une que est pour qui dans a par plus pas "
        "au sur ne se ce il sont la mais comme ou si nous leur bien être cette "
        "aux avec tout fait son ses dont elle deux"
    ).split(),
}

LANGS = sorted(WORDS)

TOXIC_WORDS = ["frakking", "dagnabbit", "blasted", "gorram"]  # stand-in lexicon

BOILERPLATE = (
    "we use cookies to improve your experience accept all cookies manage "
    "preferences privacy policy terms of service subscribe to our newsletter "
    "sign up log in home about contact copyright all rights reserved"
)

N_HOSTS = 50
BUCKETS = {
    0: "clean_en",
    1: "clean_en",
    2: "clean_en",
    3: "clean_en",
    4: "clean_en",
    5: "clean_en",
    6: "clean_de",
    7: "clean_nl",
    8: "lang_mismatch",  # French text, claimed lang 'en'
    9: "too_short",
    10: "whitespace_padded",
    11: "high_repetition",
    12: "digit_heavy",
    13: "gibberish",
    14: "pii",  # clean English with emails/phones embedded
    15: "boilerplate",
}

_EPOCH_NS = 1_704_067_200_000_000_000  # 2024-01-01T00:00:00Z, fixed (no wall clock)


def _host_weights() -> np.ndarray:
    w = 1.0 / np.arange(1, N_HOSTS + 1) ** 1.2  # Zipf-ish
    return w / w.sum()


_HOST_W = _host_weights()


def _sentence(rng: np.random.Generator, words: list[str], n: int) -> str:
    toks = rng.choice(words, size=n)
    s = " ".join(toks)
    return s[0].upper() + s[1:] + "."


def _clean_text(rng: np.random.Generator, lang: str, n_sentences: int | None = None) -> str:
    n_sentences = n_sentences or int(rng.integers(6, 18))
    return " ".join(
        _sentence(rng, WORDS[lang], int(rng.integers(8, 20))) for _ in range(n_sentences)
    )


def make_page(doc_id: int) -> dict:
    """Generate one page deterministically from its id."""
    rng = np.random.default_rng(doc_id * 2654435761 % (2**63))
    bucket = BUCKETS[doc_id % 16]
    host = f"host{int(rng.choice(N_HOSTS, p=_HOST_W)):02d}.example.com"
    url = f"https://{host}/page/{doc_id}"
    lang = "en"
    if bucket.startswith("clean_"):
        lang = bucket.split("_")[1]
        text = _clean_text(rng, lang)
    elif bucket == "lang_mismatch":
        lang = "en"
        text = _clean_text(rng, "fr")
    elif bucket == "too_short":
        text = _sentence(rng, WORDS["en"], int(rng.integers(2, 6)))
    elif bucket == "whitespace_padded":
        text = "  \t" + _clean_text(rng, "en") + "  \n "
    elif bucket == "high_repetition":
        w = str(rng.choice(WORDS["en"]))
        text = " ".join([w] * int(rng.integers(120, 260)))
    elif bucket == "digit_heavy":
        digits = " ".join(str(int(rng.integers(0, 10**9))) for _ in range(60))
        text = "table of values " + digits
    elif bucket == "gibberish":
        alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        toks = [
            "".join(rng.choice(alphabet, size=int(rng.integers(4, 12))))
            for _ in range(int(rng.integers(80, 160)))
        ]
        text = " ".join(toks)
    elif bucket == "pii":
        base = _clean_text(rng, "en", 8)
        email = f"user{doc_id}@mail{int(rng.integers(10))}.com"
        phone = f"+1-555-{int(rng.integers(100, 999))}-{int(rng.integers(1000, 9999))}"
        tox = TOXIC_WORDS[doc_id % len(TOXIC_WORDS)]
        text = f"{base} Contact {email} or call {phone}. That {tox} offer ends soon."
    elif bucket == "boilerplate":
        text = BOILERPLATE + " " + _clean_text(rng, "en", 2)
    else:  # pragma: no cover
        raise AssertionError(bucket)
    # sprinkle a few hard nulls/empties for the missing/empty rules
    if doc_id % 97 == 13:
        text = None
    elif doc_id % 97 == 29:
        text = ""
    # rich deterministic page (head/title/script/style/comment noise,
    # entity-escaped body) — operators.extract.html_to_text round-trips it
    # byte-identically, which is the north rule's per-url invariant
    html = None if text is None else wrap_html(text, doc_id, title=f"page {doc_id}")
    ts = pd.Timestamp(_EPOCH_NS + doc_id * 60_000_000_000)  # one page a minute
    return {"url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang}


def generate_pages(
    spark: SparkSession, n_docs: int, partitions: int = 32, id_offset: int = 0
) -> DataFrame:
    """Distributed deterministic corpus: spark.range → mapInPandas (no
    shuffle).  ``id_offset`` yields a disjoint doc-id range — a "new crawl
    dump" for incremental-dedup benchmarks."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame([make_page(int(i)) for i in pdf["id"]])

    return spark.range(
        id_offset, id_offset + n_docs, numPartitions=partitions
    ).mapInPandas(gen, PAGES_SCHEMA)


def generate_pages_pandas(n_docs: int) -> pd.DataFrame:
    """Driver-side twin of generate_pages for the pure-Python oracle tests."""
    return pd.DataFrame([make_page(i) for i in range(n_docs)])
