"""Sequence packing: determinism, budget bounds, contiguity."""

import pandas as pd
from pyspark.sql import functions as F

from data_quality_monitoring_spark.datagen import generate_pages
from data_quality_monitoring_spark.operators.packing import pack_documents, pack_stats

# larger than any datagen doc's token count (~266 max): the contiguity
# assertion below is only a theorem of offset packing when no document
# straddles a whole budget window
BUDGET = 512


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


def test_packing_oracle_parity_on_boundary_whitespace(spark, tmp_path):
    """The tokenizer-parity case the driver corpus never exercises: texts
    with leading/trailing \\t/\\n must count identically in the engine
    (textstats.words, _WS-class strip) and the DuckDB oracle SQL."""
    import duckdb
    import pandas as pd

    from data_quality_monitoring_spark.entry_queries import (
        SQL_SEQUENCE_PACKING,
        q_sequence_packing,
    )

    pdf = pd.DataFrame(
        {
            "doc_id": range(8),
            "lang": ["en"] * 8,
            "text": [
                "\tfoo bar", "baz\n", "  \t  ", "\x0b", "a\fb", "plain words here",
                None, "trail  \n ",
            ],
            "source": ["s"] * 8,
            "n_chars": [0] * 8,
        }
    )
    (tmp_path / "d").mkdir()
    spark.createDataFrame(pdf).write.parquet(str(tmp_path / "d" / "documents.parquet"))

    got = (
        q_sequence_packing(spark, str(tmp_path / "d"))
        .toPandas().sort_values(["lang", "shard", "pack_id"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        # Spark writes a parquet DIRECTORY; glob its part files for DuckDB
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/d/documents.parquet/*.parquet')"
    )
    want = (
        con.execute(SQL_SEQUENCE_PACKING).df()
        .sort_values(["lang", "shard", "pack_id"]).reset_index(drop=True)
    )
    assert got.n_docs.sum() == 5  # '  \t  ', '\x0b' and None are token-free
    assert list(got.total_tokens) == list(want.total_tokens)
    assert list(got.n_docs) == list(want.n_docs)
    assert list(got.min_doc) == list(want.min_doc)


def test_bpe_train_and_greedy_count():
    from data_quality_monitoring_spark.operators.bpe import (
        greedy_piece_count,
        train_bpe_pieces,
    )

    pieces = train_bpe_pieces(["aa ab aa ab aa", "aa b aa"], n_merges=3)
    assert "aa" in pieces  # most frequent pair merges first
    assert pieces == train_bpe_pieces(["aa ab aa ab aa", "aa b aa"], n_merges=3)
    ps, ml = frozenset(pieces), max(len(p) for p in pieces)
    assert greedy_piece_count("aa", ps, ml) == 1
    assert greedy_piece_count("aaa", ps, ml) == 2  # aa + a
    assert greedy_piece_count("zzz", ps, ml) == 3  # unseen chars: 1 each


def test_bpe_token_count_column(spark):
    from data_quality_monitoring_spark.operators.bpe import bpe_token_count

    df = spark.createDataFrame(
        [(1, "aa aaa zz"), (2, None), (3, "   ")], "id long, text string"
    )
    out = {
        r["id"]: r["n"]
        for r in df.select(
            "id", bpe_token_count(F.col("text"), ["aa", "a", "z"]).alias("n")
        ).collect()
    }
    assert out[1] == 1 + 2 + 2  # aa | aa+a | z+z
    assert out[2] is None and out[3] == 0


def test_bpe_frozen_artifact_deterministic():
    from data_quality_monitoring_spark.artifacts import get_bpe_pieces
    from data_quality_monitoring_spark.operators.bpe import train_bpe_pieces
    from data_quality_monitoring_spark.artifacts import training_texts, LANGS

    texts = [t for lang in LANGS for t in training_texts(lang, 50)]
    assert tuple(train_bpe_pieces(texts, n_merges=200)) == get_bpe_pieces()


def test_bpe_distributed_training_matches_local(spark):
    """The distributed trainer is bit-identical to the local one when
    max_words covers the vocabulary (same _words kernel, same merge loop),
    stays identical under repartition, and the min_count floor drops
    singleton words from the frequency table before the merge loop."""
    from data_quality_monitoring_spark.artifacts import LANGS, training_texts
    from data_quality_monitoring_spark.operators.bpe import (
        _words,
        train_bpe_distributed,
        train_bpe_pieces,
    )

    texts = [t for lang in LANGS for t in training_texts(lang, 30)]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    local = train_bpe_pieces(texts, n_merges=60)
    assert train_bpe_distributed(docs, n_merges=60) == local
    assert train_bpe_distributed(docs.repartition(7), n_merges=60) == local

    # min_count floor reproduces a locally-floored frequency table
    from collections import Counter

    wf = Counter(w for t in texts for w in _words(t))
    from data_quality_monitoring_spark.operators.bpe import _merge_loop

    floored = _merge_loop({w: n for w, n in wf.items() if n >= 3}, 60)
    assert train_bpe_distributed(docs, n_merges=60, min_count=3) == floored

    # max_words keeps the driver collect bounded: the cut is the top of
    # the (count desc, word asc) order, same as cutting the local table
    top = dict(sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:40])
    assert train_bpe_distributed(docs, n_merges=60, max_words=40) == _merge_loop(top, 60)


def test_shuffle_shards_deterministic_and_partition_invariant(spark):
    """(shard, shard_pos) is a pure function of (key, seed): identical
    across input partitionings, different under a different seed."""
    from data_quality_monitoring_spark.operators.packing import shuffle_shards

    rows = [(f"https://h{i % 7}.example.com/p/{i}",) for i in range(300)]
    a = spark.createDataFrame(rows, "url string").repartition(2)
    b = spark.createDataFrame(rows, "url string").repartition(13)

    out_a = {r["url"]: (r["shard"], r["shard_pos"])
             for r in shuffle_shards(a, "url", n_shards=8, seed=0).collect()}
    out_b = {r["url"]: (r["shard"], r["shard_pos"])
             for r in shuffle_shards(b, "url", n_shards=8, seed=0).collect()}
    assert out_a == out_b

    reseeded = {r["url"]: (r["shard"], r["shard_pos"])
                for r in shuffle_shards(a, "url", n_shards=8, seed=1).collect()}
    assert reseeded != out_a

    # positions are dense 0..n-1 within every shard
    from collections import defaultdict

    by_shard = defaultdict(list)
    for shard, pos in out_a.values():
        by_shard[shard].append(pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))


def test_shuffle_shards_breaks_host_locality(spark):
    """Input arrives grouped by host; shard-order reading must interleave
    hosts (adjacent-same-host rate collapses from 1.0 to ~1/n_hosts)."""
    import pyspark.sql.functions as F

    from data_quality_monitoring_spark.operators.packing import shuffle_shards

    n_hosts, per_host = 10, 60
    rows = [
        (f"https://h{h}.example.com/p/{i}", f"h{h}")
        for h in range(n_hosts)
        for i in range(per_host)
    ]
    df = spark.createDataFrame(rows, "url string, host string")
    out = (
        shuffle_shards(df, "url", n_shards=4, seed=0)
        .orderBy("shard", "shard_pos")
        .select("host")
        .collect()
    )
    hosts = [r["host"] for r in out]
    same_adjacent = sum(a == b for a, b in zip(hosts, hosts[1:])) / (len(hosts) - 1)
    assert same_adjacent < 0.3  # sorted input would be ~0.98


def test_materialize_packs_order_and_totals(spark):
    """Pack text concatenates members in window (key) order with the
    separator; totals match the assignment; partitioning-invariant."""
    import pyspark.sql.functions as F

    from data_quality_monitoring_spark.operators.packing import (
        materialize_packs,
        pack_documents,
    )

    rows = [(f"k{i:03d}", "w " * (i % 5 + 1)) for i in range(40)]
    df = spark.createDataFrame(rows, "k string, text string")
    packed = pack_documents(df, "k", budget=8, n_shards=2)
    out = materialize_packs(packed, "k", sep="\x1e")
    chk = {(r["shard"], r["pack_id"]): r for r in out.collect()}

    exp = {}
    for r in packed.orderBy("k").collect():
        e = exp.setdefault((r["shard"], r["pack_id"]), {"texts": [], "tok": 0})
        e["texts"].append(r["text"])
        e["tok"] += r["n_tokens"]
    assert set(chk) == set(exp)
    for kk, e in exp.items():
        assert chk[kk]["pack_text"] == "\x1e".join(e["texts"])
        assert chk[kk]["total_tokens"] == e["tok"]
        assert chk[kk]["n_docs"] == len(e["texts"])

    again = materialize_packs(
        pack_documents(df.repartition(7), "k", budget=8, n_shards=2), "k", sep="\x1e"
    )
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in out.collect()}


def test_bpe_encode_ids_consistent_with_counts(spark):
    """The id stream's length equals the frozen-BPE token count doc by doc,
    and ids are within the vocab (or the -1 unknown sentinel)."""
    from pyspark.sql import functions as F

    from data_quality_monitoring_spark.artifacts import get_bpe_pieces
    from data_quality_monitoring_spark.operators.bpe import (
        bpe_encode_ids,
        bpe_token_count,
        piece_id_table,
    )

    pieces = list(get_bpe_pieces())
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = d.select(
        "doc_id",
        bpe_token_count(F.col("text"), pieces).alias("n"),
        bpe_encode_ids(F.col("text"), pieces).alias("ids"),
    ).toPandas()
    vocab = len(piece_id_table(pieces))
    for _, r in out.iterrows():
        if r["n"] is None:
            assert r["ids"] is None
            continue
        assert len(r["ids"]) == r["n"]
        assert all(-1 <= i < vocab for i in r["ids"])


def test_chunk_documents_covers_every_word_once_minimally(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from data_quality_monitoring_spark.operators.packing import chunk_documents

    texts = [
        (0, " ".join(f"w{i}" for i in range(200))),
        (1, "one two"),
        (2, None),
        (3, "   \t "),
        (4, " ".join(f"x{i}" for i in range(64))),  # exactly one chunk
        (5, " ".join(f"y{i}" for i in range(65))),  # one word past the budget
    ]
    d = spark.createDataFrame(texts, "doc_id long, text string")
    out = chunk_documents(d, "doc_id", chunk_words=64, overlap=8).toPandas()
    assert set(out["doc_id"]) == {0, 1, 4, 5}  # null/ws-only yield nothing
    by_doc = {k: g.sort_values("chunk_id") for k, g in out.groupby("doc_id")}
    # full coverage with the declared overlap: chunk i starts at i*(64-8)
    g = by_doc[0]
    assert g["start_word"].tolist() == [0, 56, 112, 168]
    assert g["n_words"].tolist() == [64, 64, 64, 32]
    words = texts[0][1].split()
    rebuilt = g.iloc[0]["chunk_text"].split()
    for _, row in g.iloc[1:].iterrows():
        rebuilt.extend(row["chunk_text"].split()[8:])  # drop the overlap
    assert rebuilt == words
    assert len(by_doc[4]) == 1 and by_doc[4].iloc[0]["n_words"] == 64
    assert by_doc[5]["n_words"].tolist() == [64, 9]  # trailing chunk adds y56..y64
    # partitioning invariance
    out2 = chunk_documents(d.repartition(5), "doc_id", chunk_words=64, overlap=8).toPandas()
    assert sorted(map(tuple, out.values.tolist())) == sorted(map(tuple, out2.values.tolist()))
    with _pytest.raises(ValueError):
        chunk_documents(d, "doc_id", chunk_words=8, overlap=8)
