"""textstats, profile and multimodal operator tests."""

import pytest
from pyspark.sql import functions as F

from data_quality_monitoring_spark.datagen import generate_pages
from data_quality_monitoring_spark.operators import multimodal as M
from data_quality_monitoring_spark.operators import profile as P
from data_quality_monitoring_spark.operators import textstats as X


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("one two three",), ("  padded  ",), ("",), (None,), ("hello, world-42!",)], ["t"]
    )
    out = df.select(
        X.token_count(F.col("t")).alias("n"),
        X.bpe_ish_token_count(F.col("t")).alias("b"),
    ).collect()
    assert [r["n"] for r in out] == [3, 1, 0, None, 2]
    # "hello, world-42!" → hello , world - 42 !  = 6 bpe-ish pieces
    assert out[4]["b"] == 6


def test_char_class_ratios(spark):
    df = spark.createDataFrame([("ab12 !",)], ["t"])
    r = df.select(*[v.alias(k) for k, v in X.char_class_ratios(F.col("t")).items()]).collect()[0]
    assert abs(r["digit_ratio"] - 2 / 6) < 1e-9
    assert abs(r["alpha_ratio"] - 2 / 6) < 1e-9
    assert abs(r["symbol_ratio"] - 1 / 6) < 1e-9
    assert abs(r["space_ratio"] - 1 / 6) < 1e-9


def test_quality_score_orders_quality(spark):
    good = "the cat sat on the mat and the dog ran to the park " * 8
    bad = "zz zz zz zz zz"
    df = spark.createDataFrame([(good,), (bad,), (None,)], ["t"])
    s = [r["q"] for r in df.select(X.quality_score(F.col("t")).alias("q")).collect()]
    assert s[0] > s[1] and s[2] is None


def test_fingerprint_normalisation(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world",), ("other",)], ["t"])
    fps = [r["f"] for r in df.select(X.fingerprint(F.col("t")).alias("f")).collect()]
    assert fps[0] == fps[1] != fps[2]
    md5s = [r["f"] for r in df.select(X.fingerprint_md5(F.col("t")).alias("f")).collect()]
    assert md5s[0] == md5s[1] != md5s[2]


def test_profile_operators(spark):
    df = spark.createDataFrame(
        [("Red",), ("red",), (" red ",), ("blue",), (None,)], ["colour"]
    )
    ns = P.null_stats(df, "colour").collect()[0]
    assert (ns["n_rows"], ns["n_notnull"], ns["n_null"], ns["n_distinct"]) == (5, 4, 1, 4)
    vc = P.value_counts(df, "colour", top=2).collect()
    assert vc[0]["n"] == 1  # all singletons; deterministic tiebreak by value
    cv = P.case_variant_groups(df, "colour").collect()
    assert len(cv) == 1 and cv[0]["normalized"] == "red" and cv[0]["n_variants"] == 3
    ws = P.whitespace_variants(df, "colour").collect()[0]
    assert ws["n_whitespace_variants"] == 1


def test_multimodal_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        M.decode_image_bytes(b"abc")


def test_multimodal_pipeline_deterministic(spark):
    pages = generate_pages(spark, 64, partitions=4)
    media = M.pages_to_media(pages)
    meta = M.extract_image_metadata(media, deterministic_fake=True)
    a = meta.toPandas().sort_values("media_id").reset_index(drop=True)
    b = (
        M.extract_image_metadata(M.pages_to_media(generate_pages(spark, 64, partitions=2)),
                                 deterministic_fake=True)
        .toPandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert a.equals(b)  # partition-count invariant
    present = a[a["n_bytes"].notna()]
    assert (present["features"].map(len) == M.FEATURE_DIM).all()
    assert (present["width"] >= 64).all()
    # null payloads flow through as null metadata
    assert a["n_bytes"].isna().sum() == 1  # one injected null html in 64 docs (id 13)


def test_frame_sample_plan(spark):
    pages = generate_pages(spark, 32, partitions=2)
    media = M.pages_to_media(pages).withColumn("kind", F.lit("video"))
    plan = M.frame_sample_plan(media, every_n_seconds=5)
    pdf = plan.toPandas()
    assert (pdf["frame_ts"] % 5 == 0).all()
    assert pdf.groupby("media_id")["frame_ts"].min().eq(0).all()


def test_repetition_stats_pinned(spark):
    """q_repetition_stats kernel on pinned strings: 'a a a b' → top word 3/4,
    top bigram 'a a' 2/3; single word and empty/None degenerate safely."""
    from data_quality_monitoring_spark.entry_queries import q_repetition_stats

    # drive the query's kernel by substituting a documents-shaped frame
    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "x"), (3, ""), (4, None), (5, "p q p q p")],
        ["doc_id", "text"],
    )
    import data_quality_monitoring_spark.entry_queries as EQ

    orig = EQ._read
    EQ._read = lambda spark_, sf_dir, name: df
    try:
        out = {r["doc_id"]: r.asDict() for r in q_repetition_stats(spark, "unused").collect()}
    finally:
        EQ._read = orig
    assert out[1]["n_words"] == 4 and out[1]["n_distinct_words"] == 2
    assert abs(out[1]["top_word_frac"] - 0.75) < 1e-12
    assert abs(out[1]["top_bigram_frac"] - 2 / 3) < 1e-12
    assert out[2]["n_words"] == 1 and out[2]["top_bigram_frac"] is None
    assert out[3]["n_words"] == 0 and out[3]["top_word_frac"] is None
    assert out[4]["n_words"] == 0
    # "p q p q p": top word p=3/5; bigrams pq,qp,pq,qp → top 2/4
    assert abs(out[5]["top_word_frac"] - 0.6) < 1e-12
    assert abs(out[5]["top_bigram_frac"] - 0.5) < 1e-12


def test_normalize_text_unicode(spark):
    """NFC composes decomposed accents; control bytes stripped; \\t\\n kept."""
    import unicodedata

    from data_quality_monitoring_spark.operators.normalize import normalize_text

    decomposed = "café Å"
    rows = [(1, decomposed + "\x01\x02"), (2, "tab\there\nline"), (3, None), (4, "")]
    df = spark.createDataFrame(rows, ["i", "t"])
    out = {r["i"]: r["n"] for r in df.select("i", normalize_text(F.col("t")).alias("n")).collect()}
    assert out[1] == unicodedata.normalize("NFC", decomposed)
    assert "\x01" not in out[1] and len(out[1]) == len(decomposed) - 2
    assert out[2] == "tab\there\nline"  # \t \n survive
    assert out[3] is None and out[4] == ""


def _make_png(pixels, color_type):
    """Minimal PNG encoder (filter 0 rows) for real-decode fixtures."""
    import struct
    import zlib

    h, w = pixels.shape[:2]

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_real_png_bytes():
    import numpy as np

    from data_quality_monitoring_spark.operators.multimodal import decode_image_bytes

    px = np.zeros((3, 5, 3), dtype=np.uint8)
    px[..., 0] = 255  # pure red
    meta = decode_image_bytes(_make_png(px, color_type=2))
    assert (meta["width"], meta["height"], meta["channels"]) == (5, 3, 3)
    f = meta["features"]
    assert abs(f[0] - 5 / 3) < 1e-6  # aspect
    assert abs(f[2] - 1.0) < 1e-6 and abs(f[3]) < 1e-6  # mean R=1, G=0
    # grayscale path
    g = (np.arange(12, dtype=np.uint8) * 20).reshape(3, 4, 1)
    meta_g = decode_image_bytes(_make_png(g, color_type=0))
    assert (meta_g["width"], meta_g["height"], meta_g["channels"]) == (4, 3, 1)
    assert abs(meta_g["features"][2] - g.mean() / 255.0) < 1e-6


def test_decode_png_up_filter():
    """Exercise the non-trivial unfilter path (filter type 2 = Up)."""
    import struct
    import zlib

    import numpy as np

    from data_quality_monitoring_spark.operators.multimodal import _decode_png

    px = np.array([[[10, 20], [30, 40]], [[50, 60], [70, 80]]], dtype=np.uint8)
    h, w, c = px.shape
    row0 = b"\x00" + px[0].tobytes()
    diff = (px[1].astype(int) - px[0].astype(int)) % 256
    row1 = b"\x02" + bytes(diff.astype(np.uint8).tobytes())

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 4, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(row0 + row1))
        + chunk(b"IEND", b"")
    )
    dw, dh, dc, pixels = _decode_png(payload)
    assert (dw, dh, dc) == (w, h, c)
    assert (pixels == px).all()


def test_extract_image_metadata_real_decode(spark):
    import numpy as np

    from data_quality_monitoring_spark.operators.multimodal import (
        extract_image_metadata,
    )

    px = np.full((2, 2, 3), 128, dtype=np.uint8)
    payload = _make_png(px, color_type=2)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), "image/png", "u"), (2, "image", None, None, None)],
        "media_id long, kind string, payload binary, mime string, source_url string",
    )
    rows = {r["media_id"]: r for r in extract_image_metadata(media).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (2, 2, 3)
    assert rows[1]["n_bytes"] == len(payload)
    assert rows[2]["width"] is None  # null payload stays null


def test_resize_images_real_png(spark):
    """resize_images: real PNG bytes → fixed-size raw tensors; corrupt
    payloads yield NULL pixels, not a failed batch."""
    import numpy as np

    from data_quality_monitoring_spark.operators.multimodal import (
        resize_images,
        resize_pixels,
    )

    # 4x6 RGB: left half red, right half green
    px = np.zeros((4, 6, 3), dtype=np.uint8)
    px[:, :3, 0] = 255
    px[:, 3:, 1] = 255
    media = spark.createDataFrame(
        [(1, _make_png(px, color_type=2)), (2, b"not an image"), (3, None)],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in resize_images(media, 2, 2).collect()}
    got = np.frombuffer(bytes(out[1]["pixels"]), dtype=np.uint8).reshape(2, 2, 3)
    assert (got[:, 0] == [255, 0, 0]).all() and (got[:, 1] == [0, 255, 0]).all()
    assert out[1]["channels"] == 3
    assert out[2]["pixels"] is None and out[3]["pixels"] is None

    # pure-numpy kernel agrees with manual nearest-neighbour picks
    small = resize_pixels(px, 3, 2)
    assert small.shape == (2, 3, 3)
    assert (small[0, 0] == [255, 0, 0]).all() and (small[0, 2] == [0, 255, 0]).all()


def test_tfidf_top_terms(spark):
    from data_quality_monitoring_spark.operators.textstats import tfidf_top_terms

    d = spark.createDataFrame(
        [(0, "cat cat cat shared shared"), (1, "dog shared shared"),
         (2, "bird unique words here shared")],
        "doc_id long, text string",
    )
    out = tfidf_top_terms(d, "doc_id", k=2).toPandas()
    top = {r["doc_id"]: r["term"] for _, r in out[out["rank"] == 1].iterrows()}
    assert top == {0: "cat", 1: "dog", 2: "bird"}
    # a term present in every doc has idf ln(1) = 0
    shared = out[(out["term"] == "shared")]["score"]
    assert (shared == 0.0).all()
    # determinism under repartition
    out2 = tfidf_top_terms(d.repartition(7), "doc_id", k=2).toPandas()
    assert sorted(map(tuple, out.values.tolist())) == sorted(map(tuple, out2.values.tolist()))


def test_decode_wav_known_samples():
    """Hand-built PCM16 WAV with known samples decodes to exact features."""
    import io
    import wave

    import numpy as np

    from data_quality_monitoring_spark.operators.multimodal import decode_wav_bytes

    samples = np.array([0, 100, -200, 300, 0, -1], dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(samples.tobytes())
    meta = decode_wav_bytes(buf.getvalue())
    assert meta["sample_rate"] == 16000
    assert meta["channels"] == 1
    assert meta["n_samples"] == 6
    assert meta["peak"] == 300
    assert meta["sum_sq"] == 100**2 + 200**2 + 300**2 + 1
    # sign flips: 100->-200, -200->300 (zeros break the runs elsewhere)
    assert meta["zero_crossings"] == 2
    assert meta["rms"] == (meta["sum_sq"] / 6) ** 0.5
    # stereo payloads decode too (features over the interleaved stream)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(samples.tobytes())
    assert decode_wav_bytes(buf.getvalue())["channels"] == 2


def test_extract_audio_features_guards_corrupt(spark):
    """Real synth WAV decodes distributed; corrupt/NULL rows yield NULL
    features instead of killing the partition."""
    from data_quality_monitoring_spark.operators.multimodal import (
        decode_wav_bytes,
        extract_audio_features,
        synth_wav_bytes,
    )

    wav = synth_wav_bytes(7)
    media = spark.createDataFrame(
        [(7, wav), (8, b"RIFFgarbage"), (9, None)],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in extract_audio_features(media).collect()}
    local = decode_wav_bytes(wav)
    assert out[7]["n_bytes"] == len(wav) == 44 + 2 * local["n_samples"]
    for k in ("sample_rate", "channels", "n_samples", "peak", "sum_sq",
              "zero_crossings", "rms"):
        assert out[7][k] == local[k], k
    assert out[8]["sum_sq"] is None and out[9]["sum_sq"] is None
    # a corrupt payload still reports its byte length (decode-failure
    # telemetry); a NULL payload reports nothing
    assert out[8]["n_bytes"] == len(b"RIFFgarbage") and out[9]["n_bytes"] is None


def test_gopher_signals_line_rules(spark):
    """The line-level Gopher rules (bullets, ellipses, duplicate lines) —
    the contract corpus is single-line, so exercise them here."""
    bullet_doc = "• one thing\n• another thing\n- dashed item\nplain line"
    ellipsis_doc = "first line...\nsecond line…\nthird stays"
    dup_doc = "same line\nsame line\nsame line\nfresh line"
    df = spark.createDataFrame(
        [(1, bullet_doc), (2, ellipsis_doc), (3, dup_doc), (4, None), (5, "")],
        "id long, t string",
    )
    sig = X.gopher_signals(F.col("t"))
    rows = {
        r["id"]: r
        for r in df.select(
            "id", *[v.alias(k) for k, v in sig.items()],
            X.gopher_keep(sig).alias("keep"),
        ).collect()
    }
    assert abs(rows[1]["bullet_line_frac"] - 3 / 4) < 1e-12
    assert abs(rows[2]["ellipsis_line_frac"] - 2 / 3) < 1e-12
    assert abs(rows[3]["dup_line_frac"] - 2 / 4) < 1e-12
    # null/empty text: 0 words, null ratios, keep must be False (never null)
    for i in (4, 5):
        assert rows[i]["n_words"] == 0 and rows[i]["mean_word_len"] is None
        assert rows[i]["keep"] is False
    assert rows[1]["keep"] is False  # fails word count at paper thresholds


def test_gopher_keep_paper_thresholds(spark):
    """A clean English-looking doc passes every paper-default gate; the
    same doc drowned in symbols or stripped of stop words fails exactly
    the targeted conjunct."""
    base = (
        "the quick brown fox jumps over the lazy dog and that have with "
        "be to of words continue here for quite a while longer now "
    ) * 3  # 75 words, mean word length ~4, 8/8 stop words
    symbolic = base + "### ### ### ### ### ### ### ### ### ###"
    df = spark.createDataFrame([(1, base), (2, symbolic)], "id long, t string")
    sig = X.gopher_signals(F.col("t"))
    rows = {
        r["id"]: r
        for r in df.select("id", X.gopher_keep(sig).alias("keep"),
                           *[v.alias(k) for k, v in sig.items()]).collect()
    }
    assert rows[1]["keep"] is True and rows[1]["stop_hits"] == 8
    assert rows[2]["keep"] is False  # hash_word_ratio 30/85 > 0.1
    assert rows[2]["hash_word_ratio"] > 0.1
    # the paper gates each symbol separately: the hash flood must not
    # leak into the ellipsis ratio
    assert rows[2]["ellipsis_word_ratio"] <= 0.1


def test_c4_line_filter_paper_defaults(spark):
    """C4 cleaner at paper-faithful settings: short lines, unterminated
    lines and javascript lines drop; doc flags (brace / lorem ipsum /
    dirty word) condemn the page regardless of surviving lines."""
    from data_quality_monitoring_spark.operators.normalize import (
        c4_keep,
        c4_line_signals,
    )

    good = (
        "This is a perfectly reasonable first sentence of prose.\n"
        "Here is another sentence that carries enough words to count.\n"
        "And a third full sentence so the document survives the gate.\n"
        "short one\n"                                  # <5 words → dropped
        "Please enable javascript to view this page today.\n"  # js → dropped
        "A line without terminal punctuation but plenty of words here"
    )
    braced = good + "\nfunction f() { return 1; }"
    lorem = good + "\nLorem ipsum dolor sit amet, consectetur adipiscing elit."
    dirty = good + "\nWhat a gorram mess this crawl turned out to be."
    df = spark.createDataFrame(
        [(1, good), (2, braced), (3, lorem), (4, dirty), (5, None)],
        "id long, t string",
    )
    sig = c4_line_signals(F.col("t"))
    rows = {
        r["id"]: r
        for r in df.select(
            "id", *[v.alias(k) for k, v in sig.items()],
            c4_keep(sig).alias("keep"),
        ).collect()
    }
    assert rows[1]["n_lines"] == 6 and rows[1]["n_kept_lines"] == 3
    assert rows[1]["keep"] is True
    assert rows[1]["text_clean"].count("\n") == 2  # exactly the 3 kept lines
    assert "javascript" not in rows[1]["text_clean"]
    assert rows[2]["keep"] is False and rows[2]["has_brace"] is True
    assert rows[3]["keep"] is False and rows[3]["has_lorem"] is True
    assert rows[4]["keep"] is False and rows[4]["has_dirty"] is True
    assert rows[5]["keep"] is False and rows[5]["text_clean"] == ""


def test_gopher_repetition_full_family(spark):
    """The non-SQL repetition signals (dup-ngram positional coverage) and
    rep_keep, pinned on crafted fixtures against an independent
    hand-rolled implementation of the documented semantics."""
    P = "alpha beta gamma delta epsilon zeta"
    filler = "one two three four five six seven eight"
    doc_rep = f"{P} {filler} {P}"              # 6-gram repeats, 7-gram doesn't
    # long enough that the (count=1) top n-grams stay under the thresholds
    doc_clean = " ".join(f"w{i:03d}" for i in range(60))
    doc_lines = "dup line\ndup line\nunique one\n\npara\n\npara"
    df = spark.createDataFrame(
        [(1, doc_rep), (2, doc_clean), (3, doc_lines)], "doc_id long, text string"
    )
    from data_quality_monitoring_spark.operators.textstats import (
        GOPHER_REP_THRESHOLDS,
        gopher_repetition,
    )

    rows = {r["doc_id"]: r for r in gopher_repetition(df, "doc_id").collect()}

    def expected_cov(text, n):
        ws = text.split()
        grams = {}
        for i in range(len(ws) - n + 1):
            grams.setdefault(tuple(ws[i:i + n]), []).append(i)
        covered = set()
        for g, pos in grams.items():
            if len(pos) > 1:
                for i in pos:
                    covered.update(range(i, i + n))
        ch = sum(len(ws[i]) for i in covered)
        ch += sum(1 for i in covered if i + 1 in covered)
        return ch / len(text)

    for n in range(5, 11):
        assert rows[1][f"dup_{n}gram_char_frac"] == pytest.approx(
            expected_cov(doc_rep, n), abs=0
        ), n
        assert rows[2][f"dup_{n}gram_char_frac"] == 0.0
    # the repeated 6-word phrase covers both copies at n=5 and n=6 …
    assert rows[1]["dup_6gram_char_frac"] > GOPHER_REP_THRESHOLDS["dup_6gram_char_frac"]
    # … and nothing at n=7 (every 7-gram crosses into unique filler)
    assert rows[1]["dup_7gram_char_frac"] == 0.0
    assert rows[1]["rep_keep"] is False and rows[2]["rep_keep"] is True
    # line/para tier: 4 of 5 line OCCURRENCES belong to a repeated value
    # (occurrence-counting — NOT gopher_signals' (n-distinct)/n definition,
    # which shares the column name); paragraphs split on blank lines →
    # ("dup line\ndup line\nunique one", "para", "para")
    assert rows[3]["dup_line_frac"] == pytest.approx(4 / 5)
    assert rows[3]["dup_para_frac"] == pytest.approx(2 / 3)


def test_gopher_repetition_vectorized_kernel_edges(spark):
    """Edge cases of the r6 vectorized n-gram kernel: top-gram tie-break
    (count tie resolved by CHAR length), single-gram docs (L == n), and
    multi-block coverage with adjacent covered runs — each checked against
    hand-computed values of the documented semantics."""
    from data_quality_monitoring_spark.operators.textstats import gopher_repetition

    # doc 1: 2-gram tie at count 2 — "aa bb" (len 5) vs "cc dddd" (len 7);
    # tie-break picks the LONGER joined string → top = 2*7/len
    t1 = "aa bb cc dddd aa bb cc dddd"
    # doc 2: exactly five words — the lone 5-gram has count 1 → dup5 = 0.0,
    # 6..10-grams impossible → None
    t2 = "v w x y z"
    # doc 3: two disjoint repeated 5-gram families, adjacent coverage runs
    # merge: "p q r s t" ×2 and "m n o u k" ×2 back-to-back
    t3 = "p q r s t m n o u k p q r s t m n o u k"
    df = spark.createDataFrame(
        [(1, t1), (2, t2), (3, t3)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in gopher_repetition(df, "doc_id").collect()}
    assert rows[1]["top_2gram_char_frac"] == pytest.approx(2 * 7 / len(t1), abs=0)
    assert rows[2]["dup_5gram_char_frac"] == 0.0
    assert rows[2]["dup_6gram_char_frac"] is None
    assert rows[2]["dup_10gram_char_frac"] is None
    # every word position of t3 is covered at n=5 (both families repeat);
    # chars = 20 single-char words + 19 internal single spaces
    assert rows[3]["dup_5gram_char_frac"] == pytest.approx((20 + 19) / len(t3), abs=0)
    # at n=10 the repeated 10-gram "p..k" covers everything too
    assert rows[3]["dup_10gram_char_frac"] == pytest.approx((20 + 19) / len(t3), abs=0)
