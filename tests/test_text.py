"""Language-ID heuristic over real multilingual strings.

The registry `lang_id` query runs deterministic marker rules on the
shared-vocabulary synthetic corpus (so its DuckDB oracle replays
exactly); THIS file exercises the real stopword-profile scorer on
actual language samples."""

from __future__ import annotations

import pytest

from palegislature_spark.functions.text import LANG_PROFILES, lang_id_profile
from pyspark.sql import functions as F

SAMPLES = [
    ("en", "the cat sat on the mat and it was pleased with the warm sun of the morning"),
    ("en", "this is a test of the language detector that should be easy for it to get"),
    ("de", "der hund und die katze sind nicht in dem haus denn das wetter ist zu kalt"),
    ("de", "das ist ein einfacher satz mit den typischen wörtern von einer sprache"),
    ("fr", "le chat est dans la maison et les oiseaux ne sont pas dans le jardin pour le moment"),
    ("fr", "c'est une phrase simple avec des mots que la langue utilise pour les tests"),
    ("es", "el perro y el gato no son los animales que viven en la casa por una semana"),
    ("es", "es una frase sencilla con las palabras que el idioma usa para las pruebas"),
]


def test_lang_id_profile_classifies_samples(spark):
    df = spark.createDataFrame(SAMPLES, "want string, text string").withColumn(
        "got", lang_id_profile("text")
    )
    wrong = [(r["want"], r["got"], r["text"][:40]) for r in df.collect() if r["want"] != r["got"]]
    assert wrong == []


def test_lang_id_profile_undetermined_and_ties(spark):
    df = spark.createDataFrame(
        [(1, "zzz qqq xxx www"), (2, "")], "i long, text string"
    ).withColumn("got", lang_id_profile("text"))
    got = {r["i"]: r["got"] for r in df.collect()}
    assert got[1] == "und"
    assert got[2] == "und"
    # tie break: 'la' is in both fr and es profiles; profile order wins
    tie = spark.createDataFrame([("la",)], "text string").withColumn(
        "got", lang_id_profile("text")
    )
    assert tie.collect()[0]["got"] == "fr"


def test_profiles_shape():
    assert set(LANG_PROFILES) == {"en", "de", "fr", "es"}
    assert all(len(v) >= 10 for v in LANG_PROFILES.values())


def test_bigram_quality_flags_gibberish(spark, tmp_path):
    """Documents of rare bigrams (mojibake/gibberish) must score far
    below natural-text documents on both signals."""
    import pyspark.sql.functions as F
    from palegislature_spark.queries.text import bigram_lm_quality

    natural = "the cat sat on the mat and the dog ran to the man " * 4
    docs = spark.createDataFrame(
        [(i, natural) for i in range(9)] + [(9, "zq xj vk wz qz jx kq zv " * 8)],
        "doc_id long, text string",
    )
    sf = str(tmp_path)
    docs.write.parquet(f"{sf}/documents.parquet")
    out = {r["doc_id"]: r for r in bigram_lm_quality(spark, sf).collect()}
    assert out[9]["avg_bigram_freq"] < out[0]["avg_bigram_freq"] / 3
    # coverage saturates on a tiny corpus (< 200 distinct bigrams total);
    # it discriminates only on real-sized corpora — just sanity-bound it
    assert 0.0 <= out[9]["top_coverage"] <= out[0]["top_coverage"] <= 1.0


def test_pii_redaction_planted(spark):
    """Planted PII of every kind is counted and redacted; clean text
    passes through byte-identical."""
    from palegislature_spark.functions import pii

    df = spark.createDataFrame(
        [
            (1, "contact bob.smith+x@corp.example.org or 555-123-4567"),
            (2, "server at 192.168.1.100 and backup 10.0.0.1"),
            (3, "totally clean prose with no identifiers"),
            (4, "two mails a@b.io c@d.co and phone 123 456 7890"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            pii.pii_count("text", "email").alias("e"),
            pii.pii_count("text", "phone").alias("p"),
            pii.pii_count("text", "ip").alias("i"),
            pii.redact_pii("text").alias("red"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["p"]) == (1, 1)
    assert out[1]["red"] == "contact <EMAIL> or <PHONE>"
    assert out[2]["i"] == 2 and out[2]["red"] == "server at <IP> and backup <IP>"
    assert out[3]["red"] == "totally clean prose with no identifiers"
    assert (out[4]["e"], out[4]["p"]) == (2, 1)


def test_cms_overestimates_and_merges(spark):
    """Count-min invariants: estimate >= truth for every token, and the
    sum of two partition sketches equals the sketch of the union (the
    mergeability that makes it a distributed/streaming aggregate)."""
    import pyspark.sql.functions as F
    from palegislature_spark.operators import sketch

    words = [w for i in range(200) for w in (f"w{i % 37}", f"rare{i}")]
    df = spark.createDataFrame([(w,) for w in words], "token string")
    cms = sketch.cms_sketch(df)
    truth = df.groupBy("token").agg(F.count("*").alias("cnt"))
    est = sketch.cms_estimate(cms, truth.select("token"))
    joined = truth.join(est, "token").collect()
    assert len(joined) == truth.count()
    assert all(r["est"] >= r["cnt"] for r in joined)

    half_a = spark.createDataFrame([(w,) for w in words[:200]], "token string")
    half_b = spark.createDataFrame([(w,) for w in words[200:]], "token string")
    merged = (
        sketch.cms_sketch(half_a)
        .unionByName(sketch.cms_sketch(half_b))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = {(r["row"], r["bucket"]): r["cnt"] for r in cms.collect()}
    got = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert got == whole


def test_repetition_stats_flags_repeats(spark, tmp_path):
    from palegislature_spark.queries.text import analyze_repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),         # one token
            (2, "buy now buy now buy now buy now"),       # repeated bigram
            (3, "each word here appears just once today"),
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    out = {r["doc_id"]: r for r in analyze_repetition_stats(spark, str(tmp_path)).collect()}
    assert out[1]["top_token_ratio"] == 1.0
    assert out[1]["dup_2gram_ratio"] == 1.0 - 1 / 5
    assert out[2]["dup_2gram_ratio"] > 0.5
    assert out[3]["dup_2gram_ratio"] == 0.0
    assert out[3]["top_token_ratio"] == 1 / 7


def test_bloom_no_false_negatives_and_merges(spark):
    import pyspark.sql.functions as F
    from palegislature_spark.operators import sketch

    present = spark.createDataFrame([(i,) for i in range(0, 800, 2)], "k long")
    absent = spark.createDataFrame([(i,) for i in range(1, 800, 2)], "k long")
    bloom = sketch.bloom_build(present, "k")
    hits_p = sketch.bloom_might_contain(bloom, present, "k").collect()
    assert all(r["might_contain"] for r in hits_p)  # never a false negative
    hits_a = sketch.bloom_might_contain(bloom, absent, "k").collect()
    fp = sum(r["might_contain"] for r in hits_a) / len(hits_a)
    assert fp < 0.5  # 400 keys / 4096 bits, k=3: well under coin-flip

    # mergeability: bit_or of two half filters == filter of the union
    h1 = spark.createDataFrame([(i,) for i in range(0, 400, 2)], "k long")
    h2 = spark.createDataFrame([(i,) for i in range(400, 800, 2)], "k long")
    merged = (
        sketch.bloom_build(h1, "k")
        .unionByName(sketch.bloom_build(h2, "k"))
        .groupBy("word")
        .agg(F.bit_or("bits").alias("bits"))
    )
    whole = {(r["word"], r["bits"]) for r in bloom.collect()}
    assert {(r["word"], r["bits"]) for r in merged.collect()} == whole


def test_text_chunks_cover_and_overlap(spark, tmp_path):
    from palegislature_spark.queries.text import chunk_documents

    long = " ".join(f"t{i}" for i in range(300))
    docs = spark.createDataFrame(
        [(1, long), (2, "short doc"), (3, "")],
        "doc_id long, text string",
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    out = chunk_documents(spark, str(tmp_path)).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 300 tokens, stride 96: starts 0,96,192,288 -> 4 chunks
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    assert [r["start_token"] for r in c1] == [0, 96, 192, 288]
    assert [r["n_chunk_tokens"] for r in c1] == [128, 128, 108, 12]
    # 32-token overlap: chunk 1 starts inside chunk 0's window
    assert c1[0]["chunk_text"].split()[96:] == c1[1]["chunk_text"].split()[:32]
    # reconstruction: stride-sized prefixes + final tail = original
    toks = []
    for r in c1[:-1]:
        toks.extend(r["chunk_text"].split()[:96])
    toks.extend(c1[-1]["chunk_text"].split())
    assert toks == long.split()
    assert [r["n_chunk_tokens"] for r in by_doc[2]] == [2]
    assert 3 not in by_doc  # empty text yields no chunks


def test_source_gate_suppresses_bad_domain(spark, tmp_path):
    """Planted sources: one clean, one full of short docs, one
    stopword-stuffed — the gate must suppress exactly the bad two,
    and every document must carry its source's verdict."""
    good = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    rows = (
        [(i, good, "en", "clean", len(good)) for i in range(4)]
        + [(10 + i, "too short", "en", "shorty", 9) for i in range(4)]
        + [(20 + i, "the a of and " * 3 + good, "en", "stuffed", 1) for i in range(4)]
    )
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(f"{tmp_path}/documents.parquet")
    from palegislature_spark.queries.corpus import source_level_gate

    out = {r.doc_id: r for r in source_level_gate(spark, str(tmp_path)).collect()}
    assert len(out) == 12
    assert all(out[i].source_kept for i in range(4))
    assert not out[10].source_kept  # short_share = 1.0
    assert not out[20].source_kept  # stop rate 12/24 = 0.5
    assert out[10].source_docs == 4 and out[10].short_share == 1.0


def test_bigram_fallback_equals_collected(spark, tmp_path):
    """The >200k-distinct-bigram declarative fallback must be
    bit-identical to the collected-broadcast path (VERDICT r7 #2).

    The corpus is built so the top-200 election CUTS THROUGH A TIE
    PLATEAU (hundreds of distinct bigrams at freq=1), so any tie-break
    divergence between the driver-side sort (-freq, bg) and the
    declarative orderBy(desc freq, bg) window changes top_coverage —
    and includes non-ASCII codepoints so packed-code ordering is
    exercised, not just ASCII."""
    from palegislature_spark.queries.text import _bigram_lm_quality

    # ~26*26 unique-once bigrams (tie plateau) + repeated natural text
    # + non-ASCII (Latin-1 accents, CJK) docs
    plateau = " ".join(
        chr(ord("a") + i) + chr(ord("a") + j)
        for i in range(26)
        for j in range(26)
    )
    rows = (
        [(0, plateau)]
        + [(i, "the cat sat on the mat ") for i in range(1, 5)]
        + [(5, "éèêëàâäüöß éèa 中文字 中中")]
    )
    sf = str(tmp_path)
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    collected = sorted(
        _bigram_lm_quality(spark, sf).collect(), key=lambda r: r["doc_id"]
    )
    fallback = sorted(
        _bigram_lm_quality(spark, sf, collect_guard=0).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [tuple(r) for r in collected] == [tuple(r) for r in fallback]
    # the plateau really is wider than the top-200 cut
    assert len(plateau.split()) > 200


def test_bigram_packed_codes_nonascii(spark):
    """ADVICE r7: the packed-bigram rewrite assumes split(text, '')
    splits on CODEPOINTS and ascii() returns the full Unicode
    codepoint (not the first byte / UTF-16 unit). Pin both on
    non-ASCII input: packed codes must be injective over distinct
    bigrams and ordered exactly like Python's codepoint (== UTF-8
    byte) string order, which is what the oracle's string sort uses."""
    import pyspark.sql.functions as F

    # astral plane (surrogate pair in UTF-16) + CJK + Latin-1 + ASCII
    chars = ["a", "z", "é", "è", "ß", "中", "文", "\U0001F600"]
    bigrams = sorted({c1 + c2 for c1 in chars for c2 in chars})
    df = spark.createDataFrame([(b,) for b in bigrams], "bg string")
    got = (
        df.withColumn("cs", F.split("bg", ""))
        .withColumn(
            "code",
            F.expr(
                "CAST(ascii(cs[0]) AS BIGINT) * 2097152 + ascii(cs[1])"
            ),
        )
        .select("bg", "code", F.size("cs").alias("n"))
        .collect()
    )
    # split on codepoints: every 2-codepoint bigram yields exactly 2 cells
    assert {r["n"] for r in got} == {2}
    code_of = {r["bg"]: r["code"] for r in got}
    # injective over distinct bigrams
    assert len(set(code_of.values())) == len(bigrams)
    # packed-code order == codepoint string order (the oracle's order)
    assert sorted(bigrams, key=lambda b: code_of[b]) == bigrams
    # and ascii() really returns full codepoints, not first bytes
    assert code_of["中文"] == ord("中") * 2097152 + ord("文")


def test_quality_classifier_known_weights(spark, tmp_path):
    """Hand-checked milliweights: score_milli is the exact sum of the
    per-token hashed weights, `kept` is the integer-rewritten
    score >= 0.01 comparison, and the plan is map-only (zero shuffle
    exchanges) — the hashing trick must not introduce a join."""
    import hashlib

    def milli(w: str) -> int:
        return int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 2001 - 1000

    rows = [
        (1, "hello a b", "en", "s", 9),
        (2, "hello hello hello", "en", "s", 17),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.parquet(f"{tmp_path}/documents.parquet")
    from palegislature_spark.queries.text import classifier_quality_score

    res = classifier_quality_score(spark, str(tmp_path))
    out = {r.doc_id: r for r in res.collect()}
    exp1 = milli("hello") + milli("a") + milli("b")
    assert out[1].score_milli == exp1
    assert out[1].score == exp1 / 3000.0
    assert out[1].kept == (exp1 * 100 >= 3000)
    assert out[2].score_milli == 3 * milli("hello")
    # milli("hello") = 467 > 10 per token, so doc 2 clears tau = 0.01
    assert out[2].kept
    plan = res._sc._jvm.PythonSQLUtils.explainString(
        res._jdf.queryExecution(), "formatted"
    )
    import re

    assert not re.findall(r"\bExchange\b", plan), "classifier scan must be map-only"


def test_weighted_epoch_copies_dense_and_bounded(spark, sf_dir):
    """cluster_weighted_epoch invariants the oracle hash can't state
    directly: copy indices are dense 1..n per doc; every doc's copy
    count is floor(eff) or floor(eff)+1 for eff = repeat_factor *
    (1/cluster_size); and a doc's copies never exceed its domain's
    ceil(repeat_factor) (weight <= 1 only shrinks the rate)."""
    import pyspark.sql.functions as F

    from palegislature_spark.queries.corpus import domain_mixture_weights
    from palegislature_spark.queries.text import (
        cluster_soft_dedup,
        cluster_weighted_epoch,
    )

    out = cluster_weighted_epoch(spark, sf_dir)
    per_doc = out.groupBy("doc_id", "cluster_size").agg(
        F.count(F.lit(1)).alias("n"), F.max("copy_idx").alias("mx"),
        F.min("copy_idx").alias("mn"),
    )
    bad_dense = per_doc.filter("n != mx OR mn != 1").count()
    assert bad_dense == 0

    rf = {r.source: r.repeat_factor
          for r in domain_mixture_weights(spark, sf_dir).collect()}
    soft = {r.doc_id: r.cluster_size
            for r in cluster_soft_dedup(spark, sf_dir).collect()}
    import math
    for r in per_doc.join(
        out.select("doc_id", "source").distinct(), "doc_id"
    ).collect():
        eff = rf[r.source] * (1.0 / soft[r.doc_id])
        assert r.n in (math.floor(eff), math.floor(eff) + 1), (r.doc_id, eff, r.n)
