"""Text-analysis expression tests."""

from pyspark.sql import functions as F

from spectrify_spark.functions import text as TX


def _one(spark, s, expr):
    return spark.createDataFrame([(s,)], ["t"]).select(expr.alias("v")).collect()[0].v


def test_token_count(spark):
    assert _one(spark, "  the quick  brown fox ", TX.token_count(F.col("t"))) == 4
    assert _one(spark, "", TX.token_count(F.col("t"))) == 0


def test_bpe_token_count_splits_symbols(spark):
    assert _one(spark, "ab 12, c", TX.bpe_token_count(F.col("t"))) == 4


def test_stopword_ratio(spark):
    v = _one(spark, "the dog and the cat", TX.stopword_ratio(F.col("t")))
    assert abs(v - 3 / 5) < 1e-9


def test_lang_id_markers(spark):
    assert _one(spark, "the cat is on the mat and it is happy", TX.lang_id(F.col("t"))) == "en"
    assert _one(spark, "der hund und die katze das ist gut", TX.lang_id(F.col("t"))) == "de"
    assert _one(spark, "zzz qqq", TX.lang_id(F.col("t"))) == "unknown"


def test_fingerprint_order_insensitive(spark):
    a = _one(spark, "alpha beta gamma", TX.fingerprint(F.col("t")))
    b = _one(spark, "gamma alpha beta beta", TX.fingerprint(F.col("t")))
    c = _one(spark, "alpha beta delta", TX.fingerprint(F.col("t")))
    assert a == b
    assert a != c


def test_shingles(spark):
    v = _one(spark, "a b c d", TX.shingles(F.col("t"), 3))
    assert v == ["a b c", "b c d"]
    short = _one(spark, "a b", TX.shingles(F.col("t"), 3))
    assert short == ["a b"]


def test_hash_split_stable_and_complete(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], ["id"])
    out = df.select("id", TX.split_assign(F.col("id")).alias("s"))
    counts = {r.s: r.n for r in out.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 1000
    assert 700 < counts["train"] < 900  # ~80%
    # stability: same key -> same split on re-evaluation
    again = {r.id: r.s for r in out.collect()}
    twice = {
        r.id: r.s
        for r in df.select("id", TX.split_assign(F.col("id")).alias("s")).collect()
    }
    assert again == twice


def test_quality_score_bounds(spark):
    good = _one(
        spark,
        "the quick brown fox jumps over the lazy dog and runs to the forest again",
        TX.quality_score(F.col("t")),
    )
    bad = _one(spark, "!!! ??? ***", TX.quality_score(F.col("t")))
    assert good > bad
    assert 0.0 <= bad <= good <= 1.0


def test_pii_redact_all_kinds(spark):
    s = ("write to jane.doe+x@mail.example.org from 192.168.1.10 "
         "ssn 123-45-6789 call 555-123-4567")
    v = _one(spark, s, TX.pii_redact(F.col("t")))
    assert v == "write to <EMAIL> from <IPV4> ssn <SSN> call <PHONE>"


def test_pii_redact_leaves_clean_text(spark):
    s = "nothing sensitive here 12-34 a.b"
    assert _one(spark, s, TX.pii_redact(F.col("t"))) == s


def test_pii_count(spark):
    s = "a@b.co and c@d.org but not at-sign alone @"
    assert _one(spark, s, TX.pii_count(F.col("t"), "email")) == 2
    assert _one(spark, s, TX.pii_count(F.col("t"), "ipv4")) == 0


def test_char_entropy_values(spark):
    # uniform 4-char alphabet -> exactly 2 bits
    assert _one(spark, "abcd", TX.char_entropy(F.col("t"))) == 2.0
    # constant string -> 0 bits
    assert _one(spark, "aaaa", TX.char_entropy(F.col("t"))) == 0.0
    # empty -> NULL
    assert _one(spark, "", TX.char_entropy(F.col("t"))) is None
    # natural-ish text sits between 0 and log2(distinct chars)
    v = _one(spark, "the quick brown fox", TX.char_entropy(F.col("t")))
    assert 2.0 < v < 5.0


def test_flesch_ease_hand_computation(spark):
    """One sentence, hand-countable vowel groups: 'the cat sat.' ->
    words=3, sentences=1, syllable groups e/a/a = 3."""
    from pyspark.sql import functions as F

    from spectrify_spark.functions.text import flesch_ease

    df = spark.createDataFrame([("the cat sat.",), ("",), (None,)], "t string")
    out = df.select(flesch_ease(F.col("t")).alias("f")).collect()
    expected = round(206.835 - 1.015 * 3 / 1 - 84.6 * 3 / 3, 4)
    assert out[0]["f"] == expected
    # empty and NULL text -> NULL score, not a crash or a zero
    assert out[1]["f"] is None
    assert out[2]["f"] is None


def test_flesch_ease_sentence_floor(spark):
    """Punctuation-free text must not divide by zero: sentences
    floors at 1, so the score equals the one-sentence formula."""
    from pyspark.sql import functions as F

    from spectrify_spark.functions.text import flesch_ease

    df = spark.createDataFrame([("no punctuation here",)], "t string")
    (row,) = df.select(flesch_ease(F.col("t")).alias("f")).collect()
    assert row["f"] is not None
