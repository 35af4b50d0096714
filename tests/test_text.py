"""Text-analysis function tests."""

from pyspark.sql import functions as F

from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_stats,
    tokens,
    word_shingles,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).first().v


def test_tokens_whitespace_and_case(spark):
    assert _one(spark, "  Hello   WORLD\tfoo\n", tokens(F.col("text"))) == [
        "hello",
        "world",
        "foo",
    ]


def test_word_shingles(spark):
    got = _one(spark, "a b c d", word_shingles(tokens(F.col("text")), 3))
    assert got == ["a b c", "b c d"]
    assert _one(spark, "a b", word_shingles(tokens(F.col("text")), 3)) == []


def test_token_stats(spark):
    s = token_stats(F.col("text"))
    df = spark.createDataFrame([("ab cd, ef 12!",)], "text string")
    row = df.select(
        s["n_tokens"].alias("nt"),
        s["n_alpha"].alias("na"),
        s["n_digit"].alias("nd"),
        s["n_punct"].alias("np"),
    ).first()
    assert row.nt == 4
    assert row.na == 6
    assert row.nd == 2
    assert row.np == 2  # comma and exclamation... '!' not in class -> check
    # punct class is .,;:!?'"()- : ',' and '!' both count
    assert row.np == 2


def test_quality_score_bounds(spark, documents):
    rows = documents.select(quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r.q <= 1.0 for r in rows)


def test_language_id_obvious_cases(spark):
    assert _one(spark, "the cat sat on the mat and it is happy", language_id(F.col("text"))) == "en"
    assert _one(spark, "le chat est dans la maison et il est content", language_id(F.col("text"))) == "fr"
    assert _one(spark, "der Hund ist ein guter Freund und die Katze", language_id(F.col("text"))) == "de"
    assert _one(spark, "xyzzy qwerty plugh", language_id(F.col("text"))) == "und"


def test_fingerprint_order_sensitive(spark):
    a = _one(spark, "alpha beta gamma", doc_fingerprint(F.col("text")))
    b = _one(spark, "gamma beta alpha", doc_fingerprint(F.col("text")))
    c = _one(spark, "alpha beta gamma", doc_fingerprint(F.col("text")))
    assert a == c
    assert a != b
    assert _one(spark, "", doc_fingerprint(F.col("text"))) == 0


def test_salted_counts_match_plain_groupby(spark):
    """Two-stage salted aggregation must equal a plain GROUP BY count
    regardless of how rows land in partitions (salt is summed out)."""
    from pyspark.sql import functions as F

    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.operators.relational import (
        heavy_hitters,
        salted_key_counts,
    )

    rows = [("hot",)] * 500 + [("warm",)] * 30 + [(f"cold{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    got = {r.key: r.n_rows for r in salted_key_counts(df, "k", salt_buckets=4).collect()}
    want = {r.k: r["count"] for r in df.groupBy("k").count().collect()}
    assert got == want
    top = heavy_hitters(df, "k", n=2).collect()
    assert [(r.key, r.n_rows, r.rank) for r in top] == [("hot", 500, 1), ("warm", 30, 2)]


def test_bpe_tokens_splits_character_classes(spark):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.text import (
        bpe_tokens,
    )

    got = _one(spark, "It's a test-42x!", bpe_tokens(F.col("text")))
    assert got == ["it", "'", "s", "a", "test", "-", "42", "x", "!"]
    assert _one(spark, "", bpe_tokens(F.col("text"))) == []


def test_token_chunks_overlap_and_edges(spark):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.text import (
        token_chunks,
        tokens,
    )

    def chunks(text, size, stride):
        df = spark.createDataFrame([(text,)], "text string")
        return df.select(
            token_chunks(tokens(F.col("text")), size, stride).alias("c")
        ).first().c

    # 12 tokens, size 5 / stride 4: starts 0,4,8 — 1-token overlap
    words = " ".join(f"w{i}" for i in range(12))
    got = chunks(words, 5, 4)
    assert [c.chunk_idx for c in got] == [0, 1, 2]
    assert got[0].chunk_text == "w0 w1 w2 w3 w4"
    assert got[1].chunk_text == "w4 w5 w6 w7 w8"   # overlap carries w4
    assert got[2].chunk_text == "w8 w9 w10 w11"    # tail clamps
    # short doc -> exactly one chunk; empty doc -> none
    assert [c.chunk_text for c in chunks("a b", 5, 4)] == ["a b"]
    assert chunks("", 5, 4) == []
    # every token appears in at least one chunk
    covered = " ".join(c.chunk_text for c in got).split()
    assert set(covered) == set(words.split())


def test_redact_pii_counts_and_placeholders(spark):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.text import (
        redact_pii,
    )

    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@mail.example.org or call 1234567890"),
            (2, "short 12345 stays, code 999999 goes"),
            (3, "clean text"),
        ],
        "doc_id long, text string",
    )
    cols = redact_pii(F.col("text"))
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            cols["redacted"].alias("redacted"),
            cols["n_emails"].alias("n_emails"),
            cols["n_numbers"].alias("n_numbers"),
        ).collect()
    }
    assert out[1].redacted == "mail me at <EMAIL> or call <NUM>"
    assert (out[1].n_emails, out[1].n_numbers) == (1, 1)
    # 5-digit run is below the redaction floor; 6-digit goes
    assert out[2].redacted == "short 12345 stays, code <NUM> goes"
    assert (out[2].n_emails, out[2].n_numbers) == (0, 1)
    assert out[3].redacted == "clean text"


def test_repetition_stats_golden(spark):
    from code_clone_detection_a_vector_database_based_approach_for_type_3_and_type_4_of_code_clones_spark.functions.text import (
        repetition_stats,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "a b c a b c a b c"),   # 9 toks, 7 shingles, 3 distinct
        (2, "w x y z"),             # 4 toks, 2 shingles, both unique
        (3, "solo"),                # < 3 toks -> no shingles
        (4, ""),                    # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = repetition_stats(F.col("text"))
    out = {
        r.doc_id: r
        for r in df.select("doc_id", *[c.alias(n) for n, c in stats.items()]).collect()
    }
    r1 = out[1]
    assert (r1.n_tokens, r1.n_shingles, r1.n_distinct_shingles) == (9, 7, 3)
    assert abs(r1.dup_shingle_ratio - round(1 - 3 / 7, 6)) < 1e-9
    assert out[2].dup_shingle_ratio == 0.0
    assert out[3].n_shingles == 0 and out[3].dup_shingle_ratio == 0.0
    assert out[4].n_tokens == 0 and out[4].dup_shingle_ratio == 0.0
