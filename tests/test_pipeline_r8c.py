"""Round-8c pipeline operators: benchmark decontamination, PII
counting/redaction, fixed-token chunking, and sequence packing (concat
and next-fit).  Each operator's oracle entry in __spark_entry__.py is
hash-checked against DuckDB; these tests pin the semantic corners the
oracle's real-data replay can't isolate (empty docs, exact-fit bins,
truncation, overlap precedence, plan shape)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from incubator_druid_spark.pipeline.decontaminate import decontaminate
from incubator_druid_spark.pipeline.packing import (chunk_documents,
                                                    pack_concat, pack_greedy)
from incubator_druid_spark.pipeline.text import (c4_clean, gopher_quality,
                                                 pii_counts, redact_pii,
                                                 repetition_stats)


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


# ---------------------------------------------------------------- decontam

class TestDecontaminate:
    def test_exact_overlap_counts(self, spark):
        train = _docs(spark, [
            (1, "the quick brown fox jumps over the lazy dog"),  # 9 toks
            (2, "completely novel content nothing shared here at all ok"),
            (3, "short"),  # < n tokens -> 0 grams
        ])
        ev = _docs(spark, [
            (100, "we saw the quick brown fox jumps over the lazy dog too"),
        ])
        out = {r["doc_id"]: r for r in
               decontaminate(train, ev, n=8).collect()}
        # doc 1: 2 distinct 8-grams, both present in the eval doc
        assert out[1]["n_grams"] == 2
        assert out[1]["contaminated_grams"] == 2
        assert out[2]["n_grams"] == 2
        assert out[2]["contaminated_grams"] == 0
        assert out[3]["n_grams"] == 0
        assert out[3]["contaminated_grams"] == 0

    def test_normalization_matches_dedup_family(self, spark):
        # punctuation/case differences must not defeat the collision
        train = _docs(spark, [(1, "The QUICK, brown fox! jumps over the "
                                  "lazy dog")])
        ev = _docs(spark, [(2, "the quick brown fox jumps over the lazy "
                               "dog")])
        r = decontaminate(train, ev, n=8).collect()[0]
        assert r["contaminated_grams"] == r["n_grams"] == 2

    def test_duplicate_grams_count_once(self, spark):
        # repeated gram inside one train doc counts once (DISTINCT grams)
        text = "a b c d e f g h " * 3  # gram "a b c d e f g h" repeats
        train = _docs(spark, [(1, text.strip())])
        ev = _docs(spark, [(2, "a b c d e f g h")])
        r = decontaminate(train, ev, n=8).collect()[0]
        # 24 tokens -> 17 positions, but the text is periodic so the
        # distinct grams are the 8 cyclic rotations
        assert r["n_grams"] == 8
        assert r["contaminated_grams"] == 1

    def test_eval_side_broadcast(self, spark):
        train = _docs(spark, [(1, "one two three four five six seven "
                                  "eight nine")])
        ev = _docs(spark, [(2, "one two three four five six seven eight")])
        plan = decontaminate(train, ev, n=8)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    def test_no_broadcast_fallback(self, spark):
        train = _docs(spark, [(1, "one two three four five six seven "
                                  "eight nine")])
        ev = _docs(spark, [(2, "one two three four five six seven eight")])
        out = decontaminate(train, ev, n=8, broadcast_eval=False).collect()
        # the 8-token eval doc has exactly one gram, matching the train
        # doc's first position
        assert out[0]["n_grams"] == 2
        assert out[0]["contaminated_grams"] == 1


# ---------------------------------------------------------------- chunking

class TestChunkDocuments:
    def test_non_overlapping(self, spark):
        df = _docs(spark, [(1, "a b c d e f g")])
        rows = sorted(chunk_documents(df, chunk_tokens=3).collect(),
                      key=lambda r: r["chunk_id"])
        assert [r["chunk_text"] for r in rows] == ["a b c", "d e f", "g"]
        assert [r["chunk_n_tokens"] for r in rows] == [3, 3, 1]

    def test_overlap(self, spark):
        df = _docs(spark, [(1, "a b c d e f g")])
        rows = sorted(chunk_documents(df, chunk_tokens=4, overlap=2)
                      .collect(), key=lambda r: r["chunk_id"])
        # stride 2: starts 0,2,4,6
        assert [r["chunk_text"] for r in rows] == \
            ["a b c d", "c d e f", "e f g", "g"]

    def test_empty_and_whitespace_doc(self, spark):
        df = _docs(spark, [(1, ""), (2, "   "), (3, "x")])
        rows = chunk_documents(df, chunk_tokens=5).collect()
        assert len(rows) == 1 and rows[0]["doc_id"] == 3

    def test_bad_overlap_raises(self, spark):
        df = _docs(spark, [(1, "a")])
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=4, overlap=4)

    def test_exact_multiple(self, spark):
        df = _docs(spark, [(1, "a b c d")])
        rows = chunk_documents(df, chunk_tokens=2).collect()
        assert len(rows) == 2


# ------------------------------------------------------------ pack_concat

class TestPackConcat:
    def test_boundary_spanning_doc(self, spark):
        # shard 0 only (ids multiples of `shards`); seq_len 5
        df = _docs(spark, [(0, "a b c"), (4, "d e f g"), (8, "h")])
        out = {r["doc_id"]: r for r in
               pack_concat(df, seq_len=5, shards=4).collect()}
        # doc 0: tokens [0,3) -> seq 0; doc 4: [3,7) spans seqs 0-1;
        # doc 8: [7,8) -> seq 1
        assert (out[0]["first_seq"], out[0]["last_seq"]) == (0, 0)
        assert (out[4]["first_seq"], out[4]["last_seq"]) == (0, 1)
        assert (out[8]["first_seq"], out[8]["last_seq"]) == (1, 1)

    def test_zero_token_doc_on_boundary(self, spark):
        df = _docs(spark, [(0, "a b c d e"), (4, ""), (8, "f")])
        out = {r["doc_id"]: r for r in
               pack_concat(df, seq_len=5, shards=4).collect()}
        # doc 4 sits exactly on the seq 0/1 boundary with 0 tokens
        assert out[4]["n_tokens"] == 0
        assert (out[4]["first_seq"], out[4]["last_seq"]) == (1, 1)

    def test_sharding(self, spark):
        df = _docs(spark, [(i, "w") for i in range(8)])
        out = pack_concat(df, seq_len=10, shards=4).collect()
        assert {r["shard"] for r in out} == {0, 1, 2, 3}


# ------------------------------------------------------------ pack_greedy

class TestPackGreedy:
    def test_next_fit(self, spark):
        # one shard; docs in id order with token counts 3,3,3 at seq_len 7:
        # [3,3] fills 6, third opens seq 1
        df = _docs(spark, [(0, "a b c"), (4, "d e f"), (8, "g h i")])
        out = {r["doc_id"]: r["seq_id"] for r in
               pack_greedy(df, seq_len=7, shards=4).collect()}
        assert out == {0: 0, 4: 0, 8: 1}

    def test_exact_fit_stays(self, spark):
        df = _docs(spark, [(0, "a b c d"), (4, "e f g")])
        out = {r["doc_id"]: r["seq_id"] for r in
               pack_greedy(df, seq_len=7, shards=4).collect()}
        assert out == {0: 0, 4: 0}

    def test_truncation(self, spark):
        df = _docs(spark, [(0, "a b c d e f g h i j")])
        r = pack_greedy(df, seq_len=4, shards=1).collect()[0]
        assert r["truncated"] is True
        assert r["n_tokens"] == 4 and r["seq_id"] == 0

    def test_zero_token_doc(self, spark):
        df = _docs(spark, [(0, ""), (1, "a b")])
        out = {r["doc_id"]: r for r in
               pack_greedy(df, seq_len=4, shards=1).collect()}
        assert out[0]["n_tokens"] == 0 and out[0]["truncated"] is False

    def test_string_ids_shard_by_hash(self, spark):
        # a STRING id must not go through cast-to-long (throws on an ANSI
        # host); it shards by hash and keeps its type in the output
        df = spark.createDataFrame(
            [Row(doc_id=f"doc-{i}", text="a b c") for i in range(12)])
        out = pack_greedy(df, seq_len=4, shards=3).collect()
        assert len(out) == 12
        assert all(isinstance(r["doc_id"], str) for r in out)
        assert {r["shard"] for r in out} <= {0, 1, 2}
        outc = pack_concat(df, seq_len=4, shards=3).collect()
        assert len(outc) == 12

    def test_deterministic_across_partitioning(self, spark):
        rows = [(i, "w " * (i % 7 + 1)) for i in range(64)]
        a = pack_greedy(_docs(spark, rows).repartition(13),
                        seq_len=10, shards=4).collect()
        b = pack_greedy(_docs(spark, rows).coalesce(1),
                        seq_len=10, shards=4).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ------------------------------------------------------------------- PII

class TestPII:
    def test_counts(self, spark):
        df = _docs(spark, [
            (1, "mail a.b+c@ex-ample.org and 192.168.0.1 ssn 123-45-6789 "
                "call +1 555-0100 now"),
            (2, "no pii here"),
        ])
        out = {r["doc_id"]: r for r in pii_counts(df).collect()}
        r = out[1]
        assert r["n_email"] == 1 and r["n_ipv4"] == 1
        # the SSN shape also matches the broad phone pattern — counts are
        # independent over the original text (redaction resolves precedence)
        assert r["n_ssn"] == 1
        assert r["n_phone"] == 2
        z = out[2]
        assert (z["n_email"], z["n_ssn"], z["n_ipv4"], z["n_phone"]) \
            == (0, 0, 0, 0)

    def test_redaction_precedence(self, spark):
        df = _docs(spark, [
            (1, "mail bob99@example.com ssn 123-45-6789 ip 10.0.0.1 "
                "tel 555-123-4567 end"),
        ])
        t = redact_pii(df).collect()[0]["redacted_text"]
        assert "[EMAIL]" in t and "[SSN]" in t and "[IP]" in t \
            and "[PHONE]" in t
        assert "bob99" not in t and "123-45-6789" not in t \
            and "10.0.0.1" not in t and "555-123-4567" not in t

    def test_redaction_does_not_eat_structured_forms(self, spark):
        # the broad phone pattern must not consume the SSN or IP (they are
        # redacted first)
        df = _docs(spark, [(1, "a 123-45-6789 b 10.0.0.1 c")])
        t = redact_pii(df).collect()[0]["redacted_text"]
        assert t == "a [SSN] b [IP] c"

    def test_email_digits_not_phone(self, spark):
        # digits inside an email local part disappear with the email pass
        df = _docs(spark, [(1, "reach 123456789@example.com ok")])
        t = redact_pii(df).collect()[0]["redacted_text"]
        assert t == "reach [EMAIL] ok"

    def test_plain_text_untouched(self, spark):
        df = _docs(spark, [(1, "version 1.2 of the doc, page 3")])
        t = redact_pii(df).collect()[0]["redacted_text"]
        assert t == "version 1.2 of the doc, page 3"


# --------------------------------------------------------- gopher rules

GOOD_DOC = ("the quick brown fox jumps over the lazy dog and keeps "
            "going for a while because this document needs to clear "
            "the fifty word floor with room to spare so here is more "
            "plain prose that was written with that goal in mind and "
            "a few linking words like of and to and in for padding")


class TestGopherQuality:
    def _row(self, spark, text, **kw):
        return gopher_quality(_docs(spark, [(1, text)]), **kw).collect()[0]

    def test_good_doc_passes(self, spark):
        r = self._row(spark, GOOD_DOC)
        assert bool(r["gopher_pass"]) is True
        assert r["n_words"] >= 50 and r["stop_hits"] >= 2

    def test_short_doc_fails_on_word_count(self, spark):
        r = self._row(spark, "too short")
        assert bool(r["gopher_pass"]) is False
        assert r["n_words"] == 2

    def test_symbol_heavy_fails(self, spark):
        r = self._row(spark, GOOD_DOC + " " + "# " * 20)
        assert r["symbol_word_ratio"] > 0.1
        assert bool(r["gopher_pass"]) is False

    def test_ellipsis_counts_both_forms(self, spark):
        r = self._row(spark, "first line...\nsecond line…\nthird line")
        assert abs(r["ellipsis_line_frac"] - 2 / 3) < 1e-12

    def test_bullet_lines(self, spark):
        r = self._row(spark, "- a bullet\n* another\n• third\nplain")
        assert abs(r["bullet_line_frac"] - 0.75) < 1e-12

    def test_non_alpha_words_fail_alpha_frac(self, spark):
        r = self._row(spark, "1 2 3 4 5 6 7 8 9 10")
        assert r["alpha_word_frac"] == 0.0
        assert bool(r["gopher_pass"]) is False

    def test_empty_doc(self, spark):
        r = self._row(spark, "")
        assert r["n_words"] == 0 and r["mean_word_len"] == 0.0
        assert bool(r["gopher_pass"]) is False

    def test_threshold_overrides(self, spark):
        r = self._row(spark, "the cat sat on the mat", min_words=3,
                      min_mean_word_len=2.0, min_alpha_word_frac=0.5,
                      min_stop_hits=1)
        assert bool(r["gopher_pass"]) is True


# ------------------------------------------------------------ C4 rules

class TestC4Clean:
    def _row(self, spark, text, **kw):
        return c4_clean(_docs(spark, [(1, text)]), **kw).collect()[0]

    def test_line_rules(self, spark):
        r = self._row(spark,
                      "this line has five good words.\n"
                      "short one.\n"                       # < 5 words
                      "this one has no terminal punct\n"   # no terminal
                      'he said "this is a quote line."\n'
                      "is this a question with enough words?")
        assert r["n_lines_kept"] == 3 and r["n_lines_dropped"] == 2
        assert "short one." not in r["clean_text"]
        assert "question" in r["clean_text"]

    def test_keep_verdict(self, spark):
        good = ("one full sentence with enough words here.\n"
                "two full sentences with enough words here.\n"
                "three full sentences with enough words here.")
        assert bool(self._row(spark, good)["c4_keep"]) is True
        assert bool(self._row(spark, good + "\nvar x = { y }")
                    ["has_curly_brace"]) is True
        assert bool(self._row(spark, good + "\nsee Lorem IPSUM text")
                    ["has_lorem_ipsum"]) is True
        assert bool(self._row(spark, good + "\nuses { braces }")
                    ["c4_keep"]) is False

    def test_too_few_sentences(self, spark):
        r = self._row(spark, "only one kept sentence lives here.")
        assert r["n_sentences"] == 1
        assert bool(r["c4_keep"]) is False

    def test_all_dropped_yields_empty(self, spark):
        r = self._row(spark, "no punct\nstill none")
        assert r["clean_text"] == "" and r["n_sentences"] == 0

    def test_threshold_overrides(self, spark):
        r = self._row(spark, "tiny line.\nsecond tiny.", min_words_per_line=2,
                      min_sentences=2)
        assert r["n_lines_kept"] == 2
        assert bool(r["c4_keep"]) is True


# ---------------------------------------------------- group-dedup policies

class TestDedupPolicies:
    def _groups(self, spark):
        # group 1: members 1,2,3; singleton 9 absent from groups
        return spark.createDataFrame(
            [Row(id=1, group_id=1), Row(id=2, group_id=1),
             Row(id=3, group_id=1)])

    def test_keep_best_quality(self, spark):
        from incubator_druid_spark.pipeline.dedup import dedup_by_groups
        df = spark.createDataFrame(
            [Row(doc_id=1, quality=0.2), Row(doc_id=2, quality=0.9),
             Row(doc_id=3, quality=0.5), Row(doc_id=9, quality=0.1)])
        kept = sorted(r["doc_id"] for r in dedup_by_groups(
            df, self._groups(spark), "doc_id", keep_by="quality").collect())
        assert kept == [2, 9]  # best of the group + the singleton

    def test_keep_best_tie_breaks_low_id(self, spark):
        from incubator_druid_spark.pipeline.dedup import dedup_by_groups
        df = spark.createDataFrame(
            [Row(doc_id=1, quality=0.5), Row(doc_id=2, quality=0.5),
             Row(doc_id=3, quality=0.1)])
        kept = sorted(r["doc_id"] for r in dedup_by_groups(
            df, self._groups(spark), "doc_id", keep_by="quality").collect())
        assert kept == [1]

    def test_default_keeps_min_id(self, spark):
        from incubator_druid_spark.pipeline.dedup import dedup_by_groups
        df = spark.createDataFrame(
            [Row(doc_id=i, quality=0.0) for i in (1, 2, 3, 9)])
        kept = sorted(r["doc_id"] for r in dedup_by_groups(
            df, self._groups(spark), "doc_id").collect())
        assert kept == [1, 9]

    def test_dedup_against_prior_corpus(self, spark):
        from incubator_druid_spark.pipeline.dedup import (dedup_against,
                                                          fingerprint_dedup)
        corpus = _docs(spark, [(1, "seen before text"),
                               (2, "also already seen")])
        index = fingerprint_dedup(corpus, "text", "doc_id")
        batch = _docs(spark, [(10, "Seen BEFORE text!"),  # fp-dup of 1
                              (11, "genuinely new content")])
        kept = dedup_against(batch, index).collect()
        assert [r["doc_id"] for r in kept] == [11]


# ----------------------------------------------------------- script profile

class TestScriptProfile:
    def _row(self, spark, text):
        from incubator_druid_spark.pipeline.text import script_profile
        return script_profile(_docs(spark, [(1, text)])).collect()[0]

    def test_counts_and_dominant(self, spark):
        r = self._row(spark, "hello мир 你好")
        assert r["n_latin"] == 5 and r["n_cyrillic"] == 3 \
            and r["n_cjk"] == 2
        assert r["dominant_script"] == "latin"

    def test_cjk_dominant(self, spark):
        r = self._row(spark, "ab 你好世界これは테스트다")
        assert r["dominant_script"] == "cjk"

    def test_tie_resolves_in_range_order(self, spark):
        r = self._row(spark, "ab ыэ")  # 2 latin, 2 cyrillic
        assert r["dominant_script"] == "latin"

    def test_digits_only_is_none(self, spark):
        r = self._row(spark, "123 456 !!!")
        assert r["dominant_script"] == "none"

    def test_null_text(self, spark):
        from incubator_druid_spark.pipeline.text import script_profile
        from pyspark.sql.types import (LongType, StringType, StructField,
                                       StructType)
        df = spark.createDataFrame(
            [(1, None)], StructType([StructField("doc_id", LongType()),
                                     StructField("text", StringType())]))
        r = script_profile(df).collect()[0]
        assert r["n_latin"] == 0 and r["dominant_script"] == "none"


# ----------------------------------------------------- sequence materialize

class TestMaterializeSequences:
    def test_concat_in_id_order(self, spark):
        from incubator_druid_spark.pipeline.packing import (
            materialize_sequences, pack_greedy)
        df = _docs(spark, [(8, "late words"), (0, "first words"),
                           (4, "middle words")])
        packed = pack_greedy(df, seq_len=10, shards=4)  # all shard 0, seq 0
        out = materialize_sequences(df, packed).collect()
        assert len(out) == 1
        r = out[0]
        assert r["seq_text"] == "first words\n\nmiddle words\n\nlate words"
        assert r["n_docs"] == 3 and r["n_tokens"] == 6

    def test_sequence_split(self, spark):
        from incubator_druid_spark.pipeline.packing import (
            materialize_sequences, pack_greedy)
        df = _docs(spark, [(0, "a b c"), (4, "d e f"), (8, "g h i")])
        packed = pack_greedy(df, seq_len=7, shards=4)
        out = {(r["shard"], r["seq_id"]): r["seq_text"] for r in
               materialize_sequences(df, packed).collect()}
        assert out == {(0, 0): "a b c\n\nd e f", (0, 1): "g h i"}

    def test_custom_separator(self, spark):
        from incubator_druid_spark.pipeline.packing import (
            materialize_sequences, pack_greedy)
        df = _docs(spark, [(0, "x"), (4, "y")])
        packed = pack_greedy(df, seq_len=10, shards=4)
        r = materialize_sequences(df, packed,
                                  separator="<|eod|>").collect()[0]
        assert r["seq_text"] == "x<|eod|>y"


# --------------------------------------------------------- weighted mixture

class TestWeightedMixture:
    def _df(self, spark):
        return spark.createDataFrame(
            [Row(doc_id=i, source=f"s{i % 3}", text="x") for i in range(30)])

    def test_integer_weights_exact_copies(self, spark):
        from incubator_druid_spark.pipeline.sampling import weighted_mixture
        out = weighted_mixture(self._df(spark), {"s0": 3.0, "s1": 0.0},
                               "source", "doc_id").collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r["source"], []).append(r["epoch"])
        assert len(by_src["s0"]) == 30  # 10 docs x 3 epochs
        assert sorted(set(by_src["s0"])) == [0, 1, 2]
        assert "s1" not in by_src
        assert len(by_src["s2"]) == 10  # default weight 1.0

    def test_fractional_weight_is_deterministic_subset(self, spark):
        from incubator_druid_spark.pipeline.sampling import weighted_mixture
        a = sorted(r["doc_id"] for r in weighted_mixture(
            self._df(spark), {"s0": 0.5, "s1": 0.0, "s2": 0.0},
            "source", "doc_id").collect())
        b = sorted(r["doc_id"] for r in weighted_mixture(
            self._df(spark), {"s0": 0.5, "s1": 0.0, "s2": 0.0},
            "source", "doc_id").collect())
        assert a == b and 0 < len(a) < 10
        # fractional selections nest: every 0.3-doc is also a 0.6-doc
        lo = set(r["doc_id"] for r in weighted_mixture(
            self._df(spark), {"s0": 0.3, "s1": 0.0, "s2": 0.0},
            "source", "doc_id").collect())
        hi = set(r["doc_id"] for r in weighted_mixture(
            self._df(spark), {"s0": 0.6, "s1": 0.0, "s2": 0.0},
            "source", "doc_id").collect())
        assert lo <= hi

    def test_negative_weight_raises(self, spark):
        import pytest as _pytest

        from incubator_druid_spark.pipeline.sampling import weighted_mixture
        with _pytest.raises(ValueError):
            weighted_mixture(self._df(spark), {"s0": -1.0},
                             "source", "doc_id")


# ------------------------------------------------------- null-text safety

class TestNullText:
    """A null text column must read as the empty document everywhere —
    no crashes, no null-poisoned verdict columns."""

    def _null_docs(self, spark):
        from pyspark.sql.types import (LongType, StringType, StructField,
                                       StructType)
        schema = StructType([StructField("doc_id", LongType()),
                             StructField("text", StringType())])
        return spark.createDataFrame([(1, None), (2, "real text here.")],
                                     schema)

    def test_gopher(self, spark):
        r = {x["doc_id"]: x for x in
             gopher_quality(self._null_docs(spark)).collect()}
        assert r[1]["n_words"] == 0 and bool(r[1]["gopher_pass"]) is False

    def test_c4(self, spark):
        r = {x["doc_id"]: x for x in
             c4_clean(self._null_docs(spark)).collect()}
        assert r[1]["clean_text"] == "" and r[1]["n_lines_kept"] == 0
        assert bool(r[1]["c4_keep"]) is False
        assert r[1]["has_curly_brace"] is False

    def test_repetition(self, spark):
        r = {x["doc_id"]: x for x in
             repetition_stats(self._null_docs(spark)).collect()}
        assert r[1]["n_lines"] == 0 and r[1]["dup_line_frac"] == 0.0

    def test_pii(self, spark):
        r = {x["doc_id"]: x for x in
             pii_counts(self._null_docs(spark)).collect()}
        assert r[1]["n_email"] == 0

    def test_packing(self, spark):
        r = {x["doc_id"]: x for x in
             pack_greedy(self._null_docs(spark), seq_len=4, shards=1)
             .collect()}
        assert r[1]["n_tokens"] == 0 and r[1]["truncated"] is False
        rc = {x["doc_id"]: x for x in
              pack_concat(self._null_docs(spark), seq_len=4, shards=1)
              .collect()}
        assert rc[1]["n_tokens"] == 0

    def test_chunk_and_decontam(self, spark):
        rows = chunk_documents(self._null_docs(spark),
                               chunk_tokens=2).collect()
        assert [r["doc_id"] for r in rows] == [2, 2]
        out = {x["doc_id"]: x for x in decontaminate(
            self._null_docs(spark), self._null_docs(spark), n=2).collect()}
        assert out[1]["n_grams"] == 0


# ------------------------------------------------------ repetition stats

class TestRepetitionStats:
    def _row(self, spark, text):
        return repetition_stats(_docs(spark, [(1, text)])).collect()[0]

    def test_no_repetition(self, spark):
        r = self._row(spark, "alpha beta\ngamma delta\nepsilon zeta")
        assert r["n_lines"] == 3
        assert r["dup_line_frac"] == 0.0
        assert r["dup_line_char_frac"] == 0.0
        # every bigram unique: top bigram count 1
        # "alpha beta" = 10 chars of 35 joined chars
        assert abs(r["top_bigram_char_frac"] - 10 / 35) < 1e-12

    def test_duplicate_lines(self, spark):
        r = self._row(spark, "same line\nsame line\nother")
        assert r["n_lines"] == 3
        assert abs(r["dup_line_frac"] - 1 / 3) < 1e-12
        # dup mass: one extra "same line" (9 chars) of 9+9+5=23
        assert abs(r["dup_line_char_frac"] - 9 / 23) < 1e-12

    def test_repeated_bigram_dominates(self, spark):
        r = self._row(spark, "go go go go")
        # bigram "go go" occurs 3 times, mass 3*5=15 over join_len 11;
        # definition allows >1 for overlapping repeats — stays a pure
        # repetition SIGNAL, thresholded by callers
        assert abs(r["top_bigram_char_frac"] - 15 / 11) < 1e-12
        assert r["dup_line_frac"] == 0.0

    def test_single_token_doc(self, spark):
        r = self._row(spark, "word")
        assert r["top_bigram_char_frac"] == 0.0
        assert r["n_lines"] == 1

    def test_empty_doc(self, spark):
        r = self._row(spark, "")
        assert r["n_lines"] == 0
        assert r["dup_line_frac"] == 0.0
        assert r["top_bigram_char_frac"] == 0.0

    def test_blank_lines_ignored(self, spark):
        r = self._row(spark, "a b\n\n   \na b")
        assert r["n_lines"] == 2
        assert abs(r["dup_line_frac"] - 0.5) < 1e-12


class TestParagraphDedup:
    """Round-9: corpus-wide paragraph dedup with reassembly."""

    @pytest.fixture()
    def docs(self, spark):
        rows = [
            (1, "unique one\n\nshared boiler\n\nunique two"),
            (2, "shared boiler\n\nother text"),
            (3, "SHARED  boiler!\n\nmore"),   # normalizes identically
            (4, ""),
            (5, None),
            (6, "a\n\n\n\nb"),                # blank paragraph kept
        ]
        return spark.createDataFrame(rows, "doc_id int, text string")

    def test_global_first_wins(self, docs):
        from incubator_druid_spark.pipeline.dedup import paragraph_dedup
        out = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
        assert out[1].clean_text == \
            "unique one\n\nshared boiler\n\nunique two"
        assert out[1].n_dropped == 0
        assert out[2].clean_text == "other text"
        assert out[2].n_dropped == 1
        # punctuation/case variant collapses onto the same fingerprint
        assert out[3].clean_text == "more" and out[3].n_dropped == 1

    def test_empty_null_blank(self, docs):
        from incubator_druid_spark.pipeline.dedup import paragraph_dedup
        out = {r.doc_id: r for r in paragraph_dedup(docs).collect()}
        assert out[4].clean_text == "" and out[4].n_paragraphs == 1
        assert out[5].clean_text is None and out[5].n_paragraphs == 0
        # doc 6: 'a', '', 'b' — the blank middle is structure, kept
        assert out[6].clean_text == "a\n\n\n\nb"
        assert out[6].n_dropped == 0

    def test_min_struct_not_window(self, docs):
        # scale guard: first-occurrence selection must be an aggregate,
        # not a row_number window over the (hot) fingerprint
        from incubator_druid_spark.pipeline.dedup import paragraph_dedup
        plan = (paragraph_dedup(docs)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Window" not in plan
        assert "EvalPython" not in plan
