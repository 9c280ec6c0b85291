"""Chat-transcript operators (pipeline/chat.py) — turn parsing, span
arithmetic, alternation semantics, and plan hygiene."""

import pytest
from pyspark.sql import functions as F

from incubator_druid_spark.pipeline.chat import (
    chat_spans,
    chat_stats,
    parse_chat,
)


@pytest.fixture()
def convs(spark):
    rows = [
        (1, "user: hi there\n\nassistant: hello!\n\n"
            "user: bye\n\nassistant: later"),
        (2, "system: be nice\n\nuser: q\n\nassistant: a"),
        (3, "no role prefix here\n\nassistant: ok"),
        (4, "user: a\n\nuser: b"),
        (5, "tool: {\"r\": 1}\n\nassistant: used it"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


class TestParseChat:
    def test_turns_and_roles(self, convs):
        rows = parse_chat(convs).orderBy("doc_id", "turn_idx").collect()
        d1 = [(r.turn_idx, r.role, r.content) for r in rows
              if r.doc_id == 1]
        assert d1 == [(0, "user", "hi there"), (1, "assistant", "hello!"),
                      (2, "user", "bye"), (3, "assistant", "later")]

    def test_unparsed_turn_keeps_text(self, convs):
        r = (parse_chat(convs).filter("doc_id = 3 AND turn_idx = 0")
             .first())
        assert r.role is None and r.content == "no role prefix here"

    def test_colon_inside_content(self, spark):
        df = spark.createDataFrame(
            [(1, "user: time: 12:30 ok")], "doc_id int, text string")
        r = parse_chat(df).first()
        assert (r.role, r.content) == ("user", "time: 12:30 ok")

    def test_custom_roles(self, spark):
        df = spark.createDataFrame(
            [(1, "q: why?\n\na: because")], "doc_id int, text string")
        rows = parse_chat(df, roles=["q", "a"]).collect()
        assert [r.role for r in rows] == ["q", "a"]

    def test_empty_content(self, spark):
        df = spark.createDataFrame(
            [(1, "user: ")], "doc_id int, text string")
        r = parse_chat(df).first()
        assert (r.role, r.content) == ("user", "")


class TestChatSpans:
    def test_spans_slice_reassembled_string(self, convs):
        rows = (chat_spans(convs).orderBy("doc_id", "turn_idx")
                .collect())
        for did in (1, 2, 3, 4, 5):
            turns = [r for r in rows if r.doc_id == did]
            joined = "\n".join(r.content for r in turns)
            for r in turns:
                assert joined[r.char_start:r.char_end] == r.content

    def test_train_mask_assistant_only(self, convs):
        rows = chat_spans(convs).collect()
        for r in rows:
            assert r.train_mask is (r.role == "assistant")

    def test_custom_train_roles(self, convs):
        rows = chat_spans(convs, train_roles=["assistant", "tool"]) \
            .filter("doc_id = 5").orderBy("turn_idx").collect()
        assert [r.train_mask for r in rows] == [True, True]


class TestChatStats:
    def test_shape_report(self, convs):
        out = {r.doc_id: r for r in chat_stats(convs).collect()}
        assert out[1].n_turns == 4 and out[1].alternates_ua
        assert out[1].first_role == "user"
        assert out[1].assistant_chars == len("hello!") + len("later")
        # system opener allowed
        assert out[2].alternates_ua and out[2].first_role == "system"
        # unparsed turn breaks alternation and is counted
        assert out[3].n_unparsed == 1 and not out[3].alternates_ua
        assert out[3].first_role is None
        # consecutive same-role breaks alternation
        assert not out[4].alternates_ua

    def test_no_python_udf(self, convs):
        plan = (chat_spans(convs)
                ._jdf.queryExecution().executedPlan().toString())
        assert "BatchEvalPython" not in plan
        assert "EvalPython" not in plan


class TestMaskedSequences:
    @pytest.fixture()
    def packed(self, spark, convs):
        from incubator_druid_spark.pipeline.chat import (
            chat_spans, materialize_masked_sequences)
        turns = chat_spans(convs)
        asg = spark.createDataFrame(
            [(1, 0, 0), (2, 0, 0), (3, 0, 1), (4, 1, 0), (5, 1, 0)],
            "doc_id int, shard int, seq_id int")
        return materialize_masked_sequences(turns, asg).collect()

    def test_span_invariant_holds(self, packed):
        # THE contract: every mask span slices exactly an assistant turn
        for r in packed:
            for s in r.mask_spans:
                seg = r.seq_text[s.start:s.end]
                assert seg and ("\n\n" not in seg)

    def test_mask_content_is_assistant_text(self, packed):
        seq = next(r for r in packed if (r.shard, r.seq_id) == (0, 0))
        segs = [seq.seq_text[s.start:s.end] for s in seq.mask_spans]
        assert segs == ["hello!", "later", "a"]  # conv 1 then conv 2
        assert seq.n_convs == 2
        assert seq.train_chars == sum(len(s) for s in segs)

    def test_convs_joined_in_id_order(self, packed):
        seq = next(r for r in packed if (r.shard, r.seq_id) == (0, 0))
        first_conv = seq.seq_text.split("\n\n")[0]
        assert first_conv.startswith("hi there")

    def test_no_python_udf(self, spark, convs):
        from incubator_druid_spark.pipeline.chat import (
            chat_spans, materialize_masked_sequences)
        asg = spark.createDataFrame([(1, 0, 0)],
                                    "doc_id int, shard int, seq_id int")
        out = materialize_masked_sequences(chat_spans(convs), asg)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
