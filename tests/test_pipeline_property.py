"""Property-based invariants for the packing/chunking/mixture operators
(hypothesis; small example counts — every example runs Spark jobs).

Invariants that must hold for ANY corpus:
  * pack_greedy: every doc assigned exactly once; per-(shard, seq) token
    mass never exceeds seq_len; seq ids are contiguous from 0 per shard
    in id order.
  * chunk_documents (no overlap): chunks reassemble the exact whitespace
    tokenization, with every chunk except the last full-size.
  * weighted_mixture: integer weights produce exactly weight × |stratum|
    rows with epochs 0..w-1.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

words = st.lists(st.sampled_from("alpha beta gamma delta eps".split()),
                 min_size=0, max_size=30)
corpus = st.lists(words, min_size=1, max_size=12)

_SETTINGS = dict(max_examples=8, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])


def _df(spark, docs):
    return spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(w)) for i, w in enumerate(docs)])


class TestPackGreedyInvariants:
    @given(corpus, st.integers(2, 9), st.integers(1, 3))
    @settings(**_SETTINGS)
    def test_invariants(self, spark, docs, seq_len, shards):
        from incubator_druid_spark.pipeline.packing import pack_greedy
        rows = pack_greedy(_df(spark, docs), seq_len=seq_len,
                           shards=shards).collect()
        # every doc exactly once
        assert sorted(r["doc_id"] for r in rows) == list(range(len(docs)))
        # per-sequence token mass bounded
        mass: dict = {}
        for r in rows:
            key = (r["shard"], r["seq_id"])
            mass[key] = mass.get(key, 0) + r["n_tokens"]
            assert r["n_tokens"] <= seq_len
        assert all(v <= seq_len for v in mass.values())
        # seq ids contiguous from 0 per shard, nondecreasing in id order
        by_shard: dict = {}
        for r in sorted(rows, key=lambda r: r["doc_id"]):
            by_shard.setdefault(r["shard"], []).append(r["seq_id"])
        for seqs in by_shard.values():
            assert seqs[0] == 0
            for a, b in zip(seqs, seqs[1:]):
                assert b in (a, a + 1)


class TestChunkInvariants:
    @given(corpus, st.integers(1, 7))
    @settings(**_SETTINGS)
    def test_reassembly(self, spark, docs, chunk_tokens):
        from incubator_druid_spark.pipeline.packing import chunk_documents
        rows = chunk_documents(_df(spark, docs),
                               chunk_tokens=chunk_tokens).collect()
        by_doc: dict = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(
                (r["chunk_id"], r["chunk_text"], r["chunk_n_tokens"]))
        for i, wlist in enumerate(docs):
            toks = [w for w in wlist if w]
            if not toks:
                assert i not in by_doc
                continue
            chunks = sorted(by_doc[i])
            rebuilt = " ".join(c[1] for c in chunks).split()
            assert rebuilt == toks
            # all but the last chunk are full
            assert all(c[2] == chunk_tokens for c in chunks[:-1])
            assert 1 <= chunks[-1][2] <= chunk_tokens


class TestMixtureInvariants:
    @given(st.integers(0, 3), st.integers(0, 3))
    @settings(**_SETTINGS)
    def test_integer_weights(self, spark, w0, w1):
        from incubator_druid_spark.pipeline.sampling import weighted_mixture
        df = spark.createDataFrame(
            [Row(doc_id=i, source=f"s{i % 2}", text="x") for i in range(12)])
        rows = weighted_mixture(df, {"s0": float(w0), "s1": float(w1)},
                                "source", "doc_id").collect()
        for src, w in (("s0", w0), ("s1", w1)):
            got = [r for r in rows if r["source"] == src]
            assert len(got) == 6 * w
            assert all(0 <= r["epoch"] < w for r in got)
