"""Chat-transcript operators for instruction-tuning pipelines — turn
parsing, conversation shape stats, and loss-mask span materialization.

SFT/RLHF corpora arrive as role-tagged transcripts; the loader needs
(role, content) turns, shape filters (alternation, who speaks first,
assistant mass), and per-turn character spans so the trainer can mask
loss to assistant turns after the turns are concatenated back into one
training string.  Everything here is closed-form Column expressions —
split + posexplode + window cumulative sums; the only shuffle is the
per-conversation window key.  At 100 TB: scan-speed parse, one shuffle
on conv id for spans/stats.

Transcript format (the de-facto plain-text interchange shape):
  * turns separated by ``turn_sep`` (default a blank line)
  * each turn is ``<role>: <content>`` with ``role_sep`` (default
    ': ') and a role drawn from ``roles`` (default user/assistant/
    system/tool)
  * a turn NOT matching a known role keeps role NULL and its whole
    text as content — surfaced, not dropped, so malformed transcripts
    are measurable (filter ``role IS NULL`` to count them)

Loss-mask contract (:func:`chat_spans`): spans are computed for the
REASSEMBLED string ``concat(content_0, join_sep, content_1, …)`` —
roles stripped, turns joined by ``join_sep`` — i.e. exactly the string
a loader would train on; ``char_start`` is 0-based inclusive,
``char_end`` exclusive, ``train_mask`` true for assistant turns.

No counterpart in the reference engine (training-data-pipeline tier,
SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_ROLES = ["user", "assistant", "system", "tool"]


def _role_expr(turn: Column, roles: list[str], role_sep: str) -> Column:
    head = F.substring_index(turn, role_sep, 1)
    return F.when(head.isin(roles), head)


def parse_chat(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    turn_sep: str = "\n\n",
    role_sep: str = ": ",
    roles: list[str] | None = None,
) -> DataFrame:
    """Explode transcripts into one row per turn: (id, turn_idx, role,
    content).  Pure split + posexplode — no shuffle, no UDF."""
    roles = DEFAULT_ROLES if roles is None else roles
    turns = F.split(F.col(text_col), F.lit(turn_sep), -1)
    out = df.select(
        id_col, F.posexplode(turns).alias("turn_idx", "__turn"))
    role = _role_expr(F.col("__turn"), roles, role_sep)
    content = F.when(
        role.isNotNull(),
        # strip '<role><role_sep>' — substring past the prefix length
        F.substring(
            F.col("__turn"),
            F.length(role) + len(role_sep) + 1,
            F.lit(2_147_483_647)),
    ).otherwise(F.col("__turn"))
    return out.select(
        id_col, "turn_idx", role.alias("role"), content.alias("content"))


def chat_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    turn_sep: str = "\n\n",
    role_sep: str = ": ",
    roles: list[str] | None = None,
    join_sep: str = "\n",
    train_roles: list[str] | None = None,
) -> DataFrame:
    """Per-turn character spans in the reassembled training string plus
    the loss mask: (id, turn_idx, role, content, char_start, char_end,
    train_mask).  One window (cumulative length) per conversation."""
    train_roles = ["assistant"] if train_roles is None else train_roles
    turns = parse_chat(df, text_col, id_col, turn_sep, role_sep, roles)
    w = (Window.partitionBy(id_col).orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, -1))
    prior = F.coalesce(
        F.sum(F.length("content") + len(join_sep)).over(w), F.lit(0))
    return turns.select(
        id_col, "turn_idx", "role", "content",
        prior.alias("char_start"),
        (prior + F.length("content")).alias("char_end"),
        F.coalesce(F.col("role").isin(train_roles), F.lit(False))
         .alias("train_mask"))


def chat_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    turn_sep: str = "\n\n",
    role_sep: str = ": ",
    roles: list[str] | None = None,
) -> DataFrame:
    """Per-conversation shape report: turn counts by role, unparsed-turn
    count, who opens, strict user/assistant alternation after the opener
    (a system opener is allowed; an unparsed turn breaks it), and
    assistant character mass — the filters an SFT curation pass applies
    first."""
    turns = parse_chat(df, text_col, id_col, turn_sep, role_sep, roles)
    is_ua = F.col("role").isin(["user", "assistant"])
    w = Window.partitionBy(id_col).orderBy("turn_idx")
    prev = F.lag("role").over(w)
    # lag of turn_idx distinguishes "first row" from "previous role was
    # unparsed/NULL": every turn after the opener must be user/assistant
    # and differ from its predecessor (system openers allowed; an
    # unparsed turn breaks alternation)
    prev_idx = F.lag("turn_idx").over(w)
    flip = F.when(prev_idx.isNull(), F.lit(True)).otherwise(
        F.coalesce(is_ua & (F.col("role") != prev), F.lit(False)))
    per_turn = turns.select(
        id_col, "turn_idx", "role", "content", flip.alias("__flip"))
    return (per_turn.groupBy(id_col).agg(
        F.count("*").alias("n_turns"),
        F.count(F.when(F.col("role") == "user", 1)).alias("n_user"),
        F.count(F.when(F.col("role") == "assistant", 1))
         .alias("n_assistant"),
        F.count(F.when(F.col("role").isNull(), 1)).alias("n_unparsed"),
        # min_by over a ''-encoded role: null-skipping differs between
        # engines, total values do not
        F.nullif(F.min_by(F.coalesce(F.col("role"), F.lit("")),
                          F.col("turn_idx")), F.lit(""))
         .alias("first_role"),
        F.min(F.col("__flip").cast("int")).cast("boolean")
         .alias("alternates_ua"),
        F.sum(F.when(F.col("role") == "assistant",
                     F.length("content")).otherwise(F.lit(0)))
         .alias("assistant_chars")))


def materialize_masked_sequences(
    turns: DataFrame,
    assignments: DataFrame,
    id_col: str = "doc_id",
    join_sep: str = "\n",
    doc_sep: str = "\n\n",
) -> DataFrame:
    """Loader-ready SFT sequences WITH loss masks: join per-turn rows
    (a :func:`chat_spans` frame — its ``join_sep`` must match this
    one) to a packing assignment frame (``id, shard, seq_id`` —
    pack_greedy output or any deterministic assignment), concatenate
    each sequence's conversations in id order separated by
    ``doc_sep``, and SHIFT every turn's span into sequence
    coordinates.  Returns (shard, seq_id, seq_text, n_convs,
    mask_spans array<struct<start,end>>, train_chars); the invariant
    ``seq_text[start:end] == turn content`` holds for every mask span
    (pinned in tests).

    Shape: one conv-level rollup (groups bounded by turns per conv),
    one join on the id, one cumulative-length window per sequence and
    one final rollup (groups bounded by convs per sequence) — no UDFs,
    shuffles only on conv id and (shard, seq_id)."""
    sorted_turns = F.array_sort(F.collect_list(F.struct(
        "turn_idx", "content", "char_start", "char_end", "train_mask")))
    conv = (turns.groupBy(id_col).agg(sorted_turns.alias("__ts"))
            .select(
                id_col,
                F.concat_ws(join_sep, F.transform(
                    F.col("__ts"), lambda s: s["content"]))
                 .alias("__conv_text"),
                F.transform(
                    F.filter(F.col("__ts"), lambda s: s["train_mask"]),
                    lambda s: F.struct(
                        s["char_start"].alias("start"),
                        s["char_end"].alias("end"))).alias("__spans")))
    asg = assignments.select(F.col(id_col), "shard", "seq_id")
    j = conv.join(asg, id_col)
    w = (Window.partitionBy("shard", "seq_id").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    off = F.coalesce(
        F.sum(F.length("__conv_text") + len(doc_sep)).over(w), F.lit(0))
    shifted = F.transform(
        F.col("__spans"),
        lambda s: F.struct((s["start"] + F.col("__off")).alias("start"),
                           (s["end"] + F.col("__off")).alias("end")))
    per_conv = (j.withColumn("__off", off)
                 .select("shard", "seq_id", F.col(id_col),
                         "__conv_text", shifted.alias("__shifted")))
    by_id = F.array_sort(F.collect_list(F.struct(
        F.col(id_col), F.col("__conv_text"), F.col("__shifted"))))
    return (per_conv.groupBy("shard", "seq_id")
            .agg(by_id.alias("__cs"))
            .select(
                "shard", "seq_id",
                F.concat_ws(doc_sep, F.transform(
                    F.col("__cs"), lambda s: s["__conv_text"]))
                 .alias("seq_text"),
                F.size("__cs").alias("n_convs"),
                F.flatten(F.transform(
                    F.col("__cs"), lambda s: s["__shifted"]))
                 .alias("mask_spans"))
            .withColumn(
                "train_chars",
                F.aggregate("mask_spans", F.lit(0).cast("long"),
                            lambda a, s: a + s["end"] - s["start"])))
