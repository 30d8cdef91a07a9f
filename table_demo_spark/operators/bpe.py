"""Distributed BPE vocabulary training — fully declarative merge rounds.

Byte-pair-encoding training alternates (1) count adjacent token
pairs, (2) pick the most frequent, (3) rewrite every sequence with
the pair merged greedily left-to-right non-overlapping. Step (3) is
the part engines usually punt to per-row Python; here it is pure
relational algebra, which is what lets the rewrite run partition-
parallel over a 100 TB corpus:

- pair at position i matches the round's top pair (the top pair
  frame is BROADCAST into the plan — the chosen merge never touches
  the driver);
- greedy non-overlap == run-length parity: within each maximal run
  of consecutive matching positions, exactly the even offsets are
  merged ("x x x" -> "[x x] x"). Runs are gaps-and-islands
  (pos - row_number over matches), parity is (pos - run_start) % 2;
- the rewrite keeps a row unless its left neighbor merged, replaces
  merged heads with the joined token, and renumbers positions for
  the next round.

Each round is 2 shuffles on doc_id (the lead/lag windows) + 1 pair
count agg; ``iters`` rounds unroll into one plan the same way
operators/graph.py unrolls PageRank. Merged tokens embed the
non-whitespace separator SEP, so later rounds can merge merged
tokens unambiguously — true BPE, not bigram capping.

The DuckDB oracle (queries/llmops.py) is generated from the same
constants by the same loop, stating the identical parity rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Unit separator: cannot appear in whitespace-split tokens, so pair
# keys and merged tokens stay unambiguous even once merged tokens
# (which embed SEP) participate in later rounds. A space separator
# would collide ("a b"+"c" vs "a"+"b c").
SEP = "\x1f"


def _tokens_positions(docs: DataFrame, text_col: str) -> DataFrame:
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    return docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "tok")
    )


def apply_merge(paired: DataFrame, top: DataFrame) -> DataFrame:
    """Rewrite a (doc_id, pos, tok, nxt) frame with the single merge
    pair in the 1-row broadcast ``top`` frame — the greedy
    non-overlapping run-parity rewrite (module docstring). Shared by
    training (_one_round) and tokenizer APPLICATION (bpe_train_apply's
    held-out chain): applying a learned vocabulary is the identical
    relational rewrite with a fixed pair instead of a learned one."""
    wm = Window.partitionBy("doc_id").orderBy("pos")
    marked = paired.crossJoin(F.broadcast(top)).withColumn(
        "m",
        F.col("nxt").isNotNull()
        & (F.concat_ws(SEP, "tok", "nxt") == F.col("top_pair")),
    )
    runs = marked.withColumn(
        "grp",
        F.when(
            F.col("m"),
            F.col("pos")
            - F.row_number().over(
                Window.partitionBy("doc_id", "m").orderBy("pos")
            ),
        ),
    )
    wrun = Window.partitionBy("doc_id", "grp")
    accepted = runs.withColumn(
        "acc",
        F.col("m")
        & (((F.col("pos") - F.min("pos").over(wrun)) % 2) == 0),
    )
    with_prev = accepted.withColumn(
        "prev_acc",
        F.coalesce(F.lag("acc").over(wm), F.lit(False)),
    )
    return (
        with_prev.filter(~F.col("prev_acc"))
        .select(
            "doc_id",
            "pos",
            F.when(
                F.col("acc"), F.concat_ws(SEP, "tok", "nxt")
            ).otherwise(F.col("tok")).alias("tok"),
        )
        .withColumn(
            "pos",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("pos"))
            - 1,
        )
    )


def _paired(tp: DataFrame) -> DataFrame:
    w = Window.partitionBy("doc_id").orderBy("pos")
    return tp.withColumn("nxt", F.lead("tok").over(w))


def _top_pair(paired: DataFrame) -> DataFrame:
    """1-row (top_pair, top_cnt) frame from a paired token frame."""
    counts = (
        paired.filter(F.col("nxt").isNotNull())
        .groupBy(F.concat_ws(SEP, "tok", "nxt").alias("pair"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    # Top-1 pair needs no sort at all: a single min_by aggregate with
    # map-side partials. Ordering key (-cnt, pair) == (cnt DESC,
    # pair ASC), the same deterministic tie-break the oracle states.
    # Unlike a global row_number window this never funnels the
    # corpus-sized pair vocabulary through one task.
    return counts.agg(
        F.min_by(
            F.struct(F.col("pair"), F.col("cnt")),
            F.struct((-F.col("cnt")).alias("neg_cnt"), F.col("pair")),
        ).alias("t")
    ).select(
        F.col("t.pair").alias("top_pair"), F.col("t.cnt").alias("top_cnt")
    )


def _one_round(tp: DataFrame, rnd: int) -> tuple[DataFrame, DataFrame]:
    """(merge_row, rewritten) — merge_row is 1 row (round, pair, cnt)."""
    paired = _paired(tp)
    top = _top_pair(paired)
    rewritten = apply_merge(paired, top)
    merge_row = top.select(
        F.lit(rnd).cast("long").alias("round"),
        F.col("top_pair").alias("merge_pair"),
        F.col("top_cnt").alias("pair_cnt"),
    )
    return merge_row, rewritten


def bpe_train(docs: DataFrame, iters: int = 3, text_col: str = "text") -> DataFrame:
    """(round, merge_pair, pair_cnt, n_tokens_after) per round.

    Each round's rewritten corpus IS persisted — the opposite call to
    operators/graph.py's pagerank, decided by the same A/B: here the
    re-derived lineage is two full window passes over the exploded
    corpus and every round has three consumers (next round's count,
    next round's rewrite, the n_tokens_after audit), so recompute
    grows quadratically with rounds; measured at sf0.1, per-round
    persist is 7.2s -> 4.6s. Materialize-the-iteration-invariant pays
    exactly when lineage cost x consumer count beats cache overhead."""
    tp = _tokens_positions(docs, text_col)
    out = None
    for r in range(1, iters + 1):
        merge_row, tp = _one_round(tp, r)
        tp = tp.persist()
        after = tp.agg(F.count(F.lit(1)).cast("long").alias("n_tokens_after"))
        row = merge_row.crossJoin(F.broadcast(after))
        out = row if out is None else out.unionByName(row)
    return out


def bpe_train_apply(
    train_docs: DataFrame,
    apply_docs: DataFrame,
    iters: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Train merges on one corpus, TOKENIZE another with them — the
    train -> apply split t20's self-training lacks (a production
    tokenizer is learned once and applied to every later crawl).

    Per round, the top pair comes from the TRAIN chain's counts only;
    both chains are rewritten with that (broadcast) pair via the same
    run-parity ``apply_merge`` — application is the identical
    relational rewrite with a fixed pair, so the apply path inherits
    training's partition-parallel scale shape. Both chains persist per
    round (bpe_train's measured A/B). Returns per-apply-doc stats:
    (doc_id, n_before, n_after, n_merged) where n_merged counts tokens
    containing a learned merge (the SEP marker)."""
    tp_train = _tokens_positions(train_docs, text_col)
    tp_apply = _tokens_positions(apply_docs, text_col)
    before = tp_apply.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    for _ in range(iters):
        top = _top_pair(_paired(tp_train))
        tp_train = apply_merge(_paired(tp_train), top).persist()
        tp_apply = apply_merge(_paired(tp_apply), top).persist()
    after = tp_apply.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_after"),
        F.sum(F.col("tok").contains(SEP).cast("int"))
        .cast("long")
        .alias("n_merged"),
    )
    return before.join(after, "doc_id")
