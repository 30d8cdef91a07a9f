"""Distributed BPE vocabulary training — fully declarative merge rounds.

Byte-pair-encoding training alternates (1) count adjacent token
pairs, (2) pick the most frequent, (3) rewrite every sequence with
the pair merged greedily left-to-right non-overlapping. Step (3) is
the part engines usually punt to per-row Python; here it is pure
relational algebra, which is what lets the rewrite run partition-
parallel over a 100 TB corpus:

- pair at position i matches the round's top pair (the learned pair
  is a single row — collected once per round and re-broadcast as a
  literal, the same O(1) bytes Spark's own broadcast exchange ships
  through the driver — which truncates lineage between rounds);
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


def _collect_top(paired: DataFrame) -> tuple[DataFrame, str, int]:
    """Execute one round's top-pair aggregate and return it re-bound
    as a 1-row LITERAL frame (plus its values). The learned merge is
    O(1) bytes — the same single row Spark's own broadcast exchange
    would ship through the driver — and re-binding it as a literal
    TRUNCATES the logical plan between rounds: round r+1's lineage no
    longer references round r's aggregation subtree, which is what
    lets superseded per-round caches actually be freed (ADVICE r3; a
    lazily-chained plan must keep every prior round cached or
    recompute quadratically). The aggregate itself stays fully
    distributed: min_by with map-side partials, pinned by
    tests/test_plans.py::test_bpe_round_top_pair_is_min_by_aggregate."""
    row = _top_pair(paired).collect()[0]
    spark = paired.sparkSession
    lit = spark.createDataFrame(
        [(row["top_pair"], int(row["top_cnt"]))],
        "top_pair string, top_cnt long",
    )
    return lit, row["top_pair"], int(row["top_cnt"])


def _materialize_round(
    df: DataFrame, prev_dir: str | None
) -> tuple[DataFrame, str, int]:
    """Materialize one round's rewritten corpus to scratch parquet and
    read it back, deleting the superseded round's files.

    This is TRUE lineage truncation, which ``persist()`` is not: a
    persisted round keeps its full upstream plan nested inside the
    InMemoryRelation, so after r rounds the logical/explain tree holds
    r nested generations — measured at sf0.1 the per-round wall time
    compounded ~1.3x/round (1.2s at round 7 -> 6.4s at round 12) and
    the driver OOM'd in plan stringification at round 13. The scratch
    round-trip makes every round's plan a fresh parquet scan: flat
    per-round cost at 32 rounds (docs/SCALE.md), state bounded at one
    on-disk round per chain. The row count reads parquet footer
    metadata only. At cluster scale the scratch dir is durable shared
    storage and this becomes the standard checkpoint-per-iteration
    pattern."""
    import shutil

    from table_demo_spark.scratch import scratch_dir

    d = scratch_dir("tds-bpe-round-")
    df.write.mode("overwrite").parquet(d)
    out = df.sparkSession.read.parquet(d)
    n = out.count()
    if prev_dir is not None:
        shutil.rmtree(prev_dir, ignore_errors=True)
    return out, d, int(n)


def bpe_train(docs: DataFrame, iters: int = 3, text_col: str = "text") -> DataFrame:
    """(round, merge_pair, pair_cnt, n_tokens_after) per round.

    The loop is EAGER with O(1) driver/executor state per round: the
    learned pair is collected (1 row) and re-broadcast as a literal,
    the rewritten corpus is checkpointed to scratch parquet
    (:func:`_materialize_round` — true lineage truncation; r3's
    persist-per-round kept every generation nested in the plan and
    compounded per-round cost), and the superseded round's files are
    deleted. Block-manager and plan size are flat no matter how many
    rounds run — the 32-round curve is in docs/SCALE.md."""
    spark = docs.sparkSession
    tp = _tokens_positions(docs, text_col)
    cur_dir = None
    rows = []
    for r in range(1, iters + 1):
        paired = _paired(tp)
        top_lit, pair, cnt = _collect_top(paired)
        tp, cur_dir, n_after = _materialize_round(
            apply_merge(paired, top_lit), cur_dir
        )
        rows.append((r, pair, cnt, n_after))
    if cur_dir is not None:
        import shutil

        shutil.rmtree(cur_dir, ignore_errors=True)  # result is literal
    return spark.createDataFrame(
        rows,
        "round long, merge_pair string, pair_cnt long, n_tokens_after long",
    )


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
    both chains are rewritten with that (literal, broadcast) pair via
    the same run-parity ``apply_merge`` — application is the identical
    relational rewrite with a fixed pair, so the apply path inherits
    training's partition-parallel scale shape. The loop is eager with
    the same scratch-checkpoint discipline as :func:`bpe_train` (one
    on-disk round per chain, superseded rounds deleted, the train
    chain's files released entirely once merges are learned). Returns
    per-apply-doc stats: (doc_id, n_before, n_after, n_merged) where
    n_merged counts tokens containing a learned merge (the SEP
    marker). The returned frame scans the FINAL apply-chain scratch
    files, so that one directory outlives the call (tmpfs, one round's
    tokens; freed on reboot or by the caller's scratch lifecycle)."""
    import shutil

    tp_train = _tokens_positions(train_docs, text_col)
    tp_apply = _tokens_positions(apply_docs, text_col)
    before = tp_apply.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    dir_t = dir_a = None
    for _ in range(iters):
        pt = _paired(tp_train)
        top_lit, _, _ = _collect_top(pt)
        tp_train, dir_t, _ = _materialize_round(
            apply_merge(pt, top_lit), dir_t
        )
        tp_apply, dir_a, _ = _materialize_round(
            apply_merge(_paired(tp_apply), top_lit), dir_a
        )
    if dir_t is not None:
        shutil.rmtree(dir_t, ignore_errors=True)  # merges learned
    after = tp_apply.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_after"),
        F.sum(F.col("tok").contains(SEP).cast("int"))
        .cast("long")
        .alias("n_merged"),
    )
    return before.join(after, "doc_id")
