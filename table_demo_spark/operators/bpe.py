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
    tests/test_plans.py::test_bpe_round_top_pair_is_min_by_aggregate.

    Returns (None, None, None) when the corpus has no adjacent pair
    left (every doc down to one token) — callers stop with the merges
    learned so far instead of crashing on the null aggregate row."""
    row = _top_pair(paired).collect()[0]
    if row["top_pair"] is None:
        return None, None, None
    spark = paired.sparkSession
    lit = spark.createDataFrame(
        [(row["top_pair"], int(row["top_cnt"]))],
        "top_pair string, top_cnt long",
    )
    return lit, row["top_pair"], int(row["top_cnt"])


_CHECKPOINT_EVERY = 4  # scratch-checkpoint cadence (rounds)


def _scratch_checkpoint(
    df: DataFrame, count: bool
) -> tuple[DataFrame, str, int | None]:
    """Write one round's rewritten corpus to scratch parquet and read
    it back — TRUE lineage truncation, which ``persist()`` is not: a
    persisted round keeps its full upstream plan nested inside the
    InMemoryRelation. The read-back frame's plan is a flat parquet
    scan. The optional row count reads parquet footer metadata only.
    At cluster scale the scratch dir is durable shared storage and
    this is the standard checkpoint-per-iteration pattern."""
    from table_demo_spark.scratch import scratch_dir

    d = scratch_dir("tds-bpe-round-")
    df.write.mode("overwrite").parquet(d)
    out = df.sparkSession.read.parquet(d)
    n = int(out.count()) if count else None
    return out, d, n


class _ChainState:
    """Bounded materialization for one merge-loop chain, balancing the
    r3 and r4 failure modes (both measured, docs/SCALE.md):

    - persist-EVERY-round (r3) is cheap per round but nests one
      InMemoryRelation generation per round into the plan — per-round
      wall time compounded ~1.3x/round and the driver OOM'd in plan
      stringification at round 13;
    - scratch-checkpoint-EVERY-round (r4) bounds the plan at one
      generation but pays a parquet write+read+count per round — a
      2.1x constant-factor regression at the registered queries'
      3-round operating point.

    So: persist between checkpoints (at most TWO cached generations —
    a round's cache may only be dropped once its successor's cache is
    populated, which happens during the next round's top-pair
    collect), and scratch-checkpoint every ``_CHECKPOINT_EVERY``
    rounds, unpersisting the cached generations and deleting the
    superseded scratch dir. Plan depth and block-manager state are
    bounded by the cadence no matter how many rounds run; rounds
    below the cadence (every registered query) never touch disk."""

    def __init__(self) -> None:
        self.dir: str | None = None
        self.caches: list[DataFrame] = []

    def advance(
        self, df: DataFrame, round_no: int, count: bool = True
    ) -> tuple[DataFrame, int | None]:
        import shutil

        if round_no % _CHECKPOINT_EVERY == 0:
            out, d, n = _scratch_checkpoint(df, count)
            for c in self.caches:
                c.unpersist()
            self.caches = []
            if self.dir is not None:
                shutil.rmtree(self.dir, ignore_errors=True)
            self.dir = d
            return out, n
        cached = df.persist()
        n = int(cached.count()) if count else None
        self.caches.append(cached)
        while len(self.caches) > 2:
            self.caches.pop(0).unpersist()
        return cached, n

    def release(self) -> None:
        import shutil

        for c in self.caches:
            c.unpersist()
        self.caches = []
        if self.dir is not None:
            shutil.rmtree(self.dir, ignore_errors=True)
            self.dir = None


def bpe_train(docs: DataFrame, iters: int = 3, text_col: str = "text") -> DataFrame:
    """(round, merge_pair, pair_cnt, n_tokens_after) per round.

    The loop is EAGER with bounded driver/executor state: the learned
    pair is collected (1 row) and re-broadcast as a literal (which
    truncates the TOP side's lineage), and the rewritten corpus
    advances through :class:`_ChainState` — memory persist per round,
    scratch checkpoint every ``_CHECKPOINT_EVERY`` rounds. All scratch
    and cache state is released before returning (the result is a
    literal frame)."""
    spark = docs.sparkSession
    tp = _tokens_positions(docs, text_col)
    chain = _ChainState()
    rows = []
    try:
        for r in range(1, iters + 1):
            paired = _paired(tp)
            top_lit, pair, cnt = _collect_top(paired)
            if top_lit is None:  # corpus exhausted: no pair left
                break
            tp, n_after = chain.advance(apply_merge(paired, top_lit), r)
            rows.append((r, pair, cnt, n_after))
    finally:
        chain.release()
    return spark.createDataFrame(
        rows,
        "round long, merge_pair string, pair_cnt long, n_tokens_after long",
    )


def bpe_learn(
    docs: DataFrame, iters: int = 3, text_col: str = "text"
) -> list[str]:
    """Learn ``iters`` merges and return the SEP-joined pair strings
    in priority (learning) order — the artifact a production tokenizer
    ships. The loop is :func:`bpe_train`'s (eager, bounded chain
    state) without the per-round row counts; feed the result to
    :func:`bpe_apply_vocab` for the one-pass corpus tokenization."""
    tp = _tokens_positions(docs, text_col)
    chain = _ChainState()
    merges: list[str] = []
    try:
        for r in range(1, iters + 1):
            paired = _paired(tp)
            top_lit, pair, _cnt = _collect_top(paired)
            if top_lit is None:  # corpus exhausted: no pair left
                break
            tp, _ = chain.advance(
                apply_merge(paired, top_lit), r, count=False
            )
            merges.append(pair)
    finally:
        chain.release()
    return merges


BPE_APPLY_SCHEMA = "doc_id long, n_before long, n_after long, n_merged long"


def bpe_apply_vocab(
    docs: DataFrame, merges: list[str], text_col: str = "text"
) -> DataFrame:
    """Tokenize a corpus with a LEARNED merge list in ONE corpus pass —
    the production apply path. The per-round relational rewrite is the
    right *training* shape (pair counts need the corpus), but
    *application* cost there is one full-corpus rewrite per merge; a
    real tokenizer has ~30k merges, so apply must be one pass that
    carries the whole vocabulary with it.

    The merge list (O(vocab) bytes) ships to every task as a closure
    constant — the same bytes a broadcast variable would ship — and an
    Arrow-batched ``mapInPandas`` applies ALL merges per document in
    priority order. Tokenization stays JVM-side (the identical
    ``split(trim(lower(text)))`` expression as ``_tokens_positions``,
    so the Python side cannot diverge on whitespace/locale semantics);
    per document, each merge is a greedy left-to-right non-overlapping
    scan — exactly ``apply_merge``'s run-parity semantics, proven
    equivalent by the t28 oracle gate which unrolls the relational
    rewrite round by round. A merged token IS its SEP-joined pair
    string, so matching compares ``tok + SEP + nxt`` against the pair
    string and no ambiguous splitting of SEP-embedded tokens occurs.
    A per-doc substring prefilter (pair in SEP-joined doc; false
    positives harmless, false negatives impossible) skips absent
    merges at C speed, which is the common case once the vocabulary
    outgrows any one document.

    Returns the same per-doc stats frame as :func:`bpe_train_apply`:
    (doc_id, n_before, n_after, n_merged). Zero shuffles, zero
    per-merge jobs: one corpus scan regardless of vocabulary size."""
    from collections.abc import Iterator

    import pandas as pd

    merge_list = list(merges)

    def tokenize_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for doc_id, toks in zip(pdf["doc_id"], pdf["toks"]):
                toks = list(toks)
                n_before = len(toks)
                joined = SEP.join(toks)
                for pair in merge_list:
                    if pair not in joined:
                        continue
                    merged = []
                    i = 0
                    n = len(toks)
                    changed = False
                    while i < n:
                        if (
                            i + 1 < n
                            and toks[i] + SEP + toks[i + 1] == pair
                        ):
                            merged.append(pair)
                            i += 2
                            changed = True
                        else:
                            merged.append(toks[i])
                            i += 1
                    if changed:
                        toks = merged
                        joined = SEP.join(toks)
                n_merged = sum(1 for t in toks if SEP in t)
                out_rows.append((doc_id, n_before, len(toks), n_merged))
            yield pd.DataFrame(
                out_rows,
                columns=["doc_id", "n_before", "n_after", "n_merged"],
            )

    toks_df = docs.select(
        "doc_id",
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("toks"),
    )
    # CPU-bound Python must not inherit a small input's file layout
    # (a single-file corpus would serialize the whole merge pass into
    # one task); fan_out's guard skips the shuffle when the scan
    # already has enough splits — and for streaming frames (q26)
    # always spreads the one-file micro-batch across the cluster.
    from table_demo_spark.sources.batch import fan_out

    return fan_out(toks_df).mapInPandas(
        tokenize_batches, schema=BPE_APPLY_SCHEMA
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
    training's partition-parallel scale shape. The train chain is
    eager (its top-pair collect executes each round) with
    :class:`_ChainState`'s bounded persist+checkpoint discipline; the
    APPLY chain builds lazily — its rounds have no per-round consumer,
    so all rounds between checkpoints fuse into ONE execution (every
    rewrite window partitions by doc_id, so the fused plan is one
    Exchange plus in-partition sorts) — and is scratch-checkpointed on
    the cadence plus once at the end. Returns per-apply-doc stats:
    (doc_id, n_before, n_after, n_merged) where n_merged counts tokens
    containing a learned merge (the SEP marker). The returned frame
    scans the FINAL apply-chain scratch files, so that one directory
    outlives the call (tmpfs, one round's tokens; freed on reboot or
    by the caller's scratch lifecycle)."""
    import shutil

    tp_train = _tokens_positions(train_docs, text_col)
    tp_apply = _tokens_positions(apply_docs, text_col)
    before = tp_apply.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_before")
    )
    t_chain = _ChainState()
    dir_a = None
    on_scratch = False
    try:
        for r in range(1, iters + 1):
            pt = _paired(tp_train)
            top_lit, _, _ = _collect_top(pt)
            if top_lit is None:  # train corpus exhausted: no pair left
                break
            tp_train, _ = t_chain.advance(
                apply_merge(pt, top_lit), r, count=False
            )
            tp_apply = apply_merge(_paired(tp_apply), top_lit)
            on_scratch = False
            if r % _CHECKPOINT_EVERY == 0:
                tp_apply, d, _ = _scratch_checkpoint(tp_apply, count=False)
                if dir_a is not None:
                    shutil.rmtree(dir_a, ignore_errors=True)
                dir_a = d
                on_scratch = True
    finally:
        t_chain.release()  # merges learned
    if not on_scratch:
        tp_apply, d, _ = _scratch_checkpoint(tp_apply, count=False)
        if dir_a is not None:
            shutil.rmtree(dir_a, ignore_errors=True)
    after = tp_apply.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_after"),
        F.sum(F.col("tok").contains(SEP).cast("int"))
        .cast("long")
        .alias("n_merged"),
    )
    return before.join(after, "doc_id")
