"""Corpus mixing and sharding: data-dependent sampling rates + layout.

Two pipeline steps that sit between curation and training:

* **Domain mixing** — given target mix *weights* per domain (source),
  compute each domain's keep-rate from the corpus' actual composition
  and downsample deterministically to hit the mix. Unlike
  ``stratified_hash_sample`` (caller supplies literal rates), the rates
  here are *data-dependent*: rate_s = min(1, budget * w_s / n_s), with
  n_s the observed domain size. Membership stays a pure hash function
  of the row, so the mix is reproducible across engines and reruns.

* **Shard assignment** — the deterministic global shuffle before shard
  writing: every row gets a pseudo-random but reproducible 31-bit
  coordinate from an LCG over its key (Knuth/glibc constants — chosen
  because the arithmetic is exact BIGINT mod, portable to any engine,
  unlike engine-private hashes such as xxhash64/murmur), and
  ``shard = coord % n_shards``. Training-order shuffle = sort by
  (shard, coord); shard writing = ``repartition(shard)`` + write. The
  balance report proves the LCG spreads keys uniformly.

Scale shape: domain sizes are one map-side-combined aggregation over
the domain column (output rows = #domains, broadcast back as a join of
a tiny dim — Catalyst broadcasts it automatically); the keep predicate
is row-local. Shard assignment is pure row-local arithmetic; its
balance report is one shuffle on n_shards keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from table_demo_spark.operators.sampling import _HEX_WIDTH, sample_hash_expr

# glibc rand() LCG constants — exact in BIGINT for keys < ~8.4e9
LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2147483648  # 2^31


def lcg_coord(key: Column) -> Column:
    """31-bit deterministic shuffle coordinate of a BIGINT key."""
    return (key.cast("long") * LCG_A + LCG_C) % LCG_M


def domain_mix(
    df: DataFrame,
    domain_col: str,
    weight: Column,
    budget_frac: float,
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Downsample each domain toward a target mix.

    ``weight`` is a Column giving each row's domain weight (any
    deterministic expression over the domain — a literal CASE, a join
    against a weights table, ...). The sampled corpus targets
    ``budget_frac * count(df)`` total rows distributed across domains
    proportionally to their normalized weights, except that a domain
    can never be *up*-sampled: rate is capped at 1.0 (the standard
    sampling-without-replacement mixing rule; oversampling is an
    epoch-level concern, not a corpus-materialization one).

    Returns the per-domain report (domain, n_domain, rate, n_kept) —
    the materialized sample itself is the intermediate ``kept`` frame;
    callers wanting rows instead of the report use
    :func:`domain_mix_rows`."""
    return _mix_report(
        domain_mix_rows(df, domain_col, weight, budget_frac, key_col, salt),
        df,
        domain_col,
    )


def _rates(
    df: DataFrame, domain_col: str, weight: Column, budget_frac: float
) -> DataFrame:
    """Per-domain keep-rate: min(1, budget * total * w_norm / n_s)."""
    sizes = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_domain"),
        F.first(weight).alias("w"),
    )
    # unpartitioned window over the *domain-sizes* frame — #domains
    # rows, not the corpus; a single tiny partition by construction
    tot = F.sum("n_domain").over(Window.partitionBy())
    wsum = F.sum("w").over(Window.partitionBy())
    return sizes.select(
        domain_col,
        "n_domain",
        F.least(
            F.lit(1.0),
            F.lit(budget_frac) * tot * (F.col("w") / wsum) / F.col("n_domain"),
        ).alias("rate"),
    )


def domain_mix_rows(
    df: DataFrame,
    domain_col: str,
    weight: Column,
    budget_frac: float,
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """The sampled rows (all input columns + the domain's rate)."""
    rates = _rates(df, domain_col, weight, budget_frac)
    coord = sample_hash_expr(F.col(key_col), salt)
    # threshold hex computed from the data-dependent rate, same
    # fixed-width-lexicographic trick as sampling.rate_threshold_hex.
    # rate >= 1.0 must short-circuit to keep-all: its hex literal would
    # be 7 chars wide ('1000000') and lexicographically BELOW most
    # 6-char coordinates.
    thr = F.format_string(
        f"%0{_HEX_WIDTH}x",
        F.floor(F.least(F.col("rate"), F.lit(1.0)) * F.lit(float(16**_HEX_WIDTH)))
        .cast("int"),
    )
    return df.join(rates, domain_col).filter(
        (F.col("rate") >= 1.0) | (coord < thr)
    )


def _mix_report(kept: DataFrame, df: DataFrame, domain_col: str) -> DataFrame:
    report = kept.groupBy(domain_col, "n_domain", "rate").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept")
    )
    # zero-fill domains whose rate rounded below one row
    all_domains = df.select(domain_col).distinct()
    return all_domains.join(report, domain_col, "left").select(
        domain_col,
        F.coalesce("n_domain", F.lit(0).cast("long")).alias("n_domain"),
        F.coalesce("rate", F.lit(0.0)).alias("rate"),
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
    )


def shard_assign(
    df: DataFrame, key_col: str, n_shards: int
) -> DataFrame:
    """Row-local deterministic shard id + shuffle coordinate."""
    coord = lcg_coord(F.col(key_col))
    return df.withColumn("shuffle_coord", coord).withColumn(
        "shard", (coord % n_shards).cast("int")
    )


def shard_balance_report(
    df: DataFrame, key_col: str, n_shards: int, bytes_col: str | None = None
) -> DataFrame:
    """Per-shard balance: (shard, n_rows, min_coord, max_coord[,
    n_bytes]) — the evidence that the deterministic shuffle spreads
    keys and bytes uniformly, which is what makes the downstream
    ``repartition(shard).write`` produce equal-sized training shards."""
    sharded = shard_assign(df, key_col, n_shards)
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("shuffle_coord").alias("min_coord"),
        F.max("shuffle_coord").alias("max_coord"),
    ]
    if bytes_col is not None:
        aggs.append(F.sum(F.col(bytes_col)).cast("long").alias("n_bytes"))
    return sharded.groupBy("shard").agg(*aggs)


def epoch_plan(
    df: DataFrame,
    domain_col: str,
    weight: Column,
    budget_factor: float,
    key_col: str = "doc_id",
    salt: str = "epoch",
) -> DataFrame:
    """Oversampling plan: epochs + fractional pass per domain.

    The counterpart to :func:`domain_mix` for targets LARGER than the
    corpus: a domain whose target exceeds its size is repeated
    ``full_epochs`` times wholesale plus one deterministic fractional
    pass (hash-sampled at ``frac_rate``), the standard epoch-based
    up-sampling rule for training mixes. Returns per-domain
    (domain, n_domain, target_n, full_epochs, frac_rate, n_effective)
    where n_effective = full_epochs * n_domain + |fractional pass| —
    the materialization itself is a union of full copies + the sampled
    remainder, all deterministic.

    Scale shape: identical to domain_mix — one tiny per-domain
    aggregate, broadcast back, row-local hash predicate for the
    fractional membership."""
    sizes = df.groupBy(domain_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_domain"),
        F.first(weight).alias("w"),
    )
    tot = F.sum("n_domain").over(Window.partitionBy())
    wsum = F.sum("w").over(Window.partitionBy())
    plan = sizes.select(
        domain_col,
        "n_domain",
        (
            F.lit(budget_factor) * tot * (F.col("w") / wsum)
        ).alias("target_n"),
    ).select(
        domain_col,
        "n_domain",
        "target_n",
        F.floor(F.col("target_n") / F.col("n_domain")).cast("long").alias(
            "full_epochs"
        ),
        (
            F.col("target_n") / F.col("n_domain")
            - F.floor(F.col("target_n") / F.col("n_domain"))
        ).alias("frac_rate"),
    )
    coord = sample_hash_expr(F.col(key_col), salt)
    thr = F.format_string(
        f"%0{_HEX_WIDTH}x",
        F.floor(F.col("frac_rate") * F.lit(float(16**_HEX_WIDTH))).cast("int"),
    )
    frac_kept = (
        df.join(plan, domain_col)
        .filter(coord < thr)
        .groupBy(domain_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_frac"))
    )
    return (
        plan.join(frac_kept, domain_col, "left")
        .select(
            domain_col,
            "n_domain",
            "target_n",
            "full_epochs",
            "frac_rate",
            (
                F.col("full_epochs") * F.col("n_domain")
                + F.coalesce("n_frac", F.lit(0).cast("long"))
            ).alias("n_effective"),
        )
    )
