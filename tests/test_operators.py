"""Unit tests for operators with semantics beyond what the oracle-parity
suite exercises: as-of join edges, strict CSV parsing errors."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

UTC = dt.timezone.utc


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s).replace(tzinfo=None)


def test_asof_join_semantics(spark):
    from table_demo_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-01T00:10:00")),  # after two right rows
            (2, 10, _ts("2024-01-01T00:05:00")),  # exactly at a right ts
            (3, 10, _ts("2024-01-01T00:00:30")),  # between right rows
            (4, 20, _ts("2024-01-01T00:01:00")),  # key with no right rows
            (5, 30, _ts("2024-01-01T00:00:00")),  # before the only right row
        ],
        "id long, k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01T00:00:00")),
            (101, 10, _ts("2024-01-01T00:05:00")),
            (102, 30, _ts("2024-01-01T00:01:00")),
        ],
        "rid long, k long, rts timestamp",
    )
    out = {
        r["id"]: r["rid_asof"]
        for r in asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts", value_cols=["rid"]
        ).collect()
    }
    assert out == {1: 101, 2: 101, 3: 100, 4: None, 5: None}


def test_taxi_csv_strict_parse_errors(spark):
    from table_demo_spark.sources.taxi_csv import parse_taxi_csv

    bad_arity = spark.createDataFrame([("1,START,too,few",)], "line string")
    with pytest.raises(Exception, match="Invalid record"):
        parse_taxi_csv(bad_arity).collect()

    bad_type = spark.createDataFrame(
        [("1,MIDDLE,2013-01-01 00:00:00,2013-01-01 00:20:00,0,0,0,0,1",)],
        "line string",
    )
    with pytest.raises(Exception, match="Invalid record"):
        parse_taxi_csv(bad_type).collect()


def test_taxi_csv_empty_coord_default_and_swap(spark):
    from table_demo_spark.sources.taxi_csv import parse_taxi_csv

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    lines = spark.createDataFrame(
        [
            ("7,END,2013-01-01 00:20:00,2013-01-01 00:00:00,,-74.0,,40.7,3",),
        ],
        "line string",
    )
    r = parse_taxi_csv(lines).collect()[0]
    assert not r["is_start"]
    # END events serialize endTime first (TaxiRide.java:77-80)
    assert r["end_time"] == _ts("2013-01-01T00:20:00")
    assert r["start_time"] == _ts("2013-01-01T00:00:00")
    assert r["start_lon"] == 0.0 and r["end_lon"] == 0.0
    assert r["start_lat"] == pytest.approx(-74.0)
    assert r["passenger_cnt"] == 3


def test_winnow_numpy_equals_expression_reference(spark):
    """The Arrow-vectorized winnowing implementation must produce
    exactly the native-expression reference's fingerprint sets."""
    from table_demo_spark.functions.text import (
        with_winnow_fingerprints,
        with_winnow_fingerprints_expr,
    )
    from table_demo_spark.sources.batch import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    a = (
        with_winnow_fingerprints(docs)
        .select("doc_id", "fps")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    b = (
        with_winnow_fingerprints_expr(docs)
        .select("doc_id", "fps")
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(a) == len(b) > 0
    for x, y in zip(a["fps"], b["fps"]):
        assert list(x) == list(y)


def test_ivf_topk_recall_vs_brute_force(spark):
    """IVF with all centroids probed == exact brute force (sanity), and
    with fewer probes stays a subset-ranked approximation."""
    from table_demo_spark.operators.similarity import brute_force_topk, ivf_topk
    from table_demo_spark.sources.batch import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 4)
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_topk(emb, q, k=3).collect()
    }
    full_probe = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ivf_topk(emb, q, k=3, n_centroids=8, n_probe=8).collect()
    }
    assert full_probe == exact


def test_asof_join_takes_matched_right_row_atomically(spark):
    """A NULL in one value column of the latest right row must surface
    as NULL — not silently backfill from an older right row (the whole
    right row is carried as one struct)."""
    from table_demo_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T00:10:00"))], "id long, k long, lts timestamp"
    )
    right = spark.createDataFrame(
        [
            (100, "old", 10, _ts("2024-01-01T00:00:00")),
            (101, None, 10, _ts("2024-01-01T00:05:00")),  # latest; v is NULL
        ],
        "rid long, v string, k long, rts timestamp",
    )
    row = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        value_cols=["rid", "v"],
    ).collect()[0]
    assert row["rid_asof"] == 101
    assert row["v_asof"] is None  # NOT "old"


def test_connected_components_min_label(spark):
    """Two multi-hop components + a singleton edge pair: every node
    must get the min node id of its component, regardless of edge
    direction or chain length."""
    from table_demo_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(5, 3), (3, 9), (9, 11), (20, 21), (40, 2), (2, 1)],
        "src long, dst long",
    )
    got = {
        (r.id, r.component)
        for r in connected_components(edges).collect()
    }
    assert got == {
        (3, 3), (5, 3), (9, 3), (11, 3),
        (20, 20), (21, 20),
        (1, 1), (2, 1), (40, 1),
    }


def test_merge_into_upsert_delete_insert(spark):
    """MERGE semantics against a hand-computed result: matched 'U'
    replaces the whole row, 'D' removes the key, unmatched 'U'
    inserts, untouched target rows pass through."""
    from table_demo_spark.operators.merge import merge_into

    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, v double",
    )
    source = spark.createDataFrame(
        [(2, "B", 99.0, "U"), (3, None, 0.0, "D"), (4, "d", 40.0, "U")],
        "k long, name string, v double, __op string",
    )
    got = sorted(
        merge_into(target, source, ["k"]).collect(), key=lambda r: r.k
    )
    assert [(r.k, r.name, r.v) for r in got] == [
        (1, "a", 10.0),
        (2, "B", 99.0),
        (4, "d", 40.0),
    ]


def test_merge_into_null_column_replaces_atomically(spark):
    """A 'U' row with a NULL value column must still replace the whole
    target row (struct-atomic) — never keep the target's old value for
    just that column."""
    from table_demo_spark.operators.merge import merge_into

    target = spark.createDataFrame([(1, "a", 10.0)], "k long, name string, v double")
    source = spark.createDataFrame(
        [(1, None, 99.0, "U")], "k long, name string, v double, __op string"
    )
    [row] = merge_into(target, source, ["k"]).collect()
    assert (row.k, row.name, row.v) == (1, None, 99.0)


def test_decontaminate_flags_exact_overlaps(spark):
    """A train doc sharing a 5-gram with the benchmark is contaminated;
    one with no shared 5-gram is not; short docs (<n tokens) have zero
    grams and pass clean."""
    from table_demo_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (1, "we saw the quick brown fox jumps right past us"),
            (2, "completely unrelated words in this sentence here"),
            (3, "too short"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in decontaminate(train, bench, n=5).collect()}
    assert rows[1].contaminated and rows[1].n_hits == 1
    assert not rows[2].contaminated and rows[2].n_hits == 0
    assert rows[3].n_grams == 0 and not rows[3].contaminated


def test_audio_chunk_grid_matches_reference(spark):
    """Chunk grid vs a straight-Python reference: boundaries, count,
    and head bytes for a known payload length."""
    from table_demo_spark.operators import multimodal as M

    text = "x" * 100  # 100 bytes -> 50 ms at 2 bytes/ms -> one 40ms chunk
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    rows = M.audio_chunks(M.with_binary_payload(docs)).collect()
    b = text.encode()
    dur = len(b) // M.AUDIO_BYTES_PER_MS
    expect_n = (dur - M.AUDIO_CHUNK_MS) // M.AUDIO_HOP_MS + 1
    assert len(rows) == expect_n == 1
    assert (rows[0].start_ms, rows[0].end_ms) == (0, M.AUDIO_CHUNK_MS)
    assert rows[0].head_hex == b[: M.AUDIO_HEAD_BYTES].hex().upper()


def test_permissive_jsonl_quarantines_corrupt_lines(spark):
    """Every truncated line must land in _corrupt with its raw text;
    clean lines parse fully. Counts partition exactly."""
    from pyspark.sql import functions as F

    from table_demo_spark.sources import formats
    from tests.conftest import SF_SMOKE

    path = formats.ensure_events_jsonl_dirty(spark, SF_SMOKE)
    # Spark disallows queries touching ONLY the corrupt column on raw
    # JSON scans (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    # — cache first, the documented workaround.
    df = formats.read_events_jsonl_permissive(spark, path).cache()
    total = df.count()
    bad = df.filter(F.col(formats.CORRUPT_COL).isNotNull())
    n_bad = bad.count()
    from table_demo_spark.sources.batch import load_table

    expected_bad = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_id") % formats.DIRTY_EVERY == 0)
        .count()
    )
    assert n_bad == expected_bad > 0
    # corrupt rows: raw text preserved, typed fields null
    r = bad.select(formats.CORRUPT_COL, "event_id").first()
    assert r[formats.CORRUPT_COL].startswith("{") and r["event_id"] is None
    assert df.filter(F.col(formats.CORRUPT_COL).isNull()).count() == total - n_bad
    df.unpersist()


def test_cms_never_undercounts_and_is_exact_when_wide(spark):
    """The defining CMS property: overcount >= 0 always; with width
    >> distinct values (no collisions) the estimate is exact."""
    from pyspark.sql import functions as F

    from table_demo_spark.operators.sketch import cms_heavy_hitters

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 3}") for i in range(40)], "doc_id long, text string"
    )
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    narrow = cms_heavy_hitters(toks, "tok", k=100, width=4).collect()
    assert all(r.overcount >= 0 for r in narrow)
    wide = cms_heavy_hitters(toks, "tok", k=100, width=4096).collect()
    assert all(r.overcount == 0 for r in wide)
    assert {r.value for r in wide} == {f"w{i}" for i in range(7)}


def test_zorder_write_prunes_row_groups(spark):
    """The point of z-ordering: a 2-d box predicate must be excludable
    by per-file (row-group) min/max statistics on BOTH columns for most
    files, while a random layout excludes nothing."""
    import glob
    import tempfile

    import pyarrow.parquet as pq

    from table_demo_spark.operators.layout import zorder_write
    from table_demo_spark.sources.batch import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_id", "user_id", "value"
    )
    base = tempfile.mkdtemp(prefix="tds-ztest-")
    zorder_write(
        ev, f"{base}/z", "user_id", "value",
        x_range=(0, 150), y_range=(0, 500), n_files=16,
    )
    # random layout control: same data, same file count, no clustering
    ev.repartition(16).write.parquet(f"{base}/rand")

    def intersecting(path: str) -> tuple[int, int]:
        u_lo, u_hi, v_lo, v_hi = 40, 60, 100.0, 200.0
        total = hit = 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }
            for rg in range(md.num_row_groups):
                total += 1
                su = md.row_group(rg).column(names["user_id"]).statistics
                sv = md.row_group(rg).column(names["value"]).statistics
                if (
                    su.min <= u_hi and su.max >= u_lo
                    and sv.min <= v_hi and sv.max >= v_lo
                ):
                    hit += 1
        return hit, total

    z_hit, z_total = intersecting(f"{base}/z")
    r_hit, r_total = intersecting(f"{base}/rand")
    assert r_hit == r_total  # random layout: every row group intersects
    assert z_hit < z_total // 2  # z-order: most row groups skippable


def test_materialize_changelog_latest_op_wins(spark):
    """Delete->reinsert and update-after-update fold to the latest op;
    a trailing delete removes the key entirely."""
    from table_demo_spark.operators.cdc import materialize_changelog

    rows = [
        # key 1: insert, update, update — latest update wins
        (1, 1, "I", "a"), (1, 2, "U", "b"), (1, 3, "U", "c"),
        # key 2: insert then delete — gone
        (2, 1, "I", "x"), (2, 2, "D", "x"),
        # key 3: insert, delete, re-insert — alive with the new payload
        (3, 1, "I", "old"), (3, 2, "D", "old"), (3, 3, "I", "new"),
    ]
    log = spark.createDataFrame(
        rows, "k long, version long, op string, payload string"
    )
    got = {
        r.k: (r.version, r.payload)
        for r in materialize_changelog(log, ["k"]).collect()
    }
    assert got == {1: (3, "c"), 3: (3, "new")}


def test_pq_topk_shape_and_determinism(spark):
    """PQ ADC returns exactly k ranked neighbors per query, never the
    query itself, and is bit-deterministic across runs."""
    from table_demo_spark.operators import similarity
    from table_demo_spark.sources.batch import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    q = emb.filter(F.col("vec_id") < 4)
    a = similarity.pq_topk(emb, q, k=5).collect()
    assert len(a) == 4 * 5
    by_q = {}
    for r in a:
        assert r.query_id != r.neighbor_id
        by_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())
    b = similarity.pq_topk(emb, q, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_compact_files_reduces_count(spark):
    """Compaction glues 64 fragment files into ceil(bytes/target)
    outputs without changing content."""
    import glob
    import tempfile

    from table_demo_spark.operators.layout import compact_files
    from table_demo_spark.sources.batch import load_table

    base = tempfile.mkdtemp(prefix="tds-ctest-")
    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id"
    )
    ev.repartition(64).write.parquet(f"{base}/frag")
    n = compact_files(spark, f"{base}/frag", f"{base}/out", target_bytes=1 << 20)
    files = glob.glob(f"{base}/out/part-*.parquet")
    assert len(files) == n < 8
    a = sorted(r.event_id for r in spark.read.parquet(f"{base}/out").collect())
    b = sorted(r.event_id for r in ev.collect())
    assert a == b


def test_substring_dup_stats_edges(spark):
    from table_demo_spark.operators.chunking import substring_dup_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i"),  # windows: abcdefgh, bcdefghi
            (2, "a b c d e f g h x"),  # shares window 1 with doc 1
            (3, "q r s"),              # < K tokens -> zero windows
            (4, "z " * 4),             # < K tokens
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_frac"])
        for r in substring_dup_stats(docs, "text", k=8).collect()
    }
    assert out[1] == (2, 1, 0.5)
    assert out[2] == (2, 1, 0.5)
    assert out[3] == (0, 0, 0.0)
    assert out[4] == (0, 0, 0.0)


def test_chunk_documents_geometry(spark):
    from table_demo_spark.operators.chunking import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(70)))],
        "doc_id long, text string",
    )
    rows = sorted(
        chunk_documents(docs, "text", size=32, stride=24).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # 70 tokens, stride 24 -> starts 1, 25, 49; last chunk truncated
    assert [(r["chunk_start"], r["n_chunk_tokens"]) for r in rows] == [
        (1, 32),
        (25, 32),
        (49, 22),
    ]
    # neighbouring chunks overlap by size - stride = 8 tokens
    assert rows[0]["chunk_sig"] != rows[1]["chunk_sig"]


def test_domain_mix_rate_cap_and_determinism(spark):
    from table_demo_spark.operators.mixing import domain_mix, domain_mix_rows

    rows = [(i, "small" if i < 4 else "big") for i in range(104)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w = F.when(F.col("source") == "small", F.lit(10.0)).otherwise(F.lit(1.0))
    rep = {r["source"]: r for r in domain_mix(df, "source", w, 0.5).collect()}
    # small domain's target (0.5*104*10/11 ~ 47) exceeds its 4 rows:
    # rate capped at 1.0, all rows kept — never upsampled
    assert rep["small"]["rate"] == 1.0
    assert rep["small"]["n_kept"] == 4
    assert 0.0 < rep["big"]["rate"] < 1.0
    # membership is a pure hash of the row: stable under repartitioning
    a = {r["doc_id"] for r in domain_mix_rows(df, "source", w, 0.5).collect()}
    b = {
        r["doc_id"]
        for r in domain_mix_rows(
            df.repartition(13), "source", w, 0.5
        ).collect()
    }
    assert a == b


def test_shard_assign_covers_all_shards(spark):
    from table_demo_spark.operators.mixing import shard_balance_report

    df = spark.range(0, 512).withColumnRenamed("id", "k")
    rep = shard_balance_report(df, "k", 8).collect()
    assert {r["shard"] for r in rep} == set(range(8))
    assert sum(r["n_rows"] for r in rep) == 512


def test_versioned_table_time_travel(spark, tmp_path):
    from table_demo_spark.operators.layout import VersionedParquetTable

    tbl = VersionedParquetTable(str(tmp_path / "vt"))
    df1 = spark.range(0, 5).withColumnRenamed("id", "k")
    df2 = spark.range(0, 9).withColumnRenamed("id", "k")
    assert tbl.write_version(df1) == 1
    assert tbl.write_version(df2) == 2
    assert tbl.history() == [1, 2]
    # snapshot reads pin a version; latest is the default
    assert tbl.read_version(spark, 1).count() == 5
    assert tbl.read_version(spark).count() == 9
    # historical versions are immutable — no overwrite path exists
    import pytest as _pytest

    with _pytest.raises(ValueError):
        tbl.read_version(spark, 3)


def test_bloom_has_no_false_negatives_and_bounded_bits(spark):
    """Every inserted key must probe true (one-sided error), the bitset
    never exceeds BLOOM_M rows, and non-members are mostly rejected at
    this fill factor."""
    from table_demo_spark.operators.sketch import BLOOM_M, bloom_build, bloom_probe

    keys = spark.range(0, 300).selectExpr("concat('key-', id) AS k")
    bits = bloom_build(keys, "k")
    assert bits.count() <= BLOOM_M
    hits = bloom_probe(keys, "k", bits).collect()
    assert all(r.bloom_hit for r in hits)  # no false negatives, ever
    others = spark.range(1000, 1400).selectExpr("concat('key-', id) AS k")
    fp = [r for r in bloom_probe(others, "k", bits).collect() if r.bloom_hit]
    # 900 set bits of 4096, k=3 -> fp rate ~(900/4096)^3 ~ 1%; allow 10x
    assert len(fp) <= 40


def test_weighted_sample_is_deterministic_and_length_biased(spark):
    """The A-Res draw is a pure function of the rows (same result on
    re-run and under different partitioning), and heavier rows are
    picked more often than light ones at matched counts."""
    from table_demo_spark.operators.sampling import weighted_sample_per_group

    rows = [("g", i, 1000 if i < 50 else 1) for i in range(100)]
    df = spark.createDataFrame(rows, "grp string, id long, w long")
    got1 = {r.id for r in weighted_sample_per_group(df, "grp", "id", "w", 10).collect()}
    got2 = {
        r.id
        for r in weighted_sample_per_group(
            df.repartition(7), "grp", "id", "w", 10
        ).collect()
    }
    assert got1 == got2
    # 50 heavy rows at weight 1000 vs 50 light at 1: essentially all
    # 10 draws should be heavy (P[light in top-10] is negligible)
    assert sum(1 for i in got1 if i < 50) >= 9


def test_triangle_count_on_known_graph(spark):
    """K4 minus one edge has exactly 2 triangles; corner participation:
    the two nodes of the shared edge sit in both."""
    from pyspark.sql import functions as F

    # orders: {1,2,3} {1,2,4} {1,3,4} -> edges of K4 minus (3,4)... build
    # via the same co-occurrence shape the query uses
    li = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3), (20, 1), (20, 2), (20, 4), (30, 1), (30, 3), (30, 4)],
        "l_orderkey long, l_partkey long",
    )
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(e3, (F.col("e1.u") == F.col("e3.u")) & (F.col("e2.v") == F.col("e3.v")))
        .select(F.col("e1.u").alias("x"), F.col("e1.v").alias("y"), F.col("e2.v").alias("z"))
    )
    got = sorted((r.x, r.y, r.z) for r in tri.collect())
    # edges: 12,13,14,23,24,34? (3,4) co-occur in order 30 -> K4 complete:
    # triangles of K4 = 4: (1,2,3),(1,2,4),(1,3,4),(2,3,4)
    assert got == [(1, 2, 3), (1, 2, 4), (1, 3, 4), (2, 3, 4)]


def test_skyline_rewrite_matches_quadratic_definition(spark):
    """The sorted-rewrite must equal the NOT EXISTS dominance filter on
    a frame with duplicate prices, duplicate points, and ties."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    pts = [(1, 5.0, 10), (2, 5.0, 12), (3, 4.0, 12), (4, 6.0, 20),
           (5, 4.0, 12), (6, 3.0, 1), (7, 7.0, 20), (8, 6.0, 19)]
    part = spark.createDataFrame(pts, "p_partkey long, p_retailprice double, p_size int")
    per_price = part.groupBy("p_retailprice").agg(F.max("p_size").alias("pmax"))
    w = Window.orderBy(F.col("p_retailprice").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    lt = per_price.withColumn("run_lt", F.max("pmax").over(w))
    dominated = (
        F.col("run_lt").isNotNull() & (F.col("run_lt") >= F.col("p_size"))
    ) | (F.col("pmax") > F.col("p_size"))
    got = sorted(
        r.p_partkey for r in part.join(lt, "p_retailprice").filter(~dominated).collect()
    )
    # brute force
    sky = []
    for p in pts:
        dom = any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in pts
        )
        if not dom:
            sky.append(p[0])
    assert got == sorted(sky)


def test_merge_agg_states_equals_full_recompute(spark):
    """The IVM guarantee: merge(agg(base), agg(delta)) == agg(base ∪
    delta), including keys present in only one side."""
    from pyspark.sql import functions as F

    from table_demo_spark.operators.cdc import merge_agg_states

    rows = [(i % 7, i, (i * 37) % 100) for i in range(200)]
    df = spark.createDataFrame(rows, "k long, i long, v long")
    base, delta = df.filter("i < 120"), df.filter("i >= 120")
    # make some keys delta-only
    delta = delta.union(
        spark.createDataFrame([(99, 500, 5), (99, 501, 6)], "k long, i long, v long")
    )
    full = base.union(delta)

    def agg(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v").cast("long").alias("s"),
        )

    got = sorted(
        map(tuple, merge_agg_states(agg(base), agg(delta), ["k"], ["n", "s"]).collect())
    )
    want = sorted(map(tuple, agg(full).collect()))
    assert got == want


def test_bpe_train_greedy_merge_semantics(spark):
    """Hand-checked BPE rounds: 'a a a a b' corpus. Round 1: pair
    (a,a) occurs 3x (overlapping), greedy non-overlap merges
    positions 0 and 2 -> [aa, aa, b]. Round 2 merges (aa,aa)."""
    from table_demo_spark.operators.bpe import SEP, bpe_train

    docs = spark.createDataFrame(
        [(1, "a a a a b"), (2, "a a c")], "doc_id long, text string"
    )
    rows = {r.round: r for r in bpe_train(docs, iters=2).collect()}
    r1 = rows[1]
    # pairs round 1: doc1 (a,a)x3 (a,b); doc2 (a,a)x1 (a,c) -> (a,a)=4
    assert r1.merge_pair == f"a{SEP}a" and r1.pair_cnt == 4
    # doc1 'a a a a b' -> [aa, aa, b]; doc2 'a a c' -> [aa, c]: 5 total
    assert r1.n_tokens_after == 5
    r2 = rows[2]
    # round 2 pairs: doc1 (aa,aa),(aa,b); doc2 (aa,c) -> top (aa,aa)=1
    # tie-break lexicographic among count-1 pairs:
    # 'a\x1fa\x1faa' < 'a\x1fa\x1fb'? compare strings: 'aa+aa','aa+b','aa+c'
    assert r2.pair_cnt == 1
    assert r2.merge_pair == f"a{SEP}a{SEP}a{SEP}a"  # (aa,aa) wins ties
    assert r2.n_tokens_after == 4


def test_bpe_apply_vocab_equals_relational_rewrite(spark):
    """The one-pass vectorized apply (bpe_apply_vocab) must produce
    the identical per-doc stats as the per-round relational rewrite
    (bpe_train_apply) for the same learned vocabulary — including the
    interactions the single pass must get right: priority order,
    overlapping candidate pairs (a,a runs), merges consuming tokens a
    later merge would have used, and merged tokens participating in
    later merges. 6 merges crosses a _CHECKPOINT_EVERY boundary, so
    both chain-materialization modes are on the path."""
    from table_demo_spark.operators.bpe import (
        SEP,
        bpe_apply_vocab,
        bpe_learn,
        bpe_train_apply,
    )

    train = spark.createDataFrame(
        [
            (1, "a a a a b c d"),
            (2, "a a c a b"),
            (3, "b c d a a b c"),
            (4, "d d a b c a a"),
        ],
        "doc_id long, text string",
    )
    held = spark.createDataFrame(
        [
            (10, "a a a b c d d"),
            (11, "c a b x y"),
            (12, "q r s"),  # no merges apply
            (13, ""),
        ],
        "doc_id long, text string",
    )
    iters = 6
    want = sorted(
        map(tuple, bpe_train_apply(train, held, iters=iters).collect())
    )
    merges = bpe_learn(train, iters=iters)
    assert len(merges) == iters and all(SEP in m for m in merges)
    got = sorted(map(tuple, bpe_apply_vocab(held, merges).collect()))
    assert got == want


def test_split_hot_join_equals_plain_join(spark):
    """The hot/cold split is a pure execution rewrite: result equals
    the plain inner join for thresholds that route rows to both
    branches, to only-hot, and to only-cold."""
    from pyspark.sql import functions as F

    from table_demo_spark.operators.skew import split_hot_join

    fact = spark.createDataFrame(
        [(k, i) for k in (1, 1, 1, 1, 2, 2, 3) for i in range(2)],
        "k long, payload long",
    )
    dim = spark.createDataFrame(
        [(1, "a"), (2, "b"), (4, "d")], "k long, name string"
    )
    want = sorted(map(tuple, fact.join(dim, "k").collect()))
    for thr in (1, 5, 100):
        got = sorted(map(tuple, split_hot_join(fact, dim, "k", thr).collect()))
        assert got == want, f"threshold {thr}"


def test_ppm_codec_roundtrip_and_header_robustness():
    """encode_ppm -> decode_ppm is the identity on (h, w, 3) uint8
    rasters, and the parser honors Netpbm header freedoms (comments,
    whitespace runs) plus rejects truncation — the properties the
    decoded-value oracles (m11/m12) lean on."""
    import numpy as np

    from table_demo_spark.operators.codecs import (
        decode_ppm,
        encode_ppm,
        resize_nearest,
    )

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(arr)) == arr).all()

    # header freedoms: comment lines and extra whitespace before fields
    raster = arr.tobytes()
    hand = b"P6\n# a comment\n 9\t5\n# another\n255\n" + raster
    assert (decode_ppm(hand) == arr).all()

    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_ppm(encode_ppm(arr)[:-1])  # truncated raster

    # nearest-neighbor index law: out[y, x] == in[(y*h)//oh, (x*w)//ow]
    out = resize_nearest(arr, 4, 2)
    assert out.shape == (2, 4, 3)
    for y in range(2):
        for x in range(4):
            assert (out[y, x] == arr[(y * 5) // 2, (x * 9) // 4]).all()


def test_wav_codec_roundtrip_and_chunk_walk():
    """encode_wav -> decode_wav preserves int16 samples and the sample
    rate; the decoder walks chunk lists (extra chunks before data) and
    rejects non-PCM16-mono formats."""
    import struct

    import numpy as np
    import pytest as _pytest

    from table_demo_spark.operators.codecs import decode_wav, encode_wav

    samples = np.array([0, 1, -1, 32767, -32768, 12345], dtype=np.int16)
    data = encode_wav(samples, 8000)
    rate, got = decode_wav(data)
    assert rate == 8000
    assert (got == samples).all()

    # tolerate an extra chunk between fmt and data (word-aligned walk)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded odd size
    spliced = data[:fmt_end] + extra + data[fmt_end:]
    # fix RIFF size field
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    rate2, got2 = decode_wav(spliced)
    assert rate2 == 8000 and (got2 == samples).all()

    stereo = data[:22] + struct.pack("<H", 2) + data[24:]
    with _pytest.raises(ValueError):
        decode_wav(stereo)


def test_gif_codec_roundtrip_width_growth_and_reset():
    """encode_gif -> decode_gif preserves frames and palette on
    high-entropy input. 64x64 random frames (4096 index bytes each)
    push the LZW string table past the 9->10->11->12-bit width
    boundaries AND through the 4096-entry clear/reset — the exact
    paths where a decoder/encoder width desynchronization corrupts the
    stream (the codes read at the wrong width raise 'corrupt LZW
    stream' long before the frame completes)."""
    import numpy as np
    import pytest as _pytest

    from table_demo_spark.operators.codecs import (
        _lzw_decode,
        _lzw_encode,
        decode_gif,
        encode_gif,
    )

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (3, 64, 64), dtype=np.uint8)
    data = encode_gif(frames)
    decoded, palette = decode_gif(data)
    assert (decoded == frames).all()
    assert palette.shape == (256, 3)
    assert (palette[:, 0] == np.arange(256)).all()  # greyscale GCT

    # raw LZW roundtrip large enough to force the 4096-entry reset
    big = rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(big), len(big)) == big

    # low-entropy frames stay on the narrow-width path
    flat = np.tile(np.arange(16, dtype=np.uint8), (2, 32, 4))
    dec2, _ = decode_gif(encode_gif(flat))
    assert (dec2 == flat).all()

    # truncation anywhere raises ValueError, never IndexError
    for cut in (8, 20, len(data) // 2, len(data) - 3):
        with _pytest.raises(ValueError):
            decode_gif(data[:cut])


def test_gif_decoder_interop_with_standards_encoded_gif():
    """Real-format interop regression (r5 ADVICE): the decoder must
    follow the GIF89a width schedule — widen when the string table
    reaches 1<<width entries — not a rule merely self-consistent with
    our encoder. tests/fixtures/earth.gif is a standards-encoded
    real-world GIF (Tk 8.6 demo image, 320x200, 256-entry GCT); its
    LZW stream passes every 9->10->11->12-bit width boundary, so any
    desynchronization raises 'corrupt LZW stream' within a few hundred
    bytes instead of decoding all 64000 pixels."""
    import os

    import numpy as np

    from table_demo_spark.operators.codecs import decode_gif, encode_gif

    path = os.path.join(os.path.dirname(__file__), "fixtures", "earth.gif")
    with open(path, "rb") as fh:
        data = fh.read()
    frames, palette = decode_gif(data)
    assert frames.shape == (1, 200, 320)
    assert frames.dtype == np.uint8
    # content pin: stable across decoder changes iff decode is correct
    assert int(frames.sum()) == 5682517
    assert palette.shape == (256, 3)
    # our encoder must emit streams a standards decoder accepts; the
    # decoder IS the standard rule now, so re-encode + decode of a
    # real-world index stream exercises both sides' width schedules
    again, _ = decode_gif(encode_gif(frames))
    assert np.array_equal(frames, again)


def test_jpeg_codec_golden_tables_roundtrip_and_dc_exactness():
    """Baseline-JPEG codec against three independent references:
    (1) the canonical Huffman codes derived from the Annex-K BITS/
    HUFFVAL specs must equal the published T.81 codewords (EOB=1010,
    ZRL=11111111001, ...); (2) decode_jpeg_dc(encode_jpeg(img)) must
    equal the ANALYTIC integer formula round_half_away((S-8192)/128)
    per 8x8 block — the same arithmetic the llm_m17 oracle states in
    SQL, computed here without touching the encoder's DCT; (3) full
    IDCT roundtrip on smooth content stays within a few grey levels
    (transform coding is lossy on noise, near-exact on smooth). Also:
    restart-marker streams decode identically to unmarked ones, odd
    (non-multiple-of-8) dimensions pad and crop correctly, and the
    truncation / progressive / marker-collision paths raise
    ValueError."""
    import numpy as np
    import pytest as _pytest

    from table_demo_spark.operators.codecs import (
        _JPEG_AC_CODES,
        _JPEG_DC_CODES,
        _round_half_away,
        decode_jpeg,
        decode_jpeg_dc,
        encode_jpeg,
    )

    # (1) published T.81 Annex K codewords
    assert _JPEG_DC_CODES[0] == (0b00, 2)
    assert _JPEG_DC_CODES[2] == (0b011, 3)
    assert _JPEG_DC_CODES[6] == (0b1110, 4)
    assert _JPEG_DC_CODES[11] == (0b111111110, 9)
    assert _JPEG_AC_CODES[0x00] == (0b1010, 4)  # EOB
    assert _JPEG_AC_CODES[0x01] == (0b00, 2)
    assert _JPEG_AC_CODES[0x02] == (0b01, 2)
    assert _JPEG_AC_CODES[0x11] == (0b1100, 4)
    assert _JPEG_AC_CODES[0xF0] == (0b11111111001, 11)  # ZRL

    def analytic_dc(img):
        h, w = img.shape
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
        sums = (
            padded.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(ph // 8, pw // 8, 64)
            .sum(axis=2, dtype=np.int64)
        )
        return np.vectorize(
            lambda s: _round_half_away(int(s) - 8192, 128)
        )(sums)

    rng = np.random.default_rng(7)
    for h, w in [(8, 8), (24, 32), (17, 23), (64, 48)]:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        data = encode_jpeg(img)
        assert data.startswith(b"\xff\xd8") and data.endswith(b"\xff\xd9")
        dec = decode_jpeg(data)
        assert dec.shape == (h, w) and dec.dtype == np.uint8
        assert np.array_equal(decode_jpeg_dc(data), analytic_dc(img))  # (2)

    # (3) smooth content: tight full-IDCT roundtrip
    y, x = np.mgrid[0:64, 0:64]
    smooth = (
        (np.sin(x / 9.0) * 40 + np.cos(y / 11.0) * 40) + 128
    ).clip(0, 255).astype(np.uint8)
    err = np.abs(
        decode_jpeg(encode_jpeg(smooth)).astype(int) - smooth.astype(int)
    )
    assert err.max() <= 8 and err.mean() <= 2.0

    # restart markers: DRI emitted, stream decodes identically
    img = rng.integers(0, 256, (40, 48), dtype=np.uint8)
    plain, marked = encode_jpeg(img), encode_jpeg(img, restart_interval=4)
    assert b"\xff\xdd" in marked
    assert any(bytes([0xFF, 0xD0 + i]) in marked for i in range(8))
    assert np.array_equal(decode_jpeg(marked), decode_jpeg(plain))
    assert np.array_equal(decode_jpeg_dc(marked), decode_jpeg_dc(plain))

    # error paths: ValueError, never IndexError/garbage
    for cut in (1, 10, len(plain) // 2, len(plain) - 3):
        with _pytest.raises(ValueError):
            decode_jpeg(plain[:cut])
    with _pytest.raises(ValueError):  # progressive (SOF2)
        decode_jpeg(plain.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with _pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")


def test_jpeg_restart_split_segments_decode_independently():
    """split_jpeg_restarts is a pure byte scan whose segments, decoded
    STANDALONE (tables re-parsed from the shipped header, DC predictor
    reset per marker), reproduce the whole-image DC plane exactly —
    across ragged final intervals, DRI=0 (one segment), and DRI larger
    than the image. Truncation and foreign in-scan markers raise
    ValueError, never a silent misdecode."""
    import numpy as np

    from table_demo_spark.operators.codecs import (
        decode_jpeg_dc,
        decode_jpeg_segment_dc,
        encode_jpeg,
        split_jpeg_restarts,
    )

    rng = np.random.default_rng(20260814)
    for h, w, ri in [
        (24, 32, 5),
        (40, 64, 7),
        (8, 8, 1),
        (17, 33, 4),
        (16, 24, 0),
        (16, 16, 100),
    ]:
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        data = encode_jpeg(img, restart_interval=ri)
        want = decode_jpeg_dc(data).reshape(-1)
        header, segs = split_jpeg_restarts(data)
        step = ri if ri else want.size
        assert len(segs) == -(-want.size // step)
        got = np.concatenate(
            [
                decode_jpeg_segment_dc(
                    header, seg, min(step, want.size - i * step)
                )
                for i, seg in enumerate(segs)
            ]
        )
        assert np.array_equal(got, want), (h, w, ri)

    data = encode_jpeg(
        rng.integers(0, 256, (24, 32), dtype=np.uint8), restart_interval=5
    )
    with pytest.raises(ValueError):
        split_jpeg_restarts(data[:-2])  # EOI removed
    with pytest.raises(ValueError):  # foreign marker spliced into scan
        split_jpeg_restarts(data[:-2] + b"\xff\xc0" + data[-2:])


def test_decode_image_dispatches_and_rejects_unknown(spark):
    """decode_image parses real PPM/PNG/GIF/JPEG/lossless-WebP payloads
    produced by the fixture builders; lossy VP8 fails loudly inside the
    WebP decoder; unsniffed magic (AVIF) still routes to the documented
    NotImplementedError extension point; and a corrupt PNG fails loudly
    rather than decoding garbage."""
    import numpy as np
    import pytest as _pytest

    from table_demo_spark.operators import multimodal
    from table_demo_spark.sources.batch import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(2)
    row = multimodal.with_ppm_payload(docs).collect()[0]
    arr = multimodal.decode_image(row.payload)
    assert arr.shape == (multimodal.PPM_H, multimodal.PPM_W, 3)
    assert arr.dtype == np.uint8

    png_row = multimodal.with_png_payload(docs).collect()[0]
    png = multimodal.decode_image(png_row.payload)
    assert png.shape == (multimodal.PNG_H, multimodal.PNG_W, 3)
    assert png.dtype == np.uint8

    gif_row = multimodal.with_gif_payload(docs).collect()[0]
    gif = multimodal.decode_image(gif_row.payload)  # first frame, RGB
    assert gif.shape == (multimodal.GIF_H, multimodal.GIF_W, 3)
    assert gif.dtype == np.uint8

    jpg_row = multimodal.with_jpeg_payload(docs).collect()[0]
    jpg = multimodal.decode_image(jpg_row.payload)  # grey -> 3 channels
    assert jpg.shape == (multimodal.JPEG_H, multimodal.JPEG_W, 3)
    assert jpg.dtype == np.uint8
    assert (jpg[:, :, 0] == jpg[:, :, 1]).all()

    # lossless WebP decodes for real since r9 (m27)
    webp_row = multimodal.with_webp_payload(docs).collect()[0]
    webp = multimodal.decode_image(webp_row.payload)
    assert webp.shape == (multimodal.PNG_H, multimodal.PNG_W, 3)
    assert webp.dtype == np.uint8

    with _pytest.raises(ValueError):
        # lossy VP8 frames fail loudly inside the WebP decoder
        multimodal.decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")

    with _pytest.raises(ValueError):
        # AVIF routes to the REAL libheif decoder since r13; a bare
        # ftyp box with no meta/mdat is a corrupt container and must
        # fail inside libheif, not fall through to NotImplementedError
        multimodal.decode_image(b"\x00\x00\x00\x1cftypavif" + b"\x00" * 20)

    with _pytest.raises(NotImplementedError):
        # genuinely unknown magic still hits the extension point
        multimodal.decode_image(b"\x42\x42\x42\x42 not-a-codec")

    with _pytest.raises(ValueError):
        multimodal.decode_image(b"\x89PNG\r\n\x1a\n....")  # truncated PNG


def test_distributed_rank_equals_global_row_number(spark):
    """operators/rank.py must produce the identical dense 1..N ranking
    as an unpartitioned row_number window (the shape it replaces), on
    a frame with heavy count ties resolved by the unique key — for
    several partition counts, including more partitions than rows."""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from table_demo_spark.operators.rank import distributed_rank

    rng = random.Random(11)
    rows = [(f"tok{i}", rng.randint(1, 8)) for i in range(500)]
    df = spark.createDataFrame(rows, "tok string, cnt long")
    order = [F.col("cnt").desc(), F.col("tok").asc()]
    want = {
        (r.tok, r.rank)
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order)).cast("long")
        ).collect()
    }
    for n_parts in (1, 7, 32, 1000):
        got = {
            (r.tok, r.rank)
            for r in distributed_rank(
                df, order, "rank", num_partitions=n_parts
            ).collect()
        }
        assert got == want, f"num_partitions={n_parts}"


def _reference_bpe_train(token_docs, iters):
    """Independent driver-side BPE reference: same greedy run-parity
    semantics, implemented with none of the engine's relational
    machinery — counts pairs with a dict, picks (max count, lexico
    smallest pair string), merges left-to-right non-overlapping."""
    from collections import Counter

    from table_demo_spark.operators.bpe import SEP

    docs = [list(t) for t in token_docs]
    merges = []
    for _ in range(iters):
        counts = Counter()
        for toks in docs:
            for a, b in zip(toks, toks[1:]):
                counts[a + SEP + b] += 1
        pair = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(pair)
        nxt_docs = []
        for toks in docs:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] + SEP + toks[i + 1] == pair:
                    out.append(pair)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            nxt_docs.append(out)
        docs = nxt_docs
    return merges


def test_bpe_learn_matches_independent_reference(spark):
    """The distributed trainer must learn the IDENTICAL merge sequence
    as an independent pure-Python implementation of BPE on real
    fixture text — an implementation-diversity check the relational
    oracle (generated from the same constants) cannot provide. Runs
    8 rounds so the sequence crosses a checkpoint cadence boundary."""
    from pyspark.sql import functions as F

    from table_demo_spark.operators.bpe import bpe_learn
    from table_demo_spark.sources.batch import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").limit(120)
    # tokenize with the engine's own expression so the reference sees
    # the identical token streams
    token_docs = [
        r[0]
        for r in docs.select(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        ).collect()
    ]
    want = _reference_bpe_train(token_docs, iters=8)
    got = bpe_learn(docs, iters=8)
    assert got == want


def test_codec_roundtrips_property():
    """Property tests over the pure-numpy codecs: encode->decode is
    the identity for arbitrary shapes, including the degenerate ones
    (1x1 images, single-sample audio, 1-frame GIFs) where header
    arithmetic and filter/predictor edge cases live."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    import numpy as np

    from table_demo_spark.operators.codecs import (
        _round_half_away,
        decode_gif,
        decode_jpeg,
        decode_jpeg_dc,
        decode_png,
        decode_ppm,
        decode_wav,
        encode_gif,
        encode_jpeg,
        encode_png,
        encode_ppm,
        encode_wav,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
    )
    def image_roundtrip(h, w, seed):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert (decode_ppm(encode_ppm(arr)) == arr).all()
        assert (decode_png(encode_png(arr)) == arr).all()

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 4),
        h=st.integers(1, 16),
        w=st.integers(1, 16),
        seed=st.integers(0, 2**31 - 1),
    )
    def gif_roundtrip(n, h, w, seed):
        rng = np.random.default_rng(seed)
        frames = rng.integers(0, 256, (n, h, w), dtype=np.uint8)
        decoded, palette = decode_gif(encode_gif(frames))
        assert (decoded == frames).all()
        assert palette.shape == (256, 3)

    @settings(max_examples=25, deadline=None)
    @given(
        n=st.integers(1, 600),
        rate=st.sampled_from([8_000, 16_000, 44_100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def wav_roundtrip(n, rate, seed):
        rng = np.random.default_rng(seed)
        samples = rng.integers(-32768, 32768, n).astype(np.int16)
        got_rate, got = decode_wav(encode_wav(samples, rate))
        assert got_rate == rate and (got == samples).all()

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        ri=st.sampled_from([0, 1, 3]),
        seed=st.integers(0, 2**31 - 1),
    )
    def jpeg_dc_exact(h, w, ri, seed):
        # JPEG is lossy, so the property is the integer-exact DC plane
        # (the llm_m17 oracle arithmetic), not pixel identity — across
        # arbitrary dims (pad/crop path) and restart intervals.
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w), dtype=np.uint8)
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")
        sums = (
            padded.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(ph // 8, pw // 8, 64)
            .sum(axis=2, dtype=np.int64)
        )
        want = np.vectorize(
            lambda s: _round_half_away(int(s) - 8192, 128)
        )(sums)
        data = encode_jpeg(img, restart_interval=ri)
        assert np.array_equal(decode_jpeg_dc(data), want)
        dec = decode_jpeg(data)
        assert dec.shape == (h, w) and dec.dtype == np.uint8
        # the restart split must reproduce the same DC plane from
        # independently decoded intervals (m18's path), for every
        # shape hypothesis finds — including ri=0 (single segment)
        from table_demo_spark.operators.codecs import (
            decode_jpeg_segment_dc,
            split_jpeg_restarts,
        )

        flat = want.reshape(-1)
        header, segs = split_jpeg_restarts(data)
        step = ri if ri else flat.size
        got = np.concatenate(
            [
                decode_jpeg_segment_dc(
                    header, seg, min(step, flat.size - i * step)
                )
                for i, seg in enumerate(segs)
            ]
        )
        assert np.array_equal(got, flat)

    image_roundtrip()
    gif_roundtrip()
    wav_roundtrip()
    jpeg_dc_exact()


def test_bpe_learn_stops_on_exhausted_corpus(spark):
    """A degenerate corpus (every doc one token after few merges) must
    stop the merge loop with the merges learned so far — never crash
    on the null top-pair aggregate (code-review finding r5)."""
    from table_demo_spark.operators.bpe import bpe_learn, bpe_train

    docs = spark.createDataFrame(
        [(1, "a a"), (2, "b")], "doc_id long, text string"
    )
    # round 1 merges (a,a); afterwards no adjacent pair exists anywhere
    merges = bpe_learn(docs, iters=5)
    assert len(merges) == 1
    rows = bpe_train(docs, iters=5).collect()
    assert len(rows) == 1 and rows[0].n_tokens_after == 2


def _py_pair_counts(corpus):
    from collections import Counter

    from table_demo_spark.operators.bpe import SEP

    c = Counter()
    for toks in corpus:
        for a, b in zip(toks, toks[1:]):
            c[a + SEP + b] += 1
    return c


def _py_merge_one(toks, pair):
    from table_demo_spark.operators.bpe import SEP

    out, i, n = [], 0, len(toks)
    while i < n:
        if i + 1 < n and toks[i] + SEP + toks[i + 1] == pair:
            out.append(pair)
            i += 2
        else:
            out.append(toks[i])
            i += 1
    return out


def _py_sequential_bpe(corpus, iters):
    corpus = [list(t) for t in corpus]
    hist = []
    for _ in range(iters):
        c = _py_pair_counts(corpus)
        if not c:
            break
        pair = min(c, key=lambda p: (-c[p], p))
        hist.append((pair, c[pair]))
        corpus = [_py_merge_one(t, pair) for t in corpus]
    return hist


def test_plan_batch_batching_equals_sequential_property():
    """The merge-batching rule's correctness claim, attacked head-on:
    for randomized corpora drawn from a TINY alphabet (maximal tie
    density, token sharing, and SEP-embedded alias opportunities once
    merged symbols re-merge — the adversarial regime for every clause
    of the rule), batching with _plan_batch must reproduce the
    sequential greedy merge history EXACTLY, including the
    (cnt DESC, pair ASC) tie-breaks and self-pair runs like
    'x x x x'. Deep iters (12) force merged-symbol re-merging, which
    is what exercises the alias guard."""
    from collections import defaultdict

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from table_demo_spark.operators.bpe import SEP, _plan_batch

    def variants(work):
        v = defaultdict(set)
        for toks in work:
            for a, b in zip(toks, toks[1:]):
                v[a + SEP + b].add((a, b))
        return v

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.sampled_from(["a", "b", "c"]),
                min_size=1,
                max_size=14,
            ),
            min_size=1,
            max_size=6,
        ),
        st.integers(min_value=2, max_value=5),
    )
    def check(corpus, batch):
        iters = 12
        seq = _py_sequential_bpe(corpus, iters)
        work = [list(t) for t in corpus]
        hist = []
        merged: set[str] = set()
        while len(hist) < iters:
            c = _py_pair_counts(work)
            if not c:
                break
            var = variants(work)
            cands = sorted(c, key=lambda p: (-c[p], p))[:batch]
            picked = _plan_batch(
                [(p, c[p], sorted(var[p])) for p in cands], merged
            )
            merged |= {p for p, _ in picked}
            for pair, cnt in picked[: iters - len(hist)]:
                hist.append((pair, cnt))
                work = [_py_merge_one(t, pair) for t in work]
        assert hist == seq

    check()


def test_bpe_batched_and_local_trainers_match_sequential(spark):
    """End-to-end cross-implementation equivalence on a corpus built
    to hit every hazard at once: interfering ties at the batch
    boundary, self-pair runs, and pairs whose merge spawns new pairs
    that tie with later candidates. All three trainers must emit
    byte-identical (round, merge_pair, pair_cnt, n_tokens_after)."""
    from table_demo_spark.operators.bpe import (
        bpe_train,
        bpe_train_batched,
        bpe_train_local,
    )

    texts = [
        "x x x x y z y z",
        "w x y w x y q r",
        "a b a b c d c d",
        "b c b c d a d a",
        "q r q r w x w x",
        "z y z y x w x w",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    seq = [tuple(r) for r in bpe_train(docs, iters=10).collect()]
    bat = [
        tuple(r) for r in bpe_train_batched(docs, iters=10, batch=4).collect()
    ]
    loc = [tuple(r) for r in bpe_train_local(docs, iters=10).collect()]
    assert bat == seq
    assert loc == seq


def test_bpe_local_train_job_count_independent_of_vocab_size(spark):
    """t30's scale claim, pinned where it lives: training the WHOLE
    vocabulary is ONE action whose Spark job count does not grow with
    the number of merges (the classic loop runs O(iters) jobs). 8
    merges and 32 merges must schedule exactly the same jobs."""
    from table_demo_spark.operators.bpe import bpe_train_local

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * 4)
         for i in range(20)],
        "doc_id long, text string",
    )
    sc = spark.sparkContext

    def jobs_for(iters: int) -> int:
        group = f"t30-jobcount-{iters}"
        sc.setJobGroup(group, "t30 job-count pin")
        try:
            out = bpe_train_local(docs, iters=iters).collect()
        finally:
            sc.setJobGroup(None, None)
        assert len(out) >= 1
        return len(sc.statusTracker().getJobIdsForGroup(group))

    n8, n32 = jobs_for(8), jobs_for(32)
    assert n8 == n32, (n8, n32)
    assert n32 <= 3, n32  # one action; AQE may stage the exchange


def test_color_jpeg_codec_dc_exactness_and_golden_vectors():
    """4:2:0 color JPEG against three independent anchors: (1) the
    integer DC formula per component (luma /128, chroma K.2 /136) on
    random planes; (2) interleaved-MCU golden vectors — a constant
    image's scan is fully predictable (every AC is EOB, DC diffs are
    zero after the first block of each component), so the entropy
    payload is pinned byte-for-byte; (3) roundtrip with restart
    markers across odd dimensions."""
    import numpy as np
    import pytest as _pytest

    from table_demo_spark.operators.codecs import (
        _round_half_away,
        decode_jpeg_color,
        decode_jpeg_dc_color,
        encode_jpeg_color,
        rgb_to_ycbcr420,
    )

    rng = np.random.default_rng(19)

    # (1) per-component integer DC exactness
    y = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    cb = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    cr = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    data = encode_jpeg_color(y, cb, cr, restart_interval=3)
    ydc, cbdc, crdc = decode_jpeg_dc_color(data)

    def expect_dc(plane, q00):
        ph, pw = plane.shape
        s = (
            plane.reshape(ph // 8, 8, pw // 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(ph // 8, pw // 8, 64)
            .astype(np.int64)
            .sum(axis=2)
        )
        out = np.zeros_like(s, dtype=np.int64)
        for i in range(s.shape[0]):
            for j in range(s.shape[1]):
                out[i, j] = _round_half_away(int(s[i, j]) - 8192, 8 * q00)
        return out

    assert np.array_equal(ydc, expect_dc(y, 16))
    assert np.array_equal(cbdc, expect_dc(cb, 17))
    assert np.array_equal(crdc, expect_dc(cr, 17))

    # (2) golden vectors for the interleaved scan: constant planes.
    # Y=128 -> qDC 0 everywhere; Cb=130 -> S=8320, qDC=round(128/136)=1
    # with diff 1 only in the first MCU's Cb block; Cr=126 -> -1.
    yc = np.full((16, 16), 128, np.uint8)
    cbc = np.full((8, 8), 130, np.uint8)
    crc = np.full((8, 8), 126, np.uint8)
    d2 = encode_jpeg_color(yc, cbc, crc)
    y2, cb2, cr2 = decode_jpeg_dc_color(d2)
    assert y2.tolist() == [[0, 0], [0, 0]]
    assert cb2.tolist() == [[1]] and cr2.tolist() == [[-1]]
    # entropy payload (between SOS body and EOI), hand-assembled:
    # 4x luma blocks: DC size-0 code '00' + EOB '1010';
    # Cb: DC size-1 '010' + extra '1' + EOB '00'; Cr: '011'+'0'+'00'
    # (chroma K.4: size0='00',size1='010'... wait K.4 canonical: bits
    # 0,3,... -> sizes 0,1,2 get 2-bit codes '00','01','10').
    sos_end = d2.rindex(b"\xff\xd9")
    scan = d2[d2.index(b"\xff\xda") :]
    entropy = scan[2 + int.from_bytes(scan[2:4], "big") : len(scan) - 2]
    bits = ""
    # luma DC size 0 = '00' (K.3), luma EOB = '1010' (K.5)
    bits += ("00" + "1010") * 4
    # chroma DC (K.4 canonical): size 0 -> '00', size 1 -> '01'
    # Cb diff +1: size 1, extra bit '1'; EOB (K.6) = '00'
    bits += "01" + "1" + "00"
    # Cr diff -1: size 1, extra bit '0'; EOB
    bits += "01" + "0" + "00"
    bits += "1" * (-len(bits) % 8)  # byte-align with 1-fill
    want = bytes(
        int(bits[i : i + 8], 2) for i in range(0, len(bits), 8)
    )
    assert entropy == want, (entropy.hex(), want.hex())
    assert d2[sos_end:] == b"\xff\xd9"

    # (3) odd dims + restart roundtrip via the RGB companion
    rgb = rng.integers(0, 256, (37, 29, 3), dtype=np.uint8)
    out = decode_jpeg_color(encode_jpeg_color(*rgb_to_ycbcr420(rgb), 2))
    assert out.shape == (37, 29, 3)
    # smooth content survives near-exactly (transform coding sanity)
    gx, gy = np.linspace(0, 255, 48), np.linspace(0, 200, 40)
    smooth = np.clip(
        np.stack(
            [np.add.outer(gy, gx * 0.5), np.add.outer(gy * 0.3, gx),
             np.tile(gx, (40, 1))],
            axis=-1,
        ), 0, 255,
    ).astype(np.uint8)
    dec = decode_jpeg_color(encode_jpeg_color(*rgb_to_ycbcr420(smooth)))
    assert np.abs(dec.astype(int) - smooth.astype(int)).mean() < 4.0

    # truncation anywhere raises ValueError, never IndexError
    for cut in (8, 30, len(data) // 2, len(data) - 3):
        with _pytest.raises(ValueError):
            decode_jpeg_color(data[:cut])


def test_color_jpeg_decoder_interop_with_imageio(spark):
    """Real-format interop: tests/fixtures/kitten.jpg is a camera
    4:2:0 baseline JPEG from Apache Spark's own mllib sample data
    (data/mllib/images/origin/kittens/DP802813.jpg). Our pure-numpy
    decoder must agree with Java ImageIO (Spark's `image` data source
    — an entirely independent implementation) within tight tolerance;
    the residual is IDCT rounding + chroma upsampling choice (ours
    nearest, libjpeg's triangular), both bounded to a few LSBs."""
    import os

    import numpy as np

    from table_demo_spark.operators.codecs import decode_jpeg_color

    path = os.path.join(os.path.dirname(__file__), "fixtures", "kitten.jpg")
    with open(path, "rb") as fh:
        rgb = decode_jpeg_color(fh.read())
    assert rgb.shape == (313, 199, 3)

    row = (
        spark.read.format("image").load(path).select("image.*").collect()[0]
    )
    assert (row.height, row.width, row.nChannels) == (313, 199, 3)
    ref = np.frombuffer(bytes(row.data), dtype=np.uint8).reshape(
        row.height, row.width, row.nChannels
    )[:, :, ::-1]  # Spark image source is BGR
    diff = np.abs(ref.astype(int) - rgb.astype(int))
    assert diff.mean() < 1.0, diff.mean()
    assert np.percentile(diff, 99) <= 3, np.percentile(diff, 99)


def test_color_jpeg_segment_decoder_matches_whole_image():
    """Every restart interval of a color scan must decode
    independently (all three predictors reset) to exactly the DC
    values the whole-image decoder produces — in MCU scan order with
    the 4-per-MCU Y sub-block raster order — including the ragged
    last interval, and the generalized byte-scan split must still
    validate greyscale scans."""
    import numpy as np

    from table_demo_spark.operators.codecs import (
        JpegColorSegmentDecoder,
        decode_jpeg_dc_color,
        decode_jpeg_segment_dc,
        encode_jpeg,
        encode_jpeg_color,
        split_jpeg_restarts,
    )

    rng = np.random.default_rng(20)
    y = rng.integers(0, 256, (32, 64), dtype=np.uint8)
    cb = rng.integers(0, 256, (16, 32), dtype=np.uint8)
    cr = rng.integers(0, 256, (16, 32), dtype=np.uint8)
    data = encode_jpeg_color(y, cb, cr, restart_interval=3)
    header, segs = split_jpeg_restarts(data)
    assert len(segs) == 3  # 8 MCUs at DRI=3: 3 + 3 + ragged 2

    ydc, cbdc, crdc = decode_jpeg_dc_color(data)
    dec = JpegColorSegmentDecoder(header)
    got_y, got_cb, got_cr = [], [], []
    for si, seg in enumerate(segs):
        n = min(3, 8 - si * 3)
        ys, cbs, crs = dec.dc(seg, n)
        got_y.append(ys)
        got_cb.append(cbs)
        got_cr.append(crs)
    got_y = np.concatenate(got_y)
    got_cb = np.concatenate(got_cb)
    got_cr = np.concatenate(got_cr)
    for m in range(8):
        my, mx = divmod(m, 4)
        for s in range(4):
            r, c = divmod(s, 2)
            assert got_y[m, s] == ydc[2 * my + r, 2 * mx + c]
        assert got_cb[m] == cbdc[my, mx]
        assert got_cr[m] == crdc[my, mx]

    g = rng.integers(0, 256, (40, 64), dtype=np.uint8)
    h2, s2 = split_jpeg_restarts(encode_jpeg(g, restart_interval=7))
    assert len(s2) == -(-(40 // 8) * (64 // 8) // 7)
    assert decode_jpeg_segment_dc(h2, s2[0], 7).shape == (7,)


def test_flac_codec_lossless_crc_and_golden_header():
    """FLAC (fixed-predictor subset) against its anchors: (1) LOSSLESS
    roundtrip on every signal shape — white noise (verbatim-ish k),
    ramps and sines (fixed predictors bite), constants (CONSTANT
    subframe), ragged final block; (2) CRC-8/CRC-16 verification —
    a single flipped bit anywhere in a frame must raise, never return
    wrong samples; (3) golden header bytes — magic, STREAMINFO layout,
    and the first frame's sync/header fields are pinned against
    hand-assembled values from the public spec."""
    import numpy as np
    import pytest as _pytest

    from table_demo_spark.operators.codecs import (
        _crc8,
        decode_flac,
        encode_flac,
    )

    rng = np.random.default_rng(21)
    shapes = {
        "noise": rng.integers(-32768, 32768, 5000).astype(np.int16),
        "ramp": (np.arange(4000) * 3 % 9000 - 4500).astype(np.int16),
        "sine": (10000 * np.sin(np.arange(6000) / 30)).astype(np.int16),
        "const": np.full(3000, -12345, np.int16),
        "ragged": rng.integers(-100, 100, 1024 + 7).astype(np.int16),
        "extremes": np.array([-32768, 32767] * 50, np.int16),
    }
    for name, s in shapes.items():
        data = encode_flac(s)
        rate, out = decode_flac(data)
        assert rate == 16_000 and np.array_equal(out, s), name
    # smooth signals actually compress (the codec is not a wrapper)
    assert len(encode_flac(shapes["sine"])) < 0.3 * 2 * shapes["sine"].size

    # golden header: magic + STREAMINFO packing + first frame header
    s = np.arange(100, dtype=np.int16)
    data = encode_flac(s, blocksize=64)
    assert data[:4] == b"fLaC"
    assert data[4] == 0x80 and data[5:8] == b"\x00\x00\x22"  # last, len 34
    assert data[8:10] == b"\x00\x40" and data[10:12] == b"\x00\x40"
    packed = int.from_bytes(data[18:26], "big")
    assert packed >> 44 == 16_000  # sample rate
    assert ((packed >> 41) & 7) + 1 == 1  # mono
    assert ((packed >> 36) & 0x1F) + 1 == 16  # bps
    assert packed & ((1 << 36) - 1) == 100  # total samples
    frame = data[4 + 4 + 34 :]
    # sync (14 bits) + reserved + fixed-blocksize: 0xFF 0xF8
    assert frame[0] == 0xFF and frame[1] == 0xF8
    # blocksize code 0b0111, rate code 0b0101 (16 kHz)
    assert frame[2] == 0x75
    # mono 0b0000 + bps 0b100 + reserved 0
    assert frame[3] == 0x08
    assert frame[4] == 0x00  # frame number 0
    assert frame[5:7] == b"\x00\x3f"  # blocksize-1 = 63
    assert frame[7] == _crc8(frame[:7])  # header CRC

    # corruption anywhere in entropy data raises (CRC-16)
    noisy = bytearray(encode_flac(shapes["noise"]))
    for at in (60, len(noisy) // 2, len(noisy) - 10):
        bad = bytearray(noisy)
        bad[at] ^= 0x10
        with _pytest.raises(ValueError):
            decode_flac(bytes(bad))
    # truncation raises, never IndexError
    good = encode_flac(shapes["ramp"])
    for cut in (3, 20, 50, len(good) // 2):
        with _pytest.raises(ValueError):
            decode_flac(good[:cut])

    # multi-byte coded frame numbers (>127 frames) roundtrip, and the
    # coding matches UTF-8 exactly in the codepoint range (the spec's
    # own framing of the scheme)
    from table_demo_spark.operators.codecs import (
        _BitReader,
        _flac_coded_number,
        _flac_read_coded_number,
    )

    many = rng.integers(-3000, 3000, 16 * 300).astype(np.int16)
    _, out2 = decode_flac(encode_flac(many, blocksize=16))
    assert np.array_equal(out2, many)
    for v in (0, 127, 128, 2047, 2048, 65535, 65536, 1 << 20, 1 << 30):
        assert _flac_read_coded_number(
            _BitReader(_flac_coded_number(v))
        ) == v
    for v in (0x41, 0x7FF, 0x800, 0xFFFF):
        assert _flac_coded_number(v) == chr(v).encode("utf-8")


def test_flac_lpc_codec_lossless_and_spec_frame():
    """LPC-subframe FLAC (llm_m25) against its anchors:

    (1) LOSSLESS roundtrip of encode_flac_lpc across signal shapes x
    predictor orders 1-32, every emitted subframe an LPC subframe;
    (2) a HAND-ASSEMBLED spec frame — bits packed by an independent
    in-test writer straight from xiph.org/flac/format.html (LPC
    order 2, precision 4, shift 2, rice k=0), with the expected
    samples derived by an independent plain-Python recurrence — pins
    the bit layout (precision-1 nibble, signed 5-bit shift, signed
    coefficients, warm-up before them) and the ARITHMETIC right
    shift on a negative prediction sum (floor, not truncate);
    (3) malformed-stream rejection: precision escape 0b1111,
    negative shift, flipped bits (CRC), truncation."""
    import numpy as np
    import pytest as _pytest

    from table_demo_spark.operators.codecs import (
        _crc8,
        _crc16,
        decode_flac,
        encode_flac,
        encode_flac_lpc,
    )

    rng = np.random.default_rng(25)
    m = rng.integers(-32768, 32768, 5000).astype(np.int64)
    shapes = {
        "noise": rng.integers(-32768, 32768, 5000).astype(np.int16),
        "ma": (np.convolve(m, np.ones(4, np.int64))[:5000] // 4).astype(
            np.int16
        ),
        "sine": (10000 * np.sin(np.arange(6000) / 30)).astype(np.int16),
        "const": np.full(3000, -12345, np.int16),
        "ragged": rng.integers(-100, 100, 512 + 7).astype(np.int16),
        "extremes": np.array([-32768, 32767] * 50, np.int16),
        "one_tail": rng.integers(-500, 500, 513).astype(np.int16),
    }
    for name, s in shapes.items():
        for order in (1, 8, 32):
            data = encode_flac_lpc(s, blocksize=512, order=order)
            rate, out, stypes = decode_flac(data, return_subframe_types=True)
            assert rate == 16_000 and np.array_equal(out, s), (name, order)
            # every full block is an LPC subframe (a 1-sample tail is
            # the spec's VERBATIM fallback)
            assert all(32 <= t <= 63 for t in stypes if t != 1) and sum(
                t == 1 for t in stypes
            ) <= (1 if s.size % 512 == 1 else 0), (name, order, stypes)

    # --- hand-assembled spec frame (independent bit packer) ---------
    bits: list[int] = []

    def put(v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            bits.append((v >> i) & 1)

    def packed() -> bytes:
        assert len(bits) % 8 == 0
        return bytes(
            int("".join(map(str, bits[i : i + 8])), 2)
            for i in range(0, len(bits), 8)
        )

    # STREAMINFO: blocksize 8, 16 kHz mono 16 bps, 8 total samples
    info = (8).to_bytes(2, "big") * 2 + b"\x00" * 6
    info += ((16_000 << 44) | (0 << 41) | (15 << 36) | 8).to_bytes(8, "big")
    info += bytes(16)
    stream = b"fLaC" + bytes([0x80]) + len(info).to_bytes(3, "big") + info
    # frame header: sync, 8-bit blocksize at end (code 0b0110),
    # rate code 5 (16 kHz), mono, 16 bps, frame number 0
    put(0b11111111111110, 14)
    put(0, 1)
    put(0, 1)
    put(0b0110, 4)
    put(0b0101, 4)
    put(0b0000, 4)
    put(0b100, 3)
    put(0, 1)
    put(0, 8)  # coded frame number 0
    put(8 - 1, 8)  # blocksize-1
    header = packed()
    header += bytes([_crc8(header)])
    bits.clear()
    # subframe: LPC order 2 (type 100001), no wasted bits
    put(0, 1)
    put(0b100001, 6)
    put(0, 1)
    put(100 & 0xFFFF, 16)  # warm-up x0
    put(110 & 0xFFFF, 16)  # warm-up x1
    put(4 - 1, 4)  # precision-1
    put(2, 5)  # shift
    put(5 & 0xF, 4)  # c0 = 5   (applies to x[i-1])
    put(-2 & 0xF, 4)  # c1 = -2 (applies to x[i-2])
    put(0b00, 2)  # rice, 4-bit params
    put(0, 4)  # partition order 0
    put(0, 4)  # k = 0
    residuals = [3, -1, 0, 2, -2, 1]
    for r in residuals:
        u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
        put(1, u + 1)  # unary: u zeros then a one
    bits += [0] * (-len(bits) % 8)
    frame = header + packed()
    frame += _crc16(frame).to_bytes(2, "big")

    # independent expected-sample recurrence (plain Python, floor shift)
    exp = [100, 110]
    for r in residuals:
        acc = 5 * exp[-1] - 2 * exp[-2]
        exp.append(r + (acc >> 2))
    assert exp == [100, 110, 90, 56, 25, 5, -9, -13]  # -9: negative-sum floor

    rate, out, stypes = decode_flac(stream + frame, return_subframe_types=True)
    assert rate == 16_000 and stypes == [33]
    assert out.tolist() == exp

    # --- malformed streams ------------------------------------------
    def mutate(at: int, xor: int) -> bytes:
        b = bytearray(stream + frame)
        b[at] ^= xor
        return bytes(b)

    base = len(stream) + len(header)
    # precision nibble 0b1111 is the spec's invalid escape. precision-1
    # starts 72 bits into the subframe body: byte 9 of the body, top
    # nibble -> flipping its bits to 1111 must raise before any CRC
    # passes (rebuild the frame with a fixed CRC to isolate the check)
    body = bytearray(frame[len(header) : -2])
    body[4 + 1] = (0b1111 << 4) | (body[5] & 0x0F)
    bad = header + bytes(body)
    bad += _crc16(bad).to_bytes(2, "big")
    with _pytest.raises(ValueError, match="precision"):
        decode_flac(stream + bad)
    # negative shift (two's-complement 5-bit) rejected
    body = bytearray(frame[len(header) : -2])
    body[5] = (body[5] & 0xF0) | 0b1011  # shift bits 10110 -> 10... negative
    body[6] = body[6] | 0x80
    bad = header + bytes(body)
    bad += _crc16(bad).to_bytes(2, "big")
    with _pytest.raises(ValueError):
        decode_flac(stream + bad)
    # CRC catches arbitrary corruption; truncation never IndexErrors
    with _pytest.raises(ValueError):
        decode_flac(mutate(base + 3, 0x10))
    good = encode_flac_lpc(shapes["ma"], blocksize=512)
    for cut in (10, len(good) // 2, len(good) - 3):
        with _pytest.raises(ValueError):
            decode_flac(good[:cut])

    # both encoders produce the identical PCM through one decode loop
    s = shapes["sine"][:1024]
    _, out_fixed = decode_flac(encode_flac(s, blocksize=512))
    _, out_lpc = decode_flac(encode_flac_lpc(s, blocksize=512))
    assert np.array_equal(out_fixed, out_lpc) and np.array_equal(out_lpc, s)


def test_flac_stereo_codec_all_channel_assignments():
    """Stereo FLAC (llm_m26): (1) encode_flac_stereo (mid/side on
    every frame, side subframe at bps+1 = 17 bits) round-trips
    LOSSLESSLY across correlated/independent/extreme/constant pairs
    and compresses correlated channels harder than independent ones
    (the reason the mode exists); (2) ALL FOUR spec channel
    assignments decode — independent, left/side, right/side, mid/side
    frames are assembled per assignment and must reconstruct the same
    stereo block; (3) corruption/truncation still raise."""
    import struct

    import numpy as np
    import pytest as _pytest

    from table_demo_spark.operators.codecs import (
        _BitWriter,
        _crc16,
        _flac_frame_header,
        _flac_stream_header,
        _write_fixed_subframe,
        decode_flac,
        encode_flac_stereo,
    )

    rng = np.random.default_rng(26)
    sm = np.convolve(
        rng.integers(-32768, 32768, 4000), np.ones(4, np.int64)
    )[:4000] // 8
    left = sm.astype(np.int16)
    d = (rng.integers(0, 256, 4000) % 33 - 16).astype(np.int64)
    pairs = {
        "correlated": (left, (sm - d).astype(np.int16)),
        "independent": (
            rng.integers(-32768, 32768, 4000).astype(np.int16),
            rng.integers(-32768, 32768, 4000).astype(np.int16),
        ),
        "extremes": (
            np.array([32767, -32768] * 200, np.int16),
            np.array([-32768, 32767] * 200, np.int16),
        ),
        "const": (np.full(1000, 7, np.int16), np.full(1000, -7, np.int16)),
        "ragged": (
            rng.integers(-999, 999, 512 + 9).astype(np.int16),
            rng.integers(-999, 999, 512 + 9).astype(np.int16),
        ),
    }
    for name, (lft, rgt) in pairs.items():
        data = encode_flac_stereo(lft, rgt, blocksize=512)
        rate, pcm, st = decode_flac(data, return_subframe_types=True)
        assert rate == 16_000 and pcm.shape == (2, lft.size), name
        assert np.array_equal(pcm[0], lft), name
        assert np.array_equal(pcm[1], rgt), name
        assert len(st) == 2 * -(-lft.size // 512), name
    assert len(encode_flac_stereo(*pairs["correlated"])) < 0.7 * len(
        encode_flac_stereo(*pairs["independent"])
    )

    # all four channel assignments reconstruct the same stereo block
    lft, rgt = (a[:512].astype(np.int64) for a in pairs["correlated"])
    mid, side = (lft + rgt) >> 1, lft - rgt

    def one_frame(chan_code: int, c0, c1, eff0: int, eff1: int) -> bytes:
        stream = bytearray(_flac_stream_header(512, 16_000, 512, channels=2))
        header = _flac_frame_header(0, 512, 16_000, chan_code=chan_code)
        body = _BitWriter()
        _write_fixed_subframe(body, c0, eff0)
        _write_fixed_subframe(body, c1, eff1)
        body.align()
        frame = header + body.bytes()
        frame += struct.pack(">H", _crc16(frame))
        return bytes(stream) + frame

    assemblies = {
        0b0001: (lft, rgt, 16, 16),  # independent
        0b1000: (lft, side, 16, 17),  # left/side
        0b1001: (side, rgt, 17, 16),  # right/side (side is channel 0)
        0b1010: (mid, side, 16, 17),  # mid/side
    }
    for code, (c0, c1, e0, e1) in assemblies.items():
        _, pcm = decode_flac(one_frame(code, c0, c1, e0, e1))
        assert np.array_equal(pcm[0], lft), bin(code)
        assert np.array_equal(pcm[1], rgt), bin(code)

    good = encode_flac_stereo(*pairs["correlated"], blocksize=512)
    bad = bytearray(good)
    bad[len(good) // 2] ^= 0x20
    with _pytest.raises(ValueError):
        decode_flac(bytes(bad))
    with _pytest.raises(ValueError):
        decode_flac(good[: len(good) // 3])


def test_png_decoder_interop_with_imageio(spark):
    """Real-format PNG interop: tests/fixtures/bgra.png is a
    real-world RGBA PNG from Apache Spark's own mllib sample data
    (data/mllib/images/origin/multi-channel/BGRA.png). PNG is
    LOSSLESS, so our pure-numpy decoder must agree with Java ImageIO
    (Spark's `image` data source) BIT-EXACTLY — a stronger anchor
    than the JPEG interop's tolerance band."""
    import os

    import numpy as np

    from table_demo_spark.operators.codecs import decode_png

    path = os.path.join(os.path.dirname(__file__), "fixtures", "bgra.png")
    with open(path, "rb") as fh:
        rgba = decode_png(fh.read())
    assert rgba.shape == (100, 100, 4)

    row = spark.read.format("image").load(path).select("image.*").collect()[0]
    assert (row.height, row.width, row.nChannels) == (100, 100, 4)
    ref = np.frombuffer(bytes(row.data), dtype=np.uint8).reshape(
        row.height, row.width, 4
    )
    # Spark's image source stores BGRA; ours is RGBA
    assert np.array_equal(ref[:, :, [2, 1, 0, 3]], rgba)


def test_png_palette_interlaced_interop_with_imageio(spark):
    """Adam7 + palette interop: the three fixtures were written by
    Java ImageIO (a third-party PNG encoder whose interlaced pass
    layout and 4-bit packing we do not control) over deterministic
    patterns — our decoder must reproduce the analytic pixels
    BIT-EXACTLY, and agree with Spark's image source (ImageIO reader)
    on the interlaced-RGB file."""
    import os

    import numpy as np

    from table_demo_spark.operators.codecs import decode_png

    fdir = os.path.join(os.path.dirname(__file__), "fixtures")
    h, w = 37, 53
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [(xx * 7 + yy * 3) % 256, (xx * 5 + yy * 11) % 256,
         (xx * xx + yy) % 256], -1
    ).astype(np.uint8)
    path = os.path.join(fdir, "interlaced_rgb.png")
    got = decode_png(open(path, "rb").read())
    assert np.array_equal(got, rgb)
    row = spark.read.format("image").load(path).select("image.*").collect()[0]
    ref = np.frombuffer(bytes(row.data), dtype=np.uint8).reshape(
        row.height, row.width, row.nChannels
    )
    assert np.array_equal(ref[:, :, [2, 1, 0]], got)  # BGR vs RGB

    i = np.arange(16)
    pal = np.stack(
        [(i * 17) % 256, (255 - i * 13) % 256, (i * 41 + 7) % 256], -1
    ).astype(np.uint8)
    idx = ((xx + 2 * yy) % 16).astype(np.uint8)
    for f in ("palette4.png", "palette4_interlaced.png"):
        got = decode_png(open(os.path.join(fdir, f), "rb").read())
        assert np.array_equal(got, pal[idx]), f


def test_png_palette_interlace_roundtrip_and_negatives():
    """encode_png_palette <-> decode_png across all four bit depths,
    both interlace methods, and awkward sizes (1-pixel edges, pass
    geometries where some Adam7 passes are empty). tRNS, truncation
    mid-pass, and out-of-range palette indices fail loudly."""
    import numpy as np
    import pytest as _pytest

    from table_demo_spark.operators import codecs as C

    rng = np.random.default_rng(13)
    for (h, w) in [(1, 1), (2, 3), (7, 7), (16, 16), (19, 31)]:
        for depth in (1, 2, 4, 8):
            for inter in (False, True):
                n = min(1 << depth, 256)
                pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
                idx = rng.integers(0, n, (h, w), dtype=np.uint8)
                data = C.encode_png_palette(idx, pal, depth, inter)
                assert np.array_equal(C.decode_png(data), pal[idx]), (
                    h, w, depth, inter
                )
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 9), dtype=np.uint8)
    good = C.encode_png_palette(idx, pal, 4, True)
    with _pytest.raises(ValueError):  # truncated mid-pass
        C.decode_png(good[:60])
    with _pytest.raises(ValueError):  # index exceeds depth
        C.encode_png_palette(np.full((2, 2), 9, np.uint8), pal, 2)
    # inject a tRNS chunk: transparency must fail loudly, not drop
    import struct
    import zlib

    body = b"\x80"
    trns = (
        struct.pack(">I", len(body)) + b"tRNS" + body
        + struct.pack(">I", zlib.crc32(b"tRNS" + body) & 0xFFFFFFFF)
    )
    iend = good.rindex(b"IEND") - 4
    with _pytest.raises(ValueError, match="tRNS"):
        C.decode_png(good[:iend] + trns + good[iend:])


def test_progressive_jpeg_dc_scan_codec():
    """DC-only progressive roundtrip: encode_jpeg_progressive_dc's
    single scan decodes to exactly the integer-quantized DC plane
    (same formula as baseline m17), with restart markers resetting
    the predictor; the baseline decoders must refuse SOF2 streams
    with a pointed error instead of misreading them."""
    import numpy as np
    import pytest as _pytest

    from table_demo_spark.operators.codecs import (
        _round_half_away,
        decode_jpeg,
        decode_jpeg_dc,
        decode_jpeg_progressive_dc,
        encode_jpeg_progressive_dc,
    )

    rng = np.random.default_rng(22)
    arr = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    data = encode_jpeg_progressive_dc(arr, restart_interval=4)
    planes = decode_jpeg_progressive_dc(data)
    assert set(planes) == {"y"}
    got = planes["y"]
    assert got.shape == (3, 4)
    s = (
        arr.reshape(3, 8, 4, 8)
        .transpose(0, 2, 1, 3)
        .reshape(3, 4, 64)
        .astype(np.int64)
        .sum(axis=2)
    )
    for i in range(3):
        for j in range(4):
            assert got[i, j] == _round_half_away(int(s[i, j]) - 8192, 128)

    for fn in (decode_jpeg, decode_jpeg_dc):
        with _pytest.raises(ValueError, match="progressive"):
            fn(data)
    for cut in (8, 40, len(data) // 2):
        with _pytest.raises(ValueError):
            decode_jpeg_progressive_dc(data[:cut])


def test_progressive_jpeg_interop_with_real_photo(spark):
    """Real-format interop: tests/fixtures/progressive.jpg is a
    real-world multi-scan progressive photo (SOF2, interleaved
    3-component DC first scan, (2,1)/(1,1)/(1,1) sampling,
    successive-approximation Al=1). Decoding ONLY its first scan must
    yield a luma DC plane that matches Java ImageIO's FULL decode
    block-averaged — each dequantized DC is 8x the block mean minus
    the level shift, so agreement within quantization + Al truncation
    proves the scan walk, generic sampling, and DPCM are right while
    ~90% of the file's bytes stay untouched."""
    import os

    import numpy as np

    from table_demo_spark.operators.codecs import (
        _jpeg_parse_headers_multi,
        decode_jpeg_progressive_dc,
    )

    path = os.path.join(
        os.path.dirname(__file__), "fixtures", "progressive.jpg"
    )
    with open(path, "rb") as fh:
        data = fh.read()
    hdr = _jpeg_parse_headers_multi(data)
    assert hdr.progressive and hdr.scan_spec[:2] == (0, 0)
    al = hdr.scan_spec[3]
    q00 = int(hdr.quants[hdr.comps[0].tq][0, 0])
    planes = decode_jpeg_progressive_dc(data)
    ydc = planes["y"].astype(np.float64)

    row = spark.read.format("image").load(path).select("image.*").collect()[0]
    ref = np.frombuffer(bytes(row.data), dtype=np.uint8).reshape(
        row.height, row.width, row.nChannels
    ).astype(np.float64)
    # luma from BGR, per-8x8-block means over the Y sampling grid
    luma = 0.114 * ref[:, :, 0] + 0.587 * ref[:, :, 1] + 0.299 * ref[:, :, 2]
    h, w = luma.shape
    ph, pw = ydc.shape[0] * 8, ydc.shape[1] * 8
    pad = np.pad(luma, ((0, ph - h), (0, pw - w)), mode="edge")
    means = pad.reshape(ydc.shape[0], 8, ydc.shape[1], 8).mean(axis=(1, 3))
    approx_means = (ydc * q00) / 8.0 + 128.0
    diff = np.abs(approx_means - means)
    # tolerance: quantization (q00/2) + Al truncation (q00 * 2^al),
    # scaled to the pixel domain (/8), plus edge-block padding slack
    tol = (q00 * (0.5 + (1 << al))) / 8.0 + 2.0
    assert float(np.median(diff)) <= tol, (np.median(diff), tol)
    assert float(np.percentile(diff, 95)) <= 3 * tol, np.percentile(diff, 95)


def test_image_ahash_is_robust_to_one_pixel_edit(spark):
    """m23's contract: the one-pixel variant's aHash stays within the
    Hamming threshold of the original (perceptual robustness), and the
    banded join finds EVERY original<->variant pair — Hamming <= 3
    guarantees a shared 16-bit band by pigeonhole."""
    from tests.conftest import SF_SMOKE

    from table_demo_spark.operators import multimodal
    from table_demo_spark.queries.llmops import m23_image_phash_neardup
    from table_demo_spark.sources.batch import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    n_docs = docs.count()
    pairs = m23_image_phash_neardup(spark, SF_SMOKE).collect()
    true_pairs = [r for r in pairs if r.a_key // 2 == r.b_key // 2]
    assert len(true_pairs) == n_docs  # every original<->variant found
    assert all(r.hamming <= 3 for r in true_pairs)
    # and the hash genuinely came from DECODED pixels: recompute one
    # hash from the raw generator raster and compare
    import numpy as np

    doc_id = 0
    raster = np.frombuffer(
        multimodal._md5_stream(str(doc_id), multimodal._PNG_BLOCKS, "#png"),
        dtype=np.uint8,
    ).reshape(multimodal.PNG_H, multimodal.PNG_W, 3).astype(np.int64)
    luma = (
        multimodal.LUMA_R * raster[:, :, 0]
        + multimodal.LUMA_G * raster[:, :, 1]
        + multimodal.LUMA_B * raster[:, :, 2]
    )
    s = luma.reshape(
        multimodal.AH_GRID,
        multimodal.PNG_H // multimodal.AH_GRID,
        multimodal.AH_GRID,
        multimodal.PNG_W // multimodal.AH_GRID,
    ).sum(axis=(1, 3)).reshape(-1)
    bits = (multimodal.AH_GRID**2 * s > s.sum()).astype(int)
    want0 = sum(int(bits[b]) << b for b in range(multimodal.AH_BAND_BITS))
    got = (
        multimodal.image_ahash_bands(
            multimodal.with_png_pair_payloads(docs.filter(F.col("doc_id") == doc_id))
        )
        .filter(F.col("variant") == 0)
        .collect()[0]
    )
    assert got.band0 == want0


def test_webp_lossless_roundtrip_exact():
    """Encoder -> decoder bit-exact on random and md5 rasters (the
    m27 payload path)."""
    import numpy as np

    from table_demo_spark.operators import codecs as C
    from table_demo_spark.operators import multimodal as M

    rng = np.random.default_rng(42)
    for shape in [(1, 1, 3), (3, 2, 3), (16, 24, 3), (7, 5, 3)]:
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        assert (C.decode_webp_lossless(C.encode_webp_lossless(arr)) == arr).all()
    raster = np.frombuffer(
        M._md5_stream("123", M._PNG_BLOCKS, "#webp"), dtype=np.uint8
    ).reshape(M.PNG_H, M.PNG_W, 3)
    assert (
        C.decode_webp_lossless(C.encode_webp_lossless(raster)) == raster
    ).all()


def test_webp_vp8l_vector_lz77_and_color_cache():
    """Hand-built VP8L bitstream: literal -> LZ77 backward reference
    (plain distance code) -> color-cache hit. Decoded pixels computed
    by hand, independent of the encoder."""
    import numpy as np

    from table_demo_spark.operators import codecs as C

    # target: 4x1 image, all pixels = ARGB(0xff, 10, 20, 30)
    px = (0xFF << 24) | (10 << 16) | (20 << 8) | 30
    cache_bits = 1
    idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
    alphabet = 280 + (1 << cache_bits)
    glens = [0] * alphabet
    glens[20] = 1          # literal green
    glens[257] = 2         # length code 1 => length 2
    glens[280 + idx] = 2   # cache reference
    gcodes = C._vp8l_canonical(glens)
    bw = C._Vp8lBitWriter()
    bw.bits(4 - 1, 14)     # width 4
    bw.bits(1 - 1, 14)     # height 1
    bw.bits(0, 1)          # alpha hint
    bw.bits(0, 3)          # version
    bw.bits(0, 1)          # no transforms
    bw.bits(1, 1)          # color cache present
    bw.bits(cache_bits, 4)
    bw.bits(0, 1)          # no meta codes
    C._vp8l_write_prefix_code(bw, glens)
    for sym in (10, 30, 0xFF):  # red / blue / alpha: 1-symbol codes
        lens = [0] * 256
        lens[sym] = 1
        C._vp8l_write_prefix_code(bw, lens)
    dlens = [0] * 40
    dlens[13] = 1  # the only distance code used (see below)
    C._vp8l_write_prefix_code(bw, dlens)
    # pixel 0: literal (green=20, then red=10, blue=30, alpha=255 all
    # ride 0-bit codes)
    bw.code(*gcodes[20])
    # pixels 1-2: LZ77 length 2 (green sym 257 = length code 1, no
    # extra bits), distance value 121 = plain distance 1: prefix code
    # 13 covers values 97..128 -> extra = 121 - 96 - 1 = 24 in 5 bits
    bw.code(*gcodes[257])
    bw.bits(24, 5)
    # pixel 3: color-cache hit
    bw.code(*gcodes[280 + idx])
    payload = b"\x2f" + bw.done()
    import struct

    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    data = b"RIFF" + struct.pack("<I", len(riff)) + riff
    out = C.decode_webp_lossless(data)
    want = np.tile(np.array([10, 20, 30], dtype=np.uint8), (1, 4, 1))
    assert out.shape == (1, 4, 3)
    assert (out == want).all()


def _vp8l_wrap(payload_bits: "object") -> bytes:
    import struct

    payload = b"\x2f" + payload_bits.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _vp8l_literal_codes(bw, pixels):
    """Write one prefix-code group covering exactly the given literal
    ARGB pixels and return the green/red/blue/alpha emitters."""
    from table_demo_spark.operators import codecs as C

    chans = {
        "g": sorted({(p >> 8) & 0xFF for p in pixels}),
        "r": sorted({(p >> 16) & 0xFF for p in pixels}),
        "b": sorted({p & 0xFF for p in pixels}),
        "a": sorted({(p >> 24) & 0xFF for p in pixels}),
    }
    lens = {}
    codes = {}
    for key, alphabet in (("g", 280), ("r", 256), ("b", 256), ("a", 256)):
        ls = [0] * alphabet
        n = len(chans[key])
        bits = max(1, (n - 1).bit_length()) if n > 1 else 1
        for s in chans[key]:
            ls[s] = bits if n > 1 else 1
        lens[key] = ls
        codes[key] = C._vp8l_canonical(ls) if n > 1 else None
    for key in ("g", "r", "b", "a"):
        C._vp8l_write_prefix_code(bw, lens[key])
    dlens = [0] * 40
    dlens[0] = 1
    C._vp8l_write_prefix_code(bw, dlens)

    def emit(p: int) -> None:
        for key, sh in (("g", 8), ("r", 16), ("b", 0), ("a", 24)):
            if codes[key] is not None:
                bw.code(*codes[key][(p >> sh) & 0xFF])

    return emit


def test_webp_vp8l_vector_predictor_transform():
    """Hand-built stream with a PREDICTOR transform (one block, mode 7
    = avg(L, T)); expected pixels computed by hand from the spec's
    edge rules."""
    import numpy as np

    from table_demo_spark.operators import codecs as C

    # 2x2 image, size_bits=2 -> one block, mode 7
    bw = C._Vp8lBitWriter()
    bw.bits(1, 14)  # width 2
    bw.bits(1, 14)  # height 2
    bw.bits(0, 1)
    bw.bits(0, 3)
    bw.bits(1, 1)   # transform present
    bw.bits(0, 2)   # PREDICTOR
    bw.bits(0, 3)   # size_bits - 2 = 0 -> block size 4
    # subimage 1x1, not level0: cache bit, codes, one literal pixel
    # with green = mode 7
    bw.bits(0, 1)   # no cache
    mode_px = (0 << 24) | (0 << 16) | (7 << 8) | 0
    emit = _vp8l_literal_codes(bw, [mode_px])
    emit(mode_px)
    # main image: end of transform list, no cache, no meta codes
    bw.bits(0, 1)
    bw.bits(0, 1)
    bw.bits(0, 1)
    residuals = [
        (0x01 << 24) | (10 << 16) | (20 << 8) | 30,   # (0,0)
        (0x00 << 24) | (5 << 16) | (6 << 8) | 7,      # (1,0)
        (0x00 << 24) | (1 << 16) | (2 << 8) | 3,      # (0,1)
        (0x02 << 24) | (4 << 16) | (5 << 8) | 6,      # (1,1)
    ]
    emit = _vp8l_literal_codes(bw, residuals)
    for p in residuals:
        emit(p)
    out = C.decode_webp_lossless(_vp8l_wrap(bw))
    # hand reconstruction:
    # (0,0): pred BLACK (a=0xff) -> a=0x01+0xff=0x00, rgb = 10,20,30
    # (1,0): pred LEFT          -> 15, 26, 37 (alpha 0)
    # (0,1): pred TOP           -> 11, 22, 33 (alpha 0)
    # (1,1): mode 7 avg(L,T): L=(15,26,37) T=(15? no: T=(1,0)=(15,26,37)?
    #   careful: T of (1,1) is (1,0) -> (15,26,37); L is (0,1) ->
    #   (11,22,33); avg=(13,24,35); + res (4,5,6) -> (17,29,41)
    want = np.array(
        [[[10, 20, 30], [15, 26, 37]], [[11, 22, 33], [17, 29, 41]]],
        dtype=np.uint8,
    )
    assert (out == want).all(), out


def _vp8l_predictor_vector(mode: int, residuals: list[int]) -> "object":
    """Hand-build a 2x2 VP8L stream whose single predictor block uses
    `mode`, decode it, and return the HxWx3 RGB array."""
    from table_demo_spark.operators import codecs as C

    bw = C._Vp8lBitWriter()
    bw.bits(1, 14)  # width 2
    bw.bits(1, 14)  # height 2
    bw.bits(0, 1)
    bw.bits(0, 3)
    bw.bits(1, 1)   # transform present
    bw.bits(0, 2)   # PREDICTOR
    bw.bits(0, 3)   # size_bits - 2 = 0 -> block size 4
    bw.bits(0, 1)   # subimage: no cache
    mode_px = (0 << 24) | (0 << 16) | (mode << 8) | 0
    emit = _vp8l_literal_codes(bw, [mode_px])
    emit(mode_px)
    bw.bits(0, 1)   # end of transform list
    bw.bits(0, 1)   # no cache
    bw.bits(0, 1)   # no meta codes
    emit = _vp8l_literal_codes(bw, residuals)
    for p in residuals:
        emit(p)
    return C.decode_webp_lossless(_vp8l_wrap(bw))


def test_webp_vp8l_vector_select_tie_returns_top():
    """r9 ADVICE pin: RFC 9649 Select() returns LEFT only when
    pL < pT — a Manhattan-distance TIE returns TOP (libwebp agrees).
    Constructed tie: TL=5, L=3, T=7 on every channel, so per channel
    p = 3+7-5 = 5 and pL = pT = 8; the spec result is T (all-7), and
    the pre-fix `<=` comparison returned L (all-3)."""
    import numpy as np

    residuals = [
        (6 << 24) | (5 << 16) | (5 << 8) | 5,        # (0,0) -> all 5
        (2 << 24) | (2 << 16) | (2 << 8) | 2,        # (1,0) -> all 7
        (254 << 24) | (254 << 16) | (254 << 8) | 254,  # (0,1) -> all 3
        0,                                            # (1,1): Select
    ]
    out = _vp8l_predictor_vector(11, residuals)
    want = np.array(
        [[[5, 5, 5], [7, 7, 7]], [[3, 3, 3], [7, 7, 7]]], dtype=np.uint8
    )
    assert (out == want).all(), out


def test_webp_vp8l_vector_clamp_half_truncates_toward_zero():
    """r9 ADVICE pin: ClampAddSubtractHalf is `clamp(a + (a - b) / 2)`
    with C division (truncation TOWARD ZERO). avg(L,T)=10, TL=13 gives
    delta -3: spec 10 + (-1) = 9; Python floor division gave 8."""
    import numpy as np

    residuals = [
        (14 << 24) | (13 << 16) | (13 << 8) | 13,     # (0,0) -> all 13
        (253 << 24) | (253 << 16) | (253 << 8) | 253,  # (1,0) -> all 10
        (253 << 24) | (253 << 16) | (253 << 8) | 253,  # (0,1) -> all 10
        0,                                             # (1,1): mode 13
    ]
    out = _vp8l_predictor_vector(13, residuals)
    want = np.array(
        [[[13, 13, 13], [10, 10, 10]], [[10, 10, 10], [9, 9, 9]]],
        dtype=np.uint8,
    )
    assert (out == want).all(), out


def test_webp_vp8l_vector_color_indexing_packed():
    """Hand-built stream with a COLOR_INDEXING transform: 4-entry
    delta-coded palette, 2-bit pixel packing (4 pixels in one packed
    byte)."""
    import numpy as np

    from table_demo_spark.operators import codecs as C

    bw = C._Vp8lBitWriter()
    bw.bits(3, 14)  # width 4
    bw.bits(0, 14)  # height 1
    bw.bits(0, 1)
    bw.bits(0, 3)
    bw.bits(1, 1)   # transform present
    bw.bits(3, 2)   # COLOR_INDEXING
    bw.bits(4 - 1, 8)  # palette size 4
    # palette image (4x1, delta-coded): entries chosen so deltas are
    # exercised: want palette [ (255,10,0,0), (255,40,5,1), ... ]
    deltas = [
        (0xFF << 24) | (10 << 16) | (0 << 8) | 0,
        (0x00 << 24) | (30 << 16) | (5 << 8) | 1,
        (0x00 << 24) | (100 << 16) | (10 << 8) | 2,
        (0x00 << 24) | (50 << 16) | (20 << 8) | 3,
    ]
    bw.bits(0, 1)   # no cache in palette stream
    emit = _vp8l_literal_codes(bw, deltas)
    for p in deltas:
        emit(p)
    # main image decodes at packed width 1: one literal pixel whose
    # green byte holds indices [2, 0, 3, 1] (2 bits each, LSB-first)
    packed_green = 2 | (0 << 2) | (3 << 4) | (1 << 6)
    packed_px = packed_green << 8
    bw.bits(0, 1)   # end of transform list
    bw.bits(0, 1)   # no cache in main stream
    bw.bits(0, 1)   # no meta codes
    emit = _vp8l_literal_codes(bw, [packed_px])
    emit(packed_px)
    out = C.decode_webp_lossless(_vp8l_wrap(bw))
    pal = [
        (10, 0, 0),
        (40, 5, 1),
        (140, 15, 3),
        (190, 35, 6),
    ]
    want = np.array([[pal[2], pal[0], pal[3], pal[1]]], dtype=np.uint8)
    assert (out == want).all(), out


def test_webp_vp8l_vector_cross_color_transform():
    """Hand-built stream with a COLOR (cross-color) transform: one
    block with known deltas; expected channel math computed by hand
    from the spec's (int8 * int8) >> 5 formula."""
    import numpy as np

    from table_demo_spark.operators import codecs as C

    bw = C._Vp8lBitWriter()
    bw.bits(0, 14)  # width 1
    bw.bits(0, 14)  # height 1
    bw.bits(0, 1)
    bw.bits(0, 3)
    bw.bits(1, 1)   # transform present
    bw.bits(1, 2)   # COLOR transform
    bw.bits(0, 3)   # block size 4
    # transform element: g2r=16 (blue byte), g2b=32 (green byte),
    # r2b=240 i.e. -16 (red byte)
    el = (0 << 24) | (240 << 16) | (32 << 8) | 16
    bw.bits(0, 1)
    emit = _vp8l_literal_codes(bw, [el])
    emit(el)
    # main image: one residual pixel a=255 r=100 g=64 b=10
    res = (255 << 24) | (100 << 16) | (64 << 8) | 10
    bw.bits(0, 1)   # end of transform list
    bw.bits(0, 1)   # no cache
    bw.bits(0, 1)   # no meta codes
    emit = _vp8l_literal_codes(bw, [res])
    emit(res)
    out = C.decode_webp_lossless(_vp8l_wrap(bw))
    # hand math: g=64 -> g2r delta = (16*64)>>5 = 32 -> r = 100+32=132
    # g2b delta = (32*64)>>5 = 64; r2b delta = (-16 * int8(132)) >> 5 =
    # (-16 * -124) >> 5 = 1984 >> 5 = 62; b = (10 + 64 + 62) & 255 = 136
    assert (out == np.array([[[132, 64, 136]]], dtype=np.uint8)).all(), out


def test_webp_real_file_interop():
    """tests/fixtures/python.webp is a THIRD-PARTY-encoded WebP (a
    cwebp-produced icon from CPython's public test suite): the VP8X
    canvas and the independent VP8 frame header must agree; the ALPH
    chunk is compression-method-1, i.e. a real third-party VP8L
    bitstream, which must decode cleanly through the full prefix-code
    + LZ77 machinery into the known logo silhouette."""
    import hashlib
    import os

    from table_demo_spark.operators import codecs as C

    path = os.path.join(os.path.dirname(__file__), "fixtures", "python.webp")
    data = open(path, "rb").read()
    info = C.webp_info(data)
    assert info["chunks"] == ["VP8X", "ALPH", "VP8"]
    # two INDEPENDENT headers agree on the dimensions
    assert (info["canvas_w"], info["canvas_h"]) == (16, 16)
    assert (info["frame_w"], info["frame_h"]) == (16, 16)
    assert info["has_alpha"] and info["format"] == "lossy"
    assert info["alpha_compression"] == 1  # VP8L-coded alpha plane
    plane = C.decode_webp_alpha(data)
    assert plane.shape == (16, 16)
    # silhouette structure: transparent corners, opaque core
    assert (plane[0, :4] == 0).all() and (plane[15, :4] == 0).all()
    assert (plane[5, :10] == 255).all()
    assert int(plane.max()) == 255 and int(plane.min()) == 0
    # golden pin of the full decoded plane (any bit misread in the
    # third-party stream scrambles this)
    assert (
        hashlib.md5(plane.tobytes()).hexdigest()
        == "fa1667e19ae1b259be670911674006a6"
    )


def test_graph_beam_search_navigates_beyond_entry(spark):
    """llm_s18's beam must actually NAVIGATE: the final beam is B
    distinct nodes in strictly ranked order, every member scores at
    least as high as the entry point's own query similarity (best-first
    never regresses below its start), and at least one member was not
    a direct neighbor of the entry (the walk went multi-hop)."""
    from pyspark.sql import functions as F

    from table_demo_spark.functions.vector import cosine
    from table_demo_spark.queries.llmops import (
        _S18_B,
        _S18_ENTRY,
        _S18_PROBE,
        s18_graph_beam_search,
    )
    from table_demo_spark.sources.batch import load_table
    from tests.conftest import SF_SMOKE

    rows = s18_graph_beam_search(spark, SF_SMOKE).collect()
    assert len(rows) == _S18_B
    assert [r["rank"] for r in rows] == list(range(1, _S18_B + 1))
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == _S18_B
    scores = [r["cos_sim"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    emb = load_table(spark, SF_SMOKE, "embeddings")
    qv = emb.filter(F.col("vec_id") == _S18_PROBE).select(
        F.col("embedding").alias("qv")
    )
    entry_score = (
        emb.filter(F.col("vec_id") == _S18_ENTRY)
        .crossJoin(F.broadcast(qv))
        .select(F.round(cosine("embedding", "qv"), 9).alias("c"))
        .collect()[0]["c"]
    )
    assert scores[0] >= entry_score


def test_webp_anim_roundtrip_and_container_info():
    """Animated WebP: encode_webp_anim -> decode_webp_anim is
    frame-exact; webp_info reports the ANIM flag, canvas, and the ANMF
    frame count from the ordered chunk walk (a dict walk would
    collapse the repeated ANMF tags)."""
    import numpy as np

    from table_demo_spark.operators import codecs as C
    from table_demo_spark.operators import multimodal as M

    raster = np.frombuffer(
        M._md5_stream("7", M._WEBPA_BLOCKS, "#webpa"), dtype=np.uint8
    ).reshape(M.WEBP_ANIM_FRAMES, M.WEBP_ANIM_H, M.WEBP_ANIM_W, 3)
    data = C.encode_webp_anim(raster, durations_ms=40)
    frames, durs = C.decode_webp_anim(data)
    assert (frames == raster).all()
    assert durs == [40] * M.WEBP_ANIM_FRAMES
    info = C.webp_info(data)
    assert info["has_anim"] and info["n_frames"] == M.WEBP_ANIM_FRAMES
    assert (info["canvas_w"], info["canvas_h"]) == (
        M.WEBP_ANIM_W,
        M.WEBP_ANIM_H,
    )


def test_mp3_frame_walk_roundtrip_and_desync():
    """MP3 header layer: encode -> walk recovers every header field;
    corrupting one frame-length input desyncs the walk loudly."""
    import pytest as _pytest

    from table_demo_spark.operators import codecs as C
    from table_demo_spark.operators import multimodal as M

    specs = M._mp3_specs(123)
    need = sum(
        C.mp3_frame_length(C.MP3_BITRATES_KBPS[b], 44100, p) - 4
        for b, p in specs
    )
    filler = M._md5_stream("123", -(-need // 16), "#mp3")[:need]
    data = C.encode_mp3_frames(specs, filler)
    frames = C.decode_mp3_frames(data)
    assert [(f["bitrate_kbps"], f["padding"]) for f in frames] == [
        (C.MP3_BITRATES_KBPS[b], p) for b, p in specs
    ]
    assert sum(f["frame_len"] for f in frames) == len(data)
    # flip the first frame's padding bit: lengths shift by one byte and
    # the walk must lose sync instead of mis-parsing
    broken = bytearray(data)
    broken[2] ^= 0b10
    with _pytest.raises(ValueError, match="sync|overruns|truncated"):
        C.decode_mp3_frames(bytes(broken))


def test_h264_annexb_walk_and_emulation_prevention():
    """H.264 Annex B layer: escape/unescape invert each other on
    adversarial payloads; the stream walk recovers types and payloads;
    forbidden_zero_bit rejects loudly."""
    import pytest as _pytest

    from table_demo_spark.operators import codecs as C

    for raw in (
        b"",
        b"\x00\x00\x00",
        b"\x00\x00\x01\x00\x00\x02\x00\x00\x03\x00\x00\x04",
        bytes(range(256)),
    ):
        wire = C.h264_escape_rbsp(raw)
        assert C.h264_unescape_rbsp(wire) == raw
        assert b"\x00\x00\x01" not in wire and b"\x00\x00\x00" not in wire
    nals = [
        (3, 7, b"\x00\x00\x01sps"),
        (3, 8, b"pps\x00\x00"),
        (2, 5, b"\x00" * 9),
        (0, 1, b"slice\x00\x00\x02"),
    ]
    enc = C.encode_annexb(nals)
    dec = C.decode_annexb(enc)
    assert [(d["ref_idc"], d["nal_type"], d["rbsp"]) for d in dec] == nals
    bad = bytearray(enc)
    bad[4] |= 0x80  # set forbidden_zero_bit on the first NAL header
    with _pytest.raises(ValueError, match="forbidden_zero_bit"):
        C.decode_annexb(bytes(bad))


def test_bucket_knn_salting_is_exact(spark, monkeypatch):
    """Hot-bucket salting is a physical-layout decision, never a
    semantic one: with the salt cap forced tiny (so EVERY bucket
    splits into multiple salts), the graph's edge set equals the
    unsalted run's exactly — each (src, dst) pair still lands in
    exactly one (bucket, salt) group and the global top-M window
    merges across salts."""
    from table_demo_spark.operators import similarity
    from table_demo_spark.queries.llmops import s18_graph_edges
    from table_demo_spark.sources.batch import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    bits = similarity.graph_bits(emb.count())
    base = {
        (int(r["src"]), int(r["dst"]))
        for r in s18_graph_edges(emb, bits).collect()
    }
    monkeypatch.setattr(similarity, "GRAPH_SALT_CAP", 8)
    salted = {
        (int(r["src"]), int(r["dst"]))
        for r in s18_graph_edges(emb, bits).collect()
    }
    assert salted == base


def test_graph_bits_scales_with_corpus():
    """graph_bits pins expected bucket occupancy: smallest bits with
    n <= GRAPH_TARGET_BUCKET * 2**bits, clamped to [MIN, MAX] — the
    fix for the r9 verdict's fixed-16-bucket quadratic GEMM."""
    from table_demo_spark.operators.similarity import (
        GRAPH_BITS_MAX,
        GRAPH_BITS_MIN,
        GRAPH_TARGET_BUCKET,
        graph_bits,
    )

    assert graph_bits(0) == GRAPH_BITS_MIN
    assert graph_bits(GRAPH_TARGET_BUCKET << GRAPH_BITS_MIN) == GRAPH_BITS_MIN
    assert (
        graph_bits((GRAPH_TARGET_BUCKET << GRAPH_BITS_MIN) + 1)
        == GRAPH_BITS_MIN + 1
    )
    assert graph_bits(2_000) == 4       # sf0.1 fixture
    assert graph_bits(20_000) == 8      # 10x fixture
    assert graph_bits(10**12) == GRAPH_BITS_MAX
    # monotone non-decreasing over a sweep
    vals = [graph_bits(n) for n in range(0, 300_000, 977)]
    assert vals == sorted(vals)


def test_mp3_sideinfo_roundtrip_with_scfsi_sharing():
    """Side-info + scale-factor layer (m32): fields round-trip through
    the real 17-byte bit layout, and granule 1's scfsi-shared band
    groups — NOT transmitted per the spec — are copied from granule 0
    by the decoder."""
    import random

    from table_demo_spark.operators import codecs as C

    rng = random.Random(5)
    frames = []
    for _ in range(4):
        scfsi = rng.randrange(16)
        grs = []
        for _g in range(2):
            sc = rng.randrange(16)
            slen1, slen2 = C.MP3_SLEN[sc]
            sfs = [
                rng.randrange(1 << (slen1 if b < 11 else slen2))
                if (slen1 if b < 11 else slen2) else 0
                for b in range(21)
            ]
            grs.append((rng.randrange(256), sc, sfs))
        frames.append((scfsi, grs))
    dec = C.decode_mp3_sideinfo(C.encode_mp3_sideinfo_frames(frames))
    assert len(dec) == 4
    for f, (scfsi, grs) in zip(dec, frames):
        assert f["scfsi"] == scfsi
        for g in range(2):
            eff = list(grs[g][2])
            if g == 1:
                for gi, (lo, hi) in enumerate(C.MP3_SCFSI_GROUPS):
                    if (scfsi >> (3 - gi)) & 1:
                        eff[lo:hi] = grs[0][2][lo:hi]
            got = f["granules"][g]
            assert got["global_gain"] == grs[g][0]
            assert got["scalefacs"] == eff
            assert got["huffman_bits"] == 0


def test_mp3_sideinfo_bit_reservoir_followed():
    """main_data_begin points INTO earlier frames' bodies (the bit
    reservoir): a hand-patched second frame whose scale factors live
    at the end of frame 1's padding must decode them from there."""
    from table_demo_spark.operators import codecs as C

    sfs = [1] * 11 + [0] * 10  # sc=5 -> slen (1,1): values fit 1 bit
    frames = [(0, [(10, 5, sfs), (20, 5, sfs)])] * 2
    data = bytearray(C.encode_mp3_sideinfo_frames(frames))
    flen = C.mp3_frame_length(C.MP3_BITRATES_KBPS[9], 44100, 0)
    # move frame 2's part2 bits (2 granules x 21 bits -> 6 bytes) into
    # the reservoir: copy them to the END of frame 1's body and set
    # frame 2's main_data_begin = 6 (9-bit field at the side info's
    # start); zero the original in-frame copy.
    f2 = flen
    src = data[f2 + 21:f2 + 27]
    data[f2 - 6:f2] = src
    data[f2 + 21:f2 + 27] = b"\x00" * 6
    data[f2 + 4] = 6 >> 1            # main_data_begin high 8 of 9 bits
    data[f2 + 5] |= (6 & 1) << 7     # low bit
    dec = C.decode_mp3_sideinfo(bytes(data))
    assert dec[1]["main_data_begin"] == 6
    for g in range(2):
        assert dec[1]["granules"][g]["scalefacs"] == sfs


def test_mp3_sideinfo_failures_are_loud():
    import pytest

    from table_demo_spark.operators import codecs as C

    frames = [(0, [(10, 5, [1] * 11 + [0] * 10)] * 2)]
    data = bytearray(C.encode_mp3_sideinfo_frames(frames))
    # truncated side info
    with pytest.raises(ValueError):
        C.decode_mp3_sideinfo(bytes(data[:12]))
    # reservoir underrun: first frame claims main data before stream
    bad = bytearray(data)
    bad[4] = 1  # main_data_begin != 0 on frame 0
    with pytest.raises(ValueError):
        C.decode_mp3_sideinfo(bytes(bad))
    # part2 exceeding part2_3_length: shrink the 12-bit field
    bad = bytearray(data)
    bad[6] &= 0x03  # clear part2_3_length high bits of granule 0
    bad[6 + 1] = 0
    with pytest.raises(ValueError):
        C.decode_mp3_sideinfo(bytes(bad))


def test_batched_serve_matches_single_query_walk(spark):
    """llm_s21's batched walk must agree with llm_s18's single-probe
    walk for the probe query: same graph, same entry, same rounds —
    the batching amortizes jobs, never changes results."""
    from table_demo_spark.queries.llmops import (
        _S18_PROBE,
        s18_graph_beam_search,
        s21_batched_beam_serve,
    )
    from tests.conftest import SF_SMOKE

    single = {
        (int(r["vec_id"]), float(r["cos_sim"]), int(r["rank"]))
        for r in s18_graph_beam_search(spark, SF_SMOKE).collect()
    }
    batched = {
        (int(r["vec_id"]), float(r["cos_sim"]), int(r["rank"]))
        for r in s21_batched_beam_serve(spark, SF_SMOKE)
        .filter(f"qid = {_S18_PROBE}")
        .collect()
    }
    assert batched == single


def test_batched_hnsw_serve_matches_single_probe_hierarchy(spark):
    """llm_s24's batched hierarchical walk must agree with llm_s23's
    single-probe descent for the probe query: same layer draws, same
    shared top-layer entry, same greedy hops and layer-0 beam — the
    s21-style batching amortizes jobs per hop, never changes the
    descent."""
    from table_demo_spark.queries.llmops import (
        _S18_PROBE,
        s23_hnsw_layered,
        s24_batched_hnsw_serve,
    )
    from tests.conftest import SF_SMOKE

    single = {
        (int(r["vec_id"]), float(r["cos_sim"]), int(r["rank"]))
        for r in s23_hnsw_layered(spark, SF_SMOKE).collect()
    }
    batched = {
        (int(r["vec_id"]), float(r["cos_sim"]), int(r["rank"]))
        for r in s24_batched_hnsw_serve(spark, SF_SMOKE)
        .filter(f"qid = {_S18_PROBE}")
        .collect()
    }
    assert batched == single


def test_h264_sps_roundtrip_and_crop_units():
    """SPS layer (m34): Exp-Golomb fields round-trip through the
    Annex B layer (escape + trailing bits), and display dimensions
    apply the 4:2:0 crop units (x2 horizontal, x2 vertical for
    progressive). Truncated SPS fails loudly."""
    import random

    import pytest

    from table_demo_spark.operators import codecs as C

    rng = random.Random(3)
    for _ in range(50):
        mbw, mbh = rng.randrange(1, 121), rng.randrange(1, 69)
        crop = tuple(rng.randrange(0, 4) for _ in range(4))
        rbsp = C.encode_h264_sps(77, 40, mbw, mbh, crop)
        stream = C.encode_annexb([(3, 7, rbsp)])
        got = C.decode_h264_sps(C.decode_annexb(stream)[0]["rbsp"])
        assert got["mb_width"] == mbw and got["crop"] == crop
        assert got["width"] == 16 * mbw - 2 * (crop[0] + crop[1])
        assert got["height"] == 16 * mbh - 2 * (crop[2] + crop[3])
    with pytest.raises(ValueError):
        C.decode_h264_sps(C.encode_h264_sps(66, 30, 40, 30)[:3])


def test_h264_slice_header_hand_pinned_bits():
    """Slice-header layer (m36): the exact 7.3.3 bit string of an IDR
    I slice, written out BY HAND against the spec field order —
    first_mb ue(0)=1, slice_type ue(2)=011, pps ue(0)=1,
    frame_num u(6)=001101 (width from the SPS's
    log2_max_frame_num_minus4=2), idr_pic_id ue(7)=0001000,
    poc_lsb u(5)=10101 (width from log2_max_poc_lsb_minus4=1),
    dec_ref_pic_marking 00, slice_qp_delta se(4)=0001000,
    disable_deblocking ue(0)=1, alpha se(-2)=00101, beta se(3)=00110
    — catching any encoder/decoder bug pair that would cancel in a
    roundtrip-only test."""
    from table_demo_spark.operators import codecs as C

    sps = C.decode_h264_sps(
        C.encode_h264_sps(
            66, 30, 40, 23,
            log2_max_frame_num_minus4=2, poc_type=0,
            log2_max_poc_lsb_minus4=1,
        )
    )
    pps = C.decode_h264_pps(
        C.encode_h264_pps(
            0, 0, pic_init_qp_minus26=-5, chroma_qp_index_offset=3,
            deblocking_filter_control_present=1, entropy_coding_mode=1,
        )
    )
    assert pps["pic_init_qp"] == 21 and pps["chroma_qp_index_offset"] == 3
    hdr = C.encode_h264_slice_header(
        sps, pps, 2, 0, 13, 4, idr_pic_id=7, poc_lsb=21,
        disable_deblocking_idc=0, alpha_c0_offset_div2=-2,
        beta_offset_div2=3,
    )
    want = (
        "1" "011" "1" "001101" "0001000" "10101" "00" "0001000"
        "1" "00101" "00110"
    )
    got = "".join(f"{b:08b}" for b in hdr)
    assert got[: len(want)] == want
    assert set(got[len(want):]) <= {"0"}  # byte-alignment padding only
    s = C.decode_h264_slice_header(hdr, 5, 3, {0: pps}, {0: sps})
    assert s["slice_type"] == "I" and s["is_idr"] and s["idr_pic_id"] == 7
    assert s["frame_num"] == 13 and s["poc_lsb"] == 21
    assert s["slice_qp"] == 25  # 26 - 5 + 4, base resolved via the PPS
    assert s["alpha_c0_offset"] == -4 and s["beta_offset"] == 6


def test_h264_stream_parameter_set_resolution():
    """decode_h264_stream resolves every slice through the SPS/PPS
    stores: P/B/CAVLC/CABAC headers parse, nal_ref_idc gates the
    marking bit, and missing parameter sets / IDR-with-P /
    truncation / FMO all fail loudly."""
    import pytest

    from table_demo_spark.operators import codecs as C

    sps_rbsp = C.encode_h264_sps(
        66, 30, 40, 23,
        log2_max_frame_num_minus4=2, poc_type=0, log2_max_poc_lsb_minus4=1,
    )
    pps_rbsp = C.encode_h264_pps(
        0, 0, pic_init_qp_minus26=-5,
        deblocking_filter_control_present=1, entropy_coding_mode=1,
    )
    sps, pps = C.decode_h264_sps(sps_rbsp), C.decode_h264_pps(pps_rbsp)
    h_idr = C.encode_h264_slice_header(
        sps, pps, 7, 0, 13, 4, idr_pic_id=7, poc_lsb=21
    )
    h_p = C.encode_h264_slice_header(
        sps, pps, 5, 11, 44, -9, poc_lsb=30, cabac_init_idc=2,
        disable_deblocking_idc=1,
    )
    h_b = C.encode_h264_slice_header(
        sps, pps, 1, 3, 63, 10, poc_lsb=1, direct_spatial_mv=0,
        cabac_init_idc=1, disable_deblocking_idc=2, nal_ref_idc=0,
    )
    stream = C.encode_annexb(
        [(3, 7, sps_rbsp), (3, 8, pps_rbsp),
         (3, 5, h_idr + b"\xa5\x5a"), (2, 1, h_p + b"\x01"),
         (0, 1, h_b + b"\xff")]
    )
    s0, s1, s2 = C.decode_h264_stream(stream)
    assert s0["slice_type"] == "I" and s0["slice_type_ue"] == 7
    assert s1["slice_type"] == "P" and s1["cabac_init_idc"] == 2
    assert s1["frame_num"] == 44 and s1["disable_deblocking_idc"] == 1
    assert s1["slice_qp"] == 26 - 5 - 9
    assert s2["slice_type"] == "B" and s2["direct_spatial_mv"] == 0
    with pytest.raises(ValueError):  # slice before its PPS
        C.decode_h264_stream(
            C.encode_annexb([(3, 7, sps_rbsp), (2, 1, h_p + b"\x01")])
        )
    with pytest.raises(ValueError):  # PPS referencing a missing SPS
        C.decode_h264_stream(
            C.encode_annexb([(3, 8, pps_rbsp), (2, 1, h_p + b"\x01")])
        )
    with pytest.raises(ValueError):  # IDR pictures carry only I/SI
        C.encode_h264_slice_header(sps, pps, 0, 0, 1, 0, idr_pic_id=3)
    with pytest.raises((ValueError, IndexError)):  # truncated header
        C.decode_h264_slice_header(h_idr[:2], 5, 3, {0: pps}, {0: sps})
    # hand-build a PPS with num_slice_groups_minus1 = 1 (FMO)
    w = C._ExpGolombWriter()
    for v in (1, 0):
        w.ue(v)
    w.put(0, 2)
    w.ue(1)  # num_slice_groups_minus1 = 1 -> FMO
    w.align()
    with pytest.raises(ValueError):
        C.decode_h264_pps(bytes(w.out))


def test_gif_interlaced_interop_and_roundtrip():
    """GIF89a 4-pass interlace: tests/fixtures/interlaced.gif was
    written by Java ImageIO's GIF writer in progressive mode (a
    third-party encoder's interlaced row layout) over a deterministic
    pattern — decode must reproduce it bit-exactly; the repo encoder's
    interlaced streams roundtrip at awkward heights (passes empty or
    one row tall)."""
    import os

    import numpy as np

    from table_demo_spark.operators import codecs as C

    path = os.path.join(
        os.path.dirname(__file__), "fixtures", "interlaced.gif"
    )
    frames, pal = C.decode_gif(open(path, "rb").read())
    h, w = 29, 47
    yy, xx = np.mgrid[0:h, 0:w]
    assert np.array_equal(frames[0], ((xx * 13 + yy * 29) % 256))
    assert np.array_equal(
        pal, np.stack([np.arange(256)] * 3, -1).astype(np.uint8)
    )
    rng = np.random.default_rng(3)
    for (hh, ww) in [(1, 5), (2, 3), (8, 8), (9, 4), (29, 47)]:
        fr = rng.integers(0, 256, (2, hh, ww), dtype=np.uint8)
        got, _ = C.decode_gif(C.encode_gif(fr, interlace=True))
        assert np.array_equal(got, fr), (hh, ww)


def test_h264_ipcm_slice_pixels_roundtrip():
    """I_PCM slice data (7.4.5): random planes survive the FULL stack
    — Annex B escaping (random bytes guarantee emulation-prevention
    hits), parameter-set activation, slice-header walk, per-MB
    mb_type + pcm alignment, 4:2:0 sample order. Non-I_PCM mb_types
    and truncated samples fail loudly."""
    import numpy as np
    import pytest as _pytest

    from table_demo_spark.operators import codecs as C

    rng = np.random.default_rng(21)
    sps_rbsp = C.encode_h264_sps(66, 30, 3, 2)  # 48x32
    pps_rbsp = C.encode_h264_pps(
        0, 0, pic_init_qp_minus26=-3, deblocking_filter_control_present=1
    )
    sps, pps = C.decode_h264_sps(sps_rbsp), C.decode_h264_pps(pps_rbsp)
    y = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    y[0, 0:3] = (0, 0, 1)  # planted start-code collision
    cb = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    cr = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    sl = C.encode_h264_ipcm_slice(sps, pps, y, cb, cr, frame_num=5,
                                  idr_pic_id=2)
    stream = C.encode_annexb(
        [(3, 7, sps_rbsp), (3, 8, pps_rbsp), (3, 5, sl)]
    )
    nals = C.decode_annexb(stream)
    ss = {0: C.decode_h264_sps(nals[0]["rbsp"])}
    ps = {0: C.decode_h264_pps(nals[1]["rbsp"])}
    hdr, yd, cbd, crd = C.decode_h264_ipcm_slice(
        nals[2]["rbsp"], 5, 3, ps, ss
    )
    assert hdr["slice_type"] == "I" and hdr["frame_num"] == 5
    assert hdr["idr_pic_id"] == 2
    assert np.array_equal(yd, y)
    assert np.array_equal(cbd, cb) and np.array_equal(crd, cr)
    # the escape layer really fired on the planted 00 00 01 run
    assert b"\x00\x00\x03" in stream
    with _pytest.raises(ValueError, match="truncated I_PCM"):
        C.decode_h264_ipcm_slice(nals[2]["rbsp"][:100], 5, 3, ps, ss)
    with _pytest.raises(ValueError, match="I_PCM"):
        # an I-slice whose first mb_type is NOT 25 (e.g. 0 = I_4x4)
        hdr_only = C.encode_h264_slice_header(
            sps, pps, 7, 0, 5, 0, idr_pic_id=2, nal_ref_idc=3
        )
        w = C._ExpGolombWriter()
        w.ue(0)
        w.align()
        C.decode_h264_ipcm_slice(
            hdr_only + bytes(w.out) + b"\x00" * 400, 5, 3, ps, ss
        )
    with _pytest.raises(ValueError):
        C.encode_h264_ipcm_slice(sps, pps, y[:16], cb, cr)


def test_zstd_dict_training_pays_on_templated_corpus():
    """The per-source dictionary actually BUYS compression on the
    shape it exists for (small docs sharing boilerplate): dict-coded
    frames must be smaller than dict-less ones, and both roundtrip
    byte-exactly through the system libzstd."""
    from table_demo_spark.operators.compress import _Zstd

    zs = _Zstd()
    boiler = (
        b"<html><head><title>product page</title></head><body>"
        b"standard header, navigation, breadcrumbs, footer text "
    )
    docs = [
        boiler + f"item {i}: unique description {i * 97 % 1009}".encode()
        for i in range(80)
    ]
    d = zs.train(docs[:64])
    assert d, "training failed on a clearly dictionary-friendly corpus"
    with_d = sum(len(zs.compress(x, d)) for x in docs[64:])
    without = sum(len(zs.compress(x, b"")) for x in docs[64:])
    assert with_d < without, (with_d, without)
    for x in docs[64:]:
        assert zs.decompress(zs.compress(x, d), len(x), d) == x
        assert zs.decompress(zs.compress(x, b""), len(x), b"") == x
    # wrong dictionary fails loudly, not silently
    import pytest as _pytest

    other = zs.train([b"completely different corpus %d" % i for i in range(64)])
    frame = zs.compress(docs[70], d)
    if other and other != d:
        with _pytest.raises(ValueError):
            zs.decompress(frame, len(docs[70]), other)


def test_h264_slice_header_property_roundtrip():
    """Hypothesis sweep over the slice-header conditional space:
    every combination of slice type (incl. the +5 aliases), IDR/non-
    IDR, CAVLC/CABAC, poc_type 0/2, frame_num width, deblocking
    presence/idc, direct flag and nal_ref_idc gating must round-trip
    field-exactly — the branch interactions a handful of hand
    vectors cannot cover."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from table_demo_spark.operators import codecs as C

    @settings(max_examples=120, deadline=None)
    @given(
        lmfn=st.integers(0, 8),
        poc0=st.booleans(),
        entropy=st.booleans(),
        deblock=st.booleans(),
        q0=st.integers(-20, 20),
        sel=st.integers(0, 2),
        plus5=st.booleans(),
        idr=st.booleans(),
        first_mb=st.integers(0, 500),
        frame_num=st.integers(0, 1 << 12),
        qpd=st.integers(-10, 10),
        poc=st.integers(0, 255),
        direct=st.booleans(),
        cabac=st.integers(0, 2),
        didc=st.integers(0, 2),
        alpha=st.integers(-6, 6),
        beta=st.integers(-6, 6),
        refidc=st.integers(0, 3),
    )
    def case(lmfn, poc0, entropy, deblock, q0, sel, plus5, idr, first_mb,
             frame_num, qpd, poc, direct, cabac, didc, alpha, beta, refidc):
        sps = C.decode_h264_sps(
            C.encode_h264_sps(
                66, 30, 12, 9, log2_max_frame_num_minus4=lmfn,
                poc_type=0 if poc0 else 2, log2_max_poc_lsb_minus4=4,
            )
        )
        pps = C.decode_h264_pps(
            C.encode_h264_pps(
                0, 0, pic_init_qp_minus26=q0,
                deblocking_filter_control_present=int(deblock),
                entropy_coding_mode=int(entropy),
            )
        )
        stype_ue = (2 if idr else sel) + 5 * plus5
        fn = frame_num % (1 << (4 + lmfn))
        hdr = C.encode_h264_slice_header(
            sps, pps, stype_ue, first_mb, fn, qpd,
            idr_pic_id=poc % 64 if idr else None,
            poc_lsb=poc if poc0 else 0,
            direct_spatial_mv=int(direct), cabac_init_idc=cabac,
            disable_deblocking_idc=didc, alpha_c0_offset_div2=alpha,
            beta_offset_div2=beta, nal_ref_idc=refidc,
        )
        got = C.decode_h264_slice_header(
            hdr, 5 if idr else 1, 3 if idr else refidc, {0: pps}, {0: sps}
        )
        assert got["first_mb"] == first_mb
        assert got["slice_type_ue"] == stype_ue
        assert got["frame_num"] == fn
        assert got["poc_lsb"] == (poc if poc0 else 0)
        assert got["slice_qp"] == 26 + q0 + qpd
        if idr:
            assert got["idr_pic_id"] == poc % 64
        if got["slice_type"] == "B":
            assert got["direct_spatial_mv"] == int(direct)
        if entropy and got["slice_type"] not in ("I", "SI"):
            assert got["cabac_init_idc"] == cabac
        if deblock:
            assert got["disable_deblocking_idc"] == didc
            if didc != 1:
                assert got["alpha_c0_offset"] == 2 * alpha
                assert got["beta_offset"] == 2 * beta
        else:
            assert got["disable_deblocking_idc"] == -1

    case()


def test_png_palette_property_roundtrip():
    """Hypothesis sweep over palette PNG space: any dims 1..24,
    depth in {1,2,4,8}, both interlace modes, arbitrary indices and
    palettes round-trip pixel-exactly through encode_png_palette /
    decode_png."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from table_demo_spark.operators import codecs as C

    @settings(max_examples=60, deadline=None)
    @given(
        h=st.integers(1, 24), w=st.integers(1, 24),
        depth=st.sampled_from([1, 2, 4, 8]),
        interlace=st.booleans(),
        seed=st.integers(0, 2**31),
    )
    def case(h, w, depth, interlace, seed):
        rng = np.random.default_rng(seed)
        n = min(1 << depth, 256)
        pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, (h, w), dtype=np.uint8)
        got = C.decode_png(C.encode_png_palette(idx, pal, depth, interlace))
        assert np.array_equal(got, pal[idx])

    case()


# -- HEIF family (AVIF/HEIC) via system libheif (r13) ------------------------


def _heif_mod():
    from table_demo_spark.operators import heif

    if not heif.have_libheif():
        pytest.skip("libheif.so.1 not available")
    return heif


def test_heif_lossless_roundtrips_are_bit_exact_in_gamut():
    """The query invariant: within the in-RGB-gamut box (Y [70,180],
    C [108,148]) the lossless roundtrip is BIT-EXACT for both codecs,
    including at an odd-grid size the queries don't use (so the pin
    is not fixture-shaped).  Out-of-box data is deliberately NOT
    asserted exact — libheif's shared colour pipeline clips
    out-of-gamut YCbCr (measured r13; documented in heif.py)."""
    import numpy as np

    heif = _heif_mod()
    rng = np.random.default_rng(77)
    for h, w in ((48, 64), (34, 50)):
        y = (70 + rng.integers(0, 111, (h, w))).astype(np.uint8)
        cb = (108 + rng.integers(0, 41, ((h + 1) // 2, (w + 1) // 2))).astype(
            np.uint8
        )
        cr = (108 + rng.integers(0, 41, ((h + 1) // 2, (w + 1) // 2))).astype(
            np.uint8
        )
        for comp, params in (
            (heif.COMPRESSION_AV1, (("speed", "9"), ("threads", "1"))),
            (heif.COMPRESSION_HEVC, (("preset", "ultrafast"),)),
        ):
            data = heif.encode_heif(y, cb, cr, comp, params)
            y2, cb2, cr2 = heif.decode_heif(data)
            assert np.array_equal(y, y2), (comp, h, w)
            assert np.array_equal(cb, cb2) and np.array_equal(cr, cr2)


def test_avif_three_independent_decoders_agree_bit_exactly():
    """Cross-decoder adjudication on a LOSSY stream (where decoder
    bugs can hide behind 'close enough'): libaom, dav1d, and libgav1
    — three independent AV1 decoder codebases — must produce
    bit-identical planes, and libheif's own decode (dav1d plugin)
    must match them for in-gamut content."""
    import numpy as np

    heif = _heif_mod()
    for choice in (
        heif.AVIF_CODEC_AOM, heif.AVIF_CODEC_DAV1D, heif.AVIF_CODEC_LIBGAV1,
    ):
        if not heif.avif_decoder_available(choice):
            pytest.skip(f"libavif codec {choice} not compiled in")
    rng = np.random.default_rng(78)
    y = (70 + rng.integers(0, 111, (48, 64))).astype(np.uint8)
    cb = (108 + rng.integers(0, 41, (24, 32))).astype(np.uint8)
    cr = (108 + rng.integers(0, 41, (24, 32))).astype(np.uint8)
    lossy = heif.encode_heif(
        y, cb, cr, heif.COMPRESSION_AV1,
        (("speed", "8"), ("quality", "40")), lossless=False,
    )
    ref = heif.decode_avif_libavif(lossy, heif.AVIF_CODEC_AOM)
    assert not np.array_equal(ref[0], y)  # genuinely lossy fixture
    for choice in (heif.AVIF_CODEC_DAV1D, heif.AVIF_CODEC_LIBGAV1):
        got = heif.decode_avif_libavif(lossy, choice)
        for a, b in zip(ref, got):
            assert np.array_equal(a, b), f"decoder {choice} diverged"
    via_heif = heif.decode_heif(lossy)
    for a, b in zip(ref, via_heif):
        assert np.array_equal(a, b), "libheif decode diverged from libavif"
    # decode_heif's r16 fast path routes AVIF through libavif+dav1d
    # (single-threaded; libheif's dav1d plugin spawns an ncpu pool per
    # decode).  Pin the two routes bit-equal on the same stream so the
    # rerouting can never silently change what any query decodes.
    via_plugin = heif._decode_heif_libheif(lossy)
    for a, b in zip(via_heif, via_plugin):
        assert np.array_equal(a, b), "libavif fast path diverged from libheif"


def test_heif_negative_paths_fail_loudly():
    """Truncated containers and mid-payload corruption must raise,
    never return planes silently."""
    import numpy as np

    heif = _heif_mod()
    rng = np.random.default_rng(79)
    y = (70 + rng.integers(0, 111, (48, 64))).astype(np.uint8)
    cb = (108 + rng.integers(0, 41, (24, 32))).astype(np.uint8)
    cr = (108 + rng.integers(0, 41, (24, 32))).astype(np.uint8)
    data = heif.encode_heif(
        y, cb, cr, heif.COMPRESSION_AV1, (("speed", "9"),)
    )
    with pytest.raises(ValueError):
        heif.decode_heif(data[:64])
    with pytest.raises(ValueError):
        heif.decode_heif(data[: len(data) // 2])
    with pytest.raises(ValueError):
        heif.decode_avif_libavif(data[: len(data) // 2], heif.AVIF_CODEC_AOM)
    # mismatched plane geometry is rejected before touching libheif
    with pytest.raises(ValueError):
        heif.encode_heif(y, cb[:-1], cr, heif.COMPRESSION_AV1)


def test_decode_image_dispatches_heif_containers():
    """The generic image dispatcher (multimodal.decode_image) now
    routes ftyp containers to the real codecs instead of raising the
    pre-r13 NotImplementedError; RGB output comes from libheif's own
    colour conversion and matches its YCbCr decode dimensions."""
    import numpy as np

    heif = _heif_mod()
    from table_demo_spark.operators.multimodal import decode_image

    rng = np.random.default_rng(80)
    y = (70 + rng.integers(0, 111, (48, 64))).astype(np.uint8)
    cb = (108 + rng.integers(0, 41, (24, 32))).astype(np.uint8)
    cr = (108 + rng.integers(0, 41, (24, 32))).astype(np.uint8)
    for comp, params in (
        (heif.COMPRESSION_AV1, (("speed", "9"),)),
        (heif.COMPRESSION_HEVC, (("preset", "ultrafast"),)),
    ):
        rgb = decode_image(heif.encode_heif(y, cb, cr, comp, params))
        assert rgb.shape == (48, 64, 3) and rgb.dtype == np.uint8


def test_hevc_structure_walk_and_negatives():
    """The m49 walk parses a real x265 container (dims from SPS
    padding must reconcile with the ispe true dims), and the declared
    extension points fail loudly: sub-64 pictures (libheif's
    padded+cropped two-ispe shape) and truncated boxes."""
    import numpy as np

    heif = _heif_mod()
    from table_demo_spark.operators.codecs import (
        hevc_heic_structure,
        isobmff_boxes,
    )

    params = (
        ("preset", "ultrafast"), ("x265:pools", "none"),
        ("x265:frame-threads", "1"),
    )
    rng = np.random.default_rng(81)
    y = (70 + rng.integers(0, 111, (72, 104))).astype(np.uint8)
    cb = (108 + rng.integers(0, 41, (36, 52))).astype(np.uint8)
    cr = (108 + rng.integers(0, 41, (36, 52))).astype(np.uint8)
    data = heif.encode_heif(y, cb, cr, heif.COMPRESSION_HEVC, params)
    st = hevc_heic_structure(data)
    assert (st["width"], st["height"]) == (104, 72)
    assert (st["pic_w"], st["pic_h"]) == (112, 80)  # ceil-16 padding
    assert st["profile_idc"] == 3 and st["level_idc"] == 255
    assert st["chroma_format_idc"] == 1 and st["bit_depth"] == 8
    # sub-64 pictures produce the two-ispe derived-crop shape
    small = heif.encode_heif(
        y[:48, :56], cb[:24, :28], cr[:24, :28],
        heif.COMPRESSION_HEVC, params,
    )
    with pytest.raises(ValueError):
        hevc_heic_structure(small)
    with pytest.raises(ValueError):
        hevc_heic_structure(data[: len(data) // 3])
    with pytest.raises(ValueError):
        isobmff_boxes(b"\x00\x00\x00\xff" + b"ftypXXXX")  # bad size


def test_av1_structure_walk_and_negatives():
    """m50's OBU walk parses a real libaom AVIF (exact dims must
    triangulate: sequence header == ispe == libheif decode) and the
    framing negatives fail loudly: forbidden bit, truncated leb128,
    truncated payload, missing sequence header."""
    import numpy as np

    heif = _heif_mod()
    from table_demo_spark.operators.codecs import (
        av1_avif_structure,
        av1_leb128,
        av1_obus,
    )

    rng = np.random.default_rng(82)
    y = (70 + rng.integers(0, 111, (46, 110))).astype(np.uint8)
    cb = (108 + rng.integers(0, 41, (23, 55))).astype(np.uint8)
    cr = (108 + rng.integers(0, 41, (23, 55))).astype(np.uint8)
    data = heif.encode_heif(
        y, cb, cr, heif.COMPRESSION_AV1, (("speed", "9"), ("threads", "1"))
    )
    st = av1_avif_structure(data)
    assert (st["width"], st["height"]) == (110, 46)
    assert st["seq_profile"] == 0 and st["still_picture"] == 1
    assert (st["chroma_sub_x"], st["chroma_sub_y"]) == (1, 1)
    assert st["n_obus"] == 3
    dy, _, _ = heif.decode_heif(data)
    assert dy.shape == (46, 110)
    with pytest.raises(ValueError):
        av1_obus(b"\x80\x02\x00")  # forbidden bit
    with pytest.raises(ValueError):
        av1_leb128(b"\xff" * 9, 0)  # runaway leb128
    with pytest.raises(ValueError):
        av1_obus(b"\x0a\x7f")  # size exceeds stream
    with pytest.raises(ValueError):
        av1_avif_structure(data[: len(data) // 3])
