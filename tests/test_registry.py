"""Registry-order pins.

The external driver's CORRECTNESS check samples roughly the first 50
registry entries in registration order.  Round 2 silently evicted every
llm_*/src_*/stream_* query from that window by registering all 62 an_*
queries first.  These pins make the driver-visible slate an explicit,
reviewed artifact: any future registration change that would evict a
family from driver-verified coverage fails here first.
"""

from __future__ import annotations

from table_demo_spark.queries import DRIVER_SAMPLE, all_queries


def test_driver_sample_is_the_registry_prefix() -> None:
    queries = all_queries()
    n = len(DRIVER_SAMPLE)
    assert 48 <= n <= 50  # exactly 50 at round end; <=50 mid-round
    assert [q.name for q in queries[:n]] == list(DRIVER_SAMPLE)


def test_driver_sample_rotates_to_least_recently_verified() -> None:
    """Post-closure LRU regime (r8 verdict 'Next round #2'): the
    never-verified set emptied when the driver-evidence union closed at
    237/237 in r8, so freshness now means RECENCY — each round >=20
    sample slots must go to queries whose newest committed
    CORRECTNESS_r*.json row is oldest (last_seen <= the 40th-smallest
    last_seen over the whole registry, ties inclusive; a query with no
    row yet — i.e. registered this round — counts as oldest of all).
    This bounds every query's evidence age at ~registry/20 rounds and,
    by construction, fails at round START until the sample is rotated:
    the previous round's slate was just verified, so it no longer
    overlaps the stale cohort."""
    import glob
    import json
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), "..")
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as fh:
            for name in json.load(fh):
                last[name] = max(last.get(name, 0), rnd)
    names = [q.name for q in all_queries()]
    ages = sorted(last.get(n, 0) for n in names)
    threshold = ages[min(39, len(ages) - 1)]
    due = [n for n in DRIVER_SAMPLE if last.get(n, 0) <= threshold]
    assert len(due) >= 20, (threshold, due)


def test_driver_sample_spans_every_family() -> None:
    prefixes = {name.split("_", 1)[0] for name in DRIVER_SAMPLE}
    assert prefixes == {"ref", "an", "llm", "src", "stream"}
    # The LLM extension is the north star: every sub-family (dedup,
    # similarity, text, multimodal, pipeline) must stay driver-visible.
    llm_kinds = {
        name.split("_")[1][0] for name in DRIVER_SAMPLE if name.startswith("llm_")
    }
    assert {"d", "s", "t", "m", "p"} <= llm_kinds


def test_registry_has_no_duplicates_and_no_drops() -> None:
    queries = all_queries()
    names = [q.name for q in queries]
    assert len(names) == len(set(names))
    # Reordering must not drop anything: every sampled name resolves and
    # the registry keeps at least round 2's 178 entries.
    assert set(DRIVER_SAMPLE) <= set(names)
    assert len(names) >= 178


def test_bench_headline_partitions_the_registry() -> None:
    """r5 verdict #4 ('no silent caps'): every registry query is
    either timed by bench.py's HEADLINE or carries an explicit
    one-line exclusion reason. A new query that lands in neither
    fails here — exclusion is a reviewed decision, never a default."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    names = {q.name for q in all_queries()}
    headline = set(bench.HEADLINE)
    excluded = set(bench.EXCLUDED)
    assert headline <= names, headline - names
    assert excluded <= names, excluded - names
    assert not headline & excluded, headline & excluded
    assert headline | excluded == names, names - headline - excluded
    for name, reason in bench.EXCLUDED.items():
        assert len(reason) > 20, (name, reason)
