"""Oracle parity for the r6 registry additions (VERDICT r5 item 3):
tokenize_chunk, url_curation, quality_pareto, range_join_events —
the same driver-style compare the correctness gate runs at sf0.01,
pinned here at the test scale so regressions surface before the
driver does."""

from __future__ import annotations

import pytest

from grafeo_memory_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_DIR, assert_matches_oracle


@pytest.mark.parametrize(
    "name",
    ["tokenize_chunk", "url_curation", "quality_pareto", "range_join_events"],
)
def test_new_rows_match_oracle(spark, duck, name):
    assert_matches_oracle(QUERIES[name](spark, SF_DIR), duck, ORACLES[name])


def test_registry_at_cap():
    """The driver snapshots 50 queries; every entry must carry an
    oracle (no rows-only checks since r5)."""
    assert len(QUERIES) == 50
    assert set(ORACLES) == set(QUERIES)


def test_bench_extras_outside_correctness_window():
    """r9: the distributed scale-shape rows are bench-only — they must
    exist (so BENCH_r{N} keeps measuring the 100-TB loop shapes), never
    leak into the ≤50-entry correctness registry, and never shadow a
    registered query name."""
    from grafeo_memory_spark.queries import BENCH_EXTRAS

    assert set(BENCH_EXTRAS) == {
        "pagerank_distributed",
        "betweenness_distributed",
        "lpa_distributed",
        "cc_distributed",
    }
    assert not set(BENCH_EXTRAS) & set(QUERIES)


@pytest.mark.parametrize(
    "merged,survivor",
    [
        ("lookup_point_property", "filter_ops"),
        ("exact_dedup", "doc_fingerprints"),
        ("similarity_threshold", "knn_topk"),
        ("minhash_signatures", "simhash_fingerprints"),
    ],
)
def test_folded_slots_are_gone(merged, survivor):
    assert merged not in QUERIES
    assert survivor in QUERIES
