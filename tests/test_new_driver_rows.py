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
