"""Every examples/ script runs end-to-end against the shared session
(the reference ships examples/ as its user-facing surface; ours run
fully offline on the deterministic built-in policies)."""

from __future__ import annotations

import importlib
import os
import sys

import pytest

EXAMPLES = [
    "quickstart",
    "async_memory",
    "importance_scoring",
    "procedural_memory",
    "multimodal_vision",
    "topology_boost",
    "usage_tracking",
    "corpus_dedup",
    "streaming_dedup",
    "similarity_search",
    "communities",
    "temporal_bench",
    "event_analytics",
    "layout_skew",
    "tokenize_pipeline",
]

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
)


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(spark, name, capsys):
    mod = importlib.import_module(name)
    mod.main(spark)
    out = capsys.readouterr().out
    assert out.strip()  # every example narrates what it did
