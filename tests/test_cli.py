"""CLI surface (reference `cli.py`): each subcommand drives the engine
and prints text or JSON. Tests inject an in-memory engine the way the
reference's CLI tests drive `main` with a mock manager."""

from __future__ import annotations

import io
import json

from grafeo_memory_spark.cli import main
from grafeo_memory_spark.manager import MemoryEngine

NOW = [1_700_000_000_000]


def tick():
    NOW[0] += 60_000
    return NOW[0]


def _run(engine, *argv):
    out = io.StringIO()
    code = main(list(argv), engine=engine, out=out)
    return code, out.getvalue()


def _json_lines(text):
    return json.loads(text.strip().splitlines()[-1])


def test_add_list_search_stats_roundtrip(spark):
    eng = MemoryEngine(spark, now_fn=tick)
    code, out = _run(eng, "--json", "add", "likes espresso", "--no-infer")
    assert code == 0
    added = _json_lines(out)["added"]
    assert len(added) == 1

    code, out = _run(eng, "--json", "list")
    assert [r["text"] for r in _json_lines(out)] == ["likes espresso"]

    code, out = _run(eng, "--json", "search", "espresso", "-k", "3")
    rows = _json_lines(out)
    assert rows and rows[0]["text"] == "likes espresso"

    code, out = _run(eng, "--json", "stats")
    st = _json_lines(out)
    assert st["total_memories"] == 1
    assert st["memories_by_type"] == {"semantic": 1}


def test_update_history_delete(spark):
    eng = MemoryEngine(spark, now_fn=tick)
    _, out = _run(eng, "--json", "add", "drinks tea", "--no-infer")
    mid = _json_lines(out)["added"][0]

    code, out = _run(eng, "--json", "update", str(mid), "drinks oolong tea")
    new_id = _json_lines(out)["updated"][0]

    code, out = _run(eng, "--json", "history", str(new_id))
    events = [r["event"] for r in _json_lines(out)]
    assert "UPDATE" in events

    code, out = _run(eng, "--json", "delete", str(new_id))
    assert _json_lines(out)["deleted"] == [new_id]
    _, out = _run(eng, "--json", "list")
    assert _json_lines(out) == []


def test_delete_requires_target_and_all(spark):
    eng = MemoryEngine(spark, now_fn=tick)
    code, _ = _run(eng, "delete")
    assert code == 2
    _run(eng, "add", "a", "--no-infer")
    _run(eng, "add", "b", "--no-infer")
    code, out = _run(eng, "--json", "delete", "--all")
    assert _json_lines(out)["deleted_count"] == 2


def test_explain_and_no_command(spark):
    eng = MemoryEngine(spark, now_fn=tick)
    _run(eng, "add", "fact one", "--no-infer")
    code, out = _run(eng, "--json", "explain", "fact")
    assert code == 0
    stages = _json_lines(out)["stages"]
    assert "final" in stages

    code, out = _run(eng)
    assert code == 2 and "usage" in out.lower()


def test_version_flag(spark):
    from grafeo_memory_spark import __version__

    eng = MemoryEngine(spark, now_fn=tick)
    code, out = _run(eng, "--version")
    assert code == 0 and out.strip() == __version__


def test_type_filters_on_search_and_list(spark):
    eng = MemoryEngine(spark, now_fn=tick)
    _run(eng, "add", "how to deploy", "--no-infer", "--type", "procedural")
    _run(eng, "add", "likes tea", "--no-infer")

    code, out = _run(eng, "--json", "list", "--type", "procedural")
    assert [r["text"] for r in _json_lines(out)] == ["how to deploy"]

    code, out = _run(
        eng, "--json", "search", "deploy", "--type", "procedural"
    )
    assert [r["text"] for r in _json_lines(out)] == ["how to deploy"]


def test_min_score_filters_results(spark):
    eng = MemoryEngine(spark, now_fn=tick)
    _run(eng, "add", "exact phrase", "--no-infer")
    code, out = _run(
        eng, "--json", "search", "completely unrelated words",
        "--min-score", "0.99",
    )
    assert code == 0 and _json_lines(out) == []


def test_add_from_stdin(spark, monkeypatch):
    import io as _io

    eng = MemoryEngine(spark, now_fn=tick)
    monkeypatch.setattr("sys.stdin", _io.StringIO("piped fact"))
    code, out = _run(eng, "--json", "add", "-", "--no-infer")
    assert code == 0 and len(_json_lines(out)["added"]) == 1
    code, out = _run(eng, "--json", "list")
    assert [r["text"] for r in _json_lines(out)] == ["piped fact"]


def test_delete_yes_flag_accepted(spark):
    eng = MemoryEngine(spark, now_fn=tick)
    _run(eng, "add", "temp", "--no-infer")
    code, out = _run(eng, "--json", "delete", "--all", "--yes")
    assert code == 0 and _json_lines(out)["deleted_count"] == 1


def test_yolo_flag_parses(spark):
    # --yolo only changes engine construction (covered in
    # test_instrumentation); with an injected engine it must just parse
    eng = MemoryEngine(spark, now_fn=tick)
    code, out = _run(eng, "--yolo", "--json", "stats")
    assert code == 0


def test_python_dash_m_entry():
    """Parity with the reference's `python -m` module entry."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "grafeo_memory_spark", "--version"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    from grafeo_memory_spark import __version__

    assert proc.stdout.strip() == __version__
