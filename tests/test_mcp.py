"""MCP tool surface (reference `tests/test_mcp_tools.py`, 17 tests):
every tool called against a recording FakeManager through the same
ctx.request_context.lifespan_context.manager path, same JSON envelopes —
plus an end-to-end class running the tools over the REAL Spark engine,
which the reference cannot do in-process (its tests skip without the
``mcp`` package; ours never need it)."""

from __future__ import annotations

import json

import pytest

from grafeo_memory_spark.lifecycle import ExecResult
from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.mcp import make_context, mcp
from grafeo_memory_spark.mcp.tools import (
    memory_add,
    memory_add_batch,
    memory_delete,
    memory_delete_all,
    memory_explain_search,
    memory_history,
    memory_list,
    memory_search,
    memory_stats,
    memory_summarize,
    memory_update,
)


class FakeManager:
    """Engine-shaped fake that records calls and returns canned data."""

    def __init__(self):
        self.calls: list[tuple[str, dict]] = []

    def add(self, text, *, user_id="default", memory_type="semantic", infer=True, **kw):
        self.calls.append(("add", {"text": text, "user_id": user_id,
                                   "memory_type": memory_type, "infer": infer}))
        return ExecResult(added_ids=[1])

    def add_batch(self, texts, *, user_id="default", memory_type="semantic", infer=True, **kw):
        self.calls.append(("add_batch", {"texts": texts, "user_id": user_id}))
        return ExecResult(added_ids=list(range(len(texts))))

    def search(self, query, *, user_id="default", k=10, memory_type=None, **kw):
        self.calls.append(("search", {"query": query, "user_id": user_id,
                                      "k": k, "memory_type": memory_type, **kw}))
        return [{"memory_id": 1, "text": "alice works at acme", "score": 0.95}]

    def explain(self):
        return ["scan", "score", "final"]

    def update(self, memory_id, text, **kw):
        self.calls.append(("update", {"memory_id": memory_id, "text": text}))
        return ExecResult(updated_ids=[memory_id + 100], expired_ids=[memory_id])

    def delete(self, memory_id, **kw):
        self.calls.append(("delete", {"memory_id": memory_id}))

    def delete_all(self, *, user_id="default", **kw):
        self.calls.append(("delete_all", {"user_id": user_id}))
        return 5

    def get_all(self, *, user_id="default", filters=None, **kw):
        self.calls.append(("get_all", {"user_id": user_id, "filters": filters}))
        return [{"id": 1, "text": "a fact"}]

    def summarize(self, *, user_id="default", preserve_recent=5, batch_size=20, **kw):
        self.calls.append(("summarize", {"user_id": user_id,
                                         "preserve_recent": preserve_recent,
                                         "batch_size": batch_size}))
        return [10]

    def history(self, memory_id, **kw):
        self.calls.append(("history", {"memory_id": memory_id}))
        return [{"event": "ADD", "new_text": "original text", "timestamp": 1000000}]

    def stats(self):
        return {"total_memories": 3, "memories_by_type": {"semantic": 3}}


def _ctx(manager=None):
    mgr = manager or FakeManager()
    return make_context(mgr), mgr


class TestMemoryAdd:
    def test_basic(self):
        ctx, mgr = _ctx()
        result = json.loads(memory_add("alice likes pizza", ctx=ctx))
        assert result["events"] == [{"action": "add", "memory_id": "1"}]
        name, args = mgr.calls[0]
        assert name == "add"
        assert args == {"text": "alice likes pizza", "user_id": "default",
                        "memory_type": "semantic", "infer": True}

    def test_with_user_and_type(self):
        ctx, mgr = _ctx()
        result = json.loads(memory_add("use pytest", user_id="alice",
                                       memory_type="procedural", ctx=ctx))
        assert result["events"][0]["action"] == "add"
        assert mgr.calls[0][1]["user_id"] == "alice"
        assert mgr.calls[0][1]["memory_type"] == "procedural"

    def test_no_infer(self):
        ctx, mgr = _ctx()
        memory_add("raw text", infer=False, ctx=ctx)
        assert mgr.calls[0][1]["infer"] is False


class TestMemoryAddBatch:
    def test_basic(self):
        ctx, mgr = _ctx()
        result = json.loads(memory_add_batch(["fact 1", "fact 2"], ctx=ctx))
        assert len(result["events"]) == 2
        assert mgr.calls[0][0] == "add_batch"


class TestMemorySearch:
    def test_basic(self):
        ctx, _ = _ctx()
        result = json.loads(memory_search("alice work", ctx=ctx))
        assert result["results"][0]["text"] == "alice works at acme"
        assert result["results"][0]["score"] == 0.95

    def test_with_filters(self):
        ctx, mgr = _ctx()
        memory_search("query", user_id="bob", k=5, memory_type="procedural",
                      min_score=0.5, point_in_time=123, ctx=ctx)
        args = mgr.calls[0][1]
        assert args["user_id"] == "bob"
        assert args["k"] == 5
        assert args["memory_type"] == "procedural"
        assert args["min_score"] == 0.5
        assert args["point_in_time"] == 123


class TestMemoryUpdate:
    def test_basic(self):
        ctx, mgr = _ctx()
        result = json.loads(memory_update("42", "new text", ctx=ctx))
        assert result["event"]["action"] == "update"
        assert result["event"]["text"] == "new text"
        assert mgr.calls[0] == ("update", {"memory_id": 42, "text": "new text"})


class TestMemoryDelete:
    def test_basic(self):
        ctx, _ = _ctx()
        result = json.loads(memory_delete("42", ctx=ctx))
        assert result["deleted"] is True
        assert result["memory_id"] == "42"

    def test_delete_all(self):
        ctx, mgr = _ctx()
        result = json.loads(memory_delete_all(user_id="alice", ctx=ctx))
        assert result["deleted_count"] == 5
        assert mgr.calls[0][1]["user_id"] == "alice"


class TestMemoryList:
    def test_basic(self):
        ctx, _ = _ctx()
        result = json.loads(memory_list(ctx=ctx))
        assert result["memories"][0]["text"] == "a fact"

    def test_with_type_filter(self):
        ctx, mgr = _ctx()
        memory_list(memory_type="procedural", ctx=ctx)
        assert mgr.calls[0][1]["filters"] == {"memory_type": "procedural"}


class TestMemorySummarize:
    def test_basic(self):
        ctx, mgr = _ctx()
        result = json.loads(memory_summarize(ctx=ctx))
        assert result["events"] == [{"action": "add", "memory_id": "10"}]
        assert mgr.calls[0][1]["preserve_recent"] == 5

    def test_custom_params(self):
        ctx, mgr = _ctx()
        memory_summarize(preserve_recent=10, batch_size=50, ctx=ctx)
        assert mgr.calls[0][1]["preserve_recent"] == 10
        assert mgr.calls[0][1]["batch_size"] == 50


class TestMemoryHistory:
    def test_basic(self):
        ctx, _ = _ctx()
        result = json.loads(memory_history("42", ctx=ctx))
        assert result["history"][0]["event"] == "ADD"
        assert result["history"][0]["new_text"] == "original text"


class TestMemoryStats:
    def test_basic(self):
        ctx, _ = _ctx()
        result = json.loads(memory_stats(ctx=ctx))
        assert result["total_memories"] == 3


class TestExplainSearch:
    def test_basic(self):
        ctx, _ = _ctx()
        result = json.loads(memory_explain_search("alice work", ctx=ctx))
        assert result["query"] == "alice work"
        assert result["steps"] == ["scan", "score", "final"]
        assert len(result["results"]) == 1


class TestErrorHandling:
    def test_tool_returns_error_json(self):
        class Broken(FakeManager):
            def search(self, *a, **kw):
                raise RuntimeError("DB connection failed")

        ctx, _ = _ctx(Broken())
        result = json.loads(memory_search("test", ctx=ctx))
        assert "DB connection failed" in result["error"]

    def test_bad_memory_id_is_error_not_crash(self):
        ctx, _ = _ctx()
        result = json.loads(memory_delete("not-a-number", ctx=ctx))
        assert "error" in result


class TestRegistry:
    def test_all_tools_registered(self):
        expected = {
            "memory_add", "memory_add_batch", "memory_search",
            "memory_update", "memory_delete", "memory_delete_all",
            "memory_list", "memory_summarize", "memory_history",
            "memory_stats", "memory_explain_search",
        }
        assert expected <= set(mcp.tools)

    def test_resources_and_prompts_registered(self):
        assert "memory://config" in mcp.resources
        assert "memory://stats" in mcp.resources
        assert {"manage_memories", "knowledge_capture"} <= set(mcp.prompts)

    def test_all_tools_callable_with_fake(self):
        ctx, _ = _ctx()
        cases = [
            (memory_add, ("test text",)),
            (memory_add_batch, (["text1", "text2"],)),
            (memory_search, ("query",)),
            (memory_update, ("1", "new text")),
            (memory_delete, ("1",)),
            (memory_delete_all, ()),
            (memory_list, ()),
            (memory_summarize, ()),
            (memory_history, ("1",)),
            (memory_stats, ()),
            (memory_explain_search, ("q",)),
        ]
        for fn, args in cases:
            out = json.loads(fn(*args, ctx=ctx))
            assert isinstance(out, dict), fn.__name__

    def test_resources_render_with_fake(self):
        ctx, _ = _ctx()
        cfg = json.loads(mcp.resources["memory://config"](ctx=ctx))
        assert cfg["engine"] == "grafeo-memory-spark"
        st = json.loads(mcp.resources["memory://stats"](ctx=ctx))
        assert st["total_memories"] == 3

    def test_prompts_render(self):
        p = mcp.prompts["manage_memories"](topic="alice")
        assert "memory_search" in p and "alice" in p
        p2 = mcp.prompts["knowledge_capture"](text="doc body")
        assert "doc body" in p2


class TestEndToEndEngine:
    """Tools over the real Spark engine — one engine, one flow."""

    @pytest.fixture()
    def ctx(self, spark):
        t = [1_000_000]

        def now():
            t[0] += 1000
            return t[0]

        return make_context(MemoryEngine(spark, now_fn=now))

    def test_add_search_update_history_delete_flow(self, ctx):
        added = json.loads(
            memory_add("Alice works at Acme Corp", user_id="u", infer=False, ctx=ctx)
        )
        assert added["events"][0]["action"] == "add"
        mid = added["events"][0]["memory_id"]

        listed = json.loads(memory_list(user_id="u", ctx=ctx))
        assert [m["text"] for m in listed["memories"]] == ["Alice works at Acme Corp"]

        found = json.loads(memory_search("Where does Alice work?", user_id="u", ctx=ctx))
        assert any(r["text"] == "Alice works at Acme Corp" for r in found["results"])

        upd = json.loads(memory_update(mid, "Alice works at Globex", ctx=ctx))
        assert upd["event"]["action"] == "update"
        new_id = upd["event"]["memory_id"]

        hist = json.loads(memory_history(new_id, ctx=ctx))
        assert len(hist["history"]) >= 1

        st = json.loads(memory_stats(ctx=ctx))
        assert st["total_memories"] == 1

        deleted = json.loads(memory_delete(new_id, ctx=ctx))
        assert deleted["deleted"] is True

        explained = json.loads(memory_explain_search("Alice", user_id="u", ctx=ctx))
        assert "steps" in explained and explained["steps"]

        wiped = json.loads(memory_delete_all(user_id="u", ctx=ctx))
        assert wiped["deleted_count"] >= 0
