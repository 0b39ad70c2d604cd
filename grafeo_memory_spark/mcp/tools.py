"""MCP tools wrapping the Spark memory engine.

Mirrors `/root/reference/src/grafeo_memory/mcp/tools.py` (11 tools, same
names, same JSON response envelopes: ``events`` / ``results`` /
``memories`` / ``history`` / ``error`` / ``deleted`` /
``deleted_count``). Differences are deliberate and Spark-first:

- tools are sync — the engine is a Spark driver facade, there is no
  event loop to protect (FastMCP accepts sync tools);
- the engine returns DataFrames for search/get_all/history; THIS layer
  collects them, because an MCP response is by definition a driver-side
  k-row payload (the reference's tools serialize result lists the same
  way, `tools.py:16-19`);
- memory ids are ints in the engine; tools accept the reference's
  string ids and cast.
"""

from __future__ import annotations

import json
from typing import Any

from grafeo_memory_spark.mcp.server import mcp


def _manager(ctx: Any) -> Any:
    assert ctx is not None
    return ctx.request_context.lifespan_context.manager


def _rows(df: Any) -> list[dict]:
    """DataFrame → list of plain dicts (fakes may already return lists)."""
    if hasattr(df, "collect"):
        return [r.asDict(recursive=True) for r in df.collect()]
    return [dict(r) for r in df]


def _events(res: Any) -> list[dict]:
    """ExecResult → the reference's event-list shape
    (action/memory_id/text per event, `types.py` MemoryEvent)."""
    if isinstance(res, list):  # fakes may hand events through directly
        return [dict(e) for e in res]
    out: list[dict] = []
    for mid in getattr(res, "added_ids", []):
        out.append({"action": "add", "memory_id": str(mid)})
    for mid in getattr(res, "updated_ids", []):
        out.append({"action": "update", "memory_id": str(mid)})
    for mid in getattr(res, "expired_ids", []):
        out.append({"action": "delete", "memory_id": str(mid)})
    if getattr(res, "skipped", 0):
        out.append({"action": "none", "skipped": res.skipped})
    return out


@mcp.tool()
def memory_add(
    text: str,
    user_id: str | None = None,
    memory_type: str = "semantic",
    infer: bool = True,
    ctx: Any = None,
) -> str:
    """Store durable facts distilled from a piece of text.

    Reach for this whenever the conversation surfaces information worth
    keeping across sessions. To look up what is already stored, call
    memory_search instead; to rewrite one known entry, call
    memory_update.

    Args:
        text: Source text the extractor distills facts from.
        user_id: Owner of the stored memory (falls back to "default").
        memory_type: "semantic", "procedural", or "episodic".
        infer: True to run policy extraction, False to store as-is.

    Returns:
        JSON with events list (each with action, memory_id).
    """
    manager = _manager(ctx)
    try:
        res = manager.add(
            text,
            user_id=user_id or "default",
            memory_type=memory_type,
            infer=infer,
        )
        return json.dumps({"events": _events(res)}, default=str)
    except Exception as exc:
        return json.dumps({"error": str(exc)})


@mcp.tool()
def memory_add_batch(
    texts: list[str],
    user_id: str | None = None,
    memory_type: str = "semantic",
    infer: bool = True,
    ctx: Any = None,
) -> str:
    """Store facts from several texts in one call.

    Args:
        texts: The batch of source strings to distill facts from.
        user_id: Owner of the stored memories (falls back to "default").
        memory_type: "semantic", "procedural", or "episodic".
        infer: True to run policy extraction, False to store as-is.

    Returns:
        JSON with events list for all memories added.
    """
    manager = _manager(ctx)
    try:
        res = manager.add_batch(
            list(texts),
            user_id=user_id or "default",
            memory_type=memory_type,
            infer=infer,
        )
        return json.dumps({"events": _events(res)}, default=str)
    except Exception as exc:
        return json.dumps({"error": str(exc)})


@mcp.tool()
def memory_search(
    query: str,
    user_id: str | None = None,
    k: int = 10,
    memory_type: str | None = None,
    min_score: float | None = None,
    point_in_time: int | None = None,
    ctx: Any = None,
) -> str:
    """Retrieve relevant memories (vector + graph hybrid ranking).

    Args:
        query: The natural-language question to match against.
        user_id: Search memories for this user ("default" if omitted).
        k: Result-count cap (10 when unset).
        memory_type: Filter by type, or null for all.
        min_score: Minimum score threshold; results below are excluded.
        point_in_time: Epoch ms — only facts valid at this moment (F5).

    Returns:
        JSON with results list (each with memory_id, text, score).
    """
    manager = _manager(ctx)
    try:
        kw: dict[str, Any] = {
            "user_id": user_id or "default",
            "k": k,
            "memory_type": memory_type,
        }
        if min_score is not None:
            kw["min_score"] = min_score
        if point_in_time is not None:
            kw["point_in_time"] = point_in_time
        df = manager.search(query, **kw)
        return json.dumps({"results": _rows(df)}, default=str)
    except Exception as exc:
        return json.dumps({"error": str(exc)})


@mcp.tool()
def memory_update(memory_id: str, text: str, ctx: Any = None) -> str:
    """Rewrite one memory's text (embedding refreshed, history kept).

    Args:
        memory_id: Which memory to rewrite.
        text: Replacement content.

    Returns:
        JSON with the update event (action, memory_id, text).
    """
    manager = _manager(ctx)
    try:
        res = manager.update(int(memory_id), text)
        evs = _events(res)
        ev = next(
            (e for e in evs if e.get("action") == "update"),
            {"action": "update", "memory_id": str(memory_id)},
        )
        ev["text"] = text
        return json.dumps({"event": ev}, default=str)
    except Exception as exc:
        return json.dumps({"error": str(exc)})


@mcp.tool()
def memory_delete(memory_id: str, ctx: Any = None) -> str:
    """Remove one memory, addressed by its ID.

    Returns:
        JSON with success status.
    """
    manager = _manager(ctx)
    try:
        manager.delete(int(memory_id))
        return json.dumps({"deleted": True, "memory_id": str(memory_id)})
    except Exception as exc:
        return json.dumps({"error": str(exc)})


@mcp.tool()
def memory_delete_all(user_id: str | None = None, ctx: Any = None) -> str:
    """Wipe every memory a user has stored - irreversible.

    Returns:
        JSON with the count of deleted memories.
    """
    manager = _manager(ctx)
    try:
        count = manager.delete_all(user_id=user_id or "default")
        return json.dumps({"deleted_count": count})
    except Exception as exc:
        return json.dumps({"error": str(exc)})


@mcp.tool()
def memory_list(
    user_id: str | None = None,
    memory_type: str | None = None,
    ctx: Any = None,
) -> str:
    """Enumerate a user's stored memories.

    Args:
        user_id: Whose memories to enumerate (falls back to "default").
        memory_type: Filter by type, or null for all.

    Returns:
        JSON with memories list.
    """
    manager = _manager(ctx)
    try:
        filters = {"memory_type": memory_type} if memory_type else None
        df = manager.get_all(user_id=user_id or "default", filters=filters)
        return json.dumps({"memories": _rows(df)}, default=str)
    except Exception as exc:
        return json.dumps({"error": str(exc)})


@mcp.tool()
def memory_summarize(
    user_id: str | None = None,
    preserve_recent: int = 5,
    batch_size: int = 20,
    ctx: Any = None,
) -> str:
    """Compact aging memories into topic-grouped summaries.

    Args:
        user_id: Whose memories the consolidation sweeps.
        preserve_recent: How many newest entries stay untouched (5).
        batch_size: Entries folded per summarization batch (20).

    Returns:
        JSON with events list (ADD for each new summary).
    """
    manager = _manager(ctx)
    try:
        sids = manager.summarize(
            user_id=user_id or "default",
            preserve_recent=preserve_recent,
            batch_size=batch_size,
        )
        events = [
            {"action": "add", "memory_id": str(s)} for s in (sids or [])
        ]
        return json.dumps({"events": events}, default=str)
    except Exception as exc:
        return json.dumps({"error": str(exc)})


@mcp.tool()
def memory_history(memory_id: str, ctx: Any = None) -> str:
    """Return the audit trail of edits for one memory.

    Returns:
        JSON with history entries (event, old/new text, timestamp).
    """
    manager = _manager(ctx)
    try:
        df = manager.history(int(memory_id))
        return json.dumps({"history": _rows(df)}, default=str)
    except Exception as exc:
        return json.dumps({"error": str(exc)})


@mcp.tool()
def memory_stats(ctx: Any = None) -> str:
    """Report store-level counters (totals and per-type breakdown).

    Returns:
        JSON with total_memories, per-type counts, entity/relation
        counts.
    """
    manager = _manager(ctx)
    try:
        s = manager.stats()
        return json.dumps(dict(s), default=str)
    except Exception as exc:
        return json.dumps({"error": str(exc)})


@mcp.tool()
def memory_explain_search(
    query: str,
    user_id: str | None = None,
    k: int = 10,
    memory_type: str | None = None,
    ctx: Any = None,
) -> str:
    """Run a search and return the stage-by-stage pipeline trace with it.

    Returns:
        JSON with query, steps (stage trace), and results.
    """
    manager = _manager(ctx)
    try:
        df = manager.search(
            query, user_id=user_id or "default", k=k, memory_type=memory_type
        )
        rows = _rows(df)
        steps = manager.explain()
        return json.dumps(
            {"query": query, "steps": list(steps), "results": rows},
            default=str,
        )
    except Exception as exc:
        return json.dumps({"error": str(exc)})
