"""MCP prompt templates (reference `mcp/prompts.py`: two agent-guidance
prompts with the same workflow steps; text re-authored, not copied)."""

from __future__ import annotations

from grafeo_memory_spark.mcp.server import mcp


@mcp.prompt()
def manage_memories(topic: str = "") -> str:
    """Guide an AI agent through managing memories for a user conversation."""
    base = """\
You are operating a user's long-term memory store. Work in this order:

1. SEARCH before writing: call memory_search on the topic so you do not
   store duplicates of facts the system already knows.

2. STORE new information with memory_add, picking the memory_type:
   - "semantic"   — durable facts and biographical details
   - "procedural" — instructions, preferences, rules of behavior
   - "episodic"   — events and interactions that happened
   Use memory_add_batch when several independent facts arrive at once.

3. CORRECT stale facts with memory_update (pass the memory_id from a
   search result) instead of adding a contradicting entry.

4. AUDIT with memory_list when you need the full current state, and
   memory_history to see how a specific memory evolved.

5. COMPACT with memory_summarize when the store accumulates many
   overlapping entries; recent memories are preserved."""
    if topic:
        return f"{base}\n\nFocus on the topic: {topic}"
    return base


@mcp.prompt()
def knowledge_capture(text: str = "") -> str:
    """Guide an AI agent through extracting and storing knowledge from text."""
    base = """\
You are capturing knowledge from a document into the memory store:

1. READ the text and identify discrete facts, entities, and the
   relationships between them.

2. CHECK what is already stored: memory_search with the key terms.

3. INGEST with memory_add (or memory_add_batch for chunked long texts);
   extraction and reconciliation against existing memories run
   automatically.

4. VERIFY: search for the new facts and confirm they come back.

5. MAINTAIN: run memory_summarize if the store has grown cluttered."""
    if text:
        return f"{base}\n\nText to capture:\n{text}"
    return base
