"""Default prompt templates for the LLM-backed policy layer.

The engine threads ``custom_fact_prompt`` / ``custom_update_prompt`` /
``custom_procedural_prompt`` through to the extractor and reconciler
protocols (`manager.py`); these are the paraphrased starting-point
defaults a user wiring a real LLM gets when no custom prompt is set —
the same template *surface* as the reference (`prompts.py:1-296`: one
system + user pair per extraction mode, reconciliation, relation
reconciliation, summarize/consolidate, temporal annotation, community
summary, image description), re-worded originally. Each template
documents its contract (what to extract, what to skip, the output
shape) rather than copying reference phrasing.

Placeholders use ``str.format`` fields and match the reference's
field names (``{user_id}``, ``{text}``, ``{facts}``, ``{new_facts}``,
``{existing_memories}``, ``{existing_relations}``, ``{new_relations}``,
``{memories}``, ``{count}``, ``{today}``, ``{entities}``,
``{relations}``) so custom prompts written for the reference drop in
unchanged.
"""

from __future__ import annotations

__all__ = [
    "FACT_EXTRACTION_SYSTEM",
    "FACT_EXTRACTION_USER",
    "PROCEDURAL_EXTRACTION_SYSTEM",
    "COMBINED_EXTRACTION_SYSTEM",
    "COMBINED_EXTRACTION_USER",
    "COMBINED_PROCEDURAL_EXTRACTION_SYSTEM",
    "EPISODIC_EXTRACTION_SYSTEM",
    "COMBINED_EPISODIC_EXTRACTION_SYSTEM",
    "ENTITY_EXTRACTION_SYSTEM",
    "ENTITY_EXTRACTION_USER",
    "RECONCILIATION_SYSTEM",
    "RECONCILIATION_USER",
    "RELATION_RECONCILE_SYSTEM",
    "RELATION_RECONCILE_USER",
    "SUMMARIZE_SYSTEM",
    "SUMMARIZE_USER",
    "TEMPORAL_ANNOTATION_SYSTEM",
    "TEMPORAL_ANNOTATION_USER",
    "COMMUNITY_SUMMARY_SYSTEM",
    "COMMUNITY_SUMMARY_USER",
    "IMAGE_DESCRIBE_SYSTEM",
    "default_extraction_prompt",
]


# --- semantic (fact) extraction -------------------------------------

FACT_EXTRACTION_SYSTEM = """\
You turn raw conversation text into a list of durable, standalone facts \
worth remembering about the participants.

Guidelines:
- Write each fact as one short declarative sentence (two at most) that \
makes sense with no surrounding context.
- When several details are really one topic, fold them into a single \
fact instead of splitting them apart.
- Resolve "I"/"he"/"she"/"they" to concrete names or ids whenever the \
text makes the referent clear, and phrase facts in the third person.
- Worth keeping: stated preferences, biographical details, \
relationships between people, notable events, expressed opinions.
- Not worth keeping: greetings, small talk, acknowledgements, filler.
- An input with nothing memorable yields an empty list, not a guess."""

FACT_EXTRACTION_USER = """\
The speaker below has user_id "{user_id}". List the memorable facts in \
this text.

Text:
{text}"""


# --- procedural extraction ------------------------------------------

PROCEDURAL_EXTRACTION_SYSTEM = """\
You mine conversation text for standing instructions: how the user \
wants things done, not what happens to be true about them.

Guidelines:
- Keep each item a single actionable rule or preference, merged with \
its near-duplicates on the same topic.
- Look for recurring-behavior signals: "always/never ..." habits, \
trigger-action rules ("if X comes up, do Y"), tone and formatting \
requests, choices of tool or method, and multi-step how-to procedures.
- Phrase items imperatively or in the third person, with pronouns \
resolved to concrete names where possible.
- Biographical facts, events, and world knowledge belong to semantic \
memory — leave them out here, along with greetings and filler.
- Return an empty list when the text carries no instructions."""


# --- combined (facts + graph) extraction ----------------------------

COMBINED_EXTRACTION_SYSTEM = """\
You produce BOTH a fact list and a small knowledge-graph fragment from \
conversation text, in one pass.

Part 1 — facts:
- Short, self-contained declarative statements in the third person, \
pronouns resolved, related details merged per topic.
- Cover preferences, biography, relationships, events, and opinions; \
skip greetings and filler.

Part 2 — entities and relations, drawn from those facts:
- Entities are the key people, organizations, places, and concepts; \
name them in lowercase with underscores instead of spaces \
(e.g. "globex_inc").
- Relations connect two named entities with a short predicate.

When nothing in the text is memorable, both lists come back empty."""

COMBINED_EXTRACTION_USER = """\
The speaker below has user_id "{user_id}". Produce the facts, entities, \
and relations found in this text.

Text:
{text}"""

COMBINED_PROCEDURAL_EXTRACTION_SYSTEM = """\
You produce BOTH an instruction list and a small knowledge-graph \
fragment from conversation text, in one pass.

Part 1 — instructions:
- Actionable rules and preferences only (habit statements, \
trigger-action rules, style requests, tool choices, procedures), \
merged per topic, phrased imperatively or in the third person.
- Plain facts, events, and biography do not belong here.

Part 2 — entities and relations, drawn from those instructions:
- Entities are the key tools, technologies, people, and concepts, \
named lowercase_with_underscores.
- Relations connect two named entities with a short predicate.

When the text carries no instructions, both lists come back empty."""


# --- episodic extraction --------------------------------------------

EPISODIC_EXTRACTION_SYSTEM = """\
You record what *happened* in an interaction: paired question/answer \
events, not standalone knowledge.

Guidelines:
- Shape each item as an exchange record — what was asked or attempted, \
and what came back — e.g. "User asked how to X; the answer was Y."
- Keep a coherent back-and-forth as one item rather than fragmenting it.
- Use the third person and resolve pronouns to names or ids.
- Capture: queries made, lookups run, conclusions drawn, decisions \
taken.
- Standalone facts belong to semantic memory and rules/preferences to \
procedural memory — exclude both here.
- No notable interaction means an empty list."""

COMBINED_EPISODIC_EXTRACTION_SYSTEM = """\
You record interaction events AND a small knowledge-graph fragment from \
conversation text, in one pass.

Part 1 — interaction events:
- Exchange records pairing the ask with the outcome ("User asked about \
X; the finding was Y"), one per coherent exchange, third person, \
pronouns resolved.
- Capture queries, lookups, conclusions, and decisions; exclude \
standalone facts and standing instructions.

Part 2 — entities and relations, drawn from those events:
- Entities are the key people, tools, topics, and concepts, named \
lowercase_with_underscores.
- Relations connect two named entities with a short predicate.

When there is no notable interaction, both lists come back empty."""


# --- standalone entity extraction -----------------------------------

ENTITY_EXTRACTION_SYSTEM = """\
From a list of facts, pull out the graph: every salient entity (person, \
organization, place, concept, ...) and every relation between two of \
them. Entity names are normalized to lowercase with underscores for \
spaces ("jane_doe", "globex_inc") so repeated mentions unify."""

ENTITY_EXTRACTION_USER = """\
These facts concern user_id "{user_id}". List their entities and \
relations:

{facts}"""


# --- memory reconciliation ------------------------------------------

RECONCILIATION_SYSTEM = """\
You merge freshly extracted facts into an existing memory store. For \
each NEW fact choose exactly one action:

- ADD — nothing in the store covers it; write a new memory.
- UPDATE — it revises something already stored; set target_memory_id \
to the memory being revised and supply the replacement text.
- DELETE — it flatly contradicts a stored memory that cannot be \
salvaged; set target_memory_id to the memory to remove.
- NONE — the store already says this; do nothing.

Decision rules:
- A changed attribute (new employer, new city, new status) is an \
UPDATE of the old memory, never a DELETE followed by an ADD.
- "X is now true" against a stored "X was otherwise" is an UPDATE \
("the car got repaired" updates "the car is broken").
- Additive facts coexist: liking one more thing ADDs next to existing \
likes instead of replacing them — one relation type may hold several \
values at once.
- Reserve DELETE for explicit contradiction with nothing to merge.
- Several new facts about one stored memory should collapse into a \
single UPDATE.
- With an empty store, every fact is an ADD.
- UPDATE and DELETE are invalid without target_memory_id; never omit \
it."""

RECONCILIATION_USER = """\
NEW FACTS:
{new_facts}

EXISTING MEMORIES:
{existing_memories}

Choose an action for every new fact."""


# --- relation reconciliation ----------------------------------------

RELATION_RECONCILE_SYSTEM = """\
You prune a knowledge graph's edge set. Given the relations already in \
the graph and relations newly extracted from text, name the EXISTING \
relations that are no longer true.

Remove an existing relation only when:
- the new information directly supersedes it (a changed job, home, \
affiliation, state), or
- it is stale and the new relations carry its replacement.

Keep it when:
- the relation type legitimately fans out — "enjoys" pointing at two \
different foods is two true edges, not a contradiction, or
- old and new relations simply talk about different things.

No removals needed → return an empty list."""

RELATION_RECONCILE_USER = """\
EXISTING RELATIONSHIPS:
{existing_relations}

NEW RELATIONSHIPS:
{new_relations}

Name the existing relationships that should be removed."""


# --- consolidation / summarize --------------------------------------

SUMMARIZE_SYSTEM = """\
You compact a batch of per-user memory entries into fewer entries \
without losing information.

Guidelines:
- Cluster entries by theme (job, hobbies, family, ...) and emit one \
merged entry per theme.
- A merged entry must stand alone as a clear statement and retain \
EVERY fact from its inputs — minor details included; overlap collapses \
to one mention.
- Write in the third person.
- An entry with no thematic sibling passes through unchanged.
- Never introduce information the inputs do not contain."""

SUMMARIZE_USER = """\
Compact the {count} memory entries below into fewer thematic entries:

{memories}"""


# --- temporal annotation --------------------------------------------

TEMPORAL_ANNOTATION_SYSTEM = """\
You attach real-world validity windows to extracted facts: when each \
became true (valid_at) and, where the text says so, when it stopped \
being true (invalid_at).

Guidelines:
- Dates are ISO-8601 (YYYY-MM-DD), emitted only when the text states \
or clearly implies them.
- Resolve relative expressions ("a year ago", "last spring", "since \
2021") against the reference date you are given.
- A fact with no temporal signal gets valid_at null — never invent a \
date.
- Set invalid_at only on explicit ended-ness ("no longer", "used to", \
"quit in 2022", "until last month").
- Address facts by their 0-based position in the input list.
- Annotate only where the signal is clear; silence beats guessing."""

TEMPORAL_ANNOTATION_USER = """\
Today's date: {today}

ORIGINAL TEXT:
{text}

EXTRACTED FACTS:
{facts}

Attach validity windows to these facts."""


# --- community summaries --------------------------------------------

COMMUNITY_SUMMARY_SYSTEM = """\
You label communities in a knowledge graph. From a cluster of entities \
and the relations among them, produce a short name and a summary.

Guidelines:
- Name: 2-5 words naming the cluster's common thread \
("Hiking Trip Plans").
- Summary: 1-3 sentences stating what binds these entities together \
and the key facts about them.
- Stay inside what the entities and relations actually support — no \
invented context."""

COMMUNITY_SUMMARY_USER = """\
ENTITIES:
{entities}

RELATIONSHIPS:
{relations}

Produce a name and summary for this entity community."""


# --- image description ----------------------------------------------

IMAGE_DESCRIBE_SYSTEM = """\
You describe images for a memory store: plainly and concretely. Report \
the people, objects, visible text, setting, and activity you can \
actually see, and nothing you would have to assume."""


_EXTRACTION_DEFAULTS = {
    "semantic": FACT_EXTRACTION_SYSTEM,
    "procedural": PROCEDURAL_EXTRACTION_SYSTEM,
    "episodic": EPISODIC_EXTRACTION_SYSTEM,
    None: FACT_EXTRACTION_SYSTEM,
}


def default_extraction_prompt(memory_type: str | None) -> str:
    """The default system prompt for a memory type (NULL ≡ semantic,
    the engine-wide F6 convention); the manager uses this whenever the
    matching ``custom_*_prompt`` knob is unset."""
    return _EXTRACTION_DEFAULTS.get(memory_type, FACT_EXTRACTION_SYSTEM)
