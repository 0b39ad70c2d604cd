"""Temporal-hint classification (X1) and date parsing (X2) — pure
driver-side functions on the query string, gating search behavior
(reference `temporal.py:9-88`, `extraction/temporal.py:26-62`).

These are not data-parallel: they run once per query and flip plan
parameters (include_expired, candidate widening, chronological sort,
point-in-time), exactly as the reference's `_search` does at
`manager.py:560-563`.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime, timezone

# Regex families mirroring the reference classifier's five signal
# groups (temporal.py:9-37): past-state, sequence/ordering, duration,
# point-in-time, and change-over-time phrasings.
_PAST_RE = re.compile(
    r"\b(used to|no longer|previously|formerly|in the past|before\b|"
    r"back then|at the time|originally)\b",
    re.I,
)
_SEQUENCE_RE = re.compile(
    r"\b(when did|what happened|first|then what|after that|timeline|"
    r"in what order|sequence of|history of)\b",
    re.I,
)
_DURATION_RE = re.compile(
    r"\b(how long|since when|for how many|how many days|how much time|"
    r"elapsed|duration|until when)\b",
    re.I,
)
_POINT_RE = re.compile(
    r"\b(as of|on (\d{4}-\d{2}-\d{2})|in (\d{4})\b|at that point)\b", re.I
)
_CHANGE_RE = re.compile(
    r"\b(changed|became|switched|moved from|evolved|updated)\b", re.I
)


@dataclass
class TemporalHints:
    """Classifier output (reference `temporal.py:39-88`)."""

    is_temporal: bool = False
    include_expired: bool = False
    sort_chronologically: bool = False
    expand_limit: bool = False
    point_in_time_hint: int | None = None  # epoch ms
    signals: list[str] = field(default_factory=list)


def classify_temporal(query: str) -> TemporalHints:
    """X1 — flag the temporal intent of a query string. Past-state and
    change questions must see expired (superseded) versions; sequence
    and duration questions get chronological ordering and a widened
    candidate set (the reference's k*2 at `manager.py:563`)."""
    h = TemporalHints()
    if _PAST_RE.search(query):
        h.signals.append("past_state")
        h.include_expired = True
    if _CHANGE_RE.search(query):
        h.signals.append("change_over_time")
        h.include_expired = True
    if _SEQUENCE_RE.search(query):
        h.signals.append("sequence")
        h.sort_chronologically = True
        h.expand_limit = True
    if _DURATION_RE.search(query):
        h.signals.append("duration")
        h.sort_chronologically = True
        h.expand_limit = True
        # a time-difference question needs BOTH endpoints, and the
        # earlier one is usually superseded (reference timediff hint,
        # `temporal.py:70-74`)
        h.include_expired = True
    if _POINT_RE.search(query):
        h.signals.append("point_in_time")
        # the phrase and the date may be separate tokens ("as of 2023"):
        # pull the first explicit date or year anywhere in the query
        date = re.search(r"\d{4}-\d{2}-\d{2}", query) or re.search(
            r"\b(?:19|20)\d{2}\b", query
        )
        if date:
            h.point_in_time_hint = parse_date_ms(date.group(0))
    h.is_temporal = bool(h.signals)
    return h


def parse_date_ms(s: str | int | None) -> int | None:
    """X2 — ISO date / ISO datetime / bare year → epoch ms (UTC); None
    on failure (reference `extraction/temporal.py:26-62`). Epoch-ms
    ints (already-parsed values riding a decision dict) pass through."""
    if isinstance(s, (int, float)) and not isinstance(s, bool):
        return int(s)
    if not s or not isinstance(s, str):
        return None
    s = s.strip()
    for parse in (
        lambda v: datetime.strptime(v, "%Y-%m-%dT%H:%M:%S"),
        lambda v: datetime.strptime(v, "%Y-%m-%d %H:%M:%S"),
        lambda v: datetime.strptime(v, "%Y-%m-%d"),
        lambda v: datetime(int(v), 1, 1) if re.fullmatch(r"\d{4}", v) else None,
    ):
        try:
            dt = parse(s)
        except (ValueError, TypeError):
            continue
        if dt is None:
            continue
        return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1000)
    return None


def normalize_messages(messages) -> tuple[str, str | None, list[str]]:
    """X4/X6 — input adapter (reference `messages.py:30-90`,
    actor extraction `manager.py:2043-2054`): accepts a plain string, a
    single message dict, or a list of message dicts; returns
    ``(joined_text, actor_id, image_urls)``. Dict content may be
    multimodal parts (text / image_url)."""
    if isinstance(messages, str):
        return messages, None, []
    if isinstance(messages, dict):
        messages = [messages]
    elif not isinstance(messages, list):
        raise TypeError(
            f"expected str, dict, or list[dict], got {type(messages).__name__}"
        )
    lines: list[str] = []
    images: list[str] = []
    actor: str | None = None
    for msg in messages:
        role = msg.get("role", "user")
        name = msg.get("name")
        content = msg.get("content", "")
        if isinstance(content, list):  # multimodal parts
            texts = []
            for part in content:
                if not isinstance(part, dict):  # skip, as the reference does
                    continue
                if part.get("type") == "image_url":
                    url = part.get("image_url")
                    url = url.get("url") if isinstance(url, dict) else url
                    if url:  # empty/missing URLs are dropped
                        images.append(url)
                else:
                    texts.append(part.get("text", ""))
            content = " ".join(t for t in texts if t)
        prefix = f"{name} ({role})" if name else role
        lines.append(f"{prefix}: {content}")
        if name:  # last named message wins (reference manager.py:2043-2054)
            actor = name
    return "\n".join(lines), actor, images
