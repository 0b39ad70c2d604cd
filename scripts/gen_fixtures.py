#!/usr/bin/env python
"""Generate the FIXTURES.md §B memory-graph tables deterministically
(seed=42) at sf ∈ {0.001, 0.01, 0.1} under /root/repo/fixtures/.

These are the reference's native data model (SURVEY.md §1.1): Memory /
Entity / Episode / Community nodes + a typed edge table + history log,
with hash-embedder vectors (protocols.HashEmbedder, dims=16) so
similarity results are reproducible across Spark, DuckDB and Python.

Topology guarantees (FIXTURES.md §B):
- every non-expired memory has 0-5 HAS_ENTITY edges, zipf-skewed so many
  entities are shared across ≥2 memories (A4 shared-ratio > 0);
- ≥1 LEADS_TO chain of length ≥5 per (user, run_id) (J10);
- NEXT_EPISODE chains ≥3 per session (J11);
- SUPERSEDES pairs: old node expired, new node inherits the old node's
  HAS_ENTITY edges (J9);
- RELATION edges forming 2-hop paths distinct from 1-hop (J3).

Run: python scripts/gen_fixtures.py   (writes ~8 MB total; idempotent)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from grafeo_memory_spark.protocols import HashEmbedder  # noqa: E402

OUT_ROOT = os.path.join(os.path.dirname(__file__), "..", "fixtures")
SFS = (0.001, 0.01, 0.1)
DIMS = 16
BASE_MS = 1_735_689_600_000  # 2025-01-01T00:00:00Z
DAY_MS = 86_400_000

USERS = ["default", "alice", "bob", "carol"]
USER_W = [0.4, 0.3, 0.2, 0.1]
MEM_TYPES = ["semantic", "procedural", "episodic"]
ENTITY_TYPES = ["person", "organization", "location", "concept"]
RELATION_TYPES = ["works_at", "lives_in", "knows", "part_of", "likes"]
GRAPHS = ["work", "personal"]
NOUNS = [
    "coffee", "piano", "garden", "rocket", "ledger", "harbor", "violin",
    "summit", "lantern", "orchid", "compass", "quarry", "bridge", "cipher",
    "meadow", "anchor", "turbine", "archive", "beacon", "canyon",
]
VERBS = ["likes", "studies", "visited", "manages", "builds", "reviews"]

ENT_BASE = 100_000_000
EPI_BASE = 200_000_000
COM_BASE = 300_000_000
HIS_BASE = 400_000_000


def gen_sf(sf: float) -> None:
    rng = np.random.default_rng(42)
    emb = HashEmbedder(DIMS)
    n_mem = int(600_000 * sf)
    n_ent = max(40, n_mem // 8)
    n_epi = max(30, n_mem // 3)

    out_dir = os.path.join(OUT_ROOT, f"sf{sf}")
    os.makedirs(out_dir, exist_ok=True)

    # ---------------- entities ----------------
    ent_names = []
    seen = set()
    for i in range(n_ent):
        a, b = NOUNS[i % len(NOUNS)], NOUNS[(i * 7 + 3) % len(NOUNS)]
        name = f"{a}_{b}_{i}"
        if i % 20 == 19:  # case-variant duplicates for X5 lower() matching
            name = name.capitalize()
        assert name not in seen
        seen.add(name)
        ent_names.append(name)
    ent_user = rng.choice(USERS, size=n_ent, p=USER_W)
    ent_graph = np.where(
        rng.random(n_ent) < 0.3, rng.choice(GRAPHS, size=n_ent), None
    )
    entities = pa.table(
        {
            "id": pa.array(ENT_BASE + np.arange(n_ent), pa.int64()),
            "name": pa.array(ent_names, pa.string()),
            "entity_type": pa.array(
                [ENTITY_TYPES[i % 4] for i in range(n_ent)], pa.string()
            ),
            "user_id": pa.array(ent_user.tolist(), pa.string()),
            "graph_name": pa.array(ent_graph.tolist(), pa.string()),
        }
    )

    # ---------------- memories ----------------
    mem_id = np.arange(1, n_mem + 1)
    user = rng.choice(USERS, size=n_mem, p=USER_W)
    created = BASE_MS + rng.integers(0, 300 * DAY_MS, n_mem)
    created.sort()  # ids roughly chronological, like engine node-ids
    learned = created - (rng.random(n_mem) < 0.2) * rng.integers(
        0, 30 * DAY_MS, n_mem
    )
    updated = created + rng.integers(0, 10 * DAY_MS, n_mem) * (
        rng.random(n_mem) < 0.3
    )
    mtype = rng.choice(MEM_TYPES, size=n_mem, p=[0.7, 0.15, 0.15]).astype(object)
    mtype[rng.random(n_mem) < 0.05] = None  # NULL ≡ semantic (F2/F6)
    session = np.where(
        rng.random(n_mem) < 0.6,
        np.char.add("sess-", rng.integers(0, max(2, n_mem // 40), n_mem).astype(str)),
        None,
    )
    run = np.where(
        rng.random(n_mem) < 0.5,
        np.char.add("run-", rng.integers(0, max(2, n_mem // 100), n_mem).astype(str)),
        None,
    )
    agent = np.where(rng.random(n_mem) < 0.3, "agent-a", None)
    graph = np.where(rng.random(n_mem) < 0.3, rng.choice(GRAPHS, size=n_mem), None)
    actor = np.where(rng.random(n_mem) < 0.4, rng.choice(["u1", "u2"], n_mem), None)
    role = np.where(actor == None, None, "user")  # noqa: E711
    importance = np.where(
        rng.random(n_mem) < 0.9, np.round(rng.random(n_mem), 4), None
    )
    access = np.where(rng.random(n_mem) < 0.8, rng.integers(0, 201, n_mem), None)
    last_acc = np.where(
        access == None, None, created + rng.integers(0, 50 * DAY_MS, n_mem)  # noqa: E711
    )
    expired = np.where(
        rng.random(n_mem) < 0.20, created + rng.integers(1, 100 * DAY_MS, n_mem), None
    )
    has_valid = rng.random(n_mem) < 0.30
    valid = np.where(
        has_valid, created + rng.integers(-60 * DAY_MS, 60 * DAY_MS, n_mem), None
    )
    invalid = np.where(
        has_valid & (rng.random(n_mem) < 0.5),
        np.where(valid == None, 0, valid).astype(np.int64)  # noqa: E711
        + rng.integers(1, 90 * DAY_MS, n_mem),
        None,
    )
    source = np.where(rng.random(n_mem) < 0.05, "summarize", None)
    meta = np.where(
        rng.random(n_mem) < 0.5,
        np.array(
            [
                json.dumps({"k": int(k), "tag": NOUNS[int(k) % len(NOUNS)]})
                for k in rng.integers(0, 100, n_mem)
            ],
            dtype=object,
        ),
        None,
    )
    texts = [
        f"{user[i]} {VERBS[i % len(VERBS)]} {NOUNS[i % len(NOUNS)]} "
        f"{NOUNS[(i * 3 + 1) % len(NOUNS)]} fact {i}"
        for i in range(n_mem)
    ]
    vectors = [emb.embed_one(t) for t in texts]
    pagerank = np.where(rng.random(n_mem) < 0.7, rng.random(n_mem) * 0.05, None)
    betweenness = np.where(rng.random(n_mem) < 0.7, rng.random(n_mem) * 0.02, None)
    community = np.where(
        rng.random(n_mem) < 0.6, rng.integers(0, max(2, n_ent // 25), n_mem), None
    )

    def _i64(a):
        return pa.array(
            [None if v is None else int(v) for v in a.tolist()], pa.int64()
        )

    memories = pa.table(
        {
            "id": pa.array(mem_id, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "user_id": pa.array(user.tolist(), pa.string()),
            "memory_type": pa.array(mtype.tolist(), pa.string()),
            "created_at": pa.array(created, pa.int64()),
            "updated_at": _i64(updated),
            "learned_at": _i64(learned),
            "session_id": pa.array(session.tolist(), pa.string()),
            "agent_id": pa.array(agent.tolist(), pa.string()),
            "run_id": pa.array(run.tolist(), pa.string()),
            "graph_name": pa.array(graph.tolist(), pa.string()),
            "actor_id": pa.array(actor.tolist(), pa.string()),
            "role": pa.array(role.tolist(), pa.string()),
            "metadata": pa.array(meta.tolist(), pa.string()),
            "importance": pa.array(
                [None if v is None else float(v) for v in importance.tolist()],
                pa.float64(),
            ),
            "access_count": _i64(access),
            "last_accessed": _i64(last_acc),
            "expired_at": _i64(expired),
            "valid_at": _i64(valid),
            "invalid_at": _i64(invalid),
            "source": pa.array(source.tolist(), pa.string()),
            "embedding": pa.array(vectors, pa.list_(pa.float32())),
            "_pagerank": pa.array(
                [None if v is None else float(v) for v in pagerank.tolist()],
                pa.float64(),
            ),
            "_betweenness": pa.array(
                [None if v is None else float(v) for v in betweenness.tolist()],
                pa.float64(),
            ),
            "_community": pa.array(
                [None if v is None else int(v) for v in community.tolist()],
                pa.int32(),
            ),
        }
    )

    # ---------------- edges ----------------
    src: list[int] = []
    dst: list[int] = []
    etype: list[str] = []
    rel: list[str | None] = []
    seq: list[int | None] = []

    def add(s: int, d: int, t: str, r: str | None = None, q: int | None = None):
        src.append(int(s))
        dst.append(int(d))
        etype.append(t)
        rel.append(r)
        seq.append(q)

    # HAS_ENTITY: zipf-skewed entity popularity → shared entities
    zipf_w = 1.0 / np.arange(1, n_ent + 1)
    zipf_w /= zipf_w.sum()
    has_entity_of: dict[int, list[int]] = {}
    n_edges_per_mem = rng.integers(0, 6, n_mem)
    for i in range(n_mem):
        k = int(n_edges_per_mem[i])
        if k == 0:
            continue
        ents = rng.choice(n_ent, size=k, replace=False, p=zipf_w)
        has_entity_of[int(mem_id[i])] = [ENT_BASE + int(e) for e in ents]
        for e in ents:
            add(mem_id[i], ENT_BASE + int(e), "HAS_ENTITY")

    # RELATION: entity→entity; guarantee 2-hop-distinct paths
    n_rel = n_ent * 2
    ra = rng.choice(n_ent, size=n_rel, p=zipf_w)
    rb = rng.choice(n_ent, size=n_rel, p=zipf_w)
    rel_seen = set()
    for a, b in zip(ra, rb):
        if a == b or (a, b) in rel_seen:
            continue
        rel_seen.add((int(a), int(b)))
        add(
            ENT_BASE + int(a),
            ENT_BASE + int(b),
            "RELATION",
            RELATION_TYPES[(int(a) + int(b)) % len(RELATION_TYPES)],
        )

    # SUPERSEDES: expired olds superseded by a later memory of same user;
    # new node inherits old's HAS_ENTITY edges (J9 inheritance)
    expired_idx = [i for i in range(n_mem) if expired[i] is not None]
    for i in expired_idx[:: max(1, len(expired_idx) // max(1, n_mem // 50))]:
        old = int(mem_id[i])
        new = old + 1 if old + 1 <= n_mem else old - 1
        if new == old or new < 1:
            continue
        add(new, old, "SUPERSEDES")
        for e in has_entity_of.get(old, []):
            if e not in has_entity_of.get(new, []):
                add(new, e, "HAS_ENTITY")
                has_entity_of.setdefault(new, []).append(e)

    # LEADS_TO session chains (per user+run, chronological, sequence nums)
    from collections import defaultdict

    chains = defaultdict(list)
    for i in range(n_mem):
        if run[i] is not None:
            chains[(user[i], run[i])].append(int(mem_id[i]))
    for key, ids in chains.items():
        ids.sort()  # ids are chronological by construction
        for j in range(len(ids) - 1):
            add(ids[j], ids[j + 1], "LEADS_TO", None, j + 1)

    # ---------------- episodes + provenance ----------------
    epi_id = EPI_BASE + np.arange(n_epi)
    epi_user = rng.choice(USERS, size=n_epi, p=USER_W)
    epi_sess = np.char.add(
        "esess-", rng.integers(0, max(2, n_epi // 6), n_epi).astype(str)
    )
    epi_run = np.where(
        rng.random(n_epi) < 0.5,
        np.char.add("run-", rng.integers(0, max(2, n_mem // 100), n_epi).astype(str)),
        None,
    )
    epi_created = BASE_MS + rng.integers(0, 300 * DAY_MS, n_epi)
    epi_created.sort()
    episodes = pa.table(
        {
            "id": pa.array(epi_id, pa.int64()),
            "content": pa.array(
                [f"message {i} from {epi_user[i]}" for i in range(n_epi)],
                pa.string(),
            ),
            "source": pa.array(["message"] * n_epi, pa.string()),
            "user_id": pa.array(epi_user.tolist(), pa.string()),
            "session_id": pa.array(epi_sess.tolist(), pa.string()),
            "run_id": pa.array(epi_run.tolist(), pa.string()),
            "created_at": pa.array(epi_created, pa.int64()),
        }
    )
    # NEXT_EPISODE chains per session (guaranteed length ≥3 for big sessions)
    epi_chains = defaultdict(list)
    for i in range(n_epi):
        epi_chains[epi_sess[i]].append(int(epi_id[i]))
    for s, ids in epi_chains.items():
        ids.sort()
        for j in range(len(ids) - 1):
            add(ids[j], ids[j + 1], "NEXT_EPISODE")
    # PRODUCED episode→memory, MENTIONS episode→entity
    prod_mem = rng.choice(n_mem, size=min(n_mem, n_epi * 3), replace=False)
    for j, m in enumerate(prod_mem):
        e = int(epi_id[j % n_epi])
        add(e, int(mem_id[m]), "PRODUCED")
    for i in range(n_epi):
        for e in rng.choice(n_ent, size=2, replace=False, p=zipf_w):
            add(int(epi_id[i]), ENT_BASE + int(e), "MENTIONS")

    # ---------------- communities ----------------
    n_com = max(2, n_ent // 25)
    com_of_ent = rng.integers(0, n_com, n_ent)
    member_count = np.bincount(com_of_ent, minlength=n_com)
    communities = pa.table(
        {
            "id": pa.array(COM_BASE + np.arange(n_com), pa.int64()),
            "community_id": pa.array(np.arange(n_com), pa.int32()),
            "name": pa.array([f"community_{c}" for c in range(n_com)], pa.string()),
            "summary": pa.array(
                [f"cluster of {member_count[c]} entities" for c in range(n_com)],
                pa.string(),
            ),
            "member_count": pa.array(member_count, pa.int32()),
            "user_id": pa.array(
                rng.choice(USERS, size=n_com, p=USER_W).tolist(), pa.string()
            ),
            "created_at": pa.array([BASE_MS + 200 * DAY_MS] * n_com, pa.int64()),
            "updated_at": pa.array([BASE_MS + 250 * DAY_MS] * n_com, pa.int64()),
        }
    )
    for e in range(n_ent):
        add(COM_BASE + int(com_of_ent[e]), ENT_BASE + e, "HAS_MEMBER")

    edges = pa.table(
        {
            "edge_id": pa.array(np.arange(1, len(src) + 1), pa.int64()),
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "edge_type": pa.array(etype, pa.string()),
            "relation_type": pa.array(rel, pa.string()),
            "sequence": pa.array(seq, pa.int32()),
        }
    )

    # ---------------- history ----------------
    h_mem: list[int] = []
    h_event: list[str] = []
    h_old: list[str | None] = []
    h_new: list[str | None] = []
    h_ts: list[int] = []
    for i in range(n_mem):
        m = int(mem_id[i])
        t0 = int(created[i])
        h_mem.append(m)
        h_event.append("ADD")
        h_old.append(None)
        h_new.append(texts[i])
        h_ts.append(t0)
        if updated[i] and int(updated[i]) > t0:
            h_mem.append(m)
            h_event.append("UPDATE")
            h_old.append(texts[i])
            h_new.append(texts[i] + " (updated)")
            h_ts.append(int(updated[i]))
        if expired[i] is not None:
            h_mem.append(m)
            h_event.append("DELETE")
            h_old.append(texts[i])
            h_new.append(None)
            h_ts.append(int(expired[i]))
    history = pa.table(
        {
            "memory_id": pa.array(h_mem, pa.int64()),
            "event": pa.array(h_event, pa.string()),
            "old_text": pa.array(h_old, pa.string()),
            "new_text": pa.array(h_new, pa.string()),
            "timestamp": pa.array(h_ts, pa.int64()),
            "actor_id": pa.array([None] * len(h_mem), pa.string()),
            "role": pa.array([None] * len(h_mem), pa.string()),
        }
    )

    for name, tbl in [
        ("memories", memories),
        ("entities", entities),
        ("edges", edges),
        ("episodes", episodes),
        ("history", history),
        ("communities", communities),
    ]:
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))
    print(
        f"sf{sf}: memories={n_mem} entities={n_ent} edges={edges.num_rows} "
        f"episodes={n_epi} history={history.num_rows} communities={n_com}"
    )


if __name__ == "__main__":
    for sf in SFS:
        gen_sf(sf)
