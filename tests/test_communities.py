"""Community detection + materialization lifecycle — the reference's
`tests/test_communities.py` themes (18 tests): ≥2-member threshold,
membership-unchanged skip, summary regeneration on change, dissolution,
HAS_MEMBER wiring, and Louvain modularity invariants (SURVEY §2.10 G3,
§2.3 J15)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from grafeo_memory_spark.communities import (
    get_communities,
    materialize_communities,
)
from grafeo_memory_spark.graph.algorithms import (
    label_propagation,
    louvain,
    modularity,
)
from grafeo_memory_spark.manager import MemoryEngine
from grafeo_memory_spark.protocols import ScriptedExtractor
from grafeo_memory_spark.store import empty_store


def _edges(spark, pairs, edge_type="RELATION"):
    return spark.createDataFrame(
        [(i, a, b, edge_type, None, None) for i, (a, b) in enumerate(pairs)],
        "edge_id long, src long, dst long, edge_type string, "
        "relation_type string, sequence int",
    )


# two 3-cliques joined by one bridge edge — the canonical two-community
# graph; any modularity-greedy method must split it at the bridge
_TWO_CLIQUES = [
    (1, 2), (2, 3), (1, 3),
    (4, 5), (5, 6), (4, 6),
    (3, 4),
]


class TestLouvain:
    def test_two_cliques_split(self, spark):
        parts = {
            r["node_id"]: r["community"]
            for r in louvain(_edges(spark, _TWO_CLIQUES)).collect()
        }
        assert parts[1] == parts[2] == parts[3]
        assert parts[4] == parts[5] == parts[6]
        assert parts[1] != parts[4]

    def test_modularity_beats_singletons(self, spark):
        e = _edges(spark, _TWO_CLIQUES)
        labels = louvain(e)
        singletons = labels.select(
            "node_id", F.col("node_id").alias("community")
        )
        assert modularity(e, labels) > modularity(e, singletons)

    def test_modularity_non_decreasing_per_round(self, spark):
        # run round-by-round via max_iter and assert Q never drops —
        # the merge-matching design guarantees monotone modularity
        e = _edges(spark, _TWO_CLIQUES + [(6, 7), (7, 8), (8, 6), (2, 7)])
        qs = [
            modularity(e, louvain(e, max_iter=k)) for k in range(0, 4)
        ]
        assert all(b >= a - 1e-12 for a, b in zip(qs, qs[1:])), qs

    def test_deterministic(self, spark):
        e = _edges(spark, _TWO_CLIQUES)
        a = sorted(map(tuple, louvain(e).collect()))
        b = sorted(map(tuple, louvain(e).collect()))
        assert a == b

    def test_empty_graph(self, spark):
        e = _edges(spark, [])
        assert louvain(e).count() == 0

    def test_matches_lpa_on_clean_clusters(self, spark):
        # both algorithms should find the same 2-way split here
        e = _edges(spark, _TWO_CLIQUES)
        lv = {r["node_id"]: r["community"] for r in louvain(e).collect()}
        lp = {
            r["node_id"]: r["community"]
            for r in label_propagation(e).collect()
        }
        lv_groups = {frozenset(k for k, v in lv.items() if v == c)
                     for c in set(lv.values())}
        lp_groups = {frozenset(k for k, v in lp.items() if v == c)
                     for c in set(lp.values())}
        assert lv_groups == lp_groups


def _store_with_entities(spark, names_by_id, rel_pairs, user_id="u"):
    st = empty_store(spark)
    ent = spark.createDataFrame(
        [(i, n, "concept", user_id, None) for i, n in names_by_id.items()],
        "id long, name string, entity_type string, user_id string, "
        "graph_name string",
    )
    return st.with_(entities=ent, edges=_edges(spark, rel_pairs))


def _partition(spark, assign):
    return spark.createDataFrame(
        list(assign.items()), "node_id long, community long"
    )


class TestMaterialization:
    def test_creates_nodes_and_member_edges(self, spark):
        st = _store_with_entities(
            spark, {1: "a", 2: "b", 3: "c"}, [(1, 2)], user_id="u"
        )
        st, infos, nid, eid = materialize_communities(
            st, _partition(spark, {1: 10, 2: 10, 3: 20}),
            user_id="u", now_ms=5_000, next_node_id=100, next_edge_id=100,
        )
        # community 20 has a single member → below threshold
        assert [i["community_id"] for i in infos] == [10]
        assert infos[0]["member_count"] == 2
        rows = st.communities.collect()
        assert len(rows) == 1 and rows[0]["id"] == 100
        hm = st.edges.where(F.col("edge_type") == "HAS_MEMBER").collect()
        assert sorted(e["dst"] for e in hm) == [1, 2]
        assert nid == 101 and eid == 102

    def test_membership_unchanged_skips_summary(self, spark):
        st = _store_with_entities(spark, {1: "a", 2: "b"}, [(1, 2)])
        calls = []

        def summ(members, relations):
            calls.append(members)
            return "name", "summary-v" + str(len(calls))

        part = _partition(spark, {1: 10, 2: 10})
        st, _, nid, eid = materialize_communities(
            st, part, user_id="u", now_ms=1_000, next_node_id=100,
            next_edge_id=100, summarizer=summ,
        )
        assert len(calls) == 1
        st, infos, _, _ = materialize_communities(
            st, part, user_id="u", now_ms=2_000, next_node_id=nid,
            next_edge_id=eid, summarizer=summ,
        )
        # O7 skip: same membership → no new policy call, summary kept
        assert len(calls) == 1
        assert infos[0]["summary"] == "summary-v1"
        row = st.communities.collect()[0]
        assert row["updated_at"] == 1_000  # untouched

    def test_membership_change_regenerates(self, spark):
        st = _store_with_entities(spark, {1: "a", 2: "b", 3: "c"}, [(1, 2)])
        calls = []

        def summ(members, relations):
            calls.append(tuple(sorted(members)))
            return "n", f"v{len(calls)}"

        st, _, nid, eid = materialize_communities(
            st, _partition(spark, {1: 10, 2: 10}), user_id="u",
            now_ms=1_000, next_node_id=100, next_edge_id=100,
            summarizer=summ,
        )
        st, infos, _, _ = materialize_communities(
            st, _partition(spark, {1: 10, 2: 10, 3: 10}), user_id="u",
            now_ms=2_000, next_node_id=nid, next_edge_id=eid,
            summarizer=summ,
        )
        assert calls == [("a", "b"), ("a", "b", "c")]
        row = st.communities.collect()[0]
        # node id reused, timestamps split created/updated
        assert row["id"] == 100
        assert row["created_at"] == 1_000 and row["updated_at"] == 2_000
        assert row["member_count"] == 3
        hm = st.edges.where(F.col("edge_type") == "HAS_MEMBER")
        assert hm.count() == 3  # old member edges replaced, not appended

    def test_unchanged_rerun_collects_zero_member_rows(self, spark, monkeypatch):
        # incremental path (VERDICT r3 item 4): the per-member collect is
        # bounded by the membership DELTA — an unchanged-graph rerun must
        # not pull a single member row to the driver, and the returned
        # infos still carry the member names (from the stored row)
        import grafeo_memory_spark.communities as C

        st = _store_with_entities(spark, {1: "a", 2: "b", 3: "c"}, [(1, 2)])
        part = _partition(spark, {1: 10, 2: 10, 3: 10})
        st, _, nid, eid = materialize_communities(
            st, part, user_id="u", now_ms=1_000, next_node_id=100,
            next_edge_id=100,
        )

        seen_cids = []
        real = C._collect_changed_members

        def spy(memb, changed_cids):
            seen_cids.append(list(changed_cids))
            return real(memb, changed_cids)

        monkeypatch.setattr(C, "_collect_changed_members", spy)
        st, infos, _, _ = materialize_communities(
            st, part, user_id="u", now_ms=2_000, next_node_id=nid,
            next_edge_id=eid,
        )
        assert seen_cids == [[]]  # no changed communities → no member pull
        assert infos[0]["member_entities"] == ["a", "b", "c"]
        # grow the community → only the changed cid's members collect
        seen_cids.clear()
        part2 = _partition(spark, {1: 10, 2: 10, 3: 10, 4: 10})
        ent4 = spark.createDataFrame(
            [(4, "d", "concept", "u", None)], st.entities.schema
        )
        st = st.with_(entities=st.entities.unionByName(ent4))
        st, infos, _, _ = materialize_communities(
            st, part2, user_id="u", now_ms=3_000, next_node_id=nid,
            next_edge_id=eid,
        )
        assert seen_cids == [[10]]
        assert infos[0]["member_entities"] == ["a", "b", "c", "d"]

    def test_dissolution_removes_node_and_edges(self, spark):
        st = _store_with_entities(spark, {1: "a", 2: "b", 3: "c", 4: "d"},
                                  [(1, 2), (3, 4)])
        st, _, nid, eid = materialize_communities(
            st, _partition(spark, {1: 10, 2: 10, 3: 20, 4: 20}),
            user_id="u", now_ms=1_000, next_node_id=100, next_edge_id=100,
        )
        assert st.communities.count() == 2
        # community 20 dissolves (members went singleton)
        st, infos, _, _ = materialize_communities(
            st, _partition(spark, {1: 10, 2: 10, 3: 20, 4: 30}),
            user_id="u", now_ms=2_000, next_node_id=nid, next_edge_id=eid,
        )
        assert [i["community_id"] for i in infos] == [10]
        assert st.communities.count() == 1
        hm = st.edges.where(F.col("edge_type") == "HAS_MEMBER")
        assert sorted(r["dst"] for r in hm.collect()) == [1, 2]

    def test_other_users_untouched(self, spark):
        st = _store_with_entities(spark, {1: "a", 2: "b"}, [(1, 2)],
                                  user_id="u")
        other_ent = spark.createDataFrame(
            [(9, "z1", "concept", "other", None),
             (10, "z2", "concept", "other", None)],
            st.entities.schema,
        )
        st = st.with_(entities=st.entities.unionByName(other_ent))
        st, _, nid, eid = materialize_communities(
            st, _partition(spark, {9: 7, 10: 7}), user_id="other",
            now_ms=1_000, next_node_id=100, next_edge_id=100,
        )
        st, _, _, _ = materialize_communities(
            st, _partition(spark, {1: 3, 2: 3}), user_id="u",
            now_ms=2_000, next_node_id=nid, next_edge_id=eid,
        )
        users = {r["user_id"] for r in st.communities.collect()}
        assert users == {"u", "other"}

    def test_get_communities_read_side(self, spark):
        st = _store_with_entities(spark, {1: "beta", 2: "alpha"}, [(1, 2)])
        st, _, _, _ = materialize_communities(
            st, _partition(spark, {1: 10, 2: 10}), user_id="u",
            now_ms=1_000, next_node_id=100, next_edge_id=100,
        )
        got = get_communities(st, "u").collect()
        assert len(got) == 1
        assert got[0]["member_entities"] == ["alpha", "beta"]  # sorted
        assert got[0]["member_count"] == 2
        assert get_communities(st, "nobody").count() == 0


class TestEngineFacade:
    def test_detect_and_get_via_engine(self, spark):
        ext = ScriptedExtractor(
            outputs=[
                {
                    "facts": ["a b c work together"],
                    "entities": [
                        {"name": n, "entity_type": "person"}
                        for n in ("pa", "pb", "pc")
                    ],
                    "relations": [
                        {"source": "pa", "target": "pb",
                         "relation_type": "knows"},
                        {"source": "pb", "target": "pc",
                         "relation_type": "knows"},
                        {"source": "pa", "target": "pc",
                         "relation_type": "knows"},
                    ],
                }
            ]
        )
        eng = MemoryEngine(spark, extractor=ext, now_fn=lambda: 1_000)
        eng.add("a b c work together", user_id="u")
        infos = eng.detect_communities(user_id="u")
        assert len(infos) == 1 and infos[0]["member_count"] == 3
        got = eng.get_communities(user_id="u").collect()
        assert got[0]["member_entities"] == ["pa", "pb", "pc"]
        # usage callback fires per generated summary
        seen = []
        eng.usage_callback = lambda op, u: seen.append(op)
        eng.detect_communities(user_id="u")  # unchanged → skip, no call
        assert "community_summary" not in seen


class TestCommunityContext:
    """get_community_context (reference `communities.py:241-280`;
    `tests/test_communities.py` TestCommunityContext)."""

    def _eng(self, spark):
        from grafeo_memory_spark.manager import MemoryEngine
        from grafeo_memory_spark.protocols import ScriptedExtractor

        t = [1_000_000]

        def now():
            t[0] += 1000
            return t[0]

        ext = ScriptedExtractor([
            {"facts": ["alice and bob work together"],
             "entities": [{"name": "alice", "entity_type": "person"},
                          {"name": "bob", "entity_type": "person"}],
             "relations": [{"source": "alice", "target": "bob",
                            "relation_type": "knows"}]},
            {"facts": ["carol and dan play chess"],
             "entities": [{"name": "carol", "entity_type": "person"},
                          {"name": "dan", "entity_type": "person"}],
             "relations": [{"source": "carol", "target": "dan",
                            "relation_type": "knows"}]},
        ])
        eng = MemoryEngine(spark, extractor=ext, now_fn=now)
        eng.add("alice and bob work together", user_id="u")
        eng.add("carol and dan play chess", user_id="u")
        eng.detect_communities(user_id="u")
        return eng

    def test_context_for_entity(self, spark):
        """An anchor entity pulls only its own community
        (ref test_community_context_for_entity)."""
        eng = self._eng(spark)
        got = eng.get_community_context(["Alice"], user_id="u").collect()
        assert len(got) == 1
        assert set(got[0]["member_entities"]) == {"alice", "bob"}

    def test_context_no_match(self, spark):
        """Unknown entities → empty (ref test_community_context_no_match)."""
        eng = self._eng(spark)
        assert eng.get_community_context(["zeus"], user_id="u").count() == 0

    def test_context_empty_entity_list(self, spark):
        """Empty input → empty without scanning
        (ref test_get_community_context_empty_entity_list)."""
        eng = self._eng(spark)
        assert eng.get_community_context([], user_id="u").count() == 0

    def test_context_filters_by_user(self, spark):
        """Another user sees nothing
        (ref test_get_community_context_filters_by_user)."""
        eng = self._eng(spark)
        assert eng.get_community_context(["alice"], user_id="v").count() == 0


def test_modularity_rejects_partial_label_coverage(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F
    from grafeo_memory_spark.graph.algorithms import modularity

    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    partial = spark.createDataFrame(
        [(1, 1), (2, 1)], "node_id long, community long"
    )  # node 3 unlabeled
    with _pytest.raises(ValueError, match="cover every edge endpoint"):
        modularity(e, partial)


class TestDistributedPreCoarsening:
    """VERDICT r5 stretch 8: `min_distributed_rounds` runs phase-1
    mutual-argmax coarsening on the cluster even under the collect
    threshold, so the driver only sees the second-level quotient.
    The default (0) stays bit-identical to the committed fixture; the
    forced round must preserve community quality and structure."""

    def test_two_cliques_same_partition_with_precoarsen(self, spark):
        e = _edges(spark, _TWO_CLIQUES)
        for rounds in (1, 2):
            parts = {
                r["node_id"]: r["community"]
                for r in louvain(
                    e, min_distributed_rounds=rounds
                ).collect()
            }
            assert parts[1] == parts[2] == parts[3]
            assert parts[4] == parts[5] == parts[6]
            assert parts[1] != parts[4]

    def test_precoarsen_modularity_within_epsilon(self, spark):
        from grafeo_memory_spark.sources.tables import load_fixture

        edges = load_fixture(spark, SF_DIR, "edges").where(
            F.col("edge_type") == "RELATION"
        )
        base = louvain(edges, max_iter=10)
        pre = louvain(edges, max_iter=10, min_distributed_rounds=1)
        q0 = modularity(edges, base)
        q1 = modularity(edges, pre)
        # every forced merge strictly increases Q before the driver
        # finish, so quality stays in the same band (labels may differ)
        assert q1 >= q0 - 0.01, (q0, q1)
        # still a valid total assignment of the same node set
        assert base.count() == pre.count()

    def test_precoarsen_random_graph_multi_round_carry(self, spark):
        """r11 quotient-carry pin: with 1-3 FORCED coarsening rounds the
        loop folds qedges/qdeg through successive merge maps (self rows
        accumulating intra weight) instead of re-joining the raw edge
        list — quality and assignment validity must hold on a
        nontrivial random graph, not just the fixture."""
        import random

        rng = random.Random(13)
        edges = set()
        for base in (0, 20, 40):  # three planted communities
            for _ in range(60):
                a, b = rng.randrange(20), rng.randrange(20)
                if a != b:
                    edges.add((base + a, base + b))
        for _ in range(15):  # sparse noise between them
            a, b = rng.randrange(60), rng.randrange(60)
            if a != b:
                edges.add((a, b))
        e = spark.createDataFrame(sorted(edges), "src long, dst long")
        base_labels = louvain(e, max_iter=10)
        q0 = modularity(e, base_labels)
        n = base_labels.count()
        for rounds in (1, 2, 3):
            lab = louvain(e, max_iter=10, min_distributed_rounds=rounds)
            assert lab.count() == n
            q = modularity(e, lab)
            assert q >= q0 - 0.02, (rounds, q0, q)

    def test_default_rounds_zero_matches_legacy(self, spark):
        e = _edges(spark, _TWO_CLIQUES)
        a = sorted(map(tuple, louvain(e).collect()))
        b = sorted(map(tuple, louvain(e, min_distributed_rounds=0).collect()))
        assert a == b

    def test_symmetrized_promise_parity_including_self_loops(self, spark):
        """r11 shared-undirected promise: feeding the precomputed
        _undirected set with symmetrized=True must reproduce the
        default path bit-for-bit for BOTH louvain and modularity —
        including a self-loop, which _undirected keeps (one row) and
        which the promise therefore must keep too."""
        from grafeo_memory_spark.graph.algorithms import _undirected

        e = _edges(spark, _TWO_CLIQUES + [(3, 3)])
        und = _undirected(e).localCheckpoint()
        base = sorted(map(tuple, louvain(e).collect()))
        shared = sorted(
            map(tuple, louvain(und, symmetrized=True).collect())
        )
        assert base == shared
        lab = louvain(e)
        q_default = modularity(e, lab)
        q_shared = modularity(und, lab, symmetrized=True)
        assert q_default == q_shared


class TestLouvainEdgeGate:
    """r12 (VERDICT r11 'What's wrong #1'): the phase-2 driver collect
    is gated on quotient EDGE rows too, via the shared two-tier
    `_driver_gate` — node count alone does not bound what ships to the
    driver (a ≤200k-community quotient over a heavy-tailed graph can
    carry O(n²) inter-community pair rows). While the quotient is too
    wide, phase 1 keeps coarsening; on merge stall the phase-1 labels
    are the documented degraded result."""

    @staticmethod
    def _dense_graph(spark, n_nodes=40, n_edges=300, seed=7):
        import random

        rng = random.Random(seed)
        edges = set()
        while len(edges) < n_edges:
            a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        return spark.createDataFrame(
            sorted(edges), "src long, dst long"
        ), n_nodes

    def test_wide_quotient_never_collects_unbounded(self, spark, monkeypatch):
        """The direct pin on the r11 hole: with a tiny driver_max_edges
        on a dense graph (quotient rows ≫ cap), EVERY DataFrame.collect
        that fires inside louvain() must return at most cap+1 rows —
        the `limit`-bounded gate collect is the only collect allowed,
        and it can never ship the wide quotient."""
        from pyspark.sql import DataFrame as _DF

        e, n_nodes = self._dense_graph(spark)
        cap = 50  # quotient carries 600 directed rows — 12× over
        sizes: list[int] = []
        real_collect = _DF.collect

        def spy(df):
            out = real_collect(df)
            sizes.append(len(out))
            return out

        monkeypatch.setattr(_DF, "collect", spy)
        try:
            lab = louvain(e, max_iter=10, driver_max_edges=cap)
            rows = real_collect(lab.select("node_id", "community"))
        finally:
            monkeypatch.undo()
        assert all(s <= cap + 1 for s in sizes), sizes
        # still a valid total assignment: every node exactly once
        assert sorted(r["node_id"] for r in rows) == list(range(n_nodes))

    def test_tiny_cap_coarsens_and_preserves_quality(self, spark):
        """Forcing the gate to reject (cap below the planted-community
        quotient width) must route through extra phase-1 coarsening,
        not break community quality: modularity stays in the band of
        the ungated default on the planted 3-community graph."""
        import random

        rng = random.Random(13)
        edges = set()
        for base in (0, 20, 40):
            for _ in range(60):
                a, b = rng.randrange(20), rng.randrange(20)
                if a != b:
                    edges.add((base + a, base + b))
        for _ in range(15):
            a, b = rng.randrange(60), rng.randrange(60)
            if a != b:
                edges.add((a, b))
        e = spark.createDataFrame(sorted(edges), "src long, dst long")
        base_lab = louvain(e, max_iter=10)
        q0 = modularity(e, base_lab)
        n = base_lab.count()
        lab = louvain(e, max_iter=10, driver_max_edges=40)
        assert lab.count() == n
        q = modularity(e, lab)
        assert q >= q0 - 0.05, (q0, q)

    def test_cap_zero_disables_collect_returns_degraded(self, spark):
        """driver_max_edges=0 is the force-distributed knob: the gate
        never passes, the loop coarsens to a merge stall, and the
        phase-1 labels come back — a valid, deterministic assignment
        that still splits the two cliques (each clique merges into one
        community before any stall)."""
        e = _edges(spark, _TWO_CLIQUES)
        a = sorted(map(tuple, louvain(e, driver_max_edges=0).collect()))
        b = sorted(map(tuple, louvain(e, driver_max_edges=0).collect()))
        assert a == b
        parts = dict(a)
        assert sorted(parts) == [1, 2, 3, 4, 5, 6]
        assert len(set(parts.values())) >= 2

    def test_default_cap_matches_legacy_assignment(self, spark):
        """With the default (2M-row) cap the gate passes on the first
        attempt and the result is bit-identical to the pre-gate path —
        the fixture freshness test pins this at sf0.01; this pins it on
        the unit graph including a self-loop."""
        e = _edges(spark, _TWO_CLIQUES + [(3, 3)])
        a = sorted(map(tuple, louvain(e).collect()))
        b = sorted(
            map(tuple, louvain(e, driver_max_edges=2_000_000).collect())
        )
        assert a == b
