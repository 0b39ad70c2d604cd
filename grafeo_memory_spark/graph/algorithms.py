"""Graph algorithms G1-G3 as iterative DataFrame joins (SURVEY.md §2.10;
reference delegates to its engine at `protocol.py:39-43`, consumed by
`manager.py:1585-1644` and `communities.py:32-200`).

Spark has no Python GraphX API, so these implement the
aggregateMessages pattern directly on DataFrames — the same formulation
GraphFrames uses. Each iteration is one join + one aggregation; a
`localCheckpoint()` every round truncates the lineage so plans don't
grow unboundedly (SURVEY §4 physical note). Eager vs lazy checkpoints
are chosen per loop by sf0.1 A/B measurement (r7): pagerank/LPA run
eager (their per-round stats collect then reads warm blocks — lazy
measured ~15% slower), the Brandes BFS runs lazy (its emptiness probe
materializes the level in the same scheduling round). All loops are
driver-controlled with convergence checks — iterative fixpoints are
inherently outside Catalyst.

Substitutions vs the reference engine (documented, SURVEY §7 risk 3):
- Louvain → synchronous label propagation (LPA). Both produce integer
  community ids from edge density; LPA is the standard distributed
  stand-in. Tests assert structural invariants (partition count,
  intra>inter density), not exact ids.
- Betweenness → Brandes restricted to a deterministic source sample
  (all sources on small graphs), normalized like
  `betweenness_centrality(normalized=True)`.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "pagerank",
    "label_propagation",
    "louvain",
    "modularity",
    "betweenness_centrality",
    "triangle_count",
    "adamic_adar",
    "k_core",
    "symmetrize",
]



def _undirected(edges: DataFrame) -> DataFrame:
    fwd = edges.select("src", "dst")
    return fwd.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def symmetrize(edges: DataFrame) -> DataFrame:
    """Public prep for the ``symmetrized=True`` fast path of
    :func:`triangle_count` / :func:`adamic_adar` / :func:`k_core`:
    the loop-free undirected simple edge set, each edge present in both
    directions exactly once. Compute once, ``localCheckpoint`` (lazy),
    and hand to every metric that runs over the same graph."""
    return _undirected(edges).where(F.col("src") != F.col("dst"))


def _und_simple(edges: DataFrame, symmetrized: bool) -> DataFrame:
    """Loop-free undirected edge set. ``symmetrized=True`` promises the
    input already holds both (u,v) and (v,u) exactly once — the caller
    pays the symmetrize+distinct shuffle ONCE and shares the result
    across several metrics (triangle/AA/k-core run over the same graph
    in one analytics pass; at scale the symmetrize is a full shuffle of
    the largest table, so three private copies is the difference
    between one edge shuffle and three)."""
    if symmetrized:
        return edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    return symmetrize(edges)


def _driver_gate(
    edges: DataFrame,
    threshold: int,
    cols: tuple = ("src", "dst"),
    as_numpy: bool = True,
):
    """Bounded probe + collect for every gated driver fast path — the
    ONE place the two-tier shape lives (r12: generalized so louvain's
    quotient collect and ``communities.connected_components`` share it
    instead of carrying inline twins).

    Returns the collected ``cols`` projection when the frame fits under
    ``threshold`` rows, else ``None`` — as an int64 ``(n, len(cols))``
    array when ``as_numpy`` (the graph-algorithm CSR builders), else as
    a list of Rows (union-find / quotient solvers that keep the
    original value types). Two safety/cost properties, both
    load-bearing:

    - The rejection path ships ONE count, not rows: at 100-TB scale the
      gate always fails, and a collect-first probe would ship
      ``threshold + 1`` rows (~16 MB at the 1M default) to the driver
      on every call just to decide. The ``limit(threshold+1).count()``
      probe is the cheap first tier.
    - The collect itself is ``limit(threshold + 1)``-bounded AND
      re-checked (ADVICE r9): the plan executes twice, so a
      nondeterministic or growing source can pass the count and then
      return more rows — the limit caps what the driver can ever
      receive at ``threshold + 1``, and the length re-check falls back
      to the distributed path instead of silently driver-solving a
      graph bigger than the gate promised.

    The ``cols`` projection happens BEFORE the probe and the collect
    (ADVICE r10): only the key columns ever leave the cluster, and the
    select lets the scan prune on both tiers."""
    if not threshold:
        return None
    sel = edges.select(*cols)
    if sel.limit(threshold + 1).count() > threshold:
        return None
    bounded = sel.limit(threshold + 1)
    if as_numpy:
        import numpy as np

        pdf = bounded.toPandas()
        if len(pdf) > threshold:
            return None
        return pdf.to_numpy(dtype=np.int64).reshape(-1, len(cols))
    rows = bounded.collect()
    if len(rows) > threshold:
        return None
    return rows


def _pagerank_driver(
    spark, edge_np, damping: float, max_iter: int, tol: float
) -> DataFrame:
    """Driver fast path of :func:`pagerank` — the identical per-
    iteration arithmetic (uniform dangling redistribution, L1
    convergence delta computed AFTER the rank update) vectorized over a
    compact-id edge array. Agrees with the distributed loop to
    float-sum reordering, which the shuffle sum never guaranteed
    either."""
    import numpy as np
    import pandas as pd

    node_ids = np.unique(edge_np)
    n = len(node_ids)
    if n == 0:
        return spark.createDataFrame([], "node_id long, pagerank double")
    src = np.searchsorted(node_ids, edge_np[:, 0])
    dst = np.searchsorted(node_ids, edge_np[:, 1])
    out_deg = np.bincount(src, minlength=n).astype(np.float64)
    is_dangling = out_deg == 0
    w = 1.0 / out_deg[src]  # per-edge contribution weight

    ranks = np.full(n, 1.0 / n, dtype=np.float64)
    dangling = float(is_dangling.sum()) / n
    base = (1.0 - damping) / n
    for _ in range(max_iter):
        inflow = np.bincount(dst, weights=ranks[src] * w, minlength=n)
        new_ranks = base + damping * (inflow + dangling / n)
        delta = float(np.abs(new_ranks - ranks).sum())
        dangling = float(new_ranks[is_dangling].sum())
        ranks = new_ranks
        if delta < tol:
            break
    return spark.createDataFrame(
        pd.DataFrame({"node_id": node_ids, "pagerank": ranks}),
        "node_id long, pagerank double",
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 100,
    tol: float = 1e-6,
    driver_edge_threshold: int = 1_000_000,
) -> DataFrame:
    """G1 — PageRank on the directed edge list (src, dst); returns
    (node_id, pagerank) summing to 1, matching the reference's
    `pagerank(damping=0.85, max_iter=100, tol=1e-6)` semantics
    (`protocol.py:39-41`).

    Per iteration: one shuffle for the message aggregation (groupBy
    dst). In convergence mode (``tol > 0``) each round additionally
    runs exactly two driver jobs — an eager ``localCheckpoint`` of the
    new ranks (truncates lineage, so per-iteration cost stays constant)
    and ONE combined aggregation returning both the L1 convergence
    delta (read by the early exit) and the next round's dangling mass
    (piggybacked for free). In fixed-iteration mode (``tol <= 0``, the
    scale-bench shape) the loop schedules ZERO per-round driver jobs:
    checkpoints are lazy and the dangling mass rides forward as a
    broadcast 1-row aggregate instead of a collected scalar — same
    arithmetic, no per-round cluster-wide barrier (r13). Dangling-node
    mass is redistributed uniformly, the standard treatment.

    Edge lists at or under ``driver_edge_threshold`` rows take the
    gated driver fast path (`_pagerank_driver` — same pattern as
    :func:`k_core` / :func:`betweenness_centrality`): a 100-iteration
    fixpoint at one shuffle per iteration is pure scheduling overhead
    on a sub-million-edge graph. ``driver_edge_threshold=0`` forces
    the distributed loop; a randomized parity test
    (`test_pagerank_driver_matches_distributed`) pins the two paths to
    each other. The gate is :func:`_driver_gate` — a bounded count
    probe (the at-scale rejection ships one long, not rows) followed by
    a ``limit``-bounded, length-re-checked collect, never a full
    materialization of a 100-TB edge list just to decide the path
    (r10; ADVICE r9).
    """
    edge_np = _driver_gate(edges, driver_edge_threshold)
    if edge_np is not None:
        return _pagerank_driver(
            edges.sparkSession, edge_np, damping, max_iter, tol
        )

    verts = (
        edges.select(F.col("src").alias("node_id"))
        .unionByName(edges.select(F.col("dst").alias("node_id")))
        .distinct()
        .localCheckpoint()
    )
    n = verts.count()
    if n == 0:
        return verts.withColumn("pagerank", F.lit(0.0))

    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    links = edges.select("src", "dst").join(out_deg, "src").localCheckpoint()
    # dangling flag rides along the rank rows so the per-iteration stats
    # job needs no extra join against the degree table
    verts = (
        verts.join(
            out_deg.select(F.col("src").alias("node_id")).withColumn(
                "_out", F.lit(1)
            ),
            "node_id",
            "left",
        )
        .select("node_id", F.col("_out").isNull().alias("is_dangling"))
        .localCheckpoint()
    )

    ranks = verts.withColumn("pagerank", F.lit(1.0 / n))
    n_dangling = (
        verts.agg(F.sum(F.when(F.col("is_dangling"), 1).otherwise(0)))
        .collect()[0][0]
        or 0
    )
    dangling = n_dangling / float(n)  # uniform init: each rank is 1/n
    base = (1.0 - damping) / n

    # Convergence mode (tol > 0) keeps a per-round driver collect: the
    # early exit reads the L1 delta on the driver, and the dangling
    # mass rides the same stats row for free. Fixed-iteration mode
    # (tol <= 0) needs NO per-round driver job at all (r13): there is
    # no exit to decide, so the eager checkpoint + stats collect the
    # loop used to run every round were pure driver-synchronization
    # barriers. Instead, the dangling mass of round i — a sum over the
    # rank rows round i just produced — rides into round i+1 as a
    # broadcast 1-row aggregate (crossJoin), and the checkpoints go
    # lazy, so the whole loop materializes round by round inside the
    # single final action. The arithmetic is IDENTICAL — the same Spark
    # sum over the same checkpointed rows, consumed as a column instead
    # of a collected literal (measured exact-equal at sf0.1: max
    # |delta| = 0.0 over 4705 nodes; scripts/pr_fuse_ab.py also holds
    # the interleaved timing evidence — fused won all 6 pairs). On a
    # dangling-free graph (symmetrized inputs — the common case for
    # undirected analytics) the mass stays 0.0 and no crossJoin is
    # planted (r9). At cluster scale each removed collect was a
    # whole-cluster barrier per iteration (guide §5).
    needs_stats = tol > 0.0

    has_dangling_col = False
    for it in range(max_iter):
        dangling_expr = (
            F.col("_dangling") / F.lit(float(n))
            if has_dangling_col
            else F.lit(dangling / n)
        )
        keep = ["node_id", "is_dangling"] + (
            ["_dangling"] if has_dangling_col else []
        )
        contrib = (
            links.join(
                ranks.select(F.col("node_id").alias("src"), "pagerank"), "src"
            )
            .select(
                F.col("dst").alias("node_id"),
                (F.col("pagerank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("node_id")
            .agg(F.sum("c").alias("inflow"))
        )
        # convergence mode carries the old rank through the update so
        # the stats job below is a plain aggregation — no old-vs-new
        # self-join per iteration; fixed-iteration mode has no stats
        # job, so the column is dropped to keep the checkpoint narrow
        out_cols = ["node_id", "is_dangling"] + (
            ["_pr_old"] if needs_stats else []
        )
        new_ranks = (
            ranks.select(
                *keep, F.col("pagerank").alias("_pr_old")
            )
            .join(contrib, "node_id", "left")
            .select(
                *out_cols[:2],
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inflow"), F.lit(0.0)) + dangling_expr)
                ).alias("pagerank"),
                *out_cols[2:],
            )
            # convergence mode stays eager: measured FASTER than lazy
            # when a stats collect follows (sf0.1 A/B, r7: 4.3s vs 5.2s
            # median) — the collect reads warm blocks. Fixed-iteration
            # mode goes lazy: nothing reads the blocks until the final
            # action, which materializes each round's checkpoint once.
            .localCheckpoint(eager=needs_stats)
        )
        ranks = new_ranks.select("node_id", "is_dangling", "pagerank")
        if needs_stats:
            delta, dangling = (
                new_ranks.agg(
                    F.sum(F.abs(F.col("pagerank") - F.col("_pr_old"))),
                    F.coalesce(
                        F.sum(F.when(F.col("is_dangling"), F.col("pagerank"))),
                        F.lit(0.0),
                    ),
                )
                .collect()[0]
            )
            if delta < tol:
                break
        elif n_dangling > 0 and it + 1 < max_iter:
            dang_df = ranks.agg(
                F.coalesce(
                    F.sum(F.when(F.col("is_dangling"), F.col("pagerank"))),
                    F.lit(0.0),
                ).alias("_dangling")
            )
            ranks = ranks.crossJoin(F.broadcast(dang_df))
            has_dangling_col = True
    return ranks.select("node_id", "pagerank")


def _lpa_driver(spark, und_np, max_iter: int) -> DataFrame:
    """Driver fast path of :func:`label_propagation` — the identical
    synchronous most-frequent-neighbor-label update (ties to the
    smallest label id) vectorized over a compact-id edge array. Both
    paths are deterministic integer arithmetic, so they agree EXACTLY,
    not just to tolerance; the randomized parity test pins them."""
    import numpy as np
    import pandas as pd

    node_ids = np.unique(und_np)
    n = len(node_ids)
    if n == 0:
        return spark.createDataFrame([], "node_id long, community long")
    src = np.searchsorted(node_ids, und_np[:, 0]).astype(np.int64)
    dst = np.searchsorted(node_ids, und_np[:, 1]).astype(np.int64)
    # node_ids is sorted, so compact-index order == original-id order
    # and the ties-to-smallest-label rule is preserved in compact space
    labels = np.arange(n, dtype=np.int64)
    for _ in range(max_iter):
        # votes per (node, neighbor-label), folded into one int64 key
        key = src * n + labels[dst]
        uk, counts = np.unique(key, return_counts=True)
        ks, kl = uk // n, uk % n
        # deterministic argmax: sort by (node, -votes, label), keep the
        # first row per node — same (-votes, community) struct-min the
        # distributed hash aggregate computes
        order = np.lexsort((kl, -counts, ks))
        ks_o, kl_o = ks[order], kl[order]
        first = np.ones(len(ks_o), dtype=bool)
        first[1:] = ks_o[1:] != ks_o[:-1]
        new_labels = labels.copy()
        new_labels[ks_o[first]] = kl_o[first]
        if np.array_equal(new_labels, labels):
            break
        labels = new_labels
    return spark.createDataFrame(
        pd.DataFrame(
            {"node_id": node_ids, "community": node_ids[labels]}
        ),
        "node_id long, community long",
    )


def label_propagation(
    edges: DataFrame,
    max_iter: int = 20,
    driver_edge_threshold: int = 1_000_000,
) -> DataFrame:
    """G3 — synchronous LPA over the undirected edge set; returns
    (node_id, community). Deterministic: each node adopts the most
    frequent neighbor label, ties broken by the smallest label id, and
    iteration stops when no label changes.

    Per iteration: neighbor-label join + two aggregations (count per
    label, argmax per node). Stand-in for the reference's Louvain
    (`communities.py:32-200`) — see module docstring.

    Edge lists at or under ``driver_edge_threshold`` raw rows take the
    gated numpy fast path (`_lpa_driver`, r9 — same pattern and same
    single-job bounded :func:`_driver_gate` probe as
    :func:`pagerank` / :func:`betweenness_centrality`); a randomized
    parity test (`test_lpa_driver_matches_distributed`) pins the two
    paths to exact equality. ``driver_edge_threshold=0`` forces the
    distributed loop — the 100-TB shape.
    """
    raw = _driver_gate(edges, driver_edge_threshold)
    if raw is not None:
        import numpy as np

        und_np = (
            np.unique(np.vstack([raw, raw[:, ::-1]]), axis=0)
            if len(raw)
            else raw.reshape(0, 2)
        )
        return _lpa_driver(edges.sparkSession, und_np, max_iter)

    und = _undirected(edges).localCheckpoint()
    labels = (
        und.select(F.col("src").alias("node_id"))
        .distinct()
        .withColumn("community", F.col("node_id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # TWO exchanges per round, both partial-aggregating (r10 —
        # formerly three: votes groupBy + argmax groupBy + an old-vs-new
        # labels equi-join). The old label rides the vote aggregation
        # as a null-weight sentinel row per node: count(_w) skips the
        # sentinel, so vote totals are untouched, while max(_old) tags
        # the node's current community through both aggregations — the
        # changed-count job becomes a plain filter on the checkpointed
        # result and the labels join disappears. The sentinel also
        # subsumes the isolated-node fallback: labels is seeded from
        # und's own src set, so every node has >=1 neighbor vote, and a
        # zero-vote sentinel group (-0 > -votes) can only win argmax if
        # no real vote exists — which cannot happen here, and would
        # keep the old label if it did.
        votes = (
            und.join(labels.withColumnRenamed("node_id", "dst"), "dst")
            .select(
                F.col("src").alias("node_id"),
                "community",
                F.lit(1).alias("_w"),
                F.lit(None).cast("int").alias("_old"),
            )
            .unionByName(
                labels.select(
                    "node_id",
                    "community",
                    F.lit(None).cast("int").alias("_w"),
                    F.lit(1).alias("_old"),
                )
            )
            .groupBy("node_id", "community")
            .agg(F.count("_w").alias("votes"), F.max("_old").alias("_old"))
        )
        # deterministic argmax as a hash aggregate (r7 — replaces a
        # row_number window, trading the per-node sort for a partial-
        # aggregating min over the (-votes, community) struct; same
        # most-frequent-label, ties-to-smallest semantics the oracle
        # pins). Checkpoint every round: new_labels feeds both the
        # changed-count job and the next iteration, and truncated
        # lineage keeps per-iteration cost constant. Eager by default:
        # the r7 A/B chose it, and the r13 re-measurement under the
        # post-r10 sentinel loop read a TIE (three interleaved sweeps,
        # scripts/lpa_ckpt_ab.py: lazy 5/6 then 4/6 paired wins with a
        # worse median, 8-core split 2/2 — the eager second job is a
        # cached read, so folding it into the changed-count action
        # moves nothing measurable). SPARK_GRAFT_LPA_LAZY_CKPT=1 keeps
        # the one-action-per-round CC-loop shape reachable for
        # re-measurement.
        _lazy = os.environ.get("SPARK_GRAFT_LPA_LAZY_CKPT") == "1"
        new_labels = (
            votes.groupBy("node_id")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("votes")).alias("_nv"),
                        F.col("community").alias("community"),
                    )
                ).alias("_best"),
                F.max(
                    F.when(F.col("_old") == 1, F.col("community"))
                ).alias("_c_old"),
            )
            .select(
                "node_id",
                F.col("_best.community").alias("community"),
                "_c_old",
            )
            .localCheckpoint(eager=not _lazy)
        )
        changed = (
            new_labels.where(F.col("community") != F.col("_c_old")).count()
        )
        labels = new_labels.select("node_id", "community")
        if changed == 0:
            break
    return labels


def modularity(
    edges: DataFrame, labels: DataFrame, symmetrized: bool = False
) -> float:
    """Newman modularity Q = Σ_c [e_c/m − (deg_c/2m)²] of a partition
    over the undirected simple graph; used by the Louvain invariant
    tests (non-decreasing per merge round) and the driver query's
    structural oracle.

    ``symmetrized=True`` promises the input is already the
    :func:`_undirected` edge set — both directions present exactly
    once (self-loops, if any, one row each) — so callers that feed
    both :func:`louvain` and this function pay the full-edge
    symmetrize+distinct shuffle ONCE instead of once per call (at
    100 TB that shuffle is the dominant fixed cost of the community
    query). Unlike :func:`_und_simple`'s promise this one keeps
    self-loops, matching the default path bit-for-bit.

    ONE aggregation job: per-community degree and intra-row counts in
    the same groupBy — 2m, the intra-edge total, and the degree term
    all fall out of the |communities|-row collect (the earlier version
    ran three jobs: a count plus two separate aggregates). ``labels``
    must cover every edge endpoint — every producer here (louvain/LPA/
    connected components/singleton maps) guarantees it, and the same
    pass ENFORCES it: the joins are outer, so an uncovered endpoint
    groups under a NULL community and raises instead of silently
    computing Q against the wrong 2m."""
    und = edges.select("src", "dst") if symmetrized else _undirected(edges)
    lab = labels.select("node_id", "community")
    rows = (
        und.join(
            lab.withColumnRenamed("node_id", "src")
            .withColumnRenamed("community", "ca"),
            "src",
            "left",
        )
        .join(
            lab.withColumnRenamed("node_id", "dst")
            .withColumnRenamed("community", "cb"),
            "dst",
            "left",
        )
        .groupBy("ca")
        .agg(
            F.count("*").alias("deg_c"),
            F.sum(
                F.when(F.col("ca") == F.col("cb"), 1).otherwise(0)
            ).alias("intra2"),
            F.sum(
                F.when(F.col("cb").isNull(), 1).otherwise(0)
            ).alias("dst_uncovered"),
        )
        .collect()
    )
    if any(r["ca"] is None or (r["dst_uncovered"] or 0) > 0 for r in rows):
        raise ValueError(
            "modularity: labels must cover every edge endpoint "
            "(found edges with unlabeled src or dst)"
        )
    two_m = float(sum(r["deg_c"] for r in rows))
    if two_m == 0:
        return 0.0
    m = two_m / 2.0
    intra = sum(r["intra2"] or 0 for r in rows) / 2.0
    degc = sum((r["deg_c"] / (2.0 * m)) ** 2 for r in rows)
    return intra / m - degc


def _louvain_local(
    rows: list, two_m: float, budget: int
) -> dict[int, int]:
    """Sequential multi-level Louvain over a collected quotient graph.

    `rows` are directed (a, b, w) triples — both directions present,
    plus (c, c, w) self rows carrying intra-community weight from prior
    distributed coarsening. `budget` bounds move-phase sweeps; every
    executed move strictly increases Q, so modularity is monotone in the
    budget. Deterministic: nodes sweep in sorted order, a move happens
    only on strict gain, and equal-gain candidates never displace the
    first (smallest-id) best. Returns quotient-node → community, where
    the community label is the minimum member id.
    """
    adj: dict[int, dict[int, float]] = {}
    selfw: dict[int, float] = {}
    for a, b, w in rows:
        if a == b:
            selfw[a] = selfw.get(a, 0.0) + w
        else:
            adj.setdefault(a, {})[b] = adj.setdefault(a, {}).get(b, 0.0) + w
    nodes = sorted(set(adj) | set(selfw))
    for v in nodes:
        adj.setdefault(v, {})
    m = two_m / 2.0
    # node2orig: current-level node -> original quotient ids it absorbed
    node2orig = {v: [v] for v in nodes}
    while budget > 0 and len(nodes) > 1:
        comm = {v: v for v in nodes}
        k = {v: sum(adj[v].values()) + selfw.get(v, 0.0) for v in nodes}
        tot = dict(k)
        moved_in_level = False
        while budget > 0:
            budget -= 1
            moved = False
            for v in nodes:
                cv = comm[v]
                nbw: dict[int, float] = {}
                for u, w in adj[v].items():
                    cu = comm[u]
                    nbw[cu] = nbw.get(cu, 0.0) + w
                tot[cv] -= k[v]
                best_c = cv
                best_gain = (
                    nbw.get(cv, 0.0) / m - tot[cv] * k[v] / (2.0 * m * m)
                )
                for c in sorted(nbw):
                    if c == cv:
                        continue
                    g = nbw[c] / m - tot.get(c, 0.0) * k[v] / (2.0 * m * m)
                    if g > best_gain + 1e-12:
                        best_c, best_gain = c, g
                tot[best_c] = tot.get(best_c, 0.0) + k[v]
                if best_c != cv:
                    comm[v] = best_c
                    moved = True
                    moved_in_level = True
            if not moved:
                break
        if not moved_in_level:
            break
        # contract: new level node id = min member id (level ids are
        # min-original ids inductively, so labels stay min-member ids)
        groups: dict[int, list[int]] = {}
        for v in nodes:
            groups.setdefault(comm[v], []).append(v)
        label = {c: min(g) for c, g in groups.items()}
        new_adj: dict[int, dict[int, float]] = {}
        new_selfw: dict[int, float] = {}
        new_node2orig: dict[int, list[int]] = {}
        for v in nodes:
            c = label[comm[v]]
            new_node2orig.setdefault(c, []).extend(node2orig[v])
            new_selfw[c] = new_selfw.get(c, 0.0) + selfw.get(v, 0.0)
            for u, w in adj[v].items():
                cu = label[comm[u]]
                if cu == c:
                    new_selfw[c] = new_selfw.get(c, 0.0) + w
                else:
                    new_adj.setdefault(c, {})[cu] = (
                        new_adj.setdefault(c, {}).get(cu, 0.0) + w
                    )
        adj, selfw, node2orig = new_adj, new_selfw, new_node2orig
        nodes = sorted(set(adj) | set(selfw))
        for v in nodes:
            adj.setdefault(v, {})
    return {orig: v for v in nodes for orig in node2orig[v]}


def louvain(
    edges: DataFrame,
    max_iter: int = 20,
    driver_max_nodes: int = 200_000,
    driver_max_edges: int = 2_000_000,
    min_distributed_rounds: int = 0,
    symmetrized: bool = False,
) -> DataFrame:
    """G3 — modularity-greedy community detection (reference Louvain,
    `protocol.py:43`, consumed by `communities.py:32-200`); returns
    (node_id, community).

    Hybrid two-phase shape — the standard distributed-Louvain design:

    Phase 1 (scale path, only while the quotient graph exceeds
    `driver_max_nodes`): synchronous heavy-edge matching. Each round
    builds the community quotient graph, scores every adjacent community
    pair by its merge gain ΔQ = e_ab/m − deg_a·deg_b/(2m²), and merges
    the pairs that pick each other as best partner (mutual-argmax,
    ties to the smaller id). Mutual matching makes merges disjoint, so
    the round's modularity change is the SUM of strictly positive pair
    gains — Q is monotone and the quotient shrinks geometrically
    (each merging community at least halves the pair's count), so
    O(log n) rounds reach the collect threshold.

    Phase 2 (gated): collect the quotient graph and run exact
    sequential multi-level Louvain on the driver (`_louvain_local`),
    then broadcast the ≤200k-row community map back. At 100 TB the
    edge list never leaves the cluster — only the geometrically-
    coarsened quotient does. The collect is gated on BOTH axes (r12):
    `driver_max_nodes` bounds the community count, and
    `driver_max_edges` bounds the quotient ROW count via the shared
    two-tier :func:`_driver_gate` (probe-then-bounded-collect) —
    a 200k-community quotient over a heavy-tailed graph can carry
    O(n²) inter-community pair rows, so node count alone does not
    bound what ships to the driver. While the quotient is too wide,
    phase 1 keeps coarsening (each merge round monotonically shrinks
    quotient rows); if merging stalls (or the budget runs out) before
    the quotient fits, the current phase-1 `labels` are returned as
    the documented degraded result — correct communities, just without
    the final driver refinement, and never an unbounded collect.
    ``driver_max_edges=0`` disables the collect entirely (the
    force-distributed knob: coarsen until stall, return `labels`).

    ``min_distributed_rounds`` forces that many phase-1 coarsening
    rounds even when the graph already fits the collect threshold, so
    the driver sees the SECOND-level quotient: the first level of
    Q-increasing merges happens on the cluster and the collected graph
    is the already-coarsened one — the knob for deployments where even
    the raw quotient is too wide to collect comfortably. Quality is
    preserved (every forced merge strictly increases Q; on the fixture
    graph one round lands within ±0.01 modularity of the default,
    pinned in tests/test_communities.py), but the exact label
    assignment can differ, so the default stays 0: bit-identical to
    the committed `louvain_labels` fixture and no extra scheduling
    rounds at bench scale.

    Modularity is monotone non-decreasing in `max_iter` across both
    phases (each distributed round and each driver sweep consumes one
    unit of budget and never decreases Q). Deterministic throughout.
    LPA (`label_propagation`) remains the cheaper fallback where
    modularity quality is not worth the extra work.

    ``symmetrized=True`` is the same promise as :func:`modularity`'s:
    the input is already the :func:`_undirected` edge set (both
    directions exactly once). The symmetrize+distinct shuffle AND the
    internal checkpoint are skipped — callers sharing one undirected
    set across louvain + modularity should ``localCheckpoint`` it
    themselves once.
    """
    und = (
        edges.select("src", "dst")
        if symmetrized
        else _undirected(edges).localCheckpoint()
    )
    # ONE aggregate job for both loop-gate scalars (r11; was a count
    # job plus a countDistinct job)
    stats = und.agg(
        F.count("*").alias("n2m"), F.count_distinct("src").alias("nc")
    ).first()
    two_m = float(stats["n2m"])
    if two_m == 0 or max_iter <= 0:
        return (
            und.select(F.col("src").alias("node_id"))
            .distinct()
            .withColumn("community", F.col("node_id"))
        )
    m = two_m / 2.0
    budget = max_iter
    # identity labels stay implicit until the first coarsening round:
    # the common straight-to-driver path (quotient already under the
    # collect threshold) pays one combined aggregate instead of a
    # distinct+checkpoint+count and two identity self-joins (r9)
    n_comm = int(stats["nc"])
    labels: DataFrame | None = None
    # Loop-carried quotient state (r11): the coarsening loop folds the
    # QUOTIENT graph forward — qedges (ca, cb, w; both directions, self
    # rows carry intra-community weight) and qdeg (community, deg_c) —
    # so each merge round relabels + re-aggregates the geometrically
    # shrinking quotient instead of re-joining the FULL edge list
    # against the labels. At 100 TB the raw edges are touched exactly
    # once (the initialization aggregate below); every later round's
    # shuffles are quotient-sized. Values are integer counts/sums, so
    # the carried aggregates are bit-identical to recomputing from
    # scratch and the merge sequence is unchanged.
    qedges: DataFrame | None = None
    coarsened = False
    rounds_done = 0
    # the gated quotient collect (list of Rows) once it fits BOTH caps
    qrows: list | None = None
    while budget > 0:
        if n_comm <= driver_max_nodes and rounds_done >= min_distributed_rounds:
            if qedges is None:
                # lazy checkpoint: the gate's probe count materializes
                # the blocks immediately, so the bounded collect (and
                # any coarsening round after a too-wide verdict) reads
                # memoized blocks instead of re-running the aggregate
                qedges = und.groupBy(
                    F.col("src").alias("ca"), F.col("dst").alias("cb")
                ).agg(F.count("*").alias("w")).localCheckpoint(eager=False)
            # r12: node count alone does not bound the collect — gate on
            # quotient ROW count too (shared two-tier probe+collect)
            qrows = _driver_gate(
                qedges, driver_max_edges, cols=("ca", "cb", "w"),
                as_numpy=False,
            )
            if qrows is not None:
                break
            # quotient too wide for the driver: keep phase-1 coarsening
            # (each merge round monotonically shrinks quotient rows)
        budget -= 1
        rounds_done += 1
        if labels is None:
            labels = (
                und.select(F.col("src").alias("node_id"))
                .distinct()
                .withColumn("community", F.col("node_id"))
                .localCheckpoint()
            )
        if qedges is None:
            # the single full-edge-list aggregate of the whole loop:
            # identity labels make the quotient the deduped undirected
            # edge multiset, and node degrees are its row counts
            qedges = und.groupBy(
                F.col("src").alias("ca"), F.col("dst").alias("cb")
            ).agg(F.count("*").alias("w")).localCheckpoint()
        # quotient-graph inter-community edge weights; each undirected
        # edge contributed its two symmetric rows, so e_ab is already
        # counted once per direction. Self rows (intra weight) are
        # excluded from the gain scoring but stay in qedges for the
        # final driver collect.
        inter = qedges.where(F.col("ca") != F.col("cb")).select(
            "ca", "cb", F.col("w").alias("e_ab")
        )
        # community degree derived lazily from the checkpointed
        # quotient (a self row's w carries BOTH directions of its
        # intra edges, so the plain row-sum per ca is exactly deg_c) —
        # no carried frame, no extra checkpoint job per round
        deg_c = qedges.groupBy(F.col("ca").alias("community")).agg(
            F.sum("w").alias("deg_c")
        )
        pairs = (
            inter.join(deg_c.withColumnRenamed("community", "ca")
                       .withColumnRenamed("deg_c", "da"), "ca")
            .join(deg_c.withColumnRenamed("community", "cb")
                  .withColumnRenamed("deg_c", "db"), "cb")
            .select(
                "ca", "cb",
                (
                    F.col("e_ab") / F.lit(m)
                    - F.col("da") * F.col("db") / F.lit(2.0 * m * m)
                ).alias("gain"),
            )
            .where(F.col("gain") > 0)
        )
        w = Window.partitionBy("ca").orderBy(
            F.col("gain").desc(), F.col("cb").asc()
        )
        best = (
            pairs.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("ca", "cb")
        )
        merges = (
            best.alias("x")
            .join(
                best.alias("y"),
                (F.col("x.ca") == F.col("y.cb"))
                & (F.col("x.cb") == F.col("y.ca")),
            )
            .where(F.col("x.ca") < F.col("x.cb"))
            .select(
                F.col("x.ca").alias("keep"), F.col("x.cb").alias("merge")
            )
            # lazy: isEmpty() materializes it (r7 job-count trim)
            .localCheckpoint(eager=False)
        )
        if merges.isEmpty():
            # merge stall: one last gate attempt (covers forced-rounds
            # stalls and too-wide-but-unmergeable quotients) — if the
            # quotient still exceeds driver_max_edges, fall through to
            # the degraded-labels exit rather than collect unbounded
            # (budget > 0: the driver sweeps need budget left, same as
            # the old `budget <= 0 -> labels` exit)
            if budget > 0 and n_comm <= driver_max_nodes:
                qrows = _driver_gate(
                    qedges, driver_max_edges, cols=("ca", "cb", "w"),
                    as_numpy=False,
                )
            break
        coarsened = True
        labels = (
            labels.join(
                merges.withColumnRenamed("merge", "community"),
                "community",
                "left",
            )
            .select(
                "node_id",
                F.coalesce(F.col("keep"), F.col("community")).alias("community"),
            )
            .localCheckpoint()
        )
        # fold the quotient forward through the merge map: relabel both
        # endpoints, re-aggregate — intra edges of a merged pair become
        # (c, c) self rows carrying the intra weight, exactly what the
        # driver solver expects. The merge map is ≤ n_comm/2 rows.
        mk_a = merges.withColumnRenamed("merge", "ca").withColumnRenamed(
            "keep", "ka"
        )
        mk_b = merges.withColumnRenamed("merge", "cb").withColumnRenamed(
            "keep", "kb"
        )
        qedges = (
            qedges.join(mk_a, "ca", "left")
            .join(mk_b, "cb", "left")
            .groupBy(
                F.coalesce(F.col("ka"), F.col("ca")).alias("ca"),
                F.coalesce(F.col("kb"), F.col("cb")).alias("cb"),
            )
            .agg(F.sum("w").alias("w"))
            # lazy: the n_comm aggregate below materializes it in the
            # same scheduling round (the merges.isEmpty pattern), so
            # the carry costs no standalone checkpoint job; lineage
            # stays flat because both inputs are checkpointed
            .localCheckpoint(eager=False)
        )
        # one distinct endpoint per community with ≥1 incident edge —
        # every node has one (und is built from real edges)
        n_comm = int(qedges.agg(F.count_distinct("ca")).first()[0])
    if qrows is None:
        # budget exhausted, node count still over driver_max_nodes,
        # quotient rows still over driver_max_edges, or the gate is
        # disabled — the documented degraded result: the phase-1 labels
        # (identity when no coarsening round ever ran)
        if labels is not None:
            return labels
        return (
            und.select(F.col("src").alias("node_id"))
            .distinct()
            .withColumn("community", F.col("node_id"))
        )
    rows = [(r["ca"], r["cb"], float(r["w"])) for r in qrows]
    assign = _louvain_local(rows, two_m, budget)
    if not assign:
        # unreachable with a non-empty quotient; identity fallback
        return (
            und.select(F.col("src").alias("node_id"))
            .distinct()
            .withColumn("community", F.col("node_id"))
            if labels is None
            else labels
        )
    spark = edges.sparkSession
    map_df = spark.createDataFrame(
        sorted(assign.items()), "community long, _final long"
    )
    if not coarsened:
        return map_df.select(
            F.col("community").alias("node_id"),
            F.col("_final").alias("community"),
        )
    return labels.join(F.broadcast(map_df), "community").select(
        "node_id", F.col("_final").alias("community")
    )


def _brandes_driver(
    und_edges: "np.ndarray",
    node_ids: "np.ndarray",
    src_ids: "np.ndarray",
    max_depth: int,
) -> "np.ndarray":
    """Vectorized single-machine Brandes over a CSR adjacency — the
    driver fast path of :func:`betweenness_centrality`. Per source:
    level-synchronous BFS (σ path counts scatter-added per level), then
    the backward δ sweep over consecutive-level DAG edges only — the
    exact arithmetic of the distributed per-level joins, so the two
    paths agree to float-sum reordering (the distributed groupBy sum is
    itself order-nondeterministic).  Returns δ-totals per node (the
    UN-halved, un-normalized accumulation)."""
    import numpy as np

    n = len(node_ids)
    # compact ids -> 0..n-1; CSR over the symmetric distinct edge set
    src_c = np.searchsorted(node_ids, und_edges[:, 0])
    dst_c = np.searchsorted(node_ids, und_edges[:, 1])
    order = np.argsort(src_c, kind="stable")
    src_c, dst_c = src_c[order], dst_c[order]
    indptr = np.searchsorted(src_c, np.arange(n + 1))
    indices = dst_c
    delta_total = np.zeros(n, dtype=np.float64)

    def expand(frontier: "np.ndarray"):
        starts, ends = indptr[frontier], indptr[frontier + 1]
        cnt = ends - starts
        total = int(cnt.sum())
        if total == 0:
            return frontier[:0], indices[:0]
        rep_v = np.repeat(frontier, cnt)
        flat = np.repeat(starts, cnt) + (
            np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        )
        return rep_v, indices[flat]

    for s in np.searchsorted(node_ids, src_ids):
        depth = np.full(n, -1, dtype=np.int32)
        sigma = np.zeros(n, dtype=np.float64)
        depth[s] = 0
        sigma[s] = 1.0
        levels = [np.array([s])]
        for d in range(max_depth):
            rep_v, nbr = expand(levels[d])
            if len(nbr) == 0:
                break
            new = np.unique(nbr[depth[nbr] == -1])
            if len(new) == 0:
                break
            depth[new] = d + 1
            at_next = depth[nbr] == d + 1
            np.add.at(sigma, nbr[at_next], sigma[rep_v[at_next]])
            levels.append(new)
        delta = np.zeros(n, dtype=np.float64)
        for d in range(len(levels) - 1, 0, -1):
            rep_w, nbr = expand(levels[d])
            up = depth[nbr] == d - 1
            v, w = nbr[up], rep_w[up]
            np.add.at(delta, v, sigma[v] / sigma[w] * (1.0 + delta[w]))
        delta[s] = 0.0  # distributed path drops s == v rows
        delta_total += delta
    return delta_total


def betweenness_centrality(
    edges: DataFrame,
    sources: list[int] | None = None,
    max_depth: int = 10,
    normalized: bool = True,
    driver_edge_threshold: int = 1_000_000,
) -> DataFrame:
    """G2 — Brandes betweenness over the undirected edge set via
    multi-source BFS joins; returns (node_id, betweenness).

    All-pairs Brandes is O(V·E) — at scale the reference-faithful move
    is a documented source sample (``sources``; default = every vertex,
    exact, fine at test scale). The BFS runs ALL sources concurrently:
    the frontier is keyed by (source, node), so each depth level is one
    join regardless of how many sources are in flight — the
    aggregateMessages trick that keeps the loop depth-bounded, not
    source-bounded.

    Graphs at or under ``driver_edge_threshold`` raw edge rows take a
    gated driver fast path (same pattern as :func:`k_core` /
    :func:`louvain`): collect the edge set once and run the identical
    per-level arithmetic vectorized in numpy (`_brandes_driver`) — a
    depth-bounded loop of ~3 shuffles per level is pure scheduling
    overhead on a sub-million-edge graph, while the distributed path
    stays the scale shape (pass ``driver_edge_threshold=0`` to force
    it; the parity test pins driver ≡ distributed on random graphs).
    The gate (:func:`_driver_gate`) collects a bounded
    ``limit(threshold+1)`` slice of the RAW edge list BEFORE the
    symmetrize shuffle (r10; ADVICE r9) — the driver path symmetrizes
    in numpy, so the cluster never pays a distinct + checkpoint just
    to decide the path.
    """
    raw = _driver_gate(edges, driver_edge_threshold)
    if raw is not None:
        import numpy as np
        import pandas as pd

        # the exact set _undirected builds (both directions, distinct,
        # self-loops kept), built driver-side
        und_np = (
            np.unique(np.vstack([raw, raw[:, ::-1]]), axis=0)
            if len(raw)
            else raw.reshape(0, 2)
        )
        node_ids = np.unique(und_np[:, 0])
        n = len(node_ids)
        if sources is None:
            src_ids = node_ids
        else:
            wanted = np.array(sorted({int(s) for s in sources}), np.int64)
            src_ids = wanted[np.isin(wanted, node_ids)]
        delta_total = _brandes_driver(und_np, node_ids, src_ids, max_depth)
        bc_vals = delta_total / 2.0  # undirected halving
        if normalized and n > 2:
            bc_vals = bc_vals / ((n - 1) * (n - 2) / 2.0)
        return edges.sparkSession.createDataFrame(
            pd.DataFrame({"node_id": node_ids, "betweenness": bc_vals}),
            "node_id long, betweenness double",
        )

    und = _undirected(edges).localCheckpoint()
    verts = und.select(F.col("src").alias("node_id")).distinct()
    n = verts.count()

    if sources is None:
        src_df = verts.select(F.col("node_id").alias("s"))
    else:
        # dedup like the driver path so duplicate ids in `sources`
        # cannot double their contribution (ADVICE r8). The seed's 32
        # near-empty createDataFrame partitions look wasteful in
        # `visited`, but collapsing them (coalesce(1), r10 probe) is
        # 2× WORSE at sf0.1: the narrow coalesce also caps the first
        # expansion join's parallelism at one task. Leave layout to
        # the planner.
        src_df = und.sparkSession.createDataFrame(
            [(s,) for s in sorted({int(s) for s in sources})], "s long"
        )

    # forward BFS: (s, v) -> depth, sigma (shortest-path count)
    frontier = src_df.select(
        "s", F.col("s").alias("v"), F.lit(0).alias("depth"), F.lit(1.0).alias("sigma")
    )
    levels = [frontier.localCheckpoint()]
    _seen_all = os.environ.get("SPARK_GRAFT_BFS_SEEN_ALL") == "1"
    for depth in range(1, max_depth + 1):
        # ONE exchange per level (r10): the sigma aggregation and the
        # visited anti-join both key on (s, v), so instead of a groupBy
        # followed by a left join (two hash-partitionings of (s, v)
        # data per level, r7 shape) the seen set rides the SAME
        # aggregation as a null-sigma sentinel row — sum(sigma) ignores
        # it, max(_seen) marks the node as already reached, and the
        # filter keeps exactly the anti-join's survivors. On a
        # 1000-executor cluster this halves the per-level shuffle
        # barrier count of the hot loop; the und expansion join stays
        # declarative (AQE broadcasts the small side at bench scale,
        # shuffle-joins at 100 TB).
        #
        # The sentinel set is the LAST TWO levels, not the whole
        # visited table (r13): `und` holds both directions of every
        # edge, so a neighbor of a depth-(d-1) frontier node has BFS
        # depth in {d-2, d-1, d} — if it had depth k < d-2, its
        # neighbor's depth would be at most k+1 < d-1, contradicting
        # the frontier node's depth. Excluding levels d-1 and d-2
        # therefore discards exactly the rows the full visited set
        # would. This caps the per-level sentinel shuffle at two
        # frontier widths instead of the whole reached set (which
        # grows as levels × |reached| over the loop) — the asymptotic
        # difference at 100 TB, and the env escape
        # (SPARK_GRAFT_BFS_SEEN_ALL=1) restores the full-union shape
        # for A/B or forensics.
        if len(levels) == 1:
            seen = levels[0]
        elif _seen_all:
            seen = reduce(DataFrame.unionByName, levels)
        else:
            seen = levels[-1].unionByName(levels[-2])
        expanded = frontier.join(und.withColumnRenamed("src", "v"), "v").select(
            "s",
            F.col("dst").alias("v"),
            F.col("sigma"),
            F.lit(0).alias("_seen"),
        )
        nxt = (
            expanded.unionByName(
                seen.select(
                    "s",
                    "v",
                    F.lit(None).cast("double").alias("sigma"),
                    F.lit(1).alias("_seen"),
                )
            )
            .groupBy("s", "v")
            .agg(F.sum("sigma").alias("sigma"), F.max("_seen").alias("_seen"))
            .where(F.col("_seen") == 0)
            .withColumn("depth", F.lit(depth))
            .select("s", "v", "depth", "sigma")
        )
        # lazy checkpoint: isEmpty() materializes every partition into
        # the block store in ONE job (eager=True would spend a separate
        # job per level just to checkpoint before the emptiness probe)
        nxt = nxt.localCheckpoint(eager=False)
        if nxt.isEmpty():
            break
        levels.append(nxt)
        frontier = nxt

    # backward accumulation by descending depth:
    # delta(v) = Σ_w sigma_v/sigma_w * (1 + delta_w) over BFS-successors
    # w. The shortest-path DAG of an unweighted BFS only connects
    # consecutive levels, so deltas are computed per level — each step
    # touches one level's rows, not the whole visited set (the full
    # (s,v) table is never rewritten). Each delta frame CARRIES its
    # level's sigma (r7), so the contrib step is edges ⋈ upper only —
    # the former lower ⋈ lower_delta re-join per level is gone.
    deltas = [
        levels[-1].select("s", "v", "sigma").withColumn("delta", F.lit(0.0))
    ]
    for d in range(len(levels) - 1, 0, -1):
        upper = levels[d - 1].select("s", "v", "sigma")
        lower_delta = deltas[-1]  # (s, v, sigma, delta) of depth-d nodes
        # ONE exchange per level (r10): sigma_v is constant per (s, v),
        # so Σ_w sigma_v/sigma_w·(1+delta_w) = sigma_v · Σ_w
        # (1+delta_w)/sigma_w — hoisting it means the contribution
        # partials need NO join with upper before aggregating. The
        # upper rows then ride the same groupBy as sentinel rows
        # carrying sigma (part=0), replacing the r7 shape's three
        # (s, v)-keyed barriers per level (contrib groupBy + upper
        # equi-join + attach left-join) with a single aggregation;
        # rows whose aggregated sigma is NULL are contributions to
        # non-predecessor neighbors (same depth / deeper) — exactly
        # what the former inner join with upper discarded.
        part = (
            lower_delta.withColumnRenamed("v", "w")
            .select(
                "s",
                "w",
                ((F.lit(1.0) + F.col("delta")) / F.col("sigma")).alias(
                    "part"
                ),
            )
            .join(
                und.select(F.col("src").alias("v"), F.col("dst").alias("w")),
                "w",
            )
            .select(
                "s", "v", F.lit(None).cast("double").alias("sigma"), "part"
            )
        )
        deltas.append(
            upper.select("s", "v", "sigma", F.lit(0.0).alias("part"))
            .unionByName(part)
            .groupBy("s", "v")
            .agg(F.max("sigma").alias("sigma"), F.sum("part").alias("part"))
            .where(F.col("sigma").isNotNull())
            .select(
                "s",
                "v",
                "sigma",
                (F.col("sigma") * F.col("part")).alias("delta"),
            )
            # lazy checkpoint each level: it memoizes as well as
            # flattens — every delta frame is read TWICE (by the next
            # level's contrib and by the final union), so skipping
            # checkpoints recomputes each level and measures slower
            # (r10 probe: cadence-3 checkpointing was ~0.7 s worse at
            # sf0.1 than per-level), besides re-deepening lineage
            .localCheckpoint(eager=False)
        )

    all_delta = deltas[0].select("s", "v", "delta")
    for lvl in deltas[1:]:
        all_delta = all_delta.unionByName(lvl.select("s", "v", "delta"))
    bc = (
        all_delta.where(F.col("s") != F.col("v"))
        .groupBy(F.col("v").alias("node_id"))
        .agg((F.sum("delta") / 2.0).alias("betweenness"))  # undirected halving
    )
    out = verts.join(bc, "node_id", "left").select(
        "node_id", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
    )
    if normalized and n > 2:
        out = out.withColumn(
            "betweenness", F.col("betweenness") / ((n - 1) * (n - 2) / 2.0)
        )
    return out


def _und_np(raw):
    """Numpy twin of :func:`_und_simple`: compact the raw (rows, 2) id
    array into the loop-free undirected simple edge set. Returns
    ``(node_ids, src, dst, deg)`` where ``src``/``dst`` are compact
    indices into ``node_ids`` holding each undirected edge in BOTH
    directions exactly once, and ``deg`` is the undirected degree."""
    import numpy as np

    if raw.size == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, z
    both = np.concatenate([raw, raw[:, ::-1]])
    both = both[both[:, 0] != both[:, 1]]
    if both.size == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z, z
    node_ids = np.unique(both)
    n = node_ids.size
    src = np.searchsorted(node_ids, both[:, 0]).astype(np.int64)
    dst = np.searchsorted(node_ids, both[:, 1]).astype(np.int64)
    key = np.unique(src * n + dst)  # n^2 < 2^63 for any collectable graph
    src, dst = key // n, key % n
    deg = np.bincount(src, minlength=n)
    return node_ids, src, dst, deg


#: pair-expansion budget for the numpy wedge loops: above this many
#: wedges the driver path would stop being "small-graph" regardless of
#: edge count, so the gate falls through to the distributed plan.
_WEDGE_BUDGET = 250_000_000


def _k_core_driver(spark, raw_np, k: int) -> DataFrame:
    """Driver fast path of :func:`k_core` over a collected (rows, 2)
    int64 edge array — the same iterative peel, vectorized: drop every
    node under degree ``k``, recompute alive-neighbor degrees, repeat.
    The k-core is the unique, order-independent fixpoint, so this
    round-synchronous peel, the sequential-queue peel inside
    :func:`k_core`, and the distributed loop all agree exactly (parity
    pinned in tests). Rounds = peel depth. Exists so a caller that
    already collected the graph once for several metrics
    (`q_graph_metrics`) can peel without a second collect."""
    import numpy as np
    import pandas as pd

    node_ids, src, dst, deg = _und_np(raw_np)
    n = node_ids.size
    schema = "node_id long, core_degree long"
    if n == 0:
        return spark.createDataFrame([], schema)
    alive = np.ones(n, dtype=bool)
    deg = deg.astype(np.int64)
    while True:
        bad = alive & (deg < k)
        if not bad.any():
            break
        alive[bad] = False
        live = alive[src] & alive[dst]
        deg = np.bincount(src[live], minlength=n)
    if not alive.any():
        return spark.createDataFrame([], schema)
    live = alive[src] & alive[dst]
    core_deg = np.bincount(src[live], minlength=n)
    return spark.createDataFrame(
        pd.DataFrame(
            {"node_id": node_ids[alive], "core_degree": core_deg[alive]}
        ),
        schema,
    )


def _triangle_driver(spark, raw_np) -> "DataFrame | None":
    """Driver fast path of :func:`triangle_count` — the identical
    degree-ordered orientation, with the wedge loop vectorized per
    neighbor offset (nodes sorted by oriented out-degree descending, so
    offset ``k`` touches only the prefix of groups longer than ``k``;
    total work stays O(#wedges)). Triangle counts are exact integers,
    so driver ≡ distributed bit-for-bit (parity pinned in tests).
    Returns None when the wedge budget is exceeded (caller falls back
    to the distributed plan, which spreads the same wedge set over the
    cluster)."""
    import numpy as np
    import pandas as pd

    node_ids, src, dst, deg = _und_np(raw_np)
    n = node_ids.size
    empty = lambda: spark.createDataFrame(  # noqa: E731
        [], "node_id long, triangles long"
    )
    if n == 0:
        return empty()
    # orient each undirected edge from its lower-(deg, id) endpoint:
    # key = deg*n + id orders exactly like the struct(deg, id) compare
    ku, kv = deg[src] * n + src, deg[dst] * n + dst
    f = ku < kv
    u, v = src[f], dst[f]
    if u.size == 0:
        return empty()
    odeg = np.bincount(u, minlength=n)
    if int(np.sum(odeg * (odeg - 1) // 2)) > _WEDGE_BUDGET:
        return None
    # group oriented out-neighbors by node, longest groups first
    rank = np.empty(n, dtype=np.int64)
    node_order = np.lexsort((np.arange(n), -odeg))
    rank[node_order] = np.arange(n)
    eorder = np.lexsort((v, rank[u]))
    gv = v[eorder]
    cnt = odeg[node_order]  # descending
    starts = np.concatenate([[0], np.cumsum(cnt)])
    grp = np.repeat(np.arange(n), cnt)
    pos = np.arange(gv.size) - starts[grp]
    ekey = np.sort(u * n + v)  # oriented-edge membership set
    tri = np.zeros(n, dtype=np.int64)
    neg_cnt = -cnt
    for k in range(1, int(cnt[0]) if n else 0):
        m = np.searchsorted(neg_cnt, -k)  # groups with cnt > k
        pmax = starts[m]
        sel = np.nonzero(pos[:pmax] + k < cnt[grp[:pmax]])[0]
        if sel.size == 0:
            continue
        x, y = gv[sel], gv[sel + k]
        kx, ky = deg[x] * n + x, deg[y] * n + y
        lo = np.where(kx < ky, x, y)
        hi = np.where(kx < ky, y, x)
        pkey = lo * n + hi
        idx = np.searchsorted(ekey, pkey)
        hit = ekey[np.minimum(idx, ekey.size - 1)] == pkey
        if hit.any():
            centers = node_order[grp[sel[hit]]]
            tri += np.bincount(centers, minlength=n)
            tri += np.bincount(lo[hit], minlength=n)
            tri += np.bincount(hi[hit], minlength=n)
    mask = tri > 0
    return spark.createDataFrame(
        pd.DataFrame({"node_id": node_ids[mask], "triangles": tri[mask]}),
        "node_id long, triangles long",
    )


def _adamic_adar_driver(
    spark, raw_np, top_k, max_hub_degree
) -> "DataFrame | None":
    """Driver fast path of :func:`adamic_adar` — same wedge expansion
    through each center z (full neighborhoods, weight 1/ln(deg z), hub
    cap applied to centers against the FULL degree, exactly like the
    distributed ctr filter), pair sums via unique+bincount, adjacency
    anti-join via sorted-key membership. Float sums reassociate, so
    parity with the distributed plan holds to 1e-9 (pinned in tests).
    Returns None when the wedge budget is exceeded."""
    import numpy as np
    import pandas as pd

    node_ids, src, dst, deg = _und_np(raw_np)
    n = node_ids.size
    schema = "node_a long, node_b long, aa_score double"
    if n == 0:
        return spark.createDataFrame([], schema)
    keep = np.ones(src.size, dtype=bool)
    if max_hub_degree is not None:
        keep = deg[src] <= max_hub_degree
    u, v = src[keep], dst[keep]
    cdeg = np.bincount(u, minlength=n)  # per-center kept neighbor count
    if int(np.sum(cdeg * (cdeg - 1) // 2)) > _WEDGE_BUDGET:
        return None
    rank = np.empty(n, dtype=np.int64)
    node_order = np.lexsort((np.arange(n), -cdeg))
    rank[node_order] = np.arange(n)
    eorder = np.lexsort((v, rank[u]))
    gv = v[eorder]
    cnt = cdeg[node_order]
    starts = np.concatenate([[0], np.cumsum(cnt)])
    grp = np.repeat(np.arange(n), cnt)
    pos = np.arange(gv.size) - starts[grp]
    neg_cnt = -cnt
    keys, wts = [], []
    for k in range(1, int(cnt[0]) if cnt.size else 0):
        m = np.searchsorted(neg_cnt, -k)
        pmax = starts[m]
        sel = np.nonzero(pos[:pmax] + k < cnt[grp[:pmax]])[0]
        if sel.size == 0:
            continue
        # neighbors are id-sorted within each group, so gv[sel] <
        # gv[sel+k] — pairs come out already (node_a < node_b)
        keys.append(gv[sel] * n + gv[sel + k])
        wts.append(1.0 / np.log(deg[node_order[grp[sel]]].astype(np.float64)))
    if not keys:
        return spark.createDataFrame([], schema)
    allk = np.concatenate(keys)
    allw = np.concatenate(wts)
    uk, inv = np.unique(allk, return_inverse=True)
    sums = np.bincount(inv, weights=allw)
    # drop adjacent pairs (membership in the canonical a<b edge set)
    canon = np.sort(src[src < dst] * n + dst[src < dst])
    idx = np.searchsorted(canon, uk)
    absent = canon[np.minimum(idx, canon.size - 1)] != uk if canon.size else (
        np.ones(uk.size, dtype=bool)
    )
    uk, sums = uk[absent], sums[absent]
    a, b = uk // n, uk % n
    if top_k is not None and uk.size > top_k:
        order = np.lexsort((b, a, -sums))[:top_k]
        a, b, sums = a[order], b[order], sums[order]
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "node_a": node_ids[a],
                "node_b": node_ids[b],
                "aa_score": sums,
            }
        ),
        schema,
    )


def triangle_count(
    edges: DataFrame,
    *,
    symmetrized: bool = False,
    driver_edge_threshold: int = 1_000_000,
) -> DataFrame:
    """Per-node triangle counts over the undirected simple graph;
    returns (node_id, triangles) for every node in at least one
    triangle. Graph-engine staple the reference delegates to its closed
    engine's analytics tier; here it is three joins.

    Scale shape — degree-ordered orientation (the node-iterator++ /
    "compact-forward" algorithm): every undirected edge is oriented
    from its lower-(degree, id) endpoint to the higher one, so each
    node's out-degree is bounded by O(sqrt(|E|)) on any graph, and the
    wedge join (out-nbrs x out-nbrs per node) — the step that explodes
    on hubs in the naive id-ordered formulation — stays near-linear.
    Two shuffles (degree agg + wedge groupBy-join); the closing-edge
    probe is an equi-join against the oriented edge list. Triangle sets
    are orientation-invariant, so the DuckDB oracle may replay the
    simpler id-ordered SQL and must agree bit-for-bit.

    Size-gated like the other graph algorithms (r9): at most
    ``driver_edge_threshold`` raw edge rows are collected and counted
    in numpy (`_triangle_driver` — same orientation, same integer
    counts, parity pinned in tests), with a wedge budget so a collected
    graph whose expansion is still huge falls back to the distributed
    plan. ``driver_edge_threshold=0`` forces the distributed path.
    """
    raw = _driver_gate(edges, driver_edge_threshold)
    if raw is not None:
        out = _triangle_driver(edges.sparkSession, raw)
        if out is not None:
            return out
    und = _und_simple(edges, symmetrized)
    deg = und.groupBy(F.col("src").alias("n")).agg(F.count("*").alias("d"))
    canon = und.where(F.col("src") < F.col("dst"))
    oriented = (
        canon.join(deg.withColumnRenamed("n", "src"), "src")
        .withColumnRenamed("d", "d_src")
        .join(
            deg.select(F.col("n").alias("dst"), F.col("d").alias("d_dst")),
            "dst",
        )
        .select(
            F.when(
                F.struct(F.col("d_src"), F.col("src"))
                < F.struct(F.col("d_dst"), F.col("dst")),
                F.struct(
                    F.col("src").alias("u"),
                    F.col("dst").alias("v"),
                    F.col("d_dst").alias("dv"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("dst").alias("u"),
                    F.col("src").alias("v"),
                    F.col("d_src").alias("dv"),
                )
            )
            .alias("e")
        )
        .select("e.u", "e.v", "e.dv")
    )
    lo = oriented.select("u", F.col("v").alias("a"), F.col("dv").alias("da"))
    hi = oriented.select("u", F.col("v").alias("b"), F.col("dv").alias("db"))
    wedges = (
        lo.join(hi, "u")
        .where(
            F.struct(F.col("da"), F.col("a")) < F.struct(F.col("db"), F.col("b"))
        )
        .select("u", "a", "b")
    )
    tris = wedges.join(
        oriented.select(F.col("u").alias("a"), F.col("v").alias("b")),
        ["a", "b"],
    )
    corners = (
        tris.select(F.col("u").alias("node_id"))
        .unionAll(tris.select(F.col("a").alias("node_id")))
        .unionAll(tris.select(F.col("b").alias("node_id")))
    )
    return corners.groupBy("node_id").agg(F.count("*").alias("triangles"))


def adamic_adar(
    edges: DataFrame,
    top_k: int | None = None,
    max_hub_degree: int | None = None,
    *,
    symmetrized: bool = False,
    driver_edge_threshold: int = 1_000_000,
) -> DataFrame:
    """Adamic-Adar link prediction over the undirected simple graph:
    for every NON-adjacent pair (a, b), score
    ``sum over z in N(a) ∩ N(b) of 1/ln(deg(z))`` — the classic
    common-neighbor predictor of which relations an entity graph is
    missing. Returns (node_a, node_b, aa_score) with node_a < node_b,
    top_k by (score desc, pair asc) when requested.

    Scale shape: the wedge expansion through z costs sum(deg(z)^2) —
    the hub z is the skew hazard, and ``max_hub_degree`` is the
    explicit guard (drop centers above the cap; a hub's per-pair weight
    1/ln(deg) is the smallest signal in the sum, the same df_cap
    rationale as the Jaccard join's hot-shingle cap). One shuffle for
    degrees, one wedge self-join keyed on z, one pair aggregation, and
    an anti-join against the edge list so only predicted (absent) links
    emit.

    Size-gated like the other graph algorithms (r9): at most
    ``driver_edge_threshold`` raw edge rows are collected and scored in
    numpy (`_adamic_adar_driver` — identical wedge expansion + hub-cap
    semantics; float sums reassociate, parity pinned to 1e-9 in
    tests), with a wedge budget so a hub-heavy collected graph still
    falls back to the distributed plan. ``driver_edge_threshold=0``
    forces the distributed path.
    """
    raw = _driver_gate(edges, driver_edge_threshold)
    if raw is not None:
        out = _adamic_adar_driver(
            edges.sparkSession, raw, top_k, max_hub_degree
        )
        if out is not None:
            return out
    und = _und_simple(edges, symmetrized)
    deg = und.groupBy(F.col("src").alias("z")).agg(F.count("*").alias("d"))
    ctr = und.select(F.col("src").alias("z"), F.col("dst").alias("x")).join(
        deg, "z"
    )
    if max_hub_degree is not None:
        ctr = ctr.where(F.col("d") <= max_hub_degree)
    a = ctr.select("z", F.col("x").alias("node_a"), "d")
    b = ctr.select("z", F.col("x").alias("node_b"))
    pairs = (
        a.join(b, "z")
        .where(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(F.sum(F.lit(1.0) / F.log(F.col("d"))).alias("aa_score"))
    )
    absent = pairs.join(
        und.select(
            F.col("src").alias("node_a"), F.col("dst").alias("node_b")
        ),
        ["node_a", "node_b"],
        "left_anti",
    )
    if top_k is not None:
        absent = absent.orderBy(
            F.col("aa_score").desc(), F.col("node_a").asc(),
            F.col("node_b").asc(),
        ).limit(top_k)
    return absent


def k_core(
    edges: DataFrame,
    k: int,
    max_iter: int = 100,
    driver_edge_threshold: int = 1_000_000,
    *,
    symmetrized: bool = False,
) -> DataFrame:
    """The k-core: the maximal subgraph where every node has degree
    >= k, found by iterative peeling (drop all nodes under k, recompute
    degrees, repeat to the unique fixpoint — order-independent).
    Returns (node_id, core_degree): the surviving nodes and their
    degree inside the core. The training-data reading: a k-core over a
    near-dup graph isolates templated boilerplate families; over an
    entity graph it is the dense backbone.

    Size-gated like ``communities.connected_components``: at most
    ``driver_edge_threshold`` undirected edges are collected and peeled
    driver-side (the peel is a unique, order-independent fixpoint, so
    the two paths agree exactly; parity pinned in tests). The
    distributed loop below is the at-scale path — per round one degree
    aggregation + one semi-join filter with eager ``localCheckpoint``
    to flatten lineage (the pagerank/LPA loop shape); rounds needed =
    peel depth, typically far below diameter.
    """
    cur = _und_simple(edges, symmetrized).localCheckpoint(eager=True)
    cur_count = cur.count()
    if driver_edge_threshold and cur_count <= driver_edge_threshold:
        from collections import Counter, defaultdict

        nbrs: dict = defaultdict(set)
        for row in cur.collect():
            nbrs[row[0]].add(row[1])
        deg = Counter({n: len(v) for n, v in nbrs.items()})
        queue = [n for n, d in deg.items() if d < k]
        dead: set = set()
        while queue:
            n = queue.pop()
            if n in dead:
                continue
            dead.add(n)
            for m in nbrs[n]:
                if m not in dead:
                    deg[m] -= 1
                    if deg[m] < k:
                        queue.append(m)
        id_type = cur.schema[0].dataType
        out = [
            (n, len(nbrs[n] - dead))
            for n in nbrs
            if n not in dead
        ]
        return edges.sparkSession.createDataFrame(
            out,
            T.StructType(
                [
                    T.StructField("node_id", id_type),
                    T.StructField("core_degree", T.LongType()),
                ]
            ),
        )
    for _ in range(max_iter):
        deg = cur.groupBy(F.col("src").alias("n")).agg(
            F.count("*").alias("core_degree")
        )
        keep = deg.where(F.col("core_degree") >= k)
        nxt = (
            cur.join(
                keep.select(F.col("n").alias("src")), "src", "left_semi"
            )
            .join(keep.select(F.col("n").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        # carry the previous round's size instead of re-counting the
        # checkpointed frame — one count job per peel round, not two
        nxt_count = nxt.count()
        if nxt_count == cur_count:
            cur = nxt
            break
        cur, cur_count = nxt, nxt_count
    return cur.groupBy(F.col("src").alias("node_id")).agg(
        F.count("*").alias("core_degree")
    )
