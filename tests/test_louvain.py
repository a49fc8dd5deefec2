"""Louvain correctness: reference-derivable invariants (Q₀), oracle label
equality (exact), modularity preservation under coarsening."""

import pytest

from graftlouvain.operators.graph import LinkGraph, singleton_assignments
from graftlouvain.operators.louvain import coarsen, louvain, louvain_level, modularity
from graftlouvain.oracle.louvain_seq import (
    seq_louvain,
    seq_louvain_level,
    seq_modularity,
)

from tests.fixtures import (
    FIXTURE_28_W,
    FIXTURE_KARATE_W,
    FIXTURE_W5,
    fixture_hub,
    to_df,
)


def _labels(df):
    return {r["id"]: r["community"] for r in df.collect()}


def _canon(labels):
    """Canonical partition: map each community to the smallest member id, so
    two labelings are compared as partitions."""
    rep = {}
    for v, c in labels.items():
        rep.setdefault(c, v)
        rep[c] = min(rep[c], v)
    return {v: rep[c] for v, c in labels.items()}


def test_initial_modularity_fixture28(spark):
    """Q₀ = −1/56 (reference m2 = 2·ecount convention, communities.rs:45) and
    −1/14 textbook (BASELINE.md invariants)."""
    g = LinkGraph.from_edges(to_df(spark, FIXTURE_28_W))
    asg = singleton_assignments(g)
    q_ref = modularity(g, asg, reference_convention=True)
    q_txt = modularity(g, asg)
    assert q_ref == pytest.approx(-1.0 / 56.0, abs=1e-12)
    assert q_txt == pytest.approx(-1.0 / 14.0, abs=1e-12)
    # oracle agrees
    assert seq_modularity(FIXTURE_28_W, {v: v for v in range(16)}, True) == pytest.approx(
        q_ref, abs=1e-12
    )


@pytest.mark.parametrize(
    "edges", [FIXTURE_W5, FIXTURE_28_W, FIXTURE_KARATE_W, fixture_hub()],
    ids=["w5", "fixture28", "karate", "hub"],
)
def test_level_labels_match_oracle(spark, edges):
    """One Louvain level: engine labels == sequential oracle labels EXACTLY."""
    g = LinkGraph.from_edges(to_df(spark, edges))
    asg, stats = louvain_level(g)
    got = _labels(asg)
    want, steps = seq_louvain_level(edges)
    assert got == want
    assert stats.supersteps == steps


@pytest.mark.parametrize(
    "edges", [FIXTURE_W5, FIXTURE_28_W, FIXTURE_KARATE_W, fixture_hub()],
    ids=["w5", "fixture28", "karate", "hub"],
)
def test_full_louvain_matches_oracle(spark, edges):
    g = LinkGraph.from_edges(to_df(spark, edges))
    result = louvain(g)
    want, q_want = seq_louvain(edges)
    assert _labels(result.assignments) == want
    assert result.modularity == pytest.approx(q_want, abs=1e-9)


def test_karate_modularity_quality(spark):
    """Sanity: multi-level Louvain on karate reaches the published Q range
    (≈0.40-0.42 for greedy variants, Blondel et al. 2008 report 0.42)."""
    g = LinkGraph.from_edges(to_df(spark, FIXTURE_KARATE_W))
    result = louvain(g)
    assert 0.35 <= result.modularity <= 0.43
    assert 2 <= result.num_communities <= 8


def test_modularity_preserved_under_coarsening(spark):
    g = LinkGraph.from_edges(to_df(spark, FIXTURE_KARATE_W))
    asg, _ = louvain_level(g)
    q_fine = modularity(g, asg)
    cg = coarsen(g, asg)
    q_coarse = modularity(cg, singleton_assignments(cg))
    assert q_coarse == pytest.approx(q_fine, abs=1e-12)
    # total weight (2m) is preserved exactly
    assert cg.two_m == pytest.approx(g.two_m, abs=1e-9)


def test_hub_partition_recovers_blocks(spark):
    """On the star-plus-blocks skew fixture the blocks should dominate the
    partition structure (hub joins one block or its own)."""
    edges = fixture_hub(n_blocks=4, block_size=8)
    g = LinkGraph.from_edges(to_df(spark, edges))
    result = louvain(g)
    labels = _canon(_labels(result.assignments))
    # every dense block ends up in a single community
    v = 1
    for _b in range(4):
        block = list(range(v, v + 8))
        v += 8
        assert len({labels[u] for u in block}) == 1


def test_pandas_argmax_path_matches_window(spark):
    """The Arrow grouped-map argmax (north-star pandas-UDF local phase) must
    produce the exact same labels as the default (hash-aggregate) path."""
    g = LinkGraph.from_edges(to_df(spark, FIXTURE_KARATE_W))
    asg_w, _ = louvain_level(g, use_pandas=False)
    asg_p, _ = louvain_level(g, use_pandas=True)
    assert _labels(asg_w) == _labels(asg_p)


def test_argmax_physical_paths_equal(spark):
    """All three argmax physical strategies — hash-agg max_by (default),
    window rank, Arrow grouped-map — produce identical best moves from the
    same scored table, including tie cases."""
    from graftlouvain.operators.louvain import (
        _best_moves_agg,
        _best_moves_pandas,
        _best_moves_window,
        move_scores,
    )

    for edges in (FIXTURE_KARATE_W, fixture_hub()):
        g = LinkGraph.from_edges(to_df(spark, edges))
        scored = move_scores(g, singleton_assignments(g))
        cols = ["src", "nbr_comm", "score", "cur_comm", "stay_score"]

        def key(df):
            return sorted(
                (r["src"], r["nbr_comm"], round(r["score"], 9), r["cur_comm"],
                 round(r["stay_score"], 9))
                for r in df.select(*cols).collect()
            )

        a = key(_best_moves_agg(scored))
        assert a == key(_best_moves_window(scored))
        assert a == key(_best_moves_pandas(scored))


@pytest.mark.parametrize(
    "edges", [FIXTURE_W5, FIXTURE_28_W, FIXTURE_KARATE_W, fixture_hub()],
    ids=["w5", "fixture28", "karate", "hub"],
)
def test_batched_matches_unbatched(spark, edges):
    """batch_supersteps=2 (one materialization/Observation per superstep PAIR)
    must reproduce the unbatched loop exactly: same labels, same superstep
    count, same per-superstep move sequence — with and without convergence
    slack (min_moves_frac). Pinned to gate_mode="parity": batching composes
    the even/odd pair, so the conflict gate (step-independent) forces
    batch=1 by construction."""
    g = LinkGraph.from_edges(to_df(spark, edges))
    for frac in (0.0, 0.05):
        a1, s1 = louvain_level(
            g, batch_supersteps=1, min_moves_frac=frac, gate_mode="parity"
        )
        a2, s2 = louvain_level(
            g, batch_supersteps=2, min_moves_frac=frac, gate_mode="parity"
        )
        assert _labels(a1) == _labels(a2)
        assert s1.supersteps == s2.supersteps
        assert s1.moves == s2.moves
    r1 = louvain(g, batch_supersteps=1, gate_mode="parity")
    r2 = louvain(g, batch_supersteps=2, gate_mode="parity")
    assert _labels(r1.assignments) == _labels(r2.assignments)
    assert r1.modularity == pytest.approx(r2.modularity, abs=1e-12)


@pytest.mark.parametrize(
    "edges", [FIXTURE_28_W, FIXTURE_KARATE_W],
    ids=["fixture28", "karate"],
)
def test_parity_gate_mode_matches_oracle(spark, edges):
    """gate_mode="parity" (the r2-r4 semantics) stays exactly oracle-pinned
    after the r5 conflict gate became the default."""
    g = LinkGraph.from_edges(to_df(spark, edges))
    asg, stats = louvain_level(g, gate_mode="parity")
    want, steps = seq_louvain_level(edges, gate_mode="parity")
    assert _labels(asg) == want
    assert stats.supersteps == steps


def test_conflict_gate_progress_and_fewer_supersteps():
    """The r5 gate's contract, on the oracle (pure Python, no Spark):
    (a) converges in strictly fewer level supersteps than parity on every
    fixture (the gate stops blocking half the improving moves);
    (b) the progress guarantee — a zero-move superstep only ever occurs AT
    the fixpoint (no vertex has any strictly-improving move), never because
    the gate blocked all of them;
    (c) the final Q is a DIFFERENT greedy local optimum, not a dominated
    one: better than parity on karate/hub, worse on fixture28 (3 communities
    at Q=0.375 vs parity's 2 at ~0.392 — pinned exactly; neither gate
    dominates, both land at true local-move fixpoints; the at-scale
    comparison lives in BENCH/BASELINE.md where conflict at exact fixpoint
    meets-or-beats parity's Q)."""
    from graftlouvain.oracle.louvain_seq import (
        _graph_tables, _superstep_seq, seq_louvain)

    fixtures = {
        "f28": FIXTURE_28_W, "karate": FIXTURE_KARATE_W, "hub": fixture_hub()
    }
    for name, edges in fixtures.items():
        # (a) strictly fewer supersteps
        _, s_conf = seq_louvain_level(edges)
        _, s_par = seq_louvain_level(edges, gate_mode="parity")
        assert s_conf < s_par, (name, s_conf, s_par)
        # (b) zero-move superstep ⇒ zero PRELIMINARY (improving) moves too:
        # replay the level move-by-move; at the first quiet superstep no
        # vertex may hold any strictly-improving move
        adj, deg, S = _graph_tables(edges)
        asg = {v: v for v in adj}
        for step in range(64):
            new_asg, n = _superstep_seq(adj, deg, S, asg, step, 1e-12)
            if n == 0:
                # prelim must be EMPTY (not merely all-blocked): any
                # improving move is either descending or ascending, so the
                # parity gate at even+odd parities would apply it — both
                # quiet ⇒ no vertex has a strictly-improving move at all
                _, n_even = _superstep_seq(adj, deg, S, asg, 0, 1e-12, "parity")
                _, n_odd = _superstep_seq(adj, deg, S, asg, 1, 1e-12, "parity")
                assert n_even == 0 and n_odd == 0, name  # true fixpoint
                break
            asg = new_asg
    # (c) trajectory difference, pinned per fixture
    q = {
        name: (seq_louvain(edges)[1], seq_louvain(edges, gate_mode="parity")[1])
        for name, edges in fixtures.items()
    }
    assert q["karate"][0] >= q["karate"][1] - 1e-12
    assert q["hub"][0] >= q["hub"][1] - 1e-12
    assert q["f28"][0] == pytest.approx(0.375, abs=1e-9)
    assert q["f28"][1] == pytest.approx(0.392219387755102, abs=1e-9)


def test_sql_superstep_matches_df(spark):
    """The one-statement SQL superstep (driver-floor hot path) is row-for-row
    identical to the DataFrame-built superstep at every step parity, from both
    singleton and mid-level states."""
    from pyspark.sql import functions as F

    from graftlouvain.operators.louvain import _superstep, _superstep_sql

    for edges in (FIXTURE_KARATE_W, fixture_hub()):
        g = LinkGraph.from_edges(to_df(spark, edges))
        state = singleton_assignments(g).join(
            g.degrees.select("id", F.col("degree").alias("k_i")), "id"
        )
        for step in (0, 1, 2):
            df_rows = sorted(
                (r["id"], r["community"], round(r["k_i"], 9), r["_moved"])
                for r in _superstep(g, state, step, 1e-12).collect()
            )
            sql_rows = sorted(
                (r["id"], r["community"], round(r["k_i"], 9), r["_moved"])
                for r in _superstep_sql(g, state, step, 1e-12).collect()
            )
            assert sql_rows == df_rows
            # advance the state through the DF path for the next parity
            state = spark.createDataFrame(
                [(i, c, k) for i, c, k, _ in df_rows],
                "id long, community long, k_i double",
            )


def test_sql_pair_matches_df_pair(spark):
    """The one-statement batched-pair SQL is row-for-row identical to
    composing two DataFrame supersteps, including the carried _moved0 flag."""
    from pyspark.sql import functions as F

    from graftlouvain.operators.louvain import _superstep, _superstep_pair_sql

    for edges in (FIXTURE_KARATE_W, fixture_hub()):
        g = LinkGraph.from_edges(to_df(spark, edges))
        state = singleton_assignments(g).join(
            g.degrees.select("id", F.col("degree").alias("k_i")), "id"
        )
        for step in (0, 1):
            s1 = _superstep(g, state, step, 1e-12).withColumnRenamed(
                "_moved", "_moved0"
            )
            s2 = _superstep(g, s1, step + 1, 1e-12, carry_cols=("_moved0",))
            key = lambda df: sorted(
                (r["id"], r["community"], round(r["k_i"], 9), r["_moved"], r["_moved0"])
                for r in df.collect()
            )
            assert key(_superstep_pair_sql(g, state, step, 1e-12)) == key(s2)


def test_superstep_tot_double_exec_diagnosis(spark):
    """SENTINEL for the accepted double execution of the superstep's
    community-totals aggregate (BENCH/BASELINE.md §7): ReuseExchange cannot
    dedupe the two ``tot`` broadcasts because the checkpointed state's
    RDDScanExec canonicalizes with UN-normalized partitioning expression ids
    (DeduplicateRelations clones every repeated state reference with fresh
    ids). This test pins that diagnosis: the two tot broadcast exchanges in
    one superstep plan must currently canonicalize UNEQUAL while printing
    textually identical trees. If a Spark upgrade makes this assertion fail,
    canonicalization has been fixed and the broadcast CAN now be reused —
    revisit _best_moves_fast and drop the accepted-double-execution note."""
    from graftlouvain.functions.iterate import materialize, superstep_planning
    from graftlouvain.operators.graph import LinkGraph
    from graftlouvain.operators.louvain import _superstep
    from pyspark.sql import functions as F

    g = LinkGraph.from_edges(to_df(spark, FIXTURE_28_W))
    asg = singleton_assignments(g).join(
        g.degrees.select("id", F.col("degree").alias("k_i")), "id"
    )
    with superstep_planning(spark):
        st = materialize(asg)
        out = _superstep(g, st, 0, 1e-12)
        sp = out._jdf.queryExecution().executedPlan()
    tot_bx = []

    def walk(node):
        if "BroadcastExchange" in node.getClass().getSimpleName():
            if "sum(k_i" in node.toString():
                tot_bx.append(node)
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(sp)
    assert len(tot_bx) == 2  # both references compile to their own broadcast
    a, b = tot_bx
    assert not a.sameResult(b)  # the documented canonicalization gap


def test_metrics_table(spark):
    g = LinkGraph.from_edges(to_df(spark, FIXTURE_W5))
    res = louvain(g)
    rows = res.metrics().collect()
    assert len(rows) == sum(s.supersteps for s in res.levels)
    assert sum(r["moves"] for r in rows) > 0
    assert all(r["wall_ms"] >= 0 for r in rows)


def test_salted_move_scores_identical(spark):
    """Skew salting of the superstep edge⋈assignment join is a pure
    re-bucketing: scores and full-level labels are identical with and
    without salting on the hub fixture."""
    from pyspark.sql import functions as F

    from graftlouvain.operators.louvain import move_scores

    g = LinkGraph.from_edges(to_df(spark, fixture_hub(n_blocks=4, block_size=8)))
    asg = singleton_assignments(g)
    plain = {
        (r["src"], r["nbr_comm"]): (r["k_ic"], round(r["score"], 9))
        for r in move_scores(g, asg, salt_buckets=1).collect()
    }
    salted = {
        (r["src"], r["nbr_comm"]): (r["k_ic"], round(r["score"], 9))
        for r in move_scores(g, asg, salt_buckets=8).collect()
    }
    assert salted == plain


def test_salted_level_labels_identical(spark, monkeypatch):
    """Force auto-salting on (threshold 0) — full-level labels unchanged."""
    import graftlouvain.operators.louvain as lv

    g = LinkGraph.from_edges(to_df(spark, fixture_hub(n_blocks=4, block_size=8)))
    want = _labels(louvain_level(g)[0])
    monkeypatch.setattr(lv, "SKEW_SALT_MIN_DEGREE", 0)
    monkeypatch.setattr(lv, "SKEW_SALT_RATIO", 0.0)
    got = _labels(louvain_level(g)[0])
    assert got == want


def test_level_preserves_non_graph_ids(spark):
    """Caller-supplied assignment rows whose id has no edge in the graph pass
    through a level unchanged (they can never be scored)."""
    from pyspark.sql import functions as F

    g = LinkGraph.from_edges(to_df(spark, FIXTURE_W5))
    asg = singleton_assignments(g).unionByName(
        spark.createDataFrame([(999, 7)], "id long, community long")
    )
    out, _ = louvain_level(g, assignments=asg)
    labels = _labels(out)
    assert labels[999] == 7
    assert set(labels) == set(_labels(asg))


def test_random_graphs_match_oracle(spark):
    """Property sweep: 6 seeded random weighted graphs (Erdős–Rényi-ish,
    12-24 vertices, integer weights 1-5, self-loops allowed) — FULL
    multi-level engine labels must equal the sequential oracle EXACTLY on
    every one. The four fixed fixtures pin known shapes; this sweep covers
    arbitrary sparse topologies (isolated-ish vertices, multi-components,
    ties) where gate/tie-break bugs would actually hide. Seeded stdlib
    randomness, not hypothesis: each case costs ~2-4 s of Spark jobs, so a
    shrinking search would time out while a fixed sweep stays deterministic
    and CI-sized."""
    import random as _random

    for seed in range(6):
        rng = _random.Random(1000 + seed)
        n = rng.randint(12, 24)
        edges = []
        for u in range(n):
            for v in range(u, n):
                p = 0.18 if u != v else 0.05
                if rng.random() < p:
                    edges.append((u, v, float(rng.randint(1, 5))))
        if not edges:
            continue
        g = LinkGraph.from_edges(to_df(spark, edges))
        result = louvain(g)
        want, q_want = seq_louvain(edges)
        assert _labels(result.assignments) == want, f"seed {seed}"
        assert result.modularity == pytest.approx(q_want, abs=1e-9), f"seed {seed}"


@pytest.mark.parametrize(
    "edges", [FIXTURE_W5, FIXTURE_28_W, FIXTURE_KARATE_W, fixture_hub()],
    ids=["w5", "fixture28", "karate", "hub"],
)
def test_conflict_apply_fused_equivalent(spark, edges):
    """The fused single-reference conflict gate (r5b: exploded data/marker
    relation + one window, `best` referenced ONCE) is byte-identical to the
    r5 join formulation (materialized `best` + distinct moved-set left
    join): same gate function, different physical shape only. Pinned at
    three granularities: (a) the raw gated relation from singleton AND
    mid-level states including the _moved flag, (b) full-level labels,
    (c) superstep count + per-superstep move sequence."""
    from pyspark.sql import functions as F

    from graftlouvain.operators.louvain import (
        _best_moves_fast,
        _conflict_apply,
        _conflict_apply_fused,
        _superstep_exprs,
        materialize,
    )

    g = LinkGraph.from_edges(to_df(spark, edges))
    x = _superstep_exprs(g.two_m, 1e-12)
    state = singleton_assignments(g).join(
        g.degrees.select("id", F.col("degree").alias("k_i")), "id"
    )

    def rows(df):
        return sorted(
            (r["id"], r["community"], round(r["k_i"], 9), r["_moved"])
            for r in df.collect()
        )

    # (a) raw relation equality from singleton, then from the state the
    # join form produces (a mid-level, partially-converged state)
    for _ in range(2):
        best = materialize(_best_moves_fast(g, state, g.two_m, exprs=x))
        joined = _conflict_apply(best, 1e-12)
        fused = _conflict_apply_fused(best, 1e-12)
        assert rows(fused) == rows(joined)
        state = joined.select("id", "community", "k_i")
        best.unpersist()

    # (b)+(c) the full level, fused loop vs join-fallback loop
    a1, s1 = louvain_level(g, conflict_fuse=True)
    a2, s2 = louvain_level(g, conflict_fuse=False)
    assert _labels(a1) == _labels(a2)
    assert s1.supersteps == s2.supersteps
    assert s1.moves == s2.moves

    # carry columns ride both gate forms identically (the API surface the
    # batched-pair parity path uses; conflict accepts them too)
    state_c = singleton_assignments(g).join(
        g.degrees.select("id", F.col("degree").alias("k_i")), "id"
    ).withColumn("_tag", F.col("id") % 3)
    best_c = materialize(
        _best_moves_fast(g, state_c, g.two_m, carry_cols=("_tag",), exprs=x)
    )
    rows_c = lambda df: sorted(
        (r["id"], r["community"], r["_moved"], r["_tag"]) for r in df.collect()
    )
    assert rows_c(_conflict_apply_fused(best_c, 1e-12, carry_cols=("_tag",))) == \
        rows_c(_conflict_apply(best_c, 1e-12, carry_cols=("_tag",)))
    best_c.unpersist()


def test_fused_conflict_superstep_plan_shape(spark):
    """Plan pin for the r5b fused conflict gate: the parity superstep plan
    stays exchange-FREE on the src-partitioned edge cache (the r2-r4 pinned
    property), and the fused conflict superstep adds EXACTLY ONE shuffle —
    the ≤2V-row data/marker window keyed on the community id — never an
    E-row exchange (the argmax aggregate rides the edge cache's src
    partitioning in both modes). If this count grows, the gate has started
    reshuffling edge-proportional data and the 100 TB story breaks."""
    from pyspark.sql import functions as F

    from graftlouvain.functions.iterate import materialize, superstep_planning
    from graftlouvain.operators.louvain import _superstep

    g = LinkGraph.from_edges(to_df(spark, FIXTURE_28_W))
    asg = singleton_assignments(g).join(
        g.degrees.select("id", F.col("degree").alias("k_i")), "id"
    )
    with superstep_planning(spark):
        st = materialize(asg)
        counts = {}
        for mode in ("parity", "conflict"):
            out = _superstep(g, st, 0, 1e-12, gate_mode=mode)
            sp = out._jdf.queryExecution().executedPlan()
            found = []

            def walk(node):
                if "ShuffleExchange" in node.getClass().getSimpleName():
                    found.append(node.toString().splitlines()[0])
                for i in range(node.children().size()):
                    walk(node.children().apply(i))

            walk(sp)
            counts[mode] = found
    assert counts["parity"] == []
    assert len(counts["conflict"]) == 1
    assert "key#" in counts["conflict"][0]  # the window's community-id key


@pytest.mark.parametrize(
    "edges", [FIXTURE_28_W, FIXTURE_KARATE_W, fixture_hub()],
    ids=["fixture28", "karate", "hub"],
)
def test_view_sql_conflict_superstep_equivalent(spark, edges):
    """r6: the production loop's temp-view SQL fast path (the whole fused
    conflict superstep as one spark.sql statement over views of the edge
    cache and the checkpointed state) is byte-identical to the DataFrame
    builder — the physical plan is operator-for-operator the same (verified
    at sf0.1: 11 Exchange / 4 BroadcastHashJoin / 1 Window in both), so this
    pins labels, superstep count, and the per-superstep move sequence across
    the two builders."""
    from graftlouvain.operators import louvain as L

    g = LinkGraph.from_edges(to_df(spark, edges))
    prev = L._USE_VIEW_SQL
    try:
        L._USE_VIEW_SQL = True
        a1, s1 = louvain_level(g)
        L._USE_VIEW_SQL = False
        a2, s2 = louvain_level(g)
    finally:
        L._USE_VIEW_SQL = prev
    assert _labels(a1) == _labels(a2)
    assert s1.supersteps == s2.supersteps
    assert s1.moves == s2.moves
