"""Corpus generation + edge extraction tests, incl. the per-row sha256
invariant (BASELINE.json input_hint) and checkpoint/resume."""

import hashlib

import pytest
from pyspark.sql import functions as F

from graftlouvain.operators.graph import LinkGraph
from graftlouvain.operators.louvain import louvain, louvain_level
from graftlouvain.sources.checkpoint import CheckpointManager
from graftlouvain.sources.corpus import generate_corpus
from graftlouvain.sources.edges import (
    cochange_edges,
    combined_edges,
    copath_edges,
    file_table,
    import_edges,
    pairs_by_key,
)

from tests.fixtures import FIXTURE_KARATE_W, to_df


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_corpus(
        spark, n_repos=4, files_per_repo=8, commits_per_repo=12, seed=42
    ).cache()


@pytest.fixture(scope="module")
def files(spark, corpus):
    return file_table(corpus).cache()


def test_corpus_deterministic(spark, corpus):
    again = generate_corpus(spark, n_repos=4, files_per_repo=8, commits_per_repo=12, seed=42)
    assert sorted(map(tuple, corpus.collect())) == sorted(map(tuple, again.collect()))


def test_sha256_invariant(spark, corpus, files):
    """F.sha2(content,256) must equal hashlib.sha256 per row and survive the
    id-mapping join (BASELINE.json:15)."""
    rows = files.select("repo", "path", "content", "content_sha").collect()
    assert len(rows) > 0
    for r in rows:
        assert r["content_sha"] == hashlib.sha256(r["content"].encode()).hexdigest()


def test_dense_file_ids(spark, files):
    ids = sorted(r["id"] for r in files.collect())
    assert ids == list(range(len(ids)))


def test_cochange_edges(spark, corpus, files):
    edges = cochange_edges(corpus, files).collect()
    assert len(edges) > 0
    # oracle: recompute co-change counts in pure Python
    fid = {(r["repo"], r["path"]): r["id"] for r in files.collect()}
    from collections import defaultdict
    by_commit = defaultdict(set)
    for r in corpus.collect():
        by_commit[r["commit"]].add(fid[(r["repo"], r["path"])])
    want = defaultdict(float)
    for members in by_commit.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                want[(a, b)] += 1.0
    got = {(r["src"], r["dst"]): r["weight"] for r in edges}
    assert got == dict(want)


def test_pairs_by_key_pandas_path_equal(spark, corpus, files):
    keyed = corpus.select("repo", "path", "commit").join(
        files.select("repo", "path", "id"), ["repo", "path"]
    )
    sql_path = pairs_by_key(keyed, "commit", use_pandas=False).collect()
    pd_path = pairs_by_key(keyed, "commit", use_pandas=True).collect()
    assert sorted(map(tuple, sql_path)) == sorted(map(tuple, pd_path))


def test_max_group_drops_giant_keys(spark):
    keyed = spark.createDataFrame(
        [("k1", i) for i in range(10)] + [("k2", 1), ("k2", 2)], "k string, id long"
    )
    out = pairs_by_key(keyed, "k", max_group=5)
    got = {(r["src"], r["dst"]) for r in out.collect()}
    assert got == {(1, 2)}  # k1 (size 10) dropped


def test_import_and_copath_edges(spark, corpus, files):
    imp = import_edges(files)
    assert imp.count() > 0
    assert imp.where("src = dst").count() == 0
    cp = copath_edges(files)
    # all basenames are unique per repo index in the generator, shared across repos
    assert cp.count() >= 0  # smoke: runs and conforms
    for df in (imp, cp):
        assert df.columns == ["src", "dst", "weight"]


def test_combined_edges_louvain_recovers_repos(spark, corpus, files):
    g = LinkGraph.from_edges(combined_edges(corpus, files))
    res = louvain(g)
    labels = {r["id"]: r["community"] for r in res.assignments.collect()}
    repo_of = {r["id"]: r["repo"] for r in files.select("id", "repo").collect()}
    # purity: dominant repo per community
    from collections import Counter, defaultdict
    members = defaultdict(list)
    for v, c in labels.items():
        members[c].append(repo_of[v])
    purity = sum(Counter(ms).most_common(1)[0][1] for ms in members.values()) / len(labels)
    assert purity >= 0.9


def test_checkpoint_resume_one_level(spark, tmp_path):
    """Kill after superstep k of level 0, resume through the PUBLIC louvain_level
    API (start_step + loaded assignments), final labels identical."""
    g = LinkGraph.from_edges(to_df(spark, FIXTURE_KARATE_W))
    full_asg, full_stats = louvain_level(g)
    want = {r["id"]: r["community"] for r in full_asg.collect()}

    ck = CheckpointManager(str(tmp_path / "ck"))
    # run only the first 2 supersteps, checkpointing each ("crash" after)
    partial_asg, _ = louvain_level(g, max_supersteps=2, checkpointer=ck)
    rec = ck.latest_superstep("louvain")
    assert rec is not None and rec["superstep"] == 1
    assert rec["lineage"] and sum(p["rows"] for p in rec["lineage"]) == 34

    resumed, _ = louvain_level(
        g,
        assignments=ck.load_assignments(spark, rec),
        start_step=rec["superstep"] + 1,
    )
    got = {r["id"]: r["community"] for r in resumed.collect()}
    assert got == want


def test_checkpoint_resume_full_louvain(spark, tmp_path):
    """Crash mid-run (manifest truncated to a committed superstep inside the
    LAST level), resume through the public ``louvain(..., resume=True)`` API —
    final labels byte-identical to the uninterrupted run."""
    import json

    g = LinkGraph.from_edges(to_df(spark, FIXTURE_KARATE_W))
    want_res = louvain(g)
    want = {r["id"]: r["community"] for r in want_res.assignments.collect()}

    ckdir = str(tmp_path / "ck")
    ck = CheckpointManager(ckdir)
    louvain(g, checkpointer=ck)
    records = ck.manifest()
    sup_levels = [r["level"] for r in records if r["kind"] == "superstep"]
    assert sup_levels, "expected superstep records"
    last_level = max(sup_levels)
    assert last_level >= 1, "fixture should coarsen through >= 2 levels"
    # simulate the crash: keep the manifest only up to the FIRST committed
    # superstep of the last level (all later lines never committed)
    cut = next(
        i for i, r in enumerate(records)
        if r["kind"] == "superstep" and r["level"] == last_level
    )
    with open(ck.manifest_path) as f:
        lines = [ln for ln in f if ln.strip()]
    with open(ck.manifest_path, "w") as f:
        f.writelines(lines[: cut + 1])

    res = louvain(g, checkpointer=CheckpointManager(ckdir), resume=True)
    got = {r["id"]: r["community"] for r in res.assignments.collect()}
    assert got == want
    assert abs(res.modularity - want_res.modularity) < 1e-12
    # the resumed run must have skipped the completed earlier levels
    assert res.levels[0].level == last_level


def test_checkpoint_resume_with_slack(spark, tmp_path):
    """Resume must also be byte-identical when the convergence slack is on:
    the streak is restored from the committed move counts, so a crash right
    after a slack-converged level cannot trigger extra real supersteps."""
    g = LinkGraph.from_edges(to_df(spark, FIXTURE_KARATE_W))
    frac = 0.1
    want_res = louvain(g, min_moves_frac=frac)
    want = {r["id"]: r["community"] for r in want_res.assignments.collect()}

    ckdir = str(tmp_path / "ck")
    louvain(g, min_moves_frac=frac, checkpointer=CheckpointManager(ckdir))
    ck = CheckpointManager(ckdir)
    records = ck.manifest()
    # truncate right after the LAST superstep record of level 0 — the worst
    # case: the level just (slack-)converged, nothing of level 1 committed
    cut = max(
        i for i, r in enumerate(records)
        if r["kind"] == "superstep" and r["level"] == 0
    )
    with open(ck.manifest_path) as f:
        lines = [ln for ln in f if ln.strip()]
    with open(ck.manifest_path, "w") as f:
        f.writelines(lines[: cut + 1])

    res = louvain(
        g, min_moves_frac=frac, checkpointer=CheckpointManager(ckdir), resume=True
    )
    got = {r["id"]: r["community"] for r in res.assignments.collect()}
    assert got == want
