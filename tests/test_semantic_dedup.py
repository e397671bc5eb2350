"""g28 semantic-dedup invariants: structural correctness of the
cluster/representative output plus co-cluster recall against the exact
g03d anchor pairs (the same exact-vs-approx pattern as
test_ann_recall.py — measured 4/6 = 0.667 at sf0.01 with k=16,
nassign=2, re-measured 2026-08-14; everything is deterministic so this
is an exact constant at this fixture SF).  Floor 0.6 = measured minus
one anchor pair of margin (VERDICT r06 #6): losing even ONE of the six
co-cluster hits (3/6 = 0.5) fails loudly instead of riding the old
0.5 slack floor."""

from data_lake_staging_engine_spark.registry import registry
from data_lake_staging_engine_spark.sources import load

_REG = registry()


def test_g28_cluster_structure(spark, sf_dir):
    rows = _REG["g28_semantic_dedup"].fn(spark, sf_dir).collect()
    n_vecs = load(spark, sf_dir, "embeddings").count()
    # Every vector appears exactly once.
    assert len(rows) == n_vecs
    assert len({r.vec_id for r in rows}) == n_vecs
    by_cluster = {}
    for r in rows:
        # Min-label: the representative is the component minimum.
        assert r.cluster_id <= r.vec_id
        assert r.is_kept == (1 if r.vec_id == r.cluster_id else 0)
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert sum(m.is_kept for m in members) == 1
        assert min(m.vec_id for m in members) == cid


def test_g28_co_cluster_recall_vs_exact(spark, sf_dir):
    cluster = {
        r.vec_id: r.cluster_id
        for r in _REG["g28_semantic_dedup"].fn(spark, sf_dir).collect()
    }
    exact = _REG["g03d_embed_neardup"].fn(spark, sf_dir).collect()
    pairs = [(r.d1, r.d2) for r in exact]
    assert pairs  # anchor set must not silently go empty
    hits = sum(1 for a, b in pairs if cluster[a] == cluster[b])
    assert hits / len(pairs) >= 0.6, (hits, len(pairs))
