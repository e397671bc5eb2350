"""ANN quality measurement (VERDICT r01 next-round #4): the approximate
similarity paths (g03c multi-table hyperplane LSH, g03e IVF nprobe=3)
must carry DOCUMENTED recall against the exact anchors — g03d-style
exact cosine pairs and g03b exact top-5.

Everything here is deterministic (seeded hash hyperplanes, no RNG), so
the measured recalls are exact constants at this fixture SF; the floors
sit just below the measured values to catch regressions:

- g03c vs exact pairs cos>=0.4: measured 0.2712 at sf0.01. Theory for
  4 tables x 6 planes: P[collide] = 1-(1-p^6)^4, p = 1-theta/pi, which
  is ~0.23 at cos exactly 0.4 (the fixture anchor pairs sit just above
  the threshold — there is no true near-dup cluster in the synthetic
  embeddings) and ~0.87 at cos 0.9, the regime real near-dup detection
  targets.
- g03e recall@5 vs exact g03b top-5: measured 0.50 mean at sf0.01 with
  nprobe=3 over the 10 label-derived lists (labels are only weakly
  geometric in the fixture, so this is the honest ceiling's
  neighborhood; a real k-means codebook raises it).
"""

from pyspark.sql import functions as F

from data_lake_staging_engine_spark.operators.llmops import _dot
from data_lake_staging_engine_spark.registry import registry
from data_lake_staging_engine_spark.sources import load

_REG = registry()


def _exact_pairs(spark, sf_dir, threshold):
    e = load(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        "embedding",
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("norm"),
    )
    a, b = v.alias("a"), v.alias("b")
    cos = F.col("dot") / (F.col("a.norm") * F.col("b.norm"))
    return {
        (r.d1, r.d2)
        for r in (
            a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
            .withColumn("dot", _dot(F.col("a.embedding"), F.col("b.embedding")))
            .filter(cos >= threshold)
            .select(F.col("a.vec_id").alias("d1"), F.col("b.vec_id").alias("d2"))
            .collect()
        )
    }


def test_lsh_recall_vs_exact_anchor(spark, sf_dir):
    exact = _exact_pairs(spark, sf_dir, 0.4)
    assert len(exact) > 0
    lsh = _REG["g03c_simsearch_lsh"].fn(spark, sf_dir)
    got = {(min(r.qid, r.cid), max(r.qid, r.cid)) for r in lsh.collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.20, f"g03c recall vs cos>=0.4 anchor fell to {recall:.4f}"


def test_ivf_recall_at_5_vs_exact_knn(spark, sf_dir):
    knn = _REG["g03b_simsearch_knn"].fn(spark, sf_dir)
    ivf = _REG["g03e_simsearch_ivf"].fn(spark, sf_dir)
    exact_top, ivf_top = {}, {}
    for r in knn.collect():
        exact_top.setdefault(r.qid, set()).add(r.cid)
    for r in ivf.collect():
        ivf_top.setdefault(r.qid, set()).add(r.cid)
    recalls = [
        len(ivf_top.get(q, set()) & s) / len(s) for q, s in exact_top.items()
    ]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.40, f"g03e recall@5 fell to {mean_recall:.4f}"
