"""Skew-hostile corpus (round 12): the eighth hostile axis — KEY
DISTRIBUTION.

Earlier corpora planted ONE hot key (80% of events on one user); real
100 TB key distributions are ZIPFIAN — a whole head of hot keys plus a
long singleton tail.  ``make_adversarial_corpus.py --skew-hostile``
remaps every grouping/join key through the Zipf(1) inverse-CDF (driven
by a deterministic hash of the row identity, so the corpus is
reproducible byte-for-byte) and appends a dominant token to 70% of
documents (the token-frequency twin: the input that makes an
unfiltered token self-join quadratic).

The full-registry sweep over this corpus (BASELINE.md r12) passed
clean on the first run — 150 hash-green + 9 rows-only, 0 failures —
so unlike the seven earlier axes this one pins no once-broken queries;
it pins the corpus SHAPE (non-vacuousness), the prefix-filter's
absorption of the dominant token, and the AQE skew-join engagement
the 100 TB posture relies on.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from data_lake_staging_engine_spark.registry import registry
from data_lake_staging_engine_spark.testing import TESTDATA_TABLES, compare
from scripts.make_adversarial_corpus import build

_REG = registry()


@pytest.fixture(scope="module")
def skew_sf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("skew_hostile_sf"))
    build(d, "/root/testdata/sf0.001", skew_hostile=True)
    return d


@pytest.fixture(scope="module")
def skew_duck(skew_sf_dir):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{skew_sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_corpus_is_zipfian(skew_duck):
    """Non-vacuousness: the remapped keys really follow a Zipf(1) head
    (rank-0 share ~ ln2/ln(U+1), monotone head), and the dominant
    token really lands in 70% of documents."""
    q = skew_duck.execute

    def shares(table, key):
        rows = q(
            f"SELECT {key}, count(*) * 1.0 / sum(count(*)) OVER () "
            f"FROM {table} WHERE {key} IS NOT NULL "
            f"GROUP BY 1 ORDER BY 2 DESC LIMIT 5"
        ).fetchall()
        return [(k, float(s)) for k, s in rows]

    ev = shares("events", "user_id")
    # U = 15 users: rank-0 theory ln2/ln16 = 0.250; allow sampling slop
    assert 0.18 <= ev[0][1] <= 0.33, ev
    assert ev[0][0] == 0  # inverse-CDF sends the head to key 0
    # monotone head, and a head (not one mega-key): rank-1 is a real
    # second hot key, unlike the single-hot-key axis
    assert ev[0][1] > ev[1][1] > ev[2][1]
    assert ev[1][1] >= 0.08

    li = shares("lineitem", "l_orderkey")
    assert li[0][0] == 0 and li[0][1] >= 0.05

    dom = q(
        "SELECT sum(CASE WHEN text LIKE '% zipfcommon' THEN 1 ELSE 0 END), "
        "count(*) FROM documents"
    ).fetchone()
    assert dom[0] == 350 and dom[1] == 500


def test_dominant_token_never_enters_a_prefix(spark):
    """The prefix filter is the machinery that must absorb a dominant
    token ON THE OPEN-VOCABULARY PATH (where one high-DF token would
    otherwise contribute C(0.7N, 2) candidate pairs by itself): it
    ranks by ascending document frequency, so on a Zipfian vocabulary
    the dominant token is ordered LAST and never selected into any
    document's prefix.

    Note this pin needs a Zipfian (open) vocabulary: on the DENSE
    fixture corpus every base token has df 70-98%, so a 70%-df token
    is among the rarest and legitimately enters prefixes there — and
    the strategy probe routes that shape to the bitmap path anyway."""
    from data_lake_staging_engine_spark.operators.llmops import (
        _jaccard_pairs,
        _tokens,
    )
    from pyspark.sql import Window

    # 300 docs x 40 disjoint tokens (vocab ~12k: open, Zipf-tail-like
    # df=1) + ' zipfcommon' on 70% + one planted near-dup pair.
    rows = [
        (
            i,
            " ".join(f"t{j}" for j in range(40 * i, 40 * i + 40))
            + (" zipfcommon" if i % 10 < 7 else ""),
        )
        for i in range(300)
    ]
    rows.append((9999, " ".join(["zzz"] + [f"t{j}" for j in range(1, 40)])))
    d = spark.createDataFrame(rows, "doc_id long, text string")
    toks = _tokens(d)

    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        toks.join(freq, "tok")
        .withColumn(
            "rnk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "tok")
            ),
        )
        .join(sizes, "doc_id")
    )
    prefix_len = F.col("n") - F.ceil(F.lit(0.8) * F.col("n")) + 1
    pref = ranked.filter(F.col("rnk") <= prefix_len)
    assert pref.filter(F.col("tok") == "zipfcommon").count() == 0
    # sanity: the token IS dominant (210 of 301 docs)
    assert toks.filter(F.col("tok") == "zipfcommon").count() == 210
    # and the operator still finds exactly the planted pair on the
    # token-join path despite the dominant token
    got = {(r.d1, r.d2, r.jaccard) for r in _jaccard_pairs(toks, 0.8).collect()}
    assert got == {(0, 9999, round(39 / 42, 6))}


def test_aqe_skew_join_split_engages(spark, skew_sf_dir, skew_duck):
    """The 100 TB skew posture has TWO layers, pinned separately.

    (1) MEGA-KEY skew (one key owning almost everything): AQE's
    skew-join split is the protection, and this pins that the
    session's wiring actually engages it -- a sort-merge join whose
    build side puts ~91% of its mass on one key must show
    ``SortMergeJoin(skew=true)`` + ``AQEShuffleRead skewed`` in the
    final adaptive plan (thresholds scaled to fixture bytes;
    production defaults need 256 MB partitions), result unchanged.

    (2) ZIPFIAN skew (a HEAD of hot keys, rank-k mass ~ 1/k): probed
    on the corpus join and asserted NOT to trip the splitter -- the
    head key owns only ~5-25% of mass and co-hashes with other keys,
    so no partition stands out at factor 2.  Zipf's protection is
    even hashing across many moderately-hot keys (the full-registry
    sweep over this corpus runs flat -- BASELINE.md r12); the
    splitter exists for mega-keys, and knowing it does NOT fire on a
    zipf head is part of the posture."""
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "4KB",
        )
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
        # partition COALESCING merges the fixture's tiny partitions
        # before the skew detector sees them -- off for this probe
        conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        # force SMJ: a broadcast join has no partitions to split
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        # (1) mega-key: 400k of 440k rows on key 0
        big = spark.range(0, 440000).select(
            F.when(F.col("id") < 400000, F.lit(0))
            .otherwise((F.col("id") % 4000) + 1)
            .alias("k"),
            (F.col("id") * 7).alias("payload"),
        )
        dim = spark.range(0, 4001).select(
            F.col("id").alias("k"), F.lit("x").alias("v")
        )
        joined = big.join(dim, "k")
        # collect() executes THIS frame's queryExecution -- count()
        # would execute a derived aggregate and leave this plan
        # un-finalized (isFinalPlan=false shows no AQE rewrites).
        n = len(joined.collect())
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:300]
        assert "skew=true" in plan, plan[:2000]
        assert n == 440000

        # (2) zipfian corpus join: correct, and NOT split
        lineitem = spark.read.parquet(f"{skew_sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{skew_sf_dir}/orders.parquet")
        zj = lineitem.join(
            orders, lineitem.l_orderkey == orders.o_orderkey
        )
        zn = len(zj.collect())
        zplan = zj._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in zplan
        assert "skew=true" not in zplan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
    expect = skew_duck.execute(
        "SELECT count(*) FROM lineitem l JOIN orders o "
        "ON l.l_orderkey = o.o_orderkey"
    ).fetchone()[0]
    assert zn == expect


# Queries whose PLAN faces the skewed keys head-on: the windowed as-of
# join over zipfian user_id, the salted shapes built for exactly this,
# the hot-orderkey join fan-out, and the near-dup family against the
# dominant token.  The full registry is swept per-round (BASELINE.md
# r12: 159/159 clean); these pins keep the highest-exposure queries in
# the suite so a regression cannot hide between rounds.
SKEW_EXPOSED = [
    "b10_join_inner",
    "b18_join_asof",
    "b31_agg_salted_skew",
    "b35_join_salted_skew",
    "c10_win_sessionize",
    "g02_dedup_near",
    "g07_text_tfidf",
    "g11_events_user_join",
    "g16_event_funnel",
]


@pytest.mark.parametrize("name", SKEW_EXPOSED)
def test_skew_hostile_parity(name, spark, skew_sf_dir, skew_duck):
    rq = _REG[name]
    res = compare(name, rq.fn(spark, skew_sf_dir), skew_duck, rq.oracle)
    assert res.ok, f"{name} on skew-hostile corpus: {res.detail}"
