"""The engine's four INPUT CONTRACTS, packaged as one staging checkpoint.

Round 9's four hostile corpora (adversarial/skew, time-hostile,
null-keys, duplicate-identity — scripts/make_adversarial_corpus.py)
established that the engine's 159 operators are correct GIVEN four
properties of ingested data, and measured exactly what breaks when each
is violated:

1. **Finite measures** — measure columns feeding decimal money sums,
   pandas folds, or cross-engine hash oracles must be finite (NULL is
   the portable "missing"; NaN/±Inf are not).  22/159 queries failed a
   non-finite probe: CAST(Infinity AS DECIMAL) throws under ANSI on
   both engines, pandas conflates NaN with NULL inside every
   pandas-UDF query, and NaN comparison semantics differ between
   pandas and SQL.
2. **Event-time validity** — Structured Streaming's watermark starts
   at epoch 0, so epoch-adjacent rows are born late (silently dropped
   from e08: spark=47 vs oracle=75), and ONE corrupt far-future clock
   drags the watermark centuries ahead, killing every later sane row.
3. **Non-NULL join keys** — window-emulated joins (b18's as-of) would
   group all NULL keys into one partition and match them to each
   other, where JOIN equality matches nothing (spark=200 vs
   oracle=182 on the null-key corpus).
4. **Unique identity keys** — keyed streaming dedup (e05/e11) keeps
   the FIRST arrival per key; same-id rows with different payloads
   survive or die by arrival order (157/159 on the duplicate-key
   corpus, both failures contract-bound).  Keep-latest normalization
   at ingest (a07/g30's rule) makes the downstream answer
   order-independent.

Until round 10 these checks lived inside individual operators
(quarantine_nonfinite in staging, the validity gate in e08/e12, the
null-key filter in b18, keep-latest in a07/g30).  This module packages
them as one reusable ``validate_ingest`` checkpoint — run it where a
deployment lands data, route the rejected frames to an audit sink, and
every downstream operator sees contract-clean input (VERDICT r09 #3;
the DEPLOYMENT.md "Input contracts" section is the operator-facing
recipe).

Scale posture: checks 1-3 are narrow codegen filters on the scan — the
clean path composes into a SINGLE filtered scan with no shuffle, and
each rejected frame is an independent filtered projection of the same
scan (materialize them only when auditing).  Check 4 is one shuffle on
the identity key — the same CDC-compaction shape as a07, unavoidable
by semantics.  Nothing here collects to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# Contract 2 config: the event-time validity window.  Module-level and
# overridable per call (ADVICE r09: the bounds were an unparameterized
# magic constant baked into e08/e12).  The defaults bound the plausible
# business-event era for the fixture domain; a deployment sets its own
# (e.g. service launch date .. now + clock-skew allowance).  The
# streaming queries and their DuckDB oracles both derive from THESE
# constants via ONE import-time snapshot (streaming/queries.py), so
# the two engines cannot de-synchronize; retune the bounds BEFORE
# importing streaming.queries (a post-import override affects neither
# side there — by design, ADVICE r10).
EVENT_TIME_VALID_LO = "2000-01-01 00:00:00"
EVENT_TIME_VALID_HI = "2100-01-01 00:00:00"


def event_time_validity_sql(
    ts_col: str = "ts", lo: str | None = None, hi: str | None = None
) -> str:
    """The oracle-side (ANSI SQL) mirror of :func:`event_time_predicate`."""
    lo = lo or EVENT_TIME_VALID_LO
    hi = hi or EVENT_TIME_VALID_HI
    return f"{ts_col} >= TIMESTAMP '{lo}' AND {ts_col} < TIMESTAMP '{hi}'"


def event_time_predicate(
    ts_col: str = "ts", lo: str | None = None, hi: str | None = None
) -> Column:
    lo = lo or EVENT_TIME_VALID_LO
    hi = hi or EVENT_TIME_VALID_HI
    c = F.col(ts_col)
    return (c >= F.lit(lo).cast("timestamp")) & (c < F.lit(hi).cast("timestamp"))


def gate_event_time(
    df: DataFrame,
    ts_col: str = "ts",
    lo: str | None = None,
    hi: str | None = None,
    observe_name: str | None = None,
) -> DataFrame:
    """Keep only rows inside the validity window.

    Works on batch AND streaming DataFrames — for the watermark
    consumers (e08/e12) the gate must sit BELOW ``withWatermark`` in
    the chain so EventTimeWatermark only ever sees gated rows.

    With ``observe_name``, a CollectMetrics node is attached BEFORE the
    filter so the drop is measurable instead of silent (ADVICE r09):
    batch readers pull ``rows_seen``/``rows_gated`` from
    ``df.sparkSession`` query-execution listeners or ``Observation``;
    streaming readers get them per micro-batch in
    ``StreamingQueryProgress.observedMetrics[observe_name]``.  The
    metrics pass is map-side only — no extra scan or shuffle.
    """
    pred = event_time_predicate(ts_col, lo, hi)
    if observe_name is not None:
        df = df.observe(
            observe_name,
            F.count(F.lit(1)).alias("rows_seen"),
            F.sum(
                F.when(~F.coalesce(pred, F.lit(False)), 1).otherwise(0)
            ).alias("rows_gated"),
        )
    return df.filter(pred)


def split_event_time(
    df: DataFrame,
    ts_col: str = "ts",
    lo: str | None = None,
    hi: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(clean, rejected) split on the validity window — the audit-sink
    form of :func:`gate_event_time`.  A NULL event time is REJECTED:
    every consumer of this contract orders or watermarks by it."""
    pred = F.coalesce(event_time_predicate(ts_col, lo, hi), F.lit(False))
    return df.filter(pred), df.filter(~pred)


# --------------------------------------------------------------------------
# Contract 1: finite measures.


def quarantine_nonfinite(
    df: DataFrame, *cols: str, max_abs: float | None = None
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) split on non-finite doubles — the ingest
    guard behind the engine's FINITE-MEASURE input contract.

    ``max_abs`` (round-11 numeric-hostile extension) additionally
    quarantines FINITE values whose magnitude exceeds the measure's
    domain: a perfectly finite 1e300 passes the NaN/Inf check and then
    kills every decimal money cast downstream —
    ``CAST(1e300 AS DECIMAL(18,2))`` throws NUMERIC_VALUE_OUT_OF_RANGE
    under ANSI on Spark AND raises a ConversionException in DuckDB
    (the round-11 numeric-hostile corpus measured 29/159 queries
    crashing in exactly this class; BASELINE.md).  For DECIMAL(18,2)
    money columns, ``max_abs=1e12`` leaves sums four orders of
    magnitude of headroom inside the widened DECIMAL(28,2) sum type
    even at 100 TB row counts.  Default None preserves the pure
    finiteness check.

    Measure columns that feed decimal money sums, pandas folds, or
    cross-engine hash oracles must be finite: CAST(Infinity AS
    DECIMAL) THROWS on both Spark (ANSI) and DuckDB, pandas CONFLATES
    NaN with NULL inside every pandas-UDF query (dropna() removes
    both, so NaN silently becomes "missing" on one engine only), and
    NaN comparison semantics differ between pandas (NaN > x is false)
    and both SQL engines (NaN sorts greatest) — a round-9 non-finite
    probe measured 22 of 159 queries failing in exactly these three
    classes. A NULL is the portable representation of "missing"; NaN
    and +/-Inf are not.

    The split is one narrow codegen filter per side (a row lands in
    ``quarantined`` if ANY listed column is non-finite; NULLs are
    clean — they are the contract's missing-value form). Quarantined
    rows keep all columns for the a14-style audit sink. At 100 TB
    both sides stay partition-parallel projections of the scan."""
    if not cols:
        # A zero-column call would otherwise surface as an opaque
        # IndexError below; callers who meant "check nothing" should
        # not be routing rows through a quarantine at all (ADVICE r10).
        raise ValueError(
            "quarantine_nonfinite requires at least one measure column"
        )
    checks = [
        F.isnan(F.col(c)) | F.col(c).isin(float("inf"), float("-inf"))
        for c in cols
    ]
    if max_abs is not None:
        checks += [F.abs(F.col(c)) > F.lit(max_abs) for c in cols]
    bad = checks[0]
    for c in checks[1:]:
        bad = bad | c
    # NULL-safe: isnan(NULL)/IN over NULL yield NULL => treat as clean
    bad = F.coalesce(bad, F.lit(False))
    return df.filter(~bad), df.filter(bad)


def quarantine_nonfinite_vectors(
    df: DataFrame, *cols: str, max_abs: float | None = None
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) split on non-finite VECTOR components —
    the array-column form of :func:`quarantine_nonfinite`.

    A failed encoder batch emits zero-norm vectors (round-9 finding,
    handled in-operator by the similarity family's try_divide /
    unindexable-exclusion) but also NaN/Inf COMPONENTS — and those are
    not handled in-operator: the round-10 probe crashed g13 (k-means)
    with ARITHMETIC_OVERFLOW, because a non-finite coordinate turns
    the inertia sum non-finite and the cross-engine cents rounding's
    double->long conversion throws under ANSI.  The similarity
    queries survive execution but their NaN cosines poison rankings
    silently, which is worse.  A NULL vector (missing embedding) is
    CLEAN — it is the contract's missing-value form, excluded by each
    consumer's isNotNull guard.

    ``max_abs`` mirrors :func:`quarantine_nonfinite`'s round-11
    domain bound for components: a finite 1e300 coordinate drives the
    inertia/cents arithmetic into the same overflow class as Inf.

    One codegen EXISTS probe per listed array column; map-only at any
    scale."""
    if not cols:
        # Same guard as the scalar twin (ADVICE r10): a dynamically
        # built empty column list must fail loudly, not silently
        # validate nothing.
        raise ValueError(
            "quarantine_nonfinite_vectors requires at least one vector column"
        )
    # The component bound: with a domain set, |x| > bound subsumes the
    # infinity check.  NOTE the predicate lambdas must stay ONE-arg —
    # pyspark passes (element, index) to two-arg higher-order-function
    # lambdas, so a default-arg closure would receive the index column.
    bound = F.lit(float("inf")) if max_abs is None else F.lit(float(max_abs))
    strict = max_abs is not None

    def _pred(x):
        mag = F.abs(x) > bound if strict else F.abs(x) == bound
        return F.isnan(x) | mag

    bad = F.lit(False)
    for c in cols:
        nonfinite = F.exists(F.col(c), _pred)
        bad = bad | F.coalesce(nonfinite, F.lit(False))
    return df.filter(~bad), df.filter(bad)


# --------------------------------------------------------------------------
# Contract 3: non-NULL join keys.


def split_null_keys(
    df: DataFrame, *key_cols: str
) -> tuple[DataFrame, DataFrame]:
    """(clean, rejected) split on NULL join keys.

    JOIN equality matches nothing on NULL, but the window-emulated
    joins (b18's as-of; any ``last(...) OVER (PARTITION BY key)``
    technique) would happily group all NULL keys into one partition
    and match them to each other — the round-9 null-key corpus read
    spark=200 vs oracle=182 on b18 before its in-operator filter.
    Rejecting NULL-keyed rows at ingest makes every downstream join
    form (hash, broadcast, window-emulated) agree."""
    bad = F.lit(False)
    for c in key_cols:
        bad = bad | F.col(c).isNull()
    return df.filter(~bad), df.filter(bad)


# --------------------------------------------------------------------------
# Contract 4: unique identity keys (keep-latest normalization).


def normalize_identity(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> tuple[DataFrame, DataFrame]:
    """(latest, superseded) keep-latest split per identity key.

    ``order_cols`` rank recency DESCENDING, most-significant first —
    pass a tiebreaker (e.g. ``("ts", "event_id")``) so the pick is
    total and deterministic, the same rule a07/g30 apply.  Keyed
    streaming dedup (e05/e11) keeps the FIRST arrival per key, so
    same-id rows with different payloads are arrival-order-dependent
    BY SEMANTICS; normalizing at ingest is what makes the downstream
    answer order-independent (the round-9 duplicate-identity probe's
    conclusion).  One shuffle on the key — the a07 CDC-compaction
    shape; at 100 TB size ``spark.sql.shuffle.partitions`` to the
    key-space, and pre-bucket the landing table by the identity key to
    make the shuffle a local sort."""
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.desc(c) for c in order_cols]
    )
    ranked = df.withColumn("_ic_rn", F.row_number().over(w))
    latest = ranked.filter(F.col("_ic_rn") == 1).drop("_ic_rn")
    superseded = ranked.filter(F.col("_ic_rn") > 1).drop("_ic_rn")
    return latest, superseded


# --------------------------------------------------------------------------
# The composed checkpoint.


@dataclass
class IngestReport:
    """Result of :func:`validate_ingest`.

    ``clean`` satisfies every enabled contract; the four rejected
    frames are disjoint (first failing check claims the row) and all
    five are LAZY filtered projections of the input — materializing
    ``clean`` costs one scan (plus one shuffle when identity
    normalization is enabled); materialize the rejects only when
    routing them to an audit sink."""

    clean: DataFrame
    nonfinite: DataFrame | None = None
    nonfinite_vector: DataFrame | None = None
    out_of_time: DataFrame | None = None
    null_keys: DataFrame | None = None
    superseded: DataFrame | None = None
    enabled: tuple[str, ...] = field(default=())

    def rejects(self) -> dict[str, DataFrame]:
        out = {}
        for reason in (
            "nonfinite",
            "nonfinite_vector",
            "out_of_time",
            "null_keys",
            "superseded",
        ):
            frame = getattr(self, reason)
            if frame is not None:
                out[reason] = frame
        return out

    def reject_counts(self) -> dict[str, int]:
        """Audit convenience — triggers one count job per enabled
        reject frame; don't call it on the hot path."""
        return {k: v.count() for k, v in self.rejects().items()}


def validate_ingest(
    df: DataFrame,
    *,
    finite_measures: Sequence[str] = (),
    measure_max_abs: float | None = None,
    finite_vectors: Sequence[str] = (),
    vector_max_abs: float | None = None,
    event_time_col: str | None = None,
    valid_lo: str | None = None,
    valid_hi: str | None = None,
    join_keys: Sequence[str] = (),
    identity_keys: Sequence[str] = (),
    identity_order: Sequence[str] = (),
) -> IngestReport:
    """Run every ENABLED input contract over a landing batch.

    Each check is individually togglable by its parameter: pass
    ``finite_measures`` to quarantine non-finite measures
    (``measure_max_abs`` additionally bounds finite magnitudes — the
    round-11 numeric-hostile class where a finite 1e300 kills every
    decimal money cast on both engines; 1e12 is the recommended bound
    for DECIMAL(18,2) money columns),
    ``finite_vectors`` to quarantine non-finite VECTOR components
    (array columns — the g13-crash class; ``vector_max_abs`` is the
    component-wise domain bound),
    ``event_time_col`` to gate the validity window (bounds default to
    the module config), ``join_keys`` to reject NULL join keys, and
    ``identity_keys`` + ``identity_order`` to keep-latest-normalize
    duplicate identities.  Checks apply in that order and each runs on
    the PREVIOUS check's clean frame, so the reject frames are
    disjoint and ``clean`` is the intersection.

    The four hostile corpus modes map 1:1 onto the checks; the test
    (tests/test_contracts.py) drives each mode through here and proves
    the previously-failing operators run hash-green on ``clean``.
    """
    # A bound without its column list would silently check NOTHING —
    # the same silent-no-op class the zero-column ValueError in
    # quarantine_nonfinite exists to prevent (ADVICE r11).
    if measure_max_abs is not None and not finite_measures:
        raise ValueError(
            "measure_max_abs is set but finite_measures is empty — the "
            "bound applies per listed measure column, so this call "
            "would validate nothing; list the columns to bound"
        )
    if vector_max_abs is not None and not finite_vectors:
        raise ValueError(
            "vector_max_abs is set but finite_vectors is empty — the "
            "bound applies per listed vector column, so this call "
            "would validate nothing; list the columns to bound"
        )

    enabled: list[str] = []
    clean = df
    nonfinite = nonfinite_vector = None
    out_of_time = null_keys = superseded = None

    if finite_measures:
        clean, nonfinite = quarantine_nonfinite(
            clean, *finite_measures, max_abs=measure_max_abs
        )
        enabled.append("nonfinite")
    if finite_vectors:
        clean, nonfinite_vector = quarantine_nonfinite_vectors(
            clean, *finite_vectors, max_abs=vector_max_abs
        )
        enabled.append("nonfinite_vector")
    if event_time_col is not None:
        clean, out_of_time = split_event_time(
            clean, event_time_col, valid_lo, valid_hi
        )
        enabled.append("out_of_time")
    if join_keys:
        clean, null_keys = split_null_keys(clean, *join_keys)
        enabled.append("null_keys")
    if identity_keys:
        if not identity_order:
            raise ValueError(
                "identity_keys requires identity_order (the recency rank, "
                "most-significant first, with a unique tiebreaker)"
            )
        clean, superseded = normalize_identity(
            clean, identity_keys, identity_order
        )
        enabled.append("superseded")

    return IngestReport(
        clean=clean,
        nonfinite=nonfinite,
        nonfinite_vector=nonfinite_vector,
        out_of_time=out_of_time,
        null_keys=null_keys,
        superseded=superseded,
        enabled=tuple(enabled),
    )


# --------------------------------------------------------------------------
# Per-table DEFAULT domain policy (VERDICT r11 #5): the recommended
# validate_ingest kwargs for each fixture-domain landing table, so the
# measure-domain contract is reachable from the default pipeline
# config — ``StagingPipeline(..., contracts=default_contracts("events"),
# rejects_dir=...)`` — instead of every deployment hand-assembling the
# kwargs (and, round-11's lesson, forgetting the magnitude bound until
# a finite 1e300 kills the decimal money cast 29 queries downstream).
#
# Bounds rationale:
# - money/measure columns feed DECIMAL(18,2) sums => 1e12 leaves six
#   orders of magnitude of SUM headroom below the 1e16 integral-digit
#   ceiling (the round-11 numeric-hostile remediation bound);
# - embedding components are unit-scale by construction => 1e6 is
#   generous for any normalized or quantized vector while still
#   rejecting the overflow-scale garbage that breaks distance math;
# - event time uses the module validity window (EVENT_TIME_VALID_*)
#   where the table's domain matches it (events); orders carries its
#   own TPC-H-era window — a per-table policy exists precisely so the
#   window is the TABLE's domain, not one global constant;
# - join keys listed are the ones downstream window-emulated joins
#   group by (NULLs would co-partition and self-match, contract 3).
#
# Identity keep-latest normalization is deliberately NOT in the
# defaults: it is per-micro-batch at the checkpoint (one batch at a
# time), so it only equals the global rule when redeliveries of a key
# land in one batch — deployments opt in per-table with their recency
# order (see tests/test_contracts_pipeline_e2e.py identities case).
DOMAIN_POLICIES: dict[str, dict] = {
    "events": {
        "finite_measures": ("value",),
        "measure_max_abs": 1e12,
        "event_time_col": "ts",
        "join_keys": ("user_id",),
    },
    "embeddings": {
        "finite_vectors": ("embedding",),
        "vector_max_abs": 1e6,
    },
    "lineitem": {
        "finite_measures": (
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        ),
        "measure_max_abs": 1e12,
        "join_keys": ("l_orderkey", "l_partkey", "l_suppkey"),
    },
    "orders": {
        "finite_measures": ("o_totalprice",),
        "measure_max_abs": 1e12,
        "event_time_col": "o_orderdate",
        # Order dates span the fixture's 1995-01 .. 2001-08 (TPC-H-ish
        # synthetic; stock TPC-H is 1992-07 .. 1998-08) — the module
        # default window starts at 2000 and would reject most of the
        # table, so the policy carries the order-domain window.
        "valid_lo": "1992-01-01 00:00:00",
        "valid_hi": "2005-01-01 00:00:00",
        "join_keys": ("o_custkey",),
    },
}


def default_contracts(table: str) -> dict:
    """A fresh copy of the table's default domain policy, ready to pass
    as ``StagingPipeline(contracts=...)`` or ``validate_ingest(**...)``.
    Raises KeyError (with the known tables) for an unlisted table —
    silently returning ``{}`` would be the no-contract no-op this
    module exists to prevent."""
    if table not in DOMAIN_POLICIES:
        raise KeyError(
            f"no default domain policy for table {table!r}; known: "
            f"{sorted(DOMAIN_POLICIES)} — pass explicit validate_ingest "
            "kwargs for other tables"
        )
    return {k: v for k, v in DOMAIN_POLICIES[table].items()}
