#!/usr/bin/env python
"""Build the ADVERSARIAL corpus: the skew/duplicate/degenerate sibling
of the round-9 empty-corpus audit (tests/test_empty_input.py).

A 100 TB corpus is never as polite as the synthetic fixture: real data
has a hot key that owns 80% of a day's events, a crawler bug that
ingested the same boilerplate page 300 times, zero-norm embeddings
from a failed encoder batch, empty and whitespace-only documents,
100%-discount line items, and timestamp tie storms from a
second-granularity upstream clock. This script derives exactly that
shape from sf0.001 by DETERMINISTIC key-driven rewrites (pure
functions of the row keys — no RNG, so the corpus is reproducible
byte-for-byte) and writes single-file parquet tables with the exact
fixture schemas, so ``scripts/parity_sweep.py <out_dir>`` runs the
full 159-query registry with DuckDB oracles over it unchanged.

Injected shapes, per table:

- documents: ~60% one duplicated text (DUP_A), ~20% a near-duplicate
  of it (DUP_B, 2 words edited => token-Jaccard ~0.9 — crosses every
  near-dup threshold, so the dedup family faces ONE giant cluster);
  plus empty-string, whitespace-only, single-repeated-char, NULL,
  non-ASCII (multi-byte — chars != bytes), and ~96k-char/~15k-token
  giant-document classes; lang/source skewed to one value; n_chars
  kept consistent with the rewritten text.
- embeddings: every 25th vector all-zero (zero norm — cosine's
  division hazard), 40% one identical constant vector (exact-dup
  storm), labels skewed to one class.
- events: 80% of rows on one hot user, 70% one event_type, 30%
  identical timestamp (tie storm for windows/asof/sessionize), 20%
  NULL value, some 0.0 values, a malformed-JSON and an empty-JSON
  props row class, and ONE user (3 — also a customer key) whose
  every event is NULL-valued (the SQL-SUM-is-NULL shape).
- orders: 80% on one hot customer, 50% identical order date, some
  0.0 and some 1e9 total prices.
- lineitem: 60% on one hot order key (join fan-out skew), zero
  quantities/prices, 0%- and 100%-discount rows, 50% identical
  shipdate.
- customer: 80% one market segment, zero and negative balances.
- region/nation/supplier/part: copied unchanged (small dims).

Usage:  python scripts/make_adversarial_corpus.py [out_dir] [src_dir]
        (defaults: /tmp/adversarial_sf  /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

import duckdb

DUP_A = (
    "the quick data pipeline scans every parquet table and merges the "
    "sorted batches into one clean partition for the downstream join"
)
# Two words edited vs DUP_A -> token Jaccard ~0.9: a NEAR duplicate.
DUP_B = (
    "the quick data pipeline scans every parquet table and merges the "
    "sorted batches into one tidy bucket for the downstream join"
)
# Non-ASCII text: multi-byte UTF-8 (accents, CJK, an astral-plane
# emoji), a double space, and a tab-adjacent token — chars != bytes,
# so any byte-counting or ASCII-only assumption in the text ops (or
# their oracles) mismatches here.
UNICODE_DOC = (
    "café straße über 中文 数据 管道 🎉 emoji  double space café naïve"
)

# Deterministic non-trivial 64-dim constant vector (exact-dup storm).
CONST_VEC = [round(((i * 7) % 13) / 13.0 - 0.3, 6) for i in range(64)]

TRANSFORMS = {
    "documents": f"""
        WITH rewritten AS (
          SELECT doc_id,
            CASE
              WHEN doc_id % 50 = 49 THEN NULL
              WHEN doc_id % 50 = 24 THEN '{UNICODE_DOC}'
              WHEN doc_id % 50 = 34
                THEN rtrim(repeat('lorem data pipeline spark token ', 3000))
              WHEN doc_id % 10 <= 5 THEN '{DUP_A}'
              WHEN doc_id % 10 IN (6, 7) THEN '{DUP_B}'
              WHEN doc_id % 30 = 8 THEN ''
              WHEN doc_id % 30 = 18 THEN '     '
              WHEN doc_id % 30 = 28 THEN repeat('a', 40)
              ELSE text
            END AS text,
            CASE WHEN doc_id % 25 = 0 THEN lang ELSE 'en' END AS lang,
            CASE WHEN doc_id % 10 < 8 THEN 'src0' ELSE source END AS source
          FROM src
        )
        SELECT doc_id, text, lang, source,
               length(text)::BIGINT AS n_chars
        FROM rewritten
    """,
    "embeddings": f"""
        SELECT vec_id,
          CASE
            WHEN vec_id % 25 = 0
              THEN list_transform(embedding, x -> 0.0::FLOAT)
            WHEN vec_id % 10 BETWEEN 1 AND 4
              THEN {CONST_VEC}::FLOAT[]
            ELSE embedding
          END AS embedding,
          CASE WHEN vec_id % 10 < 8 THEN 3::INTEGER ELSE label END AS label
        FROM src
    """,
    "events": """
        SELECT event_id,
          CASE WHEN event_id % 10 < 3
               THEN TIMESTAMP '2024-01-15 12:00:00' ELSE ts END AS ts,
          CASE WHEN event_id % 10 < 8 THEN 7::BIGINT ELSE user_id
               END AS user_id,
          CASE WHEN event_id % 10 < 7 THEN 'click' ELSE event_type
               END AS event_type,
          CASE WHEN event_id % 10 >= 8 AND user_id = 3 THEN NULL
               WHEN event_id % 5 = 0 THEN NULL
               WHEN event_id % 17 = 1 THEN 0.0
               ELSE value END AS value,
          CASE WHEN event_id % 40 = 13 THEN 'not json'
               WHEN event_id % 40 = 27 THEN '{}'
               ELSE props END AS props
        FROM src
    """,
    "orders": """
        SELECT o_orderkey,
          CASE WHEN o_orderkey % 10 < 8 THEN 7::BIGINT ELSE o_custkey
               END AS o_custkey,
          o_orderstatus,
          CASE WHEN o_orderkey % 13 = 0 THEN 0.0
               WHEN o_orderkey % 13 = 1 THEN 1000000000.0
               ELSE o_totalprice END AS o_totalprice,
          CASE WHEN o_orderkey % 10 < 5
               THEN TIMESTAMP '1997-06-15' ELSE o_orderdate
               END AS o_orderdate,
          o_orderpriority
        FROM src
    """,
    "lineitem": """
        SELECT
          CASE WHEN l_orderkey % 10 < 6 THEN 1::BIGINT ELSE l_orderkey
               END AS l_orderkey,
          l_partkey, l_suppkey, l_linenumber,
          CASE WHEN (l_orderkey * 7 + l_linenumber) % 11 = 0 THEN 0.0
               ELSE l_quantity END AS l_quantity,
          CASE WHEN (l_orderkey + l_linenumber) % 23 = 0 THEN 0.0
               ELSE l_extendedprice END AS l_extendedprice,
          CASE WHEN (l_orderkey + l_linenumber) % 9 = 0 THEN 0.0
               WHEN (l_orderkey + l_linenumber) % 9 = 1 THEN 1.0
               ELSE l_discount END AS l_discount,
          l_tax, l_returnflag, l_linestatus,
          CASE WHEN (l_orderkey + l_linenumber) % 2 = 0
               THEN TIMESTAMP '1997-09-01' ELSE l_shipdate
               END AS l_shipdate
        FROM src
    """,
    "customer": """
        SELECT c_custkey, c_name, c_nationkey,
          CASE WHEN c_custkey % 7 = 0 THEN 0.0
               WHEN c_custkey % 7 = 1 THEN -999.99
               ELSE c_acctbal END AS c_acctbal,
          CASE WHEN c_custkey % 10 < 8 THEN 'BUILDING'
               ELSE c_mktsegment END AS c_mktsegment
        FROM src
    """,
}

COPY_AS_IS = ("region", "nation", "supplier", "part")

# ---------------------------------------------------------------------------
# TIME-HOSTILE mode (--time-hostile): rewrites ONLY the temporal columns
# (events.ts, orders.o_orderdate, lineitem.l_shipdate) and copies every
# other table/column unchanged.  A 100 TB lake's clock column is never
# polite either: backfills carry pre-epoch and centuries-old timestamps,
# upstream clocks emit exact bucket-boundary instants, and second- (or
# microsecond-) granularity sources produce EXACT (key, ts) duplicates.
# Injected classes:
#
# - events keyed by event_id % 20 (rows of chain users 9-13 excluded; chain ids chosen from the 0..14 user ids the sf0.001 fixture actually has):
#   epoch-1us / epoch-0 / pre-epoch-fractional (the truncate-vs-floor
#   inputs), exact-hour-boundary and 1us-before-hour (half-open window
#   edges), ancient 1500-06-15 (pre-Gregorian-adoption; faithful
#   proleptic read re-proven by the round-9 rebase probe), far-future
#   2260 (watermark outlier; moves every cutoff-derived constant).
# - per-user deterministic chains (row_number over event_id):
#   user 13: consecutive gaps EXACTLY 1800 s  -> c10's `> 1800` keeps
#            one session; e03's session_window `>=` splits every row.
#   user 11: gaps exactly 1801 s -> both split (the flip pair for 13).
#   user 12: period-3 pattern singleton-click / click+purchase TIE at
#            identical (user_id, ts) -> b18's STRICT `p.ts > e.ts`
#            as-of must skip the tied click and match the singleton
#            (the shape the fixtures never had: FIXTURES.md notes no
#            (user_id, ts) duplicates).  The matched ts is always a
#            singleton, so DuckDB's ASOF pick stays deterministic.
#   user 10: signup/follow alternating at EXACTLY 600 s spacing ->
#            b17's `<= 10 MINUTE` inclusive edge keeps the pair.
#   user  9: spacing 600.000001 s -> b17's edge excludes it.
# - orders.o_orderdate % 15: month-end Jan-31 (+30d lands Mar-1/2),
#   leap day 2000-02-29, century leap day 1600-02-29 (pre-1900),
#   9999-09-30 (far future; every interval the packs add — up to
#   d10's +90 days — stays in year 9999, since Python datetime caps
#   at 9999 and the driver compare must collect the result), epoch-1us,
#   just-post-cutover 1582-10-20, and a fractional midnight
#   1999-12-31 23:59:59.5 (date-cast truncation).
# - lineitem.l_shipdate % 12: pre-epoch, far-future, and the exact
#   strict boundary of b36's `> TIMESTAMP '2000-06-01'` filter
#   (boundary row excluded, +1us row included).
# ---------------------------------------------------------------------------

TRANSFORMS_TIME = {
    "events": f"""
        WITH rn AS (
          SELECT *,
                 row_number() OVER (PARTITION BY user_id ORDER BY event_id)
                   AS rn
          FROM src
        )
        SELECT event_id,
          CASE
            WHEN user_id = 13
              THEN TIMESTAMP '2024-03-01 00:00:00'
                   + to_microseconds(rn * 1800000000)
            WHEN user_id = 11
              THEN TIMESTAMP '2024-04-01 00:00:00'
                   + to_microseconds(rn * 1801000000)
            WHEN user_id = 12
              THEN TIMESTAMP '2024-05-01 00:00:00'
                   + to_microseconds(((rn + 2) // 3) * 3600000000
                       + CASE WHEN rn % 3 = 1 THEN 0
                              ELSE 1800000000 END)
            WHEN user_id = 10
              THEN TIMESTAMP '2024-06-01 00:00:00'
                   + to_microseconds(rn * 600000000)
            WHEN user_id = 9
              THEN TIMESTAMP '2024-07-01 00:00:00'
                   + to_microseconds(rn * 600000001)
            WHEN event_id % 20 = 0 THEN TIMESTAMP '1969-12-31 23:59:59.999999'
            WHEN event_id % 20 = 1 THEN TIMESTAMP '1970-01-01 00:00:00'
            WHEN event_id % 20 = 2 THEN TIMESTAMP '1969-12-31 23:45:00.5'
            WHEN event_id % 20 = 3 THEN TIMESTAMP '2024-01-15 13:00:00'
            WHEN event_id % 20 = 4 THEN TIMESTAMP '2024-01-15 12:59:59.999999'
            WHEN event_id % 20 = 5 THEN TIMESTAMP '1500-06-15 12:34:56.789'
            WHEN event_id % 20 = 6 THEN TIMESTAMP '2260-01-01 00:00:00'
            ELSE ts
          END AS ts,
          user_id,
          CASE
            WHEN user_id = 12
              THEN CASE WHEN rn % 3 = 0 THEN 'purchase' ELSE 'click' END
            WHEN user_id IN (10, 9)
              THEN CASE WHEN rn % 2 = 1 THEN 'signup' ELSE 'follow' END
            ELSE event_type
          END AS event_type,
          value, props
        FROM rn
    """,
    "orders": """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
          CASE
            WHEN o_orderkey % 15 = 0 THEN TIMESTAMP '1996-01-31 00:00:00'
            WHEN o_orderkey % 15 = 1 THEN TIMESTAMP '2000-02-29 12:00:00'
            WHEN o_orderkey % 15 = 2 THEN TIMESTAMP '1600-02-29 00:00:00'
            WHEN o_orderkey % 15 = 3 THEN TIMESTAMP '9999-09-30 23:59:59.999999'
            WHEN o_orderkey % 15 = 4 THEN TIMESTAMP '1969-12-31 23:59:59.999999'
            WHEN o_orderkey % 15 = 5 THEN TIMESTAMP '1582-10-20 00:00:00'
            WHEN o_orderkey % 15 = 6 THEN TIMESTAMP '1999-12-31 23:59:59.5'
            ELSE o_orderdate
          END AS o_orderdate,
          o_orderpriority
        FROM src
    """,
    "lineitem": """
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
          l_quantity, l_extendedprice, l_discount, l_tax,
          l_returnflag, l_linestatus,
          CASE
            WHEN l_orderkey % 12 = 0 THEN TIMESTAMP '1969-06-01 00:00:00'
            WHEN l_orderkey % 12 = 1 THEN TIMESTAMP '2260-01-01 00:00:00'
            WHEN l_orderkey % 12 = 2 THEN TIMESTAMP '2000-06-01 00:00:00'
            WHEN l_orderkey % 12 = 3 THEN TIMESTAMP '2000-06-01 00:00:00.000001'
            ELSE l_shipdate
          END AS l_shipdate
        FROM src
    """,
}


# ---------------------------------------------------------------------------
# NULL-KEY mode (--null-keys): NULLs the JOIN/GROUPING keys themselves
# (events.user_id, orders.o_custkey) on a deterministic 10% of rows and
# copies everything else unchanged.  The sharp edge this probes: SQL
# JOIN equality treats NULL as matching NOTHING, while window/groupBy
# PARTITIONING treats NULL as one ordinary group — so any operator that
# EMULATES a join with a window (b18's as-of) silently flips semantics
# on NULL keys unless it excludes them explicitly.  At 100 TB a NULL
# foreign key is not an anomaly, it is a Tuesday.
# ---------------------------------------------------------------------------

TRANSFORMS_NULL_KEYS = {
    "events": """
        SELECT event_id, ts,
               CASE WHEN event_id % 10 = 7 THEN NULL ELSE user_id END
                 AS user_id,
               event_type, value, props
        FROM src
    """,
    "orders": """
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 10 = 7 THEN NULL ELSE o_custkey END
                 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM src
    """,
}

# ---------------------------------------------------------------------------
# TEXT-HOSTILE corpus (round 10): the fifth hostile axis — the four
# round-9 corpora attacked keys, clocks, measures, and identities, but
# never the TEXT surface the §2.G family and its Java-regex/RE2 oracle
# pairs process.  Real web corpora are Unicode-hostile: astral-plane
# emoji (UTF-16 surrogate pairs on the JVM), combining marks vs their
# precomposed forms, case foldings that change length (ß→SS) or are
# locale-trapped (Turkish I), CJK with no word boundaries, RTL scripts,
# zero-width joiners INSIDE tokens, U+2028/U+2029 (which Java regex '.'
# treats as line terminators but RE2 matches), exotic whitespace that
# \s does NOT match on either engine (NBSP, ideographic, thin), regex
# metacharacters as literal text, PII embedded in non-ASCII context,
# an unbroken 10k-char token (shingler/tokenizer stress), mixed-script
# words, full-width ASCII, and quote/backslash storms.  Each class is
# keyed to doc_id % 16 (deterministic, ~31 docs per class at sf0.001);
# lang/source stay untouched so this axis isolates TEXT handling.
TEXT_PALETTE = (
    # 0: astral emoji, a ZWJ family sequence, a regional-indicator flag
    "data \U0001f4a1 pipeline \U0001f468\u200d\U0001f469\u200d"
    "\U0001f467 emoji \U0001f1fa\U0001f1f8 flag data",
    # 1: combining marks (e + U+0301, i + U+0308), NOT precomposed
    "cafe\u0301 re\u0301sume\u0301 nai\u0308ve combining data",
    # 2: the precomposed forms of the same words (NFC vs NFD pair)
    "caf\u00e9 r\u00e9sum\u00e9 na\u00efve precomposed data",
    # 3: length-changing (\u00df -> SS) and locale-trapped (Turkish
    # \u0131/\u0130) case foldings
    "stra\u00dfe STRASSE gro\u00df Istanbul I\u0131 \u0130i data",
    # 4: CJK, no word boundaries at all
    "\u6570\u636e\u7ba1\u9053\u626b\u63cf\u6bcf\u4e2a\u8868"
    "\u5e76\u5408\u5e76\u6279\u6b21\u6d41\u5904\u7406",
    # 5: RTL Arabic mixed with LTR ASCII
    "\u0628\u064a\u0627\u0646\u0627\u062a \u062e\u0637 data "
    "\u0645\u062e\u062a\u0644\u0637",
    # 6: zero-width space/joiner INSIDE tokens
    "data\u200bpipe\u200dline zero\u200bwidth token data",
    # 7: U+2028/U+2029 — Java regex '.' treats them as line
    # terminators; RE2's '.' matches them
    "line one\u2028line two\u2029paragraph data",
    # 8: whitespace that regex \\s does NOT match on either engine:
    # NBSP, ideographic space, thin space — token-gluing probe
    "a\u00a0b\u3000c\u2009d nbsp ideographic thin data",
    # 9: regex metacharacters as literal text
    "a.b (c) [d] {e} f* g+ h? i| ^j k$ l\\ data",
    # 10: PII embedded in non-ASCII context
    "contact \u00b5s.ers@ex\u00e4mple.com or +1-555-0100 data now",
    None,  # 11: unbroken 10k-char token built via repeat() in SQL
    # 12: one token mixing three scripts
    "data\u0434\u0430\u043d\u043d\u044b\u0435\u6570\u636e"
    " mixed token",
    # 13: full-width ASCII letters, ideographic space, full-width digits
    "\uff44\uff41\uff54\uff41\u3000\uff50\uff49\uff50\uff45 "
    "\uff11\uff12\uff13",
    # 14: quote/backslash storm (SQL-escaping stress for the oracles)
    "it's a \"quoted\" text with \\n literal and '' doubled data",
)


def _text_hostile_sql() -> str:
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    n = len(TEXT_PALETTE) + 1  # one residue keeps the original text
    cases = []
    for i, s in enumerate(TEXT_PALETTE):
        expr = "repeat('x', 10000)" if s is None else q(s)
        cases.append(f"WHEN doc_id % {n} = {i} THEN {expr}")
    case_sql = "\n              ".join(cases)
    return f"""
        WITH rewritten AS (
          SELECT doc_id,
            CASE
              {case_sql}
              ELSE text
            END AS text,
            lang, source
          FROM src
        )
        SELECT doc_id, text, lang, source,
               length(text)::BIGINT AS n_chars
        FROM rewritten
    """


TRANSFORMS_TEXT = {"documents": _text_hostile_sql()}

# ---------------------------------------------------------------------------
# NUMERIC-HOSTILE corpus (round 11): the seventh hostile axis.  The
# finite-measure contract quarantines NaN/±Inf, but a measure can be
# perfectly FINITE and still hostile to the engine's decimal money
# contract and float determinism story:
#   * |x| >= 1e16 overflows CAST(x AS DECIMAL(18,2)) — ANSI throws on
#     BOTH engines, and the finite-measure quarantine passes it;
#   * 2^53-adjacent doubles probe integer-exactness boundaries
#     (double mantissa ends; x+1 == x);
#   * min-subnormal (5e-324) probes underflow and ROUND behavior;
#   * -0.0 probes sign-of-zero propagation through sums and rounding
#     (the round-9 percentile finding's input-side twin);
#   * 1e15-adjacent values sit one step below the decimal capacity so
#     SUMS of a few of them cross it — aggregate overflow without any
#     single hostile row.
# Keys, clocks, and text stay sane: this axis isolates MEASURE VALUE
# hostility (events.value; lineitem money columns; o_totalprice).
# ---------------------------------------------------------------------------

TRANSFORMS_NUMERIC = {
    "events": """
        SELECT event_id, ts, user_id, event_type,
          CASE
            WHEN event_id % 23 = 1 THEN 1e300
            WHEN event_id % 23 = 2 THEN -1e300
            WHEN event_id % 23 = 3 THEN 1e16
            WHEN event_id % 23 = 4 THEN -0.0
            WHEN event_id % 23 = 5 THEN 5e-324
            WHEN event_id % 23 = 6 THEN 9007199254740993.0
            WHEN event_id % 23 = 7 THEN 999999999999999.9
            ELSE value
          END AS value,
          props
        FROM src
    """,
    "lineitem": """
        SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
          CASE WHEN l_orderkey % 19 = 1 THEN 1e17 ELSE l_quantity
               END AS l_quantity,
          CASE
            WHEN l_orderkey % 19 = 2 THEN 1e300
            WHEN l_orderkey % 19 = 3 THEN -0.0
            WHEN l_orderkey % 19 = 4 THEN 999999999999999.9
            ELSE l_extendedprice
          END AS l_extendedprice,
          CASE WHEN l_orderkey % 19 = 5 THEN 5e-324 ELSE l_discount
               END AS l_discount,
          l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM src
    """,
    "orders": """
        SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE
            WHEN o_orderkey % 17 = 1 THEN 1e300
            WHEN o_orderkey % 17 = 2 THEN -0.0
            WHEN o_orderkey % 17 = 3 THEN 1e16
            ELSE o_totalprice
          END AS o_totalprice,
          o_orderdate, o_orderpriority
        FROM src
    """,
}


# ---------------------------------------------------------------------------
# SKEW-HOSTILE corpus (round 12): the eighth hostile axis — KEY
# DISTRIBUTION.  The default adversarial corpus plants ONE hot key
# (80% on one user); real 100 TB key distributions are ZIPFIAN: the
# rank-k key owns ~1/k of the rows, so there is a whole HEAD of hot
# keys (straggler spread across partitions, not one splittable giant)
# and a long tail of singletons.  Every grouping/join/window key is
# remapped through the Zipf(1) inverse-CDF floor(pow(U+1, u)) - 1,
# where u is a deterministic uniform from hash(row key) and U the
# table's dense key domain — P(key = k) ~ 1/((k+1) ln(U+1)), rank-0
# key owns ~ln(2)/ln(U+1) of all rows, reproducible byte-for-byte.
#
# documents get the TOKEN-frequency twin: a dominant token appended to
# 70% of docs and a mid-frequency token to a further 20%.  This
# attacks the open-vocabulary token-join branch of the near-dup family
# — a high-document-frequency token placed in every candidate doc is
# exactly the input that makes an unfiltered token self-join quadratic
# (C(0.7N, 2) candidate pairs from one token); the prefix-filter is
# the machinery that must absorb it.  n_chars stays consistent.
#
# Clocks, measures, text content (beyond the appended tokens), and
# dims stay sane: this axis isolates DISTRIBUTION.
# ---------------------------------------------------------------------------

def _zipf(row_key: str, domain_sql: str) -> str:
    """SQL for a Zipf(1) draw into [0, U-1] where U = ``domain_sql``
    (the dense key-domain size), driven by a deterministic
    hash-uniform of ``row_key`` — the ROW's identity, not the column
    being remapped (hashing the remapped column itself would be a
    relabeling of the original distribution: only as many distinct
    uniforms as distinct input keys)."""
    u = f"((hash({row_key}) % 1000000) / 1000000.0)"
    return (
        f"CAST(floor(pow(({domain_sql})::DOUBLE + 1.0, {u})) AS BIGINT) - 1"
    )


TRANSFORMS_SKEW_HOSTILE = {
    "events": f"""
        SELECT event_id, ts,
          CASE WHEN user_id IS NULL THEN NULL
               ELSE {_zipf('event_id', '(SELECT max(user_id) + 1 FROM src)')}
          END AS user_id,
          event_type, value, props
        FROM src
    """,
    "orders": f"""
        SELECT o_orderkey,
          {_zipf('o_orderkey', '(SELECT max(o_custkey) + 1 FROM src)')}
            AS o_custkey,
          o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM src
    """,
    "lineitem": f"""
        SELECT
          {_zipf('l_orderkey * 31 + l_linenumber',
                 '(SELECT max(l_orderkey) + 1 FROM src)')}
            AS l_orderkey,
          l_partkey, l_suppkey, l_linenumber, l_quantity,
          l_extendedprice, l_discount, l_tax, l_returnflag,
          l_linestatus, l_shipdate
        FROM src
    """,
    "documents": """
        WITH rewritten AS (
          SELECT doc_id,
            CASE
              WHEN doc_id % 10 < 7 THEN text || ' zipfcommon'
              WHEN doc_id % 10 < 9 THEN text || ' zipfmid'
              ELSE text
            END AS text,
            lang, source
          FROM src
        )
        SELECT doc_id, text, lang, source,
               length(text)::BIGINT AS n_chars
        FROM rewritten
    """,
}


# BINARY-HOSTILE corpus (round 13): the ninth hostile axis — PAYLOAD
# SHAPE through the multimodal/binary family (a26/f08/f09/g09) and
# every text operator that feeds it.  The fixture documents are polite
# ~100-char ASCII lines; a real object-store landing has zero-byte
# objects (failed uploads), NULL records, multi-hundred-KB payloads
# (the Arrow batch boundary must carry them), and control bytes
# embedded in "text" (NUL, SOH, DEL — valid UTF-8, hostile to any
# C-string or printable-ASCII assumption in an operator or its
# oracle).  Blob-level corruption (bad magic, truncated headers,
# >=256 MB objects) cannot be expressed through a parquet text column
# — tests/test_binary_hostile.py drives those directly at the
# decoder and the binaryFile scan.
#
# doc_id % 23 classes: 0 -> empty string (zero-byte payload), 1 ->
# NULL, 2 -> ~100 KB repeat (huge payload through the JVM<->Arrow
# boundary and the shingler), 3 -> control bytes appended.  Keys,
# clocks, measures, and every other table stay sane: this axis
# isolates PAYLOAD SHAPE.
# ---------------------------------------------------------------------------

TRANSFORMS_BINARY_HOSTILE = {
    "documents": """
        WITH rewritten AS (
          SELECT doc_id,
            CASE
              WHEN doc_id % 23 = 0 THEN ''
              WHEN doc_id % 23 = 1 THEN NULL
              WHEN doc_id % 23 = 2 THEN repeat(text, 800)
              WHEN doc_id % 23 = 3
                THEN text || chr(0) || chr(1) || chr(127) || 'ctlbytes'
              ELSE text
            END AS text,
            lang, source
          FROM src
        )
        SELECT doc_id, text, lang, source,
               length(text)::BIGINT AS n_chars
        FROM rewritten
    """,
}


def build(
    out_dir: str,
    src_dir: str,
    skew_only: bool = False,
    time_hostile: bool = False,
    null_keys: bool = False,
    text_hostile: bool = False,
    numeric_hostile: bool = False,
    skew_hostile: bool = False,
    binary_hostile: bool = False,
) -> None:
    """skew_only=True applies only the RELATIONAL skew rewrites (hot
    keys, tie storms, NULL values) and copies documents/embeddings
    unchanged — the shape for up-scale skew BENCHMARKS, where the
    duplicate-text cluster would (by design — documented quadratic
    pair output) explode the dedup family's results at sf0.1.

    time_hostile=True applies the TEMPORAL rewrites only (see the
    TRANSFORMS_TIME comment block) and copies every other table
    unchanged.

    null_keys=True applies the NULL-KEY rewrites only (see the
    TRANSFORMS_NULL_KEYS comment block) and copies every other table
    unchanged.

    text_hostile=True applies the Unicode TEXT rewrites to documents
    only (see the TEXT_PALETTE comment block) and copies every other
    table unchanged.

    numeric_hostile=True applies the MEASURE-VALUE rewrites only (see
    the TRANSFORMS_NUMERIC comment block) and copies every other table
    unchanged.

    skew_hostile=True applies the ZIPFIAN key-distribution rewrites
    plus the dominant-token document rewrite (see the
    TRANSFORMS_SKEW_HOSTILE comment block) and copies every other
    table unchanged.

    binary_hostile=True applies the PAYLOAD-SHAPE document rewrites
    (zero-byte / NULL / ~100 KB / control-byte texts — see the
    TRANSFORMS_BINARY_HOSTILE comment block) and copies every other
    table unchanged."""
    assert (
        skew_only + time_hostile + null_keys + text_hostile
        + numeric_hostile + skew_hostile + binary_hostile
    ) <= 1, "pick one mode"
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    skip = {"documents", "embeddings"} if skew_only else set()
    transforms = (
        TRANSFORMS_TIME
        if time_hostile
        else TRANSFORMS_NULL_KEYS
        if null_keys
        else TRANSFORMS_TEXT
        if text_hostile
        else TRANSFORMS_NUMERIC
        if numeric_hostile
        else TRANSFORMS_SKEW_HOSTILE
        if skew_hostile
        else TRANSFORMS_BINARY_HOSTILE
        if binary_hostile
        else TRANSFORMS
    )
    for table in COPY_AS_IS + tuple(TRANSFORMS):
        src = os.path.join(src_dir, f"{table}.parquet")
        dst = os.path.join(out_dir, f"{table}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW src AS FROM read_parquet('{src}')")
        sel = "SELECT * FROM src" if table in skip else transforms.get(
            table, "SELECT * FROM src"
        )
        con.execute(f"COPY ({sel}) TO '{dst}' (FORMAT parquet)")
        # Schema fidelity gate: the rewritten table must describe
        # identically to the source, or downstream queries would be
        # exercising a different surface than the fixture contract.
        src_schema = con.execute(f"DESCRIBE FROM read_parquet('{src}')").fetchall()
        dst_schema = con.execute(f"DESCRIBE FROM read_parquet('{dst}')").fetchall()
        assert src_schema == dst_schema, (table, src_schema, dst_schema)
        n_src = con.execute(f"SELECT count(*) FROM read_parquet('{src}')").fetchone()
        n_dst = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()
        assert n_src == n_dst, (table, n_src, n_dst)
        print(f"{table}: {n_dst[0]} rows -> {dst}", flush=True)
    con.close()


_KNOWN_FLAGS = {
    "--skew-only", "--time-hostile", "--null-keys", "--text-hostile",
    "--numeric-hostile", "--skew-hostile", "--binary-hostile",
}

if __name__ == "__main__":
    # A misspelled mode flag must fail loudly, not silently build the
    # DEFAULT adversarial corpus that a sweep would then misattribute
    # (ADVICE r09).
    unknown = [
        a for a in sys.argv[1:] if a.startswith("--") and a not in _KNOWN_FLAGS
    ]
    if unknown:
        sys.exit(
            f"unknown flag(s) {unknown}; known: {sorted(_KNOWN_FLAGS)}"
        )
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = args[0] if len(args) > 0 else "/tmp/adversarial_sf"
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.001"
    build(
        out,
        src,
        skew_only="--skew-only" in sys.argv,
        time_hostile="--time-hostile" in sys.argv,
        null_keys="--null-keys" in sys.argv,
        text_hostile="--text-hostile" in sys.argv,
        numeric_hostile="--numeric-hostile" in sys.argv,
        skew_hostile="--skew-hostile" in sys.argv,
        binary_hostile="--binary-hostile" in sys.argv,
    )
