"""Property-based spot checks (SURVEY §5 item 5): the engine against an
independent pure-Python SPARQL-semantics evaluator on random small graphs
and random BGP / OPTIONAL / FILTER queries (hypothesis)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dublin_smart_city_graphdb_spark.model.schema import QUAD_SCHEMA
from dublin_smart_city_graphdb_spark.model.terms import IRI, Literal, XSD, term_to_row
from dublin_smart_city_graphdb_spark.sparql.compiler import QueryCompiler
from dublin_smart_city_graphdb_spark.sparql.parser import parse_query

G = "http://g#"
SUBJECTS = [f"{G}s{i}" for i in range(4)]
PREDICATES = [f"{G}p{i}" for i in range(3)]
VARS = ["a", "b", "c"]


# -- strategies --------------------------------------------------------------

term_obj = st.one_of(
    st.sampled_from(SUBJECTS).map(lambda v: ("iri", v)),
    st.integers(0, 4).map(lambda n: ("int", str(n))),
)

triple = st.tuples(st.sampled_from(SUBJECTS), st.sampled_from(PREDICATES), term_obj)

graph = st.lists(triple, min_size=0, max_size=14).map(lambda ts: sorted(set(ts)))

pat_s = st.one_of(
    st.sampled_from(VARS).map(lambda v: ("var", v)),
    st.sampled_from(SUBJECTS).map(lambda v: ("iri", v)),
)
pat_p = st.one_of(
    st.sampled_from(VARS).map(lambda v: ("var", v)),
    st.sampled_from(PREDICATES).map(lambda v: ("iri", v)),
)
pat_o = st.one_of(st.sampled_from(VARS).map(lambda v: ("var", v)), term_obj)

pattern = st.tuples(pat_s, pat_p, pat_o)

query = st.fixed_dictionaries(
    {
        "base": st.lists(pattern, min_size=1, max_size=2),
        "optional": st.one_of(st.none(), pattern),
        "filter": st.one_of(
            st.none(),
            st.tuples(st.sampled_from(VARS), st.integers(0, 4)),  # ?v > n
        ),
    }
)


# -- pure-Python reference evaluator -----------------------------------------

# Driver-window hygiene (round 12, VERDICT r11 item 6): hypothesis soaks —
# slow-gate class, excluded from the default suite so the driver's
# verify completes inside its window; run with `-m slow` (the round
# close does).
pytestmark = pytest.mark.slow


def _match(tp, triple, binding):
    out = dict(binding)
    for pos, val in zip(tp, triple):
        kind, v = pos
        if kind == "var":
            if v in out:
                if out[v] != val:
                    return None
            else:
                out[v] = val
        else:
            if pos != val:
                return None
    return out


def _triple_positions(t):
    s, p, o = t
    return (("iri", s), ("iri", p), o)


def _eval_bgp(triples, patterns, seeds):
    sols = seeds
    for tp in patterns:
        sols = [
            m
            for b in sols
            for t in triples
            if (m := _match(tp, _triple_positions(t), b)) is not None
        ]
    return sols


def _compatible(b1, b2):
    return all(b2.get(k, v) == v for k, v in b1.items())


def _reference_eval(triples, q):
    base = _eval_bgp(triples, q["base"], [{}])
    if q["optional"] is not None:
        out = []
        for b in base:
            matches = [
                m for m in _eval_bgp(triples, [q["optional"]], [{}])
                if _compatible(b, m)
            ]
            if matches:
                out.extend({**b, **m} for m in matches)
            else:
                out.append(b)
        base = out
    if q["filter"] is not None:
        var, n = q["filter"]
        base = [
            b
            for b in base
            if var in b and b[var][0] == "int" and int(b[var][1]) > n
        ]
    return base


# -- SPARQL text generation ---------------------------------------------------

def _pos_text(pos):
    kind, v = pos
    if kind == "var":
        return f"?{v}"
    if kind == "iri":
        return f"<{v}>"
    return v  # int literal lexical form


def _query_text(q):
    lines = [" ".join(_pos_text(p) for p in tp) + " ." for tp in q["base"]]
    if q["optional"] is not None:
        lines.append(
            "OPTIONAL { " + " ".join(_pos_text(p) for p in q["optional"]) + " }"
        )
    if q["filter"] is not None:
        var, n = q["filter"]
        lines.append(f"FILTER(?{var} > {n})")
    return "SELECT * WHERE { " + "\n".join(lines) + " }"


def _term(val):
    kind, v = val
    if kind == "iri":
        return IRI(v)
    return Literal(v, datatype=XSD + "integer")


def _row_key(row, cols):
    out = []
    for c in cols:
        t = row[c]
        if t is None or t["kind"] is None:
            out.append(None)
        elif t["kind"] == 0:
            out.append(("iri", t["lex"]))
        else:
            out.append(("int", t["lex"]))
    return tuple(out)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(triples=graph, q=query)
def test_engine_matches_reference_eval(spark, triples, q):
    rows = [
        term_to_row(None, IRI(s), IRI(p), _term(o)) for s, p, o in triples
    ]
    quads = spark.createDataFrame(rows, QUAD_SCHEMA)
    df = QueryCompiler(spark, quads).compile(parse_query(_query_text(q)))
    cols = df.columns
    got = sorted(_row_key(r, cols) for r in df.collect())

    want_sols = _reference_eval(triples, q)
    want = sorted(
        tuple(b.get(c) for c in cols) for b in want_sols
    )
    assert got == want, f"query: {_query_text(q)}\ntriples: {triples}"


# -- dedup pipeline vs pure-Python brute force --------------------------------

words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
doc_text = st.lists(words, min_size=0, max_size=12).map(" ".join)
corpus = st.lists(doc_text, min_size=1, max_size=8)


def _py_shingles(text: str, k: int) -> set[str]:
    w = text.split(" ")
    if len(w) < k:
        return set()
    return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs=corpus)
def test_ngram_jaccard_matches_bruteforce(spark, docs, tmp_path_factory):
    """The packed-id single-pass Jaccard equals the quadratic definition."""
    import pandas as pd

    d = tmp_path_factory.mktemp("jac")
    pd.DataFrame(
        {"doc_id": range(len(docs)), "text": docs}
    ).to_parquet(d / "documents.parquet")

    from dublin_smart_city_graphdb_spark.harness.pipeline import dedup_ngram_jaccard

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_ngram_jaccard(spark, str(d)).collect()
    }

    expected = {}
    sh = [_py_shingles(t, 3) for t in docs]
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            inter = len(sh[a] & sh[b])
            if inter:
                j = inter / (len(sh[a]) + len(sh[b]) - inter)
                if j >= 0.1:
                    expected[(a, b)] = round(j, 6)
    assert got == expected


# -- as-of join strategies agree (incl. timestamp ties) ----------------------

asof_events = st.lists(
    st.tuples(
        st.integers(0, 2),       # user key
        st.integers(0, 20),      # timestamp (small range forces ties)
        st.booleans(),           # True = taker (purchase), False = giver (view)
        st.integers(0, 5),       # giver value
    ),
    min_size=1,
    max_size=24,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(asof_events)
def test_asof_strategies_agree(spark, events):
    """union-window and time-bucketed as-of joins must return identical
    rows for any interleaving of takers/givers, including same-timestamp
    ties (both resolve to the greatest-value giver) and buckets with no
    giver (carry from a prior bucket)."""
    from dublin_smart_city_graphdb_spark.operators.asof import (
        asof_bucketed,
        asof_union_window,
    )

    takers = [
        (i, u, t) for i, (u, t, is_t, _) in enumerate(events) if is_t
    ]
    givers = [(u, t, float(v)) for (u, t, is_t, v) in events if not is_t]
    if not takers:
        takers = [(99, 0, 0)]
    if not givers:
        givers = [(0, 0, 1.0)]
    tdf = spark.createDataFrame(takers, "event_id long, user_id long, ts_us long")
    gdf = spark.createDataFrame(givers, "user_id long, ts_us long, g_value double")

    def rows(df):
        return sorted(
            (r["event_id"], r["user_id"], r["ts_us"], r["matched_ts"], r["matched_value"])
            for r in df.collect()
        )

    a = rows(asof_union_window(tdf, gdf, key="user_id", ts="ts_us", val="g_value"))
    b = rows(
        asof_bucketed(
            tdf, gdf, key="user_id", ts="ts_us", val="g_value", bucket_width=7
        )
    )
    assert a == b

    # brute-force oracle: per taker, max (ts, value) over givers with ts <= t
    expect = []
    for eid, u, t in takers:
        cands = [(ts, v) for (gu, ts, v) in givers if gu == u and ts <= t]
        m = max(cands) if cands else (None, None)
        expect.append((eid, u, t, m[0], m[1]))
    assert a == sorted(expect)


# -- bucketed range join vs brute force --------------------------------------

range_rows = st.lists(
    st.tuples(
        st.integers(0, 2),        # user key
        st.integers(-10, 30),     # timestamp (negatives exercise floor-div)
        st.booleans(),            # True = probe, False = build
        st.integers(0, 5),        # build value
    ),
    min_size=1,
    max_size=24,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(range_rows, st.sampled_from([(-5, 0), (-3, 2), (0, 4)]))
def test_range_join_bucketed_matches_brute_force(spark, rows, window):
    """The bucketized interval join must return exactly the pairs of the
    quadratic definition for any window placement, including negative
    timestamps (floor-division bucketing) and both-signed windows, at the
    minimum bucket width and at a wider one."""
    from dublin_smart_city_graphdb_spark.operators.rangejoin import range_join_bucketed

    lo, hi = window
    probes = [(i, u, t) for i, (u, t, is_p, _) in enumerate(rows) if is_p]
    builds = [(u, t, float(v)) for (u, t, is_p, v) in rows if not is_p]
    if not probes:
        probes = [(99, 0, 0)]
    if not builds:
        builds = [(0, 1, 1.0)]
    pdf = spark.createDataFrame(probes, "probe_id long, user_id long, p_ts long")
    bdf = spark.createDataFrame(builds, "user_id long, b_ts long, b_val double")

    def rows_of(df):
        return sorted(
            (r["probe_id"], r["user_id"], r["p_ts"], r["b_ts"], r["b_val"])
            for r in df.collect()
        )

    expect = sorted(
        (pid, u, pt, bt, bv)
        for (pid, u, pt) in probes
        for (bu, bt, bv) in builds
        if bu == u and pt + lo <= bt <= pt + hi
    )
    for width in (None, 13):
        got = rows_of(
            range_join_bucketed(
                pdf, bdf, key="user_id", probe_ts="p_ts", build_ts="b_ts",
                lo=lo, hi=hi, bucket_width=width,
            )
        )
        assert got == expect, f"width={width}"


def test_range_join_bucketed_ns_epoch_exact(spark):
    """Bucketing must stay exact beyond 2**53: ns-epoch timestamps (~1.8e18)
    silently mis-bucket under double floor-division. Adjacent ns timestamps
    around a boundary must all match a zero-width-window probe set exactly."""
    from dublin_smart_city_graphdb_spark.operators.rangejoin import range_join_bucketed

    base = 1_755_000_000_000_000_000  # ns epoch, > 2**53
    probes = [(i, 1, base + i) for i in range(6)]
    builds = [(1, base + i, float(i)) for i in range(6)]
    pdf = spark.createDataFrame(probes, "probe_id long, user_id long, p_ts long")
    bdf = spark.createDataFrame(builds, "user_id long, b_ts long, b_val double")
    got = sorted(
        (r["probe_id"], r["b_ts"] - base)
        for r in range_join_bucketed(
            pdf, bdf, key="user_id", probe_ts="p_ts", build_ts="b_ts",
            lo=-1, hi=1,
        ).collect()
    )
    expect = sorted(
        (pid, j) for (pid, _, pt) in probes for j in range(6)
        if pt - 1 <= base + j <= pt + 1
    )
    assert got == expect


def test_range_join_bucketed_rejects_zero_width(spark):
    """hi == lo with an explicit bucket_width=0 must raise, not return an
    empty join (division by zero would NULL every bucket)."""
    import pytest

    from dublin_smart_city_graphdb_spark.operators.rangejoin import range_join_bucketed

    pdf = spark.createDataFrame([(1, 1, 0)], "probe_id long, user_id long, p_ts long")
    bdf = spark.createDataFrame([(1, 0, 1.0)], "user_id long, b_ts long, b_val double")
    with pytest.raises(ValueError, match="positive"):
        range_join_bucketed(
            pdf, bdf, key="user_id", probe_ts="p_ts", build_ts="b_ts",
            lo=0, hi=0, bucket_width=0,
        )


# -- bucketed sessionize ≡ plain sessionize across bucket boundaries ---------

@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),            # user
            st.integers(0, 30) ,          # hour offset (spans many 6h buckets)
            st.integers(0, 3599),         # second within the hour
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_bucketed_sessionize_equals_plain(spark, events):
    """Random event streams crossing 6h bucket boundaries: the skew-safe
    (user, bucket) strategy must reproduce the bare-user_id windows
    exactly — session indexes, starts and sizes."""
    import pyspark.sql.functions as F2
    from pyspark.sql import Window as W2
    from dublin_smart_city_graphdb_spark.harness.pipeline import (
        _SESSION_BUCKET_US,
    )

    rows = [
        (i, u, (h * 3600 + s) * 1_000_000)
        for i, (u, h, s) in enumerate(sorted(set(events)))
    ]
    e = spark.createDataFrame(rows, "event_id long, user_id long, ts_us long")

    # plain variant (mirrors events_sessionize's window chain)
    gap = 1_800_000_000
    w = W2.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = e.withColumn(
        "new_session",
        F2.when(
            (F2.col("ts_us") - F2.lag("ts_us").over(w) > gap)
            | F2.lag("ts_us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    plain = (
        marked.withColumn(
            "session_idx",
            F2.sum("new_session").over(
                w.rowsBetween(W2.unboundedPreceding, W2.currentRow)
            ),
        )
        .groupBy("user_id", "session_idx")
        .agg(F2.min("ts_us").alias("session_start_us"), F2.count("*").alias("n_events"))
    )

    # bucketed variant (mirrors events_sessionize_bucketed)
    eb = e.withColumn(
        "_bkt", (F2.col("ts_us") / F2.lit(_SESSION_BUCKET_US)).cast("long")
    )
    w_in = W2.partitionBy("user_id", "_bkt").orderBy("ts_us", "event_id")
    lag_ts = F2.lag("ts_us").over(w_in)
    m2 = eb.withColumn(
        "new_session",
        F2.when((F2.col("ts_us") - lag_ts > gap) | lag_ts.isNull(), 1).otherwise(0),
    ).withColumn(
        "rsum",
        F2.sum("new_session").over(
            w_in.rowsBetween(W2.unboundedPreceding, W2.currentRow)
        ),
    )
    summ = m2.groupBy("user_id", "_bkt").agg(
        F2.min(F2.struct("ts_us", "event_id")).alias("_first"),
        F2.max(F2.struct("ts_us", "event_id")).alias("_last"),
        F2.sum("new_session").alias("n_new"),
    )
    w_b = W2.partitionBy("user_id").orderBy("_bkt")
    prev_last = F2.lag(F2.col("_last.ts_us")).over(w_b)
    corrected = summ.select(
        "user_id", "_bkt",
        F2.when(
            prev_last.isNull() | (F2.col("_first.ts_us") - prev_last > gap), 1
        ).otherwise(0).alias("first_new"),
        "n_new",
    ).withColumn("corr", F2.col("n_new") - 1 + F2.col("first_new"))
    offsets = corrected.select(
        "user_id", "_bkt", "first_new",
        F2.coalesce(
            F2.sum("corr").over(w_b.rowsBetween(W2.unboundedPreceding, -1)),
            F2.lit(0),
        ).alias("offset"),
    )
    joined = m2.join(offsets, ["user_id", "_bkt"])
    idx = F2.col("offset") + F2.col("rsum") - 1 + F2.col("first_new")
    bucketed = (
        joined.select("user_id", idx.alias("session_idx"), "ts_us")
        .groupBy("user_id", "session_idx")
        .agg(F2.min("ts_us").alias("session_start_us"), F2.count("*").alias("n_events"))
    )

    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bucketed.collect())
    )
