"""Property-based differential oracle: the Spark flattener vs an
independent pure-Python implementation of the reference's v2 window
semantics (closed interval, null-skipping aggregation, fallback on
empty) over hypothesis-generated micro-series."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from timeseriesflattener_spark import (
    Flattener,
    PredictionTimeFrame,
    PredictorSpec,
    ValueFrame,
    strings_to_aggregators,
)

BASE = dt.datetime(2021, 1, 1)

value_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),          # entity
        st.integers(min_value=0, max_value=240),        # hours offset
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),  # value
    ),
    min_size=1,
    max_size=25,
)
pred_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=0, max_value=240),
    ),
    min_size=1,
    max_size=6,
    unique=True,
)
lookbehind_hours = st.integers(min_value=1, max_value=96)


def _python_reference(values, preds, lb_hours, fallback):
    """Independent implementation of v2 semantics."""
    out = {}
    for entity, pred_h in preds:
        window = [
            v
            for (e, h, v) in values
            if e == entity and v is not None and pred_h - lb_hours <= h <= pred_h
        ]
        out[(entity, pred_h)] = {
            "mean": sum(window) / len(window) if window else fallback,
            "count": len(window),
            "min": min(window) if window else fallback,
            "max": max(window) if window else fallback,
            "sum": sum(window) if window else fallback,
        }
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(values=value_rows, preds=pred_rows, lb=lookbehind_hours)
def test_flattener_matches_python_reference(spark, values, preds, lb):
    fallback = -999.0
    vdf = spark.createDataFrame(
        [
            (e, BASE + dt.timedelta(hours=h), float(v) if v is not None else None)
            for (e, h, v) in values
        ],
        "entity_id int, timestamp timestamp, value double",
    )
    pdf = spark.createDataFrame(
        [(e, BASE + dt.timedelta(hours=h)) for (e, h) in preds],
        "entity_id int, pred_timestamp timestamp",
    )
    result = Flattener(predictiontime_frame=PredictionTimeFrame(df=pdf)).aggregate_timeseries(
        specs=[
            PredictorSpec(
                value_frame=ValueFrame(df=vdf),
                lookbehind_distances=[dt.timedelta(hours=lb)],
                aggregators=strings_to_aggregators(["mean", "count", "min", "max", "sum"]),
                fallback=fallback,
            )
        ]
    )
    expected = _python_reference(values, preds, lb, fallback)
    lp = f"0_to_{(-dt.timedelta(hours=lb)).days * -1}_days"  # floor naming
    # derive the period string the engine produced (first/last .days floors)
    first = -dt.timedelta(hours=lb)
    lp = f"{abs(dt.timedelta(0).days)}_to_{abs(first.days)}_days"

    rows = {
        (r["entity_id"], int((r["pred_timestamp"] - BASE).total_seconds() // 3600)): r
        for r in result.df.collect()
    }
    assert rows.keys() == expected.keys()
    for key, exp in expected.items():
        row = rows[key]
        for agg in ["mean", "count", "min", "max", "sum"]:
            got = row[f"pred_value_within_{lp}_{agg}_fallback_{fallback}"]
            want = exp[agg]
            if isinstance(want, float) and isinstance(got, float):
                assert got == pytest.approx(want, rel=1e-9), (key, agg, got, want)
            else:
                assert got == want, (key, agg, got, want)


# ------------------------------------------------- sessionize differential

session_rows = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),     # entity
        st.integers(min_value=0, max_value=5000),  # minutes offset
    ),
    min_size=1,
    max_size=30,
)
gap_minutes = st.integers(min_value=1, max_value=120)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(rows=session_rows, gap=gap_minutes)
def test_sessionize_matches_python(spark, rows, gap):
    """Spark sessionize vs an independent pure-Python pass: identical
    session assignment for arbitrary event layouts (duplicates included
    — same-instant events share a session by definition)."""
    import datetime as dtm

    from timeseriesflattener_spark.operators.sessions import sessionize

    data = [
        (str(e), i, BASE + dtm.timedelta(minutes=m))
        for i, (e, m) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "conv_id string, turn_idx int, ts timestamp")
    got = {
        (r["conv_id"], r["turn_idx"]): r["session_id"]
        for r in sessionize(df, dtm.timedelta(minutes=gap)).collect()
    }

    # pure-python reference: sort by (ts, turn_idx) per entity, open a
    # session when the gap strictly exceeds the threshold
    want = {}
    by_entity = {}
    for conv, idx, ts in data:
        by_entity.setdefault(conv, []).append((ts, idx))
    for conv, evs in by_entity.items():
        evs.sort()
        sid, prev = 0, None
        for ts, idx in evs:
            if prev is not None and (ts - prev) > dtm.timedelta(minutes=gap):
                sid += 1
            want[(conv, idx)] = sid
            prev = ts
    assert got == want


# ------------------------------------------------- DDSketch differential


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    vals=st.lists(
        st.one_of(
            st.floats(min_value=1e-6, max_value=1e6, allow_nan=False),
            st.floats(min_value=-1e6, max_value=-1e-6, allow_nan=False),
            st.just(0.0),
        ),
        min_size=1,
        max_size=40,
    ),
    p=st.sampled_from([0.5, 0.9, 0.99]),
)
def test_sketch_quantile_error_bound_property(spark, vals, p):
    """For ANY input and quantile, the sketch estimate is within the
    DDSketch relative-error bound of the exact inverted-CDF quantile."""
    import datetime as dtm

    from timeseriesflattener_spark.plans.sketch import (
        GAMMA,
        partial_sketch,
        quantiles_from_sketch,
    )

    rows = [
        ("c", BASE + dtm.timedelta(seconds=13 * i), float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, value double")
    q = quantiles_from_sketch(
        partial_sketch(df, "value", tier="1d"), ps=(p,)
    ).collect()[0][f"p{int(p * 100)}"]
    sorted_vals = sorted(vals)
    exact = sorted_vals[max(0, math.ceil(p * len(vals)) - 1)]
    rel = (GAMMA - 1) / (GAMMA + 1)
    assert abs(q - exact) <= rel * abs(exact) * 1.0001 + 1e-9, (q, exact)


doc_texts = st.lists(
    st.text(
        alphabet=st.sampled_from(list("ab c\nd.!@0189+-()\t\r")),
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=6,
)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.text(
            # \x0b (vertical tab), \x0c (form feed) and NBSP included ON
            # PURPOSE: the engine's whitespace is the explicit ASCII
            # class [ \t\r\n\f] (RE2 \s) — \x0b and NBSP are ordinary
            # characters, diverging from Python str.split(); this test
            # pins that contract with a reference using the SAME class.
            alphabet=st.sampled_from(list("ab c.\n\t\r\x0b\x0c ")),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_whitespace_class_contract(spark, texts):
    """tokens / token_count / normalized_text treat EXACTLY [ \\t\\r\\n\\f]
    as whitespace — not \\x0b, not NBSP (where Python str.split() DOES
    split). Differential vs a Python re reference over an alphabet that
    contains the divergent characters."""
    import re as pyre

    from pyspark.sql import functions as F

    from timeseriesflattener_spark.operators.dedup import normalized_text
    from timeseriesflattener_spark.operators.text import token_count, tokens

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["toks"], r["nt"], r["norm"])
        for r in df.select(
            "doc_id",
            tokens(F.col("text")).alias("toks"),
            token_count(F.col("text")).alias("nt"),
            normalized_text(F.col("text")).alias("norm"),
        ).collect()
    }
    for i, t in rows:
        ref_toks = pyre.findall(r"[^ \t\r\n\f]+", t)
        # collapse-then-trim; SQL trim strips spaces only, but after the
        # collapse every edge run that WAS class-whitespace is a space
        ref_norm = pyre.sub(r"[ \t\r\n\f]+", " ", t.lower()).strip(" ")
        assert got[i][0] == ref_toks, (i, t)
        assert got[i][1] == len(ref_toks), (i, t)
        assert got[i][2] == ref_norm, (i, t)
    # the divergence this pins: Python WOULD split on \x0b / NBSP
    assert "a\x0bb".split() == ["a", "b"]
    assert "a b".split() == ["a", "b"]


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(texts=doc_texts)
def test_repetition_stats_matches_python_reference(spark, texts):
    """repetition_stats == a pure-Python Counter reference on arbitrary
    newline/whitespace-soup strings."""
    from collections import Counter

    from timeseriesflattener_spark.operators.text import repetition_stats

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}
    for i, t in rows:
        lines = [s.strip() for s in t.split("\n")]
        lines = [s for s in lines if s != ""]
        c = Counter(lines)
        n = len(lines)
        dup = n - len(c)
        dup_chars = sum(k * len(line) for line, k in c.items() if k > 1)
        total = sum(len(line) for line in lines)
        assert got[i]["n_lines"] == n, (i, t)
        assert got[i]["n_dup_lines"] == dup, (i, t)
        assert got[i]["dup_line_ratio"] == round(dup / max(n, 1), 9), (i, t)
        assert got[i]["dup_char_ratio"] == round(dup_chars / max(total, 1), 9), (i, t)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(texts=doc_texts)
def test_scrub_pii_matches_python_re(spark, texts):
    """scrub_pii's Java-regex chain == Python re with identical patterns
    (patterns are deliberately backreference/lookaround-free)."""
    import re as pyre

    from timeseriesflattener_spark.operators.text import PII_PATTERNS, scrub_pii
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", scrub_pii(F.col("text")).alias("s")).collect()
    }
    for i, t in rows:
        expect = t
        for kind in ("email", "digits", "phone"):
            expect = pyre.sub(PII_PATTERNS[kind], f"<{kind.upper()}>", expect)
        assert got[i] == expect, (i, t)


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab c\nd.!#*-…0189\t\r")),
            min_size=0,
            max_size=60,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_quality_rule_columns_match_python(spark, texts):
    """The round-4 Gopher rule inputs (symbol-to-word, mean word length,
    bullet/ellipsis line fractions, alpha-word ratio) == a pure-Python
    re implementation on arbitrary punctuation/newline soup."""
    import re as pyre

    from pyspark.sql import functions as F

    from timeseriesflattener_spark.operators import text as T

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in df.select(
            "doc_id",
            T.symbol_word_ratio(F.col("text")).alias("sw"),
            T.mean_word_length(F.col("text")).alias("mwl"),
            T.bullet_line_ratio(F.col("text")).alias("bl"),
            T.ellipsis_line_ratio(F.col("text")).alias("el"),
            T.alpha_word_ratio(F.col("text")).alias("aw"),
        ).collect()
    }
    for i, t in rows:
        toks = t.split()  # \S+ runs — the engine's token definition
        nt = max(len(toks), 1)
        sw = (len(pyre.findall("#", t)) + len(pyre.findall(r"\.\.\.", t))) / nt
        mwl = len(pyre.sub(r"\s+", "", t)) / nt
        lines = [s.strip() for s in t.split("\n")]
        lines = [s for s in lines if s != ""]
        nl = max(len(lines), 1)
        bl = sum(1 for s in lines if pyre.search(r"^[-*•]", s)) / nl
        el = sum(1 for s in lines if pyre.search(r"(\.\.\.|…)$", s)) / nl
        aw = sum(1 for s in toks if pyre.search("[A-Za-z]", s)) / nt
        assert got[i]["sw"] == sw, (i, repr(t))
        assert got[i]["mwl"] == mwl, (i, repr(t))
        assert got[i]["bl"] == bl, (i, repr(t))
        assert got[i]["el"] == el, (i, repr(t))
        assert got[i]["aw"] == aw, (i, repr(t))


# ---------------------------------------------- r7 property tests


zbits_pairs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=(1 << 20) - 1),
        st.integers(min_value=0, max_value=(1 << 20) - 1),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(pairs=zbits_pairs, bits=st.integers(min_value=1, max_value=20))
def test_zorder_key_property_matches_python(spark, pairs, bits):
    """zorder_key == the Python bit interleave for arbitrary (a, b, bits),
    including values above 2^bits (masked-alias contract)."""
    from timeseriesflattener_spark.operators.layout import zorder_key
    import pyspark.sql.functions as F

    def pyz(a, b):
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], "i long, a long, b long"
    )
    got = {
        r["i"]: r["z"]
        for r in df.select(
            "i", zorder_key(F.col("a"), F.col("b"), bits=bits).alias("z")
        ).collect()
    }
    for i, (a, b) in enumerate(pairs):
        assert got[i] == pyz(a, b), (a, b, bits)


shape_events = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),       # entity
        st.integers(min_value=0, max_value=5000),    # seconds offset
        st.sampled_from(["u", "a", "t"]),            # type
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(rows=shape_events)
def test_conversation_shape_property_matches_python(spark, rows):
    """conversation_shape == a Python scan over (ts, order)-sorted events
    for arbitrary micro-streams (duplicate timestamps included — the
    order column pins adjacency)."""
    from timeseriesflattener_spark.operators.sessions import conversation_shape

    data = [
        (str(e), i, t, BASE + dt.timedelta(seconds=s))
        for i, (e, s, t) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, ts timestamp"
    ).repartition(5)
    got = {
        r["conv_id"]: (
            r["n_events"], r["n_types"], r["span_us"], r["max_gap_us"], r["n_repeats"]
        )
        for r in conversation_shape(df, type_col="role").collect()
    }
    by_entity = {}
    for e, i, t, ts in data:
        by_entity.setdefault(e, []).append((int(ts.timestamp() * 1_000_000), i, t))
    for e, evs in by_entity.items():
        evs.sort()
        us = [x[0] for x in evs]
        types = [x[2] for x in evs]
        gaps = [b - a for a, b in zip(us, us[1:])]
        expect = (
            len(evs),
            len(set(types)),
            us[-1] - us[0],
            max(gaps) if gaps else 0,
            sum(1 for a, b in zip(types, types[1:]) if a == b),
        )
        assert got[e] == expect, (e, evs)
