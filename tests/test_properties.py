"""Property-based tests (hypothesis): engine operators vs pure-Python
references on randomized inputs. Each example generates a whole batch of
rows so one hypothesis example = one Spark job, keeping runtime sane."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from chrono_scraper_spark.functions.urls import url_canon
from chrono_scraper_spark.operators.intervals import merge_intervals
from chrono_scraper_spark.operators.quality import gopher_signals

SET = settings(max_examples=10, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])

# printable ASCII + newlines/bullets/ellipses so line rules fire
_text = st.text(alphabet="abcdefghij XYZ0189#.?&-*•…\n",
                min_size=0, max_size=120)


def _py_merge(intervals):
    ivs = sorted(intervals)
    out = []
    for s, e in ivs:
        if out and s <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((s, e))
    return out


@SET
@given(st.lists(st.tuples(st.integers(0, 1000), st.integers(0, 200)),
                min_size=1, max_size=40))
def test_merge_intervals_property(spark, raw):
    ivs = [(s, s + d) for s, d in raw]
    df = spark.createDataFrame([(1, s, e) for s, e in ivs],
                               ["key", "start", "end"])
    got = sorted((r["start"], r["end"]) for r in
                 merge_intervals(df, "key", "start", "end").collect())
    assert got == _py_merge(ivs)


@SET
@given(st.lists(_text, min_size=1, max_size=25))
def test_gopher_signals_property(spark, texts):
    from .test_quality import py_signals
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in gopher_signals(df).collect()}
    for i, t in rows:
        exp = py_signals(t)
        for k, v in exp.items():
            assert abs(got[i][k] - v) < 1e-9, (k, repr(t))


_urlish = st.text(
    alphabet=st.sampled_from(list("abcz019:/?&=#._-%")), max_size=60)


@SET
@given(st.lists(_urlish, min_size=1, max_size=40))
def test_url_canon_idempotent_and_fragment_free(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(url_canon(F.col("url")).alias("c"))
    twice = once.select(url_canon(F.col("c")).alias("c2"), F.col("c"))
    assert twice.filter(F.col("c2") != F.col("c")).count() == 0
    assert once.filter(F.col("c").contains("#")).count() == 0


@SET
@given(st.lists(st.text(alphabet=st.sampled_from(list("ab \t\n")),
                        max_size=40), min_size=1, max_size=30))
def test_fingerprint_whitespace_invariant(spark, texts):
    """fingerprint() must be invariant under whitespace normalization."""
    import hashlib

    from chrono_scraper_spark.functions.textops import fingerprint
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i long, text string")
    got = {r["i"]: r["fp"] for r in df.select(
        "i", fingerprint(F.col("text")).alias("fp")).collect()}
    for i, t in enumerate(texts):
        norm = re.sub(r"\s+", " ", t.strip().lower())
        assert got[i] == hashlib.md5(norm.encode()).hexdigest()


@SET
@given(st.data())
def test_asof_join_matches_pandas_merge_asof(spark, data):
    import pandas as pd

    from chrono_scraper_spark.operators.asof import asof_join

    n_keys = data.draw(st.integers(1, 3))
    left_rows = data.draw(st.lists(
        st.tuples(st.integers(0, n_keys - 1), st.integers(0, 1000)),
        min_size=1, max_size=30))
    right_rows = data.draw(st.lists(
        st.tuples(st.integers(0, n_keys - 1), st.integers(0, 1000),
                  st.integers(-99, 99)),
        min_size=0, max_size=30))
    # pandas merge_asof keeps ONE row per equal right (k, ts); the engine
    # keeps the last-in-window one — dedup right keys to align semantics
    seen, rr = set(), []
    for k, ts, v in right_rows:
        if (k, ts) not in seen:
            seen.add((k, ts))
            rr.append((k, ts, v))

    left = spark.createDataFrame(
        [(i, k, pd.Timestamp(ts, unit="s").to_pydatetime())
         for i, (k, ts) in enumerate(left_rows)],
        "lid int, k int, ts timestamp")
    right = spark.createDataFrame(
        [(k, pd.Timestamp(ts, unit="s").to_pydatetime(), v)
         for k, ts, v in rr],
        "k int, ts timestamp, v int") if rr else spark.createDataFrame(
        [], "k int, ts timestamp, v int")
    got = {r["lid"]: (r["asof_v"], r["asof_ts"])
           for r in asof_join(left, right, on=["k"]).collect()}

    lpd = pd.DataFrame([(i, k, pd.Timestamp(ts, unit="s"))
                        for i, (k, ts) in enumerate(left_rows)],
                       columns=["lid", "k", "ts"]).sort_values("ts",
                                                               kind="stable")
    rpd = pd.DataFrame(rr, columns=["k", "ts", "v"])
    rpd["k"] = rpd["k"].astype("int64")
    rpd["ts"] = pd.to_datetime(rpd["ts"], unit="s")
    rpd = rpd.sort_values("ts", kind="stable")
    exp = pd.merge_asof(lpd, rpd, on="ts", by="k", direction="backward")
    assert len(got) == len(left_rows)
    for _, row in exp.iterrows():
        g_v, g_ts = got[row["lid"]]
        if pd.isna(row["v"]):
            assert g_v is None and g_ts is None
        else:
            assert g_v == row["v"]
