"""Text-analysis kernels: langid, quality, token counts, fingerprints,
minhash signatures (incl. DuckDB portability of the md5 hash family)."""

from __future__ import annotations

import hashlib

import duckdb
from pyspark.sql import functions as F

from chrono_scraper_spark.functions import textops as T


def test_langid_on_clear_samples(spark):
    rows = [
        ("the quick brown fox is on the hill and that is that", "en"),
        ("der hund ist mit der katze und das ist auch ein haus", "de"),
        ("le chat est dans la maison avec les enfants pour un jour", "fr"),
        ("el perro es una mascota y los gatos son de la casa", "es"),
        ("这是一个中文句子没有任何英文单词在里面", "zh"),
        ("zzz qqq xxx", "und"),
    ]
    df = spark.createDataFrame(rows, "text string, expected string")
    out = df.withColumn("lang", T.langid(F.col("text"))).collect()
    for r in out:
        assert r["lang"] == r["expected"], r["text"]


def test_token_counts(spark):
    df = spark.createDataFrame([("Hello, world! It's 42 degrees.",)], "t string")
    r = df.select(
        T.token_count_ws(F.col("t")).alias("ws"),
        T.token_count_bpe(F.col("t")).alias("bpe"),
    ).first()
    assert r["ws"] == 5
    # hello , world ! it ' s 42 degrees .  → 10
    assert r["bpe"] == 10


def test_quality_orders_sensibly(spark):
    good = ("The archive maintains a searchable index of documents and "
            "reports for the public, with analysis of research over time. "
            ) * 3
    bad = "@@ ## $$ %% ^^ && ** (( ))"
    df = spark.createDataFrame([(good,), (bad,), ("",)], "t string")
    out = {r["t"]: r["q"] for r in
           df.select("t", T.text_quality(F.col("t")).alias("q")).collect()}
    assert out[good] > out[bad]
    assert 0.0 <= out[bad] <= 1.0 and 0.0 <= out[""] <= 0.6


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame(
        [("a  b\tc",), ("A b c ",), ("a b d",)], "t string")
    fps = [r["fp"] for r in df.select(T.fingerprint(F.col("t")).alias("fp")).collect()]
    assert fps[0] == fps[1] != fps[2]
    assert fps[0] == hashlib.md5(b"a b c").hexdigest()


def test_shingles_and_minhash(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("",)], "t string")
    out = df.select(
        T.shingles(T.tokens(F.col("t")), 3).alias("sh"),
        T.minhash_signature(T.tokens(F.col("t")), 3, 4).alias("sig"),
        "t").collect()
    by_t = {r["t"]: r for r in out}
    assert by_t["a b c d"]["sh"] == ["a b c", "b c d"]
    assert by_t["a b"]["sh"] == ["a b"]          # short doc → single shingle
    assert by_t[""]["sh"] == []
    assert len(by_t["a b c d"]["sig"]) == 4
    assert by_t[""]["sig"] == [None, None, None, None]


def test_minhash_similarity_property(spark):
    """Near-identical docs share most minhash components; disjoint docs
    share none."""
    a = "the cat sat on the mat and looked at the dog near the door"
    b = a + " today"
    c = "completely different words entirely unrelated content here now"
    df = spark.createDataFrame([(0, a), (1, b), (2, c)], "id int, t string")
    sigs = {r["id"]: r["sig"] for r in df.select(
        "id", T.minhash_signature(T.tokens(F.col("t")), 3, 16).alias("sig")
    ).collect()}
    agree_ab = sum(x == y for x, y in zip(sigs[0], sigs[1]))
    agree_ac = sum(x == y for x, y in zip(sigs[0], sigs[2]))
    assert agree_ab >= 8 and agree_ac == 0


def test_minhash_matches_duckdb_formula(spark):
    """The md5-family signature must be reproducible in DuckDB SQL — the
    portability contract the oracle checks rely on."""
    text = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame([(text,)], "t string")
    sig = df.select(
        T.minhash_signature(T.tokens(F.col("t")), 3, 4).alias("sig")).first()["sig"]
    duck = duckdb.sql(f"""
        WITH toks AS (
          SELECT list_filter(string_split(lower('{text}'), ' '),
                             t -> t != '') AS tok
        ), sh AS (
          SELECT list_transform(range(1, len(tok) - 1),
                                j -> array_to_string(tok[j:j+2], ' ')) AS s
          FROM toks
        )
        SELECT [list_min(list_transform(s, x -> md5(i || ':' || x)))
                for i in range(0, 4)] AS sig
        FROM sh
    """).fetchone()[0]
    assert sig == list(duck)


def test_winnow_fingerprints_known_example(spark):
    """Hand-checkable winnowing guarantee: a substring match of length
    >= w+k-1 between two docs shares at least one fingerprint; disjoint
    docs share none."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    edited = "THE QUICK  brown fox... jumps over the lazy dog NOW then"
    other = "completely unrelated words about spark executors and shuffles"
    rows = spark.createDataFrame(
        [(1, base), (2, edited), (3, other), (4, ""), (5, None), (6, "ab")],
        "id int, t string").select(
        "id", T.winnow_fingerprints(F.col("t"), k=8, w=4).alias("fps")
    ).collect()
    fps = {r["id"]: set(r["fps"]) for r in rows}
    assert fps[1] & fps[2], "normalization-stable overlap must survive edits"
    assert not (fps[1] & fps[3])
    assert fps[4] == set() and fps[5] == set()
    assert len(fps[6]) == 0  # shorter than one gram -> empty
    # sorted distinct
    r1 = [r for r in rows if r["id"] == 1][0]["fps"]
    assert r1 == sorted(set(r1))


def test_winnow_fingerprints_matches_duckdb_twin(spark):
    from chrono_scraper_spark.functions.oracle_gen import winnow_fingerprints_sql

    text = "Some repeated phrase here; some repeated phrase there!"
    got = spark.createDataFrame([(text,)], "t string").select(
        T.winnow_fingerprints(F.col("t"), k=8, w=4).alias("fps")
    ).first()["fps"]
    want = duckdb.sql(
        f"SELECT {winnow_fingerprints_sql(repr(text))} AS fps").fetchone()[0]
    assert got == list(want)


def test_script_profile(spark):
    from chrono_scraper_spark.functions.textops import script_profile

    df = spark.createDataFrame(
        [("ru", "привет abc"),        # cyrillic 6 > latin 3
         ("zh", "漢字"),
         ("empty", ""),
         ("punct", "123 !!! ..."),    # no script letters at all
         ("tie", "abcАБВ")],          # 3 vs 3 -> name-desc tie-break
        "name string, text string")
    got = {r["name"]: r for r in script_profile(df).collect()}
    ru = got["ru"]
    assert (ru["n_cyrillic"], ru["n_latin"]) == (6, 3)
    assert ru["script_total"] == 9
    assert ru["cyrillic_ppm"] == 6_000_000 // 9
    assert ru["dominant_script"] == "cyrillic"
    assert got["zh"]["dominant_script"] == "han"
    for name in ("empty", "punct"):
        assert got[name]["script_total"] == 0
        assert got[name]["dominant_script"] is None
        assert got[name]["latin_ppm"] == 0
    # documented tie-break: name descending ('latin' > 'cyrillic')
    assert got["tie"]["dominant_script"] == "latin"


def test_script_profile_null_text_and_plan(spark):
    from chrono_scraper_spark.functions.textops import script_profile

    df = spark.createDataFrame([("a", None)], "name string, text string")
    r = script_profile(df).collect()[0]
    assert r["script_total"] == 0 and r["dominant_script"] is None
    plan = script_profile(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
