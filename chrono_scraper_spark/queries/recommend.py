"""Contract queries: recommendation engine + search suggestions family.

Spark side runs ``operators/recommend.py``; oracles replay the same
policies in DuckDB SQL. The interaction log is PLANTED deterministically
from the driver ``events`` table by an identical formula on both
engines (no external data):

* interaction_type: view→view, click→similar_content, purchase→export,
  signup→search (the reference's four weighted interaction kinds,
  recommendation_engine.py:29-34); 'error' events drop.
* doc_id = (event_id·13 + 7) mod |documents| — a page association for
  every interaction.
* query (search rows) = 'term' || (event_id·11 mod 30) — a small query
  vocabulary so suggestion frequencies and prefix matches both vary.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chrono_scraper_spark.operators import recommend as R

_STOP_SQL = ", ".join(f"'{w}'" for w in R.STOPWORDS)

# shared planted-interaction CTEs (DuckDB). `inter` is the interaction
# log; `topics` the per-doc keyword table; `viewed`/`usrc`/`ulng`/`utop`
# the user preference sets. All MATERIALIZED: each is referenced 2-3×
# downstream and DuckDB otherwise re-inlines the whole chain per
# reference.
_INTER_CTES = f"""inter AS MATERIALIZED (
  SELECT user_id,
    (event_id * 13 + 7) % (SELECT count(*) FROM documents) AS doc_id,
    CASE event_type WHEN 'view' THEN 'view'
         WHEN 'click' THEN 'similar_content'
         WHEN 'purchase' THEN 'export'
         WHEN 'signup' THEN 'search' END AS interaction_type,
    CASE WHEN event_type = 'signup'
         THEN 'term' || CAST((event_id * 11) % 30 AS VARCHAR) END
      AS query,
    ts
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase', 'signup')),
tok AS MATERIALIZED (
  SELECT doc_id, w
  FROM documents,
       unnest(string_split_regex(lower(text), '\\s+')) AS t(w)
  WHERE length(w) > 3 AND regexp_matches(w, '^[a-z]+$')
    AND w NOT IN ({_STOP_SQL})),
topics AS MATERIALIZED (
  SELECT doc_id, w AS topic, n FROM (
    SELECT doc_id, w, count(*) AS n,
      row_number() OVER (PARTITION BY doc_id
                         ORDER BY count(*) DESC, w ASC) AS r
    FROM tok GROUP BY doc_id, w HAVING count(*) > 1)
  WHERE r <= 10),
viewed AS MATERIALIZED (
  SELECT DISTINCT user_id, doc_id FROM inter
  WHERE interaction_type = 'view'),
usrc AS MATERIALIZED (
  SELECT DISTINCT v.user_id, d.source
  FROM viewed v JOIN documents d USING (doc_id)),
ulng AS MATERIALIZED (
  SELECT DISTINCT v.user_id, d.lang
  FROM viewed v JOIN documents d USING (doc_id)),
utop AS MATERIALIZED (
  SELECT DISTINCT v.user_id, t.topic
  FROM viewed v JOIN topics t USING (doc_id)),
users AS MATERIALIZED (SELECT DISTINCT user_id FROM inter)"""


def interactions_view(spark, sf_dir):
    """The planted interaction log: (user_id, doc_id, interaction_type,
    query, ts) — same formulas as the ``inter`` oracle CTE."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # |documents| enters the plan as a broadcast 1-row aggregate instead of
    # an eager .count() job — each recommend query used to pay a separate
    # full-scan count before its own plan even ran (4× per driver pass).
    n_docs = F.broadcast(docs.agg(F.count("*").alias("__n_docs")))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    itype = (F.when(F.col("event_type") == "view", "view")
             .when(F.col("event_type") == "click", "similar_content")
             .when(F.col("event_type") == "purchase", "export")
             .when(F.col("event_type") == "signup", "search"))
    return (ev.withColumn("interaction_type", itype)
            .filter(F.col("interaction_type").isNotNull())
            .crossJoin(n_docs)
            .withColumn("doc_id",
                        (F.col("event_id") * 13 + 7) % F.col("__n_docs"))
            .drop("__n_docs")
            .withColumn("query", F.when(
                F.col("interaction_type") == "search",
                F.concat(F.lit("term"),
                         ((F.col("event_id") * 11) % 30).cast("string"))))
            .select("user_id", "doc_id", "interaction_type", "query",
                    "ts"))


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_recommend_content(spark, sf_dir):
    """Content-based recommendations for every user: reference scoring
    (domain/language/topic-overlap/title/length) in integer milli units
    over the 40 most recent content-bearing pages, viewed excluded,
    top-10 per user (recommendation_engine.py:228-355)."""
    return R.recommend_content(_docs(spark, sf_dir),
                               interactions_view(spark, sf_dir))


SQL_RECOMMEND_CONTENT = f"""WITH {_INTER_CTES},
pool AS MATERIALIZED (
  SELECT doc_id, source, lang, n_chars FROM documents
  WHERE n_chars > 100 ORDER BY doc_id DESC LIMIT 40),
unt AS MATERIALIZED (
  SELECT user_id, count(*) AS n_topics FROM utop GROUP BY 1),
ov AS MATERIALIZED (
  SELECT u.user_id, t.doc_id, count(*) AS overlap
  FROM utop u JOIN topics t USING (topic)
  JOIN pool p ON t.doc_id = p.doc_id
  GROUP BY 1, 2),
cand AS MATERIALIZED (
  SELECT us.user_id, p.doc_id, p.source, p.lang, p.n_chars
  FROM users us CROSS JOIN pool p
  WHERE NOT EXISTS (SELECT 1 FROM viewed v
                    WHERE v.user_id = us.user_id
                      AND v.doc_id = p.doc_id)),
scored AS MATERIALIZED (
  SELECT c.user_id, c.doc_id, c.source,
    CAST(CASE WHEN s.source IS NOT NULL THEN 300 ELSE 0 END
       + CASE WHEN l.lang IS NOT NULL THEN 200 ELSE 0 END
       + (400 * coalesce(o.overlap, 0))
         // greatest(1, coalesce(n.n_topics, 0))
       + CASE WHEN c.doc_id % 7 <> 0 THEN 100 ELSE 0 END
       + CASE WHEN c.n_chars > 400 THEN 100 ELSE 0 END AS BIGINT)
      AS score_milli
  FROM cand c
  LEFT JOIN usrc s ON s.user_id = c.user_id AND s.source = c.source
  LEFT JOIN ulng l ON l.user_id = c.user_id AND l.lang = c.lang
  LEFT JOIN ov o ON o.user_id = c.user_id AND o.doc_id = c.doc_id
  LEFT JOIN unt n ON n.user_id = c.user_id)
SELECT user_id, doc_id, source, score_milli, CAST(r AS INT) AS rec_rank
FROM (SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY score_milli DESC, doc_id ASC) AS r
      FROM scored WHERE score_milli > 100)
WHERE r <= 10"""


def q_trending_pages(spark, sf_dir):
    """Interaction-weighted trending over a trailing 7-day window with
    linear time decay, content-gated, top-20
    (recommendation_engine.py:410-468 upgraded to association counts)."""
    return R.trending_pages(interactions_view(spark, sf_dir),
                            _docs(spark, sf_dir))


SQL_TRENDING_PAGES = f"""WITH {_INTER_CTES},
evw AS MATERIALIZED (
  SELECT doc_id,
    CASE interaction_type WHEN 'view' THEN 100 WHEN 'search' THEN 200
         WHEN 'similar_content' THEN 150 WHEN 'export' THEN 300 END
      AS w,
    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
  FROM inter),
mx AS MATERIALIZED (SELECT max(ts_s) AS now_s FROM evw),
sc AS MATERIALIZED (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_recent,
    CAST(sum(w * (604800 - age_s)) AS BIGINT) AS trend_score
  FROM (SELECT doc_id, w, (SELECT now_s FROM mx) - ts_s AS age_s
        FROM evw)
  WHERE age_s < 604800 GROUP BY 1)
SELECT doc_id, source, n_recent, trend_score, CAST(r AS INT) AS trend_rank
FROM (SELECT s.doc_id, d.source, s.n_recent, s.trend_score,
        row_number() OVER (ORDER BY s.trend_score DESC, s.doc_id ASC)
          AS r
      FROM sc s JOIN documents d USING (doc_id)
      WHERE d.n_chars > 300)
WHERE r <= 20"""


def q_search_suggest(spark, sf_dir):
    """Prefix → top completions from accumulated search history:
    frequency-accumulated suggestions, score = min(1, 0.1·freq) in deci
    units, substring match on 'term1', score/frequency/text ordering
    (library_service.py:435-504)."""
    return R.search_suggest(interactions_view(spark, sf_dir), "term1")


SQL_SEARCH_SUGGEST = f"""WITH {_INTER_CTES},
agg AS MATERIALIZED (
  SELECT user_id, lower(query) AS suggestion,
    CAST(count(*) AS BIGINT) AS frequency
  FROM inter
  WHERE interaction_type = 'search' AND query IS NOT NULL
  GROUP BY 1, 2)
SELECT user_id, suggestion, frequency,
  CAST(least(10, frequency) AS INT) AS score_deci,
  CAST(r AS INT) AS sug_rank
FROM (SELECT *, row_number() OVER (
        PARTITION BY user_id
        ORDER BY least(10, frequency) DESC, frequency DESC,
                 suggestion ASC) AS r
      FROM agg WHERE contains(suggestion, 'term1'))
WHERE r <= 10"""


def q_discover_domains(spark, sf_dir):
    """Per user: most-paged domains they have NOT viewed, top-10
    (get_content_discovery_suggestions,
    recommendation_engine.py:468-527)."""
    return R.discover_domains(_docs(spark, sf_dir),
                              interactions_view(spark, sf_dir))


SQL_DISCOVER_DOMAINS = f"""WITH {_INTER_CTES},
cnt AS MATERIALIZED (
  SELECT source, CAST(count(*) AS BIGINT) AS page_count
  FROM documents GROUP BY 1)
SELECT user_id, source, page_count, CAST(r AS INT) AS dom_rank
FROM (SELECT u.user_id, c.source, c.page_count,
        row_number() OVER (PARTITION BY u.user_id
                           ORDER BY c.page_count DESC, c.source ASC)
          AS r
      FROM users u CROSS JOIN cnt c
      WHERE NOT EXISTS (SELECT 1 FROM usrc s
                        WHERE s.user_id = u.user_id
                          AND s.source = c.source))
WHERE r <= 10"""


QUERIES = {
    "recommend_content": q_recommend_content,
    "trending_pages": q_trending_pages,
    "search_suggest": q_search_suggest,
    "discover_domains": q_discover_domains,
}

ORACLES = {
    "recommend_content": SQL_RECOMMEND_CONTENT,
    "trending_pages": SQL_TRENDING_PAGES,
    "search_suggest": SQL_SEARCH_SUGGEST,
    "discover_domains": SQL_DISCOVER_DOMAINS,
}
