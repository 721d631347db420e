"""SQL query analysis (operators/queryplan.py vs the reference's
query_analyzer.py fallback-parse / predictor / suggester semantics)."""

from __future__ import annotations

from pyspark.sql import Row

from chrono_scraper_spark.operators import queryplan as QP


def _q(spark, *queries):
    return spark.createDataFrame(
        [Row(qid=i, query=q) for i, q in enumerate(queries)])


class TestFallbackParse:
    def test_simple_select(self, spark):
        out = QP.analyze(_q(
            spark, "SELECT id, name FROM users WHERE id = 7")).collect()[0]
        assert out.query_type == "simple_select"
        assert out.complexity == "simple"        # score 1 (one table)
        assert out.complexity_score == 1
        assert out.tables == "users"
        assert out.join_count == 0
        assert out.subquery_count == 0

    def test_join_substring_quirk(self, spark):
        # 'JOIN' is a substring of 'INNER JOIN' so the fallback counts
        # BOTH join types (query_analyzer.py:337-340)
        out = QP.analyze(_q(
            spark,
            "SELECT a.x FROM pages a INNER JOIN users b ON a.id = b.id",
        )).collect()[0]
        assert out.join_count == 2
        assert out.tables == "pages|users"
        # score = 2 tables + 2*2 joins = 6 → moderate
        assert out.complexity == "moderate"

    def test_keyword_substring_quirk(self, spark):
        # 'BY' hits inside 'GROUP BY' and the aggregation list needs
        # the '(' suffix (:318-321, :344-347)
        out = QP.analyze(_q(
            spark, "SELECT host, COUNT(id) FROM pages GROUP BY host",
        )).collect()[0]
        assert "BY" in out.operations.split("|")
        assert out.agg_count == 1
        assert out.query_type == "analytics"

    def test_cte_and_subqueries(self, spark):
        q = ("WITH t AS (SELECT host FROM pages) "
             "SELECT * FROM t WHERE host IN (SELECT host FROM users)")
        out = QP.analyze(_q(spark, q)).collect()[0]
        assert out.has_cte is True
        assert out.subquery_count == 2            # 3 SELECTs - 1
        # tables: pages, t, users → 3 + subq 6 + cte 3 = 12 → complex
        assert out.complexity_score == 12
        assert out.complexity == "complex"

    def test_insert_classification(self, spark):
        out = QP.analyze(_q(
            spark, "INSERT INTO pages SELECT * FROM documents",
        )).collect()[0]
        assert out.query_type == "insert"


class TestPredict:
    def test_point_lookup_routes_postgresql(self, spark):
        out = QP.predict(_q(
            spark, "SELECT id FROM users WHERE id = 1")).collect()[0]
        # no factors fire: cost = 1000 + 10000 rows = 11000 milli
        assert out.cost_milli == 11_000
        assert out.estimated_rows == 100
        assert out.duration_milli == 100
        # pg = 500+200(single table no agg)+100(dur<1s) = 800 vs duck 500
        assert out.recommended_database == "postgresql"
        assert out.confidence_milli == 300

    def test_join_factor_exact(self, spark):
        # join_count 2 (INNER JOIN + JOIN substring): factor
        # floor(sqrt(8)·1000) = 2828; rows = min(2.12M·2, 2.12M·10)
        q = ("SELECT a.x FROM pages a INNER JOIN documents b "
             "ON a.id = b.id")
        out = QP.predict(_q(spark, q)).collect()[0]
        total = 2_000_000 + 120_000
        assert out.cost_milli == (1_000 + total) * 2_828 // 1_000
        assert out.estimated_rows == total * 2
        assert out.duration_milli == 100 * 2_828 // 1_000   # 282
        assert out.recommended_database == "duckdb"  # rows>10k +200

    def test_agg_reduces_rows(self, spark):
        out = QP.predict(_q(
            spark, "SELECT host, COUNT(id) FROM pages GROUP BY host",
        )).collect()[0]
        # agg factor 1200; rows 100 → max(100//10,1) = 10
        assert out.estimated_rows == 10
        assert out.duration_milli == 100 * 1_200 // 1_000   # 120


class TestSuggest:
    def test_four_way_join_hints(self, spark):
        q = ("SELECT a.id FROM pages a INNER JOIN events b ON a.id = "
             "b.page_id LEFT JOIN users c ON b.user_id = c.id "
             "RIGHT JOIN documents d ON a.doc_id = d.id")
        rows = QP.suggest(_q(spark, q)).collect()
        items = {(r.kind, r.item) for r in rows}
        # join_count 4 > 3 (:512-514)
        assert ("hint", "optimize_join_order") in items
        assert ("risk", "Complex join pattern detected") in items
        # pages > 1M rows → partition hint; pages is indexed so no
        # table-driven add_index (:521-527)
        assert ("hint", "partition_table") in items
        # result set 2.63M·4 > 100k with no LIMIT keyword (:503-509)
        assert ("risk", "Large result set (>100k rows)") in items
        assert ("risk", "No LIMIT clause for large result set") in items

    def test_unindexed_big_table_add_index(self, spark):
        rows = QP.suggest(_q(
            spark, "SELECT term FROM terms WHERE term = 'x'")).collect()
        items = {(r.kind, r.item) for r in rows}
        # terms: 1.5M rows, no indexes → both table hints
        assert ("hint", "partition_table") in items
        assert ("hint", "add_index") in items

    def test_scan_types(self, spark):
        rows = QP.scan_types(_q(
            spark, "SELECT host, COUNT(id) FROM pages GROUP BY host",
        )).collect()
        assert [(r.table_name, r.scan_type) for r in rows] == [
            ("pages", "hash_aggregate")]
