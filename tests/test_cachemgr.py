"""Cache-level assignment + stats (operators/cachemgr.py vs
intelligent_cache_manager.py semantics)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from chrono_scraper_spark.operators import cachemgr as CM


def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=eid, ts=dt.datetime(2024, 1, 1), user_id=u,
             event_type=et) for eid, u, et in rows])


class TestLevelAssign:
    def test_branch_boundaries(self, spark):
        # event 25: size 25·811=20275 ≥10KB, ttl 1325 >300 → redis
        # event 101: size 81911, ttl 5353 >3600 but size ≥10KB → redis
        # event 3: size 2433, ttl 159 ≤300 → persistent
        # event 5000: size 4055000 % 1.5e6 = 1055000 ≥ 1MB → persistent
        rows = [(25, 1, "view"), (101, 1, "view"), (3, 1, "view"),
                (5000, 1, "view")]
        out = {r.entry_id: r
               for r in CM.level_assign(_ev(spark, rows)).collect()}
        assert out[25].cache_level == "redis"
        assert out[101].cache_level == "redis"
        assert out[3].cache_level == "persistent"
        assert out[5000].cache_level == "persistent"
        # compression gate at 1KB (:177)
        assert out[3].compression_candidate is True
        assert out[25].compression_candidate is True

    def test_small_but_stale_is_redis(self, spark):
        # id 9: size 7299 < 10KB but ttl 477 ≤ 3600 → redis, not memory
        out = CM.level_assign(_ev(spark, [(9, 1, "view")])).collect()[0]
        assert out.cache_level == "redis"

    def test_memory_branch_exact(self, spark):
        # id 1850: size 1850·811 % 1.5e6 = 350 < 10KB and
        # ttl 98050 % 7200 = 4450 > 3600 → memory (the moduli were
        # picked so this branch has rows inside the sf0.01 id range)
        out = CM.level_assign(
            _ev(spark, [(1850, 1, "view")])).collect()[0]
        assert out.result_size == 350
        assert out.ttl_seconds == 4450
        assert out.cache_level == "memory"
        assert out.compression_candidate is False   # 350 < 1KB


class TestStats:
    def test_rates_and_topk(self, spark):
        rows = ([(i, 1, "click") for i in range(3)]
                + [(10 + i, 2, "view") for i in range(2)]
                + [(20, 3, "click")])
        stats = CM.cache_stats(_ev(spark, rows)).collect()[0]
        assert stats.total_entries == 3
        assert (stats.hits, stats.misses) == (4, 2)
        assert stats.hit_rate_milli == 4 * 1000 // 6   # 666
        assert stats.miss_rate_milli == 333
        top = CM.top_keys(_ev(spark, rows)).collect()
        assert [(r.rank, r.key) for r in top] == [(1, 1), (2, 2), (3, 3)]
