"""RBAC catalog / matrix / effective permissions (operators/rbac.py vs
models/rbac.py + services/rbac.py semantics)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from chrono_scraper_spark.operators import rbac as RB


def _ev(spark, user_ids):
    return spark.createDataFrame(
        [Row(event_id=i, ts=dt.datetime(2024, 1, 1), user_id=u,
             event_type="view") for i, u in enumerate(user_ids)])


class TestCatalog:
    def test_derived_fields(self, spark):
        rows = {r.name: r for r in
                RB.permission_catalog(spark).collect()}
        assert len(rows) == 27
        # resource, action = name.split(':', 1) (rbac.py:231)
        assert rows["api_config:read"].resource == "api_config"
        assert rows["api_config:read"].action == "read"
        # description = action.title() + resource with underscores
        # spaced and title-cased (:235)
        assert rows["api_config:read"].description == "Read Api Config"
        assert rows["user:approve"].description == "Approve User"


class TestRoleMatrix:
    def test_cardinalities(self, spark):
        rows = RB.role_matrix(spark).collect()
        by_role = {}
        for r in rows:
            by_role.setdefault(r.role, set()).add(r.permission)
        # models/rbac.py:179-250 list sizes
        assert len(by_role["super_admin"]) == 27
        assert len(by_role["admin"]) == 21
        assert len(by_role["researcher"]) == 16
        assert len(by_role["viewer"]) == 6
        # researcher has no admin surface, viewer is read-only
        assert "admin:view" not in by_role["researcher"]
        assert all(p.split(":")[1] in ("read", "view")
                   for p in by_role["viewer"])
        # admin lacks user:create/delete and admin:manage
        assert "user:delete" not in by_role["admin"]
        assert "admin:manage" not in by_role["admin"]


class TestUserPermissions:
    def test_role_bands_and_counts(self, spark):
        out = RB.user_permissions(_ev(spark, [3, 7, 19, 100])).collect()
        per_user = {}
        for r in out:
            per_user.setdefault(r.user_id, []).append(r.permission)
        assert len(per_user[3]) == 6       # viewer
        assert len(per_user[7]) == 16      # researcher
        assert len(per_user[19]) == 21     # admin
        assert len(per_user[100]) == 27    # super_admin (superuser)

    def test_checks(self, spark):
        out = {(r.user_id, r.permission): r.allowed
               for r in RB.permission_checks(_ev(spark, [3, 19])).collect()}
        assert out[(3, "scrape:view")] is True
        assert out[(3, "project:create")] is False   # viewer
        assert out[(19, "admin:view")] is True       # admin
        assert out[(19, "user:delete")] is False     # super_admin only
