"""Contract queries: RBAC catalog / role matrix / effective
permissions / membership checks (models/rbac.py + services/rbac.py).

The catalog and matrix oracles are generated from the same literal
constants the operator ships (the reference hard-codes them in
models/rbac.py); the user-facing queries are data-driven over the
driver ``events`` table via the planted role bands.
"""

from __future__ import annotations

from chrono_scraper_spark.operators import rbac as RB


def _ev(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_rbac_catalog(spark, sf_dir):
    """Permission catalog with derived fields (rbac.py:225-240)."""
    return RB.permission_catalog(spark)


def q_rbac_role_matrix(spark, sf_dir):
    """DEFAULT_ROLES (role, permission) matrix
    (models/rbac.py:179-250)."""
    return RB.role_matrix(spark)


def q_rbac_user_permissions(spark, sf_dir):
    """Effective permissions per user (rbac.py:184-205)."""
    return RB.user_permissions(_ev(spark, sf_dir))


def q_rbac_check(spark, sf_dir):
    """user_has_permission probes (rbac.py:207-222)."""
    return RB.permission_checks(_ev(spark, sf_dir))


_TITLE = ("array_to_string(list_transform(string_split({s}, ' '), "
          "w -> upper(w[1]) || w[2:]), ' ')")

_NAMES = ", ".join(f"'{p}'" for p in RB.PERMISSIONS)

SQL_RBAC_CATALOG = f"""WITH names AS (
  SELECT unnest([{_NAMES}]) AS name),
d AS (
  SELECT name, string_split(name, ':')[1] AS resource,
    string_split(name, ':')[2] AS action
  FROM names)
SELECT name, resource, action,
  {_TITLE.format(s='action')} || ' '
  || {_TITLE.format(s="replace(resource, '_', ' ')")} AS description
FROM d"""

_MATRIX_ROWS = ", ".join(
    f"('{r}', '{p}')" for r, ps in RB.ROLE_PERMS.items() for p in ps)

SQL_RBAC_ROLE_MATRIX = f"""SELECT role, permission,
  TRUE AS is_system_role
FROM (VALUES {_MATRIX_ROWS}) AS m(role, permission)"""

_ROLE_CASE = """CASE WHEN user_id % 50 = 0 THEN 'super_admin'
       WHEN user_id % 10 = 9 THEN 'admin'
       WHEN user_id % 10 >= 6 THEN 'researcher'
       ELSE 'viewer' END"""

SQL_RBAC_USER_PERMISSIONS = f"""WITH u AS (
  SELECT DISTINCT user_id, {_ROLE_CASE} AS role FROM events),
m AS (SELECT role, permission
      FROM (VALUES {_MATRIX_ROWS}) AS m(role, permission))
SELECT u.user_id, u.role, m.permission
FROM u JOIN m USING (role)"""

_PROBES = ", ".join(f"'{p}'" for p in RB.PROBES)

SQL_RBAC_CHECK = f"""WITH u AS (
  SELECT DISTINCT user_id, {_ROLE_CASE} AS role FROM events),
p AS (SELECT unnest([{_PROBES}]) AS permission),
m AS (SELECT role, permission, TRUE AS has
      FROM (VALUES {_MATRIX_ROWS}) AS m(role, permission))
SELECT u.user_id, u.role, p.permission,
  coalesce(m.has, FALSE) AS allowed
FROM u CROSS JOIN p
LEFT JOIN m ON m.role = u.role AND m.permission = p.permission"""


QUERIES = {
    "rbac_catalog": q_rbac_catalog,
    "rbac_role_matrix": q_rbac_role_matrix,
    "rbac_user_permissions": q_rbac_user_permissions,
    "rbac_check": q_rbac_check,
}

ORACLES = {
    "rbac_catalog": SQL_RBAC_CATALOG,
    "rbac_role_matrix": SQL_RBAC_ROLE_MATRIX,
    "rbac_user_permissions": SQL_RBAC_USER_PERMISSIONS,
    "rbac_check": SQL_RBAC_CHECK,
}
