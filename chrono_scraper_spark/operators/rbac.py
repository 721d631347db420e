"""Role-based access control: permission catalog, role matrix,
effective user permissions.

Reference: ``backend/app/models/rbac.py`` — the ``PermissionType``
catalog (:14-52), ``DEFAULT_ROLES`` matrix (:179-250: super_admin =
all 27, admin = 21, researcher = 16, viewer = 6) — and
``backend/app/services/rbac.py`` — catalog derivation
(``initialize_default_permissions`` :225-240: ``resource, action =
name.split(':', 1)``, description = title-cased action + resource),
effective permissions with the superuser bypass
(``get_user_permissions`` :184-205) and the membership check
(``user_has_permission`` :207-222).

Planted role assignment mirrors the plan-tier bands (consistent with
``operators/plans.py``): ``user_id % 50 == 0`` → super_admin (also
``is_superuser``), ``% 10 == 9`` → admin, ``% 10`` 6-8 → researcher,
else viewer.

Scale shape: the catalog/matrix are literal in-memory frames; user
permissions are one broadcast join of the user dimension against the
70-row matrix — zero corpus shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: models/rbac.py:14-52 PermissionType, in declaration order
PERMISSIONS = [
    "user:create", "user:read", "user:update", "user:delete",
    "user:approve",
    "project:create", "project:read", "project:update",
    "project:delete", "project:manage",
    "domain:create", "domain:read", "domain:update", "domain:delete",
    "scrape:start", "scrape:stop", "scrape:view",
    "api_config:create", "api_config:read", "api_config:update",
    "api_config:delete",
    "api_key:create", "api_key:read", "api_key:delete",
    "admin:view", "admin:manage", "admin:users",
]

#: models/rbac.py:179-250 DEFAULT_ROLES permission lists
ROLE_PERMS = {
    "super_admin": PERMISSIONS,
    "admin": [
        "user:read", "user:update", "user:approve",
        "project:create", "project:read", "project:update",
        "project:delete", "project:manage",
        "domain:create", "domain:read", "domain:update", "domain:delete",
        "scrape:start", "scrape:stop", "scrape:view",
        "api_config:read",
        "api_key:create", "api_key:read", "api_key:delete",
        "admin:view", "admin:users",
    ],
    "researcher": [
        "user:read",
        "project:create", "project:read", "project:update",
        "project:delete",
        "domain:create", "domain:read", "domain:update", "domain:delete",
        "scrape:start", "scrape:stop", "scrape:view",
        "api_config:read",
        "api_key:create", "api_key:read", "api_key:delete",
    ],
    "viewer": [
        "user:read", "project:read", "domain:read", "scrape:view",
        "api_config:read", "api_key:read",
    ],
}


def role_col(user_id: F.Column) -> F.Column:
    return (
        F.when(user_id % 50 == 0, "super_admin")
        .when(user_id % 10 == 9, "admin")
        .when(user_id % 10 >= 6, "researcher")
        .otherwise("viewer")
    )


def permission_catalog(spark: SparkSession) -> DataFrame:
    """The 27-permission catalog with the derived resource / action /
    description fields (rbac.py:225-240)."""
    df = spark.createDataFrame([(p,) for p in PERMISSIONS], ["name"])
    resource = F.split("name", ":", 2).getItem(0)
    action = F.split("name", ":", 2).getItem(1)
    return df.select(
        "name", resource.alias("resource"), action.alias("action"),
        F.concat(
            F.initcap(action), F.lit(" "),
            F.initcap(F.replace(resource, F.lit("_"), F.lit(" "))),
        ).alias("description"),
    )


def role_matrix(spark: SparkSession) -> DataFrame:
    """(role, permission, is_system_role) rows from DEFAULT_ROLES
    (models/rbac.py:179-250) — all four defaults are system roles."""
    rows = [(r, p, True) for r, ps in ROLE_PERMS.items() for p in ps]
    return spark.createDataFrame(
        rows, ["role", "permission", "is_system_role"])


def user_permissions(events: DataFrame) -> DataFrame:
    """Effective permission set per user (rbac.py:184-205): role
    permissions plus the superuser bypass (which coincides with the
    super_admin role's full set here, so the union is the role join).
    """
    spark = events.sparkSession
    users = events.select("user_id").distinct().select(
        "user_id", role_col(F.col("user_id")).alias("role"))
    return (
        users.join(F.broadcast(role_matrix(spark)), "role")
        .select("user_id", "role", "permission")
    )


#: representative probes for the membership check (one per band edge)
PROBES = ["project:create", "user:delete", "admin:view", "scrape:view"]


def permission_checks(events: DataFrame) -> DataFrame:
    """``user_has_permission`` rows (rbac.py:207-222) for the probe
    permissions: user × probe → allowed."""
    spark = events.sparkSession
    users = events.select("user_id").distinct().select(
        "user_id", role_col(F.col("user_id")).alias("role"))
    probes = spark.createDataFrame([(p,) for p in PROBES],
                                   ["permission"])
    matrix = role_matrix(spark).select("role", "permission") \
        .withColumn("_has", F.lit(True))
    return (
        users.crossJoin(F.broadcast(probes))
        .join(F.broadcast(matrix), ["role", "permission"], "left")
        .select("user_id", "role", "permission",
                F.coalesce(F.col("_has"), F.lit(False)).alias("allowed"))
    )
