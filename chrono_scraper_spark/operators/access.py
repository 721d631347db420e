"""Page access control — per-user accessible-page resolution and
shared-page statistics.

Reference semantics (backend/app/services/page_access_control.py):

- ``get_user_accessible_pages`` (:29-86): accessible pages for a user =
  DISTINCT page_ids of ``project_pages`` joined to ``projects`` owned
  by that user.
- ``get_shared_pages_statistics`` (:311-354): over ONE user's pages,
  a page is "shared" when it appears in MORE THAN ONE of that same
  user's projects (the CTE re-joins restricted to ``p.user_id =
  :user_id`` and keeps ``HAVING COUNT(DISTINCT pp.project_id) > 1``);
  the stats are total / shared / unique page counts,
  avg projects-per-shared-page, and sharing_efficiency =
  round(shared / max(total,1) * 100, 2).

This module computes the same relations for ALL users at once (grouped
by owner) — the per-user service call is a filter on the result.

Scale shape: ``project_pages ⋈ projects`` is an association-table join
(both sides dictionary-sized relative to the page corpus; the owner
side is broadcast).  The stats are two map-side-partial aggregations —
(user, page) grain then user grain.  No page payloads move: only ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def projects_fixture(events: DataFrame) -> DataFrame:
    """Deterministic projects table: every event user owns two projects
    (ids 2u+1 and 2u+2), mirroring the reference's projects(id, user_id)
    ownership grain."""
    users = events.select("user_id").distinct()
    return (users
            .select(F.explode(F.array(F.col("user_id") * 2 + 1,
                                      F.col("user_id") * 2 + 2))
                    .alias("project_id"),
                    "user_id"))


def project_pages_fixture(documents: DataFrame,
                          n_projects: int = 300) -> DataFrame:
    """Deterministic project_pages association: each doc belongs to two
    hash-spread projects, and every fourth doc additionally to the
    SIBLING project of its first assignment (same owner) — planting
    guaranteed same-user shared pages for the HAVING > 1 branch."""
    d = F.col("doc_id")
    m1 = (d * 3) % n_projects + 1
    m2 = (d * 7 + 1) % n_projects + 1
    # sibling of m1 under the 2u+1/2u+2 ownership scheme: flip parity
    sib = F.when(m1 % 2 == 1, m1 + 1).otherwise(m1 - 1)
    m3 = F.when(d % 4 == 0, sib)
    return (documents
            .select(d.alias("page_id"),
                    F.array_distinct(
                        F.filter(F.array(m1, m2, m3),
                                 lambda x: x.isNotNull()))
                    .alias("_ps"))
            .select("page_id", F.explode("_ps").alias("project_id")))


def accessible_pages(projects: DataFrame,
                     project_pages: DataFrame) -> DataFrame:
    """Per-user accessible-page rollup (get_user_accessible_pages for
    every user): distinct page count plus a page-id checksum so value
    comparison covers the membership set, not just its size."""
    rel = (project_pages
           .join(F.broadcast(projects), "project_id")
           .select("user_id", "page_id")
           .distinct())
    return (rel.groupBy("user_id")
               .agg(F.count("*").cast("long").alias("n_pages"),
                    F.sum("page_id").cast("long").alias("sum_page_ids")))


def shared_pages_stats(projects: DataFrame,
                       project_pages: DataFrame) -> DataFrame:
    """get_shared_pages_statistics for every user (reference :311-354).

    Returns (user_id, total_pages, shared_pages, unique_pages,
    avg_projects_per_shared_page, sharing_efficiency).
    """
    owned = (project_pages
             .join(F.broadcast(projects), "project_id")
             .select("user_id", "page_id", "project_id"))
    per_page = (owned.groupBy("user_id", "page_id")
                     .agg(F.countDistinct("project_id")
                           .alias("project_count")))
    return (per_page.groupBy("user_id")
            .agg(F.count("*").cast("long").alias("total_pages"),
                 F.sum((F.col("project_count") > 1).cast("long"))
                  .cast("long").alias("shared_pages"),
                 F.sum(F.when(F.col("project_count") > 1,
                              F.col("project_count")))
                  .alias("_shared_proj_sum"))
            .select("user_id", "total_pages", "shared_pages",
                    (F.col("total_pages") - F.col("shared_pages"))
                    .cast("long").alias("unique_pages"),
                    F.round(F.coalesce(F.col("_shared_proj_sum")
                                       / F.col("shared_pages"),
                                       F.lit(0.0)), 6)
                     .alias("avg_projects_per_shared_page"),
                    F.round(F.col("shared_pages")
                            / F.greatest(F.col("total_pages"), F.lit(1))
                            * 100, 2).alias("sharing_efficiency")))
