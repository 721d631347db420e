"""Per-family contract-query modules.

Each module exports ``QUERIES`` (name -> (spark, sf_dir) -> DataFrame)
and ``ORACLES`` (name -> DuckDB SQL) fragments; ``entry_queries``
merges them into the driver-contract registry. New families land here;
the legacy families migrate out of the ``entry_queries`` monolith
module by module.
"""
