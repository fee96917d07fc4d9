"""Relational operator catalog (SURVEY.md §2.8) — the driver-verified query
surface. Each module exposes ``QUERIES: dict[name, (spark_fn, oracle_sql)]``
where spark_fn(spark, sf_dir) -> DataFrame and oracle_sql is the equivalent
DuckDB SQL (None => rows-only check for non-SQL-expressible ops)."""
