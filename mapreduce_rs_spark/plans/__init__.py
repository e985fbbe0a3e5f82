from mapreduce_rs_spark.plans.registry import QUERIES, QuerySpec, oracle_sql, queries  # noqa: F401
