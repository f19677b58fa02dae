from telemetry_streaming_spark.plans.queries import QUERIES, oracle_sql_map, query_map

__all__ = ["QUERIES", "query_map", "oracle_sql_map"]
