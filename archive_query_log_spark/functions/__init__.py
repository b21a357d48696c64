from archive_query_log_spark.functions import ids, text, urls  # noqa: F401
