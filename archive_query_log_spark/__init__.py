"""archive_query_log_spark — a from-scratch PySpark-native rebuild of the
query/data-processing capabilities of webis-de/archive-query-log.

Built Spark-first: DataFrame/SQL column expressions wherever possible
(whole-stage codegen), Arrow-batched pandas UDFs only where semantics demand
Python (image decode, uuid edge cases), never row-at-a-time Python in hot
paths.

Layout:
- ``functions/``  scalar column functions (ids, urls, text)
- ``operators/``  relational/dataflow operators (worklist, politeness,
                  seen-set, as-of join, dedup, similarity, search, histogram)
- ``crawler/``    the north-star frontier + fetch scheduler over the
                  image+caption table (synth, codec, fetch, pipeline)
- ``tables.py``   snapshot-table storage (Iceberg-style commit log on parquet;
                  used because no Iceberg catalog jars ship in this sandbox)
"""

__version__ = "0.1.0"
