"""PySpark-native analytics/ETL engine.

A brand-new, Spark-first re-expression of the capabilities of the
reference system herculanocm/docker-airflow-spark-minio (a medallion
bronze->silver->gold ETL platform: Airflow + PySpark + MinIO + Iceberg),
extended with large-scale training-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns).

Layout:
    session.py    -- SparkSession factory (catalog/S3A/AQE config surface)
    schema.py     -- declarative schema system (describe_list <-> StructType)
    conform.py    -- schema conformance as ONE Catalyst projection
    storage.py    -- partitioned table writer (dynamic partition overwrite)
    fsmeta.py     -- object-store/fs metadata probes (exists/stats/delete)
    metrics.py    -- run metrics & timing (single impl)
    sources/      -- paginated REST source, file readers
    operators/    -- dedup, similarity, asof/range/session joins, multimodal
    functions/    -- text analysis, vector math, cross-engine hashing
    plans/        -- plan inspection helpers (pushdown/broadcast assertions)
    streaming/    -- structured-streaming windowed aggregation builders
    jobs/         -- thin bronze/silver/gold entry points (reference parity)
"""

__version__ = "0.1.0"
