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
    storage.py    -- path-rooted partitioned tables (dynamic overwrite)
    catalog.py    -- named-table DDL/SQL surface over the session catalog
    fsmeta.py     -- object-store/fs metadata probes (exists/stats/delete)
    dates.py      -- load-date derivation (UTC -> local partition keys)
    metrics.py    -- run metrics & timing (single impl)
    sources/      -- paginated REST source, file readers
    operators/    -- temporal joins (as-of/sessionize), multimodal media
    functions/    -- text analysis, vector math, cross-engine hashing
    plans/        -- plan inspection helpers (pushdown/broadcast assertions)
    streaming/    -- structured-streaming windowed builders + file source
    jobs/         -- bronze/silver/gold entry points + pipeline driver
    workloads/    -- the registered query surface with DuckDB oracles
"""

__version__ = "0.1.0"
