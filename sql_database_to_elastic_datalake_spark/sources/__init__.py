from sql_database_to_elastic_datalake_spark.sources.parquet import (  # noqa: F401
    TABLES,
    load_table,
    load_tables,
)
