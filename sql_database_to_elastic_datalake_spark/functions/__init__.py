from sql_database_to_elastic_datalake_spark.functions.scalar import (  # noqa: F401
    content_hash,
    document_id,
    iso_timestamp,
    json_get,
    with_defaults,
)
