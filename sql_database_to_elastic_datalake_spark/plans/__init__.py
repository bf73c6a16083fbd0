from sql_database_to_elastic_datalake_spark.plans.es_dsl import compile_dsl  # noqa: F401
