from lime_etl_spark.io.sources import load_tables, read_table  # noqa: F401
