from lambda_refarch_mapreduce_spark.sources.readers import (  # noqa: F401
    TABLES,
    load_table,
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
)
