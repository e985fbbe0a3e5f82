from mapreduce_rs_spark.sources.catalog import TABLES, load_table, load_tables  # noqa: F401
from mapreduce_rs_spark.sources.readers import read_csv, read_json, read_orc, read_parquet, read_text  # noqa: F401
from mapreduce_rs_spark.sources.writers import write_orc, write_parquet, write_sorted_text  # noqa: F401
