from mapreduce_rs_spark.operators.mapreduce import map_reduce  # noqa: F401
from mapreduce_rs_spark.operators.text_analysis import word_count  # noqa: F401
