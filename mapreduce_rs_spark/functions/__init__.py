from mapreduce_rs_spark.functions.hashing import h32, h64, text_fingerprint  # noqa: F401
from mapreduce_rs_spark.functions.text import clean_text, tokens  # noqa: F401
from mapreduce_rs_spark.functions.vectors import cosine_similarity, dot, l2_norm  # noqa: F401
