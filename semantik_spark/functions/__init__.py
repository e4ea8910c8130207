from semantik_spark.functions import hashing, text, vectors  # noqa: F401
