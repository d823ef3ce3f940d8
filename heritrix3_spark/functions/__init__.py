from heritrix3_spark.functions import canonicalize, surt

__all__ = ["canonicalize", "surt"]
