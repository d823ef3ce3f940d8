from heritrix3_spark.functions import (
    canonicalize,
    mime,
    psl,
    surt,
    surtprefix,
    uriutils,
)

__all__ = ["canonicalize", "mime", "psl", "surt", "surtprefix", "uriutils"]
