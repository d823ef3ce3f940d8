"""heritrix3_spark — a PySpark-native URL-frontier and fetch scheduler.

A from-scratch re-expression of Heritrix3's crawl semantics
(/root/reference, cgr71ii/heritrix3) as Spark DataFrame dataflow:

* URL canonicalization / SURT / queue keys: pure Column expressions
  (:mod:`heritrix3_spark.functions`)
* URL-seen dedup: Rabin-fingerprint anti-joins with a host-clustered key
  (:mod:`heritrix3_spark.fp`, :mod:`heritrix3_spark.operators.urlseen`)
* frontier scheduling (priority windows, politeness, budgets, robots):
  :mod:`heritrix3_spark.operators`
* the macro-batch crawl loop + checkpoint/resume:
  :mod:`heritrix3_spark.crawler`
* training-data pipeline operators (dedup, similarity, text analysis,
  multimodal plumbing): :mod:`heritrix3_spark.datapipe`
"""

__version__ = "0.1.0"
