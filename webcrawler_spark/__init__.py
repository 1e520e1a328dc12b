"""webcrawler_spark — a PySpark-native batch-iterative crawl/analytics engine.

A from-scratch rebuild of the capabilities of lipuqi/WebCrawler (a Go
goroutine-concurrent crawler framework, see /root/reference) re-expressed as
Spark DataFrame algebra:

* each crawl round is one Spark DAG: frontier -> canonicalize/hash ->
  admission filters -> bloom + anti-join dedup -> politeness windows ->
  fetch join against a Common-Crawl-style pages table -> vectorized
  pandas-UDF parsing (links / images / item extraction) -> sinks;
* the URL-seen set is a hash-partitioned table fronted by a sharded,
  broadcast bloom filter (exact anti-join remains the source of truth);
* checkpoint/resume commits every round atomically with per-partition
  lineage metrics.

Pure-Python building blocks (``urlnorm``, ``htmldom``) are shared between
the Spark UDFs, the fixture generator, and the single-threaded oracle in
``tests/oracle.py`` so that engine == oracle is a meaningful contract.
"""

__version__ = "0.1.0"
