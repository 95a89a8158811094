"""codegraphcontext_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch rebuild of the capabilities of ``tarunsinghjodha325/CodeGraphContext``
(reference at /root/reference, read-only) as a batch DataFrame pipeline over
Common-Crawl-style web pages:

    pages(url, warc_ts, html, text, lang)
      -> extract   (deterministic boilerplate-stripped text; byte-identical per url)
      -> segment   (sentences, vectorized pandas UDF)
      -> triples   (pattern-table OpenIE-style (subj, pred, obj) mentions)
      -> link      (dictionary + context priority-cascade entity linking,
                    analog of reference graph_builder.py:262-329)
      -> canon     (MinHash-LSH blocking + connected-components canonicalization)
      -> materialize (deduplicated nodes/edges tables,
                    analog of reference's Neo4j MERGE sinks graph_builder.py:115-256)
      -> queries   (the reference's ~23 read queries, code_finder.py, as DataFrame ops)

Everything is pyspark.sql DataFrame / Spark SQL; Python escapes only via Arrow-batched
pandas UDFs (mapInPandas) in the extraction stages.
"""

__version__ = "0.1.0"
