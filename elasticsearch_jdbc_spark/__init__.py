"""elasticsearch_jdbc_spark — a PySpark-native inverted-index + BM25 engine.

A brand-new engine with the *capabilities* of jprante/elasticsearch-jdbc
(reference at /root/reference, studied for behavior only): it ingests tabular
rows, folds them into documents with stable identities, builds a searchable
full-text index, incrementally and resumably, with metrics — except the whole
pipeline runs inside Spark and the index + BM25 query engine are our own
(the reference delegates those to Elasticsearch).

Layout:
    sources/    corpus generators + readers (reference: StandardSource JDBC scan)
    functions/  tokenizer, text analysis, hashing, geo scalar fns
    operators/  document fold, dedup, similarity, incremental sync
    index/      posting-list build, compression, BM25/WAND query, checkpoints
    plans/      job-spec -> pipeline wiring (reference: JDBCImporter settings)
    streaming/  Structured Streaming incremental ingest
"""

__version__ = "0.1.0"
