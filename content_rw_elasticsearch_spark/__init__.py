"""content_rw_elasticsearch_spark — a PySpark-native full-text engine.

Brand-new engine with the query/data-processing capabilities of
epavlova/content-rw-elasticsearch (reference at /root/reference), re-expressed
Spark-first: the reference's record-mapping ETL (pkg/mapper, pkg/message) AND
the indexing/scoring role it delegates to Elasticsearch
(configs/referenceSchema.json) are both rebuilt from scratch as DataFrame
plans + vectorized Arrow UDFs.

Layout:
    functions/   analyzer (tokenizer), text-normalization chain, scalar fns
    operators/   postings build, BM25 scoring, codec, segments, dedup, ANN
    sources/     corpus readers / synthetic corpus generator / config maps
    plans/       the IndexModel ETL mapping (reference pkg/mapper parity)
    streaming/   incremental ingest (foreachBatch MERGE semantics)
"""

__version__ = "0.4.0"  # bump on segment-layout changes: /tmp index cache key

BM25_K1 = 1.2
BM25_B = 0.75
