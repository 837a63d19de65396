"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference `Gustavo-Coutinho/teste-carga-avro-vs-json`
(a Java Avro-vs-JSON Kafka load benchmark), rebuilt Spark-first.

The reference is a dataflow benchmark: generate -> encode (Avro|JSON) ->
sink -> source -> decode -> filter -> aggregate -> report
(see SURVEY.md §2 for the operator inventory O1-O19). This package
re-expresses every stage as declarative DataFrame plans so Catalyst +
Tungsten pick the physical strategy, and adds the LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
required for 100 TB-scale training-data work.

Layout
------
- ``session``    SparkSession builder with the engine's required confs
- ``config``     typed env config (reference ConfiguracaoKafka.java:19-124)
- ``schemas``    canonical MensagemCarga schema (MensagemCarga.avsc:1-30)
- ``functions``  portable deterministic expressions + pure-Python Avro codec
- ``sources``    synthetic generator, file IO (json/avro-ocf/parquet), kafka
- ``operators``  serde, metrics, dedup, similarity, text, multimodal
- ``streaming``  Structured Streaming pipelines (bounded via availableNow)
- ``plans``      explain/plan-audit helpers for scale reviews
- ``registry``   the driver-contract query inventory (+ DuckDB oracles)
- ``cli``        TIPO_APLICACAO-style app dispatcher (python -m ...)
"""

__version__ = "0.1.0"
