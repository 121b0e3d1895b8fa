"""batch_process_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference directory-tree batch-processing framework
(``chuang453/batch_process``), re-expressed Spark-first:

- ``session``    — SparkSession factory tuned for local[N] and cluster use.
- ``catalog``    — named-table store with key/schema metadata semantics
                   (reference: ``utils/adapters/df_helpers.py``).
- ``operators``  — relational + LLM-data-pipeline operators (filter
                   compiler, selector language, group-split, union-align,
                   dedup, similarity search, text analysis, multimodal).
- ``sources``    — file-tree scan, lenient readers, struct-text parser,
                   fixed-format report parser, label/category dimensions.
- ``plans``      — rule config -> stage DAG compiler, simulate(), registry.
- ``sinks``      — csv/parquet/json writers, run-history sink.

Everything is DataFrame-first: operators build Column expressions and
let Catalyst optimize; Python executes only inside Arrow-batched pandas
UDFs where built-ins genuinely cannot express the semantics.
"""

from batch_process_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
