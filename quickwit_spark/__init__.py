"""quickwit_spark — a PySpark-native log/analytics engine with the query and
data-processing capabilities of quickwit-oss/quickwit (reference studied at
/root/reference, behavior only; architecture is Spark-first).

Subpackages
-----------
- ``routing``    : Quickwit routing-expression DSL + SipHash-2-4 partition hashing
                   (exact parity with the reference's partition ids).
- ``functions``  : scalar/vector functions — timestamp coercion, tokenizers,
                   text analysis, vector math.
- ``operators``  : doc-mapper parse stage, ES-compatible aggregations, query AST,
                   sorts/pagination, dedup, similarity search, multimodal plumbing.
- ``pipeline``   : the parse → enrich → route → aggregate DAG over transcript
                   tables, with sinks, lineage, and checkpoint/resume.
- ``streaming``  : Structured Streaming variant of the pipeline.
"""

__version__ = "0.1.0"
