"""utils_infra_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the TAK-NZ/utils-infra reference
platform (see SURVEY.md), extended with the LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing) a 100 TB training-data pipeline needs.

Design stance (SURVEY.md §7):
- Operators are functions ``DataFrame -> DataFrame`` built from
  Column expressions; Catalyst plans and optimizes everything.
- Python rows never flow through the hot path: UDFs are Arrow-batched
  pandas UDFs and only where built-ins genuinely can't express the op.
- Dimension tables are broadcast; big tables shuffle on their
  natural keys; AQE stays on.
"""

__version__ = "0.1.0"
