"""database_anonymiser_spark — a PySpark-native analytics / anonymisation engine.

A from-scratch, Spark-first rebuild of the capabilities of the reference
``Lunim-Corporate/database-anonymiser`` (a PostgreSQL anonymisation CLI), plus
the relational + LLM-data-pipeline operator surface a 100 TB training-data
pipeline needs (joins, aggregations, windows, streaming, deduplication,
similarity search, text analysis, multimodal columns).

Design stance (see SURVEY.md §7):
- Everything is declared through the DataFrame / SQL API so Catalyst picks the
  physical plan (pushdown, pruning, codegen, AQE) — no hand-scheduled RDD code.
- Masking strategies are native ``Column`` expressions, never Python UDFs.
- Python (Pandas UDF / applyInPandas / mapInPandas) appears only where built-in
  operators genuinely cannot express the semantics (multimodal decode stubs).
"""

__version__ = "0.1.0"

from database_anonymiser_spark.types import TypeGroup, map_spark_to_group  # noqa: F401
