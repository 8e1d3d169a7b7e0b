"""covid_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the query & data-processing capabilities of
COVID19Tracking/covid-data-pipeline (a single-node Python ETL/scraping
pipeline: scan -> clean -> hash -> change-detect -> aggregate -> persist)
as idiomatic, Catalyst-optimized PySpark DataFrame operators, plus the
mandated LLM-data-pipeline extensions (dedup, similarity search,
multimodal columns, text analysis), designed for 100 TB scale.

Entry points:
  - ``registry.REGISTRY`` — every declared query (SURVEY.md §2).
  - ``session.get_spark()`` — tuned local session for tests/bench.
"""

__version__ = "0.1.0"
