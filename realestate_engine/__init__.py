"""realestate_engine — a PySpark-native analytics engine.

Re-derives the query and data-processing capabilities of the reference
repo (joshafouda/pyspark-real-estate-prices, a PySpark batch ETL + ML
regression pipeline; see SURVEY.md) as a clean, tested, generalized
engine, plus the LLM-data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis) designed for 100 TB scale.

Everything is expressed through the DataFrame API so Catalyst performs
predicate pushdown, column pruning, join reordering and AQE re-planning;
there are no row-at-a-time Python UDFs in any hot path.
"""

from realestate_engine.session import create_session

__all__ = ["create_session"]
__version__ = "0.2.0"
