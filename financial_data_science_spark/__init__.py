"""financial_data_science_spark — a PySpark-native analytics engine.

Re-expresses the query semantics and data-processing capabilities of the
reference library ``terence-lim/financial-data-science`` (FinDS) on Spark
DataFrames / Spark SQL / Structured Streaming, designed Spark-first for
cluster scale rather than single-process pandas.

Subpackages
-----------
operators   core relational/temporal operators (as-of join, prevailing,
            compounding, fractiles, event windows, tick binning, windows)
sources     ingestion: schema coercion, CSV load, upsert-by-anti-join
functions   scalar/aggregate helpers: dates, stats, text, similarity, finance
plans       calendar dimension + query-plan helpers
streaming   Structured Streaming counterparts of the batch operators
"""

from financial_data_science_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
