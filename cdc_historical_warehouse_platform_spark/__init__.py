"""cdc_historical_warehouse_platform_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
``mrohitth/cdc-historical-warehouse-platform`` (a batch CDC + SCD2 warehouse pipeline,
see SURVEY.md): change-data-capture extraction with high-watermark state,
idempotent batch delivery, an SCD2 (type-2 slowly-changing-dimension)
merge engine, pipeline-run metadata, and the validation/analytics query
suite — plus the large-scale training-data operators (dedup families,
similarity search, text analysis, multimodal column plumbing) the
reference's north star calls for.

Everything is declarative DataFrame/SQL so Catalyst + AQE pick physical
plans; Python UDFs appear only where semantics genuinely require them
(Arrow-vectorized, never row-at-a-time in a hot path).
"""

from cdc_historical_warehouse_platform_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
