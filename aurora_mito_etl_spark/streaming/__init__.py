from aurora_mito_etl_spark.streaming import incremental

__all__ = ["incremental"]
