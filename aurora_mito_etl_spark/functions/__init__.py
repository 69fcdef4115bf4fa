from aurora_mito_etl_spark.functions.numeric import dec, dec_avg, dec_sum

__all__ = ["dec", "dec_sum", "dec_avg"]
