from aurora_mito_etl_spark.plans.queries import ORACLES, QUERIES, flagship

__all__ = ["QUERIES", "ORACLES", "flagship"]
