from aurora_mito_etl_spark.schema.registry import SCHEMAS, schema_for
from aurora_mito_etl_spark.schema.validate import CheckViolation, validate

__all__ = ["SCHEMAS", "schema_for", "validate", "CheckViolation"]
