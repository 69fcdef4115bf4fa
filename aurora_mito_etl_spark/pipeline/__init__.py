"""The reference pipeline's stages as composable DataFrame functions.

Stage graph (reference scripts/run_pipeline.sh + process_staging.sh):
mesh → pubtator → pubmed → merge_filter → llm classify → finalize.
Each stage here is `f(df, ...) -> DataFrame`; lineage is the Catalyst
plan instead of staging TSVs (SURVEY §3.1).
"""

from aurora_mito_etl_spark.pipeline import finalize, merge_filter, mesh, pubmed, pubtator

__all__ = ["pubmed", "mesh", "pubtator", "merge_filter", "finalize"]
