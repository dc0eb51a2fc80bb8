from ontograph_spark.pipeline.repo_source import synthesize_repo_table
from ontograph_spark.pipeline.construct import construct_kg, ONT

__all__ = ["synthesize_repo_table", "construct_kg", "ONT"]
