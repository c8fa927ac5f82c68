from biokg_spark.plans.checkpoint import CheckpointManager, StageResult

__all__ = ["CheckpointManager", "StageResult"]
