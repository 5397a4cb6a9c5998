"""Physical-plan policy helpers (broadcast gating, hint discipline)."""

from lime_etl_spark.plans.policy import auto_broadcast

__all__ = ["auto_broadcast"]
