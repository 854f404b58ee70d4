from networkit_spark.plans.superstep import SuperstepRunner

__all__ = ["SuperstepRunner"]
