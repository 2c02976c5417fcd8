"""Pipeline plan builders: spec -> lazily-evaluated DataFrame DAGs."""

from logagent_spark.plans.pipeline import CompiledPipeline  # noqa: F401
