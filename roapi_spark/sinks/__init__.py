"""Write-side sinks. The reference engine is read-only (tables are
registered, never written — columnq/src/table/mod.rs); these sinks are
part of the training-data-pipeline extension surface: a curation job's
output is a *transactional corpus snapshot*, and Delta gives downstream
readers (this engine's own pure-Python delta source, delta-rs,
delta-spark) atomic versions to pin."""

from roapi_spark.sinks.delta import write_delta  # noqa: F401
