from lambda_refarch_mapreduce_spark.plans.jobspec import JobSpec, run_jobspec  # noqa: F401
