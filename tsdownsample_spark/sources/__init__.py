from tsdownsample_spark.sources.synth import synth_token_table  # noqa: F401
