"""tinybrain_spark — PySpark-native rollup/downsample/retention engine."""

__version__ = "0.1.0"
