"""lightcrawler_spark — PySpark-native URL-frontier + fetch-scheduler engine."""

__version__ = "0.1.0"
