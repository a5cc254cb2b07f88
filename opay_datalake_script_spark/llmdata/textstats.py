"""Text analysis operators (SURVEY.md §2-K: stats, tf-idf, curation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load
