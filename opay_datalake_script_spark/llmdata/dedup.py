"""Document deduplication operators (SURVEY.md §2-K: exact, LSH, Jaccard)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load
