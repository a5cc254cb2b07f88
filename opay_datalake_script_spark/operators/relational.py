"""Projection/filter/sort/set-op operators (SURVEY.md §2-B, §2-F, §2-G)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.io import load
