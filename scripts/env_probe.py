"""Per-round environment probe (VERDICT r6 item 6): the three §2
capabilities blocked by missing container dependencies, checked in one
cheap scripted pass so a changed container converts dead code paths
into driver evidence with zero new code.

- duckdb_jdbc jar -> a_jdbc_roundtrip self-registers (sources/io.py
  probes the same roots at import time) and the env-gated pytest skip
  lifts.
- Kafka connector jar (spark-sql-kafka) -> the file-source streaming
  stand-ins could read a real broker.
- pillow / ffmpeg -> the compressed-codec media decode stub
  (llmdata/multimodal.py) becomes real.

Usage: python scripts/env_probe.py   # prints one JSON line
"""

from __future__ import annotations

import glob
import importlib.util
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _has_module(name: str) -> bool:
    try:
        return importlib.util.find_spec(name) is not None
    except ModuleNotFoundError:
        return False


def probe() -> dict:
    from opay_datalake_script_spark.sources.io import JDBC_JAR

    spark_jars = []
    spec = importlib.util.find_spec("pyspark")
    if spec and spec.submodule_search_locations:
        for root in spec.submodule_search_locations:
            spark_jars.extend(glob.glob(os.path.join(root, "jars", "*kafka*.jar")))

    return {
        "duckdb_jdbc_jar": JDBC_JAR,  # None -> a_jdbc_roundtrip stays gated
        "kafka_connector_jars": sorted(os.path.basename(j) for j in spark_jars),
        "pillow": importlib.util.find_spec("PIL") is not None,
        "ffmpeg": shutil.which("ffmpeg"),
        "soundfile": importlib.util.find_spec("soundfile") is not None,
        # transformWithStateInPandas needs protobuf (test_streaming gate);
        # find_spec raises when the parent 'google' namespace is absent
        "protobuf": _has_module("google.protobuf"),
    }


if __name__ == "__main__":
    print(json.dumps(probe()))
