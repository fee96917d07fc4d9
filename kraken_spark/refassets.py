"""Location of the reference checkout's test assets (golden fixtures, XSD
schemas, trained models used by the parity queries).

The default is the sandbox path; `KRAKEN_SPARK_REFERENCE_ROOT` overrides it
so the job ships to a cluster where the reference checkout lives elsewhere
(spark-submit --conf spark.executorEnv.KRAKEN_SPARK_REFERENCE_ROOT=...).
Read at call time, not import time, so a test can set the env var after
import.
"""

from __future__ import annotations

import os

_DEFAULT_ROOT = "/root/reference"


def reference_root() -> str:
    return os.environ.get("KRAKEN_SPARK_REFERENCE_ROOT", _DEFAULT_ROOT)


def resources_dir() -> str:
    """The reference's tests/resources directory (parity fixtures)."""
    return os.path.join(reference_root(), "tests", "resources")


def resource(*parts: str) -> str:
    return os.path.join(resources_dir(), *parts)
