"""Zip-safe access to packaged data files (rulesets).

`spark-submit --py-files dqm.zip` imports the package FROM THE ZIP, so
``Path(__file__).parent / "rulesets" / ...`` does not exist as a filesystem
path on executors or the driver.  ``importlib.resources.files`` resolves
through zipimport and the filesystem alike — every packaged-data read goes
through here (proven by ``tests/test_spark_submit_packaging.py``, which
runs the real ship-form in a separate JVM)."""

from __future__ import annotations

import json
from importlib import resources


def read_package_text(*relparts: str) -> str:
    node = resources.files(__package__)
    for part in relparts:
        node = node / part
    return node.read_text()


def read_package_json(*relparts: str) -> dict:
    return json.loads(read_package_text(*relparts))
