"""Every package module imports cleanly (no hidden missing deps, no
import-time Spark session). __main__ is excluded — importing it runs
the CLI."""

import importlib
import pkgutil

import data_diff_spark


def test_all_modules_import():
    mod = importlib.import_module("data_diff_spark")
    seen = []
    for m in pkgutil.walk_packages(mod.__path__, prefix="data_diff_spark."):
        if m.name.endswith("__main__"):
            continue
        seen.append(m.name)
        importlib.import_module(m.name)
    assert len(seen) >= 30, seen  # the full surface, not a subset
