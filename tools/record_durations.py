"""Pytest plugin: record per-test call durations in pytest-split format.

The reference CI splits its fast suite 3 ways using recorded durations
(/root/reference/.test_durations, ci.yml:38-61). pytest-split is not in
this image, so this 20-line plugin records the same JSON mapping
{nodeid: seconds} that `pytest-split --store-durations` would produce.

Usage (repo root):
    python -m pytest tests/ -q -p tools.record_durations
Durations merge into .test_durations (existing entries for tests not in
this run are kept, so the fast/golden/slow lanes can be recorded in
separate invocations).
"""

import json
import os

_DURATIONS_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".test_durations")
_durations = {}


def pytest_runtest_logreport(report):
    if report.when == "call":
        _durations[report.nodeid] = round(
            _durations.get(report.nodeid, 0.0) + report.duration, 4)


def pytest_sessionfinish(session, exitstatus):
    if not _durations:
        return
    merged = {}
    if os.path.exists(_DURATIONS_PATH):
        try:
            with open(_DURATIONS_PATH) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            merged = {}
    merged.update(_durations)
    with open(_DURATIONS_PATH, "w") as f:
        json.dump(dict(sorted(merged.items())), f, indent=1)
        f.write("\n")
