"""Data-parallel sharding tests (SURVEY.md §4.5) — executed in a
dedicated 8-virtual-device CPU subprocess because multiple CPU devices
slow every executable launch ~10x on this 1-core host (the rest of the
suite runs single-device; see conftest)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_part(part: str) -> None:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "sharding_checks.py"),
         part],
        capture_output=True, text=True, timeout=560, cwd=REPO)
    assert proc.returncode == 0, (proc.stdout[-3000:], proc.stderr[-3000:])
    assert "ALL SHARDING CHECKS PASSED" in proc.stdout


@pytest.mark.slow
def test_sharding_checks_subprocess():
    _run_part("part1")


@pytest.mark.slow
def test_sharding_checks_fcos_rapid_subprocess():
    """fcos (GN towers) + rapid (rotated decode) forward equivalence —
    its own subprocess so multi-device XLA:CPU compile time stays
    under the per-subprocess timeout on this 1-core host."""
    _run_part("part2")
