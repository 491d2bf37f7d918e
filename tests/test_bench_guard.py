"""bench.py must refuse physically impossible throughput numbers.

Regression net for the b9ee9de incident: a broken device barrier once
inflated the headline ~1500x (74% "MFU"); bench.check_physical now
aborts the whole bench on any number above the hardware's measured
issue-rate plateau (forced-failure test, VERDICT r4 #6).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench  # noqa: E402  (repo-root module; imports no heavy deps)


def test_sane_numbers_pass():
    # round-4 measured values: 293 Mrays/s on 32 tris (all-pairs),
    # 14.3 Mrays/s culled on 101k tris
    bench.check_physical("headline", 293.3, 32, all_pairs=True)
    bench.check_physical("stress100k", 14.28)
    # plateau itself (27e9 / 32 tris = 843 Mrays/s) must still pass
    bench.check_physical("plateau", 843.0, 32, all_pairs=True)


def test_b9ee9de_magnitude_rejected():
    # the incident's ~1500x-inflated headline (293 -> ~440k Mrays/s)
    with pytest.raises(bench.ImplausibleBenchmark):
        bench.check_physical("headline", 293.3 * 1500, 32, all_pairs=True)


def test_issue_plateau_rejected_for_all_pairs():
    # 2000 Mrays/s x 32 tris = 64e9 tests/s > 27e9 x 1.5 margin,
    # yet below the absolute rays/s cap — only the all-pairs law trips
    with pytest.raises(bench.ImplausibleBenchmark):
        bench.check_physical("headline", 2000.0, 32, all_pairs=True)
    bench.check_physical("culled", 2000.0)  # no all-pairs law for culled


def test_absolute_ceiling_rejected_for_any_backend():
    with pytest.raises(bench.ImplausibleBenchmark):
        bench.check_physical("stress100k", 6000.0)


def test_guard_escapes_except_exception():
    # main()'s per-config blocks catch Exception; the guard must not be
    # swallowed into an "error: ..." extra field
    assert not issubclass(bench.ImplausibleBenchmark, Exception)
