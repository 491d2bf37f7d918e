"""Trace-based kernel profile: classifier + parser unit coverage (the
device-trace capture itself needs real TPU; exercised by
benchmarks/trace_profile.py)."""

from tpu_pathtracer.utils.kernel_profile import classify_op


def test_classifier_buckets():
    assert classify_op("fusion", "custom-call target=tpu_custom_call"
                       ) == "intersection"
    assert classify_op("fusion.1", "threefry2x32 ...") == "rng"
    assert classify_op("sort.3", "") == "sort"
    assert classify_op("fusion.9", "add mul select") == "shading/other"
