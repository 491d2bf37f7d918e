"""Trace-based kernel profile: classifier + parser unit coverage (the
device-trace capture itself needs real TPU; exercised by
benchmarks/trace_profile.py)."""

from tpu_pathtracer.utils.kernel_profile import (
    _bucket_exclusive,
    classify_op,
)


def test_classifier_buckets():
    assert classify_op("fusion", "custom-call target=tpu_custom_call"
                       ) == "intersection"
    assert classify_op("fusion.1", "threefry2x32 ...") == "rng"
    assert classify_op("sort.3", "") == "sort"
    assert classify_op("fusion.9", "add mul select") == "shading/other"


def test_exclusive_subtracts_nested_children():
    # a 100us `while` containing two 30us pallas calls and a 20us
    # shading fusion: the while's exclusive share is only the 20us of
    # loop glue, and nothing is double-counted.
    raw = [
        (0, 0, 0.0, 100.0, "while.1", ""),
        (0, 0, 5.0, 30.0, "pallas_closest.1",
         "custom-call target=tpu_custom_call"),
        (0, 0, 40.0, 30.0, "pallas_closest.1",
         "custom-call target=tpu_custom_call"),
        (0, 0, 75.0, 20.0, "fusion.2", "add mul select"),
    ]
    seconds, per_op, n_ops = _bucket_exclusive(raw)
    assert n_ops == 4
    assert abs(sum(seconds.values()) * 1e6 - 100.0) < 1e-6
    assert abs(seconds["intersection"] * 1e6 - 60.0) < 1e-6
    assert abs(seconds["shading/other"] * 1e6 - 40.0) < 1e-6
    assert abs(per_op["while.1"][0] * 1e6 - 20.0) < 1e-6
    assert per_op["pallas_closest.1"][1] == 2


def test_exclusive_grandchildren_direct_only():
    # while > fusion > pallas: the pallas grandchild is subtracted from
    # the fusion (its direct parent), not twice from the while.
    raw = [
        (0, 0, 0.0, 100.0, "while.1", ""),
        (0, 0, 10.0, 80.0, "fusion.1", "add mul"),
        (0, 0, 20.0, 50.0, "pallas.1",
         "custom-call target=tpu_custom_call"),
    ]
    seconds, per_op, _ = _bucket_exclusive(raw)
    assert abs(sum(seconds.values()) * 1e6 - 100.0) < 1e-6
    assert abs(per_op["while.1"][0] * 1e6 - 20.0) < 1e-6
    assert abs(per_op["fusion.1"][0] * 1e6 - 30.0) < 1e-6
    assert abs(seconds["intersection"] * 1e6 - 50.0) < 1e-6


def test_exclusive_separate_threads_not_nested():
    # equal timestamps on DIFFERENT tids must not nest
    raw = [
        (0, 0, 0.0, 50.0, "fusion.1", "add"),
        (0, 1, 0.0, 50.0, "fusion.2", "mul"),
    ]
    seconds, _, _ = _bucket_exclusive(raw)
    assert abs(sum(seconds.values()) * 1e6 - 100.0) < 1e-6


def test_cpu_trace_fallback_finds_ops(tmp_path):
    """XLA:CPU traces carry per-op events in the PjRt client thread pool
    (args.hlo_op) instead of a 'device:' process with an 'XLA Ops'
    track; kernel_profile_traced must fall back to them so the viewer's
    kernel panel works on CPU-only hosts."""
    import jax
    import jax.numpy as jnp

    from tpu_pathtracer.utils.kernel_profile import kernel_profile_traced

    @jax.jit
    def f(x):
        return jnp.sort(jnp.sin(x) @ x, axis=-1)

    x = jnp.ones((128, 128))
    prof = kernel_profile_traced(f, x, log_dir=str(tmp_path))
    assert prof["ops"] > 0
    assert prof["device_total"] > 0
    # the sort must land in its phase bucket via the fallback events
    assert "sort" in prof["percent"]
