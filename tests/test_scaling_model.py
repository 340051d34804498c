"""Unit tests for bench/scaling_model.py's HLO collective accounting.

The weak-scaling story in docs/parallelism.md rests on these byte counts
being right, so pin the parser: tuple-shaped results (the common case for
a multi-tensor gradient all-reduce) and async -start forms must both count.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "bench"))

from scaling_model import collective_bytes, _shape_bytes  # noqa: E402


def test_shape_bytes_scalar_and_tuple():
    assert _shape_bytes("f32[100,64]") == 100 * 64 * 4
    assert _shape_bytes("(f32[100,64], bf16[128])") == 100 * 64 * 4 + 128 * 2
    assert _shape_bytes("f32[]") == 4
    assert _shape_bytes("pred[8]") == 8


def test_collective_bytes_tuple_result():
    hlo = """
HloModule m
ENTRY e {
  %p = f32[50000,64] parameter(0)
  %q = f32[128] parameter(1)
  %ar = (f32[50000,64], f32[128]) all-reduce(%p, %q), replica_groups={}
  %loss = f32[] all-reduce(%c), to_apply=%add
  %ag = bf16[8,64] all-gather(%x), dimensions={0}
}
"""
    out = collective_bytes(hlo)
    assert out["all-reduce"]["ops"] == 2
    assert out["all-reduce"]["bytes"] == 50000 * 64 * 4 + 128 * 4 + 4
    assert out["all-gather"]["bytes"] == 8 * 64 * 2


def test_collective_bytes_async_start_counted_once():
    hlo = """
  %s = (f32[1024], f32[1024]) all-reduce-start(%a), replica_groups={}
  %d = f32[1024] all-reduce-done(%s)
"""
    out = collective_bytes(hlo)
    # -start counts ONCE: its tuple result aliases the operand next to the
    # result, so only the result half is payload. -done has no
    # "all-reduce(" match and must not count.
    assert out["all-reduce"]["ops"] == 1
    assert out["all-reduce"]["bytes"] == 1024 * 4


def test_collective_bytes_sync_start_non_tuple_counted_fully():
    hlo = "%s = f32[1024] all-reduce-start(%a), replica_groups={}"
    out = collective_bytes(hlo)
    assert out["all-reduce"]["bytes"] == 1024 * 4


def test_non_collective_lines_ignored():
    assert collective_bytes("%x = f32[4] add(%a, %b)") == {}
