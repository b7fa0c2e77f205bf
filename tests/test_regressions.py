"""Regression tests for the round-3 advisor crash findings (ADVICE.md):

1. conv3x3 on a geometry whose activation cannot fit the scoped-VMEM budget
   must fall back to the XLA conv instead of raising ZeroDivisionError at
   trace time (ops/pallas_conv.py::_conv3_forward bn==0 guard).
2. coco_evaluate must accept plain Python lists, not just ndarrays
   (runtime/native.py::coco_evaluate np.asarray-first).
3. analyze_trace.py must accept a trace DIRECTORY (the invocation used by
   scripts/r3_ab.sh), globbing the newest *.trace.json.gz inside it.
"""

import gzip
import json
import subprocess
import sys

import jax.numpy as jnp
import numpy as np


def test_conv3x3_oversized_geometry_falls_back_to_xla():
    from idmvton_tpu.ops.pallas_conv import conv3x3, _pick_bn

    # cin so large that even the narrowest 128-lane output block exceeds the
    # VMEM budget -> _pick_bn returns 0 for this geometry
    b, h, w, cin, cout = 1, 512, 384, 1280, 128
    assert _pick_bn(cout, h=h, wdt=w, cin=cin, es=2) == 0
    x = jnp.zeros((b, h, w, cin), jnp.bfloat16)
    k = jnp.zeros((3, 3, cin, cout), jnp.bfloat16)
    out = conv3x3(x, k)  # must not raise
    assert out.shape == (b, h, w, cout)


def test_coco_evaluate_accepts_plain_lists():
    from idmvton_tpu.runtime.native import coco_evaluate

    dets = [[0, 1, 0.9, 10, 10, 50, 50]]
    gts = [[0, 1, 0, 10, 10, 50, 50]]
    res = coco_evaluate(dets, gts)
    assert res["stats"][0] == 1.0  # perfect match -> AP 1.0

    # empty inputs (plain lists) must not crash either
    res_empty = coco_evaluate([], gts)
    assert res_empty["stats"][0] in (-1.0, 0.0)


def test_analyze_trace_accepts_directory(tmp_path):
    d = tmp_path / "plugins" / "profile"
    d.mkdir(parents=True)
    ev = {"traceEvents": [
        {"ph": "X", "pid": 3, "name": "fusion.1", "dur": 1000,
         "args": {"source": "foo.py:1", "hlo_category": "fusion",
                  "model_flops": 1e9, "raw_bytes_accessed": 1e6}},
        {"ph": "X", "pid": 3, "name": "jit_outer", "dur": 9999},
    ]}
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump(ev, f)
    proc = subprocess.run(
        [sys.executable, "/root/repo/scripts/analyze_trace.py",
         str(tmp_path), "--n-fwd", "2"],
        capture_output=True, text=True, timeout=60)
    assert proc.returncode == 0, proc.stderr
    assert "0.5 ms/fwd busy" in proc.stdout  # 1000us / n_fwd=2
