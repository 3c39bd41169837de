#!/usr/bin/env python
"""Prove (or refute) compile-cache-key stability across fresh processes.

Companion to `profile_retrace.py` (VERDICT r4 task 5). The fresh-process
first call costs 40-900 s even with a warm persistent compilation cache;
this script settles whether that is key instability (same program hashing
to different keys -> silent recompiles) or executable-load cost on a hit.

It spies on `compilation_cache.get_cache_key` during a real first fused
call at full bench size, printing every program's key and dumping, for the
target programs, the canonicalized StableHLO bytes (the IR component of
the key) and the serialized XLA compile options. Run twice and diff:

    RUN_ID=a python tools/retrace_keydiff.py 2> /tmp/rd_a.out
    RUN_ID=b python tools/retrace_keydiff.py 2> /tmp/rd_b.out
    diff <(grep ^KEY /tmp/rd_a.out | sort) <(grep ^KEY /tmp/rd_b.out | sort)
    cmp /tmp/ir_a_fused_eval.bin  /tmp/ir_b_fused_eval.bin
    cmp /tmp/opts_a_fused_eval.bin /tmp/opts_b_fused_eval.bin

Round-5 result (recorded in BASELINE.md "Fresh-process first call"): all
22 keys, the canonicalized IR, and the compile options are bit-identical
across fresh processes — keys are stable; the first-call cost on a cache
HIT is reading + loading the large Pallas executables through the remote
axon worker (44-916 s with service weather). The serving daemon
(`ptv_interpolation_tpu/daemon.py`) amortizes it across invocations.

Note: uses jax._src internals (jax 0.9.x); a private-API breakage here
means the probe needs updating, not that the framework is broken.
"""

import logging
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

logging.basicConfig(stream=sys.stderr, level=logging.WARNING,
                    format="%(name)s: %(message)s")
logging.getLogger("jax._src.cache_key").setLevel(logging.DEBUG)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_bench_cache"))
RUN_ID = os.environ.get("RUN_ID", "x")
TARGETS = ("fused_eval", "sort_values", "build_queries")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from jax._src import cache_key as ck  # noqa: E402
from jax._src import compilation_cache as cc  # noqa: E402
import jax._src.compiler as compiler  # noqa: E402

_real_get_cache_key = cc.get_cache_key


def _spy(module, devices, compile_options, backend, *a, **kw):
    key = _real_get_cache_key(module, devices, compile_options, backend,
                              *a, **kw)
    print(f"KEY {key}", file=sys.stderr, flush=True)
    for t in TARGETS:
        if t in key:
            ir_bytes = ck._canonicalize_ir(module, ck.IgnoreCallbacks.NO)
            with open(f"/tmp/ir_{RUN_ID}_{t}.bin", "wb") as f:
                f.write(ir_bytes)
            with open(f"/tmp/ir_{RUN_ID}_{t}.txt", "w") as f:
                f.write(str(module))
            if hasattr(compile_options, "SerializeAsString"):
                with open(f"/tmp/opts_{RUN_ID}_{t}.bin", "wb") as f:
                    f.write(compile_options.SerializeAsString())
    return key


for _mod in (cc, compiler):
    if hasattr(_mod, "get_cache_key"):
        _mod.get_cache_key = _spy


def main():
    import bench
    from ptv_interpolation_tpu.grid import create_grid
    from ptv_interpolation_tpu.interpolate.knn_weights import (
        sibson_grid_interpolate)

    pts, vals = bench.make_problem()
    grid = create_grid(((0, bench.GRID_N + 1),) * 3, bench.GRID_N)
    t = time.time()
    out = sibson_grid_interpolate(pts, vals, grid, k=bench.K)
    jax.block_until_ready(out)
    print(f"first call {time.time() - t:.1f}s", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
