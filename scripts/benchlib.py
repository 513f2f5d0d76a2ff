"""Shared timing harness for the benchmark scripts.

Methodology invariants (violating either silently corrupted round-2
numbers — see STATUS.md "Honest timing"):

1. Reduce the measured function's whole output pytree to ONE f32 scalar
   on device and pull once per timing window. Pulling leaves one by one
   costs ~34 ms of relay sync each (a grad tree has hundreds of
   leaves); per-iteration pulls bias short steps by a full sync.
2. Keep every output live inside the reduction. Wrapping an inner jit
   in an outer jit and discarding part of its output lets XLA dead-code
   -eliminate that part (a train step whose new_state is dropped loses
   its entire backward pass).
3. Execute the AOT-compiled object, not the original jit wrapper — the
   dispatch cache is not populated by ``.lower().compile()``, so
   calling the wrapper afterwards would trace + compile a second time.
"""

from __future__ import annotations

import time


def scalarize(fn):
    """Wrap fn so it returns one f32 scalar summing every array leaf."""
    import jax
    import jax.numpy as jnp

    def wrapped(*args):
        out = fn(*args)
        return sum(
            jnp.sum(x.astype(jnp.float32))
            for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "dtype")
        )

    return wrapped


def measure(fn, args, iters: int = 5):
    """Compile fn(*args) AOT, time it, report compiled-HLO FLOPs.

    Returns dict(s, gflops, tflops_per_s, compile_s). Calls serialize on
    the single device stream, so one end-of-window sync amortizes over
    ``iters``.
    """
    import jax

    jfn = jax.jit(scalarize(fn))
    t0 = time.perf_counter()
    compiled = jfn.lower(*args).compile()
    compile_s = time.perf_counter() - t0
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0)) if ca else 0.0

    float(compiled(*args))  # warm (executes the AOT object: no re-trace)
    t0 = time.perf_counter()
    h = None
    for _ in range(iters):
        h = compiled(*args)
    float(h)
    dt = (time.perf_counter() - t0) / iters
    return {
        "s": round(dt, 4),
        "gflops": round(flops / 1e9, 1),
        "tflops_per_s": round(flops / dt / 1e12, 2) if flops else 0.0,
        "compile_s": round(compile_s, 1),
    }
