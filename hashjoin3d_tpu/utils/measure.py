"""Benchmark repetition protocol and wall-clock helpers.

``repeat_mintime`` reproduces the reference's measurement discipline
(``util/measure_helpers.hh:15-41``): run the closure, doubling the planned
repetition count whenever the cumulative time is still under ``min_time`` at
the end of the current plan, with a per-iteration teardown and a minimum
repetition floor.  Returns ``(total_seconds, n_reps)``.

On TPU, the closure is expected to call ``block_until_ready`` on its outputs
so device time is actually observed (the JAX analogue of the reference timing
a synchronous ``run()``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax

_touch_cache = {}


def fence(tree) -> None:
    """Hard synchronization point: wait until every array in ``tree`` exists.

    ``jax.block_until_ready`` is a no-op on some remote backends (the axon
    TPU tunnel in this environment) -- only an actual device->host read
    synchronizes.  This reads ONE scalar derived from the first element of
    every leaf through a tiny cached jit, which cannot complete before the
    producing computation has.  Cost in steady state: one RPC round trip.
    """
    import jax.numpy as jnp

    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype") and getattr(l, "size", 0) > 0]
    if not leaves:
        return
    key = tuple((l.shape, str(l.dtype)) for l in leaves)
    fn = _touch_cache.get(key)
    if fn is None:
        def _touch(*ls):
            acc = jnp.float32(0)
            for l in ls:
                acc = acc + l.reshape(-1)[0].astype(jnp.float32)
            return acc

        fn = jax.jit(_touch)
        _touch_cache[key] = fn
    jax.device_get(fn(*leaves))


def repeat_mintime_fenced(min_time_s: float, enqueue, min_repeat: int = 8):
    """Amortized-fence doubling protocol for async device backends.

    Enqueues ``n`` reps back-to-back and fences ONCE on the last rep's
    outputs (TPU executions on one device run in submission order, so the
    last output existing implies the whole batch ran), timing the batch;
    doubles ``n`` until the batch exceeds ``min_time_s``.  Returns
    ``(batch_seconds, n_reps, last_output)``.

    This is the device-time analogue of the reference's synchronous loop
    (``util/measure_helpers.hh:15-41``): on a local chip a per-rep
    ``block_until_ready`` costs microseconds, but through the axon tunnel a
    fence is a ~31 ms HTTP round trip -- fencing every rep (the round-3
    protocol) counts that RTT once per rep and buries the actual device
    time.  Here it amortizes to ``RTT/n``, matching the fence-amortized
    methodology every roofline number already uses (tools/roofline.py).
    """
    n = min_repeat
    while True:
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = enqueue()
        fence(out)
        total = time.perf_counter() - t0
        if total >= min_time_s:
            return total, n, out
        n *= 2


def repeat_mintime(min_time_s: float, func, teardown=lambda: None,
                   teardown_after_last: bool = False, min_repeat: int = 1):
    n = min_repeat
    total = 0.0
    i = 0
    while i < n:
        t0 = time.perf_counter()
        func()
        total += time.perf_counter() - t0
        if i == n - 1 and total < min_time_s:
            n *= 2
        if i != n - 1 or teardown_after_last:
            teardown()
        i += 1
    return total, n


@dataclass
class Timers:
    """Named start/stop experiment timers (main_experiment1.cc:199-201,1349-1359)."""

    points: dict = field(default_factory=dict)

    def start(self, desc: str):
        self.points[desc] = [time.perf_counter(), None]

    def stop(self, desc: str):
        self.points[desc][1] = time.perf_counter()

    def print(self, out=None):
        import sys
        out = out or sys.stdout
        for desc, (t0, t1) in sorted(self.points.items()):
            dur_ms = ((t1 if t1 is not None else time.perf_counter()) - t0) * 1e3
            out.write(f"  {desc}|{dur_ms:.3f} ms\n")
