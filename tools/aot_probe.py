"""AOT warm-open probe (VERDICT r4 missing #3).

Question: does PJRT executable serialization (`jax.experimental
.serialize_executable`) make a FRESH process's first program execution cheaper
than the persistent-compile-cache hit path, on this backend?  The warm-open
cost on the axon relay is per-program: even with every XLA compile cached
(~/.cache/cgx_tpu_jax), each first execution pays a relay load round trip.
If `deserialize_and_load` skips part of that, serializing the pipeline's
program set alongside the index artifact would cut warm-open; if it measures
the same (the load RPC itself is the cost), that is the documented reason the
relay forbids the optimization.

Run AFTER any chip campaign (chip exclusivity):

    python tools/aot_probe.py save      # compile N probe programs, serialize
    python tools/aot_probe.py aot       # fresh process: deserialize_and_load
    python tools/aot_probe.py cache     # fresh process: jit via persistent cache

Each prints per-program and total first-execution times.
"""

from __future__ import annotations

import pickle
import sys
import time

import numpy as np

OUT = "/tmp/aot_probe"
N_PROGRAMS = 6


def _programs():
    """N distinct mid-sized programs (distinct shapes => distinct programs),
    shaped like the pipeline's scan kernels: gathers + elementwise over int32."""
    import jax
    import jax.numpy as jnp

    progs = []
    for i in range(N_PROGRAMS):
        n = 4096 << (i % 3)

        def f(ref, pos, k=i):
            w = ref[jnp.clip(pos[:, None] + jnp.arange(8 + k), 0,
                             ref.shape[0] - 1)]
            return jnp.sum(w * (pos[:, None] + k), axis=1)

        args = (jnp.arange(65536, dtype=jnp.int32),
                jnp.arange(n, dtype=jnp.int32) % 60000)
        progs.append((jax.jit(f), args))
    return progs


def main():
    mode = sys.argv[1]
    import jax
    t_all = time.perf_counter()
    if mode == "save":
        import os
        os.makedirs(OUT, exist_ok=True)
        from jax.experimental import serialize_executable as se
        for i, (f, args) in enumerate(_programs()):
            lowered = f.lower(*args)
            comp = lowered.compile()
            np.asarray(comp(*args))
            payload = se.serialize(comp)
            with open(f"{OUT}/prog{i}.pkl", "wb") as fh:
                pickle.dump(payload, fh)
            print(f"prog{i}: serialized "
                  f"{sum(len(p) if isinstance(p, bytes) else 0 for p in payload) if isinstance(payload, tuple) else len(payload)} bytes-ish")
    elif mode == "aot":
        from jax.experimental import serialize_executable as se
        progs = _programs()
        for i, (f, args) in enumerate(progs):
            t0 = time.perf_counter()
            with open(f"{OUT}/prog{i}.pkl", "rb") as fh:
                payload, in_tree, out_tree = pickle.load(fh)
            comp = se.deserialize_and_load(payload, in_tree, out_tree)
            np.asarray(comp(*args))
            print(f"prog{i}: deserialize+load+exec {time.perf_counter()-t0:.3f}s")
    elif mode == "cache":
        for i, (f, args) in enumerate(_programs()):
            t0 = time.perf_counter()
            np.asarray(f(*args))
            print(f"prog{i}: jit-first-call (persistent cache) "
                  f"{time.perf_counter()-t0:.3f}s")
    print(f"total {mode}: {time.perf_counter()-t_all:.3f}s")


if __name__ == "__main__":
    main()
