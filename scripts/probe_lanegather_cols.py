"""TPU parity + timing check for lane_gather_cols (the packed multi-column
Pallas gather): bitwise vs plain indexing, random and sorted indices (the
sorted case exercises the data-dependent chunk-skip branch)."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from rust_tracing_tpu.ops import lanegather
from rust_tracing_tpu.ops.tgather import tgather, tgather_cols


def main():
    key = jax.random.PRNGKey(0)
    for N, K, R in [(2408, 16, 3_840_000), (1008, 8, 3_840_000),
                    (128, 3, 100_000), (3407, 17, 500_001)]:
        cols = tuple(
            jax.random.normal(jax.random.fold_in(key, 1000 * N + k), (N,))
            for k in range(K))
        idx = jax.random.randint(jax.random.fold_in(key, N), (R,), 0, N)
        tab = jnp.stack(cols)
        ref = np.asarray(tab)[:, np.asarray(idx)]
        for name, ix in [("random", idx), ("sorted", jnp.sort(idx))]:
            rx = np.asarray(ix)
            for skip in (True, False):
                out = np.asarray(jax.jit(
                    lambda t, i: lanegather.lane_gather_cols(t, i, skip=skip)
                )(tab, ix))
                ok = np.array_equal(out, np.asarray(tab)[:, rx])
                print(f"N={N:5d} K={K:2d} R={R:8d} {name:6s} skip={skip}: "
                      f"{'BITWISE OK' if ok else 'MISMATCH'}", flush=True)
                assert ok

        # timing: packed vs per-column tgather (sorted idx = wavefront case)
        six = jnp.sort(idx)

        @jax.jit
        def packed(t, i):
            def body(j, acc):
                o = lanegather.lane_gather_cols(t, i + 0 * j)
                return acc + o[0]
            return jax.lax.fori_loop(0, 10, body, jnp.zeros(R))

        @jax.jit
        def percol(cs, i):
            def body(j, acc):
                o = [tgather(c, i + 0 * j) for c in cs]
                return acc + o[0]
            return jax.lax.fori_loop(0, 10, body, jnp.zeros(R))

        for nm, fn, a in [("packed", packed, tab), ("percol", percol, cols)]:
            np.asarray(fn(a, six))
            t0 = time.perf_counter()
            np.asarray(fn(a, six))
            dt = (time.perf_counter() - t0) / 10
            print(f"  {nm}: {dt*1e3:7.2f} ms ({K} cols, {R} lanes)",
                  flush=True)


if __name__ == "__main__":
    main()
