"""Hardware capability probe for the scene-in-VMEM megakernel design.

Answers, on the real TPU:
  1. dynamic scalar reads from an SMEM array inside a fori_loop (and how big
     an SMEM input can be);
  2. dynamic (1,N) row reads from VMEM + scalar broadcast to a full tile;
  3. per-lane gather from a VMEM table (jnp.take / take_along_axis);
  4. relative throughput of immediates vs SMEM-scalar vs VMEM-row reads for a
     brute-force sphere-test loop.

Run: JAX_PLATFORMS=tpu python scripts/tpu_probe.py
"""

import functools
import time
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 8, 128


def report(name, fn):
    try:
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"[OK]   {name}: {dt:.3f}s  out={np.asarray(out).ravel()[:4]}")
        return True
    except Exception as e:  # noqa: BLE001
        print(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:300]}")
        return False


# 1. SMEM dynamic scalar reads at various sizes -------------------------------
def smem_scalar(n):
    def kernel(tab_ref, out_ref):
        def body(i, acc):
            return acc + tab_ref[i]

        s = jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        out_ref[:] = jnp.full((ROWS, LANES), s)

    tab = jnp.arange(n, dtype=jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab)


# 2. VMEM dynamic row read + scalar broadcast ---------------------------------
def vmem_row_broadcast(n):
    def kernel(tab_ref, out_ref):
        def body(i, acc):
            row = tab_ref[pl.ds(i, 1), :]  # (1,128)
            return acc + row[0, 0]

        s = jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        out_ref[:] = jnp.full((ROWS, LANES), s)

    tab = jnp.tile(jnp.arange(n, dtype=jnp.float32)[:, None], (1, 128))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab)


# 3. per-lane gather from a VMEM table ----------------------------------------
def vmem_gather():
    def kernel(tab_ref, out_ref):
        idx = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) * 7
               + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1) * 13) % 256
        tab = tab_ref[:]  # (256, 128)
        out_ref[:] = jnp.take(tab[:, 0], idx, axis=0)

    tab = jnp.tile(jnp.arange(256, dtype=jnp.float32)[:, None], (1, 128))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab)


def vmem_gather_2d():
    """take_along_axis down the sublane axis — the documented-supported shape."""
    def kernel(tab_ref, out_ref):
        idx = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) * 7
               + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1) * 13) % 256
        tab = tab_ref[:]  # (256,128): per-lane columns
        out_ref[:] = jnp.take_along_axis(tab, idx, axis=0)

    tab = (jnp.arange(256, dtype=jnp.float32)[:, None]
           + jnp.arange(128, dtype=jnp.float32)[None, :] * 1000)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(tab)


# 4. throughput: sphere loop with SMEM scalars vs python-unrolled immediates --
def _mk_rays():
    k = jax.random.PRNGKey(0)
    o = jax.random.normal(k, (3, ROWS, LANES), jnp.float32)
    d = jax.random.normal(jax.random.fold_in(k, 1), (3, ROWS, LANES), jnp.float32)
    return o, d


def sphere_loop_smem(S, reps):
    """S spheres tested via SMEM scalar reads, fori_loop, reps rounds."""
    def kernel(sph_ref, o_ref, d_ref, out_ref):
        ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
        dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
        a = dx * dx + dy * dy + dz * dz

        def round_body(r, tmin):
            def body(i, tbest):
                cx = sph_ref[4 * i]
                cy = sph_ref[4 * i + 1]
                cz = sph_ref[4 * i + 2]
                r2 = sph_ref[4 * i + 3]
                ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
                hb = ocx * dx + ocy * dy + ocz * dz
                c = ocx * ocx + ocy * ocy + ocz * ocz - r2
                disc = hb * hb - a * c
                t = (-hb - jnp.sqrt(jnp.maximum(disc, 0.0))) / a
                ok = (disc > 0.0) & (t > 1e-3) & (t < tbest)
                return jnp.where(ok, t, tbest)

            return jax.lax.fori_loop(0, S, body, tmin)

        out_ref[:] = jax.lax.fori_loop(0, reps, round_body,
                                       jnp.full((ROWS, LANES), 1e30))

    sph = jnp.arange(4 * S, dtype=jnp.float32) * 0.01
    o, d = _mk_rays()
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(sph, o, d)


def sphere_loop_immediate(S, reps):
    """Same loop with python-unrolled compile-time immediates (round-1 style)."""
    sph = np.arange(4 * S, dtype=np.float32) * 0.01

    def kernel(o_ref, d_ref, out_ref):
        ox, oy, oz = o_ref[0], o_ref[1], o_ref[2]
        dx, dy, dz = d_ref[0], d_ref[1], d_ref[2]
        a = dx * dx + dy * dy + dz * dz

        def round_body(r, tmin):
            tbest = tmin
            for i in range(S):
                cx, cy, cz, r2 = (float(sph[4 * i + j]) for j in range(4))
                ocx, ocy, ocz = ox - cx, oy - cy, oz - cz
                hb = ocx * dx + ocy * dy + ocz * dz
                c = ocx * ocx + ocy * ocy + ocz * ocz - r2
                disc = hb * hb - a * c
                t = (-hb - jnp.sqrt(jnp.maximum(disc, 0.0))) / a
                ok = (disc > 0.0) & (t > 1e-3) & (t < tbest)
                tbest = jnp.where(ok, t, tbest)
            return tbest

        out_ref[:] = jax.lax.fori_loop(0, reps, round_body,
                                       jnp.full((ROWS, LANES), 1e30))

    o, d = _mk_rays()
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(o, d)


def sphere_mxu(S, reps):
    """Leaf-batched: rays as (1024,3), spheres as (3,S) -> MXU matmuls."""
    def kernel(c_ref, r2_ref, o_ref, d_ref, out_ref):
        o = o_ref[:]  # (1024, 8) padded xyz
        d = d_ref[:]
        cm = c_ref[:]  # (8, S) padded
        r2 = r2_ref[:]  # (8, S) row 0 live

        def round_body(r, tmin):
            oc_dot_d = jnp.dot(d, cm, preferred_element_type=jnp.float32)
            oc_dot_o = jnp.dot(o, cm, preferred_element_type=jnp.float32)
            a = jnp.sum(d * d, axis=1, keepdims=True)
            o2 = jnp.sum(o * o, axis=1, keepdims=True)
            c2 = r2[0:1, :]
            hb = oc_dot_d  # placeholder algebra: o.d - c.d etc. (throughput only)
            c = o2 - 2.0 * oc_dot_o + c2
            disc = hb * hb - a * c
            t = (-hb - jnp.sqrt(jnp.maximum(disc, 0.0))) / a
            ok = (disc > 0.0) & (t > 1e-3)
            tcand = jnp.min(jnp.where(ok, t, 1e30), axis=1, keepdims=True)
            return jnp.minimum(tmin, tcand)

        out_ref[:] = jax.lax.fori_loop(0, reps, round_body,
                                       jnp.full((1024, 1), 1e30))

    k = jax.random.PRNGKey(0)
    o = jax.random.normal(k, (1024, 8), jnp.float32)
    d = jax.random.normal(jax.random.fold_in(k, 1), (1024, 8), jnp.float32)
    cm = jax.random.normal(jax.random.fold_in(k, 2), (8, S), jnp.float32)
    r2 = jnp.ones((8, S), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1024, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(cm, r2, o, d)


def bench(name, fn, *args, inner=1):
    try:
        f = functools.partial(fn, *args)
        jax.block_until_ready(f())  # compile
        t0 = time.perf_counter()
        for _ in range(3):
            out = f()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"[PERF] {name}: {dt * 1e3:.2f} ms/call -> "
              f"{inner / dt / 1e9:.2f} G prim-tests/s")
    except Exception:  # noqa: BLE001
        print(f"[FAIL] {name}:")
        traceback.print_exc(limit=2)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    for n in (128, 1024, 4096, 16384, 65536):
        report(f"smem scalar reads n={n} ({4 * n}B)", lambda n=n: smem_scalar(n))
    report("vmem row read + [0,0] broadcast", lambda: vmem_row_broadcast(256))
    report("vmem gather jnp.take 1d", vmem_gather)
    report("vmem gather take_along_axis axis=0", vmem_gather_2d)

    S, REPS = 256, 64
    NT = 1024 * S * REPS  # prim tests per call
    bench(f"sphere loop immediates S={S} reps={REPS}",
          sphere_loop_immediate, S, REPS, inner=NT)
    bench(f"sphere loop SMEM scalars S={S} reps={REPS}",
          sphere_loop_smem, S, REPS, inner=NT)
    bench(f"sphere MXU batched S={S} reps={REPS}", sphere_mxu, S, REPS, inner=NT)
