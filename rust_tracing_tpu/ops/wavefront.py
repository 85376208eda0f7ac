"""Sorted deferred wavefront renderer — the big-scene production path.

The fused megakernel's packet BVH walk is lockstep: the whole 1024-ray tile
pays for every node/leaf ANY lane needs, so deep incoherent bounces degrade
it to brute-force cost (final_scene measured at the crossover, BASELINE.md).
This path restores coherence instead of fighting divergence:

  per bounce:  SORT the live rays (direction octant + origin Morton code)
               -> Pallas closest-hit kernel on the now-coherent tiles
                  (megakernel hit mode: packet BVH walk, winner records)
               -> O(rays) XLA shading (ops/replay.bounce_c — the SAME
                  function the replay pipeline uses)

Sorting clusters rays that traverse the same subtrees into the same tiles,
so the packet walk prunes again; dead rays sort to the end, where all-dead
tiles exit the walk after one root-node test, and the buffer is periodically
COMPACTED (dropped tail lanes bank their radiance per pixel first), so deep
depth budgets don't pay full-width shading. The ray permutation rides
through ``jax.lax.sort`` payloads — never through XLA's one-element gathers,
which TPU lowers to a serial scalar loop nondeterministically
(ops/lanegather.py).

RNG is addressed by the (pixel, sample) ids RIDING with each lane —
permutations never change any random stream. With ``exact=True`` (default
for tests/small scenes) compaction is disabled and each lane's radiance is
un-permuted to its original slot before the same (k, C).sum(0) reduction the
direct estimator uses, so the result is BITWISE EQUAL to
grad.radiance_mean_rays regardless of sort order (tests/test_wavefront.py).
Production big-scene renders use ``exact=False``: identical per-path
radiance, per-pixel sums accumulated by segment reduction (float-sum
association differs; values equal to float tolerance).

This is the TPU-native answer to the reference's per-ray recursive traversal
(bvh.rs:91-112): the CPU gets divergence for free from independent call
stacks; a lockstep vector machine gets it back by making the rays agree.
"""

from __future__ import annotations

import functools
import time as _time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import Camera, get_rays
from ..utils import metrics
from . import hashrng
from . import megakernel as mk
from . import replay as replay_mod

# Flattened (sample x pixel) lane budget per chunk (see grad.py
# REPLAY_RAY_BUDGET): bounded state ~20 lanes x 4 B.
WAVEFRONT_LANE_BUDGET = 1 << 22

# Scenes at or past this primitive count render on the sorted wavefront by
# default: the crossover where the fused kernel's lockstep walk stops paying
# (final_scene is 3407; cornell-class scenes stay on the fused kernel).
WAVEFRONT_PRIM_THRESHOLD = 1024

# Compact (drop the dead tail) when the live fraction falls below this.
# Buffer sizes shrink in /4 steps so each chunk compiles at most ~4 hit
# kernel + step sizes (a final_scene hit-kernel compile is ~1 min; pow2
# halving burned >8 compiles on the first render).
COMPACT_BELOW = 0.2
COMPACT_STEP = 4


def _spread3(x):
    """Spread 10 bits of x so consecutive bits land 3 apart (Morton)."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _sort_key(ox, oy, oz, dx, dy, dz, alive, lo, inv_ext):
    """int32 coherence key: direction octant (3 bits) then a 27-bit origin
    Morton code; dead lanes key to INT32_MAX so they sort to the end."""
    oct_ = ((dx < 0).astype(jnp.int32)
            + 2 * (dy < 0).astype(jnp.int32)
            + 4 * (dz < 0).astype(jnp.int32))
    qx = jnp.clip((ox - lo[0]) * inv_ext[0], 0.0, 0.999999)
    qy = jnp.clip((oy - lo[1]) * inv_ext[1], 0.0, 0.999999)
    qz = jnp.clip((oz - lo[2]) * inv_ext[2], 0.0, 0.999999)
    m = (_spread3((qx * 512.0).astype(jnp.int32))
         | (_spread3((qy * 512.0).astype(jnp.int32)) << 1)
         | (_spread3((qz * 512.0).astype(jnp.int32)) << 2))
    key = (oct_ << 27) | (m & 0x07FFFFFF)
    return jnp.where(alive, key, jnp.int32(0x7FFFFFFF))


def _scene_bounds(scene) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side world bbox over valid primitives (for Morton quantization;
    approximation quality only affects sort locality, never correctness)."""
    los, his = [], []
    sv = np.asarray(scene.sph_valid)
    if sv.any():
        c = np.asarray(scene.sph_center)[sv]
        r = np.abs(np.asarray(scene.sph_radius)[sv])[:, None]
        # clip the huge boundary/fog spheres to keep quantization useful
        r = np.minimum(r, 100.0)
        los.append((c - r).min(0))
        his.append((c + r).max(0))
    qv = np.asarray(scene.quad_valid)
    if qv.any():
        q = np.asarray(scene.quad_q)[qv]
        u = np.asarray(scene.quad_u)[qv]
        v = np.asarray(scene.quad_v)[qv]
        pts = np.concatenate([q, q + u, q + v, q + u + v])
        los.append(pts.min(0))
        his.append(pts.max(0))
    if not los:
        return np.zeros(3), np.ones(3)
    lo = np.min(los, axis=0)
    hi = np.max(his, axis=0)
    ext = np.maximum(hi - lo, 1e-6)
    return lo, 1.0 / ext


# state tuple: (pix, samp, orig, ox, oy, oz, dx, dy, dz, rtime,
#               tr, tg, tb, rr, rg, rb, alive) + scalar nrays
_N_STATE = 17


def _permute_state(key, state):
    """Reorder the whole lane state by ``key``: a 2-operand sort yields the
    permutation, then ONE row gather of the (R, 17) packed state moves the
    data. (An 18-operand lax.sort made XLA inline the payload moves into the
    bitonic network — the step took >9 min to COMPILE; 17 per-element
    gathers hit the serial-gather path. A row gather does R element-loops of
    68 B each — the cheap middle ground.) Integer lanes ride as f32: pixel,
    sample, and lane ids are all < 2^24, exactly representable."""
    R = key.shape[0]
    perm = jnp.argsort(key)
    packed = jnp.stack(
        [state[0].astype(jnp.float32), state[1].astype(jnp.float32),
         state[2].astype(jnp.float32)] + list(state[3:16])
        + [state[16].astype(jnp.float32)], axis=1)
    packed = packed[perm]
    out = ([packed[:, c].astype(jnp.int32) for c in range(3)]
           + [packed[:, 3 + c] for c in range(13)]
           + [packed[:, 16] > 0.0])
    return tuple(out)


@functools.lru_cache(maxsize=96)
def _get_step(treedef, hit_fn, n_rows, lo_t, inv_t, sort: bool):
    """One cached jitted wavefront bounce: sort -> pallas hit -> XLA shade.
    Keyed on the (config, buffer size) so repeated renders and compaction
    buckets reuse compilations."""

    def step(scene_leaves, dev_args, seed, depth_i, nrays, *state):
        scene = jax.tree_util.tree_unflatten(treedef, scene_leaves)
        if sort:
            key = _sort_key(state[3], state[4], state[5], state[6], state[7],
                            state[8], state[16], lo_t, inv_t)
            state = _permute_state(key, state)
        (pix, samp, orig, ox, oy, oz, dx, dy, dz, rtime,
         tr, tg, tb, rr, rg, rb, alive) = state

        blk = lambda a: a.reshape(n_rows, mk.LANES)
        scal = jnp.stack([seed.astype(jnp.int32), depth_i, jnp.int32(0)])
        (rec_blk,) = hit_fn(*dev_args, scal,
                            blk(ox), blk(oy), blk(oz),
                            blk(dx), blk(dy), blk(dz), blk(rtime),
                            blk(pix), blk(samp),
                            blk(alive.astype(jnp.float32)))
        rec = rec_blk.reshape(-1)

        rngb = hashrng.CounterRng(seed, pix, samp, depth_i)
        nrays = nrays + jnp.sum(alive.astype(jnp.float32))
        (ox, oy, oz, dx, dy, dz, tr, tg, tb, rr, rg, rb, alive) = \
            replay_mod.bounce_c(scene, rngb, rec, ox, oy, oz, dx, dy, dz,
                                rtime, tr, tg, tb, rr, rg, rb, alive)
        n_alive = jnp.sum(alive.astype(jnp.int32))
        return (nrays, n_alive) + (pix, samp, orig, ox, oy, oz, dx, dy, dz,
                                   rtime, tr, tg, tb, rr, rg, rb, alive)

    return jax.jit(step)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _unsort_reduce(rr, rg, rb, orig, R: int, k: int, n_pix: int):
    """Radiance back to original (sample, pixel) lane order (padding lanes
    dropped) via a payload sort on the original ids, then the SAME
    (k, C).sum(0) reduction as the direct estimator — bitwise parity with
    grad.radiance_mean_rays."""
    _, rr2, rg2, rb2 = jax.lax.sort((orig, rr, rg, rb), num_keys=1)
    rad = jnp.stack([rr2[:R], rg2[:R], rb2[:R]], axis=-1)
    return rad.reshape(k, n_pix, 3).sum(0)


@functools.partial(jax.jit, static_argnums=(3,))
def _bank_by_pixel(rr, rg, rb, n_pix: int, pix, mask):
    """Per-pixel radiance bank for compacted/dropped lanes (production
    mode): segment reduction keyed by pixel id."""
    w = mask.astype(rr.dtype)
    rad = jnp.stack([rr * w, rg * w, rb * w], axis=-1)
    return jax.ops.segment_sum(rad, pix, num_segments=n_pix)


def render_sorted(scene, camera: Camera, seed: int = 0,
                  spp: Optional[int] = None, max_depth: Optional[int] = None,
                  sort: bool = True, interpret: bool = False,
                  sample_offset: int = 0, use_bvh: Optional[bool] = None,
                  exact: Optional[bool] = None, sort_every: int = 1):
    """Sorted deferred wavefront render -> ((H, W, 3) float64 linear image,
    RenderStats).

    ``exact=True``: no compaction; result bitwise equal to the direct XLA
    estimator at any ``sort`` setting (the sort only changes which rays
    share a kernel tile). ``exact=False`` (production default on big
    workloads): the dead tail is dropped when occupancy halves, banking its
    radiance per pixel — identical per-path values, float-sum association
    differs.
    """
    from ..renderer import RenderStats

    spp = spp or camera.samples_per_pixel
    max_depth = max_depth or camera.max_depth
    w, h = camera.image_width, camera.image_height
    n_pix = w * h
    cam = camera.constants(jnp.float32)
    seed_arr = jnp.uint32(seed)
    k = max(1, min(spp, WAVEFRONT_LANE_BUDGET // n_pix))
    # prefer a divisor of spp so every chunk shares ONE buffer size (a
    # different tail-chunk size recompiles the hit kernel + step, minutes)
    for d in range(k, 0, -1):
        if spp % d == 0:
            if d >= max(1, k // 2):
                k = d
            break
    if exact is None:
        exact = max_depth <= 8 and spp * n_pix <= WAVEFRONT_LANE_BUDGET
    lo, inv_ext = _scene_bounds(scene)
    lo_t = tuple(float(x) for x in lo)
    inv_t = tuple(float(x) for x in inv_ext)

    leaves, treedef = jax.tree_util.tree_flatten(scene)
    leaves = tuple(leaves)
    t0 = _time.perf_counter()
    acc = jnp.zeros((n_pix, 3), jnp.float32)
    nrays_total = 0.0
    pixel_ids = jnp.arange(n_pix, dtype=jnp.int32)

    def get_hit(n_rows):
        return mk.hit_kernel_call(scene, camera, n_rows, use_bvh=use_bvh,
                                  interpret=interpret)

    for c0 in range(0, spp, k):
        kk = min(k, spp - c0)
        R = kk * n_pix
        n_rows = -(-R // mk.TILE) * mk.TILE // mk.LANES
        pad = n_rows * mk.LANES - R
        pix = jnp.tile(pixel_ids, kk)
        samp = (jnp.int32(sample_offset + c0)
                + jnp.repeat(jnp.arange(kk, dtype=jnp.int32), n_pix))
        o, d, t = get_rays(cam, seed_arr, pix, samp)
        z = jnp.zeros(pad, jnp.float32)
        zi = jnp.zeros(pad, jnp.int32)
        fpad = lambda a: jnp.concatenate([a.astype(jnp.float32), z]) \
            if pad else a.astype(jnp.float32)
        ipad = lambda a: jnp.concatenate([a, zi]) if pad else a
        ones = jnp.ones(R, jnp.float32)
        state = (ipad(pix), ipad(samp),
                 jnp.arange(R + pad, dtype=jnp.int32),
                 fpad(o[:, 0]), fpad(o[:, 1]), fpad(o[:, 2]),
                 fpad(d[:, 0]), fpad(d[:, 1]), fpad(d[:, 2]), fpad(t),
                 fpad(ones), fpad(ones), fpad(ones),
                 jnp.zeros(R + pad, jnp.float32),
                 jnp.zeros(R + pad, jnp.float32),
                 jnp.zeros(R + pad, jnp.float32),
                 jnp.concatenate([jnp.ones(R, bool),
                                  jnp.zeros(pad, bool)]) if pad
                 else jnp.ones(R, bool))
        nrays = jnp.zeros((), jnp.float32)
        cur_rows = n_rows
        hit_fn, dev_args = get_hit(cur_rows)
        step = _get_step(treedef, hit_fn, cur_rows, lo_t, inv_t, sort)
        step_ns = (_get_step(treedef, hit_fn, cur_rows, lo_t, inv_t, False)
                   if sort and sort_every > 1 else step)
        import os
        debug = bool(os.environ.get("RT_WF_DEBUG"))
        for depth_i in range(max_depth):
            s_fn = step if depth_i % sort_every == 0 else step_ns
            out = s_fn(leaves, dev_args, seed_arr, jnp.int32(depth_i),
                       nrays, *state)
            nrays, n_alive, state = out[0], out[1], out[2:]
            # host sync (~24 ms tunnel round trip) only every 4th bounce:
            # pulling the live count per bounce cost ~70% of the whole
            # final_scene wall time; between pulls the bounces pipeline
            if (depth_i + 1) % 4 and depth_i + 1 < max_depth:
                continue
            na = int(n_alive)
            if debug:
                print(f"  wf c0={c0} bounce={depth_i} rows={cur_rows} "
                      f"alive={na} t={_time.perf_counter() - t0:.1f}s",
                      flush=True)
            if na == 0:
                break
            cur_lanes = cur_rows * mk.LANES
            if (not exact) and sort and na < COMPACT_BELOW * cur_lanes \
                    and cur_rows > mk.ROWS:
                # next bounce starts with a sort; compact NOW instead: sort
                # here, bank + drop the dead tail, and continue on the
                # smaller buffer (live lanes are a prefix after the sort)
                key = _sort_key(state[3], state[4], state[5], state[6],
                                state[7], state[8], state[16], lo_t, inv_t)
                state = jax.jit(_permute_state)(key, state)
                # /4-step buckets so compilations stay bounded: shrink while
                # the live set fits in the next bucket down
                new_rows = cur_rows
                while (new_rows > mk.ROWS
                       and na <= (new_rows // COMPACT_STEP) * mk.LANES):
                    new_rows = new_rows // COMPACT_STEP
                new_rows = max(mk.ROWS, -(-new_rows // mk.ROWS) * mk.ROWS)
                if new_rows < cur_rows:
                    # tail lanes are all dead (live lanes are a prefix after
                    # the sort): bank their final radiance, then drop them
                    cut = new_rows * mk.LANES
                    acc = acc + _bank_by_pixel(
                        state[13][cut:], state[14][cut:], state[15][cut:],
                        n_pix, state[0][cut:],
                        jnp.ones(state[0].shape[0] - cut, bool))
                    state = tuple(a[:cut] for a in state)
                    cur_rows = new_rows
                    hit_fn, dev_args = get_hit(cur_rows)
                    step = _get_step(treedef, hit_fn, cur_rows, lo_t,
                                     inv_t, sort)
                    step_ns = (_get_step(treedef, hit_fn, cur_rows, lo_t,
                                         inv_t, False)
                               if sort and sort_every > 1 else step)
        nrays_total += float(nrays)
        if exact:
            acc = acc + _unsort_reduce(state[13], state[14], state[15],
                                       state[2], R, kk, n_pix)
        else:
            acc = acc + _bank_by_pixel(state[13], state[14], state[15],
                                       n_pix, state[0],
                                       jnp.ones(state[0].shape[0], bool))
    # divide on device in f32 — bitwise the direct estimator's mean
    img = np.asarray(acc / jnp.float32(spp), np.float64).reshape(h, w, 3)
    stats = RenderStats(seconds=_time.perf_counter() - t0,
                        rays=int(nrays_total))
    metrics.emit("render", path="wavefront_sorted", spp=spp, width=w,
                 height=h, seconds=stats.seconds, rays=stats.rays,
                 rays_per_sec=stats.rays_per_sec, sort=sort, exact=exact)
    return img, stats
