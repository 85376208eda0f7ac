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
permutations never change any random stream. ``exact=True`` (the default,
including production big-scene renders): a lane's radiance is finished
per-path arithmetic wherever its buffer lives, dropped tails RETAIN their
final radiance, and every lane rejoins one original-order (k, C).sum(0)
reduction at chunk end — the result is BITWISE EQUAL to
grad.radiance_mean_rays regardless of sort order or compaction schedule
(tests/test_wavefront.py). ``exact=False`` banks dropped tails per pixel by
segment reduction as they die: identical per-path radiance, float-sum
association differs (values equal to float tolerance).

Bounces run in fused SEGMENTS of ``SEG_BOUNCES``: one jitted dispatch per
segment (sort -> Pallas hit -> XLA shade, repeated), so XLA fuses across
bounce boundaries and the host live-count sync happens once per segment.

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
# Buffer sizes shrink in /2 steps (halving ladder): every surviving bounce
# then runs at >= 50% occupancy instead of the round-4 /4 ladder's >= 25%.
# The extra compilations are bounded (one hit kernel + segment per ladder
# rung, cached across spp chunks) and pay for themselves within one
# production chunk.
COMPACT_BELOW = 0.4
COMPACT_STEP = 2

# Bounces fused into ONE jitted dispatch: XLA fuses shade -> sort -> next
# hit's operand prep across bounce boundaries instead of round-tripping the
# 17-lane state through a host dispatch per bounce, and the host pulls the
# live count once per segment (the ~24 ms tunnel round trip amortizes).
SEG_BOUNCES = 4


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


def _permute_state(key, state, n_pix, samp_base):
    """Reorder the whole lane state by ``key`` with TWO stable multi-payload
    ``lax.sort`` calls (key + <= 8 payloads each): the payload moves ride the
    vectorized sort network. Measured at 2.56M lanes on v5e: 42 ms vs 87 ms
    for argsort + one (R, 17) packed row gather (XLA row gathers run a
    serial per-row loop) vs 613 ms for 17 per-column gathers. An 18-operand
    single sort compiled for >9 min; two <=9-operand sorts of the SAME key
    compile once (XLA dedupes the network) in ~4 min per buffer size.

    ``pix`` and ``samp`` do not ride: they are functions of the original
    lane id (pix = orig % n_pix, samp = samp_base + orig // n_pix — the
    chunk lays lanes out pixel-major), so only 15 columns move. ``orig``
    rides as f32 (lane ids < 2^24, exactly representable); both sorts are
    stable on the same key, hence apply the identical permutation."""
    s1 = jax.lax.sort(
        (key, state[2].astype(jnp.float32), state[3], state[4], state[5],
         state[6], state[7], state[8], state[9]), num_keys=1)
    s2 = jax.lax.sort(
        (key, state[10], state[11], state[12], state[13], state[14],
         state[15], state[16].astype(jnp.float32)), num_keys=1)
    orig = s1[1].astype(jnp.int32)
    pix = orig % n_pix
    samp = samp_base + orig // n_pix
    return (pix, samp, orig) + s1[2:] + s2[1:7] + (s2[7] > 0.0,)


@functools.partial(jax.jit, static_argnums=(2,))
def _permute_state_gather(key, state, n_pix, samp_base):
    """Compaction-site permute: argsort + one (R, 15) packed row gather.
    ~2x slower than :func:`_permute_state` but compiles in seconds — it runs
    at most once per compaction (a handful per chunk), where another
    minutes-long sort-network compile per ladder rung would never pay."""
    perm = jnp.argsort(key)
    packed = jnp.stack(
        [state[2].astype(jnp.float32)] + list(state[3:16])
        + [state[16].astype(jnp.float32)], axis=1)
    packed = packed[perm]
    orig = packed[:, 0].astype(jnp.int32)
    pix = orig % n_pix
    samp = samp_base + orig // n_pix
    return ((pix, samp, orig) + tuple(packed[:, 1 + c] for c in range(13))
            + (packed[:, 14] > 0.0,))


@functools.lru_cache(maxsize=256)
def _get_seg(treedef, hit_fn, n_rows, lo_t, inv_t, sort_flags: tuple,
             n_pix: int):
    """A cached jitted wavefront SEGMENT: ``len(sort_flags)`` bounces of
    [sort ->] pallas hit -> XLA shade fused into one dispatch. Keyed on the
    (config, buffer size, per-bounce sort pattern) so repeated renders and
    compaction buckets reuse compilations. Fusing bounces lets XLA overlap
    the XLA shade/sort work across bounce boundaries and cuts the host
    dispatch + live-count sync cadence to once per segment."""

    def seg(scene_leaves, dev_args, seed, depth0, samp_base, nrays, *state):
        scene = jax.tree_util.tree_unflatten(treedef, scene_leaves)
        for j, do_sort in enumerate(sort_flags):
            depth_i = depth0 + j
            if do_sort:
                key = _sort_key(state[3], state[4], state[5], state[6],
                                state[7], state[8], state[16], lo_t, inv_t)
                state = _permute_state(key, state, n_pix, samp_base)
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
            state = (pix, samp, orig, ox, oy, oz, dx, dy, dz, rtime,
                     tr, tg, tb, rr, rg, rb, alive)
        n_alive = jnp.sum(state[16].astype(jnp.int32))
        return (nrays, n_alive) + state

    return jax.jit(seg)


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _unsort_reduce(rr, rg, rb, orig, R: int, k: int, n_pix: int):
    """Radiance back to original (sample, pixel) lane order (padding lanes
    dropped) via a payload sort on the original ids, then the SAME
    strictly-sequential sample sum as the direct estimator
    (grad._sum_samples) — bitwise parity with grad.radiance_mean_rays."""
    from .. import grad as grad_mod

    _, rr2, rg2, rb2 = jax.lax.sort((orig, rr, rg, rb), num_keys=1)
    rad = jnp.stack([rr2[:R], rg2[:R], rb2[:R]], axis=-1)
    return grad_mod._sum_samples(rad, k, n_pix)


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

    ``exact=True`` (default): result bitwise equal to the direct XLA
    estimator at any ``sort`` setting — the sort only changes which rays
    share a kernel tile, and COMPACTION keeps bitwise parity too: a dropped
    lane's finished radiance is retained (not summed), every lane rejoins
    the one deterministic original-order reduction at chunk end.
    ``exact=False``: dropped tails bank per pixel by segment reduction as
    they die — identical per-path values, float-sum association differs
    (kept for the distributed banked accumulation path).
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
        exact = True
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
        import os
        debug = bool(os.environ.get("RT_WF_DEBUG"))
        # exact mode: dropped-at-compaction lanes keep their per-lane
        # radiance here and rejoin the single original-order reduction at
        # chunk end — compaction stays bitwise-invisible
        dropped = []
        samp_base = jnp.int32(sample_offset + c0)
        depth_done = 0
        while depth_done < max_depth:
            # early bounces kill the most lanes (miss-to-background at
            # bounce 1-2): short segments there compact sooner; the steady
            # tail runs full segments
            nb = 2 if depth_done < 4 else SEG_BOUNCES
            nb = min(nb, max_depth - depth_done)
            # bounce 0 needs no sort: camera rays arrive in pixel order,
            # already coherent (sorting is a bitwise no-op, so skipping it
            # is too)
            flags = tuple(sort and (depth_done + j) % sort_every == 0
                          and depth_done + j > 0 for j in range(nb))
            seg = _get_seg(treedef, hit_fn, cur_rows, lo_t, inv_t, flags,
                           n_pix)
            out = seg(leaves, dev_args, seed_arr, jnp.int32(depth_done),
                      samp_base, nrays, *state)
            nrays, n_alive, state = out[0], out[1], out[2:]
            depth_done += nb
            if depth_done >= max_depth:
                break
            na = int(n_alive)
            if debug:
                print(f"  wf c0={c0} depth={depth_done} rows={cur_rows} "
                      f"alive={na} t={_time.perf_counter() - t0:.1f}s",
                      flush=True)
            if na == 0:
                break
            cur_lanes = cur_rows * mk.LANES
            if sort and na < COMPACT_BELOW * cur_lanes \
                    and cur_rows > mk.ROWS:
                # sort here (dead lanes key to the end), drop the dead
                # tail, and continue on the smaller buffer
                key = _sort_key(state[3], state[4], state[5], state[6],
                                state[7], state[8], state[16], lo_t, inv_t)
                state = _permute_state_gather(key, state, n_pix, samp_base)
                # halving ladder so compilations stay bounded: shrink while
                # the live set fits in the next bucket down
                new_rows = cur_rows
                while (new_rows > mk.ROWS
                       and na <= (new_rows // COMPACT_STEP) * mk.LANES):
                    new_rows = new_rows // COMPACT_STEP
                new_rows = max(mk.ROWS, -(-new_rows // mk.ROWS) * mk.ROWS)
                if new_rows < cur_rows:
                    # tail lanes are all dead (live lanes are a prefix after
                    # the sort): retain (exact) or bank (banked) their final
                    # radiance, then drop them
                    cut = new_rows * mk.LANES
                    if exact:
                        dropped.append((state[2][cut:], state[13][cut:],
                                        state[14][cut:], state[15][cut:]))
                    else:
                        acc = acc + _bank_by_pixel(
                            state[13][cut:], state[14][cut:], state[15][cut:],
                            n_pix, state[0][cut:],
                            jnp.ones(state[0].shape[0] - cut, bool))
                    state = tuple(a[:cut] for a in state)
                    cur_rows = new_rows
                    hit_fn, dev_args = get_hit(cur_rows)
        nrays_total += float(nrays)
        if exact:
            orig_all, rr_all, rg_all, rb_all = state[2], state[13], \
                state[14], state[15]
            if dropped:
                parts = list(dropped) + [(orig_all, rr_all, rg_all, rb_all)]
                orig_all = jnp.concatenate([p[0] for p in parts])
                rr_all = jnp.concatenate([p[1] for p in parts])
                rg_all = jnp.concatenate([p[2] for p in parts])
                rb_all = jnp.concatenate([p[3] for p in parts])
            acc = acc + _unsort_reduce(rr_all, rg_all, rb_all, orig_all,
                                       R, kk, n_pix)
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
