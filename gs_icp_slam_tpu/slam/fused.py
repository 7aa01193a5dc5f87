"""The fused per-frame SLAM step: tracking + keyframing + mapping as ONE
XLA program.

The reference interleaves its tracker and mapper through shared-memory
flags and busy waits (SURVEY §2.4); a naive port — one jit call per stage
plus host-side keyframe logic — costs 6-10 host round trips per frame,
which on a remote-dispatched TPU (~30 ms/round trip) dwarfs the actual
compute.  Fusing the whole frame into one jitted function makes the frame
rate limited by compute only: the host just streams frames in, and
successive dispatches pipeline.

Keyframe decisions (mp_Tracker.py:235-249) become lax.cond branches;
gaussian insertion masks its own validity by the keyframe flag, so the
non-keyframe path writes nothing; the mapper's per-frame iteration budget
is a Python-unrolled loop of optimization steps with jax.random keyframe
choice (newest-first, then uniform — mp_Mapper.py:200-206).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..config import SLAMConfig
from ..models import (AdamState, GaussianMap, add_gaussians, adam_step,
                      map_lr_tree, map_params, prune_large_and_transparent,
                      trackable_export, with_params)
from ..ops.gicp import (gicp_align, make_source, source_correspondences,
                        target_from_gaussians, target_from_points, GICPTarget)
from ..ops.rasterize import rasterize_tiled
from ..utils.losses import mapping_loss
from ..utils.pointcloud import DownsampleFilter
from ..utils.quat import quat_multiply, rotmat_to_quat
from ..utils.se3 import invert_se3, transform_points


class FusedStep(NamedTuple):
    step: Callable        # (state, depth, rgb_chw, is_last[, nb, tb]) -> state
    step_chunk: Callable  # (state, depth (C,H,W), rgb (C,3,H,W),
                          #  is_last (C,)[, nb, tb]) -> state: C frames per
                          # DISPATCH — the per-call overhead of the remote
                          # relay (~16 ms measured) amortizes across the
                          # chunk; use for throughput, step for live mode
    render_eval: Callable  # (params, live, w2c, rgb_chw, depth) -> (img, psnr)
    refine: Callable      # (state,) -> state: REFINE_CHUNK mapping iters
    pin_state: Callable   # (state,) -> state: device_put the keyframe
                          # stores into the row-major layout the step jits
                          # are pinned to (see make_fused_step); REQUIRED
                          # on every freshly created/loaded state before
                          # the first step/refine call in non-mesh mode


REFINE_CHUNK = 64  # post-run refinement iterations per jit call (a
                   # lax.scan: chunk size costs dispatches, not compiles)


def to_chw(rgb_hwc) -> "jnp.ndarray":
    """Host-side (H, W, 3) uint8 -> device channel-first (3, H, W).

    All jit boundaries take channel-first images: a trailing dim of 3
    would be padded to the 128-lane TPU tile, inflating HBM 42x."""
    import numpy as np
    return jnp.asarray(np.ascontiguousarray(
        np.asarray(rgb_hwc).transpose(2, 0, 1)))


class MappingPrimitives(NamedTuple):
    """The mapping-side pieces of the fused step, exposed for tests and the
    scaling harness (tests/test_parallel.py, scripts/bench_scaling.py)."""
    raster: Callable       # partial of rasterize_tiled at cfg geometry
    opt_loss: Callable     # (params, live, w2c, rgb_u8, depth_raw)
    opt_step: Callable     # single-keyframe step
    opt_step_batched: Callable | None  # mesh DP step (None without mesh)
    sh_concat: Callable    # params -> (C, (sh+1)^2, 3) SH coefficients


def make_mapping_primitives(cfg: SLAMConfig, mesh=None,
                            n_cap: int | None = None) -> MappingPrimitives:
    """Build the mapping optimization step(s) for a config.

    With `mesh`: also builds `opt_step_batched`, the FSDP + keyframe-DP
    step — params/moments enter sharded along capacity, each device
    all-gathers the params, renders ITS OWN keyframe of the batch,
    psum-scatters gradients back to its shard, and applies shard-local
    masked Adam (parallel/sharded.py docstring has the full design).

    `n_cap`: the capacity bucket these steps will see (fused.py bucket
    dispatch) — caps the per-view visible budget so the raster's sort and
    pair sizes track the map scale."""
    import numpy as _np

    intr = cfg.intr
    rcfg = cfg.render
    lrs = map_lr_tree(cfg.opt)
    # numpy, NOT jnp: make_mapping_primitives may be invoked inside a jit
    # trace (fused.py's per-bucket get_prim) and is lru-cached across
    # traces — a jnp constant created under one trace would leak into the
    # next (UnexpectedTracerError)
    bg = _np.asarray(rcfg.bg_color, _np.float32)
    fx, fy = intr.fx, intr.fy
    rcx, rcy = (intr.width - 1) / 2.0, (intr.height - 1) / 2.0
    # under a mesh the step runs on the mesh's devices, which may be the
    # virtual CPU test mesh even when a TPU backend is registered — key the
    # pallas switch off the mesh, not the default backend
    use_pallas = (mesh.devices.flat[0].platform == "tpu") if mesh else None
    v_cap = rcfg.visible_capacity
    if n_cap is not None:
        v_cap = min(v_cap, n_cap)
    # Per-tile capacity K sized from EXPECTED PAIRS PER TILE, not map
    # capacity (round-2 regression: a capacity-keyed K=128 clamp, tuned on
    # the 836-tile bench, saturated the 12-tile small-scene geometry and
    # dropped 1313 pairs -> PSNR 16.8).  Each of the <=V visible splats
    # emits at most tile_span^2 pairs, so mean pairs/tile <= D^2*V/T; a
    # tile at that mean with K below it is guaranteed lossy, while K well
    # above it only pads the window DMA (compute already scales with the
    # true per-tile counts + early termination, not K).  Keep K a multiple
    # of 128 for the Pallas window path.  Quality tests assert
    # stats[2] (pair_dropped) stays ~0 so this sizing can't silently rot.
    ntx_ = -(-intr.width // rcfg.tile_size)
    nty_ = -(-intr.height // rcfg.tile_size)
    est = (rcfg.tile_span ** 2) * v_cap / float(ntx_ * nty_)
    tile_cap = min(rcfg.max_per_tile,
                   max(128, int(-(-est // 128)) * 128))
    raster = partial(
        rasterize_tiled, sh_degree=cfg.map.sh_degree, width=intr.width,
        height=intr.height, tile=rcfg.tile_size,
        visible_cap=v_cap, tile_span=rcfg.tile_span,
        tile_cap=tile_cap, chunk=rcfg.composite_chunk,
        want_used=False, use_pallas=use_pallas)

    # training_stage 1/2: optimize at half/quarter resolution — render
    # small, downsample gt on the fly (the reference pre-computed pyramids,
    # shared_objs.py:146-155; render_3 resolution switch,
    # gaussian_renderer/__init__.py:237-242)
    stage = int(getattr(cfg.opt, "training_stage", 0))
    sdiv = 2 * stage if stage > 0 else 1
    if stage > 0:
        sw, sh_px = intr.width // sdiv, intr.height // sdiv
        raster_opt = partial(
            rasterize_tiled, sh_degree=cfg.map.sh_degree, width=sw,
            height=sh_px, tile=rcfg.tile_size,
            visible_cap=rcfg.visible_capacity, tile_span=rcfg.tile_span,
            tile_cap=rcfg.max_per_tile, chunk=rcfg.composite_chunk,
            want_used=False, use_pallas=use_pallas)
        ofx, ofy = fx / sdiv, fy / sdiv
        ocx, ocy = (sw - 1) / 2.0, (sh_px - 1) / 2.0
    else:
        raster_opt = raster
        ofx, ofy, ocx, ocy = fx, fy, rcx, rcy

    def _downsample_gt(gt_img, gt_depth):
        if stage == 0:
            return gt_img, gt_depth
        sw, sh_px = intr.width // sdiv, intr.height // sdiv
        # rgb: area average (cv2.resize INTER_LINEAR downscale analogue)
        img = gt_img[:, :sh_px * sdiv, :sw * sdiv].reshape(
            3, sh_px, sdiv, sw, sdiv).mean(axis=(2, 4))
        # depth: nearest (INTER_NEAREST, shared_objs.py:152-153) — keeps
        # exact zeros so the depth-validity mask semantics survive
        dep = gt_depth[:sh_px * sdiv:sdiv, :sw * sdiv:sdiv]
        return img, dep

    def _sh(params):
        return jnp.concatenate(
            [params["f_dc"][:, None, :], params["f_rest"]], axis=1)

    def opt_loss(params, live, w2c, rgb_u8, depth_raw):
        # rgb_u8 is channel-first (3, H, W): see SLAMState.kf_rgb
        gt_img = rgb_u8.astype(jnp.float32) / 255.0
        gt_depth = depth_raw / intr.depth_scale
        gt_img, gt_depth = _downsample_gt(gt_img, gt_depth)
        out = raster_opt(params["xyz"], params["rotation"],
                         jnp.exp(params["log_scaling"]),
                         jax.nn.sigmoid(params["opacity_logit"][:, 0]),
                         _sh(params), w2c, live, bg, ofx, ofy, ocx, ocy)
        loss, _ = mapping_loss(out.color, out.depth, gt_img, gt_depth,
                               lambda_dssim=cfg.opt.lambda_dssim,
                               depth_weight=cfg.opt.depth_loss_weight,
                               d_max=cfg.opt.depth_d_max)
        return loss, out.stats

    def opt_step(params, adam, live, w2c, rgb_u8, depth_raw):
        (loss, stats), grads = jax.value_and_grad(
            lambda p: opt_loss(p, live, w2c, rgb_u8, depth_raw),
            has_aux=True)(params)
        params, adam = adam_step(params, grads, adam, lrs, live,
                                 b1=cfg.opt.adam_b1, b2=cfg.opt.adam_b2,
                                 eps=cfg.opt.adam_eps)
        return params, adam, loss, stats

    # sharded batched variant: FSDP all-gather -> per-device keyframe render
    # -> psum-scatter grads -> shard-local Adam (parallel/sharded.py)
    opt_step_batched = None
    if mesh is not None:
        from jax.sharding import PartitionSpec as _P

        from ..parallel.sharded import MAP_AXIS, choose_mode
        n_dev = int(mesh.devices.size)
        mode = choose_mode(cfg.map.capacity, cfg.map.sh_degree,
                           getattr(cfg.engine, "parallel_mode", "auto"))

        if mode == "dp":
            # map replicated, keyframes sharded: each device renders its
            # OWN keyframe against its full local copy; comm = ONE grad
            # all-reduce.  No O(capacity) param movement per iteration —
            # the fix for VERDICT r2 #5's scaling collapse (the fsdp
            # all-gather of every param array per device per iter).
            def _local_opt_step(params_r, m_r, v_r, step_s, live_r,
                                w2c_l, rgb_l, depth_l):
                def loss_fn(pf):
                    return opt_loss(pf, live_r, w2c_l[0], rgb_l[0],
                                    depth_l[0])

                (loss, stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params_r)
                g = jax.tree.map(
                    lambda x: jax.lax.psum(x, MAP_AXIS) / n_dev, grads)
                params_r, adam_r = adam_step(
                    params_r, g, AdamState(m=m_r, v=v_r, step=step_s),
                    lrs, live_r, b1=cfg.opt.adam_b1, b2=cfg.opt.adam_b2,
                    eps=cfg.opt.adam_eps)
                loss = jax.lax.psum(loss, MAP_AXIS) / n_dev
                stats = jax.lax.pmax(stats, MAP_AXIS)
                return (params_r, adam_r.m, adam_r.v, adam_r.step, loss,
                        stats)

            _sharded_local = jax.shard_map(
                _local_opt_step, mesh=mesh,
                in_specs=(_P(), _P(), _P(), _P(), _P(),
                          _P(MAP_AXIS), _P(MAP_AXIS), _P(MAP_AXIS)),
                out_specs=(_P(), _P(), _P(), _P(), _P(), _P()),
                check_vma=False)
        else:
            def _local_opt_step(params_s, m_s, v_s, step_s, live_s,
                                w2c_l, rgb_l, depth_l):
                gather = partial(jax.lax.all_gather, axis_name=MAP_AXIS,
                                 axis=0, tiled=True)
                params_f = jax.tree.map(gather, params_s)
                live_f = gather(live_s)

                def loss_fn(pf):
                    return opt_loss(pf, live_f, w2c_l[0], rgb_l[0],
                                    depth_l[0])

                (loss, stats), grads_f = jax.value_and_grad(
                    loss_fn, has_aux=True)(params_f)
                g_s = jax.tree.map(
                    lambda g: jax.lax.psum_scatter(
                        g, MAP_AXIS, scatter_dimension=0,
                        tiled=True) / n_dev,
                    grads_f)
                params_s, adam_s = adam_step(
                    params_s, g_s, AdamState(m=m_s, v=v_s, step=step_s),
                    lrs, live_s, b1=cfg.opt.adam_b1, b2=cfg.opt.adam_b2,
                    eps=cfg.opt.adam_eps)
                loss = jax.lax.psum(loss, MAP_AXIS) / n_dev
                stats = jax.lax.pmax(stats, MAP_AXIS)
                return (params_s, adam_s.m, adam_s.v, adam_s.step, loss,
                        stats)

            _sharded_local = jax.shard_map(
                _local_opt_step, mesh=mesh,
                in_specs=(_P(MAP_AXIS), _P(MAP_AXIS), _P(MAP_AXIS), _P(),
                          _P(MAP_AXIS), _P(MAP_AXIS), _P(MAP_AXIS),
                          _P(MAP_AXIS)),
                out_specs=(_P(MAP_AXIS), _P(MAP_AXIS), _P(MAP_AXIS), _P(),
                           _P(), _P()),
                check_vma=False)

        def opt_step_batched(params, adam, live, w2c_b, rgb_b, depth_b):
            p, m, v, step, loss, stats = _sharded_local(
                params, adam.m, adam.v, adam.step, live, w2c_b, rgb_b,
                depth_b)
            return p, AdamState(m=m, v=v, step=step), loss, stats

    return MappingPrimitives(raster=raster, opt_loss=opt_loss,
                             opt_step=opt_step,
                             opt_step_batched=opt_step_batched, sh_concat=_sh)


def make_fused_step(cfg: SLAMConfig, filt: DownsampleFilter,
                    mesh=None) -> FusedStep:
    """Build the fused frame step.  With `mesh` set, the map parameters and
    Adam moments are FSDP-sharded along capacity and every mapping
    iteration optimizes `mesh.size` keyframes at once (one per device, DP)
    inside a shard_map region — see parallel/sharded.py."""
    intr = cfg.intr
    gicp_cfg = cfg.gicp
    tc = cfg.engine.target_capacity
    # Pallas 1-NN gate for tracking: keyed off the MESH devices, not the
    # process default backend — on the 8-virtual-CPU dryrun mesh inside a
    # process whose default backend is the TPU plugin, the kernel cannot
    # lower (same rule as the rasterizer's use_pallas above).
    use_pallas = (mesh.devices.flat[0].platform == "tpu") if mesh else None

    flat_idxs = jnp.asarray(filt.flat_idxs)
    x_pre = jnp.asarray(filt.x_pre)
    y_pre = jnp.asarray(filt.y_pre)

    from functools import lru_cache

    @lru_cache(maxsize=None)
    def get_prim(n_cap=None):
        return make_mapping_primitives(cfg, mesh, n_cap=n_cap)

    prim = get_prim()
    raster = prim.raster
    _sh = prim.sh_concat
    opt_step_batched = prim.opt_step_batched
    bg = jnp.asarray(cfg.render.bg_color, jnp.float32)
    fx, fy = intr.fx, intr.fy
    rcx, rcy = (intr.width - 1) / 2.0, (intr.height - 1) / 2.0

    # ---------------- keyframe-store layout pin ----------------
    # XLA's layout assignment, left alone, picks a SLOT-MINOR layout for
    # the (Kc, 3, H, W)/(Kc, H, W) pixel stores (the DUS root anchors the
    # donated home layout), then inserts full-store row-major copies in
    # front of every mapping-side read: 4 copies x 2.6 ms + a 7.5 ms
    # strided one-slot DUS per frame at Kc=256 (r5 trace).  Pinning the
    # stores row-major makes the one-slot write/read contiguous (~2.4 MB)
    # and kills every whole-store copy.  Mesh mode skips the pin (layout
    # constraints interact with GSPMD; the stores are replicated there
    # and the dryrun mesh is CPU anyway).
    # the pin applies on the real TPU only: CPU layouts are always
    # row-major (nothing to fix), and the CPU runtime hung inside
    # engine.run when the jits carried layout Formats (r5)
    _pin_dev = getattr(jax.config, "jax_default_device", None)
    if _pin_dev is None:
        _pin_dev = jax.devices()[0]
    do_pin = mesh is None and _pin_dev.platform == "tpu"
    if do_pin:
        from jax.experimental.layout import Layout as _Layout
        from jax.experimental.layout import \
            with_layout_constraint as _with_layout

        def pin_stores(state):
            return state._replace(
                kf_rgb=_with_layout(state.kf_rgb, _Layout((0, 1, 2, 3))),
                kf_depth=_with_layout(state.kf_depth, _Layout((0, 1, 2))))
    else:
        def pin_stores(state):
            return state

    # ---------------- capacity bucketing ----------------
    # Live splats occupy the prefix [0, gmap.n); the engine passes a static
    # n_bucket >= n (power of two, with insert margin) so every map-sized
    # computation — projection, depth sort, adam, prune, export — runs at
    # the CURRENT map scale instead of the full static capacity.  The
    # state keeps full-capacity arrays (stable shapes across buckets);
    # slices in, dynamic-update-slice out.
    def slice_map(m, nb):
        if nb is None or nb >= m.capacity:
            return m
        return GaussianMap(**{
            f: (getattr(m, f) if f == "n" else getattr(m, f)[:nb])
            for f in m._fields})

    def unslice_map(full, part, nb):
        if nb is None or nb >= full.capacity:
            return part
        return GaussianMap(**{
            f: (part.n if f == "n"
                else getattr(full, f).at[:nb].set(getattr(part, f)))
            for f in full._fields})

    def slice_adam(a, nb):
        if nb is None:
            return a
        cut = jax.tree.map(lambda x: x[:nb], (a.m, a.v))
        return AdamState(m=cut[0], v=cut[1], step=a.step)

    def unslice_adam(full, part, nb):
        if nb is None:
            return part
        m, v = jax.tree.map(lambda f, p: f.at[:nb].set(p),
                            (full.m, full.v), (part.m, part.v))
        return AdamState(m=m, v=v, step=part.step)

    def slice_target(t, tb):
        if tb is None or tb >= t.capacity:
            return t
        return GICPTarget(points=t.points[:, :tb], cov6=t.cov6[:, :tb],
                          valid=t.valid[:tb], nn_bias=t.nn_bias[:, :tb])

    def mapping_iters(state, n_iters: int, n_bucket=None):
        # lax.scan over ONE iteration body, not a python unroll: the
        # compile cost of the refine program (16+ iters) was ~34 s per
        # process on the remote-compile backend; the scanned body
        # compiles once at 1-iteration size for any n_iters
        gmap_full = state.gmap
        gmap0 = slice_map(gmap_full, n_bucket)
        adam0 = slice_adam(state.adam, n_bucket)
        opt_step_local = get_prim(n_bucket).opt_step if mesh is None \
            else None

        def body(carry, it):
            gmap, adam, rng, train_iter, vis_drop, pair_drop = carry
            rng, sub = jax.random.split(rng)
            rand_idx = jax.random.randint(sub, (), 0,
                                          jnp.maximum(state.kf_count, 1))
            idx = jnp.where((it == 0) & (state.new_kf >= 0), state.new_kf,
                            rand_idx)
            train_iter = train_iter + 1

            def do_prune(m):
                return prune_large_and_transparent(
                    m, cfg.map.prune_min_opacity, cfg.map.prune_extent)

            gmap = jax.lax.cond(
                train_iter % cfg.map.prune_interval == 0, do_prune,
                lambda m: m, gmap)
            params = map_params(gmap)

            if mesh is None:
                w2c = state.kf_w2c[idx]
                rgb = state.kf_rgb[idx]
                depth = state.kf_depth[idx]
                # frame 0 has no stored keyframe yet: skip the whole
                # render + backward instead of computing and discarding it
                params, adam, _, stats = jax.lax.cond(
                    state.kf_count > 0,
                    lambda p, a: opt_step_local(p, a, gmap.live, w2c, rgb,
                                                depth),
                    lambda p, a: (p, a, jnp.float32(0),
                                  jnp.zeros((3,), jnp.int32)),
                    params, adam)
            else:
                # one keyframe per device: the first slot takes the newest
                # keyframe (mp_Mapper.py:200-206 newest-then-random), the
                # rest are uniform random over the store
                n_dev = int(mesh.devices.size)
                rng, sub = jax.random.split(rng)
                idxs = jax.random.randint(sub, (n_dev,), 0,
                                          jnp.maximum(state.kf_count, 1))
                idxs = idxs.at[0].set(idx)
                params, adam, _, stats = jax.lax.cond(
                    state.kf_count > 0,
                    lambda p, a: opt_step_batched(
                        p, a, gmap.live, state.kf_w2c[idxs],
                        state.kf_rgb[idxs], state.kf_depth[idxs]),
                    lambda p, a: (p, a, jnp.float32(0),
                                  jnp.zeros((3,), jnp.int32)),
                    params, adam)
            gmap = with_params(gmap, params)
            vis_drop = jnp.maximum(vis_drop, stats[1])
            pair_drop = jnp.maximum(pair_drop, stats[2])
            return (gmap, adam, rng, train_iter, vis_drop, pair_drop), None

        init = (gmap0, adam0, state.rng, state.train_iter,
                state.stat_vis_dropped, state.stat_pair_dropped)
        if n_iters <= 4:
            # unrolled: ~2 FPS faster in the per-frame step (the scan
            # carry forces copies of the bucket-sized map pytree)
            carry = init
            for it in range(n_iters):
                carry, _ = body(carry, jnp.int32(it))
            gmap, adam, rng, train_iter, vis_drop, pair_drop = carry
        else:
            (gmap, adam, rng, train_iter, vis_drop, pair_drop), _ = \
                jax.lax.scan(body, init,
                             jnp.arange(n_iters, dtype=jnp.int32))
        gmap = unslice_map(gmap_full, gmap, n_bucket)
        adam = unslice_adam(state.adam, adam, n_bucket)
        return state._replace(gmap=gmap, adam=adam, rng=rng,
                              new_kf=jnp.int32(-1), train_iter=train_iter,
                              stat_vis_dropped=vis_drop,
                              stat_pair_dropped=pair_drop)

    # ---------------- keyframe insertion ----------------
    # The BOOKKEEPING runs inside the frame's lax.cond branches; the
    # actual (Kc, 3, H, W) + (Kc, H, W) store WRITES happen once at the
    # step's top level (see `step`).  Round 3 carried the stores through
    # the branch conds and XLA picked branch-internal layouts, inserting
    # full-store async layout copies EVERY frame — ~10.6 ms at the
    # production keyframe_capacity=256 (PROFILE_r03 layout_findings,
    # VERDICT r3 #3).  Outside every cond, the update is one in-place
    # dynamic-update-slice of the donated buffers.
    def store_keyframe(state, do_store):
        """Pick a slot (reservoir eviction once full) and update the
        counters; the caller writes the pixel stores.  The reference
        keeps every keyframe and the mapper samples uniformly from them
        (mp_Mapper.py:174-206); a uniform-eviction reservoir keeps the
        stored set an (approximately) uniform sample of the full history,
        so the mapper's sampling distribution matches at bounded memory.
        kf_total > kf_count signals that eviction has happened."""
        kc = cfg.engine.keyframe_capacity
        rng, sub = jax.random.split(state.rng)
        victim = jax.random.randint(sub, (), 0, kc)
        slot_in = jnp.where(state.kf_count < kc, state.kf_count, victim)
        stored = do_store.astype(jnp.int32)
        return state._replace(
            rng=rng,
            kf_count=jnp.minimum(state.kf_count + stored, kc),
            kf_total=state.kf_total + stored,
            new_kf=jnp.where(do_store, slot_in, state.new_kf))

    def export_target(gmap, n_bucket=None):
        # bucket-sliced: the argsort compaction runs at the live map
        # scale; trackables <= n <= n_bucket so capping the export size to
        # the bucket loses nothing, and the target stays tc-padded
        out_cap = tc if n_bucket is None else min(tc, n_bucket)
        pts, rots, scales, valid = trackable_export(
            slice_map(gmap, n_bucket), cfg.map.trackable_opacity_th,
            out_cap)
        return target_from_gaussians(pts, rots, scales, valid, gicp_cfg,
                                     capacity=tc)

    # ---------------- the fused frame step ----------------
    def step(state, depth_raw, rgb_u8, is_last, n_bucket=None,
             t_bucket=None):
        # n_bucket/t_bucket are STATIC capacity buckets chosen by the
        # engine (FusedEngine._buckets): compute scales with the live map,
        # not the worst-case static capacity.  None = full capacity.
        # preprocess (mp_Tracker.py:415-431); rgb_u8 is (3, H, W)
        z = depth_raw.reshape(-1)[flat_idxs].astype(jnp.float32) / intr.depth_scale
        colors = (rgb_u8.reshape(3, -1)[:, flat_idxs].T
                  .astype(jnp.float32) / 255.0)
        points = jnp.stack([x_pre * z, y_pre * z, z], axis=-1)
        valid = z != 0.0
        trackable = valid & (z <= intr.depth_trunc)

        def first_frame(state):
            pose0 = state.poses[0]
            pts_w = transform_points(pose0, points)
            target, quat, scales = target_from_points(pts_w, trackable,
                                                      gicp_cfg, capacity=tc,
                                                      use_pallas=use_pallas)
            gmap = add_gaussians(state.gmap, pts_w, colors, quat, scales, z,
                                 trackable, valid,
                                 init_opacity=cfg.map.init_opacity)
            state = state._replace(gmap=gmap, target=target,
                                   last_ratio=jnp.float32(0.0))
            state = store_keyframe(state, jnp.bool_(True))
            return state._replace(
                poses=state.poses.at[0].set(pose0),
                frame_idx=jnp.int32(1), from_last_kf=jnp.int32(0))

        def track_frame(state):
            source = make_source(points, valid, gicp_cfg,
                                 trackable=trackable,
                                 grid=(filt.gh, filt.gw),
                                 use_pallas=use_pallas)
            prev = state.poses[state.frame_idx - 1]
            init_T2 = None
            if gicp_cfg.motion_model in ("constant_velocity", "adaptive"):
                # extrapolate the last relative motion:
                # T_init = (T_{k-1} T_{k-2}^{-1}) T_{k-1}; falls back to
                # constant position on frame 1 (reference mp_Tracker.py:197)
                prev2 = state.poses[jnp.maximum(state.frame_idx - 2, 0)]
                delta = prev @ invert_se3(prev2)
                cv = jnp.where(state.frame_idx >= 2, delta @ prev, prev)
                if gicp_cfg.motion_model == "adaptive":
                    # default model: CP seed, switched to the CV proposal
                    # inside gicp_align when the PREDICTED inter-frame
                    # rotation exceeds cfg.adaptive_trigger_deg (magnitude
                    # gate; post-step-error judging was tried and rejected
                    # — gicp_align's docstring has the measurements)
                    init_T, init_T2 = prev, cv
                else:
                    init_T = cv
            else:
                init_T = prev
            # align returns the final correspondences too — the separate
            # source_correspondences pass (one more full 1-NN) is gone.
            # The target is sliced to its bucket: export compacts valid
            # slots into the prefix, so [: t_bucket] sees all of them.
            T, _, _, sqd = gicp_align(source,
                                      slice_target(state.target, t_bucket),
                                      init_T, gicp_cfg,
                                      use_pallas=use_pallas,
                                      init_T2=init_T2)

            pts_w = transform_points(T, source.points)
            n_track = jnp.sum(source.valid)
            overlap = jnp.sum(source.valid
                              & (sqd < cfg.kf.overlapped_th))
            ratio = overlap / jnp.maximum(n_track, 1)
            pose_q = rotmat_to_quat(T[:3, :3])
            rots_w = quat_multiply(pose_q[None, :], source.quat)

            tracking_kf = is_last | (ratio < cfg.kf.keyframe_th)
            from_last = jnp.where(tracking_kf, 0, state.from_last_kf + 1)
            mapping_kf = (~tracking_kf) & (from_last % cfg.kf.keyframe_freq
                                           == 0)
            do_insert = tracking_kf | mapping_kf

            # overlap dedup restricts the trackable mask on tracking KFs
            # (mp_Tracker.py:266-275); all valid points still insert.
            # Keyframes are ~1 in keyframe_freq frames: cond skips the
            # full-capacity insert scatters and keyframe-store writes on
            # the common non-keyframe path
            def do_kf(state):
                new_trackable = jnp.where(
                    tracking_kf,
                    trackable & (sqd > cfg.kf.overlapped_th2), trackable)
                insert_ok = valid & do_insert
                if cfg.kf.insert_dedup_sqd > 0.0:
                    # bounded-memory insertion (KeyframeConfig docstring):
                    # points already covered by the map skip insertion
                    insert_ok = insert_ok & (sqd > cfg.kf.insert_dedup_sqd)
                gmap = add_gaussians(state.gmap, pts_w, colors, rots_w,
                                     source.scales, z, new_trackable,
                                     insert_ok,
                                     init_opacity=cfg.map.init_opacity)
                state = state._replace(gmap=gmap)
                return store_keyframe(state, do_insert)

            state = jax.lax.cond(do_insert, do_kf, lambda s: s, state)
            state = state._replace(last_ratio=ratio)

            # covariance sharing, map -> tracker, on tracking keyframes
            # (mp_Tracker.py:286-288); heavy, so guarded by cond
            target = jax.lax.cond(tracking_kf,
                                  lambda m: export_target(m, n_bucket),
                                  lambda m: state.target, state.gmap)

            return state._replace(
                target=target,
                poses=state.poses.at[state.frame_idx].set(T),
                frame_idx=state.frame_idx + 1,
                from_last_kf=from_last)

        # the pixel keyframe stores NEVER enter a lax.cond: branch-carried
        # stores let XLA choose branch-internal layouts and insert
        # full-store async copies every frame (~10.6 ms at Kc=256,
        # PROFILE_r03 layout_findings).  The branches run on a gutted
        # state (empty store fields) and only do slot bookkeeping; the
        # write below is one in-place DUS of the donated buffers.
        stores = (state.kf_w2c, state.kf_rgb, state.kf_depth)
        empty = jnp.zeros((0,), jnp.float32)
        core = state._replace(kf_w2c=empty, kf_rgb=empty, kf_depth=empty)
        total_before = core.kf_total
        core = jax.lax.cond(core.frame_idx == 0, first_frame, track_frame,
                            core)
        kc = cfg.engine.keyframe_capacity
        wrote = core.kf_total > total_before
        slot = jnp.where(wrote, core.new_kf, kc)
        w2c_cur = invert_se3(core.poses[core.frame_idx - 1])
        state = core._replace(
            kf_w2c=stores[0].at[slot].set(w2c_cur, mode="drop"),
            kf_rgb=stores[1].at[slot].set(rgb_u8, mode="drop"),
            kf_depth=stores[2].at[slot].set(depth_raw, mode="drop"))
        state = mapping_iters(state, cfg.engine.mapping_iters_per_frame,
                              n_bucket)
        return pin_stores(state)

    def step_chunk(state, depth_c, rgb_c, is_last_c, n_bucket=None,
                   t_bucket=None):
        def body(s, inp):
            d, r, il = inp
            return step(s, d, r, il, n_bucket, t_bucket), None
        state, _ = jax.lax.scan(body, state, (depth_c, rgb_c, is_last_c))
        return state

    if do_pin:
        # The in/out layouts of the donated state must ALSO be pinned:
        # the internal with_layout_constraint alone left the boundary
        # layout slot-minor and XLA bracketed the program with full-store
        # entry/exit copies (2.6 ms each, r5 trace).  Everything else
        # stays AUTO — XLA picks e.g. transposed layouts for the (N, 3)
        # map arrays to dodge 128-lane padding, and that freedom is worth
        # keeping.  jit in_shardings accept pytree prefixes, so one
        # Format leaf covers each nested tree.
        from jax.experimental.layout import Format as _Format
        from jax.experimental.layout import Layout as _L
        from jax.sharding import SingleDeviceSharding as _SDS

        from .state import SLAMState
        _sds = _SDS(_pin_dev)
        _fmt_rgb = _Format(_L((0, 1, 2, 3)), _sds)
        _fmt_dep = _Format(_L((0, 1, 2)), _sds)
        _fmt_state = SLAMState(**{f: None for f in SLAMState._fields})
        _fmt_state = _fmt_state._replace(kf_rgb=_fmt_rgb,
                                         kf_depth=_fmt_dep)

        from jax.experimental.layout import \
            with_layout_constraint as _wlc

        # the relayout rides a jitted with_layout_constraint — IN the
        # HLO — rather than jax.device_put: the target layout of a plain
        # transfer lives only in compile OPTIONS, and the persistent
        # compile cache intermittently served a colliding plain-copy
        # executable whose output kept the source layout (stress_record
        # scenario 3 failed the jit layout check depending on which
        # program was cached first, r5); an in-program constraint makes
        # the cache key unambiguous and the output layout load-bearing
        _pin_rgb = jax.jit(lambda x: _wlc(x, _L((0, 1, 2, 3))),
                           out_shardings=_fmt_rgb)
        _pin_dep = jax.jit(lambda x: _wlc(x, _L((0, 1, 2))),
                           out_shardings=_fmt_dep)

        def pin_state(state):
            out = state._replace(kf_rgb=_pin_rgb(state.kf_rgb),
                                 kf_depth=_pin_dep(state.kf_depth))
            got = out.kf_rgb.format.layout.major_to_minor
            assert got == (0, 1, 2, 3), (
                f"keyframe-store relayout produced {got}; the compile "
                f"cache likely served a stale executable — clear "
                f"~/.cache/jax_comp_cache")
            return out
        step_chunk = jax.jit(step_chunk, donate_argnums=(0,),
                             static_argnums=(4, 5),
                             in_shardings=(_fmt_state, None, None, None),
                             out_shardings=_fmt_state)
        step = jax.jit(step, donate_argnums=(0,), static_argnums=(4, 5),
                       in_shardings=(_fmt_state, None, None, None),
                       out_shardings=_fmt_state)
        refine = jax.jit(
            lambda state, n_bucket=None: pin_stores(mapping_iters(
                state, REFINE_CHUNK, n_bucket)),
            donate_argnums=(0,), static_argnums=(1,),
            in_shardings=(_fmt_state,), out_shardings=_fmt_state)
    elif mesh is None:
        def pin_state(state):
            return state  # CPU layouts are row-major already; no pin

        step_chunk = jax.jit(step_chunk, donate_argnums=(0,),
                             static_argnums=(4, 5))
        step = jax.jit(step, donate_argnums=(0,), static_argnums=(4, 5))
        refine = jax.jit(
            lambda state, n_bucket=None: mapping_iters(
                state, REFINE_CHUNK, n_bucket),
            donate_argnums=(0,), static_argnums=(1,))
    else:
        def pin_state(state):
            return state  # place_state handles device placement on a mesh

        from jax.sharding import NamedSharding as _NS, PartitionSpec as _PS
        from ..parallel.sharded import choose_mode, state_shardings
        st_sh = state_shardings(mesh, mode=choose_mode(
            cfg.map.capacity, cfg.map.sh_degree,
            getattr(cfg.engine, "parallel_mode", "auto")))
        repl = _NS(mesh, _PS())
        step_chunk = jax.jit(step_chunk, donate_argnums=(0,),
                             static_argnums=(4, 5),
                             in_shardings=(st_sh, repl, repl, repl),
                             out_shardings=st_sh)
        step = jax.jit(step, donate_argnums=(0,), static_argnums=(4, 5),
                       in_shardings=(st_sh, repl, repl, repl),
                       out_shardings=st_sh)
        refine = jax.jit(
            lambda state, n_bucket=None: mapping_iters(state, REFINE_CHUNK),
            donate_argnums=(0,), static_argnums=(1,),
            in_shardings=(st_sh,), out_shardings=st_sh)

    # post-run map refinement (the reference mapper free-runs after the
    # tracker ends, mp_Mapper.py:154); chunked so the host can size the
    # total budget without recompiling — see `refine` above

    if mesh is not None:
        # replicate the (sharded) map before the eval render so the raster
        # runs whole on every device instead of through GSPMD partitioning
        from jax.sharding import NamedSharding, PartitionSpec as _P
        _repl = NamedSharding(mesh, _P())

        def _replicate(tree):
            return jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(x, _repl), tree)
    else:
        def _replicate(tree):
            return tree

    def render_eval(params, live, w2c, rgb_u8, depth_raw):
        params, live = _replicate(params), _replicate(live)
        gt_img = rgb_u8.astype(jnp.float32) / 255.0  # (3, H, W) input
        gt_depth = depth_raw / intr.depth_scale
        out = raster(params["xyz"], params["rotation"],
                     jnp.exp(params["log_scaling"]),
                     jax.nn.sigmoid(params["opacity_logit"][:, 0]),
                     _sh(params), w2c, live, bg, fx, fy, rcx, rcy)
        mask = (gt_depth > 0.0)[None]
        mse = jnp.sum(((out.color - gt_img) * mask) ** 2) / jnp.maximum(
            jnp.sum(mask) * 3.0, 1.0)
        return out.color, -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))

    render_eval = jax.jit(render_eval)

    return FusedStep(step=step, step_chunk=step_chunk,
                     render_eval=render_eval, refine=refine,
                     pin_state=pin_state)


class FusedEngine:
    """Drop-in alternative to SLAMEngine that runs the whole frame as ONE
    jitted dispatch (see module docstring): the host loop only feeds frames
    and rebinds the donated state, so successive frames pipeline on device
    and per-dispatch host latency amortizes away."""

    def __init__(self, dataset: "RGBDSequence", cfg: SLAMConfig,
                 seed: int = 0, mesh=None):
        """With `mesh` (a 1-axis jax.sharding.Mesh), the map is FSDP-sharded
        over the mesh and each mapping iteration optimizes mesh.size
        keyframes in data parallel — see parallel/sharded.py.  Requires
        cfg.map.capacity divisible by the mesh size."""
        from ..utils.pointcloud import make_downsample_filter

        if mesh is not None:
            n_dev = int(mesh.devices.size)
            assert cfg.map.capacity % n_dev == 0, (
                f"map capacity {cfg.map.capacity} not divisible by "
                f"mesh size {n_dev}")
        self.dataset = dataset
        self.cfg = cfg
        self.mesh = mesh
        intr = cfg.intr
        self.filt = make_downsample_filter(
            intr.width, intr.height, intr.fx, intr.fy, intr.cx, intr.cy,
            cfg.downsample_rate)
        self.seed = seed
        self.fused = make_fused_step(cfg, self.filt, mesh=mesh)
        self.state = None

    # how often the host syncs the device-side high-water mark to choose
    # capacity buckets.  Outgrowing a bucket between syncs is SOFT:
    # inserts always land in the full-capacity state; splats beyond the
    # bucket just wait <= BUCKET_SYNC frames before mapping sees them, and
    # the tracker's target is truncated to its bucket (export compacts
    # valid slots first).  So the margin only needs to cover the typical
    # keyframe burst, not the worst case.
    BUCKET_SYNC = 8
    MIN_BUCKET = 1 << 14

    @staticmethod
    def _pow2(x: int) -> int:
        return 1 << max(int(x) - 1, 1).bit_length()

    def _pick_buckets(self, n_now: int):
        """Static (n_bucket, t_bucket) covering n_now plus a two-keyframe
        insert margin; None = full capacity (no slicing)."""
        if self.mesh is not None:
            return None, None  # sharded mode keeps even full-size shards
        margin = 2 * self.filt.num_points
        cap = self.cfg.map.capacity
        nb = max(self._pow2(n_now + margin), self.MIN_BUCKET)
        n_bucket = None if nb >= cap else nb
        # the target only holds TRACKABLE gaussians (a subset of n) and
        # refreshes in full on every tracking keyframe — one keyframe of
        # margin suffices and halves the 1-NN cost more often
        tc = self.cfg.engine.target_capacity
        tb = max(self._pow2(n_now + self.filt.num_points), 4096)
        t_bucket = None if tb >= tc else tb
        return n_bucket, t_bucket

    def _finalize(self, iters: int, n_bucket=None):
        for _ in range(-(-iters // REFINE_CHUNK) if iters > 0 else 0):
            self.state = self.fused.refine(self.state, n_bucket)

    def run(self, eval_render: bool = True, eval_stride: int = 1,
            progress: bool = False, viewer=None, net_gui=None,
            checkpoint_every: int = 0, checkpoint_path: str = "",
            resume_from: str = ""):
        """checkpoint_every/checkpoint_path: periodic full-state
        autosave every N frames (crash = lose at most N frames, not the
        run; the reference loses everything, SURVEY §5).  resume_from:
        continue a run from such a checkpoint — frames before its
        frame_idx are skipped."""
        import numpy as np
        import time

        from ..eval.ate import ate_rmse
        from .engine import SLAMResult
        from .state import init_state

        dataset, cfg = self.dataset, self.cfg
        n = len(dataset)
        f0 = dataset[0]
        pose0 = np.asarray(
            f0.gt_c2w if f0.gt_c2w is not None else np.eye(4), np.float32)
        if resume_from:
            from ..io.checkpoint import load_fused_state
            state = load_fused_state(resume_from)
            assert state.poses.shape[0] == n, (
                "checkpoint was written for a different sequence length")
        else:
            state = init_state(cfg, n, pose0, self.seed)
        if self.mesh is not None:
            from ..parallel.sharded import choose_mode, place_state
            state = place_state(state, self.mesh, mode=choose_mode(
                cfg.map.capacity, cfg.map.sh_degree,
                getattr(cfg.engine, "parallel_mode", "auto")))
        else:
            state = self.fused.pin_state(state)

        fps_cap = cfg.engine.fps_cap
        n_bucket, t_bucket = self._pick_buckets(
            int(jax.device_get(state.gmap.n)) if resume_from else 0)
        chunk = cfg.engine.frames_per_dispatch
        if viewer is not None or net_gui is not None or fps_cap:
            chunk = 1  # live modes need per-frame results
        if checkpoint_every:
            assert checkpoint_path, "checkpoint_every needs a path"
        t0 = time.time()
        i = int(jax.device_get(state.frame_idx)) if resume_from else 0
        while i < n:
            if (checkpoint_every and i > 0
                    and i % checkpoint_every < chunk):
                # periodic autosave (host sync + device->host copy of the
                # full state: opt-in because it costs ~the state size in
                # transfer per save)
                from ..io.checkpoint import save_fused_state
                save_fused_state(jax.device_get(state), checkpoint_path)
            if i % self.BUCKET_SYNC < chunk and i > 0:
                # one host sync per BUCKET_SYNC frames keeps the capacity
                # buckets tracking the map's high-water mark
                n_now = int(jax.device_get(state.gmap.n))
                n_bucket, t_bucket = self._pick_buckets(n_now)
            if chunk > 1 and i + chunk <= n:
                frs = [dataset[j] for j in range(i, i + chunk)]
                state = self.fused.step_chunk(
                    state,
                    jnp.stack([jnp.asarray(f.depth) for f in frs]),
                    jnp.stack([to_chw(f.rgb) for f in frs]),
                    jnp.asarray([j == n - 1
                                 for j in range(i, i + chunk)]),
                    n_bucket, t_bucket)
                i += chunk
                continue
            fr = dataset[i]
            state = self.fused.step(state, jnp.asarray(fr.depth),
                                    to_chw(fr.rgb),
                                    jnp.bool_(i == n - 1),
                                    n_bucket, t_bucket)
            if net_gui is not None:
                # serve a pending SIBR remote-viewer request against the
                # current map (reference run_viewer, mp_Mapper.py:272-294)
                from ..viz.network_gui import make_map_render_fn
                net_gui.poll(make_map_render_fn(
                    map_params(state.gmap), state.gmap.live,
                    cfg.map.sh_degree, cfg.render.bg_color))
            if viewer is not None:
                # pose of frame i: syncs the device (viewer mode trades FPS
                # for live output, like the reference's rerun streaming)
                pose_i = np.asarray(jax.device_get(state.poses[i]))
                viewer.log_frame(i, pose_i, fr.rgb, fr.depth)
                kf_tot = int(jax.device_get(state.kf_total))
                if kf_tot != getattr(self, "_viewer_kf_tot", -1):
                    # keyframe happened: log the trackable map points
                    # (mp_Tracker.py:186-189) and the mapper's current
                    # render of this view (mp_Mapper.py:250-257)
                    self._viewer_kf_tot = kf_tot
                    pts = np.asarray(jax.device_get(state.target.points)).T
                    ok = np.asarray(jax.device_get(state.target.valid))
                    viewer.log_points(i, pts[ok])
                    img, _ = self.fused.render_eval(
                        map_params(state.gmap), state.gmap.live,
                        invert_se3(jnp.asarray(pose_i, jnp.float32)),
                        to_chw(fr.rgb), jnp.asarray(fr.depth))
                    viewer.log_render(i, np.asarray(jax.device_get(img)))
            if fps_cap:
                # throttle to fps_cap average (mp_Tracker.py:323-324);
                # requires a host sync, so only bounds — not measures — FPS
                target = t0 + (i + 1) / fps_cap
                now = time.time()
                if now < target:
                    time.sleep(target - now)
            if progress and i % 50 == 0:
                print(f"frame {i}/{n}")
            i += 1
        # force a real host sync (block_until_ready alone can return early
        # through the remote-dispatch relay)
        int(jax.device_get(state.frame_idx))
        elapsed = time.time() - t0
        fps = n / elapsed

        self.state = state
        self._finalize(cfg.engine.mapping_iters_final, n_bucket)
        state = self.state

        poses = np.asarray(jax.device_get(state.poses), np.float64)
        gt = None
        ate = None
        try:
            gt = dataset.gt_poses
            ate = ate_rmse(gt, poses)
        except Exception:
            pass

        psnr_mean = None
        per_frame = None
        if eval_render:
            params = map_params(state.gmap)
            vals = []
            for i in range(0, n, eval_stride):
                fr = dataset[i]
                w2c = invert_se3(jnp.asarray(poses[i], jnp.float32))
                _, p = self.fused.render_eval(params, state.gmap.live, w2c,
                                              to_chw(fr.rgb),
                                              jnp.asarray(fr.depth))
                vals.append(float(p))
            per_frame = np.asarray(vals)
            psnr_mean = float(per_frame.mean())

        return SLAMResult(
            poses=poses, gt_poses=gt, ate_rmse=ate, fps=fps,
            num_gaussians=int(jax.device_get(state.gmap.num_live)),
            psnr=psnr_mean, per_frame_psnr=per_frame,
            kf_total=int(jax.device_get(state.kf_total)),
            kf_stored=int(jax.device_get(state.kf_count)),
            vis_cap_dropped=int(jax.device_get(state.stat_vis_dropped)),
            tile_cap_dropped=int(jax.device_get(state.stat_pair_dropped)))

    # -------------------------------------------------------------- extras
    def evaluate(self, eval_stride: int = 1, poses=None,
                 dump_dir=None):
        """Full-sequence PSNR/SSIM/LPIPS at the final map and poses
        (reference calc_2d_metric, mp_Mapper.py:335-420)."""
        import numpy as np

        from ..eval.image_metrics import evaluate_sequence
        from ..utils.se3 import invert_se3

        assert self.state is not None, "run() first"
        state = self.state
        params = map_params(state.gmap)
        if poses is None:
            poses = np.asarray(jax.device_get(state.poses), np.float64)

        def render_frame(i):
            fr = self.dataset[i]
            w2c = invert_se3(jnp.asarray(poses[i], jnp.float32))
            img, _ = self.fused.render_eval(params, state.gmap.live, w2c,
                                            to_chw(fr.rgb),
                                            jnp.asarray(fr.depth))
            return img

        return evaluate_sequence(render_frame, self.dataset,
                                 len(self.dataset), stride=eval_stride,
                                 depth_scale=self.cfg.intr.depth_scale,
                                 dump_dir=dump_dir)

    def save_ply(self, path: str) -> int:
        """Export the live map in the 3DGS-ecosystem PLY layout
        (gaussian_model.py:619-636)."""
        import numpy as np

        from ..io.ply import save_ply as _save

        assert self.state is not None, "run() first"
        m = self.state.gmap
        live = np.asarray(jax.device_get(m.live))
        return _save(path, jax.device_get(m.xyz), jax.device_get(m.f_dc),
                     jax.device_get(m.f_rest),
                     jax.device_get(m.opacity_logit),
                     jax.device_get(m.log_scaling),
                     jax.device_get(m.rotation), mask=live)

    def save_checkpoint(self, path: str) -> None:
        """Write the full fused SLAMState as a resumable npz."""
        from ..io.checkpoint import save_fused_state

        assert self.state is not None, "run() first"
        save_fused_state(self.state, path)

    def load_checkpoint(self, path: str) -> None:
        from ..io.checkpoint import load_fused_state

        self.state = self.fused.pin_state(load_fused_state(path))
