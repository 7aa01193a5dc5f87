"""Pallas TPU kernel for the per-tile alpha-compositing stage.

This is the hot inner loop of the rasterizer (SURVEY §2.10: the CUDA
kernel's per-tile front-to-back blend).  The pure-XLA version in
rasterize.py materializes (P, K) intermediates through lax.map and pays
HBM bandwidth for every cumprod pass; here the whole tile lives in VMEM:

  * orientation (K, P): splats on sublanes, pixels on lanes — per-pixel
    outputs fall out of sublane reductions as (1, P) rows, and per-splat
    gradients fall out of lane reductions as (K, 1) columns, so the only
    transposes are two tiny MXU identity-contractions of the (16, K)
    attribute block.
  * transmittance cumprod = exp(Hillis-Steele cumsum of log1p(-alpha))
    via pltpu.roll — log2(K) VPU passes, no HBM traffic.
  * custom VJP: the dense variant recomputes the forward in-kernel
    (residual = packed attrs only); the dynamic variant checkpoints each
    block's entry transmittance in the forward and runs ONE reverse sweep
    (the CUDA kernel's back-to-front gradient walk) — no second forward
    recompute.  dL/dalpha uses a suffix-sum, no atomics — per-splat sums
    are lane reductions, and the scatter back to the compacted splat
    array is JAX autodiff of the gather outside.

Packed layouts (P = tile*tile pixels, K = per-tile splat capacity):
  attrs (T, 16, K) f32, rows: 0 mx, 1 my, 2 conic_a, 3 conic_b,
        4 conic_c, 5 r, 6 g, 7 b, 8 opacity, 9 depth (rest zero pad)
  out   (T, 8, P) f32, rows: 0..2 rgb (no background), 3 depth,
        4 final transmittance (rest zero)
"""
from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import ALPHA_MAX, ALPHA_MIN, T_EPS

_CONTRACT_00 = (((0,), (0,)), ((), ()))
_CONTRACT_11 = (((1,), (1,)), ((), ()))
_CONTRACT_STD = (((1,), (0,)), ((), ()))


def _cumsum_sublanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative sum along axis 0 (sublanes), log2(n) passes."""
    n = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < n:
        x = x + jnp.where(row >= s, pltpu.roll(x, s, axis=0), 0.0)
        s *= 2
    return x


def _identity(k: int) -> jnp.ndarray:
    i = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return (i == j).astype(jnp.float32)


def _tile_geometry(attrs_ref, ntx: int, tile_px: int, P: int):
    """Shared forward math: recomputed verbatim in the backward kernel."""
    a = attrs_ref[0]                       # (16, K)
    K = a.shape[1]
    ident = _identity(K)
    aT = jax.lax.dot_general(ident, a, _CONTRACT_11,
                             preferred_element_type=jnp.float32)  # (K, 16)

    t = pl.program_id(0)
    tx = t % ntx
    ty = t // ntx
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (tx * tile_px + pid % tile_px).astype(jnp.float32)   # (1, P)
    py = (ty * tile_px + pid // tile_px).astype(jnp.float32)

    mx, my = aT[:, 0:1], aT[:, 1:2]
    ca, cb, cc = aT[:, 2:3], aT[:, 3:4], aT[:, 4:5]
    opa = aT[:, 8:9]

    dx = px - mx                                              # (K, P)
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    araw = opa * jnp.exp(power)
    gate = (power <= 0.0) & (araw >= ALPHA_MIN)
    alpha = jnp.where(gate, jnp.minimum(araw, ALPHA_MAX), 0.0)

    logo = jnp.log1p(-alpha)
    csum = _cumsum_sublanes(logo)
    t_next = jnp.exp(csum)                                    # prod_{j<=k} o_j
    t_before = jnp.exp(csum - logo)                           # prod_{j<k} o_j
    inc = (t_next >= T_EPS).astype(jnp.float32)
    w = alpha * t_before * inc
    tf = jnp.min(jnp.where(t_next >= T_EPS, t_next, 1.0), axis=0,
                 keepdims=True)                               # (1, P)
    return (a, aT, ident, dx, dy, power, araw, gate, alpha, t_before, inc,
            w, tf)


def _fwd_kernel(attrs_ref, out_ref, *, ntx: int, tile_px: int, P: int):
    (_, aT, _, _, _, _, _, _, _, _, _, w, tf) = _tile_geometry(
        attrs_ref, ntx, tile_px, P)
    r, g, b = aT[:, 5:6], aT[:, 6:7], aT[:, 7:8]
    dep = aT[:, 9:10]
    cr = jnp.sum(w * r, axis=0, keepdims=True)                # (1, P)
    cg = jnp.sum(w * g, axis=0, keepdims=True)
    cb_ = jnp.sum(w * b, axis=0, keepdims=True)
    cd = jnp.sum(w * dep, axis=0, keepdims=True)
    pad = jnp.zeros((3, P), jnp.float32)
    out_ref[0] = jnp.concatenate([cr, cg, cb_, cd, tf, pad], axis=0)


def _bwd_kernel(attrs_ref, g_ref, dattrs_ref, *, ntx: int, tile_px: int,
                P: int):
    (_, aT, ident, dx, dy, power, araw, gate, alpha, t_before, inc, w,
     tf) = _tile_geometry(attrs_ref, ntx, tile_px, P)
    K = alpha.shape[0]
    gmat = g_ref[0]                                           # (8, P)
    g4 = gmat[0:4, :]                                         # rgb + depth
    gtf = gmat[4:5, :]                                        # (1, P)

    # dL/dw_k(p) = g_rgb . rgb_k + g_depth depth_k  — one MXU contraction
    a4 = jnp.concatenate([aT[:, 5:8], aT[:, 9:10]], axis=1)   # (K, 4)
    dLdw = jax.lax.dot_general(a4, g4, _CONTRACT_STD,
                               preferred_element_type=jnp.float32)  # (K, P)

    # d t_before_j / d alpha_k = -t_before_j / o_k for k < j: suffix sum
    c = w * dLdw
    S = jnp.sum(c, axis=0, keepdims=True) - _cumsum_sublanes(c)
    o = 1.0 - alpha
    dalpha = inc * t_before * dLdw - (S + inc * (gtf * tf)) / o

    m = (gate & (araw < ALPHA_MAX)).astype(jnp.float32)
    dpow = dalpha * m * araw
    ca, cb, cc = aT[:, 2:3], aT[:, 3:4], aT[:, 4:5]

    def lsum(x):
        return jnp.sum(x, axis=1, keepdims=True)              # (K, 1)

    dmx = lsum(dpow * (ca * dx + cb * dy))
    dmy = lsum(dpow * (cc * dy + cb * dx))
    dca = lsum(dpow * (-0.5 * dx * dx))
    dcb = lsum(dpow * (-dx * dy))
    dcc = lsum(dpow * (-0.5 * dy * dy))
    dr = lsum(w * gmat[0:1, :])
    dg = lsum(w * gmat[1:2, :])
    db = lsum(w * gmat[2:3, :])
    dop = lsum(dalpha * m * jnp.exp(power))
    ddep = lsum(w * gmat[3:4, :])

    daT = jnp.concatenate(
        [dmx, dmy, dca, dcb, dcc, dr, dg, db, dop, ddep,
         jnp.zeros((K, 6), jnp.float32)], axis=1)             # (K, 16)
    dattrs_ref[0] = jax.lax.dot_general(
        daT, ident, _CONTRACT_00, preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=None)
def make_composite(T: int, ntx: int, tile_px: int, K: int,
                   interpret: bool = False):
    """Build the custom-VJP tile compositor for a fixed geometry.

    Returns f(attrs (T,16,K)) -> (T,8,P) with P = tile_px**2.  K and P
    must be multiples of the f32 tile (sublane 8 / lane 128 friendly:
    use K, P in {128, 256, ...}).
    """
    P = tile_px * tile_px

    fwd_call = pl.pallas_call(
        partial(_fwd_kernel, ntx=ntx, tile_px=tile_px, P=P),
        grid=(T,),
        in_specs=[pl.BlockSpec((1, 16, K), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, P), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
        interpret=interpret,
    )
    bwd_call = pl.pallas_call(
        partial(_bwd_kernel, ntx=ntx, tile_px=tile_px, P=P),
        grid=(T,),
        in_specs=[pl.BlockSpec((1, 16, K), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, P), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 16, K), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 16, K), jnp.float32),
        interpret=interpret,
    )

    @jax.custom_vjp
    def composite(attrs):
        return fwd_call(attrs)

    def composite_fwd(attrs):
        return fwd_call(attrs), attrs

    def composite_bwd(attrs, g):
        return (bwd_call(attrs, g),)

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


# ---------------------------------------------------------------------------
# v2: dynamic trip count — compute scales with per-tile occupancy, not K
# ---------------------------------------------------------------------------
#
# The dense kernel above always composites all K slots of every tile; in a
# live SLAM map most tiles hold a handful of splats (the CUDA kernel's
# per-tile ranges are short).  v2 takes the per-tile splat counts as a
# scalar-prefetch operand and runs a fori_loop over ceil(count/BK) sublane
# blocks of the VMEM-resident tile, skipping all compute past the count.

_BKD = 32  # splats per dynamic block (sublane-slice granularity)


def _load_block(aT_ref, i):
    # mosaic cannot dynamic_slice a value; slice the VMEM scratch ref
    return aT_ref[pl.ds(i * _BKD, _BKD), :]


def _block_geometry(blk, px, py, tacc):
    """Alpha/transmittance math for one (BKD, 16) splat block."""
    mx, my = blk[:, 0:1], blk[:, 1:2]
    ca, cb, cc = blk[:, 2:3], blk[:, 3:4], blk[:, 4:5]
    opa = blk[:, 8:9]
    dx = px - mx                                   # (BKD, P)
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    araw = opa * jnp.exp(power)
    gate = (power <= 0.0) & (araw >= ALPHA_MIN)
    alpha = jnp.where(gate, jnp.minimum(araw, ALPHA_MAX), 0.0)
    logo = jnp.log1p(-alpha)
    csum = _cumsum_sublanes(logo)
    t_next = tacc * jnp.exp(csum)
    t_before = tacc * jnp.exp(csum - logo)
    inc = (t_next >= T_EPS).astype(jnp.float32)
    w = alpha * t_before * inc
    tacc_out = tacc * jnp.exp(csum[_BKD - 1:_BKD, :])
    return (dx, dy, power, araw, gate, alpha, t_next, t_before, inc, w,
            tacc_out)


def _fwd_kernel_dyn(counts_ref, attrs_ref, out_ref, taccs_ref, aT_ref, *,
                    ntx: int, tile_px: int, P: int, K: int):
    t = pl.program_id(0)
    count = counts_ref[t]
    nb = (count + _BKD - 1) // _BKD

    a = attrs_ref[0]                               # (16, K)
    ident = _identity(K)
    aT_ref[...] = jax.lax.dot_general(
        ident, a, _CONTRACT_11,
        preferred_element_type=jnp.float32)        # (K, 16)

    tx = t % ntx
    ty = t // ntx
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (tx * tile_px + pid % tile_px).astype(jnp.float32)
    py = (ty * tile_px + pid // tile_px).astype(jnp.float32)

    def body(i, carry):
        tacc, cr, cg, cb_, cd, tf = carry
        # checkpoint the block-entry transmittance: the backward kernel
        # reads it to run ONE reverse pass instead of two forward passes
        taccs_ref[0, pl.ds(i, 1), :] = tacc
        blk = _load_block(aT_ref, i)
        (_, _, _, _, _, _, t_next, _, inc, w, tacc_out) = _block_geometry(
            blk, px, py, tacc)
        cr = cr + jnp.sum(w * blk[:, 5:6], axis=0, keepdims=True)
        cg = cg + jnp.sum(w * blk[:, 6:7], axis=0, keepdims=True)
        cb_ = cb_ + jnp.sum(w * blk[:, 7:8], axis=0, keepdims=True)
        cd = cd + jnp.sum(w * blk[:, 9:10], axis=0, keepdims=True)
        tf = jnp.minimum(tf, jnp.min(jnp.where(inc > 0.0, t_next, 3.4e38),
                                     axis=0, keepdims=True))
        return tacc_out, cr, cg, cb_, cd, tf

    zero = jnp.zeros((1, P), jnp.float32)
    one = jnp.ones((1, P), jnp.float32)
    tacc, cr, cg, cb_, cd, tf = jax.lax.fori_loop(
        0, nb, body, (one, zero, zero, zero, zero, one))
    pad = jnp.zeros((3, P), jnp.float32)
    out_ref[0] = jnp.concatenate([cr, cg, cb_, cd, tf, pad], axis=0)


def _bwd_kernel_dyn(counts_ref, attrs_ref, taccs_ref, out_ref, g_ref,
                    dattrs_ref, aT_ref, daT_ref, *, ntx: int, tile_px: int,
                    P: int, K: int):
    """ONE reverse pass over the splat blocks (the CUDA kernel's
    back-to-front gradient walk): block-entry transmittances come from the
    forward's checkpoints, the final transmittance from the forward output,
    and the suffix sum S_k accumulates naturally in reverse order."""
    t = pl.program_id(0)
    count = counts_ref[t]
    nb = (count + _BKD - 1) // _BKD

    a = attrs_ref[0]
    ident = _identity(K)
    aT_ref[...] = jax.lax.dot_general(
        ident, a, _CONTRACT_11,
        preferred_element_type=jnp.float32)        # (K, 16)

    tx = t % ntx
    ty = t // ntx
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (tx * tile_px + pid % tile_px).astype(jnp.float32)
    py = (ty * tile_px + pid // tile_px).astype(jnp.float32)

    gmat = g_ref[0]                                # (8, P)
    g4 = gmat[0:4, :]
    gtf = gmat[4:5, :]
    tf = out_ref[0][4:5, :]                        # (1, P) from forward

    daT_ref[...] = jnp.zeros((K, 16), jnp.float32)

    def body(ir, suffix):
        i = nb - 1 - ir
        tacc = taccs_ref[0, pl.ds(i, 1), :]        # block-entry T
        blk = _load_block(aT_ref, i)
        (dx, dy, power, araw, gate, alpha, t_next, t_before, inc, w,
         _) = _block_geometry(blk, px, py, tacc)
        a4 = jnp.concatenate([blk[:, 5:8], blk[:, 9:10]], axis=1)
        dLdw = jax.lax.dot_general(a4, g4, _CONTRACT_STD,
                                   preferred_element_type=jnp.float32)
        c = w * dLdw
        block_total = jnp.sum(c, axis=0, keepdims=True)
        # S_k = sum_{j>k} c_j = (within-block suffix) + (later blocks)
        S = (block_total - _cumsum_sublanes(c)) + suffix
        o = 1.0 - alpha
        dalpha = inc * t_before * dLdw - (S + inc * (gtf * tf)) / o

        m = (gate & (araw < ALPHA_MAX)).astype(jnp.float32)
        dpow = dalpha * m * araw
        ca, cb, cc = blk[:, 2:3], blk[:, 3:4], blk[:, 4:5]

        def lsum(x):
            return jnp.sum(x, axis=1, keepdims=True)

        dmx = lsum(dpow * (ca * dx + cb * dy))
        dmy = lsum(dpow * (cc * dy + cb * dx))
        dca = lsum(dpow * (-0.5 * dx * dx))
        dcb = lsum(dpow * (-dx * dy))
        dcc = lsum(dpow * (-0.5 * dy * dy))
        dr = lsum(w * gmat[0:1, :])
        dg = lsum(w * gmat[1:2, :])
        db = lsum(w * gmat[2:3, :])
        dop = lsum(dalpha * m * jnp.exp(power))
        ddep = lsum(w * gmat[3:4, :])
        dblk = jnp.concatenate(
            [dmx, dmy, dca, dcb, dcc, dr, dg, db, dop, ddep,
             jnp.zeros((_BKD, 6), jnp.float32)], axis=1)     # (BKD, 16)
        daT_ref[pl.ds(i * _BKD, _BKD), :] = dblk
        return suffix + block_total

    jax.lax.fori_loop(0, nb, body, jnp.zeros((1, P), jnp.float32))

    daT = daT_ref[...]
    dattrs_ref[0] = jax.lax.dot_general(
        daT, ident, _CONTRACT_00, preferred_element_type=jnp.float32)


def win_span(K: int) -> int:
    """Payload window span for tile capacity K: K + 128 (the 128-floor
    of the run start plus the full run) rounded UP to a power of two —
    pltpu.roll with a DYNAMIC shift miscompiles on non-power-of-two
    sublane dims (W=384 produced wrong colors at full bench geometry,
    r5; 256/512 are exact).  rasterize_tiled pads the payload tail by
    this amount so every aligned window stays in range."""
    return 1 << (K + 128 - 1).bit_length()


def build_cell_idx_np(counts, starts, pair_slot, T: int, K: int, V: int):
    """Host-side inverse pair map for tests/benches of make_composite_win.

    The production path derives cell_idx arithmetically from the tile
    sort (rasterize_tiled); synthetic harnesses that fabricate
    counts/starts/pair_slot directly use this reference builder.
    Returns (M, V) int32, M = max per-splat multiplicity, padded with the
    zero-cell index T*K."""
    import numpy as _np
    counts = _np.asarray(counts)
    starts = _np.asarray(starts)
    pair_slot = _np.asarray(pair_slot)
    cells = [[] for _ in range(V)]
    for t in range(T):
        for k in range(int(counts[t])):
            v = int(pair_slot[starts[t] + k])
            if v < V:
                cells[v].append(t * K + k)
    M = max(1, max((len(c) for c in cells), default=1))
    out = _np.full((M, V), T * K, _np.int32)
    for v, c in enumerate(cells):
        out[:len(c), v] = c
    return out


# ---------------------------------------------------------------------------
# v3: pair-window compositor — no dense (T, 16, K) gather at all
# ---------------------------------------------------------------------------
#
# The tile-sorted pair array IS contiguous per tile: tile t's splats are
# payload rows [starts[t], starts[t] + counts[t]).  v2 materialized a
# dense (T, 16, K) attrs tensor from it with an XLA gather chain measured
# at ~23 ms/frame (scripts/profile_gather.py: composed 2-level gathers and
# 1D-table gathers are the slow paths); v3 instead gathers the payload
# ONCE in pair order — a plain lane gather, the fast path — and hands each
# tile its window via a scalar-prefetch-driven pl.Element BlockSpec, which
# Pallas double-buffers like any other block.  The window tail (rows past
# counts[t]) belongs to the NEXT tile and is masked in-kernel.

def _cumprod_sublanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative product along axis 0, log2(n) roll passes."""
    n = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    s = 1
    while s < n:
        x = x * jnp.where(row >= s, pltpu.roll(x, s, axis=0), 1.0)
        s *= 2
    return x


def _win_geometry(blk, px, py, tacc, nvalid):
    """_block_geometry + row-validity mask for the window tail.

    Transmittance is a DIRECT multiplicative cumprod (5 roll-mul passes)
    rather than exp(cumsum(log1p(-alpha))): the log1p + two exps cost 3
    transcendental VPU passes per (BKD, P) block and were ~25% of the
    kernel's runtime (r5 A/B below); t_before = t_next / (1 - alpha) is
    exact since alpha <= ALPHA_MAX < 1."""
    row = jax.lax.broadcasted_iota(jnp.int32, (blk.shape[0], 1), 0)
    ok = (row < nvalid).astype(jnp.float32)
    mx, my = blk[:, 0:1], blk[:, 1:2]
    ca, cb, cc = blk[:, 2:3], blk[:, 3:4], blk[:, 4:5]
    opa = blk[:, 8:9] * ok
    dx = px - mx
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    araw = opa * jnp.exp(power)
    gate = (power <= 0.0) & (araw >= ALPHA_MIN)
    alpha = jnp.where(gate, jnp.minimum(araw, ALPHA_MAX), 0.0)
    o = 1.0 - alpha
    cprod = _cumprod_sublanes(o)
    t_next = tacc * cprod
    t_before = t_next / o
    inc = (t_next >= T_EPS).astype(jnp.float32)
    w = alpha * t_before * inc
    tacc_out = tacc * cprod[_BKD - 1:_BKD, :]
    return (dx, dy, power, araw, gate, alpha, t_next, t_before, inc, w,
            tacc_out)


def _win_dma(pay_hbm, astarts_ref, buf, sems, slot, t):
    """HBM->VMEM copy of tile t's (16, W) CHANNEL-FIRST payload window.

    The window starts at the 128-aligned floor of the tile's pair run
    (astarts, carried as a BLOCK index scaled by 128 in-kernel so
    Mosaic can PROVE the dynamic lane offset is aligned) and spans
    W = K + 128 lanes so the run fits at any intra-window offset.  The
    channel-first payload is both the fast XLA gather form (ONE lane
    gather, no 128-lane row padding: the r4 row payload cost a 3.2 ms
    (Np, 10) row gather + a 134 MB pad write per iteration) and 6x less
    window DMA traffic ((16, 512) = 32 KB vs (384, 128) = 196 KB)."""
    W = buf.shape[2]
    return pltpu.make_async_copy(
        pay_hbm.at[:, pl.ds(astarts_ref[t] * 128, W)], buf.at[slot],
        sems.at[slot])


def _win_transpose(win, off, K: int):
    """(16, W) channel-first window -> (K, 16) pair rows STARTING AT
    intra-window offset `off`: one native Mosaic transpose + ONE dynamic
    sublane roll per tile.  Folding the shift in here keeps every
    downstream block read at a provably 32-aligned sublane offset — a
    raw `off + i*32` dynamic slice made Mosaic emit per-block sublane
    rotations (~2 ms/call, r5), and the shifted-identity MXU variant
    measured 1.1 ms/call slower than this (the (K, W) x (W, 16) dot
    pads its 16-lane output to 128 on the MXU); r4's per-32-row-block
    transposes lost to per-issue overhead."""
    return pltpu.roll(win.T, -off, axis=0)[:K, :]


def _fwd_kernel_win(counts_ref, starts_ref, astarts_ref, pay_hbm, out_ref,
                    taccs_ref, nact_ref, buf, sems, aT_ref, *, ntx: int,
                    tile_px: int, P: int, K: int, W: int):
    t = pl.program_id(0)
    nT = pl.num_programs(0)
    slot = jax.lax.rem(t, 2)
    count = counts_ref[t]
    nb = (count + _BKD - 1) // _BKD

    @pl.when(t == 0)
    def _():
        _win_dma(pay_hbm, astarts_ref, buf, sems, 0, 0).start()

    @pl.when(t + 1 < nT)
    def _():
        _win_dma(pay_hbm, astarts_ref, buf, sems, 1 - slot, t + 1).start()

    _win_dma(pay_hbm, astarts_ref, buf, sems, slot, t).wait()
    off = starts_ref[t] - astarts_ref[t] * 128
    aT_ref[...] = _win_transpose(buf[slot], off, K)

    tx = t % ntx
    ty = t // ntx
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (tx * tile_px + pid % tile_px).astype(jnp.float32)
    py = (ty * tile_px + pid // tile_px).astype(jnp.float32)

    # EARLY TERMINATION (exact): once every pixel's transmittance fell
    # below T_EPS, later blocks have inc = 0 -> w = 0 and contribute
    # exactly nothing (and zero gradient) — stop, and record how many
    # blocks were processed so the backward starts its reverse walk there
    # (the CUDA kernel's per-thread early break, done per-tile).
    def cond(carry):
        i, tacc, *_ = carry
        return (i < nb) & (jnp.max(tacc) >= T_EPS)

    def body(carry):
        i, tacc, cr, cg, cb_, cd, tf = carry
        taccs_ref[0, pl.ds(i, 1), :] = tacc
        blk = aT_ref[pl.ds(i * _BKD, _BKD), :]     # (BKD, 16) rows
        (_, _, _, _, _, _, t_next, _, inc, w, tacc_out) = _win_geometry(
            blk, px, py, tacc, count - i * _BKD)
        cr = cr + jnp.sum(w * blk[:, 5:6], axis=0, keepdims=True)
        cg = cg + jnp.sum(w * blk[:, 6:7], axis=0, keepdims=True)
        cb_ = cb_ + jnp.sum(w * blk[:, 7:8], axis=0, keepdims=True)
        cd = cd + jnp.sum(w * blk[:, 9:10], axis=0, keepdims=True)
        tf = jnp.minimum(tf, jnp.min(jnp.where(inc > 0.0, t_next, 3.4e38),
                                     axis=0, keepdims=True))
        return i + 1, tacc_out, cr, cg, cb_, cd, tf

    zero = jnp.zeros((1, P), jnp.float32)
    one = jnp.ones((1, P), jnp.float32)
    n_act, _, cr, cg, cb_, cd, tf = jax.lax.while_loop(
        cond, body, (jnp.int32(0), one, zero, zero, zero, zero, one))
    pad = jnp.zeros((3, P), jnp.float32)
    out_ref[0] = jnp.concatenate([cr, cg, cb_, cd, tf, pad], axis=0)
    # nact lives in SMEM: a (T,) int32 VMEM output would need an
    # (8,128)-tilable block, which a per-tile scalar cannot satisfy
    # (round-2 Mosaic lowering failure); SMEM refs carry no tiling rule
    nact_ref[t] = n_act


def _bwd_kernel_win(counts_ref, starts_ref, astarts_ref, nact_ref, pay_hbm,
                    taccs_ref, out_ref, g_ref, dpay_ref, buf, sems, dscr,
                    aT_ref, *, ntx: int, tile_px: int, P: int, K: int,
                    W: int):
    """Reverse walk over the window blocks; gradient written CHANNEL-FIRST
    as this tile's (16, K) lane-block of the dense (16, T*K) cell grid —
    so the per-splat reduction outside is a fast LANE gather (cell_idx),
    not a row gather (8x lane padding) or a scatter-add.

    Only the forward's ACTIVE blocks (nact_ref, its early-termination
    count) are walked: beyond them w = 0 and every gradient row is
    exactly zero (dpay is pre-zeroed)."""
    t = pl.program_id(0)
    nT = pl.num_programs(0)
    slot = jax.lax.rem(t, 2)
    count = counts_ref[t]
    nb = nact_ref[t]

    @pl.when(t == 0)
    def _():
        _win_dma(pay_hbm, astarts_ref, buf, sems, 0, 0).start()

    @pl.when(t + 1 < nT)
    def _():
        _win_dma(pay_hbm, astarts_ref, buf, sems, 1 - slot, t + 1).start()

    _win_dma(pay_hbm, astarts_ref, buf, sems, slot, t).wait()
    off = starts_ref[t] - astarts_ref[t] * 128
    aT_ref[...] = _win_transpose(buf[slot], off, K)

    tx = t % ntx
    ty = t // ntx
    pid = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (tx * tile_px + pid % tile_px).astype(jnp.float32)
    py = (ty * tile_px + pid // tile_px).astype(jnp.float32)

    gmat = g_ref[0]
    g4 = gmat[0:4, :]
    gtf = gmat[4:5, :]
    tf = out_ref[0][4:5, :]

    dscr[...] = jnp.zeros((K, 16), jnp.float32)

    def body(ir, suffix):
        i = nb - 1 - ir
        tacc = taccs_ref[0, pl.ds(i, 1), :]
        blk = aT_ref[pl.ds(i * _BKD, _BKD), :]
        (dx, dy, power, araw, gate, alpha, t_next, t_before, inc, w,
         _) = _win_geometry(blk, px, py, tacc, count - i * _BKD)
        a4 = jnp.concatenate([blk[:, 5:8], blk[:, 9:10]], axis=1)
        dLdw = jax.lax.dot_general(a4, g4, _CONTRACT_STD,
                                   preferred_element_type=jnp.float32)
        c = w * dLdw
        block_total = jnp.sum(c, axis=0, keepdims=True)
        S = (block_total - _cumsum_sublanes(c)) + suffix
        o = 1.0 - alpha
        dalpha = inc * t_before * dLdw - (S + inc * (gtf * tf)) / o

        m = (gate & (araw < ALPHA_MAX)).astype(jnp.float32)
        dpow = dalpha * m * araw
        ca, cb, cc = blk[:, 2:3], blk[:, 3:4], blk[:, 4:5]

        def lsum(x):
            return jnp.sum(x, axis=1, keepdims=True)

        row = jax.lax.broadcasted_iota(jnp.int32, (_BKD, 1), 0)
        ok = (row < (count - i * _BKD)).astype(jnp.float32)
        dmx = lsum(dpow * (ca * dx + cb * dy))
        dmy = lsum(dpow * (cc * dy + cb * dx))
        dca = lsum(dpow * (-0.5 * dx * dx))
        dcb = lsum(dpow * (-dx * dy))
        dcc = lsum(dpow * (-0.5 * dy * dy))
        dr = lsum(w * gmat[0:1, :])
        dg = lsum(w * gmat[1:2, :])
        db = lsum(w * gmat[2:3, :])
        # opacity entered _win_geometry pre-masked (opa = blk[8] * ok);
        # its gradient must carry the same mask
        dop = lsum(dalpha * m * jnp.exp(power)) * ok
        ddep = lsum(w * gmat[3:4, :])
        dblk = jnp.concatenate(
            [dmx, dmy, dca, dcb, dcc, dr, dg, db, dop, ddep,
             jnp.zeros((_BKD, 6), jnp.float32)], axis=1) * ok
        # sublane-offset stores are legal (lane-offset ones are not):
        # accumulate (K, 16) in scratch, transpose ONCE after the loop
        dscr[pl.ds(i * _BKD, _BKD), :] = dblk
        return suffix + block_total

    jax.lax.fori_loop(0, nb, body, jnp.zeros((1, P), jnp.float32))
    # (K, 16) -> (16, K) via one MXU identity contraction per tile
    dpay_ref[...] = jax.lax.dot_general(
        dscr[...], _identity(K), _CONTRACT_00,
        preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=None)
def make_composite_win(T: int, ntx: int, tile_px: int, K: int,
                       interpret: bool = False):
    """Window compositor: f(counts (T,), starts (T,), pair_slot (Np,),
    cell_idx (M, V), attr_v16 (16, Vp)) -> (T, 8, P).

    pair_slot[r] is the compacted splat slot of sorted pair row r (slot Vp-1
    must be a zero splat); tile t owns rows [starts[t], starts[t]+counts[t])
    and counts are pre-clamped to [0, K].  The payload (Np, 16) is gathered
    once in XLA (the fast lane-gather path) and windowed into the kernel.

    cell_idx is the INVERSE of the pair expansion, used only by the
    backward: cell_idx[m, v] is a flat index into the dense (T*K) cell
    grid (t*K + rank-in-tile) of the m-th pair of splat v, or T*K for
    none.  It must enumerate every composited cell whose pair_slot is v
    (V = Vp - 1 real splats).  With it, the VJP's splat-gradient
    reduction is a (M, V) lane gather + sum instead of a (T*K)-row
    scatter-add — the scatter was the single most expensive op of the
    mapping backward (profile_composite_bwd: 7.1 ms at K=384 vs ~0.5 ms
    for the gather form)."""
    P = tile_px * tile_px
    NB = K // _BKD
    W = win_span(K)

    # CHANNEL-FIRST (16, Np) payload: one XLA lane gather builds it (the
    # r4 row payload paid a 3.2 ms (Np, 10) row gather + 134 MB 128-lane
    # pad write per iteration), and each tile DMAs a (16, W) window at
    # the 128-aligned floor of its run start (lane slices must be
    # aligned), then un-transposes ONCE per tile on the MXU.
    win_scratch = [pltpu.VMEM((2, 16, W), jnp.float32),
                   pltpu.SemaphoreType.DMA((2,)),
                   pltpu.VMEM((K, 16), jnp.float32)]
    grid_fwd = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((1, 8, P), lambda t, c, s, a: (t, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, NB, P), lambda t, c, s, a: (t, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=list(win_scratch),
    )
    grid_bwd = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, NB, P), lambda t, c, s, a, n: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, P), lambda t, c, s, a, n: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, P), lambda t, c, s, a, n: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, K), lambda t, c, s, a, n: (0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[win_scratch[0], win_scratch[1],
                        pltpu.VMEM((K, 16), jnp.float32), win_scratch[2]],
    )

    def fwd_call(counts, starts, astarts, payload):
        return pl.pallas_call(
            partial(_fwd_kernel_win, ntx=ntx, tile_px=tile_px, P=P, K=K,
                    W=W),
            grid_spec=grid_fwd,
            out_shape=[jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
                       jax.ShapeDtypeStruct((T, NB, P), jnp.float32),
                       jax.ShapeDtypeStruct((T,), jnp.int32)],
            interpret=interpret,
        )(counts, starts, astarts, payload)

    def bwd_call(counts, starts, astarts, nact, payload, taccs, out, g):
        return pl.pallas_call(
            partial(_bwd_kernel_win, ntx=ntx, tile_px=tile_px, P=P, K=K,
                    W=W),
            grid_spec=grid_bwd,
            out_shape=jax.ShapeDtypeStruct((16, T * K), jnp.float32),
            interpret=interpret,
        )(counts, starts, astarts, nact, payload, taccs, out, g)

    def _payload(pair_slot, attr_v16):
        # (16, Np) channel-first — ONE lane gather, no padding; Np must
        # be a multiple of 128 with >= K + 128 sentinel tail (the caller
        # pads pair_slot accordingly) so every aligned window is in range
        return attr_v16[:, pair_slot]

    def _astarts(starts):
        return starts // 128  # BLOCK index; the kernel scales by 128

    @jax.custom_vjp
    def composite(counts, starts, pair_slot, cell_idx, attr_v16):
        out, _, _ = fwd_call(counts, starts, _astarts(starts),
                             _payload(pair_slot, attr_v16))
        return out

    def composite_fwd(counts, starts, pair_slot, cell_idx, attr_v16):
        payload = _payload(pair_slot, attr_v16)
        astarts = _astarts(starts)
        out, taccs, nact = fwd_call(counts, starts, astarts, payload)
        return out, (counts, starts, astarts, nact, cell_idx,
                     attr_v16.shape[1], payload, taccs, out)

    def composite_bwd(res, g):
        (counts, starts, astarts, nact, cell_idx, Vp, payload, taccs,
         out) = res
        dflat = bwd_call(counts, starts, astarts, nact, payload, taccs,
                         out, g)  # (16, T*K) channel-first cell grid
        # splat gradients: every splat composites in <= M cells, whose
        # flat indices cell_idx enumerates — M separate (16, V) LANE
        # gathers + sum, no scatter (index T*K = absent pair, masked to
        # zero).  One (16, M, V) gather instead got materialized through
        # the row-gather engine at 1.19 ms (r5 trace); the per-m unroll
        # stays on the fast lane-gather path.
        d_attr = jnp.zeros((16, cell_idx.shape[1]), jnp.float32)
        for m in range(cell_idx.shape[0]):
            okm = (cell_idx[m] < T * K).astype(jnp.float32)   # (V,)
            idxm = jnp.minimum(cell_idx[m], T * K - 1)
            d_attr = d_attr + dflat[:, idxm] * okm[None]
        d_attr = jnp.pad(d_attr, ((0, 0), (0, Vp - cell_idx.shape[1])))
        return None, None, None, None, d_attr
    composite.defvjp(composite_fwd, composite_bwd)
    # internals exposed for stage-level profiling (scripts/profile_*)
    composite.parts = (fwd_call, bwd_call, _payload)
    return composite


@functools.lru_cache(maxsize=None)
def make_composite_dyn(T: int, ntx: int, tile_px: int, K: int,
                       interpret: bool = False):
    """Dynamic-trip-count compositor: f(counts (T,) int32, attrs (T,16,K))
    -> (T,8,P).  Splats past counts[t] are ignored and get zero gradient;
    counts must be pre-clamped to [0, K]."""
    P = tile_px * tile_px
    NB = K // _BKD  # block-entry transmittance checkpoints per tile
    grid_fwd = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[pl.BlockSpec((1, 16, K), lambda t, c: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, 8, P), lambda t, c: (t, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, NB, P), lambda t, c: (t, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[pltpu.VMEM((K, 16), jnp.float32)],
    )
    fwd_call = pl.pallas_call(
        partial(_fwd_kernel_dyn, ntx=ntx, tile_px=tile_px, P=P, K=K),
        grid_spec=grid_fwd,
        out_shape=[jax.ShapeDtypeStruct((T, 8, P), jnp.float32),
                   jax.ShapeDtypeStruct((T, NB, P), jnp.float32)],
        interpret=interpret,
    )
    grid_bwd = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[pl.BlockSpec((1, 16, K), lambda t, c: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, NB, P), lambda t, c: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, P), lambda t, c: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 8, P), lambda t, c: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 16, K), lambda t, c: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K, 16), jnp.float32),
                        pltpu.VMEM((K, 16), jnp.float32)],
    )
    bwd_call = pl.pallas_call(
        partial(_bwd_kernel_dyn, ntx=ntx, tile_px=tile_px, P=P, K=K),
        grid_spec=grid_bwd,
        out_shape=jax.ShapeDtypeStruct((T, 16, K), jnp.float32),
        interpret=interpret,
    )

    @jax.custom_vjp
    def composite(counts, attrs):
        out, _ = fwd_call(counts, attrs)
        return out

    def composite_fwd(counts, attrs):
        out, taccs = fwd_call(counts, attrs)
        return out, (counts, attrs, taccs, out)

    def composite_bwd(res, g):
        counts, attrs, taccs, out = res
        return None, bwd_call(counts, attrs, taccs, out, g)

    composite.defvjp(composite_fwd, composite_bwd)
    return composite
