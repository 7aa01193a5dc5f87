"""Ablation timing of the rasterizer forward/backward on TPU.

Separates: pallas composite fwd/bwd alone, full raster fwd/bwd with
pallas vs XLA compositor, plain-L2 vs full mapping loss (SSIM cost),
and the pair-sort/binning stage alone.
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gs_icp_slam_tpu.ops.rasterize import rasterize_tiled
from gs_icp_slam_tpu.utils.losses import mapping_loss


def _checksum(out):
    leaves = [x for x in jax.tree.leaves(out)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
    return sum(jnp.sum(x) for x in leaves[:1])


def timeit(name, fn, *args, n=10, **kw):
    # device_get of a scalar checksum is the only reliable host sync
    # through the remote axon relay (block_until_ready returns early)
    float(jax.device_get(_checksum(fn(*args, **kw))))
    t0 = time.time()
    acc = []
    for _ in range(n):
        acc.append(_checksum(fn(*args, **kw)))
    float(jax.device_get(sum(acc)))
    dt = (time.time() - t0) / n * 1000
    print(f"{name:42s} {dt:8.2f} ms")


def main():
    W, H = 1200, 680
    N = 1 << 18
    V = 1 << 16
    K = 256
    TILE = 16
    ntx, nty = -(-W // TILE), -(-H // TILE)
    T = ntx * nty
    NLIVE = 8192

    rng = np.random.default_rng(0)
    xyz = np.stack([rng.uniform(-3, 3, N), rng.uniform(-2, 2, N),
                    rng.uniform(1.5, 8.0, N)], -1).astype(np.float32)
    quat = rng.normal(size=(N, 4)).astype(np.float32)
    scale = rng.uniform(0.005, 0.03, (N, 3)).astype(np.float32)
    opacity = rng.uniform(0.3, 0.95, N).astype(np.float32)
    sh = rng.uniform(-0.5, 0.5, (N, 1, 3)).astype(np.float32)
    live = np.zeros((N,), bool)
    live[:NLIVE] = True
    xyz, quat, scale, opacity, sh, live = map(
        jnp.asarray, (xyz, quat, scale, opacity, sh, live))
    w2c = jnp.eye(4)
    bg = jnp.zeros((3,))
    fx = fy = 600.0
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0

    gt_img = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))
    gt_depth = jnp.asarray(rng.uniform(1, 8, (H, W)).astype(np.float32))

    def raster(p_xyz, p_scale, p_op, p_sh, use_pallas):
        return rasterize_tiled(p_xyz, quat, p_scale, p_op, p_sh, w2c, live,
                               bg, fx, fy, cx, cy, sh_degree=0, width=W,
                               height=H, tile=TILE, visible_cap=V,
                               tile_span=3, tile_cap=K,
                               use_pallas=use_pallas)

    for up in (True, False):
        tag = "pallas" if up else "xla"

        @jax.jit
        def fwd(x, s, o, h, up=up):
            out = raster(x, s, o, h, up)
            return out.color, out.depth

        timeit(f"raster fwd [{tag}]", fwd, xyz, scale, opacity, sh)

        @jax.jit
        def l2grad(x, s, o, h, up=up):
            def loss(x, s, o, h):
                out = raster(x, s, o, h, up)
                return (jnp.mean((out.color - gt_img) ** 2)
                        + 0.1 * jnp.mean(out.depth))
            return jax.grad(loss, argnums=(0, 1, 2, 3))(x, s, o, h)

        timeit(f"raster fwd+bwd L2 [{tag}]", l2grad, xyz, scale, opacity, sh)

        @jax.jit
        def fullgrad(x, s, o, h, up=up):
            def loss(x, s, o, h):
                out = raster(x, s, o, h, up)
                l, _ = mapping_loss(out.color, out.depth, gt_img, gt_depth,
                                    lambda_dssim=0.2, depth_weight=0.1,
                                    d_max=10.0)
                return l
            return jax.grad(loss, argnums=(0, 1, 2, 3))(x, s, o, h)

        timeit(f"raster fwd+bwd full-loss [{tag}]", fullgrad, xyz, scale,
               opacity, sh)

    # composite kernel alone
    from gs_icp_slam_tpu.ops.composite_pallas import make_composite
    comp = make_composite(T, ntx, TILE, K)
    attrs = jnp.asarray(rng.normal(size=(T, 16, K)).astype(np.float32))

    @jax.jit
    def comp_fwd(a):
        return comp(a)

    timeit("pallas composite fwd alone", comp_fwd, attrs)

    @jax.jit
    def comp_bwd(a):
        return jax.grad(lambda a: jnp.sum(comp(a)))(a)

    timeit("pallas composite fwd+bwd alone", comp_bwd, attrs)

    # SSIM loss alone
    @jax.jit
    def loss_only_grad(img):
        def f(img):
            l, _ = mapping_loss(img, gt_depth, gt_img, gt_depth,
                                lambda_dssim=0.2, depth_weight=0.1,
                                d_max=10.0)
            return l
        return jax.grad(f)(img)

    img0 = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))
    timeit("mapping_loss fwd+bwd alone", loss_only_grad, img0)

    # binning stage alone (everything before composite, incl sort + gather)
    from gs_icp_slam_tpu.ops.projection import project_gaussians

    @jax.jit
    def project_only(x, s, o, h):
        sp = project_gaussians(x, quat, s, o, h, 0, w2c, fx, fy, cx, cy,
                               W, H, live)
        return sp.mean2d, sp.conic, sp.depth, sp.rgb

    timeit("project_gaussians fwd alone", project_only, xyz, scale,
           opacity, sh)

    @jax.jit
    def project_grad(x, s, o, h):
        def f(x, s, o, h):
            sp = project_gaussians(x, quat, s, o, h, 0, w2c, fx, fy, cx, cy,
                                   W, H, live)
            return (jnp.sum(sp.mean2d * 1e-3) + jnp.sum(sp.conic * 1e-3)
                    + jnp.sum(sp.rgb))
        return jax.grad(f, argnums=(0, 1, 2, 3))(x, s, o, h)

    timeit("project_gaussians fwd+bwd alone", project_grad, xyz, scale,
           opacity, sh)


if __name__ == "__main__":
    main()
