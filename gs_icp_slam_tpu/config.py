"""Unified configuration for the SLAM system.

One dataclass replaces the reference's three config tiers (hardcoded
SLAMParameters at arguments/__init__.py:122-164, the positional caminfo.txt
line, and per-dataset shell-script flags in replica.sh:135-142 /
tum.sh:135-142).  Dataset presets carry the published per-dataset tuning.
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional

from .utils.camera import Intrinsics


@dataclass(frozen=True)
class GICPConfig:
    """G-ICP registration parameters (reference: pygicp defaults + CLI)."""

    max_correspondence_distance: float = 0.02  # replica.sh:139 (TUM: 0.03)
    knn_max_distance: float = 99999.0  # gs_icp_slam.py:236
    k_neighbors: int = 20  # fast_gicp default k for covariance estimation
    max_iterations: int = 64
    transformation_epsilon: float = 5e-4
    rotation_epsilon: float = 2e-3
    plane_eps: float = 1e-3  # plane-regularized smallest eigenvalue
    lm_init_lambda: float = 1e-9  # tiny damping for the 6x6 solve
    # source-covariance neighbour search: "grid" exploits that the source
    # cloud is a regular pixel-grid subsample and searches a
    # (2*grid_knn_span+1)^2 image-space window (O(S) vs the exact
    # search's O(S^2); identical neighbours on locally smooth surfaces);
    # "exact" brute-forces all pairs like fast_gicp's kd-tree
    source_knn: str = "grid"
    # 0 = auto: the smallest span whose window holds >= ~2.4*k_neighbors
    # candidates (k=20 -> span 3).  The r2 default span of 2 gave k=20
    # neighbours only 25 candidates — the selection degenerated to "the
    # whole window is the neighbourhood", biasing source covariances
    # toward fixed image-blocks; under a 4x-rotation stress that drifted
    # ATE 3.4 -> 10.3 cm (r3 root-cause; span 3 restores 3.3 cm, matching
    # the exact search, at ~0.3 ms extra on the bench frame).
    grid_knn_span: int = 0
    # initial-guess motion model.  "constant_position" seeds align() with
    # the previous pose (the reference, mp_Tracker.py:197).
    # "constant_velocity" extrapolates the last relative motion: it
    # rescues fast rotation (12 cm -> 3.4 cm ATE on the 4x-rotation
    # stress test) but on smooth trajectories the near-perfect seed lands
    # inside the Gauss-Newton convergence dead-band
    # (transformation_epsilon ~ 0.5 mm), so per-frame errors are accepted
    # uncorrected and integrate into drift (measured 0.22 m vs 1.6 mm ATE
    # over 20 sparse synthetic frames).  "adaptive" (default) switches
    # seed PER FRAME on the predicted inter-frame rotation magnitude
    # (the angle of the CV extrapolation, known before aligning): CP
    # below adaptive_trigger_deg, CV above — CP's zero-drift smooth
    # tracking plus CV's rotation robustness, at zero extra alignment
    # cost.  Result-quality judges (post-step error, converged
    # Mahalanobis, trimmed point-to-point) were all tried and measured
    # UNRELIABLE here: under fast rotation the mis-tracked pose aliases
    # along scene planes into configurations geometry-only scores rate
    # as well as the true pose (gicp_align init_T2 docstring).
    motion_model: str = "adaptive"
    # Predicted inter-frame rotation (degrees) above which the adaptive
    # model seeds from constant velocity.  Measured regimes: smooth
    # orbit ~1.15 deg/frame tracks to mm under CP and drifts under CV;
    # the 4x rotation stress ~4.6 deg/frame gives CP 12.0 cm vs
    # CV 3.1 cm.
    adaptive_trigger_deg: float = 2.0
    # Degeneracy-aware solution remapping (Zhang & Kaess 2016, "On
    # Degeneracy of Optimization-based State Estimation"): zero the GN
    # update along eigendirections of H whose eigenvalue falls below
    # this fraction of the largest — those directions are unobservable
    # from the current geometry (e.g. a view filled by ONE wall leaves
    # along-wall translation free) and the unremapped step slides along
    # them.  Root-caused from the bench's ATE plateau: frames 0-33
    # tracked at ~0.1 mm while the last two frames (96% single-wall
    # coverage) slid 4.4/8.9 cm (scripts/ate_decompose.py).  0 disables.
    # fast_gicp has no equivalent; its pose would slide identically.
    # Swept on scripts/ate_decompose.py: 1e-3 never engages (plane_eps
    # regularization floors the weak eigenvalue near 1e-3 of max), 3e-3
    # -> 0.185 cm ATE, 1e-2 -> 0.307 cm (over-clamps mildly-constrained
    # frames); bench ATE without it: 1.46 cm.
    degeneracy_thresh: float = 3e-3


@dataclass(frozen=True)
class OptConfig:
    """3DGS optimizer hyperparameters (arguments/__init__.py:138-152)."""

    position_lr: float = 1.6e-6
    spatial_lr_scale: float = 2.5  # scene_extent, mp_Tracker.py:74
    feature_lr: float = 2.5e-3
    opacity_lr: float = 0.05
    scaling_lr: float = 5e-3
    rotation_lr: float = 1e-3
    lambda_dssim: float = 0.2
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-15
    depth_loss_weight: float = 0.1
    depth_d_max: float = 10.0
    # 0 = full-res mapping; 1/2 = optimize at half/quarter resolution
    # (reference render_3's resolution/(training_stage*2) path,
    # gaussian_renderer/__init__.py:237-242, mp_Mapper.py:207-218 —
    # dead upstream since the gt pyramids are commented out in
    # shared_objs.py:146-155, implemented live here)
    training_stage: int = 0


@dataclass(frozen=True)
class MapConfig:
    """Gaussian map capacities and maintenance."""

    capacity: int = 1 << 19  # max gaussians (padded static shape)
    sh_degree: int = 0  # reference SLAM uses degree 0
    init_opacity: float = 0.1
    prune_interval: int = 200  # mapper iterations between prunes
    prune_min_opacity: float = 0.005
    prune_extent: float = 2.5  # replica (tum: 10.0), mp_Mapper.py:81-84
    trackable_opacity_th: float = 0.05
    densify_enabled: bool = False  # reference defines but never calls densify
    densify_grad_threshold: float = 2e-4
    percent_dense: float = 0.01


@dataclass(frozen=True)
class KeyframeConfig:
    """Keyframe selection thresholds (mp_Tracker.py:233-249)."""

    keyframe_th: float = 0.7  # tracking KF if overlap ratio below this
    keyframe_freq: int = 10  # mapping KF every N frames since tracking KF
    overlapped_th: float = 5e-4  # sq-dist threshold for overlap counting
    overlapped_th2: float = 5e-5  # sq-dist threshold for dedup before insert
    # Squared-distance insertion gate for NEW gaussians on every keyframe
    # (0 = off, the reference behavior: add_from_pcd2_tensor inserts ALL
    # downsampled points per keyframe, gaussian_model.py:165-186, so the
    # map grows linearly with keyframes even when revisiting — fine on a
    # 24 GB desktop GPU with dynamic tensors, but a fixed-capacity TPU
    # map saturates: a 400-frame revisit-heavy orbit hit 524k live and
    # 440k visible-cap drops, scripts/long_run.py r5).  When > 0, points
    # whose G-ICP correspondence distance is below the gate skip
    # insertion: revisited surfaces stop growing the map.
    insert_dedup_sqd: float = 0.0


@dataclass(frozen=True)
class EngineConfig:
    """Single-process pipeline knobs (replacing the 2-process split)."""

    mapping_iters_per_frame: int = 3
    mapping_iters_final: int = 0  # extra optimization after last frame
    fps_cap: Optional[float] = 30.0  # None = unlimited mode
    target_capacity: int = 1 << 18  # trackable target gaussians cap
    keyframe_capacity: int = 256  # stored keyframes (RGB-D + pose)
    # frames per device dispatch: >1 scans whole chunks on-device, hiding
    # per-dispatch latency (~16 ms on a tunneled chip) at the cost of
    # chunk-sized result latency; forced to 1 in viewer/fps_cap modes
    frames_per_dispatch: int = 1
    # multi-chip mapping strategy: "dp" replicates the map and shards
    # keyframes (comm = one grad all-reduce; right whenever the map fits
    # per device), "fsdp" shards map+Adam along capacity (all-gather
    # params per iter; for maps beyond one device's HBM).  "auto" picks
    # dp below parallel/sharded.DP_MAX_BYTES.  VERDICT r2 #5: fsdp's
    # O(capacity) per-device all-gather cannot amortize at any mesh size
    # when the map would have fit replicated.
    parallel_mode: str = "auto"


@dataclass(frozen=True)
class RenderConfig:
    # 32-px tiles, not the CUDA kernel's 16: on TPU the per-tile grid-step
    # overhead dominates at 16 px (3225 tiles/frame at Replica geometry);
    # 32 px quarters the tile count and halves the pair count for
    # bit-identical output (bench: 10.7 -> 13.2 FPS; 64 px plateaus)
    tile_size: int = 32
    # HARD CEILING on the per-tile gaussian list capacity (K).  The
    # engine sizes K from the expected pairs-per-tile (fused.py); this
    # ceiling only bounds VMEM for pathological configs.  It was 512
    # through r4, which silently clamped BELOW the estimate on small-T
    # scenes (96x72 = 9 tiles, est 1820): harmless while the r4 tile_rect
    # cropped coverage, but the r5 coverage fix pushed real counts past
    # 512 and cost 4 dB in the keyframe-overflow stress scenario.
    max_per_tile: int = 4096
    visible_capacity: int = 1 << 17  # per-view visible gaussians cap (V)
    # max tiles a splat covers per axis (D): the pair array is D^2 x V, so
    # D drives the binning sort/payload size.  2 at 32-px tiles = a 64-px
    # coverage box — larger than the old 3 x 16-px = 48-px box with less
    # than half the pairs
    tile_span: int = 2
    composite_chunk: int = 64  # tiles composited per lax.map step
    znear: float = 0.2  # rasterizer frustum near (CUDA kernel uses 0.2)
    bg_color: tuple = (0.0, 0.0, 0.0)


@dataclass(frozen=True)
class SLAMConfig:
    intr: Intrinsics = field(default_factory=lambda: Intrinsics(640, 480, 525.0, 525.0, 319.5, 239.5))
    dataset_type: str = "replica"
    downsample_rate: int = 10
    gicp: GICPConfig = field(default_factory=GICPConfig)
    opt: OptConfig = field(default_factory=OptConfig)
    map: MapConfig = field(default_factory=MapConfig)
    kf: KeyframeConfig = field(default_factory=KeyframeConfig)
    engine: EngineConfig = field(default_factory=EngineConfig)
    render: RenderConfig = field(default_factory=RenderConfig)

    def replace(self, **kw) -> "SLAMConfig":
        return dataclasses.replace(self, **kw)


def parse_caminfo(path: str) -> tuple[Intrinsics, str]:
    """Parse the reference caminfo.txt (line 3: W H fx fy cx cy depth_scale
    depth_trunc dataset_type; gs_icp_slam.py:52-62)."""
    with open(path) as f:
        lines = f.readlines()
    parts = lines[2].split()
    intr = Intrinsics(
        width=int(parts[0]), height=int(parts[1]),
        fx=float(parts[2]), fy=float(parts[3]),
        cx=float(parts[4]), cy=float(parts[5]),
        depth_scale=float(parts[6]), depth_trunc=float(parts[7]),
    )
    return intr, parts[8]


def replica_config(intr: Optional[Intrinsics] = None) -> SLAMConfig:
    """Replica tuning from replica.sh:135-142."""
    intr = intr or Intrinsics(1200, 680, 600.0, 600.0, 599.5, 339.5,
                              depth_scale=6553.5, depth_trunc=12.0)
    return SLAMConfig(
        intr=intr,
        dataset_type="replica",
        downsample_rate=10,
        gicp=GICPConfig(max_correspondence_distance=0.02),
        kf=KeyframeConfig(keyframe_th=0.7, overlapped_th=5e-4, overlapped_th2=5e-5),
        map=MapConfig(trackable_opacity_th=0.05, prune_extent=2.5),
    )


def synthetic_config(intr: Intrinsics, downsample_rate: int = 5,
                     capacity: int = 1 << 16,
                     target_capacity: int = 1 << 14,
                     visible_capacity: int = 1 << 14) -> SLAMConfig:
    """Small-scene tuning for the procedural synthetic sequence (tests and
    the benchmark; Replica thresholds otherwise)."""
    # Downsampled point spacing is ~z * rate / fx; the overlap thresholds are
    # squared distances and must scale with it (Replica: 1.7cm spacing at 1m
    # with ds=10/fx=600 vs these low-res synthetic frames at ~4-9cm).
    return SLAMConfig(
        intr=intr,
        dataset_type="synthetic",
        downsample_rate=downsample_rate,
        gicp=GICPConfig(max_correspondence_distance=0.1),
        kf=KeyframeConfig(keyframe_th=0.7, overlapped_th=8e-3,
                          overlapped_th2=8e-4),
        map=MapConfig(capacity=capacity, trackable_opacity_th=0.05,
                      prune_extent=2.5),
        engine=EngineConfig(target_capacity=target_capacity),
        render=RenderConfig(visible_capacity=visible_capacity),
    )


def tum_config(intr: Optional[Intrinsics] = None) -> SLAMConfig:
    """TUM tuning from tum.sh:135-142 (fr1/fr2/fr3 intrinsics differ; pass
    the right caminfo)."""
    intr = intr or Intrinsics(640, 480, 517.3, 516.5, 318.6, 255.3,
                              depth_scale=5000.0, depth_trunc=6.0)
    return SLAMConfig(
        intr=intr,
        dataset_type="tum",
        downsample_rate=5,
        gicp=GICPConfig(max_correspondence_distance=0.03),
        kf=KeyframeConfig(keyframe_th=0.81, overlapped_th=1e-3, overlapped_th2=1e-3),
        map=MapConfig(trackable_opacity_th=0.09, prune_extent=10.0),
    )
