"""Fused per-point processing: colorize, transform, filter, variance, bin.

TPU-native replacement for G_pointsprocess (gpu_process.cu:384-455) plus the
per-frame CPU colorization loop (src/ElevationMapping.cpp:349-381): one
vectorised pass over a fixed-size padded point batch, entirely inside jit.
Invalid lanes are carried as a mask rather than the reference's -1 sentinels
(which collide with legitimate data, e.g. points at height exactly -1,
gpu_process.cu:482).

Also computes the per-cell lowest-scan bound.  NOTE the reference indexes
`map_lowest` *geographically* everywhere (write: gpu_process.cu:434 via
PointsToIndex; read: ray trace walks geographic indices through Storageindex
which is plain row-major flattening, gpu_process.cu:677-706), so our `lowest`
plane is geographic-indexed — unlike every other plane — and is documented as
such here and in core/state.py.  The reference's racy "min then +3*sigma^2 if
I am the min" (gpu_process.cu:434-438) becomes the deterministic
min(h + 3*var) — see the inline note at the reduction.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gem_tpu.config import PipelineConfig
from gem_tpu.core import index_math as im
from gem_tpu.core.state import MapState, pack_rgb
from gem_tpu.kernels import scatter
from gem_tpu.sensors.models import height_variance
from gem_tpu.utils.precision import matmul as _mm


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointBatch:
    """Processed points ready for fusion; all (P,) / (P, k) fixed shapes."""

    xy: jax.Array         # (P, 2) map-frame position
    height: jax.Array     # (P,) map-frame z
    variance: jax.Array   # (P,) propagated height variance
    cell: jax.Array       # (P,) flat storage cell id, or L*L when invalid
    color: jax.Array      # (P,) packed rgb (0 when no color)
    intensity: jax.Array  # (P,)
    valid: jax.Array      # (P,) bool


def project_to_image(points, projection):
    """Pinhole projection of sensor-frame points: (u, v, depth) floats.

    P_img = P(3x4) @ [p;1] with P the lidar->image projection
    (src/ElevationMapping.cpp:349-367)."""
    P = jnp.asarray(projection, jnp.float32).reshape(3, 4)
    homo = jnp.concatenate([points, jnp.ones_like(points[:, :1])], axis=-1)
    img_pt = _mm(homo, P.T)                               # (N, 3)
    z = img_pt[:, 2]
    u = (img_pt[:, 0] / jnp.where(z == 0, 1e-9, z))
    v = (img_pt[:, 1] / jnp.where(z == 0, 1e-9, z))
    return u, v, z


def colorize(points, image, projection):
    """Project sensor-frame points into the camera image, sample rgb.

    Vectorised version of the reference's per-point loop
    (src/ElevationMapping.cpp:349-381): P_img = P(3x4) @ [p;1]; nearest-pixel
    sample where the projection lands strictly inside the image with z > 0,
    else rgb = 0.
    """
    H, W = image.shape[0], image.shape[1]
    u, v, z = project_to_image(points, projection)
    ui = u.astype(jnp.int32)
    vi = v.astype(jnp.int32)
    ok = (ui > 0) & (ui < W) & (vi > 0) & (vi < H) & (z > 0)
    ui = jnp.clip(ui, 0, W - 1)
    vi = jnp.clip(vi, 0, H - 1)
    flat = image.reshape(-1, image.shape[-1]).astype(jnp.int32)
    rgb = flat[vi * W + ui]                               # (N, 3)
    r = jnp.where(ok, rgb[:, 0], 0)
    g = jnp.where(ok, rgb[:, 1], 0)
    b = jnp.where(ok, rgb[:, 2], 0)
    return pack_rgb(r, g, b), ok


def _body_filter(cfg: PipelineConfig, points):
    """Sensor-frame self/FOV rejection (True = drop).

    `reference` replicates the hard-coded box of gpu_process.cu:393.
    """
    bf = cfg.body_filter
    x, y = points[:, 0], points[:, 1]
    if bf.mode == "none":
        return jnp.zeros(points.shape[0], bool)
    in_body = ((x > -bf.body_half_x) & (x < bf.body_half_x)
               & (y > -bf.body_half_y) & (y < bf.body_half_y))
    if bf.mode == "box":
        return in_body
    return in_body | ((y > -1.0) & (y < 1.0)) | (y > 0.0)


def process_points(
    state: MapState,
    cfg: PipelineConfig,
    points,                # (P, 3) sensor-frame xyz (padded)
    intensity,             # (P,)
    in_valid,              # (P,) bool: real (non-pad) points
    transform,             # (4, 4) sensor->map
    base_z,                # () map-frame z of robot base (height band origin)
    sensor_jacobian, rotation_variance, c_sb_t, p_mul_c_bm_t, b_r_bs_skew,
    image=None,            # (H, W, 3) uint8 or None
    colors=None,           # (P,) packed rgb if pre-colorized
    compute_lowest=True,   # False: the stream fuse kernel owns the lowest
                           # reduction (kernels/fuse_stream.py rides it on
                           # the shared sorted pass)
) -> tuple[PointBatch, jax.Array]:
    """Returns the processed PointBatch and the updated (geographic) lowest
    plane."""
    L = cfg.map.length
    points = jnp.asarray(points, jnp.float32)
    T = jnp.asarray(transform, jnp.float32)

    # sensor -> map transform (one (P,3)x(3,3) matmul on the MXU)
    # exact-f32 matmul: the MXU's default bf16 input rounding costs up to
    # ~7 cm on +/-40 m coordinates (utils/precision.py)
    ts = _mm(points, T[:3, :3].T) + T[:3, 3]
    height = ts[:, 2]

    # colorization
    if image is not None and cfg.camera.image_height > 0:
        color, _ = colorize(points, image, cfg.camera.projection)
    elif colors is not None:
        color = jnp.asarray(colors, jnp.int32)
    else:
        color = jnp.zeros(points.shape[0], jnp.int32)

    # filters (gpu_process.cu:393-397): body/FOV box + height band relative
    # to the robot base (SensorProcessorBase.cpp:183-184)
    drop = _body_filter(cfg, points)
    lower = base_z + cfg.sensor.ignore_points_below
    upper = base_z + cfg.sensor.ignore_points_above
    band_ok = (height > lower) & (height < upper)
    valid = jnp.asarray(in_valid, bool) & ~drop & band_ok
    if cfg.sensor.model == "structured_light":
        # depth cutoffs (cleanPointCloud's PassThrough z filter,
        # StructuredLightSensorProcessor.cpp:53-66)
        depth = points[:, 2]
        valid = valid & (depth >= cfg.sensor.cutoff_min_depth) \
            & (depth <= cfg.sensor.cutoff_max_depth)

    # per-point height variance (sensor model; sensors/models.py).  The
    # stereo model's image-plane term (StereoSensorProcessor.cpp:85-92)
    # needs per-point pixel coordinates; with a camera configured they come
    # from the same lidar->image projection the colorizer uses.
    pixel_uv = None
    if cfg.sensor.model == "stereo" and cfg.camera.image_height > 0:
        u, v, _ = project_to_image(points, cfg.camera.projection)
        pixel_uv = jnp.stack([u, v], axis=-1)
    var = height_variance(cfg.sensor, points, sensor_jacobian,
                          rotation_variance, c_sb_t, p_mul_c_bm_t,
                          b_r_bs_skew, pixel_uv=pixel_uv)

    # cell binning
    gx, gy, in_map = im.position_to_geo_index(ts[:, 0], ts[:, 1], state.center,
                                              L, cfg.map.resolution)
    valid = valid & in_map
    sx, sy = im.geo_to_storage(gx, gy, state.start, L)
    cell = jnp.where(valid, sx * L + sy, L * L)
    geo_cell = jnp.where(valid, gx * L + gy, L * L)

    # lowest-scan bound, REFERENCE semantics (gpu_process.cu:434-438):
    # atomicMin on height, and the winning point contributes 3*sigma of ITS
    # OWN variance.  The race's winner is arbitrary under exact-height
    # ties; we resolve deterministically as (min h, then max v) — the
    # pessimistic tie — identically in both fuse backends (the stream
    # kernel reads the same winner off its sorted segment-END rows for
    # free; see kernels/fuse_stream.py).  PARITY.md "lowest bound".
    if cfg.enable_lowest and compute_lowest:
        h_s = jnp.where(valid, height, jnp.inf)
        ids_l, h_l, negv_l = jax.lax.sort(
            [geo_cell.astype(jnp.int32), h_s,
             -jnp.where(valid, var, 0.0)], num_keys=3)
        is_start = jnp.concatenate(
            [jnp.ones((1,), bool), ids_l[1:] != ids_l[:-1]])
        bound = jnp.where(is_start, h_l - 3.0 * negv_l, jnp.inf)
        candidate = scatter.segment_reduce(bound, ids_l, L * L, "min",
                                           jnp.inf)
        lowest = jnp.minimum(state.lowest.reshape(-1),
                             candidate).reshape(L, L)
    else:
        lowest = state.lowest

    batch = PointBatch(
        xy=ts[:, :2], height=height, variance=var, cell=cell,
        color=color, intensity=jnp.asarray(intensity, jnp.float32),
        valid=valid,
    )
    return batch, lowest
