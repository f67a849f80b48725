"""Sensor noise models as pure, batched JAX functions.

The reference keeps four strategy classes
(src/sensor_processors/{Laser,StructuredLight,Stereo,Perfect}SensorProcessor.cpp)
whose per-point CPU `computeVariances` is dead code in the live path; the CUDA
kernel implements only the laser model for every sensor type
(gpu_process.cu:410-411 — SURVEY.md §2 "fix the laser-only GPU gap").  Here all
four are real closed forms over a (N, 3) point batch, selected statically by
config so the chosen model inlines into the jitted step.

Common error-propagation law (all models, e.g. LaserSensorProcessor.cpp:150-162):

    sigma_p^2 = J_q  Sigma_q J_q^T + J_s Sigma_s J_s^T
    J_s = P C_MB^T C_BS^T                  (sensor jacobian, row 3-vector)
    J_q = (P C_MB^T) (skew(C_BS^T r) + skew(B_r_BS))
    Sigma_s = diag(sigma_lat^2, sigma_lat^2, sigma_norm^2)

with P = e_z^T, C_* rotation matrices, r the point in the sensor frame.
"""

from __future__ import annotations

import jax.numpy as jnp

from gem_tpu.config import SensorConfig
from gem_tpu.utils.precision import HIGHEST, matmul as _mm


def _laser(cfg: SensorConfig, points, distance):
    """Pomerleau et al. beam model: sigma_n = min_radius,
    sigma_l = beam_constant + beam_angle * d  (gpu_process.cu:410-411)."""
    var_normal = jnp.full_like(distance, cfg.min_radius ** 2)
    var_lateral = (cfg.beam_constant + cfg.beam_angle * distance) ** 2
    return var_lateral, var_normal


def _structured_light(cfg: SensorConfig, points, distance):
    """Nguyen et al. 2012 Kinect model
    (StructuredLightSensorProcessor.cpp:132-140).  Uses depth z, not range."""
    z = points[:, 2]
    dev_n = (cfg.normal_factor_a
             + cfg.normal_factor_b * (z - cfg.normal_factor_c) ** 2
             + cfg.normal_factor_d * jnp.power(jnp.maximum(z, 1e-6),
                                               cfg.normal_factor_e))
    dev_l = cfg.lateral_factor * z
    return dev_l ** 2, dev_n ** 2


def _stereo(cfg: SensorConfig, points, distance, pixel_uv=None):
    """Disparity model (StereoSensorProcessor.cpp:85-92).

    The reference's image-plane term sqrt((p3*disp + p4 - j)^2 + (240 - i)^2)
    needs per-point pixel coords; the pipeline supplies them from the camera
    projection (kernels/pointproc.process_points).  When `pixel_uv` is None
    the principal point is assumed (the term reduces to its minimum) — a
    stereo config without a camera is rejected up front by
    ElevationPipeline/validate_config rather than silently degenerating.
    """
    z = jnp.maximum(points[:, 2], 1e-6)
    f = cfg.depth_to_disparity_factor
    disparity = f / z
    if pixel_uv is None:
        du = jnp.zeros_like(z)
        dv = jnp.zeros_like(z)
    else:
        du = cfg.p_3 * disparity + cfg.p_4 - pixel_uv[:, 0]
        dv = cfg.stereo_center_v - pixel_uv[:, 1]
    var_normal = (f / disparity ** 2) ** 2 * (
        (cfg.p_5 * disparity + cfg.p_2) * jnp.sqrt(du ** 2 + dv ** 2)
        + cfg.p_1)
    var_lateral = (cfg.lateral_factor * distance) ** 2
    return var_lateral, var_normal


def _perfect(cfg: SensorConfig, points, distance):
    zeros = jnp.zeros_like(distance)
    return zeros, zeros


SENSOR_MODELS = {
    "laser": _laser,
    "structured_light": _structured_light,
    "stereo": _stereo,
    "perfect": _perfect,
}


def sensor_variances(cfg: SensorConfig, points, pixel_uv=None):
    """(var_lateral, var_normal) per point; points are (N, 3) sensor-frame.

    `pixel_uv` (N, 2) image coordinates feed the stereo image-plane term and
    are ignored by the other models."""
    distance = jnp.linalg.norm(points, axis=-1)
    if cfg.model == "stereo":
        return _stereo(cfg, points, distance, pixel_uv=pixel_uv)
    return SENSOR_MODELS[cfg.model](cfg, points, distance)


def height_variance(cfg: SensorConfig, points, sensor_jacobian,
                    rotation_variance, c_sb_t, p_mul_c_bm_t, b_r_bs_skew,
                    pixel_uv=None):
    """Propagated per-point height variance sigma_p^2 for a (N, 3) batch.

    Vectorised form of the per-point loop: the rotation-jacobian quadratic
    J_q Sigma_q J_q^T expands to einsums over the batch; the sensor term is a
    weighted sum of the lateral/normal variances with static weights
    js_l = jsx^2 + jsy^2, js_n = jsz^2.
    """
    points = jnp.asarray(points, jnp.float32)
    var_lat, var_norm = sensor_variances(cfg, points, pixel_uv=pixel_uv)

    js = jnp.asarray(sensor_jacobian, jnp.float32).reshape(3)
    sensor_term = (js[0] ** 2 + js[1] ** 2) * var_lat + js[2] ** 2 * var_norm

    # J_q = p_mul_c_bm_t @ (skew(c_sb_t @ r) + b_r_bs_skew) per point.
    sp = _mm(points, jnp.asarray(c_sb_t, jnp.float32).T)      # (N, 3)
    zeros = jnp.zeros_like(sp[:, 0])
    skew = jnp.stack([
        jnp.stack([zeros, -sp[:, 2], sp[:, 1]], axis=-1),
        jnp.stack([sp[:, 2], zeros, -sp[:, 0]], axis=-1),
        jnp.stack([-sp[:, 1], sp[:, 0], zeros], axis=-1),
    ], axis=-2)                                               # (N, 3, 3)
    skew = skew + jnp.asarray(b_r_bs_skew, jnp.float32)
    jq = jnp.einsum("i,nij->nj",
                    jnp.asarray(p_mul_c_bm_t, jnp.float32).reshape(3),
                    skew, precision=HIGHEST)                   # (N, 3)
    sigma_q = jnp.asarray(rotation_variance, jnp.float32)
    rot_term = jnp.einsum("ni,ij,nj->n", jq, sigma_q, jq,
                          precision=HIGHEST)
    return rot_term + sensor_term


def jacobian_ingredients(rotation_map_to_base, rotation_base_to_sensor,
                         translation_base_to_sensor):
    """Precompute the frame-dependent pieces (readcomputerparam,
    SensorProcessorBase.cpp:270-290) from rotation matrices + translation.

    Returns (sensor_jacobian, c_sb_t, p_mul_c_bm_t, b_r_bs_skew).
    """
    R_mb = jnp.asarray(rotation_map_to_base, jnp.float32)
    R_bs = jnp.asarray(rotation_base_to_sensor, jnp.float32)
    t_bs = jnp.asarray(translation_base_to_sensor, jnp.float32).reshape(3)
    P = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    c_bm_t = R_mb.T
    c_sb_t = R_bs.T
    sensor_jacobian = _mm(P, _mm(c_bm_t, c_sb_t))
    p_mul_c_bm_t = _mm(P, c_bm_t)
    b_r_bs_skew = jnp.asarray([
        [0.0, -t_bs[2], t_bs[1]],
        [t_bs[2], 0.0, -t_bs[0]],
        [-t_bs[1], t_bs[0], 0.0],
    ], jnp.float32)
    return sensor_jacobian, c_sb_t, p_mul_c_bm_t, b_r_bs_skew
