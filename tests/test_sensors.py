"""Sensor noise models vs the per-point oracle."""

import numpy as np
import jax.numpy as jnp

from gem_tpu.config import SensorConfig
from gem_tpu.sensors.models import (height_variance, jacobian_ingredients,
                                    sensor_variances)
import reference_semantics as ref


def _random_rotation(rng):
    a = rng.normal(size=(3, 3))
    q, _ = np.linalg.qr(a)
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return q.astype(np.float32)


def test_laser_variance_matches_oracle():
    rng = np.random.default_rng(11)
    cfg = SensorConfig(model="laser", min_radius=0.018, beam_angle=0.0006,
                       beam_constant=0.0015)
    R_mb = _random_rotation(rng)
    R_bs = _random_rotation(rng)
    t_bs = rng.normal(size=3).astype(np.float32) * 0.2
    js, c_sb_t, p_bm_t, skew = jacobian_ingredients(R_mb, R_bs, t_bs)
    sigma_q = np.diag([1e-4, 2e-4, 3e-4]).astype(np.float32)
    pts = rng.uniform(-20, 20, size=(64, 3)).astype(np.float32)

    got = np.asarray(height_variance(cfg, jnp.asarray(pts), js, sigma_q,
                                     c_sb_t, p_bm_t, skew))
    want = ref.laser_variance(pts, cfg.min_radius, cfg.beam_angle,
                              cfg.beam_constant, np.asarray(js), sigma_q,
                              np.asarray(c_sb_t), np.asarray(p_bm_t),
                              np.asarray(skew))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-8)


def test_perfect_model_zero_without_rotation_cov():
    cfg = SensorConfig(model="perfect")
    pts = np.array([[1.0, 2.0, 3.0], [0.1, 0.0, -0.5]], np.float32)
    eye = np.eye(3, dtype=np.float32)
    js, c_sb_t, p_bm_t, skew = jacobian_ingredients(eye, eye, np.zeros(3))
    out = np.asarray(height_variance(cfg, jnp.asarray(pts), js,
                                     np.zeros((3, 3), np.float32),
                                     c_sb_t, p_bm_t, skew))
    np.testing.assert_allclose(out, 0.0, atol=1e-9)


def test_structured_light_nguyen_formula():
    cfg = SensorConfig(model="structured_light")
    z = np.array([0.5, 1.0, 2.5], np.float32)
    pts = np.stack([np.zeros_like(z), np.zeros_like(z), z], -1)
    var_l, var_n = sensor_variances(cfg, jnp.asarray(pts))
    dev_n = (cfg.normal_factor_a
             + cfg.normal_factor_b * (z - cfg.normal_factor_c) ** 2
             + cfg.normal_factor_d * z ** cfg.normal_factor_e)
    np.testing.assert_allclose(np.asarray(var_n), dev_n ** 2, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var_l),
                               (cfg.lateral_factor * z) ** 2, rtol=1e-5)


def test_laser_variance_grows_with_distance():
    cfg = SensorConfig(model="laser", min_radius=0.01, beam_angle=0.001,
                       beam_constant=0.001)
    eye = np.eye(3, dtype=np.float32)
    # tilt the sensor so the lateral (distance-dependent) term projects onto z
    a = np.deg2rad(30).astype(np.float32)
    tilt = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)],
                     [0, np.sin(a), np.cos(a)]], np.float32)
    js, c_sb_t, p_bm_t, skew = jacobian_ingredients(eye, tilt, np.zeros(3))
    pts = np.array([[1, 1, -1], [10, 10, -1], [50, 50, -1]], np.float32)
    out = np.asarray(height_variance(cfg, jnp.asarray(pts), js,
                                     np.zeros((3, 3), np.float32),
                                     c_sb_t, p_bm_t, skew))
    assert out[0] < out[1] < out[2]
