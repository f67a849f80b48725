"""DiSCO-style place recognition: invariance + yaw recovery."""

import math

import numpy as np
import jax.numpy as jnp

from gem_tpu.global_map.place_recognition import (disco_signature,
                                                  match_signatures,
                                                  relative_yaw)
from gem_tpu.global_map.submaps import PointBuffer


def _buf(xy, C=256):
    n = len(xy)
    pad = lambda a: np.resize(np.asarray(a, np.float32), C)
    return PointBuffer(
        x=jnp.asarray(pad(xy[:, 0])), y=jnp.asarray(pad(xy[:, 1])),
        z=jnp.zeros(C), variance=jnp.full((C,), 0.01),
        intensity=jnp.zeros(C), traver=jnp.zeros(C),
        color=jnp.zeros(C, jnp.int32),
        valid=jnp.asarray(np.arange(C) < n))


def _scene(rng, n=200):
    # asymmetric structured scene
    pts = []
    pts.append(rng.normal([5, 0], 0.5, (n // 2, 2)))
    pts.append(rng.normal([-3, 6], 1.0, (n // 4, 2)))
    pts.append(rng.normal([0, -8], 0.8, (n // 4, 2)))
    return np.concatenate(pts).astype(np.float32)


def _rotate(xy, yaw):
    c, s = math.cos(yaw), math.sin(yaw)
    return xy @ np.asarray([[c, s], [-s, c]], np.float32)


def test_signature_rotation_invariant_and_discriminative():
    rng = np.random.default_rng(0)
    scene = _scene(rng)
    yaw = 2 * math.pi * 37 / 64          # exact sector multiple
    sig_a, ar, ai = disco_signature(_buf(scene), (0.0, 0.0))
    sig_b, br, bi = disco_signature(_buf(_rotate(scene, yaw)), (0.0, 0.0))
    sim_same = float(match_signatures(sig_a, sig_b))
    other = _scene(np.random.default_rng(99))
    sig_c, _, _ = disco_signature(_buf(other), (0.0, 0.0))
    sim_diff = float(match_signatures(sig_a, sig_c))
    assert sim_same > 0.98
    assert sim_diff < sim_same - 0.05


def test_relative_yaw_recovered():
    rng = np.random.default_rng(1)
    scene = _scene(rng)
    yaw = 2 * math.pi * 11 / 64
    _, ar, ai = disco_signature(_buf(scene), (0.0, 0.0))
    _, br, bi = disco_signature(_buf(_rotate(scene, yaw)), (0.0, 0.0))
    est = float(relative_yaw(br, bi, ar, ai))
    err = abs((est - yaw + math.pi) % (2 * math.pi) - math.pi)
    assert err < 2 * math.pi / 64 * 1.5, (est, yaw)


def _two_radii_scene(rng, n=128):
    """Azimuthally self-similar: equal-mass blobs at theta=0 (r=5) and
    theta=pi (r=10).  The ring-SUMMED azimuth profile of this scene is
    (near-)symmetric under a pi rotation, so profile-only phase correlation
    aliases between shift 0 and shift pi; per-ring spectra disambiguate."""
    a = np.stack([rng.normal(5.0, 0.2, n), rng.normal(0.0, 0.2, n)], -1)
    b = np.stack([rng.normal(-10.0, 0.2, n), rng.normal(0.0, 0.2, n)], -1)
    return np.concatenate([a, b]).astype(np.float32)


def test_relative_yaw_no_aliasing_on_self_similar_scene():
    rng = np.random.default_rng(7)
    scene = _two_radii_scene(rng)
    yaw = math.pi  # swaps the two blobs azimuthally; rings differ
    _, ar, ai = disco_signature(_buf(scene, C=512), (0.0, 0.0))
    _, br, bi = disco_signature(_buf(_rotate(scene, yaw), C=512), (0.0, 0.0))
    est = float(relative_yaw(br, bi, ar, ai))
    err = abs((est - yaw + math.pi) % (2 * math.pi) - math.pi)
    assert err < 2 * math.pi / 64 * 1.5, (est, yaw)

    # a second self-similar pair at a non-degenerate angle
    yaw2 = 2 * math.pi * 21 / 64
    _, cr, ci = disco_signature(_buf(_rotate(scene, yaw2), C=512), (0.0, 0.0))
    est2 = float(relative_yaw(cr, ci, ar, ai))
    err2 = abs((est2 - yaw2 + math.pi) % (2 * math.pi) - math.pi)
    assert err2 < 2 * math.pi / 64 * 1.5, (est2, yaw2)
