"""Robot-motion process noise: pose covariance -> map variance update.

Pure-function rebuild of RobotMotionMapUpdater (RobotMotionMapUpdater.cpp:42-147):
the robot's 6x6 pose covariance is reduced to (x, y, z, yaw), differenced
against the previous frame in the z-aligned robot frame, and its position
block is pushed through the translation Jacobian; the z-diagonal becomes a
scalar variance added to every fused cell (G_Mapvar_update,
gpu_process.cu:540-547).

The reference feeds this a hard-zeroed covariance
(src/ElevationMapping.cpp:944-945) making the update a no-op; here the
covariance is a real input (SURVEY.md §2: "make covariance actually
pluggable") and zero input reproduces the reference's no-op.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gem_tpu.utils.precision import matmul as _mm


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MotionState:
    prev_position: jax.Array      # (3,)
    prev_quat: jax.Array          # (4,) wxyz
    prev_reduced_cov: jax.Array   # (4, 4)


def init_motion_state() -> MotionState:
    return MotionState(
        prev_position=jnp.zeros(3, jnp.float32),
        prev_quat=jnp.asarray([1.0, 0.0, 0.0, 0.0], jnp.float32),
        prev_reduced_cov=jnp.zeros((4, 4), jnp.float32),
    )


def quat_to_rotmat(q):
    """wxyz quaternion -> rotation matrix."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], jnp.float32)


def _zyx_yaw_pitch(q):
    """Yaw and pitch of the ZYX Euler decomposition."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    sp = jnp.clip(2 * (w * y - x * z), -1.0, 1.0)
    pitch = jnp.arcsin(sp)
    return yaw, pitch


def _rotvec_z(q):
    """z component of the axis-angle rotation vector."""
    w = jnp.clip(q[0], -1.0, 1.0)
    angle = 2.0 * jnp.arccos(w)
    s = jnp.sqrt(jnp.maximum(1.0 - w * w, 1e-12))
    axis_z = q[3] / s
    return jnp.where(angle < 1e-6, 0.0, angle * axis_z)


def reduced_covariance(quat, pose_cov):
    """(A.3-A.5): project the 6x6 pose covariance onto (x, y, z, yaw)."""
    yaw, pitch = _zyx_yaw_pitch(quat)
    tp = jnp.tan(pitch)
    jac = jnp.zeros((4, 6), jnp.float32)
    jac = jac.at[:3, :3].set(jnp.eye(3))
    jac = jac.at[3, 3:].set(jnp.asarray([jnp.cos(yaw) * tp,
                                         jnp.sin(yaw) * tp, 1.0]))
    return _mm(_mm(jac, jnp.asarray(pose_cov, jnp.float32)), jac.T)


def relative_covariance(position, quat, reduced, prev: MotionState):
    """(A.8-A.14): covariance of the pose *increment* in the z-aligned frame."""
    rz = _rotvec_z(quat)
    c, s = jnp.cos(rz), jnp.sin(rz)
    R_tilde = jnp.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]],
                          jnp.float32)

    R_prev = quat_to_rotmat(prev.prev_quat)
    v_dt = _mm(R_prev.T, jnp.asarray(position, jnp.float32)
               - prev.prev_position)

    ez_skew = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0],
                           [0.0, 0.0, 0.0]], jnp.float32)
    F = jnp.eye(4, dtype=jnp.float32)
    F = F.at[:3, 3].set(_mm(_mm(ez_skew, R_tilde), v_dt))

    invG = jnp.zeros((4, 4), jnp.float32).at[3, 3].set(1.0)
    invGT = invG
    invG = invG.at[:3, :3].set(R_tilde.T)
    invGT = invGT.at[:3, :3].set(R_tilde)

    return _mm(_mm(invG, (reduced - _mm(_mm(F, prev.prev_reduced_cov), F.T))), invGT)


def process_noise(position, quat, pose_cov, motion: MotionState,
                  covariance_scale: float = 1.0):
    """Scalar z-variance update + new MotionState.

    Translation Jacobian J_r = -R_BM^T (25); with the map frame unrotated,
    R_BM = R_robot^-1, so J_r = -R_robot and the update is the z-diagonal of
    J_r Sigma_pos J_r^T.
    """
    cov = jnp.asarray(pose_cov, jnp.float32) * covariance_scale
    reduced = reduced_covariance(quat, cov)
    rel = relative_covariance(position, quat, reduced, motion)
    pos_cov = rel[:3, :3]
    J_r = -quat_to_rotmat(quat)
    var_update = _mm(_mm(J_r, pos_cov), J_r.T)[2, 2]
    new_motion = MotionState(
        prev_position=jnp.asarray(position, jnp.float32),
        prev_quat=jnp.asarray(quat, jnp.float32),
        prev_reduced_cov=reduced,
    )
    return var_update, new_motion


def apply_process_noise(variance, var_update, invalid_variance: float = -10.0):
    """G_Mapvar_update (gpu_process.cu:540-547): add to every fused cell."""
    return jnp.where(variance != invalid_variance, variance + var_update,
                     variance)
