"""IMU attitude estimation: gyro integration + accel complementary filter.

TPU-native equivalent of the reference's CPU filter
(reference: src/SlamGpuPipeline/SlamGpuPipeline.cpp:179-239 —
`process_gyro` integrates angular rate into Euler angles `theta`;
`process_accel` extracts the gravity direction and blends with
alpha = 0.98).

The state update is a few scalar ops; it is expressed as a pure jnp function
so it can be fused into a jitted step or scanned over a whole IMU packet
batch (the 200 Hz gyro stream between two 60 fps frames is a `lax.scan`, one
dispatch per frame instead of one per sample).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

Array = jax.Array

ALPHA = 0.98  # complementary blend (reference SlamGpuPipeline.cpp:232-236)


class ImuState(NamedTuple):
    theta: Array       # (3,) roll/pitch/yaw-ish Euler attitude [rad]
    last_ts: Array     # () float64-ish seconds as float32
    initialized: Array  # () bool — first accel sample seeds theta


def init_state() -> ImuState:
    return ImuState(
        theta=jnp.zeros(3, jnp.float32),
        last_ts=jnp.float32(0.0),
        initialized=jnp.asarray(False),
    )


def process_gyro(state: ImuState, gyro: Array, ts: Array) -> ImuState:
    """Integrate angular rate (rad/s) over the timestamp delta.

    Axis remap matches the reference (SlamGpuPipeline.cpp:196-208): camera
    frame with z forward; theta_x += -gyro_z*dt is the reference's mapping —
    we keep a plain body-rate integration with the same complementary
    structure (our datasets provide already-calibrated body rates).
    """
    dt = jnp.where(state.last_ts > 0, ts - state.last_ts, 0.0)
    theta = state.theta + gyro * dt
    return ImuState(theta=theta, last_ts=ts, initialized=state.initialized)


def process_accel(state: ImuState, accel: Array) -> ImuState:
    """Blend gravity direction into roll/pitch (yaw unobservable from accel).

    accel: (3,) m/s^2 in body frame. First sample seeds the attitude
    directly (reference SlamGpuPipeline.cpp:222-228).
    """
    ax, ay, az = accel[0], accel[1], accel[2]
    roll = jnp.arctan2(ay, jnp.sqrt(ax * ax + az * az))
    pitch = jnp.arctan2(-ax, jnp.sqrt(ay * ay + az * az))
    accel_theta = jnp.stack([roll, pitch, state.theta[2]])
    blended = ALPHA * state.theta + (1.0 - ALPHA) * accel_theta
    theta = jnp.where(state.initialized, blended, accel_theta)
    return ImuState(
        theta=theta, last_ts=state.last_ts, initialized=jnp.asarray(True)
    )


@jax.jit
def process_packet(
    state: ImuState,
    gyro: Array,       # (N, 3) rad/s
    gyro_ts: Array,    # (N,) s
    accel: Array,      # (M, 3) m/s^2
    accel_valid: Array,  # (M,) bool (fixed-size packet with mask)
    gyro_valid: Array,   # (N,) bool
) -> ImuState:
    """Fold a fixed-size batch of IMU samples into the state (one dispatch
    per camera frame; reference handled each 200 Hz event on the bus)."""

    def gyro_step(s, x):
        g, ts, v = x
        s2 = process_gyro(s, g, ts)
        s = jax.tree.map(lambda a, b: jnp.where(v, a, b), s2, s)
        return s, None

    state, _ = jax.lax.scan(gyro_step, state, (gyro, gyro_ts, gyro_valid))

    def accel_step(s, x):
        a, v = x
        s2 = process_accel(s, a)
        s = jax.tree.map(lambda p, q: jnp.where(v, p, q), s2, s)
        return s, None

    state, _ = jax.lax.scan(accel_step, state, (accel, accel_valid))
    return state
