"""Kinect-style depth sensor noise model.

Capability parity with the reference's measurement model (src/misc2.h:20-47):
  depth_std_dev(z)        = sigma_depth * z^2   (quadratic disparity noise)
  depth_covariance(z)     = (stddev * scale)^2 + epsilon
  point_information_matrix: inverse covariances of a backprojected point in
  (x, y, z) camera coordinates, with pixel-raster lateral noise.
"""
from __future__ import annotations

import jax.numpy as jnp

# Default matches the reference param `sigma_depth` = 0.01: ±3 sigma ≈ 9 cm at 1.75 m
# (reference: src/parameter_server.cpp, misc2.h:20-28).
DEFAULT_SIGMA_DEPTH = 0.01
DEPTH_COV_SCALE = 1.0  # reference multiplies stddev by a fixed scale of 1


def depth_std_dev(z: jnp.ndarray, sigma_depth: float = DEFAULT_SIGMA_DEPTH) -> jnp.ndarray:
    return sigma_depth * z * z


def depth_covariance(z: jnp.ndarray, sigma_depth: float = DEFAULT_SIGMA_DEPTH) -> jnp.ndarray:
    sd = depth_std_dev(z, sigma_depth) * DEPTH_COV_SCALE
    return sd * sd + 1e-9


def lateral_covariance(z: jnp.ndarray, focal: float) -> jnp.ndarray:
    """Variance of x (or y) from one-pixel raster quantization at depth z."""
    raster_stddev = z / focal  # one pixel backprojected
    # Uniform over a pixel -> variance (w^2)/12 with w = raster; the reference
    # uses raster_cov = (raster_stddev)^2 / 9 (3-sigma within a pixel).
    return (raster_stddev * raster_stddev) / 9.0 + 1e-12


def point_information_matrix(z: jnp.ndarray, fx: float, fy: float,
                             sigma_depth: float = DEFAULT_SIGMA_DEPTH) -> jnp.ndarray:
    """Diagonal 3x3 information (inverse covariance) of a backprojected point.

    Mirrors the semantics of src/misc2.h:37-47: lateral (x, y) variance from
    pixel quantization, depth variance quadratic in z. Returns (..., 3, 3).
    """
    inv = 1.0 / point_covariance_diag(z, fx, fy, sigma_depth)
    return inv[..., None, :] * jnp.eye(3, dtype=inv.dtype)


def point_covariance_diag(z: jnp.ndarray, fx: float, fy: float,
                          sigma_depth: float = DEFAULT_SIGMA_DEPTH) -> jnp.ndarray:
    """Diagonal (..., 3) of the point covariance — cheaper than full matrices."""
    return jnp.stack(
        [lateral_covariance(z, fx), lateral_covariance(z, fy), depth_covariance(z, sigma_depth)],
        axis=-1,
    )
