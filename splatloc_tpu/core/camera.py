"""Camera model (pytree) and projection conventions.

TPU-native replacement for the reference's ``Camera`` container and OpenGL-style
projection-matrix plumbing (utils/camera_utils.py:29-139,
gaussian_splatting/utils/graphics_utils.py:72-93). Instead of carrying
transposed view/projection matrices, we carry the raw world-to-camera
transform + pinhole intrinsics and project directly:

    x_cam = w2c[:3,:3] @ x_world + w2c[:3,3]       (OpenCV: +z forward)
    u     = fx * x/z + (cx - 0.5)                  (pixel centers at integers)

The ``cx - 0.5`` matches the reference CUDA rasterizer's ``ndc2Pix`` pixel grid
exactly, so rendered images are pixel-aligned with diff-gaussian-rasterization.

Image width/height are static (hashable) so cameras can be jit arguments.
"""
from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from flax import struct

from splatloc_tpu.core import transforms


def focal2fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2 * math.tan(fov / 2))


@struct.dataclass
class Camera:
    """Pinhole camera with a world-to-camera pose. All array fields are
    dynamic pytree leaves; width/height are static."""
    w2c: jax.Array            # [4,4] world -> camera
    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)
    znear: float = struct.field(pytree_node=False, default=0.01)
    zfar: float = struct.field(pytree_node=False, default=100.0)

    @classmethod
    def create(cls, w2c, fx, fy, cx, cy, width, height, znear=0.01, zfar=100.0):
        f32 = jnp.float32
        return cls(w2c=jnp.asarray(w2c, f32), fx=f32(fx), fy=f32(fy),
                   cx=f32(cx), cy=f32(cy), width=int(width), height=int(height),
                   znear=float(znear), zfar=float(zfar))

    @property
    def c2w(self) -> jax.Array:
        return transforms.invert_se3(self.w2c)

    @property
    def camera_center(self) -> jax.Array:
        """World-space camera position (reference camera_utils.py:137-139)."""
        return self.c2w[:3, 3]

    @property
    def tanfovx(self) -> jax.Array:
        return (0.5 * self.width) / self.fx

    @property
    def tanfovy(self) -> jax.Array:
        return (0.5 * self.height) / self.fy

    @property
    def K(self) -> jax.Array:
        return jnp.array([[self.fx, 0, self.cx],
                          [0, self.fy, self.cy],
                          [0, 0, 1]], dtype=jnp.float32)

    def replace_pose(self, w2c: jax.Array) -> "Camera":
        return dataclasses.replace(self, w2c=jnp.asarray(w2c, jnp.float32))

    # -- projection -----------------------------------------------------

    def project(self, pts_w: jax.Array):
        """World points [N,3] -> (pixel_xy [N,2], view_z [N]).

        Pixel coordinates use the rasterizer's integer-center grid
        (u = fx*x/z + cx - 0.5).
        """
        p_view = pts_w @ self.w2c[:3, :3].T + self.w2c[:3, 3]
        z = p_view[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-8, 1e-8, z)
        u = self.fx * p_view[..., 0] / zs + (self.cx - 0.5)
        v = self.fy * p_view[..., 1] / zs + (self.cy - 0.5)
        return jnp.stack([u, v], axis=-1), z

    def backproject(self, uv: jax.Array, depth: jax.Array) -> jax.Array:
        """Pixel coords [...,2] (integer-center grid) + depth -> world points.

        Inverse of :meth:`project`; reference back-projection uses
        (u - cx) * d / fx on the same grid (gaussian_model.py:151-155 uses
        integer pixel indices with cx directly; we keep one consistent grid).
        """
        x = (uv[..., 0] - (self.cx - 0.5)) * depth / self.fx
        y = (uv[..., 1] - (self.cy - 0.5)) * depth / self.fy
        p_cam = jnp.stack([x, y, depth], axis=-1)
        c2w = self.c2w
        return p_cam @ c2w[:3, :3].T + c2w[:3, 3]
