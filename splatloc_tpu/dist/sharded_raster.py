"""Multi-chip rasterization: tile axis sharded over the device mesh.

The "sequence parallelism" of this framework (SURVEY.md §5): image tiles
shard across devices; every device runs the Pallas pair-walk kernel on its
tile rows against the (replicated) packed pair data. The backward kernel's
per-pair gradient shards are disjoint by tile and combine with one psum over
ICI; shard_map's reverse rule all-reduces the replicated-input cotangents
automatically. Forward/gradients are bit-identical to the single-device path
(tested on an 8-device host mesh).

For the complementary *Gaussian* axis sharding (parameters/optimizer state),
see dist.shard — pjit layouts over the 'gauss' axis with XLA-inserted
collectives.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from splatloc_tpu.core.camera import Camera
from splatloc_tpu.raster import binning, pallas_raster, project
from splatloc_tpu.raster.types import RasterConfig, RenderOutput


def rasterize_sharded(means3d, scales, quats, opacities, colors,
                      camera: Camera, cfg: RasterConfig, mesh,
                      axis: str = "tile", bg=None, alive=None,
                      interpret: bool | None = None) -> RenderOutput:
    """Tile-sharded differentiable rasterization (same API/semantics as
    raster.rasterize with use_pallas)."""
    C = colors.shape[-1]
    if bg is None:
        bg = jnp.zeros((C,), jnp.float32)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    proj = project.project_gaussians(means3d, scales, quats, camera, cfg,
                                     alive=alive)
    order = binning.depth_sort(proj)
    acc, n_dropped, n_trunc = pallas_raster.blend_pairs(
        proj.xy, proj.conic, opacities, proj.depth, colors,
        jax.lax.stop_gradient(proj.radius),
        jax.lax.stop_gradient(proj.visible.astype(jnp.float32)),
        order.astype(jnp.float32),
        camera.width, camera.height, cfg, interpret, mesh, axis)
    image, depth, alpha = pallas_raster.assemble_image(
        acc, camera.width, camera.height, cfg, bg)
    return RenderOutput(image=image, depth=depth, alpha=alpha,
                        radii=proj.radius.astype(jnp.int32), means2d=proj.xy,
                        n_dropped=n_dropped, n_trunc=n_trunc)
