"""Multi-chip rasterization: tile axis sharded over the device mesh.

The "sequence parallelism" of this framework (SURVEY.md §5): image tile ROWS
shard across devices. Each device bins (Gaussian, tile) pairs ONLY for its
own tile rows (rects clipped to its row range), gathers only its own pair
attributes, and runs the Pallas pair-walk kernels on its shard — nothing
pair-sized is replicated or communicated. Only the O(N) per-Gaussian prep
(projection, depth sort, the packed attribute table) is replicated. In the
backward, each device reduces its per-pair grad slab to per-Gaussian sums
locally, so the only collective is a psum of the [N, rows] reduction over
ICI (~6 MB at 100k Gaussians vs ~280 MB for the pair-grad slab a naive
design would all-reduce; asserted on the compiled HLO in
tests/test_dist.py::test_sharded_backward_comm_volume). Forward/gradients
match the single-device path to float eps (tested on an 8-device host
mesh).

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
                                     alive=alive,
                                     opacities=jax.lax.stop_gradient(
                                         opacities))
    order = binning.depth_sort(proj)
    acc, n_dropped, n_trunc, n_vis_dropped = pallas_raster.blend_pairs(
        (proj.u, proj.v), (proj.conic_a, proj.conic_b, proj.conic_c),
        opacities, proj.depth, colors,
        (jax.lax.stop_gradient(proj.radius_x),
         jax.lax.stop_gradient(proj.radius_y)),
        jax.lax.stop_gradient(proj.visible.astype(jnp.float32)),
        order.astype(jnp.float32),
        camera.width, camera.height, cfg, interpret, mesh, axis)
    image, depth, alpha = pallas_raster.assemble_image(
        acc, camera.width, camera.height, cfg, bg)
    return RenderOutput(image=image, depth=depth, alpha=alpha,
                        radii=proj.radius.astype(jnp.int32), means2d=proj.xy,
                        n_dropped=n_dropped, n_trunc=n_trunc,
                        n_vis_dropped=n_vis_dropped)
