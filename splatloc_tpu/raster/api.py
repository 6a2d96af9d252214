"""Top-level differentiable rasterization API.

``rasterize`` is the functional core (fully differentiable, jittable);
``render`` mirrors the reference's render() dict contract
(gaussian_splatting/gaussian_renderer/__init__.py:13-141) on a GaussianScene.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from splatloc_tpu.core.camera import Camera
from splatloc_tpu.raster import binning, blend, project
from splatloc_tpu.raster.types import RasterConfig, RenderOutput


def rasterize(
    means3d: jax.Array,        # [N,3]
    scales: jax.Array,         # [N,3] activated
    quats: jax.Array,          # [N,4]
    opacities: jax.Array,      # [N] activated (sigmoid'd)
    colors: jax.Array,         # [N,C] precomputed channels (RGB + extras)
    camera: Camera,
    cfg: RasterConfig = RasterConfig(),
    bg: jax.Array | None = None,
    alive: jax.Array | None = None,
    means2d_offset: jax.Array | None = None,
    scaling_modifier: float = 1.0,
) -> RenderOutput:
    """Differentiable Gaussian rasterization.

    ``means2d_offset`` [N,2] (normally zeros) is added to the projected pixel
    centers; taking the gradient w.r.t. it yields the screen-space means2D
    gradient the reference consumes for densification stats
    (gaussian_splatting/gaussian_renderer/__init__.py:32-35,
    scene/gaussian_model.py:677-679).
    """
    N = means3d.shape[0]
    C = colors.shape[-1]
    if bg is None:
        bg = jnp.zeros((C,), jnp.float32)

    proj = project.project_gaussians(means3d, scales, quats, camera, cfg,
                                     alive=alive,
                                     scaling_modifier=scaling_modifier,
                                     opacities=jax.lax.stop_gradient(
                                         opacities))
    if means2d_offset is not None:
        proj = proj.replace(u=proj.u + means2d_offset[:, 0],
                            v=proj.v + means2d_offset[:, 1])

    order = binning.depth_sort(proj)

    if cfg.use_pallas:
        from splatloc_tpu.raster import pallas_raster
        interpret = jax.default_backend() == "cpu"
        acc, n_dropped, n_trunc, n_vis_dropped = pallas_raster.blend_pairs(
            (proj.u, proj.v), (proj.conic_a, proj.conic_b, proj.conic_c),
            opacities, proj.depth, colors,
            (jax.lax.stop_gradient(proj.radius_x),
             jax.lax.stop_gradient(proj.radius_y)),
            jax.lax.stop_gradient(proj.visible.astype(jnp.float32)),
            order.astype(jnp.float32),
            camera.width, camera.height, cfg, interpret)
        image, depth, alpha = pallas_raster.assemble_image(
            acc, camera.width, camera.height, cfg, bg)
    else:
        lists, _counts, n_dropped = binning.tile_lists(
            proj, order, camera.width, camera.height, cfg)
        n_trunc = jnp.zeros((), jnp.int32)
        n_vis_dropped = jnp.zeros((), jnp.int32)
        image, depth, alpha = blend.blend_image(
            lists,
            proj.xy[order],
            proj.conic[order],
            opacities[order],
            colors[order],
            proj.depth[order],
            camera.width, camera.height, cfg, bg)

    return RenderOutput(image=image, depth=depth, alpha=alpha,
                        radii=proj.radius.astype(jnp.int32), means2d=proj.xy,
                        n_dropped=n_dropped, n_trunc=n_trunc,
                        n_vis_dropped=n_vis_dropped)


def render(scene, camera: Camera, cfg: RasterConfig = RasterConfig(),
           bg: jax.Array | None = None, scaling_modifier: float = 1.0,
           override_color: jax.Array | None = None,
           means2d_offset: jax.Array | None = None,
           sh_degree: int | None = None):
    """Render a GaussianScene: RGB (SH-converted, reference convert_SHs_python
    path) + raw kp_score as channel 3. Returns a dict matching the reference
    render() keys."""
    from splatloc_tpu.core import sh as sh_mod

    deg = scene.sh_degree if sh_degree is None else sh_degree
    if override_color is None:
        rgb = sh_mod.sh_to_color(deg, scene.features(), scene.xyz,
                                 camera.camera_center)
    else:
        rgb = override_color
    colors = jnp.concatenate([rgb, scene.kp_score], axis=-1)  # kp_score [M,1]
    if bg is None:
        bg = jnp.zeros((colors.shape[-1],), jnp.float32)

    out = rasterize(scene.xyz, scene.scaling_activated(), scene.rotation,
                    scene.opacity_activated(), colors, camera, cfg, bg=bg,
                    alive=scene.alive, means2d_offset=means2d_offset,
                    scaling_modifier=scaling_modifier)
    return {
        "render": out.image[..., :3],
        "kp_prob": out.image[..., 3],
        "visibility_filter": out.radii > 0,
        "radii": out.radii,
        "depth": out.depth,
        "opacity": out.alpha,
        "means2d": out.means2d,
    }


def render_features(scene, camera: Camera, feature_colors: jax.Array,
                    cfg: RasterConfig = RasterConfig(),
                    bg: jax.Array | None = None):
    """Composite arbitrary per-Gaussian feature channels (e.g. descriptor
    features decoded at Gaussian centers) into a feature image — the
    BASELINE "descriptor-channel rendering" capability. feature_colors
    [N, K]; K + 8 <= 32 for the Pallas path.

    Returns dict(feature_map [H,W,K], depth, alpha).
    """
    out = rasterize(scene.xyz, scene.scaling_activated(), scene.rotation,
                    scene.opacity_activated(), feature_colors, camera, cfg,
                    bg=bg, alive=scene.alive)
    return {"feature_map": out.image, "depth": out.depth,
            "opacity": out.alpha}
