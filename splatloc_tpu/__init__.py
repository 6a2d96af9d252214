"""splatloc_tpu — a TPU-native (JAX/XLA/Pallas) 3D-Gaussian-Splatting visual
localization framework.

A from-scratch re-design of the capabilities of zhaihongjia/SplatLoc
(reference at /root/reference) for TPU hardware:

- ``core``    math: rotations, SE(3), spherical harmonics, cameras, projection
- ``raster``  differentiable tile rasterizer (project -> depth sort -> tile bin
              -> cumprod/matmul blend), autodiff to all Gaussian params and to
              the 6-DoF camera pose; Pallas kernel for the hot blend
- ``knn``     simple-knn equivalent (Morton-sorted windowed 3-NN)
- ``scene``   GaussianScene pytree with padded-capacity densify/clone/split/prune
- ``fields``  multiresolution hash encoding + descriptor-field MLP
- ``data``    Replica / 12-Scenes loaders and the generated_folder contract
- ``match``   Hungarian matching, PnP+RANSAC, frustum gather, pose refinement
- ``dist``    device-mesh sharding: tile/Gaussian axis sharding, ring compositor
- ``train``   scene mapping + descriptor decoder training loops
- ``eval``    pose / rendering / landmark-selection evaluation and reports
- ``cli``     YAML config (inherit_from schema) + entry points
"""

__version__ = "0.1.0"
