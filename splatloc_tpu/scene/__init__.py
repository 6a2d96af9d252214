from splatloc_tpu.scene.gaussians import GaussianScene
from splatloc_tpu.scene import densify, init_rgbd, optim, ply
