from splatloc_tpu.dist.shard import (make_mesh, scene_sharding,
                                     frames_sharding, shard_scene,
                                     make_sharded_mapping_step)
from splatloc_tpu.dist.sharded_raster import rasterize_sharded
