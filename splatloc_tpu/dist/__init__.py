from splatloc_tpu.dist.shard import (make_mesh, scene_sharding,
                                     frames_sharding, shard_scene,
                                     make_sharded_mapping_step)
from splatloc_tpu.dist.sharded_raster import rasterize_sharded
from splatloc_tpu.dist.multihost import (initialize, is_primary,
                                         primary_only, global_mesh)
