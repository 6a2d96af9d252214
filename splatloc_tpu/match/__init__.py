from splatloc_tpu.match.hungarian import hungarian_solve, auction_assignment
from splatloc_tpu.match.pnp import solve_pnp_ransac
from splatloc_tpu.match.frustum import (frustum_key_points, backproject_mask,
                                        nearest_neighbor)
