from .mesh import make_mesh
from .sharding import (pose_eval_sharded, mapping_step_sharded,
                       multi_scene_occ_update)

__all__ = ["make_mesh", "pose_eval_sharded", "mapping_step_sharded",
           "multi_scene_occ_update"]
