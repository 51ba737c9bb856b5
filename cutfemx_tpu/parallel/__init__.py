from .operator import (make_device_mesh, pad_to_multiple, shard_instances,
                       sharded_matfree_operator, sharded_cut_poisson_step)  # noqa: F401
from .halo import HaloOperator, build_slab_partition  # noqa: F401
from .spipeline import (ShardedCutProblem, SlabContext,  # noqa: F401
                        cut_poisson_builder)
