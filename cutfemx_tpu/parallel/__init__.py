from .operator import (make_device_mesh, pad_to_multiple, shard_instances,
                       sharded_matfree_operator, sharded_cut_poisson_step)  # noqa: F401
