from neural_imaging_tpu.parallel.mesh import (batch_sharding, make_mesh, replicate,  # noqa: F401
                                              replicated_sharding, shard_batch)
from neural_imaging_tpu.parallel import multihost, train  # noqa: F401
