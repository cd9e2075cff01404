"""Device-mesh parallelism: mesh construction, sharding specs, and the
pjit-compiled data-parallel train/eval steps.

TPU-native replacement for the reference's ``torch.nn.DataParallel``
scatter/gather (SURVEY.md §2.9): the batch axis is sharded over the mesh's
"data" axis, parameters are replicated, and XLA inserts the gradient psum
over ICI. Multi-host scaling goes through ``jax.distributed.initialize`` +
the same shardings (collectives ride ICI within a slice, DCN across).
"""

from stlpose_tpu.parallel.mesh import (get_mesh, data_sharding,
                                       replicated_sharding, shard_batch)
from stlpose_tpu.parallel.steps import (make_train_step, make_eval_step,
                                        make_infer_fn, MetricAccumulator)
