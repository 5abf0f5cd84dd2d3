from quadrupedwholebodycontroller_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
)
from quadrupedwholebodycontroller_tpu.parallel.sweep import (  # noqa: F401
    sharded_sweep_step,
    sweep_metrics,
)
from quadrupedwholebodycontroller_tpu.parallel.flagship import (  # noqa: F401
    sharded_wbc_step,
)
