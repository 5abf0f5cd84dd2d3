from quadrupedwholebodycontroller_tpu.sim.world import (  # noqa: F401
    SimParams,
    SimState,
    init_sim_state,
    observe,
    sim_control_period,
)
from quadrupedwholebodycontroller_tpu.sim.rollout import (  # noqa: F401
    closed_loop_rollout,
)
