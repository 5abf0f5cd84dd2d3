from quadrupedwholebodycontroller_tpu.planner.gait import (  # noqa: F401
    PlannerState,
    init_planner_state,
    planner_step,
)
