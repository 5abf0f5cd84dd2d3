from quadrupedwholebodycontroller_tpu.control.wbc import (  # noqa: F401
    Reference,
    RobotObservation,
    WBCCarry,
    WBCOutput,
    init_carry,
    wbc_step,
)
