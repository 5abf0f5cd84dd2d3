from quadrupedwholebodycontroller_tpu.models.robot_model import RobotModel  # noqa: F401
from quadrupedwholebodycontroller_tpu.models.anymal import anymal_d_model  # noqa: F401
