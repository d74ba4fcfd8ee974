from .backbone import FPN, DenseDepthNet, ResNet  # noqa: F401
from .detector import SimPB  # noqa: F401
from .head import SimPBHead  # noqa: F401
from .instance_bank import InstanceBank, TemporalState  # noqa: F401
