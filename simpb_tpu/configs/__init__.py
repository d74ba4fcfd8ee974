from .base import (  # noqa: F401
    CLASS_NAMES,
    HeadConfig,
    ModelConfig,
    TrainConfig,
    simpb_r101_1408x512,
    simpb_r50_704x256,
)
