from .config import (
    ModelConfig,
    FusionKind,
    ITA_BASE,
    ITA_SINGLE_LAYER,
    ITA_UPSAMPLE_SHUFFLE,
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE,
    MODEL_ZOO,
)

__all__ = [
    "ModelConfig",
    "FusionKind",
    "ITA_BASE",
    "ITA_SINGLE_LAYER",
    "ITA_UPSAMPLE_SHUFFLE",
    "ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE",
    "MODEL_ZOO",
]
