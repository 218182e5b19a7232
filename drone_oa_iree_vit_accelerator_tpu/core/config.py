"""Model-family configuration.

The reference hardcodes hyperparameters as in-code constants per model
variant directory (e.g. ``models/ITA_single_layer_upsample_shuffle/model.py:44``
sets E,S,P,F,H = 64,128,192,256,1). Here the whole zoo is one config-driven
implementation; each reference variant is a frozen ``ModelConfig`` instance.

Reference variants covered (reference file:line for dims):

- ``ITA`` (base):            2 layers, E=128    models/ITA/QAT/model.py:30
- ``ITA_single_layer``:      1 layer,  E=64     models/ITA_single_layer/model.py:39
- ``ITA_upsample_shuffle``:  2 layers, E=128    models/ITA_upsample_shuffle/model.py:38
- ``ITA_single_layer_upsample_shuffle`` (deployed flagship): variable depth
  (default 1), E=64, two-branch pixel-shuffle/upsample fusion
  models/ITA_single_layer_upsample_shuffle/model.py:40-84
"""

from __future__ import annotations

import dataclasses
import enum


class FusionKind(str, enum.Enum):
    """How encoder tokens are turned into the decoder's flat feature vector.

    FLATTEN:  tokens (B,S,E) are flattened to (B, S*E) directly
              (models/ITA/QAT/model.py:80, models/ITA_single_layer/model.py:97).
    PXSHUFFLE_UPSAMPLE: tokens are reshaped to a (B,E,H,W) map, run through
              a PixelShuffle(2) branch and a bilinear-upsample branch,
              concatenated, and reduced by a 3x3 conv to 9 channels
              (models/ITA_single_layer_upsample_shuffle/model.py:71-123).
    """

    FLATTEN = "flatten"
    PXSHUFFLE_UPSAMPLE = "pxshuffle_upsample"


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static hyperparameters of one ITAViTLSTM variant.

    Dim names follow the reference/ITA convention:
    E = embedding dim, S = sequence length (token count), P = attention
    projection dim, F = FFN hidden dim, H = attention heads.
    """

    name: str
    num_layers: int = 1
    E: int = 64
    S: int = 128
    P: int = 192
    F: int = 256
    H: int = 1

    # Input frame and tokenizer (models/ITA/layers.py:7-27).
    img_hw: tuple[int, int] = (60, 90)
    patch_size: int = 7
    patch_stride: int = 2
    patch_padding: int = 3
    token_hw: tuple[int, int] = (8, 16)  # tokenizer's fixed bilinear output

    # Fusion + decoder head.
    fusion: FusionKind = FusionKind.PXSHUFFLE_UPSAMPLE
    fusion_out_channels: int = 9  # conv 80->9 (flagship model.py:78)
    decoder_out: int = 512
    spectral_norm_decoder: bool = True

    # LSTM head (identical across all variants, model.py:83-84).
    lstm_in_extra: int = 5  # +1 desired-vel scalar, +4 quaternion
    lstm_hidden: int = 128
    lstm_layers: int = 3
    lstm_dropout: float = 0.1
    out_dim: int = 3

    @property
    def head_dim(self) -> int:
        return self.P // self.H

    @property
    def fusion_hw(self) -> tuple[int, int]:
        """Spatial size after the 2x fusion upsample (flagship: 16x32)."""
        return (self.token_hw[0] * 2, self.token_hw[1] * 2)

    @property
    def decoder_in(self) -> int:
        if self.fusion is FusionKind.FLATTEN:
            return self.S * self.E
        h, w = self.fusion_hw
        return self.fusion_out_channels * h * w

    @property
    def lstm_in(self) -> int:
        return self.decoder_out + self.lstm_in_extra

    def __post_init__(self) -> None:
        th, tw = self.token_hw
        if th * tw != self.S:
            raise ValueError(f"token grid {self.token_hw} != S={self.S}")
        if self.P % self.H != 0:
            raise ValueError(f"P={self.P} not divisible by H={self.H}")


ITA_BASE = ModelConfig(
    name="ITA",
    num_layers=2,
    E=128,
    fusion=FusionKind.FLATTEN,
    spectral_norm_decoder=False,
)

ITA_SINGLE_LAYER = ModelConfig(
    name="ITA_single_layer",
    num_layers=1,
    E=64,
    fusion=FusionKind.FLATTEN,
    spectral_norm_decoder=True,
)

ITA_UPSAMPLE_SHUFFLE = ModelConfig(
    name="ITA_upsample_shuffle",
    num_layers=2,
    E=128,
    fusion=FusionKind.FLATTEN,  # fusion layers exist but are unused in forward
    spectral_norm_decoder=True,
)

# The deployed model: what runs on the Kria in the reference, and what our
# Pallas serving path optimizes for.
ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE = ModelConfig(
    name="ITA_single_layer_upsample_shuffle",
    num_layers=1,
    E=64,
    fusion=FusionKind.PXSHUFFLE_UPSAMPLE,
    spectral_norm_decoder=True,
)

MODEL_ZOO: dict[str, ModelConfig] = {
    cfg.name: cfg
    for cfg in (
        ITA_BASE,
        ITA_SINGLE_LAYER,
        ITA_UPSAMPLE_SHUFFLE,
        ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE,
    )
}
