from . import layers, params_io, vit_lstm, vitfly
from .vit_lstm import LSTMState, forward, init_params, zero_state

__all__ = [
    "layers",
    "params_io",
    "vit_lstm",
    "vitfly",
    "LSTMState",
    "forward",
    "init_params",
    "zero_state",
]
