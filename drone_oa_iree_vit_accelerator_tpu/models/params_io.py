"""Parameter checkpoint I/O + torch state-dict conversion.

Two jobs (SURVEY.md section 7 hard-part 5 — the reference's checkpoints are
LFS-stripped, so both directions matter):

1. native .npz checkpoints of our parameter pytrees (flat path->array),
   used by the trainers;
2. a converter from reference-style torch ``state_dict``s
   (models/ITA_single_layer_upsample_shuffle/model.py naming) into our
   pytree, so a user-supplied trained .pth drops in. Accepts any mapping
   of name -> array-like (call ``{k: v.numpy() for ...}`` on a real torch
   state dict first, or pass tensors — ``np.asarray`` handles both).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import FusionKind, ModelConfig


# ---------------------------------------------------------------------------
# Flat npz checkpoints
# ---------------------------------------------------------------------------


def save_params(path: str, params: Any) -> None:
    """Save any parameter pytree (dicts, tuples, flax struct dataclasses)
    as a flat npz keyed by the jax key-path of each leaf."""
    leaves = jax.tree_util.tree_leaves_with_path(params)
    arrays = {}
    for i, (kp, leaf) in enumerate(leaves):
        # Prefix with the index: keeps ordering explicit and names unique.
        arrays[f"{i:04d}|{jax.tree_util.keystr(kp)}"] = np.asarray(leaf)
    np.savez(path, **arrays)


def load_params(path: str, like: Any) -> Any:
    """Load an npz checkpoint into the structure (treedef) of ``like``."""
    data = np.load(path)
    ordered = [data[k] for k in sorted(data.files, key=lambda s: int(s.split("|")[0]))]
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    if len(ordered) != len(like_leaves):
        raise ValueError(
            f"checkpoint has {len(ordered)} leaves, structure expects "
            f"{len(like_leaves)}"
        )
    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(a) for a in ordered]
    )


# ---------------------------------------------------------------------------
# Torch state-dict conversion
# ---------------------------------------------------------------------------


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def from_torch_state_dict(sd: Mapping[str, Any], cfg: ModelConfig) -> dict:
    """Convert a reference-model state dict to our parameter pytree.

    Handles both the flagship naming (attention_blocks.N.*,
    models/ITA_single_layer_upsample_shuffle/model.py:55-84) and the
    single-block naming (attention_block.*, models/ITA_single_layer/
    model.py:49-50). Linear weights transpose (out,in)->(in,out); LSTM
    weights transpose likewise; spectral-norm layers read weight_orig/u/v.
    """
    sd = dict(sd)

    def get(name):
        return _np(sd[name])

    def linear(name):
        return {"w": get(f"{name}.weight").T, "b": get(f"{name}.bias")}

    def sn_linear(name, out_dim, in_dim):
        if f"{name}.weight_orig" in sd:
            return {
                "w": get(f"{name}.weight_orig").T,
                "b": get(f"{name}.bias"),
                "u": get(f"{name}.weight_u"),
                "v": get(f"{name}.weight_v"),
            }
        # Plain linear (base ITA variant has no spectral norm).
        p = linear(name)
        p["u"] = np.zeros((out_dim,), np.float32)
        p["v"] = np.zeros((in_dim,), np.float32)
        return p

    def ln(name):
        return {"g": get(f"{name}.weight"), "b": get(f"{name}.bias")}

    multi = any(k.startswith("attention_blocks.") for k in sd)

    def attn_name(i):
        return f"attention_blocks.{i}" if multi else "attention_block"

    def ffn_name(i):
        return f"ffn_blocks.{i}" if multi else "ffn_block"

    def norm_names(i):
        for c1, c2 in (
            (f"norms1.{i}", f"norms2.{i}"),            # flagship
            (f"norm1_layers.{i}", f"norm2_layers.{i}"),  # base/upsample
            ("norm1", "norm2"),                          # single_layer
        ):
            if f"{c1}.weight" in sd:
                return c1, c2
        raise KeyError(f"no layer norms found for block {i}")

    blocks = []
    for i in range(cfg.num_layers):
        a, f, (n1, n2) = attn_name(i), ffn_name(i), norm_names(i)
        blocks.append(
            {
                "attn": {
                    "q": linear(f"{a}.q_proj"),
                    "k": linear(f"{a}.k_proj"),
                    "v": linear(f"{a}.v_proj"),
                    "o": linear(f"{a}.out_proj"),
                },
                "ln1": ln(n1),
                "ffn": {
                    "fc1": linear(f"{f}.fc1"),
                    "fc2": linear(f"{f}.fc2"),
                },
                "ln2": ln(n2),
            }
        )

    params = {
        "tokenizer": {
            "conv": {
                "w": _np(sd["tokenizer.conv.weight"]),
                "b": _np(sd["tokenizer.conv.bias"]),
            },
            "ln": ln("tokenizer.norm"),
        },
        "blocks": tuple(blocks),
        "decoder": sn_linear("decoder", cfg.decoder_out, cfg.decoder_in),
        "lstm": tuple(
            {
                "w_ih": get(f"lstm.weight_ih_l{i}").T,
                "w_hh": get(f"lstm.weight_hh_l{i}").T,
                "b_ih": get(f"lstm.bias_ih_l{i}"),
                "b_hh": get(f"lstm.bias_hh_l{i}"),
            }
            for i in range(cfg.lstm_layers)
        ),
        "fc2": sn_linear("nn_fc2", cfg.out_dim, cfg.lstm_hidden),
    }
    if cfg.fusion is FusionKind.PXSHUFFLE_UPSAMPLE:
        params["fusion"] = {
            "conv": {
                "w": _np(sd["down_sample.weight"]),
                "b": _np(sd["down_sample.bias"]),
            }
        }
    return _to_jnp(params)


def vitfly_from_torch_state_dict(sd: Mapping[str, Any], cfg=None) -> dict:
    """Convert an upstream vitfly ``LSTMNetVIT`` torch state dict to our
    vitfly parameter pytree (models/vitfly.py init_params structure).

    The upstream naming is the module tree the reference instantiates for
    its alt export path (reference scripts/export_model.py:40-240 — the
    float MixTransformerEncoderLayer spelling — and the checkpoint the
    reference loads in models/converter_to_pt.py:21-96):

        encoder_blocks.{s}.patchMerge.{cn1,layerNorm}
        encoder_blocks.{s}._attn.{i}.{cn1,ln1,keyValueExtractor,query,finalLayer}
        encoder_blocks.{s}._ffn.{i}.{mlp1,depthwise,mlp2}
        encoder_blocks.{s}._lNorm.{i}   (float)  /  ._lNorms.{i}  (ITA wrapper)
        down_sample / decoder (spectral norm) / lstm / nn_fc2 (spectral norm)

    Linear weights transpose (out,in)->(in,out); convs keep OIHW;
    spectral-norm layers read weight_orig/weight_u/weight_v (plain
    ``weight`` accepted with zero u/v, i.e. norm disabled at load).
    """
    from .vitfly import VITFLY_LSTM

    cfg = cfg or VITFLY_LSTM
    sd = dict(sd)

    def get(name):
        return _np(sd[name])

    def linear(name):
        return {"w": get(f"{name}.weight").T, "b": get(f"{name}.bias")}

    def conv(name):
        return {"w": get(f"{name}.weight"), "b": get(f"{name}.bias")}

    def ln(name):
        return {"g": get(f"{name}.weight"), "b": get(f"{name}.bias")}

    def sn_linear(name, out_dim, in_dim):
        if f"{name}.weight_orig" in sd:
            return {
                "w": get(f"{name}.weight_orig").T,
                "b": get(f"{name}.bias"),
                "u": get(f"{name}.weight_u"),
                "v": get(f"{name}.weight_v"),
            }
        p = linear(name)
        p["u"] = np.zeros((out_dim,), np.float32)
        p["v"] = np.zeros((in_dim,), np.float32)
        return p

    stages = []
    for s, sc in enumerate(cfg.stages):
        base = f"encoder_blocks.{s}"
        lnorm = "_lNorm" if f"{base}._lNorm.0.weight" in sd else "_lNorms"
        layers = []
        for i in range(sc.n_layers):
            a, f = f"{base}._attn.{i}", f"{base}._ffn.{i}"
            layers.append(
                {
                    "attn": {
                        "reduce_conv": conv(f"{a}.cn1"),
                        "reduce_ln": ln(f"{a}.ln1"),
                        "kv": linear(f"{a}.keyValueExtractor"),
                        "q": linear(f"{a}.query"),
                        "out": linear(f"{a}.finalLayer"),
                    },
                    "ffn": {
                        "mlp1": linear(f"{f}.mlp1"),
                        "dw": conv(f"{f}.depthwise"),
                        "mlp2": linear(f"{f}.mlp2"),
                    },
                    "ln": ln(f"{base}.{lnorm}.{i}"),
                }
            )
        stages.append(
            {
                "patch_conv": conv(f"{base}.patchMerge.cn1"),
                "patch_ln": ln(f"{base}.patchMerge.layerNorm"),
                "layers": tuple(layers),
            }
        )

    params = {
        "stages": tuple(stages),
        "fusion_conv": conv("down_sample"),
        "decoder": sn_linear("decoder", cfg.decoder_out, cfg.decoder_in),
        "lstm": tuple(
            {
                "w_ih": get(f"lstm.weight_ih_l{i}").T,
                "w_hh": get(f"lstm.weight_hh_l{i}").T,
                "b_ih": get(f"lstm.bias_ih_l{i}"),
                "b_hh": get(f"lstm.bias_hh_l{i}"),
            }
            for i in range(cfg.lstm_layers)
        ),
        "fc2": sn_linear("nn_fc2", cfg.out_dim, cfg.lstm_hidden),
    }
    return _to_jnp(params)


def _to_jnp(tree):
    if isinstance(tree, Mapping):
        return {k: _to_jnp(v) for k, v in tree.items()}
    if isinstance(tree, (tuple, list)):
        return tuple(_to_jnp(v) for v in tree)
    return jnp.asarray(tree)
