"""AOT export of the serving step — the .vmfb analog.

The reference deploys by exporting PyTorch -> ONNX -> MLIR ->
iree-compile -> .vmfb (SURVEY.md section 3.3). The TPU-native equivalent is
jax.export: the jitted serving step serializes to a portable StableHLO
artifact that reloads and executes without any Python model code —
one file, no intermediate formats.

    python -m drone_oa_iree_vit_accelerator_tpu.pipeline.aot \
        --out model.jaxexport [--path pallas|int8|f32]

The artifact bundles (a) the serialized computation and (b) the
parameter pytrees (npz), mirroring how a .vmfb carries its constants.
"""

from __future__ import annotations

import io
import json
import pathlib
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from ..core.config import ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE, MODEL_ZOO, ModelConfig
from ..models import params_io, vit_lstm as M
from . import wire
from .serve import make_serving_step


def _register_mega_serialization() -> None:
    """jax.export needs custom pytree containers registered by name;
    the kernel-params NamedTuples are registered once, idempotent."""
    from ..ops.pallas.flatten_kernel import FlattenKernelParams
    from ..ops.pallas.model_kernel import FlagshipKernelParams

    for cls, name in (
        (FlagshipKernelParams, "doa.FlagshipKernelParams"),
        (FlattenKernelParams, "doa.FlattenKernelParams"),
    ):
        try:
            jax_export.register_namedtuple_serialization(
                cls, serialized_name=name
            )
        except ValueError:
            pass  # already registered in this process


def _make_kernel_params(cfg: ModelConfig, params, int_params):
    """Megakernel operand builder matching the config's fusion kind."""
    from ..core.config import FusionKind

    if cfg.fusion is FusionKind.FLATTEN:
        from ..ops.pallas.flatten_kernel import make_flatten_kernel_params

        return make_flatten_kernel_params(cfg, params, int_params)
    from ..ops.pallas.model_kernel import make_flagship_kernel_params

    return make_flagship_kernel_params(cfg, params, int_params)


def _example_args(cfg: ModelConfig):
    return (
        jnp.zeros(wire.IMAGE_SHAPE, jnp.uint8),
        jnp.float32(1.0),
        jnp.float32(5.0),
        jnp.zeros((4,), jnp.float32),
        M.zero_state(cfg, 1),
    )


def export_serving_step(
    out_path: str | pathlib.Path,
    cfg: ModelConfig = ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE,
    params: dict | None = None,
    int_params: dict | None = None,
    path: str = "pallas",
) -> pathlib.Path:
    """Serialize the full serving step + parameters into one artifact.

    ``path='mega'`` exports the whole-model megakernel configuration: the
    params slot of the serialized computation carries the precomputed
    FlagshipKernelParams operand pytree (weights already packed/quantized)
    instead of the raw model params.
    """
    if params is None:
        params = M.init_params(cfg, jax.random.PRNGKey(0))
    if int_params is None:
        from .serve import _calibrate_random

        int_params = _calibrate_random(cfg, params)
    if path == "mega":
        _register_mega_serialization()
        params = _make_kernel_params(cfg, params, int_params)

    step = make_serving_step(cfg, path)
    # jax.export only serializes standard pytree containers; flatten the
    # int-param structs (flax dataclasses with static auxdata) to a leaf
    # tuple at the export boundary and rebuild inside.
    ip_leaves, ip_treedef = jax.tree_util.tree_flatten(int_params)
    example = _example_args(cfg)

    def step_flat(params, ip_leaves, image, vel, pos_x, quat, h, c):
        ip = jax.tree_util.tree_unflatten(ip_treedef, list(ip_leaves))
        cmd, st = step(params, ip, image, vel, pos_x, quat, M.LSTMState(h, c))
        return cmd, st.h, st.c

    state = example[-1]
    args = (params, tuple(ip_leaves), *example[:-1], state.h, state.c)
    exported = jax_export.export(jax.jit(step_flat))(*args)

    out_path = pathlib.Path(out_path)
    with zipfile.ZipFile(out_path, "w") as zf:
        zf.writestr("computation.bin", exported.serialize())
        for name, tree in (("params", params), ("int_params", int_params)):
            buf = io.BytesIO()
            leaves = jax.tree_util.tree_leaves_with_path(tree)
            np.savez(
                buf,
                **{
                    f"{i:04d}|{jax.tree_util.keystr(kp)}": np.asarray(l)
                    for i, (kp, l) in enumerate(leaves)
                },
            )
            zf.writestr(f"{name}.npz", buf.getvalue())
        zf.writestr(
            "meta.json",
            json.dumps(
                {
                    "model": cfg.name,
                    "path": path,
                    "platforms": list(exported.platforms),
                    "wire": {"request": wire.REQUEST_SIZE, "reply": wire.REPLY_SIZE},
                }
            ),
        )
    return out_path


def _load_tree(zf, name: str, like):
    """Rebuild a parameter pytree from an artifact npz using a LIKE tree
    for structure + dtypes (bfloat16 round-trips as raw void bytes)."""
    data = np.load(io.BytesIO(zf.read(name)))
    ordered = [
        data[k]
        for k in sorted(data.files, key=lambda s: int(s.split("|")[0]))
    ]
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    leaves = []
    for a, ll in zip(ordered, like_leaves):
        if a.dtype.kind == "V":
            a = a.view(np.dtype(str(jnp.asarray(ll).dtype)))
        leaves.append(jnp.asarray(a))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _load_vitfly(zf, meta: dict):
    """load_serving_step branch for vitfly artifacts."""
    from ..models import vitfly as VF

    exported = jax_export.deserialize(zf.read("computation.bin"))
    raw = VF.init_params(VF.VITFLY_LSTM, jax.random.PRNGKey(0))
    params = _load_tree(zf, "params.npz", raw)
    vint = _load_tree(zf, "int_params.npz", _calibrate_vitfly(raw))
    ip_leaves = tuple(jax.tree_util.tree_leaves(vint))

    def step(image_u8, vel, pos_x, quat, state):
        cmd, h, c = exported.call(
            params, ip_leaves, image_u8, vel, pos_x, quat, state.h, state.c
        )
        return cmd, M.LSTMState(h, c)

    return step, params, vint, meta


def _calibrate_vitfly(params) -> dict:
    """One-forward observer calibration for the vitfly family (enough
    for structure/like-tree purposes and random-weight smoke exports)."""
    from ..models import vitfly as VF
    from ..quant import vitfly_qat as VQ

    vcfg = VF.VITFLY_LSTM
    obs = VQ.VitflyObservers.init(vcfg)
    _, _, obs = VQ.vitfly_qat_forward(
        vcfg, params, obs,
        jnp.full((1, 1, 60, 90), 0.5, jnp.float32),
        jnp.ones((1, 1), jnp.float32),
        jnp.asarray([[1.0, 0, 0, 0]], jnp.float32),
    )
    return VQ.convert_vitfly_model(params, obs, vcfg)


def export_vitfly_step(
    out_path: str | pathlib.Path,
    params: dict | None = None,
    vint_params: dict | None = None,
    path: str = "int8",
) -> pathlib.Path:
    """AOT-export the vitfly (upstream ITALSTM) serving step — the analog
    of the reference's iree-turbine CompiledITALSTM export
    (scripts/export_model.py:261-283), as one jax.export artifact."""
    from ..models import vitfly as VF
    from .serve import make_vitfly_serving_step

    vcfg = VF.VITFLY_LSTM
    if params is None:
        params = VF.init_params(vcfg, jax.random.PRNGKey(0))
    if vint_params is None:
        vint_params = _calibrate_vitfly(params)
    step = make_vitfly_serving_step(vcfg, path)

    ip_leaves, ip_treedef = jax.tree_util.tree_flatten(vint_params)
    example = (
        jnp.zeros(wire.IMAGE_SHAPE, jnp.uint8),
        jnp.float32(1.0),
        jnp.float32(5.0),
        jnp.zeros((4,), jnp.float32),
        M.zero_state(vcfg, 1),
    )

    def step_flat(params, ip_leaves, image, vel, pos_x, quat, h, c):
        ip = jax.tree_util.tree_unflatten(ip_treedef, list(ip_leaves))
        cmd, st = step(params, ip, image, vel, pos_x, quat, M.LSTMState(h, c))
        return cmd, st.h, st.c

    state = example[-1]
    args = (params, tuple(ip_leaves), *example[:-1], state.h, state.c)
    exported = jax_export.export(jax.jit(step_flat))(*args)

    out_path = pathlib.Path(out_path)
    with zipfile.ZipFile(out_path, "w") as zf:
        zf.writestr("computation.bin", exported.serialize())
        for name, tree in (("params", params), ("int_params", vint_params)):
            buf = io.BytesIO()
            leaves = jax.tree_util.tree_leaves_with_path(tree)
            np.savez(
                buf,
                **{
                    f"{i:04d}|{jax.tree_util.keystr(kp)}": np.asarray(l)
                    for i, (kp, l) in enumerate(leaves)
                },
            )
            zf.writestr(f"{name}.npz", buf.getvalue())
        zf.writestr(
            "meta.json",
            json.dumps(
                {
                    "model": "vitfly_lstm",
                    "path": path,
                    "platforms": list(exported.platforms),
                    "wire": {
                        "request": wire.REQUEST_SIZE,
                        "reply": wire.REPLY_SIZE,
                    },
                }
            ),
        )
    return out_path


def load_serving_step(artifact: str | pathlib.Path):
    """Reload an exported artifact; returns (step_fn, params, int_params,
    meta). step_fn(image_u8, vel, pos_x, quat, state) -> (cmd, state).
    Handles both the ITA zoo configs and the vitfly family."""
    with zipfile.ZipFile(artifact) as zf:
        meta = json.loads(zf.read("meta.json"))
        if meta["model"] == "vitfly_lstm":
            return _load_vitfly(zf, meta)
        cfg = MODEL_ZOO[meta["model"]]
        if meta["path"] == "mega":
            _register_mega_serialization()
        exported = jax_export.deserialize(zf.read("computation.bin"))

        load_tree = lambda name, like: _load_tree(zf, name, like)

        # int_params are always bundled (the f32 computation was traced
        # with their leaves in the signature too, even though unused).
        from .serve import _calibrate_random

        raw_params = M.init_params(cfg, jax.random.PRNGKey(0))
        if meta["path"] == "mega":
            params_like = _make_kernel_params(
                cfg, raw_params, _calibrate_random(cfg, raw_params)
            )
        else:
            params_like = raw_params
        params = load_tree("params.npz", params_like)
        int_params = load_tree(
            "int_params.npz",
            _calibrate_random(cfg, raw_params),
        )

    ip_leaves = tuple(jax.tree_util.tree_leaves(int_params))

    def step(image_u8, vel, pos_x, quat, state):
        cmd, h, c = exported.call(
            params, ip_leaves, image_u8, vel, pos_x, quat, state.h, state.c
        )
        return cmd, M.LSTMState(h, c)

    return step, params, int_params, meta


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="model.jaxexport")
    ap.add_argument("--path", default="pallas", choices=["mega", "pallas", "int8", "f32"])
    ap.add_argument("--model", default="ITA_single_layer_upsample_shuffle")
    ap.add_argument("--params", default=None, help="float checkpoint .npz")
    ap.add_argument("--backend", default=None)
    args = ap.parse_args()
    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    cfg = MODEL_ZOO[args.model]
    params = None
    if args.params:
        params = params_io.load_params(
            args.params, M.init_params(cfg, jax.random.PRNGKey(0))
        )
    p = export_serving_step(args.out, cfg, params=params, path=args.path)
    print(f"exported {args.path} serving step to {p} ({p.stat().st_size} bytes)")
