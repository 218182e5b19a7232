"""End-to-end training chain: synthetic data -> float train -> QAT ->
int8 artifact. Exercises SURVEY.md section 7 hard-part 5 (self-trained small
checkpoints driving the full QAT -> int8 -> parity chain)."""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu.core import ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG
from drone_oa_iree_vit_accelerator_tpu.models import params_io
from drone_oa_iree_vit_accelerator_tpu.train import dataset as D
from drone_oa_iree_vit_accelerator_tpu.train.qat_trainer import QATConfig, QATTrainer
from drone_oa_iree_vit_accelerator_tpu.train.trainer import TrainConfig, Trainer
from drone_oa_iree_vit_accelerator_tpu.utils.config import (
    parse_config_file,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    D.generate_synthetic(root, n_trajectories=3, steps=20, frame_stride=5)
    return root


def test_generate_and_load_dataset(synth_root):
    trajs = D.load_dataset(synth_root)
    assert len(trajs) == 3
    t = trajs[0]
    assert t.frames.shape == (20, 1, 60, 90)
    assert t.frames.dtype == np.uint8
    assert t.vel_des.shape == (20, 1)
    assert t.quat.shape == (20, 4)
    assert t.cmd_gt.shape == (20, 3)
    # Expert flies forward.
    assert t.cmd_gt[:, 0].mean() > 1.0
    # Frames contain actual obstacle returns somewhere in the set.
    assert max(tr.frames.max() for tr in trajs) > 0


def test_pad_batch_masks(synth_root):
    trajs = D.load_dataset(synth_root)
    short = trajs[0]._replace(
        frames=trajs[0].frames[:7],
        vel_des=trajs[0].vel_des[:7],
        quat=trajs[0].quat[:7],
        cmd_gt=trajs[0].cmd_gt[:7],
    )
    b = D.pad_batch([short, trajs[1]])
    assert b.frames.shape[0] == 2 and b.frames.shape[1] == 20
    assert b.mask[0].sum() == 7 and b.mask[1].sum() == 20


def test_float_training_reduces_loss(synth_root, tmp_path):
    tcfg = TrainConfig(
        dataset_dir=str(synth_root),
        workspace=str(tmp_path / "ws"),
        epochs=8,
        lr=3e-4,
        lr_warmup_epochs=1,
        batch_size=2,
        val_split=0.34,
        save_model_freq=4,
    )
    tr = Trainer(tcfg)
    result = tr.train()
    hist = result["history"]
    assert hist[-1]["train"] < hist[0]["train"]
    assert (tmp_path / "ws" / "model_final.npz").exists()
    assert (tmp_path / "ws" / "model_000004.npz").exists()
    assert (tmp_path / "ws" / "train_log.jsonl").exists()
    # Checkpoint round-trips.
    loaded = params_io.load_params(
        str(tmp_path / "ws" / "model_final.npz"), tr.params
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(loaded), jax.tree_util.tree_leaves(tr.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_qat_finetune_and_finalize(synth_root, tmp_path):
    tcfg = QATConfig(
        dataset_dir=str(synth_root),
        workspace=str(tmp_path / "qat_ws"),
        epochs=2,
        batch_size=2,
        val_split=0.34,
    )
    tr = QATTrainer(tcfg)
    result = tr.train()
    int_path = pathlib.Path(result["final_checkpoint"])
    assert int_path.exists()
    # Observers were actually calibrated by training.
    assert bool(tr.observers.attn[0].in_.initialized)
    assert float(tr.observers.attn[0].qk.max_val) != 0.0
    # Int8 artifact loads and drives the integer forward.
    ip = tr.load_int_params(int_path)
    frame = jnp.zeros((1, 1, 60, 90))
    from drone_oa_iree_vit_accelerator_tpu import quant as QZ

    cmd, _ = QZ.int8_forward(
        CFG, tr.params, ip, frame, jnp.ones((1, 1)),
        jnp.asarray([[1.0, 0, 0, 0]]),
    )
    assert bool(jnp.all(jnp.isfinite(cmd)))


def test_config_file_parsing(tmp_path):
    cfgf = tmp_path / "t.txt"
    cfgf.write_text("lr = 5e-4\nepochs = 3  # short\nmodel = ITA\nflag = true\n")
    vals = parse_config_file(str(cfgf))
    assert vals == {"lr": 5e-4, "epochs": 3, "model": "ITA", "flag": True}


def test_packaged_config_files_parse():
    import drone_oa_iree_vit_accelerator_tpu.train as T

    cfg_dir = pathlib.Path(T.__file__).parent / "config"
    train = parse_config_file(str(cfg_dir / "train.txt"))
    qat = parse_config_file(str(cfg_dir / "qat.txt"))
    assert train["lr"] == 1e-4 and train["epochs"] == 500
    assert qat["lr"] == 1e-5 and qat["epochs"] == 20


def test_trajectory_frames_sorted_numerically(tmp_path):
    """Timestamps >= 10 s must not break frame ordering (lexical sort
    would put '10.0' before '2.0')."""
    import csv

    from PIL import Image

    tdir = tmp_path / "traj"
    tdir.mkdir()
    stamps = [2.0, 9.5, 10.0, 11.5]
    with open(tdir / "data.csv", "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(["idx", "ts", "vel", "q1", "q2", "q3", "q4",
                     "px", "py", "pz", "vx", "vy", "vz"])
        for i, ts in enumerate(stamps):
            img = np.full((60, 90), i * 10, np.uint8)
            Image.fromarray(img).save(tdir / f"{ts:.3f}.png")
            wr.writerow([i, f"{ts:.3f}", 5.0, 1, 0, 0, 0, 0, 0, 0,
                         float(i), 0.0, 0.0])
    t = D.load_trajectory(tdir)
    # Frame pixel values must follow timestamp order 2.0 < 9.5 < 10 < 11.5.
    np.testing.assert_array_equal(t.frames[:, 0, 0, 0], [0, 10, 20, 30])
    np.testing.assert_array_equal(t.cmd_gt[:, 0], [0.0, 1.0, 2.0, 3.0])


def test_resume_state_roundtrip(synth_root, tmp_path):
    from drone_oa_iree_vit_accelerator_tpu.train.trainer import (
        TrainConfig,
        Trainer,
    )

    tcfg = TrainConfig(
        dataset_dir=str(synth_root), workspace=str(tmp_path / "ws"),
        epochs=4, batch_size=2, save_model_freq=2, lr_warmup_epochs=1,
    )
    tr = Trainer(tcfg)
    tr.train()
    assert (tmp_path / "ws" / "resume_state.npz").exists()

    # A fresh trainer resumes with the saved params + optimizer state.
    tr2 = Trainer(tcfg)
    next_epoch = tr2.load_resume_state()
    assert next_epoch == 4  # saved at epoch 3 (the last multiple of 2)
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(tr2.params),
        jax.tree_util.tree_leaves(tr.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Continuing from the restored state trains without error.
    tr2.tcfg = tcfg
    result = tr2.train(start_epoch=next_epoch)  # no epochs left -> no-op
    assert result["history"] == []
