"""Fused vitfly attention kernel vs the golden integer path — bit-exact.

Same contract as the ITA family's pallas-vs-golden tests: the kernel
(ops/pallas/vitfly_kernel.py, interpret mode on CPU) must reproduce
ops/integer_ita.vitfly_attention_f32 exactly on every block shape the
2-stage ITALSTM uses (stage 0: H=1, stage 1: H=2 — the reference's
MultiheadITAWithRequant head count, scripts/export_model.py:132-158),
and the full-model kernel serving path must match the XLA int8 path
bit-for-bit through the float glue.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
from drone_oa_iree_vit_accelerator_tpu.models import vitfly as VF
from drone_oa_iree_vit_accelerator_tpu.ops.integer_ita import (
    vitfly_attention_f32,
)
from drone_oa_iree_vit_accelerator_tpu.ops.pallas.vitfly_kernel import (
    vitfly_attention_block,
)
from drone_oa_iree_vit_accelerator_tpu.quant import vitfly_qat as VQ


@pytest.fixture(scope="module")
def converted():
    vcfg = VF.VITFLY_LSTM
    key = jax.random.PRNGKey(5)
    params = VF.init_params(vcfg, key)
    obs = VQ.VitflyObservers.init(vcfg)
    for i in range(3):
        frame = jax.random.uniform(jax.random.fold_in(key, i), (2, 1, 60, 90))
        _, _, obs = VQ.vitfly_qat_forward(
            vcfg, params, obs, frame, jnp.ones((2, 1)),
            jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (2, 1)),
        )
    vint = VQ.convert_vitfly_model(params, obs, vcfg)
    return vcfg, params, vint


@pytest.mark.parametrize("si", [0, 1])
def test_kernel_bit_exact_vs_golden(converted, si):
    """Every stage's block shape, H in {1, 2}: kernel == golden, exact."""
    vcfg, _, vint = converted
    sc = vcfg.stages[si]
    # Real token counts for this stage (see models/vitfly._stage_forward).
    hw = vcfg.img_hw
    for s in range(si + 1):
        st = vcfg.stages[s]
        hw = (
            (hw[0] + 2 * st.pad - st.patch) // st.stride + 1,
            (hw[1] + 2 * st.pad - st.patch) // st.stride + 1,
        )
    nq = hw[0] * hw[1]
    nkv = -(-hw[0] // sc.reduction) * -(-hw[1] // sc.reduction)
    c = sc.out_ch
    for li in range(sc.n_layers):
        p = vint["attn"][si][li]
        key = jax.random.fold_in(jax.random.PRNGKey(77), si * 10 + li)
        x_q = jax.random.normal(key, (2, nq, c), jnp.float32)
        x_kv = jax.random.normal(jax.random.fold_in(key, 1), (2, nkv, c))
        want = jax.vmap(lambda a, b: vitfly_attention_f32(a, b, p))(
            x_q, x_kv
        )
        got = vitfly_attention_block(x_q, x_kv, p, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_full_model_kernel_path_matches_int8(converted):
    """vitfly_int8_forward(use_kernel=True) == use_kernel=False through
    the full model (attention outputs are bit-equal, so the float glue
    downstream sees identical inputs)."""
    vcfg, params, vint = converted
    frame = jax.random.uniform(jax.random.PRNGKey(9), (1, 1, 60, 90))
    vel = jnp.ones((1, 1))
    quat = jnp.asarray([[1.0, 0, 0, 0]])
    st = M.zero_state(vcfg, 1)
    cmd_a, st_a = VQ.vitfly_int8_forward(
        vcfg, params, vint, frame, vel, quat, st
    )
    cmd_b, st_b = VQ.vitfly_int8_forward(
        vcfg, params, vint, frame, vel, quat, st,
        use_kernel=True, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(cmd_a), np.asarray(cmd_b))
    np.testing.assert_array_equal(np.asarray(st_a.h), np.asarray(st_b.h))


def test_serving_step_pallas_path(converted):
    """make_vitfly_serving_step('pallas') runs and matches the int8
    serving step to f32 roundoff (separate jit programs)."""
    from drone_oa_iree_vit_accelerator_tpu.pipeline.serve import (
        make_vitfly_serving_step,
    )

    vcfg, params, vint = converted
    img = jax.random.randint(jax.random.PRNGKey(3), (60, 90), 0, 256,
                             jnp.uint8)
    vel = jnp.float32(4.0)
    quat = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    sa = make_vitfly_serving_step(vcfg, "int8")
    sb = make_vitfly_serving_step(vcfg, "pallas")
    ca, _ = sa(params, vint, img, vel, jnp.float32(3.0), quat,
               M.zero_state(vcfg, 1))
    cb, _ = sb(params, vint, img, vel, jnp.float32(3.0), quat,
               M.zero_state(vcfg, 1))
    np.testing.assert_allclose(np.asarray(ca), np.asarray(cb),
                               rtol=1e-5, atol=1e-5)
