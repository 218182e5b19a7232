"""C++ FFI custom-call ITA attention vs the jnp golden model (bit-exact).

The analog of the reference's dummy-dispatch pipeline test
(SURVEY.md section 4.4): an external native object is spliced into the
compiled graph and must agree with the golden model exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drone_oa_iree_vit_accelerator_tpu.core import ITA_SINGLE_LAYER_UPSAMPLE_SHUFFLE as CFG
from drone_oa_iree_vit_accelerator_tpu.models import vit_lstm as M
from drone_oa_iree_vit_accelerator_tpu.ops import integer_ita as II
from drone_oa_iree_vit_accelerator_tpu import quant as QZ


@pytest.fixture(scope="module")
def int_attn():
    key = jax.random.PRNGKey(3)
    params = M.init_params(CFG, key)
    obs = QZ.QATObservers.init(CFG.num_layers)
    x = 0.5 * jax.random.normal(key, (2, CFG.S, CFG.E))
    _, oa = QZ.attention_qat(x, params["blocks"][0]["attn"], obs.attn[0], CFG.H)
    return QZ.convert_attention(params["blocks"][0]["attn"], oa, CFG.H)


def test_ffi_attention_bit_exact_vs_golden(int_attn):
    from drone_oa_iree_vit_accelerator_tpu.native.ffi import ita_attention_ffi

    key = jax.random.PRNGKey(9)
    x_i8 = jax.random.randint(key, (CFG.S, CFG.E), -128, 128, jnp.int8)
    got = ita_attention_ffi(x_i8, int_attn)
    ref, _ = II.ita_attention_int8(x_i8, int_attn)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_ffi_attention_inside_jit(int_attn):
    from drone_oa_iree_vit_accelerator_tpu.native.ffi import ita_attention_ffi

    @jax.jit
    def fused(x_i8, p):
        y = ita_attention_ffi(x_i8, p)
        return jnp.sum(y.astype(jnp.int32))  # custom call inside a program

    x_i8 = jax.random.randint(jax.random.PRNGKey(11), (CFG.S, CFG.E), -128, 128, jnp.int8)
    got = int(fused(x_i8, int_attn))
    ref = int(jnp.sum(II.ita_attention_int8(x_i8, int_attn)[0].astype(jnp.int32)))
    assert got == ref


def test_ffi_saturation_cases(int_attn):
    from drone_oa_iree_vit_accelerator_tpu.native.ffi import ita_attention_ffi

    for fill in (-128, 0, 127):
        x_i8 = jnp.full((CFG.S, CFG.E), fill, jnp.int8)
        got = ita_attention_ffi(x_i8, int_attn)
        ref, _ = II.ita_attention_int8(x_i8, int_attn)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
