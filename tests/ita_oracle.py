"""Standalone NumPy oracle of the ITA accelerator's integer arithmetic.

This module is deliberately INDEPENDENT of drone_oa_iree_vit_accelerator_tpu
(pure NumPy, no package imports): it exists to break the round-1
verification circularity where ops/integer_ita.py was both the golden
model and the thing everything was verified against. It is a
transliteration of the accelerator arithmetic from the *external*
specifications recoverable in the reference repo:

- integer softmax (one-pass): reference models/ITA/QAT/ITA_softmax.py:29-77
  (B=8, eps_max = 32*8/2**8 = 1.0, power-of-two exp via right shift,
  floor reciprocal, uint8 out, fixed scale 1/255 zp 0);
- streaming "partial" softmax: PyITA's default hardware mode — the
  reference verifies against it with step4_QK(no_partial_softmax=False)
  (tests/export_and_validation_W_B.py:527) and reads the result from the
  A_partial_softmax attribute. The algorithm (ITA paper arXiv:2307.03493
  section III; the reference's own variable names exp_partial_sum /
  exp_partial_sum_inverse in ITA_softmax.py descend from it) processes
  each row in ITA_N=16-column groups with a running max, renormalizing
  the accumulated denominator by a right shift whenever the max grows;
- requantization: mult/shift/add per stage. Both rounding conventions
  found in the reference are exposed:
    'floor'   — the reference's own float emulation of ITA requant
                (scripts/export_model.py:132-135: x*mult, floor-div by
                2**shift, +zp, clamp);
    'half_up' — add 2**(shift-1) before the arithmetic shift (the PULP
                requant-shift convention the ITA RTL implements; the
                rounding term is folded into the hardware's add port).
  The two differ by at most 1 LSB, which is exactly why the reference's
  MAE <= 1 criterion cannot distinguish them (its verifier replays the
  math in float with round-half-even, custom_quantized_matmul,
  tests/export_and_validation_W_B.py:120-151, and still passes).
- hw-param derivation: frexp encoding of the effective scale
  (tests/export_and_validation_W_B.py:108-118) and int32 bias folding
  round(b/(s_in*s_w)) (:233-245).

The Transformer class mirrors PyITA's verification interface (step1_Qp ..
step6_O, feedforward_layer, result attributes Qp_requant .. FF2p_requant;
usage contract at reference tests/export_and_validation_W_B.py:518-555)
so the framework's stage-parity tests read the same way as the
reference's.
"""

from __future__ import annotations

import numpy as np

B_BITS = 8
RANGE_SCALE = 32
EPS_MAX = RANGE_SCALE * B_BITS / (2**B_BITS)  # == 1.0
ITA_N = 16  # PE group width of the streaming softmax
QMIN, QMAX = -128, 127
_INV_NUM = (2**B_BITS - 1) * (2**16)  # 16711680


# ---------------------------------------------------------------------------
# Requantization
# ---------------------------------------------------------------------------


def requant(acc, mult, shift, add=0, rounding="half_up"):
    """clamp((acc * mult) >> shift + add, -128, 127) on int64.

    rounding='half_up' adds 2**(shift-1) before the shift (hardware
    rounding); 'floor' is the plain arithmetic shift (reference
    scripts/export_model.py:132-135).
    """
    acc = np.asarray(acc, np.int64)
    mult = np.asarray(mult, np.int64)
    shift = np.asarray(shift, np.int64)
    prod = acc * mult
    if rounding == "half_up":
        prod = prod + np.where(shift > 0, 1 << np.maximum(shift - 1, 0), 0)
    elif rounding != "floor":
        raise ValueError(rounding)
    shifted = prod >> np.clip(shift, 0, 62)
    return np.clip(shifted + add, QMIN, QMAX).astype(np.int8)


def calculate_hw_params(effective_scale: float, bits: int = B_BITS):
    """(multiplier, shift) <- frexp(effective_scale), 8-bit multiplier
    (reference tests/export_and_validation_W_B.py:108-118)."""
    effective_scale = float(effective_scale)
    if effective_scale == 0.0:
        return 0, 0
    mantissa, exponent = np.frexp(effective_scale)
    return int(round(float(mantissa) * (2**bits))), int(bits - exponent)


def fold_bias(bias, s_in: float, s_w: float, out_features: int):
    """int32 bias folding: round(b / (s_in*s_w))
    (reference tests/export_and_validation_W_B.py:233-245)."""
    if bias is None:
        return np.zeros((out_features,), np.int32)
    b = np.asarray(bias, np.float64)
    return np.round(b / (float(s_in) * float(s_w))).astype(np.int32)


# ---------------------------------------------------------------------------
# Integer softmax — one-pass and streaming (partial)
# ---------------------------------------------------------------------------


def _exp2_shift(diff):
    """2**B >> round(diff * eps_max), saturating to 0 beyond B bits."""
    shift = np.floor(np.asarray(diff, np.float64) * EPS_MAX + 0.5).astype(
        np.int64
    )
    return np.where(shift > B_BITS, 0, (2**B_BITS) >> np.minimum(shift, B_BITS))


def ita_softmax(x_int, axis=-1):
    """One-pass integer softmax (PyITA step4 with no_partial_softmax=True;
    reference models/ITA/QAT/ITA_softmax.py:51-61). int in, uint8 out."""
    x = np.asarray(x_int, np.int64)
    m = np.max(x, axis=axis, keepdims=True)
    exp = _exp2_shift(m - x)
    denom = np.maximum(np.sum(exp, axis=axis, keepdims=True), 1)
    inv = _INV_NUM // denom  # exact integer floor division
    return ((exp * inv) >> 16).astype(np.uint8)


def ita_partial_softmax(x_int, width: int = ITA_N):
    """Streaming (partial) integer softmax over the LAST axis — PyITA's
    default hardware mode (A_partial_softmax).

    Each row is consumed in ``width``-column groups (ITA_N = 16 PE lanes):
    a running max M and an accumulated denominator are kept; when a group
    raises the max by d, the accumulated sum is renormalized by >> d
    (exactly what makes this mode differ from the one-pass softmax — the
    shift floors away low bits of earlier groups' contributions). The
    final probabilities use the global max and the streamed denominator.

    Deliberately written as the obvious SEQUENTIAL transliteration; the
    framework's vectorized implementations are tested against this.
    """
    x = np.asarray(x_int, np.int64)
    lead = x.shape[:-1]
    n = x.shape[-1]
    rows = x.reshape(-1, n)
    out = np.zeros_like(rows)
    for r in range(rows.shape[0]):
        row = rows[r]
        cur_max = None
        cur_sum = 0
        for g0 in range(0, n, width):
            grp = row[g0 : g0 + width]
            gmax = int(grp.max())
            if cur_max is None:
                cur_max = gmax
            elif gmax > cur_max:
                d = int(
                    np.floor((gmax - cur_max) * EPS_MAX + 0.5)
                )  # renormalize
                cur_sum >>= min(d, 63)
                cur_max = gmax
            cur_sum += int(np.sum(_exp2_shift(cur_max - grp)))
        denom = max(cur_sum, 1)
        inv = _INV_NUM // denom
        out[r] = (_exp2_shift(cur_max - row) * inv) >> 16
    return out.reshape(*lead, n).astype(np.uint8)


# ---------------------------------------------------------------------------
# Full pipeline (PyITA Transformer interface)
# ---------------------------------------------------------------------------


class Transformer:
    """PyITA-shaped golden pipeline: int8 attention + FFN, stage attrs.

    Tensors (all integer):
      Q, K, V, FF_in : (S, E) int8 activations (Q=K=V=FF_in=x for
                       self-attention as in the reference usage)
      Wq,Wk,Wv : (E, P) int8    Wo : (P, E) int8
      Wff : (E, F) int8         Wff2 : (F, E) int8
      Bq,Bk,Bv : (P,) int32     Bo : (E,) int32
      Bff : (F,) int32          Bff2 : (E,) int32
    quant_params: dict with per-stage {'mult','shift','add'} under keys
      q_proj, k_proj, v_proj, qk_matmul, av_matmul, out_proj, fc1, relu,
      fc2 (reference translate_torch_scales_to_hw_params naming).
    H > 1 splits P into H head slices (the reference's configs use H=1).
    """

    def __init__(
        self,
        S,
        P,
        E,
        F,
        H=1,
        *,
        Q,
        V,
        K,
        FF_in,
        Wq,
        Wk,
        Wv,
        Wo,
        Wff,
        Wff2,
        Bq,
        Bk,
        Bv,
        Bo,
        Bff,
        Bff2,
        quant_params,
        rounding="half_up",
        no_partial_softmax=False,
        ITA_N=ITA_N,
    ):
        self.S, self.P, self.E, self.F, self.H = S, P, E, F, H
        self.Q, self.K, self.V, self.FF_in = (
            np.asarray(t, np.int64) for t in (Q, K, V, FF_in)
        )
        self.Wq, self.Wk, self.Wv, self.Wo = (
            np.asarray(t, np.int64) for t in (Wq, Wk, Wv, Wo)
        )
        self.Wff, self.Wff2 = np.asarray(Wff, np.int64), np.asarray(Wff2, np.int64)
        self.Bq, self.Bk, self.Bv, self.Bo = (
            np.asarray(t, np.int64) for t in (Bq, Bk, Bv, Bo)
        )
        self.Bff, self.Bff2 = np.asarray(Bff, np.int64), np.asarray(Bff2, np.int64)
        self.qp = quant_params
        self.rounding = rounding
        self.no_partial_softmax = no_partial_softmax
        self.ita_n = ITA_N

    def _rq(self, acc, stage):
        p = self.qp[stage]
        return requant(
            acc, p["mult"], p["shift"], p.get("add", 0), self.rounding
        )

    def _heads(self, x):  # (S, P) -> (H, S, P/H)
        s, p = x.shape
        return x.reshape(s, self.H, p // self.H).transpose(1, 0, 2)

    def step1_Qp(self):
        self.Qp_requant = self._rq(self.Q @ self.Wq + self.Bq, "q_proj")
        return self.Qp_requant

    def step2_Kp(self):
        self.Kp_requant = self._rq(self.K @ self.Wk + self.Bk, "k_proj")
        return self.Kp_requant

    def step3_Vp(self):
        self.Vp_requant = self._rq(self.V @ self.Wv + self.Bv, "v_proj")
        return self.Vp_requant

    def step4_QK(self, no_partial_softmax=None):
        if no_partial_softmax is None:
            no_partial_softmax = self.no_partial_softmax
        qh = self._heads(self.Qp_requant.astype(np.int64))
        kh = self._heads(self.Kp_requant.astype(np.int64))
        logits = qh @ kh.transpose(0, 2, 1)  # (H, S, S); NO 1/sqrt(d)
        self.A_requant = self._rq(logits, "qk_matmul")
        a = self.A_requant.astype(np.int64)
        if no_partial_softmax:
            self.A_partial_softmax = ita_softmax(a)
        else:
            self.A_partial_softmax = ita_partial_softmax(a, self.ita_n)
        return self.A_partial_softmax

    def step5_AV(self):
        vh = self._heads(self.Vp_requant.astype(np.int64))
        ctx = self.A_partial_softmax.astype(np.int64) @ vh  # u8 x i8 -> i32+
        o = self._rq(ctx, "av_matmul")  # (H, S, P/H)
        h, s, d = o.shape
        self.O_soft_requant = o.transpose(1, 0, 2).reshape(s, h * d)
        return self.O_soft_requant

    def step6_O(self):
        acc = self.O_soft_requant.astype(np.int64) @ self.Wo + self.Bo
        self.Out_soft_requant = self._rq(acc, "out_proj")
        return self.Out_soft_requant

    def feedforward_layer(self):
        ff1 = self._rq(self.FF_in @ self.Wff + self.Bff, "fc1")
        relu = np.maximum(ff1.astype(np.int64), 0)
        self.FFp_requant = self._rq(relu, "relu")
        acc2 = self.FFp_requant.astype(np.int64) @ self.Wff2 + self.Bff2
        self.FF2p_requant = self._rq(acc2, "fc2")
        return self.FF2p_requant

    def run_attention(self, no_partial_softmax=None):
        self.step1_Qp()
        self.step2_Kp()
        self.step3_Vp()
        self.step4_QK(no_partial_softmax)
        self.step5_AV()
        return self.step6_O()
