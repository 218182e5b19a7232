// ITA integer attention as an XLA FFI custom call (CPU).
//
// The native-object dispatch mechanism of the reference, reproduced the
// XLA way: the reference compiles ITA_dispatch.c to an object file and
// splices it into the program as a flow.dispatch via a transform-dialect
// spec (reference samples/inference_udp_FPGA_custom_dispatch/plugin/
// ITA_dispatch.c + ITA_spec.mlir). Here the same boundary is an XLA FFI
// target: this C++ implements the full ITA integer attention pipeline
// bit-exactly (same spec as ops/integer_ita.py and the Pallas kernel)
// and is invoked from inside a jitted program on the CPU backend —
// demonstrating that the framework's "accelerator region" boundary can
// bind to an external native object, not only to Pallas.
//
// H = 1 (every reference config). Requant: half-up rounding, zp 0.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -I<jax.ffi.include_dir()> \
//        -o libita_ffi.so ita_ffi.cpp

#include <algorithm>
#include <cstdint>
#include <vector>

#include "xla/ffi/api/ffi.h"

namespace ffi = xla::ffi;

namespace {

inline int8_t requant(int64_t acc, int32_t mult, int32_t shift) {
  int64_t prod = acc * static_cast<int64_t>(mult);
  if (shift > 0) prod += int64_t{1} << (shift - 1);
  // Clamp shift to [0, 62]: a negative shift (degenerate scale >= 2^bits)
  // would be UB in C++; ops/quant.requant clips to [0, 31] on int32 —
  // identical results wherever |prod| < 2^31 (all supported configs).
  int64_t out = prod >> std::clamp(shift, 0, 62);
  return static_cast<int8_t>(std::clamp<int64_t>(out, -128, 127));
}

// y[s,n] = requant(sum_k x[s,k] * w[k,n] + b[n])
void int_linear(const int8_t* x, const int8_t* w, const int32_t* b,
                int S, int K, int N, int32_t mult, int32_t shift,
                int8_t* y) {
  for (int s = 0; s < S; ++s) {
    for (int n = 0; n < N; ++n) {
      int64_t acc = b[n];
      for (int k = 0; k < K; ++k) {
        acc += static_cast<int64_t>(x[s * K + k]) * w[k * N + n];
      }
      y[s * N + n] = requant(acc, mult, shift);
    }
  }
}

// ITA integer softmax row (see ops/ita_softmax.py for the derivation).
void ita_softmax_row(const int8_t* row, int n, int32_t* out_u8) {
  int32_t m = -128;
  for (int i = 0; i < n; ++i) m = std::max<int32_t>(m, row[i]);
  int64_t denom = 0;
  std::vector<int32_t> exp(n);
  for (int i = 0; i < n; ++i) {
    int32_t shift = m - row[i];  // eps_max == 1.0
    exp[i] = shift > 8 ? 0 : (256 >> shift);
    denom += exp[i];
  }
  denom = std::max<int64_t>(denom, 1);
  int64_t inv = (int64_t{255} << 16) / denom;
  for (int i = 0; i < n; ++i) {
    out_u8[i] = static_cast<int32_t>((exp[i] * inv) >> 16);
  }
}

ffi::Error ItaAttentionImpl(
    ffi::Buffer<ffi::S8> x,                      // (S, E)
    ffi::Buffer<ffi::S8> wq, ffi::Buffer<ffi::S32> bq,  // (E,P), (P)
    ffi::Buffer<ffi::S8> wk, ffi::Buffer<ffi::S32> bk,
    ffi::Buffer<ffi::S8> wv, ffi::Buffer<ffi::S32> bv,
    ffi::Buffer<ffi::S8> wo, ffi::Buffer<ffi::S32> bo,  // (P,E), (E)
    ffi::Buffer<ffi::S32> iscal,                 // (12,) packed mult/shift
    ffi::ResultBuffer<ffi::S8> out) {            // (S, E)
  const int S = static_cast<int>(x.dimensions()[0]);
  const int E = static_cast<int>(x.dimensions()[1]);
  const int P = static_cast<int>(wq.dimensions()[1]);
  const int32_t* sc = iscal.typed_data();

  std::vector<int8_t> qp(S * P), kp(S * P), vp(S * P);
  int_linear(x.typed_data(), wq.typed_data(), bq.typed_data(), S, E, P,
             sc[0], sc[1], qp.data());
  int_linear(x.typed_data(), wk.typed_data(), bk.typed_data(), S, E, P,
             sc[2], sc[3], kp.data());
  int_linear(x.typed_data(), wv.typed_data(), bv.typed_data(), S, E, P,
             sc[4], sc[5], vp.data());

  // Logits + requant + integer softmax, row by row.
  std::vector<int32_t> probs(S * S);
  std::vector<int8_t> a_row(S);
  for (int i = 0; i < S; ++i) {
    for (int j = 0; j < S; ++j) {
      int64_t acc = 0;
      for (int d = 0; d < P; ++d) {
        acc += static_cast<int64_t>(qp[i * P + d]) * kp[j * P + d];
      }
      a_row[j] = requant(acc, sc[6], sc[7]);
    }
    ita_softmax_row(a_row.data(), S, &probs[i * S]);
  }

  // Context (u8 x i8 -> i32) + requant, then out projection.
  std::vector<int8_t> ctx(S * P);
  for (int i = 0; i < S; ++i) {
    for (int d = 0; d < P; ++d) {
      int64_t acc = 0;
      for (int j = 0; j < S; ++j) {
        acc += static_cast<int64_t>(probs[i * S + j]) * vp[j * P + d];
      }
      ctx[i * P + d] = requant(acc, sc[8], sc[9]);
    }
  }
  int_linear(ctx.data(), wo.typed_data(), bo.typed_data(), S, P, E,
             sc[10], sc[11], out->typed_data());
  return ffi::Error::Success();
}

}  // namespace

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    ItaAttentionInt8, ItaAttentionImpl,
    ffi::Ffi::Bind()
        .Arg<ffi::Buffer<ffi::S8>>()
        .Arg<ffi::Buffer<ffi::S8>>()
        .Arg<ffi::Buffer<ffi::S32>>()
        .Arg<ffi::Buffer<ffi::S8>>()
        .Arg<ffi::Buffer<ffi::S32>>()
        .Arg<ffi::Buffer<ffi::S8>>()
        .Arg<ffi::Buffer<ffi::S32>>()
        .Arg<ffi::Buffer<ffi::S8>>()
        .Arg<ffi::Buffer<ffi::S32>>()
        .Arg<ffi::Buffer<ffi::S32>>()
        .Ret<ffi::Buffer<ffi::S8>>());
