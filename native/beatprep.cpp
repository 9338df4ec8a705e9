// Native beat-preprocessing core for the host data pipeline.
//
// Implements the per-example hot loop of the datasets (reference
// codes/dataset/tianchi.py:84-211 / ptbv2.py:39-144) in C++: derive the four
// augmented limb leads from (I, II), slice one heartbeat, jointly min-max
// normalize across leads, estimate the per-lead noise sigma from the second
// half of the T->P segment, and zero-pad to the fixed 512-sample frame.
//
// The reference runs this in 16 torch DataLoader worker processes
// (train_net.py:27); here one C call per example removes the Python inner
// loops so a single host thread can keep a TPU fed. Exposed via a plain
// extern "C" ABI consumed with ctypes (data/native.py).
//
// Build: native/build.sh  (g++ -O3 -shared -fPIC)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {
constexpr int kSeqLen = 512;
constexpr int kNumLeads12 = 12;

// III = II - I; aVR = -0.5(I+II); aVL = I - 0.5 II; aVF = II - 0.5 I
// (tianchi.py:88-93). Input rec8 is row-major [8, T].
inline void derive_row(const double* rec8, int T, int t, double* out12) {
  const double I = rec8[0 * T + t];
  const double II = rec8[1 * T + t];
  for (int l = 0; l < 8; ++l) out12[l] = rec8[l * T + t];
  out12[8] = II - I;
  out12[9] = -0.5 * (I + II);
  out12[10] = I - 0.5 * II;
  out12[11] = II - 0.5 * I;
}
}  // namespace

extern "C" {

// Process one heartbeat of an 8-lead record.
//   rec8        [8 * T] row-major raw record (float64, Tianchi int-valued ok)
//   T           record length
//   p_on, end_point   beat window [p_on, end_point) in record coordinates
//   tp_mid, tp_end    noise region [tp_mid, tp_end) in BEAT coordinates
//                     (callers pass (rois[5][0]+rois[5][1])/2, rois[5][1])
//   out12       [12 * 512] float32, normalized beat zero-padded to 512
//   noise_sigma [12] float32 per-lead noise std (population std, ddof=0)
// Returns 0 on success, nonzero on bad arguments.
int ecg_prep_beat(const double* rec8, int T, long p_on, long end_point,
                  long tp_mid, long tp_end, float* out12, float* noise_sigma) {
  if (!rec8 || !out12 || !noise_sigma) return 1;
  if (p_on < 0 || end_point > T || p_on >= end_point) return 2;
  const long beat_len = end_point - p_on;

  // pass 1: joint min/max across all 12 leads of the beat window
  double mn = 1e300, mx = -1e300;
  double row[kNumLeads12];
  for (long t = p_on; t < end_point; ++t) {
    derive_row(rec8, T, static_cast<int>(t), row);
    for (int l = 0; l < kNumLeads12; ++l) {
      mn = std::min(mn, row[l]);
      mx = std::max(mx, row[l]);
    }
  }
  const double scale = (mx > mn) ? 1.0 / (mx - mn) : 0.0;

  // pass 2: normalize + write padded frame; accumulate noise stats
  const long n_out = std::min<long>(beat_len, kSeqLen);
  double sum[kNumLeads12] = {0}, sumsq[kNumLeads12] = {0};
  const long lo = std::max<long>(tp_mid, 0);
  const long hi = std::min<long>(tp_end, beat_len);
  const long n_noise = std::max<long>(hi - lo, 0);

  std::memset(out12, 0, sizeof(float) * kNumLeads12 * kSeqLen);
  for (long t = 0; t < beat_len; ++t) {
    derive_row(rec8, T, static_cast<int>(p_on + t), row);
    for (int l = 0; l < kNumLeads12; ++l) {
      const double v = (row[l] - mn) * scale;
      if (t < n_out) out12[l * kSeqLen + t] = static_cast<float>(v);
      if (t >= lo && t < hi) {
        sum[l] += v;
        sumsq[l] += v * v;
      }
    }
  }
  for (int l = 0; l < kNumLeads12; ++l) {
    if (n_noise > 0) {
      const double mean = sum[l] / n_noise;
      const double var = std::max(sumsq[l] / n_noise - mean * mean, 0.0);
      noise_sigma[l] = static_cast<float>(std::sqrt(var));
    } else {
      noise_sigma[l] = 0.0f;
    }
  }
  return 0;
}

// Batched variant: process `n` beats (possibly from different records) in one
// call. recs: array of n pointers; windows: [n * 4] (p_on, end, tp_mid,
// tp_end); outputs are [n * 12 * 512] and [n * 12].
int ecg_prep_batch(const double* const* recs, const int* Ts, const long* windows,
                   int n, float* out, float* sigmas) {
  for (int i = 0; i < n; ++i) {
    const long* w = windows + 4 * i;
    int rc = ecg_prep_beat(recs[i], Ts[i], w[0], w[1], w[2], w[3],
                           out + static_cast<long>(i) * kNumLeads12 * kSeqLen,
                           sigmas + static_cast<long>(i) * kNumLeads12);
    if (rc != 0) return rc;
  }
  return 0;
}

int ecg_prep_abi_version() { return 1; }

}  // extern "C"
