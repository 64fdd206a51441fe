// Native host-side data loader for whisper_burn_tpu.
//
// TPU-native counterpart of the reference's host-side Rust pieces: WAV
// decode (src/audio/io.rs), polyphase resampling (src/audio/resample.rs,
// rubato there), and Q4_0 checkpoint repacking (the transpose/unpack step
// our gguf/repack.py performs). The device runtime itself needs no native
// code — XLA:TPU + Pallas/Mosaic replace the reference's vendored
// cubecl-wgpu layer (SURVEY §2.5) — but at serving scale the *host* is the
// feeder: hundreds of audio streams decoded, resampled and framed on CPU.
// These paths are exposed through a plain C ABI consumed via ctypes
// (whisper_burn_tpu/native_host.py), with pure-Python fallbacks.
//
// Build: `make -C native` (or cmake; see native/Makefile).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Q4_0 repack: GGUF blocks -> qw int8 [K, N] (codes - 8) + scales f32 [K/32, N]
// ---------------------------------------------------------------------------

static inline float f16_to_f32(uint16_t h) {
  uint32_t sign = (uint32_t)(h >> 15) << 31;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t mant = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;
    } else {  // subnormal: normalize
      int e = -1;
      do {
        mant <<= 1;
        e++;
      } while (!(mant & 0x400));
      mant &= 0x3FF;
      bits = sign | ((uint32_t)(127 - 15 - e) << 23) | (mant << 13);
    }
  } else if (exp == 0x1F) {
    bits = sign | 0x7F800000u | (mant << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float out;
  std::memcpy(&out, &bits, 4);
  return out;
}

// raw: n_out rows of (k_in/32) 18-byte blocks. Outputs are column-major
// relative to the GGUF layout: qw[k * n_out + n], scales[(k/32) * n_out + n].
int wh_repack_q4(const uint8_t* raw, int64_t n_out, int64_t k_in,
                 int8_t* qw, float* scales, int n_threads) {
  if (k_in % 32 != 0) return -1;
  const int64_t blocks_per_row = k_in / 32;
  if (n_threads <= 0) {
    n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 1;
  }

  auto work = [&](int64_t row_begin, int64_t row_end) {
    for (int64_t n = row_begin; n < row_end; ++n) {
      const uint8_t* row = raw + n * blocks_per_row * 18;
      for (int64_t blk = 0; blk < blocks_per_row; ++blk) {
        const uint8_t* p = row + blk * 18;
        uint16_t h;
        std::memcpy(&h, p, 2);
        scales[blk * n_out + n] = f16_to_f32(h);
        const int64_t k0 = blk * 32;
        for (int i = 0; i < 16; ++i) {
          const uint8_t byte = p[2 + i];
          // elem i in the low nibble, elem i+16 in the high nibble
          qw[(k0 + i) * n_out + n] = (int8_t)((byte & 0x0F) - 8);
          qw[(k0 + i + 16) * n_out + n] = (int8_t)((byte >> 4) - 8);
        }
      }
    }
  };

  std::vector<std::thread> threads;
  const int64_t chunk = (n_out + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n_out, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
  return 0;
}

// ---------------------------------------------------------------------------
// WAV decode: RIFF chunks, PCM 8/16/24/32-bit + float32, channel-mean downmix
// ---------------------------------------------------------------------------

// Returns sample count (mono) or a negative error; *sample_rate is filled.
// out == nullptr -> size query only.
int64_t wh_load_wav(const char* path, float* out, int64_t out_capacity,
                    int32_t* sample_rate) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  uint8_t hdr[12];
  if (std::fread(hdr, 1, 12, f) != 12 || std::memcmp(hdr, "RIFF", 4) ||
      std::memcmp(hdr + 8, "WAVE", 4)) {
    std::fclose(f);
    return -2;
  }

  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  std::vector<uint8_t> data;
  bool have_fmt = false, have_data = false;

  uint8_t chunk_hdr[8];
  while (std::fread(chunk_hdr, 1, 8, f) == 8) {
    uint32_t size;
    std::memcpy(&size, chunk_hdr + 4, 4);
    if (!std::memcmp(chunk_hdr, "fmt ", 4)) {
      std::vector<uint8_t> fmt(size);
      if (std::fread(fmt.data(), 1, size, f) != size) break;
      std::memcpy(&format, fmt.data() + 0, 2);
      std::memcpy(&channels, fmt.data() + 2, 2);
      std::memcpy(&rate, fmt.data() + 4, 4);
      std::memcpy(&bits, fmt.data() + 14, 2);
      have_fmt = true;
    } else if (!std::memcmp(chunk_hdr, "data", 4)) {
      data.resize(size);
      if (std::fread(data.data(), 1, size, f) != size) break;
      have_data = true;
    } else {
      std::fseek(f, (long)(size + (size & 1)), SEEK_CUR);  // chunks are padded
    }
  }
  std::fclose(f);
  if (!have_fmt || !have_data || channels == 0) return -3;
  if (format == 0xFFFE) format = 1;  // WAVE_FORMAT_EXTENSIBLE: assume PCM
  *sample_rate = (int32_t)rate;

  const int64_t bytes_per_sample = bits / 8;
  const int64_t n_frames = (int64_t)data.size() / (bytes_per_sample * channels);
  if (out == nullptr) return n_frames;
  if (n_frames > out_capacity) return -4;

  const uint8_t* p = data.data();
  for (int64_t i = 0; i < n_frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* s = p + (i * channels + c) * bytes_per_sample;
      double v = 0.0;
      if (format == 3 && bits == 32) {  // float PCM
        float fv;
        std::memcpy(&fv, s, 4);
        v = fv;
      } else if (bits == 8) {
        v = ((int)s[0] - 128) / 128.0;
      } else if (bits == 16) {
        int16_t iv;
        std::memcpy(&iv, s, 2);
        v = iv / 32768.0;
      } else if (bits == 24) {
        int32_t iv = (int32_t)(s[0] | (s[1] << 8) | (s[2] << 16));
        if (iv & 0x800000) iv -= 0x1000000;
        v = iv / 8388608.0;
      } else if (bits == 32) {
        int32_t iv;
        std::memcpy(&iv, s, 4);
        v = iv / 2147483648.0;
      } else {
        return -5;
      }
      acc += v;
    }
    out[i] = (float)(acc / channels);
  }
  return n_frames;
}

// ---------------------------------------------------------------------------
// Polyphase resampling (windowed-sinc, Kaiser beta=5.0 — scipy-compatible
// filter design: 2*10*max(up,down)+1 taps, cutoff 1/max(up,down))
// ---------------------------------------------------------------------------

static double bessel_i0(double x) {
  // power series; converges fast for the beta range used here
  double sum = 1.0, term = 1.0;
  const double y = x * x / 4.0;
  for (int k = 1; k < 64; ++k) {
    term *= y / (double)(k * k);
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

// Output length: ceil(n_in * up / down) (scipy resample_poly semantics).
// out == nullptr -> size query.
int64_t wh_resample_poly(const float* in, int64_t n_in, int32_t up,
                         int32_t down, float* out, int64_t out_capacity) {
  if (up <= 0 || down <= 0 || n_in < 0) return -1;
  const int64_t n_out = (n_in * up + down - 1) / down;
  if (out == nullptr) return n_out;
  if (n_out > out_capacity) return -4;
  if (up == down) {
    std::memcpy(out, in, sizeof(float) * (size_t)n_in);
    return n_out;
  }

  const int g = std::max(up, down);
  const int half = 10 * g;  // scipy: half_len = 10 * max(up, down)
  const int n_taps = 2 * half + 1;
  const double cutoff = 1.0 / g;  // normalized to Nyquist
  const double beta = 5.0;

  std::vector<double> taps(n_taps);
  const double i0b = bessel_i0(beta);
  for (int i = 0; i < n_taps; ++i) {
    const double m = i - half;
    const double sinc =
        m == 0 ? cutoff : std::sin(M_PI * cutoff * m) / (M_PI * m);
    const double r = m / (double)half;
    const double win = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - r * r))) / i0b;
    taps[i] = (double)up * sinc * win;
  }

  // y[j] = sum_i h[j*down - i*up + half] * x[i]
  for (int64_t j = 0; j < n_out; ++j) {
    const int64_t center = j * down;
    double acc = 0.0;
    // taps index t = center - i*up + half must lie in [0, n_taps)
    int64_t i_lo = (center + half - (n_taps - 1) + up - 1) / up;  // ceil
    int64_t i_hi = (center + half) / up;                          // floor
    i_lo = std::max<int64_t>(i_lo, 0);
    i_hi = std::min<int64_t>(i_hi, n_in - 1);
    for (int64_t i = i_lo; i <= i_hi; ++i) {
      acc += taps[center - i * up + half] * (double)in[i];
    }
    out[j] = (float)acc;
  }
  return n_out;
}

// ---------------------------------------------------------------------------
// Parallel batch feeder: N files -> [N, target_samples] f32, 16 kHz, padded
// ---------------------------------------------------------------------------

// Decode + resample-to-16k + pad/trim one file into out_row; *n_16k gets
// the pre-framing 16 kHz sample count (true duration for metrics).
static int feed_one(const char* path, float* out_row, int64_t target_samples,
                    int64_t* n_16k) {
  int32_t rate = 0;
  int64_t n = wh_load_wav(path, nullptr, 0, &rate);
  if (n < 0) return (int)n;
  std::vector<float> buf((size_t)n);
  if (wh_load_wav(path, buf.data(), n, &rate) != n) return -6;

  const float* samples = buf.data();
  int64_t n_samples = n;
  std::vector<float> resampled;
  if (rate != 16000) {
    // up/down = 16000/rate reduced by gcd
    int64_t a = 16000, b = rate;
    while (b) { int64_t t = a % b; a = b; b = t; }
    const int32_t up = (int32_t)(16000 / a), down = (int32_t)(rate / a);
    int64_t n_out = wh_resample_poly(samples, n_samples, up, down, nullptr, 0);
    if (n_out < 0) return (int)n_out;
    resampled.resize((size_t)n_out);
    if (wh_resample_poly(samples, n_samples, up, down, resampled.data(), n_out) != n_out)
      return -7;
    samples = resampled.data();
    n_samples = n_out;
  }

  if (n_16k) *n_16k = n_samples;
  const int64_t copy = std::min(n_samples, target_samples);
  std::memcpy(out_row, samples, sizeof(float) * (size_t)copy);
  if (copy < target_samples)
    std::memset(out_row + copy, 0, sizeof(float) * (size_t)(target_samples - copy));
  return 0;
}

// The host-side data loader for batched serving/eval: decodes, resamples
// and frames n_files WAVs in parallel into one [n_files, target_samples]
// row-major f32 buffer (the exact mel-frontend input layout). lengths (if
// given) receives each file's pre-framing 16 kHz sample count. Returns 0,
// or the first per-file error code (per-file status in statuses if given).
int wh_load_batch(const char** paths, int64_t n_files, int64_t target_samples,
                  float* out, int32_t* statuses, int64_t* lengths,
                  int n_threads) {
  if (n_threads <= 0) {
    n_threads = (int)std::thread::hardware_concurrency();
    if (n_threads <= 0) n_threads = 1;
  }
  n_threads = (int)std::min<int64_t>(n_threads, std::max<int64_t>(n_files, 1));

  std::vector<int32_t> local_status((size_t)n_files, 0);
  auto work = [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i)
      local_status[(size_t)i] =
          feed_one(paths[i], out + i * target_samples, target_samples,
                   lengths ? lengths + i : nullptr);
  };
  std::vector<std::thread> threads;
  const int64_t chunk = (n_files + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk, hi = std::min(n_files, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();

  int rc = 0;
  for (int64_t i = 0; i < n_files; ++i) {
    if (statuses) statuses[i] = local_status[(size_t)i];
    if (rc == 0 && local_status[(size_t)i] != 0) rc = local_status[(size_t)i];
  }
  return rc;
}

int wh_version(void) { return 2; }

}  // extern "C"
