// Native audio-ingest kernels for mlx_audio_tpu's host-side data path.
//
// The reference framework's ingest is native (libsndfile via the soundfile
// package + an ffmpeg bridge; see reference mlx_audio/audio_io.py).  This
// library is the TPU framework's equivalent: RIFF/WAVE demux + PCM format
// conversion + a polyphase resampler, exposed over a plain C ABI and bound
// from Python with ctypes (mlx_audio_tpu/native/__init__.py).  The Python
// implementations in audio_io.py / utils.py remain as portable fallbacks.
//
// The resampler reproduces scipy.signal.resample_poly(x, up, down,
// window=('kaiser', 5.0), padtype='constant') bit-closely: same firwin
// Kaiser design, same pre-pad/group-delay alignment, zero boundary.
//
// Build: see native/Makefile (g++ -O3 -shared -fPIC).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_WIN32)
#define AIO_EXPORT extern "C" __declspec(dllexport)
#else
#define AIO_EXPORT extern "C" __attribute__((visibility("default")))
#endif

namespace {

// ---------------------------------------------------------------------------
// Kaiser-window FIR design (scipy.signal.firwin equivalent for the
// single-cutoff lowpass case with an odd tap count).
// ---------------------------------------------------------------------------

double bessel_i0(double x) {
  // Power series: I0(x) = sum_k ((x/2)^k / k!)^2.  Converges quickly for
  // the beta values used in resampling windows (beta = 5).
  const double half = x / 2.0;
  double term = 1.0, sum = 1.0;
  for (int k = 1; k < 64; ++k) {
    term *= (half / k) * (half / k);
    sum += term;
    if (term < sum * 1e-18) break;
  }
  return sum;
}

double sinc(double x) {
  if (x == 0.0) return 1.0;
  const double px = M_PI * x;
  return std::sin(px) / px;
}

// firwin(numtaps, cutoff, window=("kaiser", beta)) for odd numtaps,
// cutoff in Nyquist units, scaled so the DC gain is exactly 1.
std::vector<double> design_lowpass(long numtaps, double cutoff, double beta) {
  std::vector<double> h(numtaps);
  const double center = (numtaps - 1) / 2.0;
  const double i0b = bessel_i0(beta);
  double sum = 0.0;
  for (long k = 0; k < numtaps; ++k) {
    const double t = (numtaps > 1) ? (2.0 * k / (numtaps - 1) - 1.0) : 0.0;
    const double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - t * t)))
                     / i0b;
    h[k] = cutoff * sinc(cutoff * (k - center)) * w;
    sum += h[k];
  }
  for (long k = 0; k < numtaps; ++k) h[k] /= sum;
  return h;
}

}  // namespace

// ---------------------------------------------------------------------------
// Polyphase resampling (scipy resample_poly semantics, zero padding)
// ---------------------------------------------------------------------------

// Number of output frames for n_in input frames (after gcd reduction of
// up/down by the caller).
AIO_EXPORT long aio_resample_out_len(long n_in, long up, long down) {
  if (up <= 0 || down <= 0 || n_in < 0) return -1;
  const long n = n_in * up;
  return n / down + (n % down != 0 ? 1 : 0);
}

// Resample ch-channel interleaved float32 audio from n_in frames to
// aio_resample_out_len(n_in, up, down) frames.  up/down must already be
// reduced by their gcd.  Returns the number of output frames, or -1 on
// invalid arguments.  out must hold out_len * ch floats.
AIO_EXPORT long aio_resample_poly_f32(const float* in, long n_in, long ch,
                                      long up, long down, float* out) {
  if (!in || !out || n_in < 0 || ch <= 0 || up <= 0 || down <= 0) return -1;
  const long n_out = aio_resample_out_len(n_in, up, down);
  if (up == 1 && down == 1) {
    std::memcpy(out, in, sizeof(float) * n_in * ch);
    return n_in;
  }

  // Filter design — identical constants to scipy.resample_poly.
  const long max_rate = up > down ? up : down;
  const double f_c = 1.0 / static_cast<double>(max_rate);
  const long half_len = 10 * max_rate;
  std::vector<double> h = design_lowpass(2 * half_len + 1, f_c, 5.0);
  for (double& v : h) v *= up;

  // Pre-pad so output samples sit on the down-sampling grid center.
  const long n_pre_pad = down - (half_len % down);
  const long n_pre_remove = (half_len + n_pre_pad) / down;
  const long n_h = static_cast<long>(h.size()) + n_pre_pad;
  // h_eff[j] = h[j - n_pre_pad] for j >= n_pre_pad (zeros before).

  // Polyphase: for output m, n = (m+n_pre_remove)*down decomposes as
  // n = q0*up + p; then y[m] = sum_k h_eff[p + k*up] * x[q0 - k].
  // Taps for each phase p are gathered once (contiguous, float32) so the
  // inner loop is a branch-free dot product over a backward x window.
  const long taps_per_phase = (n_h + up - 1) / up;
  std::vector<float> phase_taps(static_cast<size_t>(up) * taps_per_phase,
                                0.0f);
  for (long p = 0; p < up; ++p)
    for (long k = 0; k < taps_per_phase; ++k) {
      const long j = p + k * up - n_pre_pad;  // index into h
      if (j >= 0 && j < static_cast<long>(h.size()))
        phase_taps[p * taps_per_phase + k] = static_cast<float>(h[j]);
    }

  for (long m = 0; m < n_out; ++m) {
    const long n = (m + n_pre_remove) * down;
    const long q0 = n / up;
    const long p = n - q0 * up;
    const float* taps = phase_taps.data() + p * taps_per_phase;
    long k_lo = 0;
    long k_hi = taps_per_phase;  // exclusive
    if (q0 - (k_hi - 1) < 0) k_hi = q0 + 1;            // q >= 0
    if (q0 - k_lo > n_in - 1) k_lo = q0 - (n_in - 1);  // q < n_in
    // f32 accumulation matches scipy (upfirdn accumulates in the input
    // dtype); summation-order differences stay O(1e-6) at unit scale
    if (ch == 1) {
      const float* xp = in + (q0 - k_lo);
      float acc = 0.0f;
      for (long k = k_lo; k < k_hi; ++k, --xp) acc += taps[k] * *xp;
      out[m] = acc;
    } else {
      for (long c = 0; c < ch; ++c) {
        float acc = 0.0f;
        for (long k = k_lo; k < k_hi; ++k)
          acc += taps[k] * in[(q0 - k) * ch + c];
        out[m * ch + c] = acc;
      }
    }
  }
  return n_out;
}

// ---------------------------------------------------------------------------
// PCM format conversion (RIFF data chunk -> float32 and back)
// ---------------------------------------------------------------------------

AIO_EXPORT void aio_pcm16_to_f32(const int16_t* in, long n, float* out) {
  const float s = 1.0f / 32768.0f;
  for (long i = 0; i < n; ++i) out[i] = in[i] * s;
}

AIO_EXPORT void aio_pcm8_to_f32(const uint8_t* in, long n, float* out) {
  // WAV 8-bit is unsigned, midpoint 128.
  const float s = 1.0f / 128.0f;
  for (long i = 0; i < n; ++i) out[i] = (static_cast<int>(in[i]) - 128) * s;
}

AIO_EXPORT void aio_pcm24_to_f32(const uint8_t* in, long n, float* out) {
  // Little-endian 3-byte signed integers.
  const float s = 1.0f / 8388608.0f;
  for (long i = 0; i < n; ++i) {
    int32_t v = static_cast<int32_t>(in[3 * i]) |
                (static_cast<int32_t>(in[3 * i + 1]) << 8) |
                (static_cast<int32_t>(in[3 * i + 2]) << 16);
    if (v & 0x800000) v |= ~0xFFFFFF;  // sign-extend
    out[i] = v * s;
  }
}

AIO_EXPORT void aio_pcm32_to_f32(const int32_t* in, long n, float* out) {
  const double s = 1.0 / 2147483648.0;
  for (long i = 0; i < n; ++i)
    out[i] = static_cast<float>(in[i] * s);
}

AIO_EXPORT void aio_f32_to_pcm16(const float* in, long n, int16_t* out) {
  for (long i = 0; i < n; ++i) {
    float v = in[i] * 32767.0f;
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32768.0f) v = -32768.0f;
    out[i] = static_cast<int16_t>(std::lrintf(v));
  }
}

// ---------------------------------------------------------------------------
// RIFF/WAVE demux.  Scans chunks, finds fmt + data, converts samples to
// interleaved float32.  Returns 0 on success, negative error codes
// otherwise.  Mirrors the semantics of audio_io.read's pure-Python parser
// (audio_io.py:58-176): PCM 8/16/24/32 and IEEE float32/64, WAVE_FORMAT_
// EXTENSIBLE resolved through the fmt extension.
// ---------------------------------------------------------------------------

namespace {
uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}
}  // namespace

// Parse header only: fills *sample_rate, *channels, *n_frames,
// *bits_per_sample, *format_tag (1 = PCM, 3 = IEEE float) and
// *data_offset (byte offset of sample data in the buffer).
AIO_EXPORT int aio_wav_info(const uint8_t* buf, long size, int* sample_rate,
                            int* channels, long* n_frames,
                            int* bits_per_sample, int* format_tag,
                            long* data_offset) {
  if (!buf || size < 12) return -1;
  if (std::memcmp(buf, "RIFF", 4) != 0 || std::memcmp(buf + 8, "WAVE", 4) != 0)
    return -2;
  long pos = 12;
  bool have_fmt = false;
  int fmt_tag = 0, ch = 0, bits = 0, rate = 0;
  long data_off = -1, data_len = 0;
  while (pos + 8 <= size) {
    const uint8_t* hdr = buf + pos;
    const uint32_t chunk_len = rd_u32(hdr + 4);
    const long body = pos + 8;
    if (std::memcmp(hdr, "fmt ", 4) == 0 && body + 16 <= size) {
      fmt_tag = rd_u16(buf + body);
      ch = rd_u16(buf + body + 2);
      rate = static_cast<int>(rd_u32(buf + body + 4));
      bits = rd_u16(buf + body + 14);
      if (fmt_tag == 0xFFFE && chunk_len >= 40 && body + 34 <= size)
        fmt_tag = rd_u16(buf + body + 24);  // WAVE_FORMAT_EXTENSIBLE subformat
      have_fmt = true;
    } else if (std::memcmp(hdr, "data", 4) == 0) {
      data_off = body;
      data_len = static_cast<long>(chunk_len);
      if (data_off + data_len > size) data_len = size - data_off;
    }
    pos = body + chunk_len + (chunk_len & 1);  // chunks are word-aligned
  }
  if (!have_fmt || data_off < 0 || ch <= 0 || bits <= 0) return -3;
  *sample_rate = rate;
  *channels = ch;
  *bits_per_sample = bits;
  *format_tag = fmt_tag;
  *data_offset = data_off;
  *n_frames = data_len / (ch * (bits / 8));
  return 0;
}

// Decode the sample data located by aio_wav_info into interleaved float32
// (n_frames * channels values).  Returns 0 on success.
AIO_EXPORT int aio_wav_decode(const uint8_t* buf, long size, long data_offset,
                              long n_frames, int channels,
                              int bits_per_sample, int format_tag,
                              float* out) {
  const long n = n_frames * channels;
  const uint8_t* data = buf + data_offset;
  if (data_offset + n * (bits_per_sample / 8) > size) return -1;
  if (format_tag == 3) {  // IEEE float
    if (bits_per_sample == 32) {
      std::memcpy(out, data, sizeof(float) * n);
      return 0;
    }
    if (bits_per_sample == 64) {
      const double* d = reinterpret_cast<const double*>(data);
      for (long i = 0; i < n; ++i) out[i] = static_cast<float>(d[i]);
      return 0;
    }
    return -2;
  }
  if (format_tag != 1) return -3;
  switch (bits_per_sample) {
    case 8:
      aio_pcm8_to_f32(data, n, out);
      return 0;
    case 16:
      aio_pcm16_to_f32(reinterpret_cast<const int16_t*>(data), n, out);
      return 0;
    case 24:
      aio_pcm24_to_f32(data, n, out);
      return 0;
    case 32:
      aio_pcm32_to_f32(reinterpret_cast<const int32_t*>(data), n, out);
      return 0;
    default:
      return -2;
  }
}

// ---------------------------------------------------------------------------
// WAV encode: interleaved float32 -> complete PCM-16 RIFF file image.
// Returns the total byte size written (header + data), or -1.  Call with
// out == nullptr to query the required size.
// ---------------------------------------------------------------------------

AIO_EXPORT long aio_wav_encode_pcm16(const float* in, long n_frames,
                                     int channels, int sample_rate,
                                     uint8_t* out) {
  const long n = n_frames * channels;
  const long data_len = n * 2;
  const long total = 44 + data_len;
  if (!out) return total;
  const uint32_t byte_rate = sample_rate * channels * 2;
  const uint16_t block_align = static_cast<uint16_t>(channels * 2);
  std::memcpy(out, "RIFF", 4);
  const uint32_t riff_len = static_cast<uint32_t>(total - 8);
  std::memcpy(out + 4, &riff_len, 4);
  std::memcpy(out + 8, "WAVEfmt ", 8);
  const uint32_t fmt_len = 16;
  std::memcpy(out + 16, &fmt_len, 4);
  const uint16_t tag = 1, ch16 = static_cast<uint16_t>(channels),
                 bits = 16;
  std::memcpy(out + 20, &tag, 2);
  std::memcpy(out + 22, &ch16, 2);
  const uint32_t rate32 = static_cast<uint32_t>(sample_rate);
  std::memcpy(out + 24, &rate32, 4);
  std::memcpy(out + 28, &byte_rate, 4);
  std::memcpy(out + 32, &block_align, 2);
  std::memcpy(out + 34, &bits, 2);
  std::memcpy(out + 36, "data", 4);
  const uint32_t data32 = static_cast<uint32_t>(data_len);
  std::memcpy(out + 40, &data32, 4);
  aio_f32_to_pcm16(in, n, reinterpret_cast<int16_t*>(out + 44));
  return total;
}

AIO_EXPORT int aio_abi_version() { return 1; }
