// cruseio: native audio IO core for the cruse_tpu data pipeline.
//
// The host-side input pipeline (wav decode, channel mixdown, resample,
// random crop/pad) is pure CPU work that Python does one file at a time;
// this library does it with a std::thread pool so batch assembly keeps up
// with the TPU. Exposed as a C ABI for ctypes (no pybind11 in the image).
//
// Formats: RIFF/WAVE PCM 8/16/24/32-bit and IEEE float32, any channel
// count (averaged to mono). Resampling is windowed-sinc (8-tap Lanczos).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Wav {
  std::vector<float> samples;  // mono
  int sample_rate = 0;
};

bool read_file(const char* path, std::vector<uint8_t>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (n <= 0) {
    std::fclose(f);
    return false;
  }
  buf.resize(static_cast<size_t>(n));
  size_t got = std::fread(buf.data(), 1, buf.size(), f);
  std::fclose(f);
  return got == buf.size();
}

uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

bool decode_wav_impl(const char* path, Wav& out) {
  std::vector<uint8_t> buf;
  if (!read_file(path, buf) || buf.size() < 44) return false;
  if (std::memcmp(buf.data(), "RIFF", 4) != 0 || std::memcmp(buf.data() + 8, "WAVE", 4) != 0)
    return false;

  uint16_t audio_format = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  const uint8_t* data = nullptr;
  uint32_t data_size = 0;

  size_t pos = 12;
  while (pos + 8 <= buf.size()) {
    const uint8_t* chunk = buf.data() + pos;
    uint32_t csize = rd_u32(chunk + 4);
    if (std::memcmp(chunk, "fmt ", 4) == 0 && csize >= 16) {
      audio_format = rd_u16(chunk + 8);
      channels = rd_u16(chunk + 10);
      sample_rate = rd_u32(chunk + 12);
      bits = rd_u16(chunk + 22);
    } else if (std::memcmp(chunk, "data", 4) == 0) {
      data = chunk + 8;
      data_size = csize;
      if (pos + 8 + data_size > buf.size()) data_size = static_cast<uint32_t>(buf.size() - pos - 8);
    }
    pos += 8 + csize + (csize & 1);
  }
  if (!data || channels == 0 || sample_rate == 0) return false;

  size_t bytes_per = bits / 8;
  if (bytes_per == 0) return false;
  size_t frames = data_size / (bytes_per * channels);
  out.samples.resize(frames);
  out.sample_rate = static_cast<int>(sample_rate);

  const float inv_ch = 1.0f / static_cast<float>(channels);
  for (size_t i = 0; i < frames; ++i) {
    float acc = 0.0f;
    for (unsigned c = 0; c < channels; ++c) {
      const uint8_t* p = data + (i * channels + c) * bytes_per;
      float v = 0.0f;
      if (audio_format == 3 && bits == 32) {  // IEEE float
        float fv;
        std::memcpy(&fv, p, 4);
        v = fv;
      } else if (bits == 16) {
        int16_t s;
        std::memcpy(&s, p, 2);
        v = static_cast<float>(s) / 32768.0f;
      } else if (bits == 32) {
        int32_t s;
        std::memcpy(&s, p, 4);
        v = static_cast<float>(s) / 2147483648.0f;
      } else if (bits == 24) {
        int32_t s = (static_cast<int32_t>(p[0])) | (static_cast<int32_t>(p[1]) << 8) |
                    (static_cast<int32_t>(p[2]) << 16);
        if (s >= (1 << 23)) s -= (1 << 24);
        v = static_cast<float>(s) / 8388608.0f;
      } else if (bits == 8) {
        v = (static_cast<float>(p[0]) - 128.0f) / 128.0f;
      } else {
        return false;
      }
      acc += v;
    }
    out.samples[i] = acc * inv_ch;
  }
  return true;
}

float lanczos(float x, int a) {
  if (x == 0.0f) return 1.0f;
  if (std::fabs(x) >= static_cast<float>(a)) return 0.0f;
  float pix = static_cast<float>(M_PI) * x;
  return a * std::sin(pix) * std::sin(pix / a) / (pix * pix);
}

void resample(const std::vector<float>& in, int sr_in, std::vector<float>& out, int sr_out) {
  if (sr_in == sr_out) {
    out = in;
    return;
  }
  const int a = 4;  // lanczos taps each side
  double ratio = static_cast<double>(sr_in) / sr_out;
  size_t n_out = static_cast<size_t>(in.size() / ratio);
  out.resize(n_out);
  // low-pass scaling when downsampling
  float scale = ratio > 1.0 ? static_cast<float>(1.0 / ratio) : 1.0f;
  int reach = ratio > 1.0 ? static_cast<int>(a * ratio) : a;
  for (size_t i = 0; i < n_out; ++i) {
    double center = i * ratio;
    int lo = static_cast<int>(std::floor(center)) - reach + 1;
    int hi = static_cast<int>(std::floor(center)) + reach;
    float acc = 0.0f, wsum = 0.0f;
    for (int j = lo; j <= hi; ++j) {
      float w = lanczos(static_cast<float>((center - j) * scale), a);
      wsum += w;
      if (j >= 0 && j < static_cast<int>(in.size())) acc += w * in[static_cast<size_t>(j)];
    }
    out[i] = wsum > 0.0f ? acc / wsum : 0.0f;
  }
}

}  // namespace

extern "C" {

// Decode + (optionally) resample one file. Returns the number of samples
// written to `out` (<= max_len), 0 length stored via full return, or -1 on
// error. `*found_len` receives the full decoded length (so callers can
// detect truncation); `*sr_io`: pass 0 to keep the file rate (written back),
// or a target rate to resample.
int cruseio_decode(const char* path, float* out, long max_len, long* found_len, int* sr_io) {
  Wav wav;
  if (!decode_wav_impl(path, wav)) return -1;
  std::vector<float>* samples = &wav.samples;
  std::vector<float> resampled;
  if (*sr_io != 0 && *sr_io != wav.sample_rate) {
    resample(wav.samples, wav.sample_rate, resampled, *sr_io);
    samples = &resampled;
  } else {
    *sr_io = wav.sample_rate;
  }
  *found_len = static_cast<long>(samples->size());
  long n = std::min(max_len, *found_len);
  std::memcpy(out, samples->data(), static_cast<size_t>(n) * sizeof(float));
  return static_cast<int>(n);
}

// Assemble a batch: for each row, decode path i, resample to target_sr, and
// random-crop (or zero-pad) to target_len samples. Deterministic per
// (seed, row). Rows with unreadable files are zero-filled and flagged 0 in
// `ok`. Runs on `threads` std::threads.
void cruseio_load_batch(const char** paths, int n, float* out, long target_len,
                        int target_sr, uint64_t seed, int threads, int* ok,
                        long* lens /* decoded length per row (post-resample) */) {
  if (threads < 1) threads = 1;
  auto work = [&](int begin, int end) {
    for (int i = begin; i < end; ++i) {
      float* row = out + static_cast<long>(i) * target_len;
      std::memset(row, 0, static_cast<size_t>(target_len) * sizeof(float));
      lens[i] = 0;
      Wav wav;
      if (!decode_wav_impl(paths[i], wav)) {
        ok[i] = 0;
        continue;
      }
      std::vector<float> samples;
      if (target_sr != 0 && target_sr != wav.sample_rate) {
        resample(wav.samples, wav.sample_rate, samples, target_sr);
      } else {
        samples = std::move(wav.samples);
      }
      long len = static_cast<long>(samples.size());
      lens[i] = len;
      if (len >= target_len) {
        std::mt19937_64 rng(seed + static_cast<uint64_t>(i) * 0x9e3779b97f4a7c15ULL);
        std::uniform_int_distribution<long> dist(0, len - target_len);
        long start = dist(rng);
        std::memcpy(row, samples.data() + start, static_cast<size_t>(target_len) * sizeof(float));
      } else {
        std::memcpy(row, samples.data(), static_cast<size_t>(len) * sizeof(float));
      }
      ok[i] = 1;
    }
  };
  std::vector<std::thread> pool;
  int per = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int b = t * per, e = std::min(n, b + per);
    if (b >= e) break;
    pool.emplace_back(work, b, e);
  }
  for (auto& th : pool) th.join();
}

// Assemble a batch the way the reference's SynDataset selects audio
// (dataset/dataset.py:147-203 semantics): each row concatenates randomly
// chosen files from the pool with `gap_len` samples of silence between
// clips until >= target_len, then random-crops. Deterministic per
// (seed, row); unreadable files are skipped (bounded retries); a row that
// can't assemble anything is zero-filled and flagged 0 in `ok`. Runs on
// `threads` std::threads -- this replaces the python fallback path that the
// per-file loader needed for clips shorter than the crop.
void cruseio_assemble_batch(const char** pool, int pool_size, int n,
                            float* out, long target_len, long gap_len,
                            int target_sr, uint64_t seed, int threads,
                            int* ok) {
  if (threads < 1) threads = 1;
  auto work = [&](int begin, int end) {
    for (int i = begin; i < end; ++i) {
      float* row = out + static_cast<long>(i) * target_len;
      std::memset(row, 0, static_cast<size_t>(target_len) * sizeof(float));
      std::mt19937_64 rng(seed + static_cast<uint64_t>(i) * 0x9e3779b97f4a7c15ULL);
      std::uniform_int_distribution<int> pick(0, pool_size - 1);
      std::vector<float> acc;
      acc.reserve(static_cast<size_t>(target_len) + 4096);
      int attempts = 0;
      const int max_attempts = pool_size * 8 + 16;
      while (static_cast<long>(acc.size()) < target_len && attempts < max_attempts) {
        ++attempts;
        Wav wav;
        if (!decode_wav_impl(pool[pick(rng)], wav)) continue;
        std::vector<float> samples;
        if (target_sr != 0 && target_sr != wav.sample_rate) {
          resample(wav.samples, wav.sample_rate, samples, target_sr);
        } else {
          samples = std::move(wav.samples);
        }
        acc.insert(acc.end(), samples.begin(), samples.end());
        long remaining = target_len - static_cast<long>(acc.size());
        if (remaining > 0 && gap_len > 0) {
          acc.insert(acc.end(),
                     static_cast<size_t>(std::min(gap_len, remaining)), 0.0f);
        }
      }
      if (acc.empty()) {
        ok[i] = 0;
        continue;
      }
      long len = static_cast<long>(acc.size());
      if (len >= target_len) {
        std::uniform_int_distribution<long> dist(0, len - target_len);
        long start = dist(rng);
        std::memcpy(row, acc.data() + start,
                    static_cast<size_t>(target_len) * sizeof(float));
      } else {
        std::memcpy(row, acc.data(), static_cast<size_t>(len) * sizeof(float));
      }
      ok[i] = 1;
    }
  };
  std::vector<std::thread> pool_threads;
  int per = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    int b = t * per, e = std::min(n, b + per);
    if (b >= e) break;
    pool_threads.emplace_back(work, b, e);
  }
  for (auto& th : pool_threads) th.join();
}

}  // extern "C"
