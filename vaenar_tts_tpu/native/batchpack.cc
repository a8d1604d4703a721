// Native batch assembler for the training input pipeline.
//
// Gathers variable-length utterances (int32 token ids + float32 mel frames)
// out of memory-mapped record-shard blobs straight into preallocated padded
// batch tensors - one multithreaded memcpy pass with no per-utterance Python
// or NumPy dispatch. This is the TPU-native counterpart of the reference's
// tf.data parse+padded_batch stage (reference datasets/tf_record_utils.py:
// 108-142), which ran as TensorFlow C++ ops; exposed over a plain C ABI and
// loaded via ctypes (no pybind11 in this environment).
//
// Build: vaenar_tts_tpu/native/__init__.py shells out to
//   g++ -O3 -march=native -shared -fPIC -o libbatchpack.so batchpack.cc -lpthread

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Scatter n utterances into rows[i] of the padded outputs.
//   text_blob: concatenated int32 tokens for the shard
//   mel_blob:  concatenated float32 frames [*, num_mels] for the shard
//   indices:   n local utterance indices within the shard
//   rows:      n destination row indices in the batch tensors
//   texts_out: [batch_rows, text_max] int32, pre-zeroed by the caller
//   mels_out:  [batch_rows, mel_max, num_mels] float32, pre-zeroed
void pack_batch(const int32_t* text_blob, const int64_t* text_offsets,
                const int64_t* text_lens, const float* mel_blob,
                const int64_t* mel_offsets, const int64_t* mel_lens,
                int64_t num_mels, const int64_t* indices,
                const int64_t* rows, int64_t n, int32_t* texts_out,
                int64_t text_max, float* mels_out, int64_t mel_max,
                int32_t* tlens_out, int32_t* mlens_out) {
  const int64_t mel_row_elems = mel_max * num_mels;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int n_threads = hw > 1 ? (hw < 8 ? hw : 8) : 1;
  if (n > 0 && n < n_threads) n_threads = static_cast<int>(n);

  auto work = [&](int64_t begin, int64_t end) {
    for (int64_t i = begin; i < end; ++i) {
      const int64_t u = indices[i];
      const int64_t row = rows[i];
      const int64_t tl = text_lens[u];
      const int64_t ml = mel_lens[u];
      std::memcpy(texts_out + row * text_max, text_blob + text_offsets[u],
                  sizeof(int32_t) * static_cast<size_t>(tl));
      std::memcpy(mels_out + row * mel_row_elems,
                  mel_blob + mel_offsets[u] * num_mels,
                  sizeof(float) * static_cast<size_t>(ml * num_mels));
      tlens_out[row] = static_cast<int32_t>(tl);
      mlens_out[row] = static_cast<int32_t>(ml);
    }
  };

  if (n_threads <= 1) {
    work(0, n);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t b = t * chunk;
    const int64_t e = (b + chunk < n) ? b + chunk : n;
    if (b >= e) break;
    threads.emplace_back(work, b, e);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
