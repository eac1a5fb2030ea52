// Threaded .npy batch loader for the training data pipeline.
//
// The training loop consumes groups of per-utterance .npy feature files
// (mel/f0/energy/prior/...; reference layout, dataset.py:51-148). Python-side
// loading serializes header parsing + read syscalls; this library reads a
// whole batch of files concurrently on a worker pool and lets the host
// prefetch the next group while the TPU executes the current step.
//
// C API (ctypes-friendly):
//   void*   ctts_pool_create(int n_threads)
//   void    ctts_pool_destroy(void* pool)
//   long    ctts_submit(void* pool, const char** paths, int n)   -> job id
//   int     ctts_job_ready(void* pool, long job)
//   // per-array introspection + copy-out (blocks until the job finishes):
//   int     ctts_array_info(void* pool, long job, int idx,
//                           long* shape /*[8]*/, int* ndim, int* dtype)
//   long    ctts_array_copy(void* pool, long job, int idx, void* dst,
//                           long dst_bytes)
//   void    ctts_job_free(void* pool, long job)
//
// dtype codes: 0=f32 1=f64 2=i32 3=i64 4=u8 -1=unsupported
// All functions return -1 on error.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <functional>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Array {
  std::vector<int64_t> shape;
  int dtype = -1;            // code, see above
  std::vector<char> data;    // raw buffer (little-endian, C order)
  bool ok = false;
};

int dtype_code(const std::string& descr) {
  // descr like "<f4", "|u1", "<i8"; big-endian ('>') is not supported —
  // the buffer is handed to numpy as native little-endian.
  if (descr.size() < 2) return -1;
  if (descr.size() >= 3 && descr[0] != '<' && descr[0] != '|' &&
      descr[0] != '=') {
    return -1;
  }
  const std::string t = descr.substr(descr.size() - 2);
  if (t == "f4") return 0;
  if (t == "f8") return 1;
  if (t == "i4") return 2;
  if (t == "i8") return 3;
  if (t == "u1") return 4;
  return -1;
}

// Parse the .npy v1/v2 header and load the payload.
bool load_npy(const std::string& path, Array* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  char magic[8];
  if (std::fread(magic, 1, 8, f) != 8 ||
      std::memcmp(magic, "\x93NUMPY", 6) != 0) {
    std::fclose(f);
    return false;
  }
  const int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    uint16_t len16;
    if (std::fread(&len16, 2, 1, f) != 1) { std::fclose(f); return false; }
    header_len = len16;
  } else {
    if (std::fread(&header_len, 4, 1, f) != 1) { std::fclose(f); return false; }
  }
  std::string header(header_len, '\0');
  if (std::fread(&header[0], 1, header_len, f) != header_len) {
    std::fclose(f);
    return false;
  }

  // descr
  auto dpos = header.find("'descr'");
  if (dpos == std::string::npos) { std::fclose(f); return false; }
  auto q1 = header.find('\'', dpos + 7);   // opening quote of the value
  auto q2 = header.find('\'', q1 + 1);     // closing quote
  out->dtype = dtype_code(header.substr(q1 + 1, q2 - q1 - 1));
  if (out->dtype < 0) { std::fclose(f); return false; }

  // fortran_order must be False (numpy default save)
  if (header.find("'fortran_order': True") != std::string::npos) {
    std::fclose(f);
    return false;
  }

  // shape tuple
  auto spos = header.find("'shape'");
  auto p1 = header.find('(', spos);
  auto p2 = header.find(')', p1);
  std::string shape_s = header.substr(p1 + 1, p2 - p1 - 1);
  out->shape.clear();
  int64_t cur = -1;
  for (char c : shape_s) {
    if (c >= '0' && c <= '9') {
      cur = (cur < 0 ? 0 : cur) * 10 + (c - '0');
    } else if (cur >= 0) {
      out->shape.push_back(cur);
      cur = -1;
    }
  }
  if (cur >= 0) out->shape.push_back(cur);

  static const int64_t kItem[] = {4, 8, 4, 8, 1};
  int64_t count = 1;
  for (int64_t s : out->shape) count *= s;
  const int64_t bytes = count * kItem[out->dtype];
  out->data.resize(bytes);
  const bool ok =
      std::fread(out->data.data(), 1, bytes, f) == (size_t)bytes;
  std::fclose(f);
  out->ok = ok;
  return ok;
}

struct Job {
  std::vector<std::string> paths;
  std::vector<Array> arrays;
  std::atomic<int> remaining{0};
  std::mutex m;
  std::condition_variable cv;
  bool done() const { return remaining.load() == 0; }
  void wait() {
    std::unique_lock<std::mutex> lk(
        const_cast<std::mutex&>(m));
    cv.wait(lk, [this] { return done(); });
  }
};

class Pool {
 public:
  explicit Pool(int n_threads) {
    for (int i = 0; i < n_threads; ++i) {
      workers_.emplace_back([this] { Run(); });
    }
  }

  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(m_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  long Submit(const char** paths, int n) {
    auto job = std::make_shared<Job>();
    job->paths.assign(paths, paths + n);
    job->arrays.resize(n);
    job->remaining.store(n);
    long id;
    {
      std::lock_guard<std::mutex> lk(m_);
      id = next_id_++;
      jobs_[id] = job;
      for (int i = 0; i < n; ++i) tasks_.push_back({job, i});
    }
    cv_.notify_all();
    return id;
  }

  std::shared_ptr<Job> Get(long id) {
    std::lock_guard<std::mutex> lk(m_);
    auto it = jobs_.find(id);
    return it == jobs_.end() ? nullptr : it->second;
  }

  void Free(long id) {
    std::lock_guard<std::mutex> lk(m_);
    jobs_.erase(id);
  }

 private:
  struct Task {
    std::shared_ptr<Job> job;
    int index;
  };

  void Run() {
    for (;;) {
      Task task;
      {
        std::unique_lock<std::mutex> lk(m_);
        cv_.wait(lk, [this] { return stop_ || !tasks_.empty(); });
        if (stop_ && tasks_.empty()) return;
        task = tasks_.front();
        tasks_.pop_front();
      }
      load_npy(task.job->paths[task.index],
               &task.job->arrays[task.index]);
      if (task.job->remaining.fetch_sub(1) == 1) {
        std::lock_guard<std::mutex> lk(task.job->m);
        task.job->cv.notify_all();
      }
    }
  }

  std::vector<std::thread> workers_;
  std::deque<Task> tasks_;
  std::map<long, std::shared_ptr<Job>> jobs_;
  std::mutex m_;
  std::condition_variable cv_;
  bool stop_ = false;
  long next_id_ = 1;
};

}  // namespace

extern "C" {

void* ctts_pool_create(int n_threads) {
  return new Pool(n_threads > 0 ? n_threads : 4);
}

void ctts_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

long ctts_submit(void* pool, const char** paths, int n) {
  if (!pool || n <= 0) return -1;
  return static_cast<Pool*>(pool)->Submit(paths, n);
}

int ctts_job_ready(void* pool, long job_id) {
  auto job = static_cast<Pool*>(pool)->Get(job_id);
  if (!job) return -1;
  return job->done() ? 1 : 0;
}

int ctts_array_info(void* pool, long job_id, int idx, long* shape,
                    int* ndim, int* dtype) {
  auto job = static_cast<Pool*>(pool)->Get(job_id);
  if (!job || idx < 0 || idx >= (int)job->arrays.size()) return -1;
  job->wait();
  const Array& a = job->arrays[idx];
  if (!a.ok) return -1;
  *ndim = (int)a.shape.size();
  *dtype = a.dtype;
  for (size_t i = 0; i < a.shape.size() && i < 8; ++i) shape[i] = a.shape[i];
  return 0;
}

long ctts_array_copy(void* pool, long job_id, int idx, void* dst,
                     long dst_bytes) {
  auto job = static_cast<Pool*>(pool)->Get(job_id);
  if (!job || idx < 0 || idx >= (int)job->arrays.size()) return -1;
  job->wait();
  const Array& a = job->arrays[idx];
  if (!a.ok || (long)a.data.size() > dst_bytes) return -1;
  std::memcpy(dst, a.data.data(), a.data.size());
  return (long)a.data.size();
}

void ctts_job_free(void* pool, long job_id) {
  static_cast<Pool*>(pool)->Free(job_id);
}

}  // extern "C"
