// cacheio — native flow-cache IO + LOD runtime for tpuflow.
//
// The per-frame flow cache is the pipeline's recovery unit
// (reference: storage/cache_manager.py; flow written before any
// post-processing).  At TPU inference rates the host-side cache write
// becomes the critical path (a 1080p flow frame is ~16 MB), so this
// library provides:
//
//   - flo_write:        Middlebury .flo writer ('PIEH' + LE u32 w,h +
//                       f32 data — byte-identical to the Python writer)
//   - flo_read:         .flo reader with magic validation
//   - async writer:     a worker-thread pool that drains a queue of
//                       pending .flo writes off the compute thread
//   - lod_downsample:   the weighted 2x2 LOD reduction (odd dims padded
//                       bottom/right with zero weight, vectors scaled
//                       x0.5) — single-pass, no Python loop
//
// Exposed as plain C symbols for ctypes (tpuflow/runtime/cacheio.py);
// the Python layer falls back to numpy when the library is absent.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// .flo read/write
// ---------------------------------------------------------------------------
int flo_write(const char* path, int32_t width, int32_t height, const float* data) {
    FILE* f = std::fopen(path, "wb");
    if (!f) return -1;
    const char magic[4] = {'P', 'I', 'E', 'H'};
    uint32_t w = static_cast<uint32_t>(width);
    uint32_t h = static_cast<uint32_t>(height);
    size_t n = static_cast<size_t>(width) * height * 2;
    int ok = std::fwrite(magic, 1, 4, f) == 4 &&
             std::fwrite(&w, 4, 1, f) == 1 &&
             std::fwrite(&h, 4, 1, f) == 1 &&
             std::fwrite(data, 4, n, f) == n;
    std::fclose(f);
    return ok ? 0 : -2;
}

// Reads dims only (call first to size the buffer). Returns 0 on success.
int flo_read_header(const char* path, int32_t* width, int32_t* height) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    char magic[4];
    uint32_t w, h;
    int ok = std::fread(magic, 1, 4, f) == 4 &&
             std::memcmp(magic, "PIEH", 4) == 0 &&
             std::fread(&w, 4, 1, f) == 1 &&
             std::fread(&h, 4, 1, f) == 1;
    std::fclose(f);
    if (!ok) return -2;
    *width = static_cast<int32_t>(w);
    *height = static_cast<int32_t>(h);
    return 0;
}

int flo_read(const char* path, int32_t width, int32_t height, float* out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    std::fseek(f, 12, SEEK_SET);
    size_t n = static_cast<size_t>(width) * height * 2;
    int ok = std::fread(out, 4, n, f) == n;
    std::fclose(f);
    return ok ? 0 : -2;
}

// ---------------------------------------------------------------------------
// LOD downsample (one level). In: flow [h, w, 2] (+ optional weight
// [h, w]); out: flow [(h+1)/2, (w+1)/2, 2]. Matches the Python/JAX
// semantics exactly: odd dims behave as zero-weight padding, averages
// ignore padding, vectors scale x0.5.
// ---------------------------------------------------------------------------
void lod_downsample(const float* flow, const float* weight,
                    int32_t h, int32_t w, float* out) {
    int32_t nh = (h + 1) / 2, nw = (w + 1) / 2;
    for (int32_t y = 0; y < nh; ++y) {
        for (int32_t x = 0; x < nw; ++x) {
            float su = 0.f, sv = 0.f, sw = 0.f;
            for (int32_t dy = 0; dy < 2; ++dy) {
                int32_t yy = 2 * y + dy;
                if (yy >= h) continue;
                for (int32_t dx = 0; dx < 2; ++dx) {
                    int32_t xx = 2 * x + dx;
                    if (xx >= w) continue;
                    float wt = weight ? weight[yy * w + xx] : 1.0f;
                    const float* p = flow + (static_cast<size_t>(yy) * w + xx) * 2;
                    su += p[0] * wt;
                    sv += p[1] * wt;
                    sw += wt;
                }
            }
            float* o = out + (static_cast<size_t>(y) * nw + x) * 2;
            if (sw > 0.f) {
                o[0] = su / sw * 0.5f;
                o[1] = sv / sw * 0.5f;
            } else {
                o[0] = o[1] = 0.f;
            }
        }
    }
}

// Full pyramid: writes num_lods-1 downsampled levels into `out`, a
// contiguous buffer sized by the caller (levels concatenated).
void lod_pyramid(const float* flow, int32_t h, int32_t w,
                 int32_t num_lods, float* out) {
    std::vector<float> cur(flow, flow + static_cast<size_t>(h) * w * 2);
    int32_t ch = h, cw = w;
    float* dst = out;
    for (int32_t level = 1; level < num_lods; ++level) {
        int32_t nh = (ch + 1) / 2, nw = (cw + 1) / 2;
        lod_downsample(cur.data(), nullptr, ch, cw, dst);
        cur.assign(dst, dst + static_cast<size_t>(nh) * nw * 2);
        dst += static_cast<size_t>(nh) * nw * 2;
        ch = nh;
        cw = nw;
    }
}

// ---------------------------------------------------------------------------
// Async .flo writer pool
// ---------------------------------------------------------------------------
namespace {

struct WriteJob {
    std::string path;
    int32_t width, height;
    std::vector<float> data;
};

class WriterPool {
  public:
    explicit WriterPool(int n_threads) : stop_(false), errors_(0), pending_(0) {
        for (int i = 0; i < n_threads; ++i)
            threads_.emplace_back([this] { worker(); });
    }
    ~WriterPool() {
        {
            std::unique_lock<std::mutex> lk(mu_);
            stop_ = true;
        }
        cv_.notify_all();
        for (auto& t : threads_) t.join();
    }
    void enqueue(WriteJob&& job) {
        {
            std::unique_lock<std::mutex> lk(mu_);
            queue_.push(std::move(job));
            ++pending_;
        }
        cv_.notify_one();
    }
    void flush() {
        std::unique_lock<std::mutex> lk(mu_);
        done_cv_.wait(lk, [this] { return pending_ == 0; });
    }
    int errors() const { return errors_.load(); }

  private:
    void worker() {
        for (;;) {
            WriteJob job;
            {
                std::unique_lock<std::mutex> lk(mu_);
                cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
                if (stop_ && queue_.empty()) return;
                job = std::move(queue_.front());
                queue_.pop();
            }
            if (flo_write(job.path.c_str(), job.width, job.height, job.data.data()) != 0)
                ++errors_;
            {
                std::unique_lock<std::mutex> lk(mu_);
                if (--pending_ == 0) done_cv_.notify_all();
            }
        }
    }

    std::mutex mu_;
    std::condition_variable cv_, done_cv_;
    std::queue<WriteJob> queue_;
    std::vector<std::thread> threads_;
    bool stop_;
    std::atomic<int> errors_;
    int pending_;
};

}  // namespace

void* writer_pool_create(int32_t n_threads) {
    return new WriterPool(n_threads > 0 ? n_threads : 2);
}

void writer_pool_enqueue(void* pool, const char* path, int32_t width,
                         int32_t height, const float* data) {
    WriteJob job;
    job.path = path;
    job.width = width;
    job.height = height;
    job.data.assign(data, data + static_cast<size_t>(width) * height * 2);
    static_cast<WriterPool*>(pool)->enqueue(std::move(job));
}

void writer_pool_flush(void* pool) { static_cast<WriterPool*>(pool)->flush(); }

int writer_pool_errors(void* pool) { return static_cast<WriterPool*>(pool)->errors(); }

void writer_pool_destroy(void* pool) { delete static_cast<WriterPool*>(pool); }

}  // extern "C"
