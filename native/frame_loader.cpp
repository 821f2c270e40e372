// Multi-threaded prefetching frame loader with a preallocated slot pool.
//
// Native runtime counterpart of the reference's worker free-list
// (reference src/SlamGpuPipeline/SlamGpuPipeline.cpp:41-50,144-165 — N
// persistent workers handed frames through condvar-guarded cells) and of
// vilib's preallocated pyramid memory pools
// (src_trash1/vilib/storage/pyramid_pool.h:46-131): a fixed ring of
// decode slots filled by a worker pool, drained in order by the Python
// consumer, zero allocation at steady state.
//
// C API (ctypes-friendly), all blocking calls release the GIL on the
// Python side automatically because ctypes does.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

extern "C" {
int png_probe(const uint8_t* data, size_t size, int* width, int* height,
              int* channels, int* bit_depth);
int png_decode(const uint8_t* data, size_t size, uint8_t* out,
               size_t out_size);
}

namespace {

struct Slot {
    std::vector<uint8_t> pixels;
    int width = 0, height = 0, channels = 0, bit_depth = 0;
    int index = -1;
    int status = 0;              // 0 empty, 1 ready, <0 error
};

struct Loader {
    std::vector<std::string> paths;
    std::vector<Slot> slots;
    size_t capacity;
    std::atomic<size_t> next_job{0};
    size_t next_out = 0;         // next frame index to hand out
    std::mutex mu;
    std::condition_variable cv_ready;
    std::condition_variable cv_free;
    std::vector<std::thread> workers;
    std::atomic<bool> stop{false};

    explicit Loader(size_t cap) : slots(cap), capacity(cap) {}

    void worker() {
        std::vector<uint8_t> file;
        while (!stop.load()) {
            size_t job = next_job.fetch_add(1);
            if (job >= paths.size()) return;
            // read file
            int status = 1;
            int w = 0, h = 0, ch = 0, bd = 0;
            std::vector<uint8_t> pixels;
            {
                std::ifstream f(paths[job], std::ios::binary);
                if (!f) {
                    status = -100;
                } else {
                    f.seekg(0, std::ios::end);
                    file.resize(size_t(f.tellg()));
                    f.seekg(0);
                    f.read(reinterpret_cast<char*>(file.data()),
                           std::streamsize(file.size()));
                }
            }
            if (status == 1) {
                int rc = png_probe(file.data(), file.size(), &w, &h, &ch, &bd);
                if (rc != 0) {
                    status = rc;
                } else {
                    pixels.resize(size_t(w) * h * ch * (bd / 8));
                    rc = png_decode(file.data(), file.size(), pixels.data(),
                                    pixels.size());
                    if (rc != 0) status = rc;
                }
            }
            // claim the slot for this frame (in-order ring: slot = job % cap).
            // The generation gate `job < next_out + capacity` is essential:
            // jobs j and j+capacity share a slot, and without it the later
            // job can win the empty-slot race — the consumer then waits for
            // frame j forever while worker j waits for a slot that can never
            // free (deadlock observed under scheduler skew).  Only the
            // earliest pending job for the slot may fill it.
            Slot& s = slots[job % capacity];
            std::unique_lock<std::mutex> lk(mu);
            cv_free.wait(lk, [&] {
                return stop.load()
                    || (s.status == 0 && job < next_out + capacity);
            });
            if (stop.load()) return;
            s.pixels.swap(pixels);
            s.width = w; s.height = h; s.channels = ch; s.bit_depth = bd;
            s.index = int(job);
            s.status = status;
            cv_ready.notify_all();
        }
    }
};

}  // namespace

extern "C" {

// paths: '\n'-joined file list.  threads: decode workers.  capacity: ring
// slots.  Returns opaque handle (or null).
void* loader_open(const char* paths, int threads, int capacity) {
    auto* L = new Loader(size_t(capacity > 0 ? capacity : 8));
    const char* p = paths;
    while (*p) {
        const char* e = strchr(p, '\n');
        size_t n = e ? size_t(e - p) : strlen(p);
        if (n) L->paths.emplace_back(p, n);
        p += n;
        if (*p == '\n') ++p;
    }
    int nt = threads > 0 ? threads : 2;
    for (int i = 0; i < nt; ++i)
        L->workers.emplace_back([L] { L->worker(); });
    return L;
}

int loader_count(void* handle) {
    return int(static_cast<Loader*>(handle)->paths.size());
}

// Blocks until the NEXT in-order frame is decoded.  Fills metadata and
// returns 0 (frame ready), 1 (end of stream), or <0 (decode error for
// that frame — stream continues at the following index).
int loader_next_info(void* handle, int* index, int* width, int* height,
                     int* channels, int* bit_depth) {
    auto* L = static_cast<Loader*>(handle);
    if (L->next_out >= L->paths.size()) return 1;
    Slot& s = L->slots[L->next_out % L->capacity];
    std::unique_lock<std::mutex> lk(L->mu);
    L->cv_ready.wait(lk, [&] {
        return L->stop.load()
            || (s.status != 0 && s.index == int(L->next_out));
    });
    if (L->stop.load()) return 2;
    *index = s.index;
    *width = s.width;
    *height = s.height;
    *channels = s.channels;
    *bit_depth = s.bit_depth;
    return s.status == 1 ? 0 : s.status;
}

// Copies the current frame's pixels into `out` (size out_size) and frees
// the slot.  Call after loader_next_info returned 0.
int loader_take(void* handle, uint8_t* out, size_t out_size) {
    auto* L = static_cast<Loader*>(handle);
    Slot& s = L->slots[L->next_out % L->capacity];
    {
        std::unique_lock<std::mutex> lk(L->mu);
        if (s.status == 1 && out != nullptr) {
            if (out_size < s.pixels.size()) return -6;
            memcpy(out, s.pixels.data(), s.pixels.size());
        }
        s.status = 0;
        s.index = -1;
        L->next_out++;
        L->cv_free.notify_all();
    }
    return 0;
}

// Skip the current (errored) frame without copying.
int loader_skip(void* handle) {
    return loader_take(handle, nullptr, size_t(-1));
}

void loader_close(void* handle) {
    auto* L = static_cast<Loader*>(handle);
    L->stop.store(true);
    L->cv_ready.notify_all();
    L->cv_free.notify_all();
    for (auto& t : L->workers) t.join();
    delete L;
}

}  // extern "C"
