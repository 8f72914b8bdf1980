// Native IO runtime: mmap jsonl line indexing + threaded file prefetch.
//
// The reference leans on torch DataLoader's native worker pool for its eval
// datasets (MME/run_llava.py:45-92); this is the framework's equivalent
// native component for the host IO path: index multi-GB jsonl answer/question
// files without materializing them in Python, and prefetch image files with a
// background thread pool. Exposed to Python via ctypes (framework/native.py).
//
// Build: g++ -O3 -shared -fPIC -o libjsonl_loader.so jsonl_loader.cpp -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <fstream>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// jsonl indexing: return (offset, length) for every non-empty line
// ---------------------------------------------------------------------------

struct JsonlIndex {
  std::vector<int64_t> offsets;
  std::vector<int64_t> lengths;
  int fd = -1;
  const char* data = nullptr;
  int64_t size = 0;
};

void* jsonl_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    ::close(fd);
    return nullptr;
  }
  auto* idx = new JsonlIndex();
  idx->fd = fd;
  idx->size = st.st_size;
  if (st.st_size > 0) {
    idx->data =
        static_cast<const char*>(mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0));
    if (idx->data == MAP_FAILED) {
      ::close(fd);
      delete idx;
      return nullptr;
    }
    int64_t start = 0;
    for (int64_t i = 0; i < idx->size; ++i) {
      if (idx->data[i] == '\n') {
        if (i > start) {
          idx->offsets.push_back(start);
          idx->lengths.push_back(i - start);
        }
        start = i + 1;
      }
    }
    if (start < idx->size) {
      idx->offsets.push_back(start);
      idx->lengths.push_back(idx->size - start);
    }
  }
  return idx;
}

int64_t jsonl_num_lines(void* handle) {
  return static_cast<JsonlIndex*>(handle)->offsets.size();
}

// Copy line i into buf (caller-sized); returns the line length, or -1.
int64_t jsonl_get_line(void* handle, int64_t i, char* buf, int64_t buf_size) {
  auto* idx = static_cast<JsonlIndex*>(handle);
  if (i < 0 || i >= static_cast<int64_t>(idx->offsets.size())) return -1;
  int64_t n = idx->lengths[i];
  if (n > buf_size) return -n;  // tell caller the needed size
  std::memcpy(buf, idx->data + idx->offsets[i], n);
  return n;
}

void jsonl_close(void* handle) {
  auto* idx = static_cast<JsonlIndex*>(handle);
  if (idx->data && idx->size > 0) munmap(const_cast<char*>(idx->data), idx->size);
  if (idx->fd >= 0) ::close(idx->fd);
  delete idx;
}

// ---------------------------------------------------------------------------
// threaded file prefetcher: submit paths, collect bytes in order
// ---------------------------------------------------------------------------

struct Prefetcher {
  std::deque<std::pair<int64_t, std::string>> queue;
  std::map<int64_t, std::string> done;
  std::mutex mu;
  std::condition_variable cv_work, cv_done;
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  explicit Prefetcher(int n) {
    for (int i = 0; i < n; ++i) {
      workers.emplace_back([this] { run(); });
    }
  }

  void run() {
    for (;;) {
      std::pair<int64_t, std::string> job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [this] { return stop || !queue.empty(); });
        if (stop && queue.empty()) return;
        job = queue.front();
        queue.pop_front();
      }
      std::string contents;
      std::ifstream f(job.second, std::ios::binary);
      if (f) {
        f.seekg(0, std::ios::end);
        contents.resize(f.tellg());
        f.seekg(0);
        f.read(&contents[0], contents.size());
      }
      {
        std::lock_guard<std::mutex> lk(mu);
        done[job.first] = std::move(contents);
      }
      cv_done.notify_all();
    }
  }

  ~Prefetcher() {
    stop = true;
    cv_work.notify_all();
    for (auto& t : workers) t.join();
  }
};

void* prefetcher_create(int num_threads) { return new Prefetcher(num_threads); }

void prefetcher_submit(void* handle, int64_t ticket, const char* path) {
  auto* p = static_cast<Prefetcher*>(handle);
  {
    std::lock_guard<std::mutex> lk(p->mu);
    p->queue.emplace_back(ticket, std::string(path));
  }
  p->cv_work.notify_one();
}

// Blocks until ticket's file is read; returns size (0 = missing/empty).
int64_t prefetcher_wait_size(void* handle, int64_t ticket) {
  auto* p = static_cast<Prefetcher*>(handle);
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_done.wait(lk, [&] { return p->done.count(ticket) > 0; });
  return p->done[ticket].size();
}

// Copies the bytes out and releases the slot.
int64_t prefetcher_take(void* handle, int64_t ticket, char* buf, int64_t buf_size) {
  auto* p = static_cast<Prefetcher*>(handle);
  std::lock_guard<std::mutex> lk(p->mu);
  auto it = p->done.find(ticket);
  if (it == p->done.end()) return -1;
  int64_t n = it->second.size();
  if (n > buf_size) return -n;
  std::memcpy(buf, it->second.data(), n);
  p->done.erase(it);
  return n;
}

void prefetcher_destroy(void* handle) { delete static_cast<Prefetcher*>(handle); }

}  // extern "C"
