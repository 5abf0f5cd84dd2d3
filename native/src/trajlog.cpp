// Binary trajectory log: the rosbag-record replacement on the host side
// (reference records 4 topics per run, launch/whole_body_controller.launch:27-35).
//
// Fixed-schema frame stream with a tiny header; writes are appended into a
// growable in-memory buffer and flushed to disk once, so the 400 Hz control
// host loop never blocks on IO.  Read back with qwbc_trajlog_read (or
// directly with numpy.fromfile from Python — the layout is a flat f64 grid).
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct Log {
  uint32_t frame_doubles;
  std::vector<double> data;
};

constexpr uint32_t kMagic = 0x5142574au;  // "QBWJ"

}  // namespace

extern "C" {

void* qwbc_trajlog_create(uint32_t frame_doubles, uint64_t reserve_frames) {
  Log* log = new Log();
  log->frame_doubles = frame_doubles;
  log->data.reserve(frame_doubles * reserve_frames);
  return log;
}

void qwbc_trajlog_append(void* handle, const double* frame) {
  Log* log = static_cast<Log*>(handle);
  log->data.insert(log->data.end(), frame, frame + log->frame_doubles);
}

void qwbc_trajlog_append_many(void* handle, const double* frames, uint64_t n) {
  Log* log = static_cast<Log*>(handle);
  log->data.insert(log->data.end(), frames, frames + n * log->frame_doubles);
}

uint64_t qwbc_trajlog_num_frames(void* handle) {
  Log* log = static_cast<Log*>(handle);
  return log->data.size() / log->frame_doubles;
}

int qwbc_trajlog_flush(void* handle, const char* path) {
  Log* log = static_cast<Log*>(handle);
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  uint32_t header[4] = {kMagic, 1u, log->frame_doubles, 0u};
  uint64_t n = log->data.size() / log->frame_doubles;
  std::fwrite(header, sizeof(uint32_t), 4, f);
  std::fwrite(&n, sizeof(uint64_t), 1, f);
  std::fwrite(log->data.data(), sizeof(double), log->data.size(), f);
  std::fclose(f);
  return 0;
}

// Returns number of frames; copies up to max_doubles into out.  Call with
// out == nullptr to query the size first.
int64_t qwbc_trajlog_read(const char* path, double* out, uint64_t max_doubles,
                          uint32_t* frame_doubles_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  uint32_t header[4];
  uint64_t n;
  if (std::fread(header, sizeof(uint32_t), 4, f) != 4 || header[0] != kMagic ||
      std::fread(&n, sizeof(uint64_t), 1, f) != 1) {
    std::fclose(f);
    return -2;
  }
  if (frame_doubles_out) *frame_doubles_out = header[2];
  if (out) {
    uint64_t total = n * header[2];
    if (total > max_doubles) total = max_doubles;
    if (std::fread(out, sizeof(double), total, f) != total) {
      std::fclose(f);
      return -3;
    }
  }
  std::fclose(f);
  return static_cast<int64_t>(n);
}

void qwbc_trajlog_destroy(void* handle) { delete static_cast<Log*>(handle); }

}  // extern "C"
