// Fast multithreaded PTV CSV parser.
//
// The reference ingests tracked-vector CSVs through pandas
// (/root/reference/interpolator.py:9-26). At production scale (1M+ rows,
// SURVEY §6) ingest is host-bound, so this framework ships a native
// parser: mmap the file, split at newline boundaries across hardware
// threads, parse with std::from_chars, and hand a packed float32
// (n, 6) = (x, y, z, u, v, w) block back through a C ABI consumed via
// ctypes (ptv_interpolation_tpu/io/fastcsv.py). Column aliases vx/vy/vz
// are honored like the python loader.
//
// Build: native/build.sh  →  native/libptvcsv.so

#include <algorithm>
#include <cctype>
#include <charconv>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Chunk {
  const char* begin;
  const char* end;
  std::vector<float> rows;  // packed 6-wide
  bool ok = true;
  long bad_line = -1;
};

// parse one line given the source-column -> output-slot mapping
inline bool parse_line(const char* p, const char* end, const int* slot,
                       int n_cols, float* out) {
  int col = 0;
  bool any = false;
  while (p < end && col < n_cols) {
    const char* field_end = static_cast<const char*>(
        memchr(p, ',', static_cast<size_t>(end - p)));
    if (field_end == nullptr) field_end = end;
    int s = slot[col];
    if (s >= 0) {
      // skip surrounding spaces
      const char* b = p;
      while (b < field_end && isspace(static_cast<unsigned char>(*b))) ++b;
      float v;
      auto res = std::from_chars(b, field_end, v);
      if (res.ec != std::errc()) return false;
      out[s] = v;
      any = true;
    }
    ++col;
    p = field_end + 1;
  }
  return any;
}

void parse_chunk(Chunk* c, const int* slot, int n_cols) {
  const char* p = c->begin;
  const char* end = c->end;
  c->rows.reserve(4096 * 6);
  float row[6];
  while (p < end) {
    const char* nl = static_cast<const char*>(
        memchr(p, '\n', static_cast<size_t>(end - p)));
    const char* line_end = nl ? nl : end;
    const char* trimmed_end = line_end;
    while (trimmed_end > p && (trimmed_end[-1] == '\r')) --trimmed_end;
    if (trimmed_end > p) {
      for (float& f : row) f = 0.0f;
      if (parse_line(p, trimmed_end, slot, n_cols, row)) {
        c->rows.insert(c->rows.end(), row, row + 6);
      } else {
        c->ok = false;
        return;
      }
    }
    if (!nl) break;
    p = nl + 1;
  }
}

}  // namespace

extern "C" {

struct PtvCsvResult {
  float* data;   // (n, 6) row-major
  long n_rows;
  int ok;
  char err[256];
};

PtvCsvResult* ptv_csv_load(const char* path) {
  auto* res = new PtvCsvResult{nullptr, 0, 0, {0}};

  int fd = open(path, O_RDONLY);
  if (fd < 0) {
    snprintf(res->err, sizeof(res->err), "cannot open %s", path);
    return res;
  }
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size == 0) {
    close(fd);
    snprintf(res->err, sizeof(res->err), "empty or unreadable file");
    return res;
  }
  size_t size = static_cast<size_t>(st.st_size);
  const char* data =
      static_cast<const char*>(mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0));
  close(fd);
  if (data == MAP_FAILED) {
    snprintf(res->err, sizeof(res->err), "mmap failed");
    return res;
  }

  // ---- header: map columns to output slots x y z u v w ----
  const char* hdr_end = static_cast<const char*>(memchr(data, '\n', size));
  if (!hdr_end) {
    munmap(const_cast<char*>(data), size);
    snprintf(res->err, sizeof(res->err), "no header line");
    return res;
  }
  std::string header(data, hdr_end);
  if (!header.empty() && header.back() == '\r') header.pop_back();
  std::vector<int> slot;
  {
    size_t pos = 0;
    bool seen[6] = {false};
    while (pos <= header.size()) {
      size_t comma = header.find(',', pos);
      std::string name = header.substr(
          pos, comma == std::string::npos ? std::string::npos : comma - pos);
      // trim + lowercase
      while (!name.empty() && isspace(static_cast<unsigned char>(name.front())))
        name.erase(name.begin());
      while (!name.empty() && isspace(static_cast<unsigned char>(name.back())))
        name.pop_back();
      for (char& ch : name) ch = static_cast<char>(tolower(ch));
      int s = -1;
      if (name == "x") s = 0;
      else if (name == "y") s = 1;
      else if (name == "z") s = 2;
      else if (name == "u" || name == "vx") s = 3;
      else if (name == "v" || name == "vy") s = 4;
      else if (name == "w" || name == "vz") s = 5;
      if (s >= 0) seen[s] = true;
      slot.push_back(s);
      if (comma == std::string::npos) break;
      pos = comma + 1;
    }
    for (int i = 0; i < 6; ++i) {
      if (!seen[i]) {
        munmap(const_cast<char*>(data), size);
        snprintf(res->err, sizeof(res->err),
                 "CSV must contain columns x,y,z,u,v,w (or vx,vy,vz)");
        return res;
      }
    }
  }

  const char* body = hdr_end + 1;
  const char* end = data + size;

  // ---- split into newline-aligned chunks ----
  unsigned n_threads = std::max(1u, std::thread::hardware_concurrency());
  size_t body_size = static_cast<size_t>(end - body);
  n_threads = static_cast<unsigned>(
      std::min<size_t>(n_threads, body_size / (1 << 16) + 1));
  std::vector<Chunk> chunks(n_threads);
  const char* cur = body;
  for (unsigned t = 0; t < n_threads; ++t) {
    const char* cend =
        (t + 1 == n_threads) ? end : body + body_size * (t + 1) / n_threads;
    if (cend < end) {
      const char* nl = static_cast<const char*>(
          memchr(cend, '\n', static_cast<size_t>(end - cend)));
      cend = nl ? nl + 1 : end;
    }
    if (cend < cur) cend = cur;
    chunks[t].begin = cur;
    chunks[t].end = cend;
    cur = cend;
  }

  std::vector<std::thread> threads;
  for (auto& c : chunks) {
    threads.emplace_back(parse_chunk, &c, slot.data(),
                         static_cast<int>(slot.size()));
  }
  for (auto& th : threads) th.join();
  munmap(const_cast<char*>(data), size);

  size_t total = 0;
  for (auto& c : chunks) {
    if (!c.ok) {
      snprintf(res->err, sizeof(res->err), "malformed numeric field");
      return res;
    }
    total += c.rows.size();
  }
  res->data = static_cast<float*>(malloc(total * sizeof(float)));
  if (!res->data) {
    snprintf(res->err, sizeof(res->err), "allocation failed");
    return res;
  }
  size_t off = 0;
  for (auto& c : chunks) {
    memcpy(res->data + off, c.rows.data(), c.rows.size() * sizeof(float));
    off += c.rows.size();
  }
  res->n_rows = static_cast<long>(total / 6);
  res->ok = 1;
  return res;
}

void ptv_csv_free(PtvCsvResult* res) {
  if (res) {
    free(res->data);
    delete res;
  }
}

}  // extern "C"
