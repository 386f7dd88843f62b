// Native safetensors reader: mmap + zero-copy tensor views.
//
// Role: the reference's checkpoint I/O runs through Python safetensors
// (reference conceptmod/textsliders/lora.py:274-291, combine_loras.py:16-24).
// For multi-GB diffusers checkpoints (SDXL UNet ~5GB, Flux ~23GB) the
// Python path materializes copies on a single host core; this reader mmaps
// the file and hands the runtime zero-copy pointers so host RAM holds ONE
// shared page-cache copy and device uploads stream straight from it.
//
// C ABI (ctypes-friendly):
//   stw_open(path)                      -> handle (0 on failure)
//   stw_error()                         -> last error string
//   stw_tensor_count(h)
//   stw_tensor_name(h, i)               -> const char*
//   stw_tensor_dtype(h, i)              -> const char* ("F32", "F16", "BF16", ...)
//   stw_tensor_rank(h, i)
//   stw_tensor_shape(h, i, out int64_t*)
//   stw_tensor_data(h, i)               -> const void* (lives while open)
//   stw_tensor_nbytes(h, i)             -> int64_t
//   stw_metadata_json(h)                -> const char* ("" if none)
//   stw_close(h)
//
// The header is strict-subset JSON emitted by safetensors writers:
//   {"__metadata__":{..}, "name":{"dtype":"F32","shape":[..],
//    "data_offsets":[s,e]}, ...}
// The parser below handles exactly that grammar (strings with escapes,
// integer arrays, nested metadata object skipped verbatim).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

namespace {

struct TensorEntry {
  std::string name;
  std::string dtype;
  std::vector<int64_t> shape;
  int64_t begin = 0;
  int64_t end = 0;
};

struct File {
  int fd = -1;
  const uint8_t *map = nullptr;
  size_t size = 0;
  size_t data_base = 0;
  std::vector<TensorEntry> tensors;
  std::string metadata;
};

thread_local std::string g_error;

class Parser {
public:
  Parser(const char *p, size_t n) : p_(p), n_(n) {}

  bool parse(File &f) {
    skip_ws();
    if (!expect('{'))
      return false;
    skip_ws();
    if (peek() == '}')
      return true;
    while (true) {
      std::string key;
      if (!parse_string(key))
        return false;
      skip_ws();
      if (!expect(':'))
        return false;
      skip_ws();
      if (key == "__metadata__") {
        size_t start = i_;
        if (!skip_value())
          return false;
        f.metadata.assign(p_ + start, i_ - start);
      } else {
        TensorEntry e;
        e.name = key;
        if (!parse_tensor(e))
          return false;
        f.tensors.push_back(std::move(e));
      }
      skip_ws();
      char c = next();
      if (c == ',') {
        skip_ws();
        continue;
      }
      if (c == '}')
        return true;
      return fail("expected ',' or '}' in header object");
    }
  }

private:
  const char *p_;
  size_t n_;
  size_t i_ = 0;

  bool fail(const char *msg) {
    g_error = std::string("safetensors header parse error: ") + msg;
    return false;
  }
  char peek() { return i_ < n_ ? p_[i_] : '\0'; }
  char next() { return i_ < n_ ? p_[i_++] : '\0'; }
  void skip_ws() {
    while (i_ < n_ && (p_[i_] == ' ' || p_[i_] == '\t' || p_[i_] == '\n' || p_[i_] == '\r'))
      i_++;
  }
  bool expect(char c) {
    if (next() != c) {
      g_error = std::string("safetensors header parse error: expected '") + c + "'";
      return false;
    }
    return true;
  }

  bool parse_string(std::string &out) {
    if (!expect('"'))
      return false;
    out.clear();
    while (true) {
      char c = next();
      if (c == '\0')
        return fail("unterminated string");
      if (c == '"')
        return true;
      if (c == '\\') {
        char e = next();
        switch (e) {
        case '"': out.push_back('"'); break;
        case '\\': out.push_back('\\'); break;
        case '/': out.push_back('/'); break;
        case 'n': out.push_back('\n'); break;
        case 't': out.push_back('\t'); break;
        case 'r': out.push_back('\r'); break;
        case 'b': out.push_back('\b'); break;
        case 'f': out.push_back('\f'); break;
        case 'u': { // \uXXXX -- keep raw (names never need it)
          out.push_back('?');
          for (int k = 0; k < 4; k++) next();
          break;
        }
        default: return fail("bad escape");
        }
      } else {
        out.push_back(c);
      }
    }
  }

  bool parse_int(int64_t &out) {
    skip_ws();
    bool neg = false;
    if (peek() == '-') { neg = true; next(); }
    if (peek() < '0' || peek() > '9')
      return fail("expected integer");
    int64_t v = 0;
    while (peek() >= '0' && peek() <= '9')
      v = v * 10 + (next() - '0');
    out = neg ? -v : v;
    return true;
  }

  bool parse_int_array(std::vector<int64_t> &out) {
    if (!expect('['))
      return false;
    skip_ws();
    if (peek() == ']') { next(); return true; }
    while (true) {
      int64_t v;
      if (!parse_int(v))
        return false;
      out.push_back(v);
      skip_ws();
      char c = next();
      if (c == ',') continue;
      if (c == ']') return true;
      return fail("expected ',' or ']' in array");
    }
  }

  // skip any JSON value (used for __metadata__)
  bool skip_value() {
    skip_ws();
    char c = peek();
    if (c == '"') { std::string s; return parse_string(s); }
    if (c == '{' || c == '[') {
      char open = next(), close = (open == '{') ? '}' : ']';
      int depth = 1;
      while (depth > 0) {
        char d = next();
        if (d == '\0') return fail("unterminated value");
        if (d == '"') { i_--; std::string s; if (!parse_string(s)) return false; continue; }
        if (d == open) depth++;
        if (d == close) depth--;
      }
      return true;
    }
    while (i_ < n_ && p_[i_] != ',' && p_[i_] != '}' && p_[i_] != ']')
      i_++;
    return true;
  }

  bool parse_tensor(TensorEntry &e) {
    if (!expect('{'))
      return false;
    while (true) {
      skip_ws();
      std::string key;
      if (!parse_string(key))
        return false;
      skip_ws();
      if (!expect(':'))
        return false;
      skip_ws();
      if (key == "dtype") {
        if (!parse_string(e.dtype))
          return false;
      } else if (key == "shape") {
        if (!parse_int_array(e.shape))
          return false;
      } else if (key == "data_offsets") {
        std::vector<int64_t> off;
        if (!parse_int_array(off))
          return false;
        if (off.size() != 2)
          return fail("data_offsets must have 2 entries");
        e.begin = off[0];
        e.end = off[1];
      } else {
        if (!skip_value())
          return false;
      }
      skip_ws();
      char c = next();
      if (c == ',') continue;
      if (c == '}') return true;
      return fail("expected ',' or '}' in tensor entry");
    }
  }
};

} // namespace

extern "C" {

const char *stw_error() { return g_error.c_str(); }

void *stw_open(const char *path) {
  g_error.clear();
  File *f = new File();
  f->fd = ::open(path, O_RDONLY);
  if (f->fd < 0) {
    g_error = std::string("open failed: ") + path;
    delete f;
    return nullptr;
  }
  struct stat st;
  if (fstat(f->fd, &st) != 0 || st.st_size < 8) {
    g_error = "fstat failed or file too small";
    ::close(f->fd);
    delete f;
    return nullptr;
  }
  f->size = (size_t)st.st_size;
  f->map = (const uint8_t *)mmap(nullptr, f->size, PROT_READ, MAP_SHARED, f->fd, 0);
  if (f->map == MAP_FAILED) {
    g_error = "mmap failed";
    ::close(f->fd);
    delete f;
    return nullptr;
  }
  madvise((void *)f->map, f->size, MADV_SEQUENTIAL);
  uint64_t header_len;
  memcpy(&header_len, f->map, 8);
  if (8 + header_len > f->size) {
    g_error = "header length exceeds file size";
    munmap((void *)f->map, f->size);
    ::close(f->fd);
    delete f;
    return nullptr;
  }
  f->data_base = 8 + header_len;
  Parser parser((const char *)f->map + 8, header_len);
  if (!parser.parse(*f)) {
    munmap((void *)f->map, f->size);
    ::close(f->fd);
    delete f;
    return nullptr;
  }
  for (auto &t : f->tensors) {
    if (t.begin < 0 || (size_t)(f->data_base + t.end) > f->size || t.end < t.begin) {
      g_error = "tensor offsets out of bounds: " + t.name;
      munmap((void *)f->map, f->size);
      ::close(f->fd);
      delete f;
      return nullptr;
    }
  }
  return f;
}

int64_t stw_tensor_count(void *h) { return ((File *)h)->tensors.size(); }

const char *stw_tensor_name(void *h, int64_t i) {
  return ((File *)h)->tensors[i].name.c_str();
}

const char *stw_tensor_dtype(void *h, int64_t i) {
  return ((File *)h)->tensors[i].dtype.c_str();
}

int64_t stw_tensor_rank(void *h, int64_t i) {
  return ((File *)h)->tensors[i].shape.size();
}

void stw_tensor_shape(void *h, int64_t i, int64_t *out) {
  auto &s = ((File *)h)->tensors[i].shape;
  for (size_t k = 0; k < s.size(); k++)
    out[k] = s[k];
}

const void *stw_tensor_data(void *h, int64_t i) {
  File *f = (File *)h;
  return f->map + f->data_base + f->tensors[i].begin;
}

int64_t stw_tensor_nbytes(void *h, int64_t i) {
  auto &t = ((File *)h)->tensors[i];
  return t.end - t.begin;
}

const char *stw_metadata_json(void *h) { return ((File *)h)->metadata.c_str(); }

void stw_close(void *h) {
  File *f = (File *)h;
  if (f->map)
    munmap((void *)f->map, f->size);
  if (f->fd >= 0)
    ::close(f->fd);
  delete f;
}

} // extern "C"
