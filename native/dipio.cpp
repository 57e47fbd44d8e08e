// SPDX-License-Identifier: CECILL-2.1
//
// dipio — native I/O runtime for barc4dip_tpu.
//
// Components:
//   * EDF container codec: header scan (1024-byte-aligned ASCII blocks) and
//     zero-copy frame reads via pread into caller-provided buffers.
//   * Async stack prefetcher: a thread pool reads a list of EDF files ahead
//     of the consumer into a bounded ring of slots, so disk/codec latency
//     overlaps with host->device transfer and device compute.
//
// Plain C ABI (ctypes-friendly); no external dependencies.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <strings.h>
#include <sys/stat.h>
#include <sys/types.h>
#include <unistd.h>

namespace {

thread_local std::string g_last_error;

void set_error(const std::string& msg) { g_last_error = msg; }

// ---------------------------------------------------------------------------
// EDF parsing
// ---------------------------------------------------------------------------

constexpr size_t kHeaderBlock = 1024;

// dtype codes shared with the Python wrapper
enum DType : int {
  DT_I1 = 0, DT_U1, DT_I2, DT_U2, DT_I4, DT_U4, DT_I8, DT_U8, DT_F4, DT_F8,
};

int dtype_size(int code) {
  switch (code) {
    case DT_I1: case DT_U1: return 1;
    case DT_I2: case DT_U2: return 2;
    case DT_I4: case DT_U4: case DT_F4: return 4;
    default: return 8;
  }
}

bool parse_dtype(const std::string& name, int* code) {
  std::string s;
  s.reserve(name.size());
  for (char c : name) s.push_back(static_cast<char>(::tolower(c)));
  if (s == "signedbyte") *code = DT_I1;
  else if (s == "unsignedbyte") *code = DT_U1;
  else if (s == "signedshort") *code = DT_I2;
  else if (s == "unsignedshort") *code = DT_U2;
  else if (s == "signedinteger" || s == "signedlong") *code = DT_I4;
  else if (s == "unsignedinteger" || s == "unsignedlong") *code = DT_U4;
  else if (s == "signed64") *code = DT_I8;
  else if (s == "unsigned64") *code = DT_U8;
  else if (s == "floatvalue" || s == "float") *code = DT_F4;
  else if (s == "doublevalue" || s == "double") *code = DT_F8;
  else return false;
  return true;
}

struct FrameInfo {
  int64_t data_offset = 0;
  int64_t dim1 = 0;  // fast axis (columns)
  int64_t dim2 = 0;  // slow axis (rows)
  int dtype = DT_U2;
  bool little_endian = true;
  int64_t nbytes = 0;
};

struct EdfFile {
  int fd = -1;
  std::vector<FrameInfo> frames;
};

std::string header_value(const std::string& header, const std::string& key) {
  // headers are "Key = value ;" pairs separated by ';'
  size_t pos = 0;
  while (pos < header.size()) {
    size_t end = header.find(';', pos);
    if (end == std::string::npos) end = header.size();
    std::string item = header.substr(pos, end - pos);
    size_t eq = item.find('=');
    if (eq != std::string::npos) {
      std::string k = item.substr(0, eq);
      // trim
      k.erase(0, k.find_first_not_of(" \t\r\n"));
      k.erase(k.find_last_not_of(" \t\r\n") + 1);
      if (k == key) {
        std::string v = item.substr(eq + 1);
        v.erase(0, v.find_first_not_of(" \t\r\n"));
        v.erase(v.find_last_not_of(" \t\r\n") + 1);
        return v;
      }
    }
    pos = end + 1;
  }
  return {};
}

bool scan_edf(EdfFile* f, const char* path) {
  f->fd = ::open(path, O_RDONLY);
  if (f->fd < 0) {
    set_error(std::string("cannot open '") + path + "'");
    return false;
  }

  int64_t pos = 0;
  struct stat st;
  if (::fstat(f->fd, &st) != 0) {
    set_error("fstat failed");
    return false;
  }
  const int64_t fsize = st.st_size;

  while (pos < fsize) {
    // skip whitespace between frames
    char c = 0;
    while (pos < fsize) {
      if (::pread(f->fd, &c, 1, pos) != 1) {
        // a read failure inside the file is an I/O error, not end-of-scan:
        // returning success here would silently truncate the frame list
        set_error("read failed while scanning EDF headers");
        return false;
      }
      if (c == '{') break;
      if (c == '\n' || c == '\r' || c == ' ' || c == '\t') { pos++; continue; }
      set_error("malformed EDF header (expected '{')");
      return false;
    }
    if (pos >= fsize) break;

    // read blocks until '}' found
    std::string header;
    int64_t scan = pos + 1;
    int64_t brace_end = -1;
    while (brace_end < 0) {
      char buf[kHeaderBlock];
      ssize_t got = ::pread(f->fd, buf, kHeaderBlock, scan);
      if (got <= 0) {
        set_error("unterminated EDF header");
        return false;
      }
      for (ssize_t i = 0; i < got; ++i) {
        if (buf[i] == '}') {
          header.append(buf, buf + i);
          brace_end = scan + i;
          break;
        }
      }
      if (brace_end < 0) {
        header.append(buf, buf + got);
        scan += got;
      }
    }

    // Writers pad the header INSIDE the braces (512- or 1024-byte
    // multiples both exist); data begins right after the newline that
    // follows '}'. Never assume a block size.
    int64_t data_offset = brace_end + 1;
    while (data_offset < fsize) {
      char nl = 0;
      if (::pread(f->fd, &nl, 1, data_offset) != 1) break;
      ++data_offset;
      if (nl == '\n') break;
      if (nl != '\r' && nl != ' ' && nl != '\t') {
        // only trailing whitespace may sit between '}' and the newline
        set_error("malformed EDF header terminator (expected '}\\n')");
        return false;
      }
    }

    FrameInfo info;
    info.data_offset = data_offset;
    try {
      info.dim1 = std::stoll(header_value(header, "Dim_1"));
      info.dim2 = std::stoll(header_value(header, "Dim_2"));
    } catch (...) {
      set_error("EDF header missing Dim_1/Dim_2");
      return false;
    }
    if (info.dim1 <= 0 || info.dim2 <= 0 ||
        info.dim1 > (int64_t{1} << 28) || info.dim2 > (int64_t{1} << 28)) {
      // upper bound keeps dim1*dim2*itemsize far from int64 wraparound
      set_error("invalid EDF dimensions Dim_1=" + std::to_string(info.dim1) +
                ", Dim_2=" + std::to_string(info.dim2));
      return false;
    }
    std::string dt = header_value(header, "DataType");
    if (dt.empty()) dt = "UnsignedShort";
    if (!parse_dtype(dt, &info.dtype)) {
      set_error("unsupported EDF DataType '" + dt + "'");
      return false;
    }
    std::string bo = header_value(header, "ByteOrder");
    info.little_endian = bo.empty() ||
        strcasecmp(bo.c_str(), "LowByteFirst") == 0;
    info.nbytes = info.dim1 * info.dim2 * dtype_size(info.dtype);

    // Size (when sane) is the authoritative block length for advancing the
    // scan; a Size smaller than the payload means a corrupt header.
    int64_t block = info.nbytes;
    std::string size_str = header_value(header, "Size");
    if (!size_str.empty()) {
      try {
        int64_t declared = std::stoll(size_str);
        if (declared < info.nbytes) {
          set_error("EDF header Size=" + std::to_string(declared) +
                    " smaller than payload " + std::to_string(info.nbytes));
          return false;
        }
        if (declared > fsize) {
          // also guards the signed addition below: a crafted Size near
          // INT64_MAX would overflow data_offset + block (UB)
          set_error("EDF header Size=" + std::to_string(declared) +
                    " exceeds file size " + std::to_string(fsize));
          return false;
        }
        block = declared;
      } catch (...) {
        // unparsable Size: fall back to the computed payload length
      }
    }
    if (info.data_offset + info.nbytes > fsize) {
      set_error("EDF data block exceeds file size (truncated or corrupt)");
      return false;
    }

    f->frames.push_back(info);
    int64_t next = info.data_offset + block;
    if (next <= pos) {  // must strictly advance, whatever the header claims
      set_error("EDF frame scan did not advance (corrupt header values)");
      return false;
    }
    pos = next;
  }
  return true;
}

// ---------------------------------------------------------------------------
// TIFF parsing (baseline subset: uncompressed grayscale strips)
// ---------------------------------------------------------------------------
//
// Supports Compression=1, PhotometricInterpretation 0/1, SamplesPerPixel=1,
// BitsPerSample 8/16/32, SampleFormat uint/int/float, both byte orders
// (big-endian data is byteswapped to native LE on read), and multi-page
// files (IFD chains) exposed as frames.

struct TiffFrame {
  int64_t width = 0;
  int64_t height = 0;
  int dtype = DT_U2;
  int64_t nbytes = 0;
  std::vector<int64_t> strip_offsets;
  std::vector<int64_t> strip_bytecounts;
};

struct TiffFile {
  int fd = -1;
  bool big_endian = false;
  std::vector<TiffFrame> frames;
};

// In-place byteswap of a buffer of `nbytes` holding items of `isz` bytes.
void swap_to_native_le(uint8_t* out, int64_t nbytes, int isz) {
  if (isz <= 1) return;
  int64_t n = nbytes / isz;
  if (isz == 2) {
    auto* p = reinterpret_cast<uint16_t*>(out);
    for (int64_t i = 0; i < n; ++i) p[i] = __builtin_bswap16(p[i]);
  } else if (isz == 4) {
    auto* p = reinterpret_cast<uint32_t*>(out);
    for (int64_t i = 0; i < n; ++i) p[i] = __builtin_bswap32(p[i]);
  } else {
    auto* p = reinterpret_cast<uint64_t*>(out);
    for (int64_t i = 0; i < n; ++i) p[i] = __builtin_bswap64(p[i]);
  }
}

uint16_t tiff_rd16(const uint8_t* p, bool be) {
  return be ? static_cast<uint16_t>((p[0] << 8) | p[1])
            : static_cast<uint16_t>((p[1] << 8) | p[0]);
}

uint32_t tiff_rd32(const uint8_t* p, bool be) {
  return be ? (static_cast<uint32_t>(p[0]) << 24) | (p[1] << 16) | (p[2] << 8) | p[3]
            : (static_cast<uint32_t>(p[3]) << 24) | (p[2] << 16) | (p[1] << 8) | p[0];
}

// Read the value array of an IFD entry (BYTE/SHORT/LONG only). `fsize`
// bounds the allocation: an out-of-line value array larger than the file
// itself is a corrupt count, not a real tag.
bool tiff_entry_values(int fd, bool be, const uint8_t entry[12],
                       int64_t fsize, std::vector<uint64_t>* out) {
  uint16_t type = tiff_rd16(entry + 2, be);
  uint32_t count = tiff_rd32(entry + 4, be);
  size_t tsize;
  switch (type) {
    case 1: tsize = 1; break;  // BYTE
    case 3: tsize = 2; break;  // SHORT
    case 4: tsize = 4; break;  // LONG
    default: return false;
  }
  size_t total = tsize * count;
  if (total > 4 && static_cast<int64_t>(total) > fsize) return false;
  std::vector<uint8_t> buf(total);
  if (total <= 4) {
    std::memcpy(buf.data(), entry + 8, total);
  } else {
    uint32_t off = tiff_rd32(entry + 8, be);
    if (::pread(fd, buf.data(), total, off) != static_cast<ssize_t>(total))
      return false;
  }
  out->clear();
  out->reserve(count);
  for (uint32_t i = 0; i < count; ++i) {
    const uint8_t* p = buf.data() + i * tsize;
    if (tsize == 1) out->push_back(p[0]);
    else if (tsize == 2) out->push_back(tiff_rd16(p, be));
    else out->push_back(tiff_rd32(p, be));
  }
  return true;
}

bool scan_tiff(TiffFile* f, const char* path) {
  f->fd = ::open(path, O_RDONLY);
  if (f->fd < 0) {
    set_error(std::string("cannot open '") + path + "'");
    return false;
  }
  struct stat st;
  if (::fstat(f->fd, &st) != 0) {
    set_error("fstat failed");
    return false;
  }
  const int64_t fsize = st.st_size;
  uint8_t head[8];
  if (::pread(f->fd, head, 8, 0) != 8) {
    set_error("not a TIFF file (short header)");
    return false;
  }
  if (head[0] == 'I' && head[1] == 'I') f->big_endian = false;
  else if (head[0] == 'M' && head[1] == 'M') f->big_endian = true;
  else {
    set_error("not a TIFF file (bad byte-order mark)");
    return false;
  }
  const bool be = f->big_endian;
  if (tiff_rd16(head + 2, be) != 42) {
    set_error("not a TIFF file (bad magic; BigTIFF is unsupported)");
    return false;
  }

  uint32_t ifd_off = tiff_rd32(head + 4, be);
  int guard = 0;
  while (ifd_off != 0) {
    if (++guard > 65536) {
      set_error("TIFF IFD chain too long (cycle?)");
      return false;
    }
    uint8_t cntbuf[2];
    if (::pread(f->fd, cntbuf, 2, ifd_off) != 2) {
      set_error("truncated TIFF IFD");
      return false;
    }
    uint16_t n_entries = tiff_rd16(cntbuf, be);
    std::vector<uint8_t> entries(12 * static_cast<size_t>(n_entries) + 4);
    if (::pread(f->fd, entries.data(), entries.size(), ifd_off + 2) !=
        static_cast<ssize_t>(entries.size())) {
      set_error("truncated TIFF IFD entries");
      return false;
    }

    TiffFrame fr;
    uint64_t compression = 1, spp = 1, bits = 1, sample_format = 1;
    uint64_t photometric = 1, rows_per_strip = 0;
    bool has_dims = false;
    std::vector<uint64_t> vals;
    for (uint16_t i = 0; i < n_entries; ++i) {
      const uint8_t* e = entries.data() + 12 * static_cast<size_t>(i);
      uint16_t tag = tiff_rd16(e, be);
      switch (tag) {
        case 256: case 257: case 258: case 259: case 262:
        case 273: case 277: case 278: case 279: case 339:
          if (!tiff_entry_values(f->fd, be, e, fsize, &vals) || vals.empty()) {
            set_error("unreadable TIFF tag " + std::to_string(tag));
            return false;
          }
          break;
        default:
          continue;
      }
      switch (tag) {
        case 256: fr.width = static_cast<int64_t>(vals[0]); has_dims = true; break;
        case 257: fr.height = static_cast<int64_t>(vals[0]); break;
        case 258: bits = vals[0]; break;
        case 259: compression = vals[0]; break;
        case 262: photometric = vals[0]; break;
        case 273:
          fr.strip_offsets.assign(vals.begin(), vals.end());
          break;
        case 277: spp = vals[0]; break;
        case 278: rows_per_strip = vals[0]; break;
        case 279:
          fr.strip_bytecounts.assign(vals.begin(), vals.end());
          break;
        case 339: sample_format = vals[0]; break;
      }
    }
    ifd_off = tiff_rd32(entries.data() + 12 * static_cast<size_t>(n_entries), be);

    if (!has_dims || fr.width <= 0 || fr.height <= 0) {
      set_error("TIFF IFD missing image dimensions");
      return false;
    }
    if (compression != 1) {
      set_error("unsupported TIFF compression " + std::to_string(compression) +
                " (baseline uncompressed only)");
      return false;
    }
    if (spp != 1 || photometric > 1) {
      set_error("unsupported TIFF layout (grayscale single-sample only)");
      return false;
    }
    if (sample_format == 3) {
      if (bits != 32) {
        set_error("unsupported float TIFF bit depth " + std::to_string(bits));
        return false;
      }
      fr.dtype = DT_F4;
    } else if (sample_format == 1 || sample_format == 4) {
      if (bits == 8) fr.dtype = DT_U1;
      else if (bits == 16) fr.dtype = DT_U2;
      else if (bits == 32) fr.dtype = DT_U4;
      else {
        set_error("unsupported TIFF bit depth " + std::to_string(bits));
        return false;
      }
    } else if (sample_format == 2) {
      if (bits == 8) fr.dtype = DT_I1;
      else if (bits == 16) fr.dtype = DT_I2;
      else if (bits == 32) fr.dtype = DT_I4;
      else {
        set_error("unsupported TIFF bit depth " + std::to_string(bits));
        return false;
      }
    } else {
      set_error("unsupported TIFF SampleFormat " + std::to_string(sample_format));
      return false;
    }
    if (fr.strip_offsets.empty() ||
        fr.strip_bytecounts.size() != fr.strip_offsets.size()) {
      set_error("TIFF IFD missing strip offsets/byte counts");
      return false;
    }
    (void)rows_per_strip;  // implied by byte counts for uncompressed data
    // Overflow-safe bound BEFORE computing nbytes: uncompressed pixels can
    // never outnumber the file's bytes, and width*height*isz can wrap
    // int64 for crafted 2^31-scale tags, which would bypass the check.
    {
      const int64_t isz = dtype_size(fr.dtype);
      if (fr.width > fsize || fr.height > fsize ||
          fr.width > fsize / (fr.height * isz)) {
        set_error("TIFF dimensions exceed file size (corrupt header)");
        return false;
      }
    }
    fr.nbytes = fr.width * fr.height * dtype_size(fr.dtype);
    int64_t available = 0;
    for (int64_t bc : fr.strip_bytecounts) available += bc;
    if (available < fr.nbytes) {
      set_error("TIFF strips shorter than image size");
      return false;
    }
    f->frames.push_back(std::move(fr));
  }
  if (f->frames.empty()) {
    set_error("TIFF file has no IFDs");
    return false;
  }
  return true;
}

// Read one frame's strips into a contiguous buffer; byteswap to native LE.
bool tiff_read_frame(const TiffFile* f, const TiffFrame& fr, uint8_t* out) {
  int64_t remaining = fr.nbytes;
  uint8_t* dst = out;
  for (size_t s = 0; s < fr.strip_offsets.size() && remaining > 0; ++s) {
    int64_t take = fr.strip_bytecounts[s];
    if (take > remaining) take = remaining;
    if (::pread(f->fd, dst, take, fr.strip_offsets[s]) != take) {
      set_error("truncated TIFF strip");
      return false;
    }
    dst += take;
    remaining -= take;
  }
  if (remaining > 0) {
    set_error("truncated TIFF data");
    return false;
  }
  if (f->big_endian) swap_to_native_le(out, fr.nbytes, dtype_size(fr.dtype));
  return true;
}

// ---------------------------------------------------------------------------
// Async prefetcher
// ---------------------------------------------------------------------------

struct Slot {
  std::vector<uint8_t> data;
  int64_t dim1 = 0, dim2 = 0;
  int dtype = 0;
  int status = 0;  // 0 = empty, 1 = loading, 2 = ready, -1 = error
  std::string error;
};

// Load the first frame of an EDF or TIFF file (dispatch by magic bytes)
// into `local`. Data always arrives in native little-endian order:
// big-endian TIFF and HighByteFirst EDF payloads are byteswapped on read,
// so consumers (io/native.py AsyncStackLoader) can view every prefetched
// buffer as LE without a per-file flag.
bool read_first_frame(const std::string& path, Slot* local, std::string* err) {
  uint8_t magic[4] = {0, 0, 0, 0};
  {
    int fd = ::open(path.c_str(), O_RDONLY);
    if (fd < 0) {
      *err = "cannot open '" + path + "'";
      return false;
    }
    ::pread(fd, magic, 4, 0);
    ::close(fd);
  }
  const bool is_tiff =
      (magic[0] == 'I' && magic[1] == 'I' && magic[2] == 42 && magic[3] == 0) ||
      (magic[0] == 'M' && magic[1] == 'M' && magic[2] == 0 && magic[3] == 42);

  if (is_tiff) {
    TiffFile f;
    bool ok = scan_tiff(&f, path.c_str());
    if (ok) {
      const TiffFrame& fr = f.frames[0];
      local->data.resize(fr.nbytes);
      ok = tiff_read_frame(&f, fr, local->data.data());
      if (ok) {
        local->dim1 = fr.width;
        local->dim2 = fr.height;
        local->dtype = fr.dtype;
      }
    }
    if (!ok) *err = g_last_error;
    if (f.fd >= 0) ::close(f.fd);
    return ok;
  }

  EdfFile f;
  bool ok = scan_edf(&f, path.c_str());
  if (ok && f.frames.empty()) {
    ok = false;
    *err = "EDF file has no frames";
  } else if (ok) {
    const FrameInfo& info = f.frames[0];
    local->data.resize(info.nbytes);
    ssize_t got = ::pread(f.fd, local->data.data(), info.nbytes, info.data_offset);
    if (got != info.nbytes) {
      ok = false;
      *err = "truncated EDF data block";
    } else {
      if (!info.little_endian) {
        swap_to_native_le(local->data.data(), info.nbytes,
                          dtype_size(info.dtype));
      }
      local->dim1 = info.dim1;
      local->dim2 = info.dim2;
      local->dtype = info.dtype;
    }
  } else {
    *err = g_last_error;
  }
  if (f.fd >= 0) ::close(f.fd);
  return ok;
}

struct Prefetcher {
  std::vector<std::string> paths;
  std::vector<Slot> slots;          // one per file, filled ahead-of-need
  size_t window = 4;                // how far ahead workers may run
  std::atomic<size_t> next_job{0};
  size_t next_consume = 0;
  std::mutex mu;
  std::condition_variable cv_ready;  // consumer waits for slot ready
  std::condition_variable cv_space;  // workers wait for window space
  std::vector<std::thread> workers;
  std::atomic<bool> stop{false};

  ~Prefetcher() {
    {
      // set stop under the mutex: a worker between its wait-predicate check
      // and the actual sleep would otherwise miss the notification (lost
      // wakeup) and the join below would hang the process forever
      std::lock_guard<std::mutex> lk(mu);
      stop = true;
    }
    cv_space.notify_all();
    for (auto& t : workers) {
      if (t.joinable()) t.join();
    }
  }

  void worker() {
    for (;;) {
      size_t job = next_job.fetch_add(1);
      if (job >= paths.size() || stop) return;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_space.wait(lk, [&] { return stop || job < next_consume + window; });
        if (stop) return;
        slots[job].status = 1;
      }

      std::string err;
      Slot local;
      bool ok = false;
      try {
        ok = read_first_frame(paths[job], &local, &err);
      } catch (const std::exception& e) {
        // corrupt metadata can drive allocations past what the host can
        // give (bad_alloc/length_error); route it to the slot instead of
        // letting the exception terminate the process from this thread
        ok = false;
        err = std::string("prefetch failed: ") + e.what();
      } catch (...) {
        ok = false;
        err = "prefetch failed: unknown C++ exception";
      }

      {
        std::lock_guard<std::mutex> lk(mu);
        Slot& s = slots[job];
        s.data = std::move(local.data);
        s.dim1 = local.dim1;
        s.dim2 = local.dim2;
        s.dtype = local.dtype;
        s.status = ok ? 2 : -1;
        s.error = err;
      }
      cv_ready.notify_all();
    }
  }
};

}  // namespace

extern "C" {

const char* dipio_last_error() { return g_last_error.c_str(); }

// ---- EDF codec ----

void* dipio_edf_open(const char* path) {
  auto* f = new EdfFile();
  bool ok = false;
  try {
    ok = scan_edf(f, path);
  } catch (const std::exception& e) {
    // never let a C++ exception cross the C ABI into Python
    set_error(std::string("EDF scan failed: ") + e.what());
  } catch (...) {
    set_error("EDF scan failed: unknown C++ exception");
  }
  if (!ok) {
    if (f->fd >= 0) ::close(f->fd);
    delete f;
    return nullptr;
  }
  return f;
}

int dipio_edf_num_frames(void* handle) {
  return static_cast<int>(static_cast<EdfFile*>(handle)->frames.size());
}

int dipio_edf_frame_info(void* handle, int idx, int64_t* dim1, int64_t* dim2,
                         int* dtype, int* little_endian, int64_t* nbytes) {
  auto* f = static_cast<EdfFile*>(handle);
  if (idx < 0 || idx >= static_cast<int>(f->frames.size())) {
    set_error("frame index out of range");
    return -1;
  }
  const FrameInfo& info = f->frames[idx];
  *dim1 = info.dim1;
  *dim2 = info.dim2;
  *dtype = info.dtype;
  *little_endian = info.little_endian ? 1 : 0;
  *nbytes = info.nbytes;
  return 0;
}

int dipio_edf_read_frame(void* handle, int idx, void* out, int64_t cap) {
  auto* f = static_cast<EdfFile*>(handle);
  if (idx < 0 || idx >= static_cast<int>(f->frames.size())) {
    set_error("frame index out of range");
    return -1;
  }
  const FrameInfo& info = f->frames[idx];
  if (cap < info.nbytes) {
    set_error("output buffer too small");
    return -1;
  }
  ssize_t got = ::pread(f->fd, out, info.nbytes, info.data_offset);
  if (got != info.nbytes) {
    set_error("truncated EDF data block");
    return -1;
  }
  return 0;
}

void dipio_edf_close(void* handle) {
  auto* f = static_cast<EdfFile*>(handle);
  if (f->fd >= 0) ::close(f->fd);
  delete f;
}

// ---- TIFF codec (baseline uncompressed grayscale) ----

void* dipio_tiff_open(const char* path) {
  auto* f = new TiffFile();
  bool ok = false;
  try {
    ok = scan_tiff(f, path);
  } catch (const std::exception& e) {
    set_error(std::string("TIFF scan failed: ") + e.what());
  } catch (...) {
    set_error("TIFF scan failed: unknown C++ exception");
  }
  if (!ok) {
    if (f->fd >= 0) ::close(f->fd);
    delete f;
    return nullptr;
  }
  return f;
}

int dipio_tiff_num_frames(void* handle) {
  return static_cast<int>(static_cast<TiffFile*>(handle)->frames.size());
}

int dipio_tiff_frame_info(void* handle, int idx, int64_t* dim1, int64_t* dim2,
                          int* dtype, int* little_endian, int64_t* nbytes) {
  auto* f = static_cast<TiffFile*>(handle);
  if (idx < 0 || idx >= static_cast<int>(f->frames.size())) {
    set_error("frame index out of range");
    return -1;
  }
  const TiffFrame& fr = f->frames[idx];
  *dim1 = fr.width;
  *dim2 = fr.height;
  *dtype = fr.dtype;
  *little_endian = 1;  // data is byteswapped to native LE on read
  *nbytes = fr.nbytes;
  return 0;
}

int dipio_tiff_read_frame(void* handle, int idx, void* out, int64_t cap) {
  auto* f = static_cast<TiffFile*>(handle);
  if (idx < 0 || idx >= static_cast<int>(f->frames.size())) {
    set_error("frame index out of range");
    return -1;
  }
  const TiffFrame& fr = f->frames[idx];
  if (cap < fr.nbytes) {
    set_error("output buffer too small");
    return -1;
  }
  return tiff_read_frame(f, fr, static_cast<uint8_t*>(out)) ? 0 : -1;
}

void dipio_tiff_close(void* handle) {
  auto* f = static_cast<TiffFile*>(handle);
  if (f->fd >= 0) ::close(f->fd);
  delete f;
}

// ---- async prefetcher (first frame of each EDF/TIFF file in a path list) ----

void* dipio_prefetch_open(const char** paths, int n_paths, int n_threads,
                          int window) {
  Prefetcher* p = nullptr;
  try {
    p = new Prefetcher();
    p->paths.assign(paths, paths + n_paths);
    p->slots.resize(n_paths);
    p->window = window > 0 ? static_cast<size_t>(window) : 4;
    int threads = n_threads > 0 ? n_threads : 2;
    for (int i = 0; i < threads; ++i) {
      p->workers.emplace_back([p] { p->worker(); });
    }
    return p;
  } catch (const std::exception& e) {
    set_error(std::string("prefetch open failed: ") + e.what());
    delete p;
    return nullptr;
  } catch (...) {
    set_error("prefetch open failed: unknown C++ exception");
    delete p;
    return nullptr;
  }
}

// Blocks until the next in-order frame is ready; returns its geometry and
// copies the payload. Returns 0 on success, 1 when the sequence is
// exhausted, 2 when `cap` is too small (geometry is still filled so the
// caller can allocate exactly and retry — the frame stays queued), -1 on
// error.
int dipio_prefetch_next(void* handle, void* out, int64_t cap, int64_t* dim1,
                        int64_t* dim2, int* dtype) {
  auto* p = static_cast<Prefetcher*>(handle);
  if (p == nullptr) {
    set_error("prefetcher handle is null (already closed?)");
    return -1;
  }
  if (p->next_consume >= p->paths.size()) return 1;

  size_t idx = p->next_consume;
  std::unique_lock<std::mutex> lk(p->mu);
  p->cv_ready.wait(lk, [&] { return p->slots[idx].status == 2 || p->slots[idx].status == -1; });
  Slot& s = p->slots[idx];
  if (s.status == -1) {
    set_error(s.error);
    return -1;
  }
  if (cap < static_cast<int64_t>(s.data.size())) {
    *dim1 = s.dim1;
    *dim2 = s.dim2;
    *dtype = s.dtype;
    return 2;  // distinct code, not a string-matched error message
  }
  std::memcpy(out, s.data.data(), s.data.size());
  *dim1 = s.dim1;
  *dim2 = s.dim2;
  *dtype = s.dtype;
  s.data.clear();
  s.data.shrink_to_fit();
  p->next_consume++;
  lk.unlock();
  p->cv_space.notify_all();
  return 0;
}

void dipio_prefetch_close(void* handle) {
  delete static_cast<Prefetcher*>(handle);
}

}  // extern "C"
