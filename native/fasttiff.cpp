// Native TIFF strip decoders: LZW (compression=5) and PackBits (32773).
//
// The framework ships its own TIFF codec (ptv_interpolation_tpu/io/tiff.py
// — tifffile is not in the image; the reference reads masks through it,
// /root/reference/interpolator.py:28-39). The pure-Python LZW decoder is
// correct but runs at well under 1 MB/s on literal-heavy streams — a
// production-sized 657³ u8 scan (284 MB decoded) would take the better
// part of an hour. This native decoder implements the identical TIFF 6.0
// semantics (MSB-first bit packing, ClearCode 256 / EOI 257, 9→12-bit
// codes with "early change" width bumps when len(table)+1 reaches
// 1<<width) at memory speed, bound via ctypes
// (ptv_interpolation_tpu/io/fasttiff.py) with silent fallback to the
// Python decoder when the library isn't built.
//
// Build: native/build.sh  →  native/libptvtiff.so

#include <cstdint>
#include <cstring>

namespace {

constexpr int kClear = 256;
constexpr int kEoi = 257;
constexpr int kMaxCodes = 1 << 12;

struct Table {
  // entry i (>= 258): previous code + one byte; chain walk reconstructs
  int16_t prev[kMaxCodes];
  uint8_t last[kMaxCodes];
  uint8_t first[kMaxCodes];  // first byte of the expansion (memoized)
  int len;

  void reset() { len = 258; }

  int expand(int code, uint8_t* dst, long cap, long pos) const {
    // write expansion of `code` at dst[pos]; returns length or -1
    uint8_t buf[kMaxCodes];
    int n = 0;
    int c = code;
    while (c >= 258) {
      buf[n++] = last[c];
      c = prev[c];
    }
    buf[n++] = static_cast<uint8_t>(c);
    if (pos + n > cap) return -1;
    for (int i = 0; i < n; ++i) dst[pos + i] = buf[n - 1 - i];
    return n;
  }

  uint8_t first_byte(int code) const {
    return code < 256 ? static_cast<uint8_t>(code) : first[code];
  }
};

}  // namespace

extern "C" {

// Decode a TIFF-LZW strip. Returns bytes written (>= 0), or -1 on a
// corrupt stream, or -2 if dst_cap is too small. Truncated input streams
// return the bytes decoded so far (matching the Python decoder).
long ptv_lzw_decode(const uint8_t* src, long n_src, uint8_t* dst,
                    long dst_cap) {
  Table t;
  t.reset();
  int width = 9;
  int prev_code = -1;
  uint32_t bitbuf = 0;
  int nbits = 0;
  long pos = 0;
  long out = 0;

  for (;;) {
    while (nbits < width) {
      if (pos >= n_src) return out;  // truncated: return what we have
      bitbuf = (bitbuf << 8) | src[pos++];
      nbits += 8;
    }
    int code = (bitbuf >> (nbits - width)) & ((1u << width) - 1);
    nbits -= width;

    if (code == kClear) {
      t.reset();
      width = 9;
      prev_code = -1;
      continue;
    }
    if (code == kEoi) return out;

    int n;
    if (prev_code < 0) {
      if (code >= 256) return -1;
      if (out + 1 > dst_cap) return -2;
      dst[out] = static_cast<uint8_t>(code);
      n = 1;
    } else if (code < t.len) {
      n = t.expand(code, dst, dst_cap, out);
      if (n < 0) return -2;
      if (t.len < kMaxCodes) {
        t.prev[t.len] = static_cast<int16_t>(prev_code);
        t.last[t.len] = t.first_byte(code);
        t.first[t.len] = t.first_byte(prev_code);
        t.len++;
      }
    } else if (code == t.len) {
      // KwKwK case: entry = prev + first(prev)
      if (t.len >= kMaxCodes) return -1;
      t.prev[t.len] = static_cast<int16_t>(prev_code);
      t.last[t.len] = t.first_byte(prev_code);
      t.first[t.len] = t.first_byte(prev_code);
      t.len++;
      n = t.expand(code, dst, dst_cap, out);
      if (n < 0) return -2;
    } else {
      return -1;  // corrupt: code beyond table
    }
    out += n;
    prev_code = code;
    // early change: width grows one code before the table fills
    if (t.len + 1 >= (1 << width) && width < 12) width++;
  }
}

// PackBits RLE decode (compression=32773). Returns bytes written or -2
// when dst_cap is exceeded.
long ptv_packbits_decode(const uint8_t* src, long n_src, uint8_t* dst,
                         long dst_cap) {
  long i = 0;
  long out = 0;
  while (i < n_src) {
    int8_t h = static_cast<int8_t>(src[i++]);
    if (h == -128) continue;
    if (h >= 0) {
      long n = h + 1;
      if (i + n > n_src) n = n_src - i;
      if (out + n > dst_cap) return -2;
      std::memcpy(dst + out, src + i, n);
      i += n;
      out += n;
    } else {
      long n = 1 - h;
      if (i >= n_src) break;
      if (out + n > dst_cap) return -2;
      std::memset(dst + out, src[i++], n);
      out += n;
    }
  }
  return out;
}

}  // extern "C"
