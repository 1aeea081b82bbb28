// Minimal OpenEXR scanline reader/writer (tinyexr-style, self-contained).
//
// Replaces the reference's cv2 EXR IO (`/root/reference/utils/rend_util.py:
// 25-54` loads hdr/depth/normal EXRs; `utils/plots.py` writes them) in
// environments whose OpenCV build lacks EXR support. Scope: single-part
// scanline images, compression NONE(0)/ZIPS(2)/ZIP(3), pixel types
// UINT(0)/HALF(1)/FLOAT(2), up to 16 channels — everything the released
// I2-SDF datasets (Blender-written ZIP/HALF+FLOAT) and our own artifacts
// need. Requires zlib (-lz).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <algorithm>
#include <zlib.h>

extern "C" void i2sdf_free(void* p);  // defined in marching.cpp

namespace {

constexpr uint32_t kMagic = 20000630u;  // 0x01312f76 little-endian value

struct Channel {
  std::string name;
  int32_t pixel_type;  // 0 UINT, 1 HALF, 2 FLOAT
};

inline float half_to_float(uint16_t h) {
  uint32_t sign = (uint32_t)(h >> 15) << 31;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t mant = h & 0x3ff;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;
    } else {  // subnormal: normalize
      int e = -1;
      do { ++e; mant <<= 1; } while ((mant & 0x400) == 0);
      mant &= 0x3ff;
      bits = sign | ((uint32_t)(127 - 15 - e) << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7f800000u | (mant << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float f;
  std::memcpy(&f, &bits, 4);
  return f;
}

inline uint16_t float_to_half(float f) {
  uint32_t bits;
  std::memcpy(&bits, &f, 4);
  uint16_t sign = (uint16_t)((bits >> 16) & 0x8000u);
  int32_t exp = (int32_t)((bits >> 23) & 0xff) - 127 + 15;
  uint32_t mant = bits & 0x7fffffu;
  if (((bits >> 23) & 0xff) == 0xff) {  // inf/nan
    return (uint16_t)(sign | 0x7c00u | (mant ? 0x200u : 0u));
  }
  if (exp >= 31) return (uint16_t)(sign | 0x7c00u);  // overflow -> inf
  if (exp <= 0) {
    if (exp < -10) return sign;  // underflow -> 0
    mant |= 0x800000u;
    uint32_t shift = (uint32_t)(14 - exp);
    uint16_t h = (uint16_t)(sign | (mant >> shift));
    // round-to-nearest
    if ((mant >> (shift - 1)) & 1u) h = (uint16_t)(h + 1);
    return h;
  }
  uint16_t h = (uint16_t)(sign | ((uint32_t)exp << 10) | (mant >> 13));
  if (mant & 0x1000u) h = (uint16_t)(h + 1);  // round
  return h;
}

// OpenEXR zip pre/post filters: byte de/interleave + delta predictor.
void zip_postprocess(std::vector<uint8_t>& buf) {
  size_t n = buf.size();
  if (n == 0) return;
  // predictor decode
  for (size_t i = 1; i < n; ++i)
    buf[i] = (uint8_t)((int)buf[i - 1] + (int)buf[i] - 128);
  // interleave halves
  std::vector<uint8_t> out(n);
  const uint8_t* t1 = buf.data();
  const uint8_t* t2 = buf.data() + (n + 1) / 2;
  for (size_t i = 0; i < n; ++i)
    out[i] = (i & 1) ? *t2++ : *t1++;
  buf.swap(out);
}

void zip_preprocess(std::vector<uint8_t>& buf) {
  size_t n = buf.size();
  if (n == 0) return;
  std::vector<uint8_t> tmp(n);
  uint8_t* t1 = tmp.data();
  uint8_t* t2 = tmp.data() + (n + 1) / 2;
  for (size_t i = 0; i < n; ++i) {
    if (i & 1) *t2++ = buf[i]; else *t1++ = buf[i];
  }
  // predictor encode
  int prev = tmp[0];
  for (size_t i = 1; i < n; ++i) {
    int cur = tmp[i];
    tmp[i] = (uint8_t)(cur - prev + 128 + 256);
    prev = cur;
  }
  buf.swap(tmp);
}

struct Reader {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  bool read(void* dst, size_t n) {
    if ((size_t)(end - p) < n) { ok = false; return false; }
    std::memcpy(dst, p, n);
    p += n;
    return true;
  }
  bool read_cstr(std::string& s, size_t maxlen = 256) {
    s.clear();
    while (p < end && *p != 0 && s.size() < maxlen) s.push_back((char)*p++);
    if (p >= end || *p != 0) { ok = false; return false; }
    ++p;
    return true;
  }
  int32_t read_i32() { int32_t v = 0; read(&v, 4); return v; }
};

std::vector<uint8_t> read_file(const char* path) {
  std::vector<uint8_t> data;
  FILE* f = std::fopen(path, "rb");
  if (!f) return data;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (sz > 0) {
    data.resize((size_t)sz);
    if (std::fread(data.data(), 1, (size_t)sz, f) != (size_t)sz) data.clear();
  }
  std::fclose(f);
  return data;
}

}  // namespace

extern "C" {

// Reads an EXR. On success (rc 0): *data = malloc'd (h*w*c) float32 in
// file channel order, names_out = ';'-separated channel names (file
// order), caller buffer >= 256 bytes. rc: 1 open/magic, 2 unsupported,
// 3 corrupt.
int i2sdf_exr_read(const char* path, float** data, int32_t* height,
                   int32_t* width, int32_t* channels, char* names_out) {
  std::vector<uint8_t> file = read_file(path);
  if (file.size() < 8) return 1;
  Reader r{file.data(), file.data() + file.size()};
  uint32_t magic = (uint32_t)r.read_i32();
  int32_t version = r.read_i32();
  if (magic != kMagic) return 1;
  if ((version & 0x200) || (version & 0x800) || (version & 0x1000))
    return 2;  // tiled / deep / multipart unsupported

  std::vector<Channel> chans;
  int32_t compression = -1;
  int32_t xmin = 0, ymin = 0, xmax = -1, ymax = -1;
  bool have_dw = false;

  while (true) {
    std::string name;
    if (!r.read_cstr(name)) return 3;
    if (name.empty()) break;  // end of header
    std::string type;
    if (!r.read_cstr(type)) return 3;
    int32_t size = r.read_i32();
    if (size < 0 || (size_t)size > (size_t)(r.end - r.p)) return 3;
    const uint8_t* attr = r.p;
    if (name == "channels" && type == "chlist") {
      Reader cr{attr, attr + size};
      while (true) {
        std::string cname;
        if (!cr.read_cstr(cname)) return 3;
        if (cname.empty()) break;
        int32_t ptype = cr.read_i32();
        uint8_t plinear_reserved[4];
        cr.read(plinear_reserved, 4);
        int32_t xs = cr.read_i32(), ys = cr.read_i32();
        if (!cr.ok || ptype < 0 || ptype > 2) return 2;
        if (xs != 1 || ys != 1) return 2;  // subsampling unsupported
        chans.push_back({cname, ptype});
      }
    } else if (name == "compression" && type == "compression") {
      compression = attr[0];
    } else if (name == "dataWindow" && type == "box2i") {
      std::memcpy(&xmin, attr + 0, 4);
      std::memcpy(&ymin, attr + 4, 4);
      std::memcpy(&xmax, attr + 8, 4);
      std::memcpy(&ymax, attr + 12, 4);
      have_dw = true;
    }
    r.p += size;
  }
  if (!have_dw || chans.empty() || chans.size() > 16) return 2;
  if (compression != 0 && compression != 2 && compression != 3) return 2;

  const int64_t w = (int64_t)xmax - xmin + 1;
  const int64_t h = (int64_t)ymax - ymin + 1;
  if (w <= 0 || h <= 0 || w * h > (int64_t)1 << 30) return 3;
  const int c = (int)chans.size();
  const int lines_per_block = (compression == 3) ? 16 : 1;
  const int64_t n_blocks = (h + lines_per_block - 1) / lines_per_block;

  // line offset table
  std::vector<uint64_t> offsets((size_t)n_blocks);
  if (!r.read(offsets.data(), (size_t)n_blocks * 8)) return 3;

  size_t pix_size = 0;  // bytes per pixel across channels
  std::vector<size_t> ch_bytes(c);
  for (int i = 0; i < c; ++i) {
    ch_bytes[i] = (chans[i].pixel_type == 1) ? 2 : 4;
    pix_size += ch_bytes[i];
  }

  float* out = (float*)std::malloc((size_t)(h * w * c) * sizeof(float));
  if (!out) return 3;

  std::vector<uint8_t> packed, raw;
  for (int64_t b = 0; b < n_blocks; ++b) {
    if (offsets[b] + 8 > file.size()) { std::free(out); return 3; }
    const uint8_t* cp = file.data() + offsets[b];
    int32_t y0, psize;
    std::memcpy(&y0, cp, 4);
    std::memcpy(&psize, cp + 4, 4);
    cp += 8;
    if (psize < 0 ||
        (size_t)(cp - file.data()) + (size_t)psize > file.size()) {
      std::free(out);
      return 3;
    }
    int64_t lines = std::min<int64_t>(lines_per_block, ymax - (y0 - 1) - ymin
                                      - (y0 - ymin) + lines_per_block);
    lines = std::min<int64_t>(lines_per_block, h - (y0 - ymin));
    const size_t unpacked = (size_t)lines * w * pix_size;
    raw.resize(unpacked);
    if (compression == 0 || (size_t)psize >= unpacked) {
      if ((size_t)psize < unpacked) { std::free(out); return 3; }
      std::memcpy(raw.data(), cp, unpacked);
    } else {
      uLongf dst_len = (uLongf)unpacked;
      if (uncompress(raw.data(), &dst_len, cp, (uLong)psize) != Z_OK ||
          dst_len != unpacked) {
        std::free(out);
        return 3;
      }
      zip_postprocess(raw);
    }
    // unpack scanlines: per line, per channel, w * ch_bytes
    const uint8_t* sp = raw.data();
    for (int64_t ln = 0; ln < lines; ++ln) {
      int64_t y = (y0 - ymin) + ln;
      for (int ci = 0; ci < c; ++ci) {
        float* dst = out + (y * w) * c + ci;
        if (chans[ci].pixel_type == 1) {
          const uint16_t* hp = (const uint16_t*)sp;
          for (int64_t x = 0; x < w; ++x) dst[x * c] = half_to_float(hp[x]);
        } else if (chans[ci].pixel_type == 2) {
          const float* fp = (const float*)sp;
          for (int64_t x = 0; x < w; ++x) dst[x * c] = fp[x];
        } else {  // UINT
          const uint32_t* up = (const uint32_t*)sp;
          for (int64_t x = 0; x < w; ++x) dst[x * c] = (float)up[x];
        }
        sp += (size_t)w * ch_bytes[ci];
      }
    }
  }

  std::string names;
  for (int i = 0; i < c; ++i) {
    if (i) names += ';';
    names += chans[i].name;
  }
  std::snprintf(names_out, 256, "%s", names.c_str());
  *data = out;
  *height = (int32_t)h;
  *width = (int32_t)w;
  *channels = (int32_t)c;
  return 0;
}

// Writes a scanline EXR. data: (h*w*c) float32 in the order of `names`
// (';'-separated). as_half: store HALF pixels. compression: 0 none,
// 3 zip (16-line blocks). Channels are sorted to the EXR-required
// alphabetical order internally. rc 0 on success.
int i2sdf_exr_write(const char* path, const float* data, int32_t h,
                    int32_t w, int32_t c, const char* names,
                    int32_t as_half, int32_t compression) {
  if (h <= 0 || w <= 0 || c <= 0 || c > 16) return 2;
  if (compression != 0 && compression != 3) return 2;

  // split + sort channel names (EXR requires alphabetical order)
  std::vector<std::string> nm;
  {
    std::string s(names ? names : "");
    size_t start = 0;
    while (start <= s.size() && nm.size() < (size_t)c) {
      size_t pos = s.find(';', start);
      if (pos == std::string::npos) pos = s.size();
      nm.push_back(s.substr(start, pos - start));
      start = pos + 1;
    }
    while ((int)nm.size() < c) nm.push_back("C" + std::to_string(nm.size()));
  }
  std::vector<int> order(c);
  for (int i = 0; i < c; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return nm[a] < nm[b]; });

  FILE* f = std::fopen(path, "wb");
  if (!f) return 1;

  auto put = [&](const void* p, size_t n) { std::fwrite(p, 1, n, f); };
  auto put_i32 = [&](int32_t v) { put(&v, 4); };
  auto put_str = [&](const char* s) { put(s, std::strlen(s) + 1); };
  auto put_attr = [&](const char* n, const char* t, const void* v,
                      int32_t sz) {
    put_str(n); put_str(t); put_i32(sz); put(v, (size_t)sz);
  };

  put_i32((int32_t)kMagic);
  put_i32(2);  // version, no flags

  // channels
  {
    std::string ch;
    for (int i = 0; i < c; ++i) {
      const std::string& n = nm[order[i]];
      ch.append(n.c_str(), n.size() + 1);
      int32_t ptype = as_half ? 1 : 2;
      char buf[16];
      std::memcpy(buf, &ptype, 4);
      buf[4] = 0; buf[5] = buf[6] = buf[7] = 0;  // pLinear + reserved
      int32_t one = 1;
      std::memcpy(buf + 8, &one, 4);
      std::memcpy(buf + 12, &one, 4);
      ch.append(buf, 16);
    }
    ch.push_back('\0');
    put_attr("channels", "chlist", ch.data(), (int32_t)ch.size());
  }
  {
    uint8_t comp = (uint8_t)compression;
    put_attr("compression", "compression", &comp, 1);
  }
  {
    int32_t box[4] = {0, 0, w - 1, h - 1};
    put_attr("dataWindow", "box2i", box, 16);
    put_attr("displayWindow", "box2i", box, 16);
  }
  {
    uint8_t lo = 0;  // increasing-y
    put_attr("lineOrder", "lineOrder", &lo, 1);
    float par = 1.0f;
    put_attr("pixelAspectRatio", "float", &par, 4);
    float swc[2] = {0.0f, 0.0f};
    put_attr("screenWindowCenter", "v2f", swc, 8);
    float sww = 1.0f;
    put_attr("screenWindowWidth", "float", &sww, 4);
  }
  put("\0", 1);  // end of header

  const int lines_per_block = (compression == 3) ? 16 : 1;
  const int64_t n_blocks = (h + lines_per_block - 1) / lines_per_block;
  const size_t ch_bytes = as_half ? 2 : 4;

  long table_pos = std::ftell(f);
  std::vector<uint64_t> offsets((size_t)n_blocks, 0);
  put(offsets.data(), (size_t)n_blocks * 8);  // placeholder

  std::vector<uint8_t> raw, packed;
  for (int64_t b = 0; b < n_blocks; ++b) {
    offsets[b] = (uint64_t)std::ftell(f);
    int64_t y0 = b * lines_per_block;
    int64_t lines = std::min<int64_t>(lines_per_block, h - y0);
    raw.resize((size_t)lines * w * c * ch_bytes);
    uint8_t* sp = raw.data();
    for (int64_t ln = 0; ln < lines; ++ln) {
      const float* row = data + ((y0 + ln) * w) * c;
      for (int ci = 0; ci < c; ++ci) {
        int src_ch = order[ci];
        if (as_half) {
          uint16_t* hp = (uint16_t*)sp;
          for (int64_t x = 0; x < w; ++x)
            hp[x] = float_to_half(row[x * c + src_ch]);
        } else {
          float* fp = (float*)sp;
          for (int64_t x = 0; x < w; ++x) fp[x] = row[x * c + src_ch];
        }
        sp += (size_t)w * ch_bytes;
      }
    }
    const uint8_t* payload = raw.data();
    size_t payload_size = raw.size();
    if (compression == 3) {
      packed = raw;
      zip_preprocess(packed);
      uLongf bound = compressBound((uLong)packed.size());
      std::vector<uint8_t> comp_buf(bound);
      if (compress2(comp_buf.data(), &bound, packed.data(),
                    (uLong)packed.size(), Z_DEFAULT_COMPRESSION) == Z_OK &&
          bound < raw.size()) {
        comp_buf.resize(bound);
        packed.swap(comp_buf);
        payload = packed.data();
        payload_size = packed.size();
      } else {
        payload = raw.data();
        payload_size = raw.size();
      }
    }
    put_i32((int32_t)y0);
    put_i32((int32_t)payload_size);
    put(payload, payload_size);
  }
  // back-patch the offset table
  std::fseek(f, table_pos, SEEK_SET);
  put(offsets.data(), (size_t)n_blocks * 8);
  std::fclose(f);
  return 0;
}

}  // extern "C"
