// Native data-loader: minimal, fast PNG decoder (SURVEY C1; the
// framework's C++ component — the reference family's only native-code
// candidate is the data path / correlation op, and the correlation is a
// Pallas TPU kernel here, so the host-side decoder is the C++ piece).
//
// Why: this box drives a v5e chip from ONE CPU core; the pipelined input
// feed (parallel/feed.py) lives or dies on decode throughput. This
// decoder parses IHDR/IDAT/IEND, inflates with zlib, and runs the PNG
// unfilter loop in tight -O3 C++ with the GIL RELEASED, so decode truly
// overlaps with JAX dispatch in the feed thread. Supports the formats
// KITTI/NYU actually use: 8-bit RGB/RGBA/gray and 16-bit gray (depth /
// disparity GT). Everything else falls back to PIL (data/io.py).
//
// CPython C API only (pybind11 is not in this image).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <libdeflate.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Png {
  uint32_t width = 0, height = 0;
  int bit_depth = 0;    // 8 or 16
  int color_type = 0;   // 0 gray, 2 rgb, 4 gray+a, 6 rgba
  int channels = 0;
  std::vector<uint8_t> idat;  // concatenated compressed stream
};

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

// Parse chunks; returns empty string on success, error message otherwise.
std::string parse(const uint8_t* data, size_t len, Png* out) {
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 || std::memcmp(data, kSig, 8) != 0) return "not a PNG";
  size_t pos = 8;
  bool saw_ihdr = false;
  while (pos + 8 <= len) {
    uint32_t clen = be32(data + pos);
    const uint8_t* type = data + pos + 4;
    const uint8_t* body = data + pos + 8;
    if (pos + 12 + clen > len) return "truncated chunk";
    if (std::memcmp(type, "IHDR", 4) == 0) {
      if (clen != 13) return "bad IHDR";
      out->width = be32(body);
      out->height = be32(body + 4);
      out->bit_depth = body[8];
      out->color_type = body[9];
      if (body[10] != 0 || body[11] != 0) return "unsupported compression";
      if (body[12] != 0) return "interlaced PNG unsupported";
      saw_ihdr = true;
    } else if (std::memcmp(type, "PLTE", 4) == 0) {
      return "palette PNG unsupported";
    } else if (std::memcmp(type, "IDAT", 4) == 0) {
      out->idat.insert(out->idat.end(), body, body + clen);
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + clen;
  }
  if (!saw_ihdr) return "missing IHDR";
  switch (out->color_type) {
    case 0: out->channels = 1; break;
    case 2: out->channels = 3; break;
    case 4: out->channels = 2; break;
    case 6: out->channels = 4; break;
    default: return "unsupported color type";
  }
  if (out->bit_depth != 8 && out->bit_depth != 16) return "unsupported bit depth";
  if (out->bit_depth == 16 && out->color_type != 0)
    return "16-bit supported for grayscale only";
  if (out->width == 0 || out->height == 0) return "empty image";
  return "";
}

std::string inflate_all(const std::vector<uint8_t>& in, std::vector<uint8_t>* out) {
  // libdeflate single-shot zlib decompress: 2-3x faster than zlib's
  // streaming inflate, and we know the exact output size up front
  // (height * (stride + 1)).
  libdeflate_decompressor* d = libdeflate_alloc_decompressor();
  if (!d) return "libdeflate_alloc_decompressor failed";
  size_t actual = 0;
  libdeflate_result ret = libdeflate_zlib_decompress(
      d, in.data(), in.size(), out->data(), out->size(), &actual);
  libdeflate_free_decompressor(d);
  if (ret != LIBDEFLATE_SUCCESS) return "zlib decompress failed";
  if (actual != out->size()) return "unexpected inflated size";
  return "";
}

inline uint8_t paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return static_cast<uint8_t>(a);
  if (pb <= pc) return static_cast<uint8_t>(b);
  return static_cast<uint8_t>(c);
}

// In-place per-row unfilter; raw = height rows of (1 filter byte + stride).
// Output written contiguously into dst (height * stride).
std::string unfilter(const Png& png, std::vector<uint8_t>& raw, uint8_t* dst) {
  const size_t bpp = static_cast<size_t>(png.channels) * (png.bit_depth / 8);
  const size_t stride = static_cast<size_t>(png.width) * bpp;
  const uint8_t* prev = nullptr;
  for (uint32_t y = 0; y < png.height; ++y) {
    const uint8_t* src = raw.data() + y * (stride + 1);
    uint8_t filter = src[0];
    const uint8_t* row = src + 1;
    uint8_t* out = dst + y * stride;
    switch (filter) {
      case 0:
        std::memcpy(out, row, stride);
        break;
      case 1:  // Sub
        std::memcpy(out, row, bpp);
        for (size_t i = bpp; i < stride; ++i) out[i] = row[i] + out[i - bpp];
        break;
      case 2:  // Up
        if (prev) {
          for (size_t i = 0; i < stride; ++i) out[i] = row[i] + prev[i];
        } else {
          std::memcpy(out, row, stride);
        }
        break;
      case 3:  // Average
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= bpp ? out[i - bpp] : 0;
          int b = prev ? prev[i] : 0;
          out[i] = row[i] + static_cast<uint8_t>((a + b) >> 1);
        }
        break;
      case 4:  // Paeth
        for (size_t i = 0; i < stride; ++i) {
          int a = i >= bpp ? out[i - bpp] : 0;
          int b = prev ? prev[i] : 0;
          int c = (prev && i >= bpp) ? prev[i - bpp] : 0;
          out[i] = row[i] + paeth(a, b, c);
        }
        break;
      default:
        return "bad filter byte";
    }
    prev = out;
  }
  return "";
}

PyObject* decode_png(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;

  Png png;
  std::string err;
  std::vector<uint8_t> pixels;
  size_t stride = 0;

  Py_BEGIN_ALLOW_THREADS;
  err = parse(static_cast<const uint8_t*>(buf.buf), buf.len, &png);
  if (err.empty()) {
    const size_t bpp = static_cast<size_t>(png.channels) * (png.bit_depth / 8);
    stride = static_cast<size_t>(png.width) * bpp;
    std::vector<uint8_t> raw(png.height * (stride + 1));
    err = inflate_all(png.idat, &raw);
    if (err.empty()) {
      pixels.resize(static_cast<size_t>(png.height) * stride);
      err = unfilter(png, raw, pixels.data());
    }
  }
  Py_END_ALLOW_THREADS;
  PyBuffer_Release(&buf);

  if (!err.empty()) {
    PyErr_SetString(PyExc_ValueError, err.c_str());
    return nullptr;
  }

  // Return (bytes, width, height, channels, bit_depth); numpy wrapping
  // happens in Python (keeps this module free of the numpy C API).
  PyObject* payload =
      PyBytes_FromStringAndSize(reinterpret_cast<const char*>(pixels.data()),
                                static_cast<Py_ssize_t>(pixels.size()));
  if (!payload) return nullptr;
  PyObject* result = Py_BuildValue("(NIIii)", payload, png.width, png.height,
                                   png.channels, png.bit_depth);
  return result;
}

PyMethodDef kMethods[] = {
    {"decode_png", decode_png, METH_VARARGS,
     "decode_png(data: bytes) -> (pixels: bytes, w, h, channels, bit_depth)\n"
     "8-bit gray/rgb/rgba or 16-bit gray (big-endian), non-interlaced."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_native", "native data-loader ops", -1, kMethods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) { return PyModule_Create(&kModule); }
