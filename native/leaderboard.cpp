// _leaderboard: the exact pseudolabel top-K leaderboard cascade in C++.
//
// Semantics are IDENTICAL to the Python reference implementation
// (menghini_neurips23_tpu/pseudo/engine.py:leaderboard_top_k, which mirrors
// reference utils/clip_pseudolabels.py:47-109), including:
//  - boards below K keep arrival order (the board[-1] comparison point is the
//    most recent element, not the minimum);
//  - overflow re-sorts descending by (score, path) - Python tuple ordering
//    breaks score ties by path string, reverse=True;
//  - a sample rejected by its argmax class cascades to the remaining classes
//    in descending (score, column) order (Python sorts (prob, j) tuples, so
//    equal scores order by column index descending under reverse=True).
//
// Scores are float32 widened to double, matching Python's float() of a
// numpy float32.  For GRIP-scale pools (50k images x 100 classes) this is
// ~100x the Python loop.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Entry {
  double score;
  Py_ssize_t path_idx;
};

// Descending (score, path-string) — Python's sorted(..., reverse=True) on
// (float, str) tuples.
struct DescByScoreThenPath {
  const std::vector<std::string>* paths;
  bool operator()(const Entry& a, const Entry& b) const {
    if (a.score != b.score) return a.score > b.score;
    return (*paths)[static_cast<size_t>(a.path_idx)] >
           (*paths)[static_cast<size_t>(b.path_idx)];
  }
};

PyObject* py_leaderboard(PyObject*, PyObject* args) {
  Py_buffer probs_buf;
  PyObject* path_list;
  Py_ssize_t n, c, k;
  if (!PyArg_ParseTuple(args, "y*Onnn", &probs_buf, &path_list, &n, &c, &k))
    return nullptr;
  if (probs_buf.len < static_cast<Py_ssize_t>(sizeof(float)) * n * c) {
    PyBuffer_Release(&probs_buf);
    PyErr_SetString(PyExc_ValueError, "probs buffer too small");
    return nullptr;
  }
  std::vector<std::string> paths(static_cast<size_t>(n));
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* s = PyList_GetItem(path_list, i);
    const char* cs = PyUnicode_AsUTF8(s);
    if (!cs) {
      PyBuffer_Release(&probs_buf);
      return nullptr;
    }
    paths[static_cast<size_t>(i)] = cs;
  }
  const float* probs = reinterpret_cast<const float*>(probs_buf.buf);

  std::vector<std::vector<Entry>> boards(static_cast<size_t>(c));
  DescByScoreThenPath cmp{&paths};

  Py_BEGIN_ALLOW_THREADS
  std::vector<std::pair<double, Py_ssize_t>> order;  // (score, col)
  for (Py_ssize_t i = 0; i < n; ++i) {
    const float* row = probs + i * c;
    Py_ssize_t pred = 0;
    for (Py_ssize_t j = 1; j < c; ++j)
      if (row[j] > row[pred]) pred = j;  // numpy argmax: first max wins
    double score = static_cast<double>(row[pred]);
    auto& board = boards[static_cast<size_t>(pred)];
    if (static_cast<Py_ssize_t>(board.size()) < k) {
      board.push_back({score, i});
    } else if (board.back().score < score) {
      board.push_back({score, i});
      std::stable_sort(board.begin(), board.end(), cmp);
      board.resize(static_cast<size_t>(k));
    } else {
      // cascade: remaining classes by descending (score, column) — Python
      // sorts (prob, j) tuples reverse=True, so ties order by column DESC
      order.clear();
      order.reserve(static_cast<size_t>(c - 1));
      for (Py_ssize_t j = 0; j < c; ++j)
        if (j != pred) order.push_back({static_cast<double>(row[j]), j});
      std::sort(order.begin(), order.end(),
                [](const auto& a, const auto& b) {
                  if (a.first != b.first) return a.first > b.first;
                  return a.second > b.second;
                });
      for (const auto& [s, j] : order) {
        auto& b = boards[static_cast<size_t>(j)];
        if (static_cast<Py_ssize_t>(b.size()) < k) {
          b.push_back({s, i});
        } else if (b.back().score < s) {
          b.push_back({s, i});
          std::stable_sort(b.begin(), b.end(), cmp);
          b.resize(static_cast<size_t>(k));
        }
      }
    }
  }
  Py_END_ALLOW_THREADS

  PyObject* idx_out = PyList_New(0);
  PyObject* col_out = PyList_New(0);
  for (Py_ssize_t j = 0; j < c; ++j) {
    for (const Entry& e : boards[static_cast<size_t>(j)]) {
      PyObject* pi = PyLong_FromSsize_t(e.path_idx);
      PyObject* pj = PyLong_FromSsize_t(j);
      PyList_Append(idx_out, pi);
      PyList_Append(col_out, pj);
      Py_DECREF(pi);
      Py_DECREF(pj);
    }
  }
  PyBuffer_Release(&probs_buf);
  PyObject* result = PyTuple_Pack(2, idx_out, col_out);
  Py_DECREF(idx_out);
  Py_DECREF(col_out);
  return result;
}

PyMethodDef methods[] = {
    {"leaderboard", py_leaderboard, METH_VARARGS,
     "leaderboard(probs_f32_bytes, paths, n, c, k) -> (sample_indices, class_cols)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_leaderboard",
                      "exact pseudolabel leaderboard cascade", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__leaderboard(void) { return PyModule_Create(&module); }
