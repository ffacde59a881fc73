// mvc_tpu._native — C++ metrics runtime.
//
// Native equivalents of the reference's Java metric components (the only
// native code in the reference, SURVEY.md §2.2):
//   * meteor_stats : the METEOR alignment search (exact/stem/synonym
//                    candidate pairs; beam search maximizing matches, then
//                    minimizing chunks, then distance) — replaces
//                    meteor-1.5.jar's aligner hot path
//   * ptb_tokenize : Penn-Treebank word tokenization with the COCO
//                    punctuation-strip contract — replaces the CoreNLP
//                    PTBTokenizer subprocess
//   * lcs          : longest-common-subsequence length (ROUGE-L hot loop)
//
// Built as a plain CPython extension (no pybind11). Python-side fallbacks in
// mvc_tpu.evalcap produce identical results; tests assert equivalence.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <map>
#include <string>
#include <tuple>
#include <unordered_map>
#include <vector>

namespace {

// ------------------------------------------------------------------ helpers
std::vector<std::string> list_to_strings(PyObject* list) {
  std::vector<std::string> out;
  Py_ssize_t n = PyList_Size(list);
  out.reserve(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PyList_GetItem(list, i);  // borrowed
    Py_ssize_t len = 0;
    const char* s = PyUnicode_AsUTF8AndSize(item, &len);
    out.emplace_back(s, static_cast<size_t>(len));
  }
  return out;
}

PyObject* strings_to_list(const std::vector<std::string>& v) {
  PyObject* out = PyList_New(static_cast<Py_ssize_t>(v.size()));
  for (size_t i = 0; i < v.size(); ++i) {
    PyList_SetItem(out, static_cast<Py_ssize_t>(i),
                   PyUnicode_FromStringAndSize(v[i].data(), v[i].size()));
  }
  return out;
}

// ------------------------------------------------------------------ METEOR
// Meteor-1.5 alignment SEARCH, identical to mvc_tpu.evalcap.meteor._align:
// over all one-to-one matchings drawn from the exact/stem/synonym candidate
// pairs, pick the one that lexicographically (1) maximizes matches,
// (2) minimizes chunks, (3) minimizes summed |i-j| distance, (4) maximizes
// summed stage weight.  Beam search over hypothesis positions with exact
// per-(used-ref-mask, last-match) dominance; ref sentences are capped at 64
// words (the mask width) — the Python wrapper routes longer ones to its own
// unbounded-mask implementation.
constexpr int kBeamWidth = 512;  // matches meteor.py BEAM_WIDTH

struct AlignState {
  uint64_t mask = 0;     // used ref positions
  int last_h = -2;       // last matched hyp position
  int last_r = -2;       // last matched ref position
  int matches = 0;
  int chunks = 0;
  int dist = 0;
  double weighted = 0.0;
};

bool align_better(const AlignState& a, const AlignState& b) {
  if (a.matches != b.matches) return a.matches > b.matches;
  if (a.chunks != b.chunks) return a.chunks < b.chunks;
  if (a.dist != b.dist) return a.dist < b.dist;
  if (a.weighted != b.weighted) return a.weighted > b.weighted;
  // Strict total order from here down (identical in meteor.py _align):
  // score-irrelevant, but makes the beam cut and the final argmin
  // deterministic and C++ == Python exact.
  if (a.mask != b.mask) return a.mask < b.mask;
  if (a.last_h != b.last_h) return a.last_h < b.last_h;
  return a.last_r < b.last_r;
}

// Synonym stage: per-word sets of synonym-group ids; a pair matches when the
// sets intersect (mirrors meteor-1.5's WordNet synset-overlap test).
// Returns false with a Python exception set on malformed input (non-sequence
// inner element, non-int id) — the caller must check, not plough on: an
// unchecked -1 from PySequence_Size would reserve(SIZE_MAX) and throw a C++
// exception across the C API boundary (aborting the interpreter).
bool list_to_id_sets(PyObject* list, std::vector<std::vector<int64_t>>& out) {
  if (!PyList_Check(list)) {
    PyErr_SetString(PyExc_TypeError, "synonym ids must be a list or None");
    return false;
  }
  Py_ssize_t n = PyList_Size(list);
  out.reserve(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* inner = PyList_GetItem(list, i);  // borrowed
    std::vector<int64_t> ids;
    Py_ssize_t m = PySequence_Size(inner);
    if (m < 0) {
      PyErr_Format(PyExc_TypeError,
                   "synonym id groups must be sequences (element %zd)", i);
      return false;
    }
    ids.reserve(m);
    for (Py_ssize_t j = 0; j < m; ++j) {
      PyObject* item = PySequence_GetItem(inner, j);  // new ref
      if (item == nullptr) return false;
      int64_t v = PyLong_AsLongLong(item);
      Py_DECREF(item);
      if (v == -1 && PyErr_Occurred()) return false;
      ids.push_back(v);
    }
    std::sort(ids.begin(), ids.end());
    out.push_back(std::move(ids));
  }
  return true;
}

bool sorted_intersects(const std::vector<int64_t>& a,
                       const std::vector<int64_t>& b) {
  size_t i = 0, j = 0;
  while (i < a.size() && j < b.size()) {
    if (a[i] == b[j]) return true;
    if (a[i] < b[j]) ++i;
    else ++j;
  }
  return false;
}

// meteor_stats(hyp, ref, hyp_stems, ref_stems[, exact_weight, stem_weight,
//              hyp_syn, ref_syn, syn_weight, beam]) -> (weighted, matches, chunks)
// hyp_syn/ref_syn: per-word lists of synonym-group ids (or None) enabling the
// stage-3 synonym matcher (meteor-1.5 weight 0.8).
PyObject* meteor_stats(PyObject*, PyObject* args) {
  PyObject *hyp_o, *ref_o, *hyp_s_o, *ref_s_o;
  PyObject *hyp_syn_o = Py_None, *ref_syn_o = Py_None;
  double w_exact = 1.0, w_stem = 0.6, w_syn = 0.8;
  int beam = kBeamWidth;
  if (!PyArg_ParseTuple(args, "O!O!O!O!|ddOOdi", &PyList_Type, &hyp_o, &PyList_Type,
                        &ref_o, &PyList_Type, &hyp_s_o, &PyList_Type, &ref_s_o,
                        &w_exact, &w_stem, &hyp_syn_o, &ref_syn_o, &w_syn, &beam)) {
    return nullptr;
  }
  auto hyp = list_to_strings(hyp_o);
  auto ref = list_to_strings(ref_o);
  auto hyp_stems = list_to_strings(hyp_s_o);
  auto ref_stems = list_to_strings(ref_s_o);
  if (ref.size() > 64) {
    PyErr_SetString(PyExc_ValueError,
                    "meteor_stats: reference longer than 64 words (mask "
                    "width); use the Python aligner");
    return nullptr;
  }

  bool use_syn = hyp_syn_o != Py_None && ref_syn_o != Py_None;
  std::vector<std::vector<int64_t>> hyp_ids, ref_ids;
  if (use_syn) {
    if (!list_to_id_sets(hyp_syn_o, hyp_ids) ||
        !list_to_id_sets(ref_syn_o, ref_ids)) {
      return nullptr;
    }
  }

  // Candidate pairs; a pair takes its EARLIEST matching stage's weight
  // (module order exact, stem, synonym — so stem stays 0.6 even when the
  // words also share a synonym group).
  const int n = static_cast<int>(hyp.size());
  const int m = static_cast<int>(ref.size());
  std::vector<std::vector<std::pair<int, double>>> cand(n);
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j < m; ++j) {
      double w;
      if (hyp[i] == ref[j]) w = w_exact;
      else if (hyp_stems[i] == ref_stems[j]) w = w_stem;
      else if (use_syn && !hyp_ids[i].empty() && !ref_ids[j].empty() &&
               sorted_intersects(hyp_ids[i], ref_ids[j])) w = w_syn;
      else continue;
      cand[i].emplace_back(j, w);
    }
  }

  // Beam search over hypothesis positions (see header comment).  States with
  // equal (mask, last_h, last_r) have identical futures -> exact dominance.
  std::map<std::tuple<uint64_t, int, int>, AlignState> states;
  std::vector<AlignState> beam_states{AlignState{}};
  std::vector<AlignState> pool;
  for (int i = 0; i < n; ++i) {
    states.clear();
    auto push = [&states](const AlignState& s) {
      auto k = std::make_tuple(s.mask, s.last_h, s.last_r);
      auto it = states.find(k);
      if (it == states.end() || align_better(s, it->second)) states[k] = s;
    };
    for (const auto& st : beam_states) {
      push(st);  // leave hyp[i] unmatched
      for (const auto& [j, w] : cand[i]) {
        if (st.mask >> j & 1) continue;
        AlignState nx = st;
        nx.mask |= 1ULL << j;
        nx.chunks += (st.last_h == i - 1 && st.last_r == j - 1) ? 0 : 1;
        nx.last_h = i;
        nx.last_r = j;
        nx.matches += 1;
        nx.dist += std::abs(i - j);
        nx.weighted += w;
        push(nx);
      }
    }
    pool.clear();
    pool.reserve(states.size());
    for (auto& kv : states) pool.push_back(kv.second);
    if (static_cast<int>(pool.size()) > beam) {
      std::nth_element(pool.begin(), pool.begin() + beam, pool.end(),
                       align_better);
      pool.resize(beam);
    }
    beam_states.swap(pool);
  }

  const AlignState* best = &beam_states[0];
  for (const auto& st : beam_states) {
    if (align_better(st, *best)) best = &st;
  }
  return Py_BuildValue("(dii)", best->weighted, best->matches, best->chunks);
}

// Span-capable alignment search (meteor-1.5 stage 4 paraphrases), identical
// to mvc_tpu.evalcap.meteor._align_spans: word stages propose 1x1 spans in
// C++ (exact/stem/synonym, as meteor_stats); the caller passes the
// paraphrase-stage span candidates per hypothesis START position (table
// lookups stay in Python).  Objective: (1) max covered words (hyp + ref),
// (2) min chunks, (3) min summed start distance, (4) max summed stage weight
// (a span contributes w * (hl + rl) / 2).  Returns the winning match list
// [(hs, hl, rs, rl, w)] so Python can apply cf()-weighted scoring.
struct SpanMatch {
  int hs, hl, rs, rl;
  double w;
};

struct SpanState {
  uint64_t mask = 0;
  int last_h = -2;   // last matched hyp END position
  int last_r = -2;   // last matched ref END position
  int mh = 0, mr = 0, chunks = 0, dist = 0;
  double wsum = 0.0;
  std::vector<SpanMatch> pairs;
};

bool span_better(const SpanState& a, const SpanState& b) {
  int ca = a.mh + a.mr, cb = b.mh + b.mr;
  if (ca != cb) return ca > cb;
  if (a.chunks != b.chunks) return a.chunks < b.chunks;
  if (a.dist != b.dist) return a.dist < b.dist;
  if (a.wsum != b.wsum) return a.wsum > b.wsum;
  if (a.mask != b.mask) return a.mask < b.mask;
  if (a.last_h != b.last_h) return a.last_h < b.last_h;
  return a.last_r < b.last_r;
}

// meteor_align_spans(hyp, ref, hyp_stems, ref_stems, exact_w, stem_w,
//                    hyp_syn, ref_syn, syn_w, span_cands, beam)
//   span_cands: per-hyp-position list of (hl, rs, rl, w) paraphrase spans
// -> [(hs, hl, rs, rl, w), ...] of the winning matching
PyObject* meteor_align_spans(PyObject*, PyObject* args) {
  PyObject *hyp_o, *ref_o, *hyp_s_o, *ref_s_o;
  PyObject *hyp_syn_o = Py_None, *ref_syn_o = Py_None, *spans_o = Py_None;
  double w_exact = 1.0, w_stem = 0.6, w_syn = 0.8;
  int beam = kBeamWidth;
  if (!PyArg_ParseTuple(args, "O!O!O!O!ddOOdO|i", &PyList_Type, &hyp_o,
                        &PyList_Type, &ref_o, &PyList_Type, &hyp_s_o,
                        &PyList_Type, &ref_s_o, &w_exact, &w_stem,
                        &hyp_syn_o, &ref_syn_o, &w_syn, &spans_o, &beam)) {
    return nullptr;
  }
  auto hyp = list_to_strings(hyp_o);
  auto ref = list_to_strings(ref_o);
  auto hyp_stems = list_to_strings(hyp_s_o);
  auto ref_stems = list_to_strings(ref_s_o);
  if (ref.size() > 64) {
    PyErr_SetString(PyExc_ValueError,
                    "meteor_align_spans: reference longer than 64 words "
                    "(mask width); use the Python aligner");
    return nullptr;
  }
  bool use_syn = hyp_syn_o != Py_None && ref_syn_o != Py_None;
  std::vector<std::vector<int64_t>> hyp_ids, ref_ids;
  if (use_syn) {
    if (!list_to_id_sets(hyp_syn_o, hyp_ids) ||
        !list_to_id_sets(ref_syn_o, ref_ids)) {
      return nullptr;
    }
  }

  const int n = static_cast<int>(hyp.size());
  const int m = static_cast<int>(ref.size());
  // candidates per hyp start: word stages (1x1) + caller-provided spans
  std::vector<std::vector<SpanMatch>> cand(n);
  for (int i = 0; i < n; ++i) {
    for (int j = 0; j < m; ++j) {
      double w;
      if (hyp[i] == ref[j]) w = w_exact;
      else if (hyp_stems[i] == ref_stems[j]) w = w_stem;
      else if (use_syn && !hyp_ids[i].empty() && !ref_ids[j].empty() &&
               sorted_intersects(hyp_ids[i], ref_ids[j])) w = w_syn;
      else continue;
      cand[i].push_back({i, 1, j, 1, w});
    }
  }
  if (spans_o != Py_None) {
    if (!PyList_Check(spans_o) || PyList_Size(spans_o) != n) {
      PyErr_SetString(PyExc_TypeError,
                      "span_cands must be a per-hyp-position list");
      return nullptr;
    }
    for (int i = 0; i < n; ++i) {
      PyObject* row = PyList_GetItem(spans_o, i);  // borrowed
      Py_ssize_t k = PySequence_Size(row);
      if (k < 0) return nullptr;
      for (Py_ssize_t q = 0; q < k; ++q) {
        PyObject* item = PySequence_GetItem(row, q);  // new ref
        int hl, rs, rl;
        double w;
        if (!PyArg_ParseTuple(item, "iiid", &hl, &rs, &rl, &w)) {
          Py_DECREF(item);
          return nullptr;
        }
        Py_DECREF(item);
        cand[i].push_back({i, hl, rs, rl, w});
      }
    }
  }

  // beam search over hyp positions, bucketed by position (spans advance by
  // hl); per-(mask, last_h, last_r) dominance within a bucket
  using Key = std::tuple<uint64_t, int, int>;
  std::vector<std::map<Key, SpanState>> buckets(n + 1);
  buckets[0][{0, -2, -2}] = SpanState{};
  auto push = [&buckets](int pos, SpanState&& s) {
    Key k{s.mask, s.last_h, s.last_r};
    auto& bucket = buckets[pos];
    auto it = bucket.find(k);
    if (it == bucket.end() || span_better(s, it->second)) {
      bucket[k] = std::move(s);
    }
  };
  std::vector<SpanState> pool;
  for (int i = 0; i < n; ++i) {
    pool.clear();
    pool.reserve(buckets[i].size());
    for (auto& kv : buckets[i]) pool.push_back(std::move(kv.second));
    buckets[i].clear();
    if (static_cast<int>(pool.size()) > beam) {
      std::nth_element(pool.begin(), pool.begin() + beam, pool.end(),
                       span_better);
      pool.resize(beam);
    }
    for (auto& st : pool) {
      for (const auto& c : cand[i]) {
        uint64_t span = ((c.rl >= 64 ? ~0ULL : ((1ULL << c.rl) - 1)) << c.rs);
        if (st.mask & span) continue;
        SpanState nx = st;
        nx.mask |= span;
        nx.chunks += (st.last_h == i - 1 && st.last_r == c.rs - 1) ? 0 : 1;
        nx.last_h = i + c.hl - 1;
        nx.last_r = c.rs + c.rl - 1;
        nx.mh += c.hl;
        nx.mr += c.rl;
        nx.dist += std::abs(i - c.rs);
        nx.wsum += c.w * (c.hl + c.rl) / 2.0;
        nx.pairs.push_back(c);
        push(i + c.hl, std::move(nx));
      }
      push(i + 1, std::move(st));  // leave hyp[i] unmatched (moved LAST)
    }
  }
  const SpanState* best = nullptr;
  for (const auto& kv : buckets[n]) {
    if (best == nullptr || span_better(kv.second, *best)) best = &kv.second;
  }
  PyObject* out = PyList_New(best ? static_cast<Py_ssize_t>(best->pairs.size()) : 0);
  if (best != nullptr) {
    for (size_t q = 0; q < best->pairs.size(); ++q) {
      const auto& p = best->pairs[q];
      PyList_SetItem(out, static_cast<Py_ssize_t>(q),
                     Py_BuildValue("(iiiid)", p.hs, p.hl, p.rs, p.rl, p.w));
    }
  }
  return out;
}

// ------------------------------------------------------------------ LCS
PyObject* lcs(PyObject*, PyObject* args) {
  PyObject *a_o, *b_o;
  if (!PyArg_ParseTuple(args, "O!O!", &PyList_Type, &a_o, &PyList_Type, &b_o)) {
    return nullptr;
  }
  auto a = list_to_strings(a_o);
  auto b = list_to_strings(b_o);
  if (a.size() < b.size()) std::swap(a, b);
  if (b.empty()) return PyLong_FromLong(0);

  // intern strings to ints for fast comparison
  std::unordered_map<std::string, int> ids;
  auto intern = [&ids](const std::string& s) {
    auto it = ids.find(s);
    if (it != ids.end()) return it->second;
    int id = static_cast<int>(ids.size());
    ids.emplace(s, id);
    return id;
  };
  std::vector<int> ai, bi;
  ai.reserve(a.size());
  bi.reserve(b.size());
  for (auto& s : a) ai.push_back(intern(s));
  for (auto& s : b) bi.push_back(intern(s));

  std::vector<int> prev(b.size() + 1, 0), cur(b.size() + 1, 0);
  for (size_t i = 0; i < ai.size(); ++i) {
    for (size_t j = 1; j <= bi.size(); ++j) {
      cur[j] = (ai[i] == bi[j - 1]) ? prev[j - 1] + 1
                                    : std::max(prev[j], cur[j - 1]);
    }
    std::swap(prev, cur);
  }
  return PyLong_FromLong(prev[b.size()]);
}

// ------------------------------------------------------------------ PTB
const char* kPunct[] = {"''", "'",    "``",   "`",    "-lrb-", "-rrb-",
                        "-lcb-", "-rcb-", ".",    "?",    "!",     ",",
                        ":",     "-",     "--",   "...",  ";"};

bool is_punct_token(const std::string& s) {
  for (const char* p : kPunct) {
    if (s == p) return true;
  }
  return false;
}

bool is_word_char(char c) { return std::isalpha(static_cast<unsigned char>(c)); }
bool is_digit(char c) { return std::isdigit(static_cast<unsigned char>(c)); }

const char* kContractions[] = {"n't", "'s", "'re", "'ve", "'ll", "'d", "'m"};

void emit_word(std::string tok, std::vector<std::string>& out) {
  // split trailing contraction
  for (const char* c : kContractions) {
    size_t cl = strlen(c);
    if (tok.size() > cl &&
        tok.compare(tok.size() - cl, cl, c) == 0) {
      std::string head = tok.substr(0, tok.size() - cl);
      if (!head.empty()) {
        out.push_back(head);
        out.push_back(tok.substr(tok.size() - cl));
        return;
      }
    }
  }
  out.push_back(tok);
}

// ptb_tokenize(line) -> list of lowercased PTB tokens, punctuation stripped
PyObject* ptb_tokenize(PyObject*, PyObject* args) {
  const char* line_c;
  Py_ssize_t line_len;
  if (!PyArg_ParseTuple(args, "s#", &line_c, &line_len)) return nullptr;
  std::string line(line_c, static_cast<size_t>(line_len));
  // lowercase (ASCII; captions are English)
  for (auto& ch : line) ch = static_cast<char>(std::tolower(static_cast<unsigned char>(ch)));

  std::vector<std::string> out;
  size_t i = 0;
  const size_t n = line.size();
  while (i < n) {
    char c = line[i];
    if (std::isspace(static_cast<unsigned char>(c))) {
      ++i;
      continue;
    }
    if (c == '.' && i + 2 < n && line[i + 1] == '.' && line[i + 2] == '.') {
      i += 3;  // "..." is stripped punctuation
      continue;
    }
    if (c == '-' && i + 1 < n && line[i + 1] == '-') {
      i += 2;  // "--"
      continue;
    }
    if (c == 'n' && line.compare(i, 3, "n't") == 0) {
      // standalone "n't" outranks the word pattern (regex alternation order)
      out.push_back("n't");
      i += 3;
      continue;
    }
    if (is_word_char(c)) {
      size_t j = i;
      bool used_apostrophe = false;  // words allow ONE internal apostrophe
      while (j < n) {
        if (is_word_char(line[j])) {
          ++j;
        } else if (line[j] == '\'' && !used_apostrophe && j > i && j + 1 < n &&
                   is_word_char(line[j + 1])) {
          used_apostrophe = true;
          ++j;
        } else {
          break;
        }
      }
      emit_word(line.substr(i, j - i), out);
      i = j;
      continue;
    }
    if (is_digit(c)) {
      size_t j = i;
      while (j < n && (is_digit(line[j]) ||
                       ((line[j] == '.' || line[j] == ',') && j + 1 < n && is_digit(line[j + 1])))) {
        ++j;
      }
      out.push_back(line.substr(i, j - i));
      i = j;
      continue;
    }
    if (c == '\'') {
      // standalone contraction tokens ('s 're 've 'll 'd 'm) as in the
      // Python regex alternation
      static const char* kApos[] = {"'s", "'re", "'ve", "'ll", "'d", "'m"};
      bool matched = false;
      for (const char* a : kApos) {
        size_t al = strlen(a);
        if (line.compare(i, al, a) == 0) {
          out.push_back(a);
          i += al;
          matched = true;
          break;
        }
      }
      if (matched) continue;
    }
    // single punctuation char; map brackets to PTB names
    std::string tok(1, c);
    if (c == '(') tok = "-lrb-";
    else if (c == ')') tok = "-rrb-";
    else if (c == '{') tok = "-lcb-";
    else if (c == '}') tok = "-rcb-";
    if (!is_punct_token(tok)) out.push_back(tok);
    ++i;
  }
  return strings_to_list(out);
}

PyMethodDef kMethods[] = {
    {"meteor_stats", meteor_stats, METH_VARARGS,
     "METEOR alignment stats: (hyp, ref, hyp_stems, ref_stems[, w_exact, "
     "w_stem, hyp_syn, ref_syn, w_syn]) -> (weighted, matches, chunks)"},
    {"meteor_align_spans", meteor_align_spans, METH_VARARGS,
     "Span-capable METEOR alignment (stage-4 paraphrases): (hyp, ref, "
     "hyp_stems, ref_stems, w_exact, w_stem, hyp_syn, ref_syn, w_syn, "
     "span_cands[, beam]) -> [(hs, hl, rs, rl, w), ...]"},
    {"lcs", lcs, METH_VARARGS, "LCS length of two token lists"},
    {"ptb_tokenize", ptb_tokenize, METH_VARARGS,
     "PTB tokenize + lowercase + COCO punctuation strip"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "_native",
                       "Native metrics runtime for mvc_tpu", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) { return PyModule_Create(&kModule); }
