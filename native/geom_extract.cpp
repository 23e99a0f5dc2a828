// Native GEOM-Drugs conformer extractor.
//
// C++ core for the heaviest data-prep step: stream the multi-gigabyte
// crude msgpack dump ({smiles: {"conformers": [{"totalenergy": f,
// "xyz": [[Z, x, y, z], ...], ...}, ...], ...}} chunks), keep the K
// lowest-energy conformers per molecule, and write the packed
// (mol_id, Z, x, y, z) float64 .npy + per-conformer atom counts .npy +
// SMILES text — the same outputs as the Python reference implementation
// (geoldm_tpu/data/geom.py extract_conformers, which mirrors the
// reference build_geom_dataset.py:10-65 and remains the correctness
// fallback). Bound via ctypes from geoldm_tpu/data/native_geom.py; a
// parity test drives both paths on synthetic msgpack data.
//
// The msgpack decoder below is a minimal, skip-capable streaming reader
// for the subset the dump uses (maps, arrays, str, bin, all int widths,
// f32/f64, nil, bool) with a bounded refill buffer, so the input file
// never needs to fit in memory.

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Reader {
  FILE* f = nullptr;
  std::vector<unsigned char> buf;
  size_t pos = 0, len = 0;
  bool fail = false;

  explicit Reader(FILE* file) : f(file) { buf.resize(1 << 20); }

  // Ensure n bytes are available at buf[pos]; returns false on EOF/error.
  bool need(size_t n) {
    if (fail) return false;
    if (len - pos >= n) return true;
    std::memmove(buf.data(), buf.data() + pos, len - pos);
    len -= pos;
    pos = 0;
    if (buf.size() < n) buf.resize(n);
    while (len < n) {
      size_t got = std::fread(buf.data() + len, 1, buf.size() - len, f);
      if (got == 0) return false;
      len += got;
    }
    return true;
  }

  bool at_eof() {
    if (len - pos > 0) return false;
    pos = len = 0;
    size_t got = std::fread(buf.data(), 1, buf.size(), f);
    len = got;
    return got == 0;
  }

  unsigned char u8() { return buf[pos++]; }
  uint16_t u16() {
    uint16_t v = (uint16_t(buf[pos]) << 8) | buf[pos + 1];
    pos += 2;
    return v;
  }
  uint32_t u32() {
    uint32_t v = 0;
    for (int i = 0; i < 4; i++) v = (v << 8) | buf[pos + i];
    pos += 4;
    return v;
  }
  uint64_t u64() {
    uint64_t v = 0;
    for (int i = 0; i < 8; i++) v = (v << 8) | buf[pos + i];
    pos += 8;
    return v;
  }
};

// Decoded header of one msgpack value.
enum class Kind { Nil, Bool, Int, Float, Str, Bin, Array, Map, Ext, Error };

struct Head {
  Kind kind = Kind::Error;
  int64_t i = 0;      // Int value
  double d = 0.0;     // Float value
  uint32_t n = 0;     // Str/Bin byte length or Array/Map element count
};

Head read_head(Reader& r) {
  Head h;
  if (!r.need(1)) return h;
  unsigned char c = r.u8();
  if (c <= 0x7f) { h.kind = Kind::Int; h.i = c; return h; }
  if (c >= 0xe0) { h.kind = Kind::Int; h.i = int8_t(c); return h; }
  if (c >= 0x80 && c <= 0x8f) { h.kind = Kind::Map; h.n = c & 0x0f; return h; }
  if (c >= 0x90 && c <= 0x9f) { h.kind = Kind::Array; h.n = c & 0x0f; return h; }
  if (c >= 0xa0 && c <= 0xbf) { h.kind = Kind::Str; h.n = c & 0x1f; return h; }
  switch (c) {
    case 0xc0: h.kind = Kind::Nil; return h;
    case 0xc2: h.kind = Kind::Bool; h.i = 0; return h;
    case 0xc3: h.kind = Kind::Bool; h.i = 1; return h;
    case 0xc4: if (!r.need(1)) return h; h.kind = Kind::Bin; h.n = r.u8(); return h;
    case 0xc5: if (!r.need(2)) return h; h.kind = Kind::Bin; h.n = r.u16(); return h;
    case 0xc6: if (!r.need(4)) return h; h.kind = Kind::Bin; h.n = r.u32(); return h;
    case 0xc7: if (!r.need(2)) return h; h.kind = Kind::Ext; h.n = r.u8() + 1u; return h;
    case 0xc8: if (!r.need(3)) return h; h.kind = Kind::Ext; h.n = r.u16() + 1u; return h;
    case 0xc9: if (!r.need(5)) return h; h.kind = Kind::Ext; h.n = r.u32() + 1u; return h;
    case 0xca: {
      if (!r.need(4)) return h;
      uint32_t b = r.u32();
      float f;
      std::memcpy(&f, &b, 4);
      h.kind = Kind::Float; h.d = f; return h;
    }
    case 0xcb: {
      if (!r.need(8)) return h;
      uint64_t b = r.u64();
      std::memcpy(&h.d, &b, 8);
      h.kind = Kind::Float; return h;
    }
    case 0xcc: if (!r.need(1)) return h; h.kind = Kind::Int; h.i = r.u8(); return h;
    case 0xcd: if (!r.need(2)) return h; h.kind = Kind::Int; h.i = r.u16(); return h;
    case 0xce: if (!r.need(4)) return h; h.kind = Kind::Int; h.i = r.u32(); return h;
    case 0xcf: if (!r.need(8)) return h; h.kind = Kind::Int; h.i = int64_t(r.u64()); return h;
    case 0xd0: if (!r.need(1)) return h; h.kind = Kind::Int; h.i = int8_t(r.u8()); return h;
    case 0xd1: if (!r.need(2)) return h; h.kind = Kind::Int; h.i = int16_t(r.u16()); return h;
    case 0xd2: if (!r.need(4)) return h; h.kind = Kind::Int; h.i = int32_t(r.u32()); return h;
    case 0xd3: if (!r.need(8)) return h; h.kind = Kind::Int; h.i = int64_t(r.u64()); return h;
    case 0xd4: h.kind = Kind::Ext; h.n = 2; return h;
    case 0xd5: h.kind = Kind::Ext; h.n = 3; return h;
    case 0xd6: h.kind = Kind::Ext; h.n = 5; return h;
    case 0xd7: h.kind = Kind::Ext; h.n = 9; return h;
    case 0xd8: h.kind = Kind::Ext; h.n = 17; return h;
    case 0xd9: if (!r.need(1)) return h; h.kind = Kind::Str; h.n = r.u8(); return h;
    case 0xda: if (!r.need(2)) return h; h.kind = Kind::Str; h.n = r.u16(); return h;
    case 0xdb: if (!r.need(4)) return h; h.kind = Kind::Str; h.n = r.u32(); return h;
    case 0xdc: if (!r.need(2)) return h; h.kind = Kind::Array; h.n = r.u16(); return h;
    case 0xdd: if (!r.need(4)) return h; h.kind = Kind::Array; h.n = r.u32(); return h;
    case 0xde: if (!r.need(2)) return h; h.kind = Kind::Map; h.n = r.u16(); return h;
    case 0xdf: if (!r.need(4)) return h; h.kind = Kind::Map; h.n = r.u32(); return h;
    default: return h;  // 0xc1 (never used) -> Error
  }
}

bool skip_value(Reader& r, const Head& h);

bool skip_next(Reader& r) {
  Head h = read_head(r);
  return skip_value(r, h);
}

bool skip_value(Reader& r, const Head& h) {
  switch (h.kind) {
    case Kind::Nil:
    case Kind::Bool:
    case Kind::Int:
    case Kind::Float:
      return true;
    case Kind::Str:
    case Kind::Bin:
    case Kind::Ext:
      if (!r.need(h.n)) return false;
      r.pos += h.n;
      return true;
    case Kind::Array: {
      for (uint32_t i = 0; i < h.n; i++)
        if (!skip_next(r)) return false;
      return true;
    }
    case Kind::Map: {
      for (uint32_t i = 0; i < h.n; i++) {
        if (!skip_next(r)) return false;
        if (!skip_next(r)) return false;
      }
      return true;
    }
    default:
      return false;
  }
}

bool read_str(Reader& r, const Head& h, std::string& out) {
  if (h.kind != Kind::Str) return false;
  if (!r.need(h.n)) return false;
  out.assign(reinterpret_cast<const char*>(r.buf.data() + r.pos), h.n);
  r.pos += h.n;
  return true;
}

bool read_number(Reader& r, double& out) {
  Head h = read_head(r);
  if (h.kind == Kind::Float) { out = h.d; return true; }
  if (h.kind == Kind::Int) { out = double(h.i); return true; }
  return false;
}

struct Conformer {
  double energy = 0.0;
  std::vector<double> rows;  // n x 4 (Z, x, y, z)
};

// .npy v1.0 writer for little-endian C-order arrays.
bool write_npy(const char* path, const char* descr,
               const std::vector<int64_t>& shape, const void* data,
               size_t nbytes) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return false;
  std::string hdr = std::string("{'descr': '") + descr +
                    "', 'fortran_order': False, 'shape': (";
  for (size_t i = 0; i < shape.size(); i++) {
    char tmp[32];
    std::snprintf(tmp, sizeof tmp, "%lld", (long long)shape[i]);
    hdr += tmp;
    hdr += (shape.size() == 1 ? "," : (i + 1 < shape.size() ? ", " : ""));
  }
  hdr += "), }";
  size_t total = 10 + hdr.size() + 1;
  size_t padded = (total + 63) / 64 * 64;
  hdr.append(padded - total, ' ');
  hdr += '\n';
  unsigned char magic[10] = {0x93, 'N', 'U', 'M', 'P', 'Y', 1, 0, 0, 0};
  uint16_t hlen = uint16_t(hdr.size());
  magic[8] = hlen & 0xff;
  magic[9] = hlen >> 8;
  bool ok = std::fwrite(magic, 1, 10, f) == 10 &&
            std::fwrite(hdr.data(), 1, hdr.size(), f) == hdr.size() &&
            (nbytes == 0 || std::fwrite(data, 1, nbytes, f) == nbytes);
  std::fclose(f);
  return ok;
}

}  // namespace

extern "C" {

// Returns 0 on success, negative error code otherwise. out_rows/out_mols
// report the packed row count and conformer count written.
int geom_extract_conformers(
    const char* msgpack_path,
    const char* out_npy_path,
    const char* out_counts_path,
    const char* out_smiles_path,
    int64_t conformations,
    int32_t remove_h,
    int64_t* out_rows,
    int64_t* out_mols) {
  FILE* in = std::fopen(msgpack_path, "rb");
  if (!in) return -1;
  FILE* smiles_f = std::fopen(out_smiles_path, "wb");
  if (!smiles_f) { std::fclose(in); return -2; }

  Reader r(in);
  std::vector<double> packed;    // (mol_id, Z, x, y, z) rows
  std::vector<int64_t> counts;   // atoms per kept conformer
  int64_t mol_id = 0;
  int rc = 0;

  std::string key, smiles;
  std::vector<Conformer> confs;
  std::vector<size_t> order;

  while (!r.at_eof()) {
    Head chunk = read_head(r);      // {smiles: mol-map} chunk
    if (chunk.kind != Kind::Map) { rc = -3; break; }
    for (uint32_t mi = 0; mi < chunk.n && rc == 0; mi++) {
      Head ks = read_head(r);
      if (!read_str(r, ks, smiles)) { rc = -4; break; }
      Head mol = read_head(r);
      if (mol.kind != Kind::Map) { rc = -5; break; }
      confs.clear();
      for (uint32_t f = 0; f < mol.n && rc == 0; f++) {
        Head kf = read_head(r);
        if (!read_str(r, kf, key)) { rc = -6; break; }
        if (key != "conformers") { if (!skip_next(r)) rc = -7; continue; }
        Head arr = read_head(r);
        if (arr.kind != Kind::Array) { rc = -8; break; }
        for (uint32_t c = 0; c < arr.n && rc == 0; c++) {
          Head cm = read_head(r);
          if (cm.kind != Kind::Map) { rc = -9; break; }
          Conformer conf;
          bool has_xyz = false;
          for (uint32_t e = 0; e < cm.n && rc == 0; e++) {
            Head ke = read_head(r);
            if (!read_str(r, ke, key)) { rc = -10; break; }
            if (key == "totalenergy") {
              if (!read_number(r, conf.energy)) rc = -11;
            } else if (key == "xyz") {
              Head xa = read_head(r);
              if (xa.kind != Kind::Array) { rc = -12; break; }
              conf.rows.reserve(size_t(xa.n) * 4);
              for (uint32_t a = 0; a < xa.n && rc == 0; a++) {
                Head row = read_head(r);
                if (row.kind != Kind::Array || row.n != 4) { rc = -13; break; }
                double v[4];
                for (int j = 0; j < 4; j++)
                  if (!read_number(r, v[j])) { rc = -14; break; }
                if (rc == 0)
                  conf.rows.insert(conf.rows.end(), v, v + 4);
              }
              has_xyz = rc == 0;
            } else {
              if (!skip_next(r)) rc = -15;
            }
          }
          if (rc == 0 && has_xyz) confs.push_back(std::move(conf));
        }
      }
      if (rc != 0) break;
      std::fwrite(smiles.data(), 1, smiles.size(), smiles_f);
      std::fputc('\n', smiles_f);
      // K lowest-energy conformers, ties broken by original order
      // (matching numpy argsort's stable ordering in the Python path).
      order.resize(confs.size());
      for (size_t i = 0; i < order.size(); i++) order[i] = i;
      std::stable_sort(order.begin(), order.end(),
                       [&](size_t a, size_t b) {
                         return confs[a].energy < confs[b].energy;
                       });
      size_t keep = std::min<size_t>(order.size(), size_t(conformations));
      for (size_t k = 0; k < keep; k++) {
        const Conformer& c = confs[order[k]];
        int64_t n_kept = 0;
        for (size_t a = 0; a + 4 <= c.rows.size(); a += 4) {
          if (remove_h && c.rows[a] == 1.0) continue;
          packed.push_back(double(mol_id));
          packed.insert(packed.end(), c.rows.begin() + a, c.rows.begin() + a + 4);
          n_kept++;
        }
        counts.push_back(n_kept);
        mol_id++;
      }
    }
    if (rc != 0) break;
  }

  std::fclose(in);
  std::fclose(smiles_f);
  if (rc != 0) return rc;

  int64_t rows = int64_t(packed.size() / 5);
  if (!write_npy(out_npy_path, "<f8", {rows, 5}, packed.data(),
                 packed.size() * sizeof(double)))
    return -20;
  if (!write_npy(out_counts_path, "<i8", {int64_t(counts.size())},
                 counts.data(), counts.size() * sizeof(int64_t)))
    return -21;
  if (out_rows) *out_rows = rows;
  if (out_mols) *out_mols = mol_id;
  return 0;
}

}  // extern "C"
