// Scalar C++ Tetris oracle for cross-validating the JAX engine.
//
// Role: the reference depends on an external C++ env (pyTetris,
// /root/reference/play.py:1) whose source is not vendored; SURVEY.md §7 calls
// for a reference-parity scalar env to lock the JAX engine's semantics with
// bit-exact golden traces. This file implements tetris_mcts_tpu/env/RULES.md
// independently of the JAX code: same rules, same threefry2x32 draw sequence,
// so (JAX engine, this oracle) must agree on every field after every action.
//
// Built as a shared library and driven through ctypes
// (tetris_mcts_tpu/utils/oracle.py). Scalar by design — the batched/TPU hot
// path lives in XLA; this exists for correctness only.

#include <algorithm>
#include <cstdint>
#include <cstring>

namespace {

constexpr int kH = 20;
constexpr int kW = 10;
constexpr uint32_t kFullRow = (1u << kW) - 1;
constexpr int kSpawnX = 3;
constexpr int kSpawnY = 0;
constexpr int32_t kClearScore[5] = {0, 100, 300, 500, 800};
constexpr int32_t kComboScore = 50;

// ---------------------------------------------------------------------------
// threefry2x32 (RULES.md "Randomizers"; identical to env/rng.py)
// ---------------------------------------------------------------------------

inline uint32_t rotl(uint32_t x, int d) { return (x << d) | (x >> (32 - d)); }

uint32_t threefry2x32_lane0(uint32_t k0, uint32_t k1, uint32_t c0, uint32_t c1) {
  const uint32_t ks[3] = {k0, k1, k0 ^ k1 ^ 0x1BD11BDAu};
  static const int rot_a[4] = {13, 15, 26, 6};
  static const int rot_b[4] = {17, 29, 16, 24};
  uint32_t x0 = c0 + k0, x1 = c1 + k1;
  for (int outer = 0; outer < 5; ++outer) {
    const int* rots = (outer % 2 == 0) ? rot_a : rot_b;
    for (int i = 0; i < 4; ++i) {
      x0 += x1;
      x1 = rotl(x1, rots[i]) ^ x0;
    }
    x0 += ks[(outer + 1) % 3];
    x1 += ks[(outer + 2) % 3] + static_cast<uint32_t>(outer + 1);
  }
  (void)x1;
  return x0;
}

// ---------------------------------------------------------------------------
// piece tables (RULES.md "Pieces"): base cells rotated k*90° CCW in a 4x4 box
// ---------------------------------------------------------------------------

struct Cells {
  int8_t y[4];
  int8_t x[4];
};

Cells g_cells[7][4];
bool g_tables_ready = false;

void build_tables() {
  static const int base[7][4][2] = {
      {{1, 0}, {1, 1}, {1, 2}, {1, 3}},  // I
      {{1, 1}, {1, 2}, {2, 1}, {2, 2}},  // O
      {{1, 0}, {1, 1}, {1, 2}, {2, 1}},  // T
      {{1, 1}, {1, 2}, {2, 0}, {2, 1}},  // S
      {{1, 0}, {1, 1}, {2, 1}, {2, 2}},  // Z
      {{1, 0}, {1, 1}, {1, 2}, {2, 2}},  // J
      {{1, 0}, {1, 1}, {1, 2}, {2, 0}},  // L
  };
  for (int p = 0; p < 7; ++p) {
    int box[4][4] = {};
    for (int c = 0; c < 4; ++c) box[base[p][c][0]][base[p][c][1]] = 1;
    for (int rot = 0; rot < 4; ++rot) {
      // rot90 CCW applied `rot` times: (r, c) -> (3 - c, r) per application.
      int rbox[4][4] = {};
      for (int r = 0; r < 4; ++r)
        for (int c = 0; c < 4; ++c) {
          int rr = r, cc = c;
          for (int k = 0; k < rot; ++k) {
            int nr = 3 - cc, nc = rr;
            rr = nr;
            cc = nc;
          }
          if (box[r][c]) rbox[rr][cc] = 1;
        }
      int n = 0;
      for (int r = 0; r < 4; ++r)
        for (int c = 0; c < 4; ++c)
          if (rbox[r][c]) {
            g_cells[p][rot].y[n] = static_cast<int8_t>(r);
            g_cells[p][rot].x[n] = static_cast<int8_t>(c);
            ++n;
          }
    }
  }
  g_tables_ready = true;
}

}  // namespace

extern "C" {

// Field-for-field mirror of engine.EnvState (see utils/oracle.py ctypes map).
struct OracleState {
  uint32_t rows[kH];
  int32_t piece, rot, px, py;
  int32_t bag[7];
  int32_t bag_pos;
  uint32_t k0, k1, ctr;
  int32_t gravity, score, combo, lines;
  int32_t line_stats[4];
  int32_t end;
};

}  // extern "C"

namespace {

uint32_t next_u32(OracleState* s) {
  uint32_t w = threefry2x32_lane0(s->k0, s->k1, s->ctr, 0);
  s->ctr += 1;
  return w;
}

bool collides(const OracleState* s, int piece, int rot, int px, int py) {
  const Cells& c = g_cells[piece][rot];
  for (int i = 0; i < 4; ++i) {
    int y = py + c.y[i], x = px + c.x[i];
    if (x < 0 || x >= kW || y < 0 || y >= kH) return true;
    if ((s->rows[y] >> x) & 1u) return true;
  }
  return false;
}

void draw_piece(OracleState* s, int randomizer, int* piece_out) {
  if (randomizer == 1) {
    *piece_out = static_cast<int>(next_u32(s) % 7u);
    return;
  }
  if (s->bag_pos >= 7) {
    // One draw indexes the lexicographic permutation table of {0..6}
    // (RULES.md "Randomizers"; identical to env/rng.py fisher_yates7).
    static int32_t perm7[5040][7];
    static bool perm7_init = false;
    if (!perm7_init) {
      int32_t p[7] = {0, 1, 2, 3, 4, 5, 6};
      for (int n = 0; n < 5040; ++n) {
        for (int i = 0; i < 7; ++i) perm7[n][i] = p[i];
        std::next_permutation(p, p + 7);
      }
      perm7_init = true;
    }
    uint32_t idx = next_u32(s) % 5040u;
    for (int i = 0; i < 7; ++i) s->bag[i] = perm7[idx][i];
    s->bag_pos = 0;
  }
  *piece_out = s->bag[s->bag_pos];
  s->bag_pos += 1;
}

void spawn(OracleState* s, int randomizer) {
  int piece = 0;
  draw_piece(s, randomizer, &piece);
  s->piece = piece;
  s->rot = 0;
  s->px = kSpawnX;
  s->py = kSpawnY;
  s->gravity = 0;
  if (collides(s, s->piece, s->rot, s->px, s->py)) s->end = 1;
}

void lock(OracleState* s, int scoring, int randomizer) {
  const Cells& c = g_cells[s->piece][s->rot];
  for (int i = 0; i < 4; ++i)
    s->rows[s->py + c.y[i]] |= (1u << (s->px + c.x[i]));

  int n = 0;
  uint32_t out[kH] = {};
  int dst = kH - 1;
  for (int r = kH - 1; r >= 0; --r) {
    if (s->rows[r] == kFullRow) {
      ++n;
    } else {
      out[dst--] = s->rows[r];
    }
  }
  std::memcpy(s->rows, out, sizeof(out));

  if (n > 0) {
    s->score += (scoring == 0) ? (kClearScore[n] + kComboScore * s->combo) : n;
    s->combo += 1;
    s->lines += n;
    s->line_stats[n - 1] += 1;
  } else {
    s->combo = 0;
  }
  spawn(s, randomizer);
}

int max_drop(const OracleState* s) {
  int best = kH;
  const Cells& c = g_cells[s->piece][s->rot];
  for (int i = 0; i < 4; ++i) {
    int y = s->py + c.y[i], x = s->px + c.x[i];
    int limit = kH - 1 - y;
    for (int r = y + 1; r < kH; ++r) {
      if ((s->rows[r] >> x) & 1u) {
        limit = r - y - 1;
        break;
      }
    }
    if (limit < best) best = limit;
  }
  return best < 0 ? 0 : best;
}

}  // namespace

extern "C" {

void oracle_reset(OracleState* s, uint32_t k0, uint32_t k1, int actions_per_drop,
                  int scoring, int randomizer) {
  (void)actions_per_drop;
  (void)scoring;
  if (!g_tables_ready) build_tables();
  std::memset(s, 0, sizeof(*s));
  for (int i = 0; i < 7; ++i) s->bag[i] = i;
  s->bag_pos = 7;
  s->k0 = k0;
  s->k1 = k1;
  spawn(s, randomizer);
}

void oracle_soft_reset(OracleState* s, int actions_per_drop, int scoring,
                       int randomizer) {
  (void)actions_per_drop;
  (void)scoring;
  if (!g_tables_ready) build_tables();
  uint32_t k0 = s->k0, k1 = s->k1, ctr = s->ctr;
  std::memset(s, 0, sizeof(*s));
  for (int i = 0; i < 7; ++i) s->bag[i] = i;
  s->bag_pos = 7;
  s->k0 = k0;
  s->k1 = k1;
  s->ctr = ctr;
  spawn(s, randomizer);
}

void oracle_step(OracleState* s, int action, int actions_per_drop, int scoring,
                 int randomizer) {
  if (!g_tables_ready) build_tables();
  if (s->end) return;

  // Lateral effect.
  int dx = (action == 1) ? -1 : (action == 2) ? 1 : 0;
  int drot = (action == 4) ? 1 : (action == 5) ? 3 : 0;
  int npx = s->px + dx;
  int nrot = (s->rot + drot) % 4;
  if (!collides(s, s->piece, nrot, npx, s->py)) {
    s->px = npx;
    s->rot = nrot;
  }

  // Vertical effect (RULES.md "Gravity"; actions_per_drop <= 0 disables
  // auto-gravity — the demo/test.gif-evidenced mode).
  bool hard = action == 6;
  bool soft = action == 3;
  bool lateral = !hard && !soft;
  int g_next = s->gravity + 1;
  bool grav_on = actions_per_drop > 0;
  bool grav_fires = grav_on && lateral && (g_next >= actions_per_drop);
  int md = max_drop(s);

  bool want_down = soft || grav_fires;
  int drop_n = hard ? md : (want_down ? (md < 1 ? md : 1) : 0);
  bool lock_now = hard || (want_down && md == 0);

  s->py += drop_n;
  // Guideline drop points (RULES.md "Scoring"): +1/cell soft, +2/cell hard.
  if (scoring == 0) s->score += hard ? 2 * md : (soft ? (md < 1 ? md : 1) : 0);
  s->gravity = (hard || soft || grav_fires) ? 0 : (grav_on ? g_next : 0);
  if (lock_now) lock(s, scoring, randomizer);
}

void oracle_get_state(const OracleState* s, int8_t* out /* [200] row-major */) {
  if (!g_tables_ready) build_tables();
  for (int r = 0; r < kH; ++r)
    for (int c = 0; c < kW; ++c)
      out[r * kW + c] = static_cast<int8_t>((s->rows[r] >> c) & 1u);
  const Cells& cl = g_cells[s->piece][s->rot];
  for (int i = 0; i < 4; ++i) {
    int y = s->py + cl.y[i], x = s->px + cl.x[i];
    if (y >= 0 && y < kH && x >= 0 && x < kW) out[y * kW + x] = -1;
  }
}

uint32_t oracle_threefry_lane0(uint32_t k0, uint32_t k1, uint32_t c0,
                               uint32_t c1) {
  return threefry2x32_lane0(k0, k1, c0, c1);
}

}  // extern "C"
