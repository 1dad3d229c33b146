// Native host-side runtime for equiformer_tpu: batch collation and
// neighbor-graph preprocessing.
//
// The reference delegates its host/data path to native code in external
// dependencies (torch DataLoader workers, LMDB, torch_cluster's C++ radius
// ops — SURVEY.md §2.6); this library is the TPU build's first-party
// equivalent: it fills padded static-shape batch buffers straight from a
// contiguous dataset arena (no per-graph Python/numpy slicing), and computes
// radius-graph statistics/preprocessing off the hot path.
//
// Exposed via ctypes (see equiformer_tpu/native/__init__.py); plain C ABI.

#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Fill a padded dense-slot batch (collate_dense layout: graph g occupies node
// slots [g*M, g*M+n_g)).
//   pos_arena     [total_nodes, 3] float32, graphs contiguous
//   species_arena [total_nodes] int32
//   forces_arena  [total_nodes, 3] float32 or nullptr
//   offsets       [n_total_graphs + 1] int64 node offsets into the arena
//   y_arena       [n_total_graphs] float32 or nullptr
//   indices       [batch] int64 graph ids to collate
// Outputs (pre-allocated by caller, zero-fill done here):
//   pos_out [B*M, 3], species_out [B*M], node_mask [B*M] (uint8),
//   batch_out [B*M] int32, graph_mask [B] uint8, y_out [B], forces_out [B*M,3]
// Returns 0 on success, -1 if any graph exceeds M nodes.
int collate_dense_batch(
    const float* pos_arena, const int32_t* species_arena,
    const float* forces_arena, const int64_t* offsets, const float* y_arena,
    const int64_t* indices, int64_t batch, int64_t slots,
    float* pos_out, int32_t* species_out, uint8_t* node_mask,
    int32_t* batch_out, uint8_t* graph_mask, float* y_out, float* forces_out) {
  const int64_t n_cap = batch * slots;
  memset(pos_out, 0, sizeof(float) * n_cap * 3);
  memset(species_out, 0, sizeof(int32_t) * n_cap);
  memset(node_mask, 0, n_cap);
  memset(graph_mask, 0, batch);
  if (y_out) memset(y_out, 0, sizeof(float) * batch);
  if (forces_out) memset(forces_out, 0, sizeof(float) * n_cap * 3);
  for (int64_t b = 0; b < batch; ++b) {
    const int64_t g = indices[b];
    const int64_t s = offsets[g], e = offsets[g + 1];
    const int64_t n = e - s;
    if (n > slots) return -1;
    const int64_t base = b * slots;
    memcpy(pos_out + base * 3, pos_arena + s * 3, sizeof(float) * n * 3);
    memcpy(species_out + base, species_arena + s, sizeof(int32_t) * n);
    if (forces_out && forces_arena)
      memcpy(forces_out + base * 3, forces_arena + s * 3, sizeof(float) * n * 3);
    for (int64_t i = 0; i < n; ++i) node_mask[base + i] = 1;
    graph_mask[b] = 1;
    if (y_out && y_arena) y_out[b] = y_arena[g];
  }
  for (int64_t b = 0; b < batch; ++b)
    for (int64_t i = 0; i < slots; ++i) batch_out[b * slots + i] = (int32_t)b;
  return 0;
}

// Per-graph radius-graph statistics over an arena (dataset preprocessing /
// compute_stats): returns total edge count; fills degree histogram if given.
int64_t radius_graph_stats(
    const float* pos_arena, const int64_t* offsets, int64_t n_graphs,
    float radius, int64_t* edges_per_graph) {
  const float r2 = radius * radius;
  int64_t total = 0;
  for (int64_t g = 0; g < n_graphs; ++g) {
    const int64_t s = offsets[g], e = offsets[g + 1];
    int64_t cnt = 0;
    for (int64_t i = s; i < e; ++i) {
      const float xi = pos_arena[i * 3], yi = pos_arena[i * 3 + 1],
                  zi = pos_arena[i * 3 + 2];
      for (int64_t j = s; j < e; ++j) {
        if (i == j) continue;
        const float dx = xi - pos_arena[j * 3];
        const float dy = yi - pos_arena[j * 3 + 1];
        const float dz = zi - pos_arena[j * 3 + 2];
        if (dx * dx + dy * dy + dz * dz < r2) ++cnt;
      }
    }
    if (edges_per_graph) edges_per_graph[g] = cnt;
    total += cnt;
  }
  return total;
}

// Greedy atom-count balanced assignment of graphs to shards
// (BalancedBatchSampler analog).  sizes[i] = natoms; out_shard[i] = shard id.
void balanced_assign(const int64_t* order_by_size_desc, const int64_t* sizes,
                     int64_t n, int64_t shards, int64_t* out_shard) {
  int64_t* load = new int64_t[shards]();
  for (int64_t idx = 0; idx < n; ++idx) {
    const int64_t g = order_by_size_desc[idx];
    int64_t best = 0;
    for (int64_t s2 = 1; s2 < shards; ++s2)
      if (load[s2] < load[best]) best = s2;
    out_shard[g] = best;
    load[best] += sizes[g];
  }
  delete[] load;
}

// Capacity-limited greedy balancing: like balanced_assign, but shard s takes
// at most cap[s] items — keeps per-shard batch counts identical to
// round-robin sharding while balancing total atom counts (the OCP
// BalancedBatchSampler contract, base_trainer_oc20.py:238-256).
void balanced_assign_capped(const int64_t* order_by_size_desc,
                            const int64_t* sizes, int64_t n, int64_t shards,
                            const int64_t* cap, int64_t* out_shard) {
  int64_t* load = new int64_t[shards]();
  int64_t* count = new int64_t[shards]();
  for (int64_t idx = 0; idx < n; ++idx) {
    const int64_t g = order_by_size_desc[idx];
    int64_t best = -1;
    for (int64_t s2 = 0; s2 < shards; ++s2) {
      if (count[s2] >= cap[s2]) continue;
      if (best < 0 || load[s2] < load[best]) best = s2;
    }
    if (best < 0) best = 0;  // all full (caps sum < n): overflow to shard 0
    out_shard[g] = best;
    load[best] += sizes[g];
    count[best] += 1;
  }
  delete[] load;
  delete[] count;
}

}  // extern "C"
