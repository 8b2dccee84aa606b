// Native host-side graph preprocessing.
//
// The reference delegates its host hot loops to third-party native code
// (scipy CSR slicing for per-epoch partitioning, `utils/data_util.py:48-61`;
// torch_cluster for kNN). This library is the TPU framework's native runtime
// for the same role: the per-epoch work on ogbn-proteins sorts ~79M edges and
// slices 10 cluster subgraphs every epoch — numpy argsort is O(E log E) with
// Python overhead; the counting sort here is O(E + N) and ~10x faster.
//
// Exposed via a plain C ABI, loaded with ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Stable counting-sort of edges by receiver; emits CSR row_ptr and the
// permutation (for reordering edge attributes on the numpy side).
//   senders/receivers: [n_edges] with 0 <= receivers[i] < n_nodes
//   out_*:             [n_edges]
//   row_ptr:           [n_nodes + 1]
//   order:             [n_edges] original index of each output slot
void sort_edges_csr(const int32_t* senders, const int32_t* receivers,
                    int64_t n_edges, int32_t n_nodes, int32_t* out_senders,
                    int32_t* out_receivers, int32_t* order, int32_t* row_ptr) {
  std::vector<int64_t> count(static_cast<size_t>(n_nodes) + 1, 0);
  for (int64_t i = 0; i < n_edges; ++i) count[receivers[i] + 1]++;
  for (int32_t v = 0; v < n_nodes; ++v) count[v + 1] += count[v];
  for (int32_t v = 0; v <= n_nodes; ++v)
    row_ptr[v] = static_cast<int32_t>(count[v]);
  std::vector<int64_t> cursor(count.begin(), count.end() - 1);
  for (int64_t i = 0; i < n_edges; ++i) {
    int64_t pos = cursor[receivers[i]]++;
    out_senders[pos] = senders[i];
    out_receivers[pos] = receivers[i];
    order[pos] = static_cast<int32_t>(i);
  }
}

// Per-cluster subgraph extraction for random-partition training
// (reference semantics: keep intra-cluster edges only,
// `examples/ogb/ogbn_proteins/dataset.py:117-144`).
//
//   parts:        [n_nodes] cluster id per node, in [0, n_clusters)
//   local_id:     [n_nodes] output: node rank within its cluster
//   cluster_size: [n_clusters] output
//   edge_cluster: [n_edges] output: owning cluster of each intra-cluster edge,
//                 or -1 for cross-cluster edges
// Returns the number of kept (intra-cluster) edges.
int64_t partition_edges(const int32_t* senders, const int32_t* receivers,
                        int64_t n_edges, const int32_t* parts, int32_t n_nodes,
                        int32_t n_clusters, int32_t* local_id,
                        int64_t* cluster_size, int32_t* edge_cluster) {
  std::memset(cluster_size, 0, sizeof(int64_t) * n_clusters);
  for (int32_t v = 0; v < n_nodes; ++v)
    local_id[v] = static_cast<int32_t>(cluster_size[parts[v]]++);
  int64_t kept = 0;
  for (int64_t i = 0; i < n_edges; ++i) {
    int32_t cs = parts[senders[i]];
    if (cs == parts[receivers[i]]) {
      edge_cluster[i] = cs;
      kept++;
    } else {
      edge_cluster[i] = -1;
    }
  }
  return kept;
}

// Gather + localize one cluster's edges (after partition_edges).
//   Writes localized (senders, receivers) of edges belonging to `cluster`
//   into out arrays; returns count.
int64_t extract_cluster(const int32_t* senders, const int32_t* receivers,
                        int64_t n_edges, const int32_t* edge_cluster,
                        const int32_t* local_id, int32_t cluster,
                        int32_t* out_s, int32_t* out_r, int32_t* out_eidx) {
  int64_t k = 0;
  for (int64_t i = 0; i < n_edges; ++i) {
    if (edge_cluster[i] == cluster) {
      out_s[k] = local_id[senders[i]];
      out_r[k] = local_id[receivers[i]];
      out_eidx[k] = static_cast<int32_t>(i);
      k++;
    }
  }
  return k;
}

}  // extern "C"
