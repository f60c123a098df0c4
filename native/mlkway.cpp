// Multilevel k-way partitioner for tet-mesh dual graphs.
//
// Plays the role of the reference's METIS wrapper (METIS.hpp:109-160:
// METIS_PartMeshDual with k-way edge-cut objective, contiguous +
// min-connectivity options, ncommon=3, ufactor=30): DOT's H0 quality is
// set by interface size, so the partitioner must produce near-minimal,
// connected, balanced element partitions. Implemented from scratch as a
// classic multilevel scheme:
//
//   1. dual graph: tets adjacent iff they share a triangular face
//   2. coarsening by heavy-edge matching until ~max(128, 24k) vertices
//   3. initial k-way partition by balanced greedy region growing
//      (best-of-several seeds, scored by edge-cut)
//   4. uncoarsening with greedy boundary refinement (gain = connectivity
//      to target part minus internal connectivity, balance-capped)
//   5. finest level: contiguity repair (stray components are merged into
//      the best-connected neighbor part) + min-connectivity tie-breaks
//
// Exported C ABI (ctypes): partition_mesh_dual().

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

struct Graph {
    int64_t n = 0;
    std::vector<int64_t> xadj;    // n+1
    std::vector<int32_t> adj;     // edges
    std::vector<int32_t> ewgt;    // edge weights
    std::vector<int32_t> vwgt;    // vertex weights
    std::vector<int32_t> cmap;    // fine vertex -> coarse vertex
};

// ---------------------------------------------------------------------
// dual graph from tets (face-adjacency)
// ---------------------------------------------------------------------
Graph build_dual(const int32_t* tets, int64_t n_elem,
                 const int32_t* elem_wgt = nullptr) {
    // pack each sorted face into a 64-bit key (21 bits per vertex id)
    struct FK { uint64_t key; int32_t elem; };
    std::vector<FK> faces(4 * n_elem);
    static const int F[4][3] = {{0, 1, 2}, {0, 1, 3}, {0, 2, 3}, {1, 2, 3}};
    for (int64_t e = 0; e < n_elem; ++e) {
        const int32_t* t = tets + 4 * e;
        for (int f = 0; f < 4; ++f) {
            uint64_t a = t[F[f][0]], b = t[F[f][1]], c = t[F[f][2]];
            if (a > b) std::swap(a, b);
            if (b > c) std::swap(b, c);
            if (a > b) std::swap(a, b);
            faces[4 * e + f] = {(a << 42) | (b << 21) | c, (int32_t)e};
        }
    }
    std::sort(faces.begin(), faces.end(),
              [](const FK& x, const FK& y) { return x.key < y.key; });

    Graph g;
    g.n = n_elem;
    std::vector<int32_t> deg(n_elem, 0);
    std::vector<std::pair<int32_t, int32_t>> edges;
    edges.reserve(2 * n_elem);
    for (size_t i = 0; i + 1 < faces.size(); ++i) {
        if (faces[i].key == faces[i + 1].key) {
            edges.emplace_back(faces[i].elem, faces[i + 1].elem);
            ++deg[faces[i].elem];
            ++deg[faces[i + 1].elem];
            ++i;  // interior faces are shared by exactly two tets
        }
    }
    g.xadj.assign(n_elem + 1, 0);
    for (int64_t v = 0; v < n_elem; ++v) g.xadj[v + 1] = g.xadj[v] + deg[v];
    g.adj.resize(g.xadj[n_elem]);
    g.ewgt.assign(g.xadj[n_elem], 1);
    if (elem_wgt)
        g.vwgt.assign(elem_wgt, elem_wgt + n_elem);
    else
        g.vwgt.assign(n_elem, 1);
    std::vector<int64_t> pos(g.xadj.begin(), g.xadj.end() - 1);
    for (auto& e : edges) {
        g.adj[pos[e.first]++] = e.second;
        g.adj[pos[e.second]++] = e.first;
    }
    return g;
}

// ---------------------------------------------------------------------
// heavy-edge matching coarsening
// ---------------------------------------------------------------------
Graph coarsen(const Graph& g, std::mt19937& rng) {
    const int64_t n = g.n;
    std::vector<int32_t> match(n, -1);
    std::vector<int32_t> order(n);
    for (int64_t i = 0; i < n; ++i) order[i] = (int32_t)i;
    std::shuffle(order.begin(), order.end(), rng);

    int64_t nc = 0;
    std::vector<int32_t> cmap(n, -1);
    for (int64_t oi = 0; oi < n; ++oi) {
        int32_t v = order[oi];
        if (match[v] >= 0) continue;
        int32_t best = -1, bw = -1;
        for (int64_t j = g.xadj[v]; j < g.xadj[v + 1]; ++j) {
            int32_t u = g.adj[j];
            if (match[u] < 0 && g.ewgt[j] > bw) { bw = g.ewgt[j]; best = u; }
        }
        if (best >= 0) {
            match[v] = best; match[best] = v;
            cmap[v] = cmap[best] = (int32_t)nc++;
        } else {
            match[v] = v;
            cmap[v] = (int32_t)nc++;
        }
    }

    Graph c;
    c.n = nc;
    c.vwgt.assign(nc, 0);
    for (int64_t v = 0; v < n; ++v) c.vwgt[cmap[v]] += g.vwgt[v];

    // aggregate coarse adjacency with a stamp array (no hashing)
    c.xadj.assign(nc + 1, 0);
    std::vector<int32_t> stamp(nc, -1), slot(nc, -1);
    std::vector<int32_t> cadj, cwgt;
    cadj.reserve(g.adj.size() / 2);
    cwgt.reserve(g.adj.size() / 2);
    // need fine vertices grouped by coarse id
    std::vector<int32_t> head(nc, -1), nxt(n, -1);
    for (int64_t v = n - 1; v >= 0; --v) {
        nxt[v] = head[cmap[v]];
        head[cmap[v]] = (int32_t)v;
    }
    for (int64_t cv = 0; cv < nc; ++cv) {
        size_t start = cadj.size();
        for (int32_t v = head[cv]; v >= 0; v = nxt[v]) {
            for (int64_t j = g.xadj[v]; j < g.xadj[v + 1]; ++j) {
                int32_t cu = cmap[g.adj[j]];
                if (cu == cv) continue;
                if (stamp[cu] != (int32_t)cv) {
                    stamp[cu] = (int32_t)cv;
                    slot[cu] = (int32_t)cadj.size();
                    cadj.push_back(cu);
                    cwgt.push_back(g.ewgt[j]);
                } else {
                    cwgt[slot[cu]] += g.ewgt[j];
                }
            }
        }
        c.xadj[cv + 1] = (int64_t)cadj.size();
        (void)start;
    }
    c.adj = std::move(cadj);
    c.ewgt = std::move(cwgt);
    const_cast<Graph&>(g).cmap = std::move(cmap);
    return c;
}

// ---------------------------------------------------------------------
// balanced greedy region growing (initial k-way partition)
// ---------------------------------------------------------------------
int64_t grow_partition(const Graph& g, int k, double max_part_w,
                       std::mt19937& rng, std::vector<int32_t>& part) {
    const int64_t n = g.n;
    part.assign(n, -1);
    std::vector<int64_t> pw(k, 0);

    // seeds: farthest-point style via repeated BFS from a random start
    std::vector<int32_t> seeds(k);
    std::vector<int32_t> dist(n);
    std::vector<int32_t> q(n);
    seeds[0] = (int32_t)(rng() % n);
    std::fill(dist.begin(), dist.end(), -1);
    for (int s = 0; s < k; ++s) {
        if (s > 0) {
            // BFS from all previous seeds; pick the farthest vertex
            std::fill(dist.begin(), dist.end(), -1);
            int64_t qh = 0, qt = 0;
            for (int t = 0; t < s; ++t) { dist[seeds[t]] = 0; q[qt++] = seeds[t]; }
            int32_t far = seeds[0];
            while (qh < qt) {
                int32_t v = q[qh++];
                far = v;
                for (int64_t j = g.xadj[v]; j < g.xadj[v + 1]; ++j)
                    if (dist[g.adj[j]] < 0) {
                        dist[g.adj[j]] = dist[v] + 1;
                        q[qt++] = g.adj[j];
                    }
            }
            seeds[s] = far;
        }
    }

    // grow: repeatedly pop the frontier vertex with max connectivity to
    // its part (simple bucketless greedy using a per-part BFS frontier)
    std::vector<std::vector<int32_t>> frontier(k);
    for (int s = 0; s < k; ++s) {
        part[seeds[s]] = s;
        pw[s] += g.vwgt[seeds[s]];
        frontier[s].push_back(seeds[s]);
    }
    int64_t assigned = k;
    bool progress = true;
    while (assigned < n && progress) {
        progress = false;
        // round-robin parts, lightest first, so balance emerges naturally
        std::vector<int> ord(k);
        for (int s = 0; s < k; ++s) ord[s] = s;
        std::sort(ord.begin(), ord.end(),
                  [&](int a, int b) { return pw[a] < pw[b]; });
        for (int oi = 0; oi < k; ++oi) {
            int s = ord[oi];
            if ((double)pw[s] >= max_part_w) continue;
            auto& fr = frontier[s];
            while (!fr.empty()) {
                int32_t v = fr.back();
                // expand one unassigned neighbor of v
                int32_t pick = -1;
                for (int64_t j = g.xadj[v]; j < g.xadj[v + 1]; ++j)
                    if (part[g.adj[j]] < 0) { pick = g.adj[j]; break; }
                if (pick < 0) { fr.pop_back(); continue; }
                part[pick] = s;
                pw[s] += g.vwgt[pick];
                fr.push_back(pick);
                ++assigned;
                progress = true;
                break;
            }
        }
    }
    // orphans (disconnected leftovers / balance overflow): attach to the
    // lightest neighboring part, else globally lightest
    for (int64_t v = 0; v < n; ++v) {
        if (part[v] >= 0) continue;
        int best = -1;
        for (int64_t j = g.xadj[v]; j < g.xadj[v + 1]; ++j) {
            int p = part[g.adj[j]];
            if (p >= 0 && (best < 0 || pw[p] < pw[best])) best = p;
        }
        if (best < 0)
            best = (int)(std::min_element(pw.begin(), pw.end()) - pw.begin());
        part[v] = best;
        pw[best] += g.vwgt[v];
    }

    int64_t cut = 0;
    for (int64_t v = 0; v < n; ++v)
        for (int64_t j = g.xadj[v]; j < g.xadj[v + 1]; ++j)
            if (part[g.adj[j]] != part[v]) cut += g.ewgt[j];
    return cut / 2;
}

// ---------------------------------------------------------------------
// greedy boundary refinement (edge-cut objective, balance-capped,
// min-connectivity tie-break) — the uncoarsening smoother
// ---------------------------------------------------------------------
void refine(const Graph& g, int k, double max_part_w,
            std::vector<int32_t>& part, int passes) {
    const int64_t n = g.n;
    std::vector<int64_t> pw(k, 0);
    for (int64_t v = 0; v < n; ++v) pw[part[v]] += g.vwgt[v];

    std::vector<int32_t> conn(k, 0), touched;
    touched.reserve(16);
    for (int pass = 0; pass < passes; ++pass) {
        int64_t moves = 0;
        for (int64_t v = 0; v < n; ++v) {
            const int32_t pv = part[v];
            const bool overweight = (double)pw[pv] > max_part_w;
            // connectivity of v to each adjacent part
            touched.clear();
            bool boundary = false;
            for (int64_t j = g.xadj[v]; j < g.xadj[v + 1]; ++j) {
                int32_t pu = part[g.adj[j]];
                if (conn[pu] == 0) touched.push_back(pu);
                conn[pu] += g.ewgt[j];
                if (pu != pv) boundary = true;
            }
            if (boundary) {
                int32_t best = pv;
                int64_t best_score = 0;
                for (int32_t pu : touched) {
                    if (pu == pv) continue;
                    int32_t gain = conn[pu] - conn[pv];
                    if (overweight) {
                        // balancing move: any lighter part, maximise
                        // (gain, then lightness); ignore the cap
                        if (pw[pu] + g.vwgt[v] >= pw[pv]) continue;
                        int64_t score =
                            (int64_t)gain * (int64_t)n - pw[pu];
                        if (best == pv || score > best_score) {
                            best = pu;
                            best_score = score;
                        }
                    } else {
                        if ((double)(pw[pu] + g.vwgt[v]) > max_part_w)
                            continue;
                        // positive gain, or zero-gain toward a lighter
                        // part (METIS's greedy k-way pass)
                        bool take =
                            gain > 0
                            || (gain == 0
                                && pw[pu] + g.vwgt[v] < pw[pv]);
                        int64_t score =
                            (int64_t)gain * (int64_t)n - pw[pu];
                        if (take && (best == pv || score > best_score)) {
                            best = pu;
                            best_score = score;
                        }
                    }
                }
                if (best != pv) {
                    pw[pv] -= g.vwgt[v];
                    pw[best] += g.vwgt[v];
                    part[v] = best;
                    ++moves;
                }
            }
            for (int32_t pu : touched) conn[pu] = 0;
        }
        if (moves == 0) break;
    }
}

// ---------------------------------------------------------------------
// contiguity repair: each part keeps its largest connected component;
// stray components move to the neighbor part they touch most
// ---------------------------------------------------------------------
void make_contiguous(const Graph& g, int k, std::vector<int32_t>& part) {
    const int64_t n = g.n;
    std::vector<int32_t> comp(n, -1);
    std::vector<int64_t> comp_w;
    std::vector<int32_t> comp_part;
    std::vector<int32_t> q(n);
    int32_t nc = 0;
    for (int64_t v0 = 0; v0 < n; ++v0) {
        if (comp[v0] >= 0) continue;
        int64_t qh = 0, qt = 0;
        comp[v0] = nc;
        q[qt++] = (int32_t)v0;
        int64_t w = 0;
        while (qh < qt) {
            int32_t v = q[qh++];
            w += g.vwgt[v];
            for (int64_t j = g.xadj[v]; j < g.xadj[v + 1]; ++j) {
                int32_t u = g.adj[j];
                if (comp[u] < 0 && part[u] == part[v0]) {
                    comp[u] = nc;
                    q[qt++] = u;
                }
            }
        }
        comp_w.push_back(w);
        comp_part.push_back(part[v0]);
        ++nc;
    }
    // largest component per part stays
    std::vector<int32_t> keep(k, -1);
    for (int32_t c = 0; c < nc; ++c) {
        int p = comp_part[c];
        if (keep[p] < 0 || comp_w[c] > comp_w[keep[p]]) keep[p] = c;
    }
    // reassign every vertex of a stray component to the adjacent part
    // with the strongest connection (iterate to absorb nested strays)
    for (int iter = 0; iter < 4; ++iter) {
        bool changed = false;
        for (int64_t v = 0; v < n; ++v) {
            if (comp[v] == keep[part[v]]) continue;
            int32_t bestp = -1, bestw = -1;
            std::vector<std::pair<int32_t, int32_t>> cw;
            for (int64_t j = g.xadj[v]; j < g.xadj[v + 1]; ++j) {
                int32_t u = g.adj[j];
                if (comp[u] == keep[part[u]]) {
                    bool found = false;
                    for (auto& e : cw)
                        if (e.first == part[u]) { e.second += g.ewgt[j]; found = true; }
                    if (!found) cw.emplace_back(part[u], g.ewgt[j]);
                }
            }
            for (auto& e : cw)
                if (e.second > bestw) { bestw = e.second; bestp = e.first; }
            if (bestp >= 0 && bestp != part[v]) {
                part[v] = bestp;
                comp[v] = keep[bestp];
                changed = true;
            } else if (bestp == part[v]) {
                comp[v] = keep[bestp];  // re-attached to the main body
                changed = true;
            }
        }
        if (!changed) break;
    }
}

}  // namespace

extern "C" {

// tets: (n_elem, 4) int32. out_part: (n_elem,) int32. elem_wgt: optional
// (n_elem,) non-negative per-element balance weights (NULL = uniform;
// the reference's USE_METIS 3/4 vwgt role, ADMMDDTimeStepper.cpp:98-152).
// Returns the edge cut (>= 0) or -1 on invalid input. imbalance ~1.03
// matches ufactor=30.
int64_t partition_mesh_dual_w(const int32_t* tets, int64_t n_elem,
                              int32_t n_parts, double imbalance,
                              const int32_t* elem_wgt,
                              int32_t* out_part) {
    if (n_elem <= 0 || n_parts <= 0) return -1;
    if (n_parts == 1) {
        std::memset(out_part, 0, n_elem * sizeof(int32_t));
        return 0;
    }
    // build_dual packs 3 sorted vertex ids into 21-bit fields of one
    // 64-bit face key; refuse (callers fall back to RCB) rather than
    // silently corrupt adjacency for meshes with >= 2^21 vertices
    for (int64_t i = 0; i < 4 * n_elem; ++i)
        if (tets[i] >= (1 << 21)) return -1;
    int64_t total_w = n_elem;
    if (elem_wgt) {
        total_w = 0;
        for (int64_t e = 0; e < n_elem; ++e) {
            if (elem_wgt[e] < 0) return -1;
            total_w += elem_wgt[e];
        }
        if (total_w <= 0) return -1;  // callers fall back to uniform
    }
    std::mt19937 rng(20190701);  // deterministic partitions
    Graph fine = build_dual(tets, n_elem, elem_wgt);

    // coarsening chain
    std::vector<Graph> levels;
    levels.push_back(std::move(fine));
    const int64_t target = std::max<int64_t>(128, 24LL * n_parts);
    while (levels.back().n > target) {
        Graph c = coarsen(levels.back(), rng);
        if (c.n > (int64_t)(0.95 * levels.back().n)) break;  // stalled
        levels.push_back(std::move(c));
    }

    // initial partition at the coarsest level: best of 4 seed sets.
    // Total vertex weight is invariant across levels (coarsening sums
    // vwgt), so one balance cap serves every level.
    Graph& coarsest = levels.back();
    const double max_part_w = imbalance * (double)total_w / n_parts;

    std::vector<int32_t> best_part, trial;
    int64_t best_cut = -1;
    for (int t = 0; t < 4; ++t) {
        int64_t cut = grow_partition(coarsest, n_parts, max_part_w, rng,
                                     trial);
        refine(coarsest, n_parts, max_part_w, trial, 8);
        int64_t rcut = 0;
        for (int64_t v = 0; v < coarsest.n; ++v)
            for (int64_t j = coarsest.xadj[v]; j < coarsest.xadj[v + 1]; ++j)
                if (trial[coarsest.adj[j]] != trial[v])
                    rcut += coarsest.ewgt[j];
        rcut /= 2;
        (void)cut;
        if (best_cut < 0 || rcut < best_cut) {
            best_cut = rcut;
            best_part = trial;
        }
    }

    // uncoarsen + refine
    std::vector<int32_t> part = std::move(best_part);
    for (int64_t lvl = (int64_t)levels.size() - 2; lvl >= 0; --lvl) {
        const Graph& f = levels[lvl];
        std::vector<int32_t> fpart(f.n);
        for (int64_t v = 0; v < f.n; ++v) fpart[v] = part[f.cmap[v]];
        part = std::move(fpart);
        refine(f, n_parts, max_part_w, part, lvl == 0 ? 10 : 4);
    }

    make_contiguous(levels[0], n_parts, part);
    // contiguity moves can upset balance slightly; one last bounded pass
    refine(levels[0], n_parts, max_part_w, part, 4);
    make_contiguous(levels[0], n_parts, part);

    int64_t cut = 0;
    const Graph& g0 = levels[0];
    for (int64_t v = 0; v < g0.n; ++v)
        for (int64_t j = g0.xadj[v]; j < g0.xadj[v + 1]; ++j)
            if (part[g0.adj[j]] != part[v]) cut += g0.ewgt[j];
    std::memcpy(out_part, part.data(), n_elem * sizeof(int32_t));
    return cut / 2;
}

int64_t partition_mesh_dual(const int32_t* tets, int64_t n_elem,
                            int32_t n_parts, double imbalance,
                            int32_t* out_part) {
    return partition_mesh_dual_w(tets, n_elem, n_parts, imbalance, nullptr,
                                 out_part);
}

}  // extern "C"
